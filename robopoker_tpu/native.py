"""ctypes bindings for the native host kernels.

The C++ library (native/robopoker_native.cpp) provides combinadic
observation enumeration for the exhaustive street sweeps and a scalar
evaluator/equity oracle. Falls back to pure-numpy implementations when
the shared library hasn't been built (``make -C native``), so the
framework never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import pathlib
from math import comb

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = pathlib.Path(__file__).parent.parent / "native" / "librobopoker_native.so"
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    lib.rp_enumerate_observations.restype = ctypes.c_int64
    lib.rp_enumerate_observations.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8),
    ]
    lib.rp_strength_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rp_river_equity_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
    ]
    if hasattr(lib, "rp_enumerate_subsets"):
        lib.rp_enumerate_subsets.restype = ctypes.c_int64
        lib.rp_enumerate_subsets.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int8),
        ]
        lib.rp_river_board_equities_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def n_observations(n_board: int) -> int:
    return comb(52, 2) * comb(50, n_board)


def enumerate_observations(start: int, count: int, n_board: int):
    """[count, 2] pockets + [count, n_board] boards for the observation
    index range [start, start+count) (colex order). Native when built,
    numpy otherwise."""
    lib = _load()
    pockets = np.empty((count, 2), np.int8)
    boards = np.empty((count, max(n_board, 1)), np.int8)
    if lib is not None:
        written = lib.rp_enumerate_observations(
            start, count, n_board,
            pockets.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            boards.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        )
        return pockets[:written], boards[:written, :n_board]
    return _enumerate_np(start, count, n_board)


def _enumerate_np(start: int, count: int, n_board: int):
    """Pure-numpy colex unranking (reference implementation / fallback)."""
    n_boards = comb(50, n_board)
    total = comb(52, 2) * n_boards
    end = min(start + count, total)
    idx = np.arange(start, end, dtype=np.int64)
    pidx = idx // n_boards
    bidx = idx % n_boards

    def unrank(ix, k, n):
        out = np.empty((len(ix), k), np.int8)
        rem = ix.copy()
        for i in range(k, 0, -1):
            # largest c with comb(c, i) <= rem, vectorized by scan
            c = np.full(len(ix), i - 1, np.int64)
            for cand in range(i - 1, n):
                mask = comb(cand, i) <= rem
                c[mask] = cand
            out[:, k - i] = c
            rem = rem - np.array([comb(int(ci), i) for ci in c], np.int64)
        return out

    pockets = unrank(pidx, 2, 52)
    braw = unrank(bidx, n_board, 50)
    lo = pockets.min(axis=1, keepdims=True)
    hi = pockets.max(axis=1, keepdims=True)
    boards = braw.astype(np.int64)
    boards = boards + (boards >= lo)
    boards = boards + (boards >= hi)
    return pockets, boards.astype(np.int8)


def strength_batch(cards: np.ndarray) -> np.ndarray:
    """[N, K] cards (pad -1) → packed strength codes via the native
    evaluator (host oracle / data loader)."""
    lib = _load()
    cards = np.ascontiguousarray(cards, np.int8)
    if lib is None:
        raise RuntimeError("native library not built: make -C native")
    out = np.empty(cards.shape[0], np.int32)
    lib.rp_strength_batch(
        cards.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        cards.shape[0], cards.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def enumerate_subsets(start: int, count: int, k: int) -> np.ndarray:
    """[count, k] all C(52, k) card subsets for index range
    [start, start+count) in colex order (plain boards, no pockets)."""
    lib = _load()
    if lib is None or not hasattr(lib, "rp_enumerate_subsets"):
        raise RuntimeError("native library not built: make -C native")
    out = np.empty((count, k), np.int8)
    written = lib.rp_enumerate_subsets(
        start, count, k, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return out[:written]


def river_board_equities(boards: np.ndarray):
    """Board-factored exact river equity: [C, 5] boards → equity [C, 1326]
    (per ALL_POCKETS order) + valid mask [C, 1326]. One 1326-strength pass
    per board serves all 1081 live pockets via order-statistics counting
    (see native/robopoker_native.cpp rp_river_board_equities) — the
    exhaustive 123M-iso river sweep kernel."""
    lib = _load()
    if lib is None or not hasattr(lib, "rp_river_board_equities_batch"):
        raise RuntimeError("native library not built: make -C native")
    boards = np.ascontiguousarray(boards, np.int8)
    n = boards.shape[0]
    eq = np.empty((n, 1326), np.float32)
    valid = np.empty((n, 1326), np.uint8)
    lib.rp_river_board_equities_batch(
        boards.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), n,
        eq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return eq, valid


def river_equity_batch(pockets: np.ndarray, boards: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built: make -C native")
    pockets = np.ascontiguousarray(pockets, np.int8)
    boards = np.ascontiguousarray(boards, np.int8)
    out = np.empty(pockets.shape[0], np.float32)
    lib.rp_river_equity_batch(
        pockets.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        boards.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        pockets.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
