"""Array-file checkpoint store.

TPU-native counterpart of the reference's Postgres blueprint persistence
(ref: crates/forge/src/fast.rs:36-122, crates/daybook/src/stage.rs,
traits/streamable.rs): the staging-table → COPY → merge → stamp-epoch →
snapshot-row dance becomes an atomic .npz write plus a JSONL snapshot
log, keyed by the run-config fingerprint so cross-config resumes are
refused (the reference's Fingerprint::check, §4.7).
"""

from __future__ import annotations

import json
import os
import pathlib
import tempfile
import time

import numpy as np

from ..nlhe.table import InfoTable
from ..pokerkit.regime import RunConfig, check_fingerprint


def save_table(path: str | pathlib.Path, table: InfoTable,
               config: RunConfig, extra: dict | None = None) -> None:
    """Atomic checkpoint write (tmp + rename) + snapshot log append."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {k: np.asarray(v) for k, v in table._asdict().items()}
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".npz")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, fingerprint=config.fingerprint(), **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    log = path.parent / "snapshots.jsonl"
    with open(log, "a") as f:
        f.write(json.dumps({
            "time": time.time(),
            "epoch": int(payload["epoch"]),
            "file": path.name,
            "fingerprint": config.fingerprint(),
            "touched_rows": int(
                (np.abs(payload["regret"]).sum(axis=1) > 0).sum()
            ),
            **(extra or {}),
        }) + "\n")


def load_table(path: str | pathlib.Path, config: RunConfig) -> InfoTable:
    """Resume a checkpoint; refuses config-fingerprint mismatches."""
    import jax.numpy as jnp

    with np.load(path) as z:
        check_fingerprint(str(z["fingerprint"]), config)
        t = z["visits"].shape[0]

        def side(name):  # legacy checkpoints predate the sidecar words
            return jnp.asarray(z[name]) if name in z.files else \
                jnp.zeros(t, jnp.int32)

        return InfoTable(
            regret=jnp.asarray(z["regret"]),
            weight=jnp.asarray(z["weight"]),
            payoff=jnp.asarray(z["payoff"]),
            visits=jnp.asarray(z["visits"]),
            key_lo=jnp.asarray(z["key_lo"]),
            key_hi=jnp.asarray(z["key_hi"]),
            bucket=side("bucket"),
            choices=side("choices"),
            epoch=jnp.asarray(z["epoch"]),
        )


def save_compact(path: str | pathlib.Path, table: InfoTable,
                 config: RunConfig) -> None:
    """Occupied-rows-only checkpoint — small enough to commit to version
    control so a trained blueprint survives environment resets.

    The full table is sparse (a few-percent load of 2^20+ rows); storing
    (row index, accumulators, key words) for occupied rows cuts the file
    by the inverse load factor. ``load_compact`` reconstructs the exact
    dense table, so probing resolution is unchanged.
    """
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    d = {k: np.asarray(v) for k, v in table._asdict().items()}
    occ = (
        (d["key_lo"] != 0) | (d["key_hi"] != 0) | (d["visits"] > 0)
        | (np.abs(d["regret"]).sum(1) > 0) | (np.abs(d["weight"]).sum(1) > 0)
    )
    rows = np.nonzero(occ)[0].astype(np.int64)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".npz")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(
                f, fingerprint=config.fingerprint(),
                capacity=np.int64(table.capacity), rows=rows,
                regret=d["regret"][rows], weight=d["weight"][rows],
                payoff=d["payoff"][rows], visits=d["visits"][rows],
                key_lo=d["key_lo"][rows], key_hi=d["key_hi"][rows],
                bucket=d["bucket"][rows], choices=d["choices"][rows],
                epoch=d["epoch"],
            )
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_compact(path: str | pathlib.Path, config: RunConfig) -> InfoTable:
    """Reconstruct the dense InfoTable from a compact checkpoint."""
    import jax.numpy as jnp

    with np.load(path) as z:
        check_fingerprint(str(z["fingerprint"]), config)
        t = int(z["capacity"])
        rows = z["rows"]

        # ONLY the sidecar columns may be absent (legacy checkpoints);
        # a core array missing means the file is truncated/corrupt, and
        # zero-filling it would silently serve an untrained uniform
        # blueprint (ADVICE round-1)
        optional = {"bucket", "choices"}

        def dense(name, cols, dtype):
            shape = (t, cols) if cols else (t,)
            a = np.zeros(shape, dtype)
            if name in z.files:
                a[rows] = z[name]
            elif name not in optional:
                raise KeyError(
                    f"compact checkpoint {path} is missing core array "
                    f"'{name}' — truncated or corrupt")
            return jnp.asarray(a)

        from ..nlhe.table import N_COLS

        return InfoTable(
            regret=dense("regret", N_COLS, np.float32),
            weight=dense("weight", N_COLS, np.float32),
            payoff=dense("payoff", N_COLS, np.float32),
            visits=dense("visits", 0, np.int32),
            key_lo=dense("key_lo", 0, np.int32),
            key_hi=dense("key_hi", 0, np.int32),
            bucket=dense("bucket", 0, np.int32),
            choices=dense("choices", 0, np.int32),
            epoch=jnp.asarray(z["epoch"]),
        )
