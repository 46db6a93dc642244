"""Persistent XLA compilation cache.

Remote-TPU compiles through the axon tunnel cost minutes per program and
recur in every fresh process; the on-disk cache turns repeat compiles
into sub-second loads (verified: 0.25s vs ~5 min for the same program).
Call :func:`enable_compilation_cache` before the first jit dispatch —
bench.py, the CLI, and the scripts all do.
"""

from __future__ import annotations

import pathlib


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache = path or str(
        pathlib.Path(__file__).resolve().parent.parent.parent / ".jax_cache"
    )
    pathlib.Path(cache).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
