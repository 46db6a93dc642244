"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU runs happen through bench.py / the driver; tests validate logic
and multi-chip sharding on host CPU with 8 virtual devices, per the
project's hardware contract (one real chip, multi-chip via Mesh dry-run).

The environment's sitecustomize registers the remote-TPU "axon" backend
and forces ``jax_platforms="axon,cpu"`` via jax.config — so the env var
alone is not enough; we override the config back to cpu before any
computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after XLA_FLAGS is set)

jax.config.update("jax_platforms", "cpu")
