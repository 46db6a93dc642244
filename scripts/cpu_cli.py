"""Run the robopoker_tpu CLI pinned to the host CPU backend.

The axon sitecustomize forces jax_platforms="axon,cpu" regardless of the
JAX_PLATFORMS env var, so any side work launched while a training run
holds the TPU grant would serialize behind it.  This wrapper flips the
config to cpu BEFORE the CLI imports anything jax-facing, letting
litmus/lbr/status run concurrently with a chip-bound train.

Usage: python3 scripts/cpu_cli.py litmus --workdir artifacts/r2 ...
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from robopoker_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
