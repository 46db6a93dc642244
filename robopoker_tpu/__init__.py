"""robopoker_tpu — a TPU-native counterfactual-regret framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
krukah/robopoker (see /root/reference): vectorized hand evaluation,
hierarchical k-means hand abstraction over Sinkhorn EMD, game-agnostic
external-sampling MCCFR with pluggable regret/weight/sampling schemes,
depth-limited + safe subgame re-solving, action translation, AIVAT
evaluation, and a strategic litmus harness.

Module map (named after the reference crates for parity auditing — the
implementations are TPU-first redesigns, not ports):

- ``pokerkit``  foundation: dtypes, constants, bet grids, hyperparams,
  regime/version config, action translation  (ref: crates/pokerkit)
- ``deuce``     cards, vectorized hand evaluator, observations/equity,
  suit isomorphism, streets, combinatorics    (ref: crates/deuce)
- ``kicker``    batched NLHE game engine (struct-of-arrays lockstep
  state machine)                              (ref: crates/kicker)
- ``mccfr``     CFR core: dense-tree engine, regret tables, schedules,
  sampling schemes, exploitability            (ref: crates/mccfr)
- ``games``     validation games: RPS, Kuhn, Leduc (ref: crates/{roshambo,kuhn,leduc})
- ``lloyd``     abstraction pipeline: histograms, Sinkhorn EMD, Elkan
  k-means                                     (ref: crates/{lloyd,elkan,monge})
- ``subgame``   depth-limited + world-partitioned safe re-solving
                                              (ref: crates/subgame)
- ``nlhe``      flagship NLHE solver + blueprint training (ref: crates/{nlhe,forge})
- ``ops``       Pallas TPU kernels
- ``parallel``  mesh/sharding utilities, multi-host training step
- ``serving``   litmus harness, AIVAT, slumbot client, HTTP API
                                              (ref: crates/{litmus,arena,spar,portal,parlor})
- ``utils``     metrics, checkpointing, interrupt handling
"""

__version__ = "0.1.0"
