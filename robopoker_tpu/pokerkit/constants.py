"""Game-tree and solver constants.

TPU-native counterpart of the reference foundation crate's constant
surface (ref: crates/pokerkit/src/lib.rs:28-219). Values are identical —
they define the *game*, which we must reproduce exactly; only the
representation changes (plain Python ints/tuples so they can be baked
into jit-compiled programs as static shapes/weights).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# dtype policy (ref: crates/pokerkit/src/lib.rs:28-40)
# Chips=i16, Utility/Probability/Energy/Entropy=f32, Epoch=i16.
# On TPU we keep chips in int32 lanes (i16 has no native VPU benefit and
# int32 avoids overflow in pot arithmetic); utilities stay f32 because CFR
# regret accumulation is precision-sensitive (bf16 drifts the fixed point).
# ---------------------------------------------------------------------------
import numpy as np

CHIPS_DTYPE = np.int32
UTILITY_DTYPE = np.float32
PROBABILITY_DTYPE = np.float32

# ---------------------------------------------------------------------------
# Game tree parameters (ref: crates/pokerkit/src/lib.rs:60-73)
# ---------------------------------------------------------------------------
N_PLAYERS = 2            # heads-up
STACK = 200              # starting stack, chips
B_BLIND = 2              # big blind
S_BLIND = 1              # small blind
MAX_RAISE_REPEATS = 3    # max re-raises per betting round
MAX_PATH_EDGES = 12      # packed-path capacity (12 edges x 5 bits)

# ---------------------------------------------------------------------------
# Bet sizing abstraction (ref: crates/pokerkit/src/lib.rs:81-153)
# RAISES is the canonical pot-fraction pool; the *_INDICES tables select
# per-(street, depth) subsets. Row layout: street*3 + min(depth, 2).
# ---------------------------------------------------------------------------
OPENS = (2, 3, 4, 5)  # preflop open sizes, BB units

#          0       1       2       3       4       5       6       7       8       9
#          25%     33%     50%     67%     75%     100%    125%    150%    200%    300%
RAISES = ((1, 4), (1, 3), (1, 2), (2, 3), (3, 4), (1, 1), (5, 4), (3, 2), (2, 1), (3, 1))

PLURIBUS_INDICES = (
    (),                # (Pref, 0) opens — BB-relative, see OPENS
    (5, 8),            # (Pref, 1) 3-bet:  [1:1, 2:1]
    (5,),              # (Pref, N) 4-bet+: [1:1]
    (0, 2, 4, 5, 8),   # (Flop, 0):        [1/4, 1/2, 3/4, 1:1, 2:1]
    (2, 5),            # (Flop, 1):        [1/2, 1:1]
    (5,),              # (Flop, N):        [1:1]
    (1, 2, 5, 8),      # (Turn, 0):        [1/3, 1/2, 1:1, 2:1]
    (5, 8),            # (Turn, 1):        [1:1, 2:1]
    (5,),              # (Turn, N):        [1:1]
    (1, 2, 5, 8),      # (Rive, 0):        [1/3, 1/2, 1:1, 2:1]
    (5, 8),            # (Rive, 1):        [1:1, 2:1]
    (5,),              # (Rive, N):        [1:1]
)

SLUMBOT_INDICES = (2, 5)  # uniform [1/2 pot, pot] grid at every street/depth

# ---------------------------------------------------------------------------
# K-means clustering structural constants (ref: crates/pokerkit/src/lib.rs:180-191)
# ---------------------------------------------------------------------------
KMEANS_MAX_CLUSTER_COUNT = 256   # Abstraction's 8-bit index field
KMEANS_FLOP_CLUSTER_COUNT = 256
KMEANS_TURN_CLUSTER_COUNT = 256
KMEANS_EQTY_CLUSTER_COUNT = 101  # river equity bins 0%..100%

# ---------------------------------------------------------------------------
# MCCFR / regret matching (ref: crates/pokerkit/src/lib.rs:195-207)
# ---------------------------------------------------------------------------
ASYMMETRIC_UTILITY = 2.0                     # RPS scissors multiplier
EPSILON = float(np.finfo(np.float32).tiny)   # f32::MIN_POSITIVE ≈ 1.1755e-38

# ---------------------------------------------------------------------------
# Subgame solving structural constants (ref: crates/pokerkit/src/lib.rs:209-219)
# ---------------------------------------------------------------------------
N_WORLDS = 4         # opponent-range partitions in safe subgame solving
FRONTIER_LEAVES = 4  # biased continuation strategies at depth frontiers
