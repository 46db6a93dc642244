// Native host-side kernels for robopoker_tpu.
//
// TPU-native counterpart of the reference's Rust combinatorics + evaluator
// hot paths that live OFF the chip in our architecture: the exhaustive
// street sweeps (123M river / 14M turn isomorphism enumeration,
// ref: crates/deuce/src/{hand_iter,observation_iter,isomorphism_iter}.rs)
// and a nanosecond-class scalar 7-card evaluator used as the host oracle
// and data-loader filter (ref: crates/deuce/src/evaluator.rs:27-177).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). All
// functions are stateless and thread-safe; the Python side shards
// [start, start+count) index ranges across processes/hosts, which
// replaces the reference's rayon iterator parallelism (SURVEY §2.5 P2).
//
// Build: make -C native   (produces librobopoker_native.so)

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// combinadics: colex unranking of k-subsets of a 52-card deck
// ---------------------------------------------------------------------------

static uint64_t BINOM[53][8];
static bool binom_init = false;

static void init_binom() {
    if (binom_init) return;
    for (int n = 0; n <= 52; ++n) {
        for (int k = 0; k <= 7; ++k) {
            if (k == 0) { BINOM[n][k] = 1; continue; }
            if (n == 0) { BINOM[n][k] = 0; continue; }
            BINOM[n][k] = BINOM[n - 1][k - 1] + BINOM[n - 1][k];
        }
    }
    binom_init = true;
}

uint64_t rp_binom(int n, int k) {
    init_binom();
    if (k < 0 || k > 7 || n < 0 || n > 52) return 0;
    return BINOM[n][k];
}

// colex unrank: index -> descending k-subset of [0, 52)
static void unrank_subset(uint64_t idx, int k, int8_t* out) {
    init_binom();
    for (int i = k; i >= 1; --i) {
        // largest c with BINOM[c][i] <= idx
        int lo = i - 1, hi = 52;
        while (lo + 1 < hi) {
            int mid = (lo + hi) / 2;
            if (BINOM[mid][i] <= idx) lo = mid; else hi = mid;
        }
        out[k - i] = (int8_t)lo;
        idx -= BINOM[lo][i];
    }
}

// Enumerate observations for a street: all C(52,2) pockets x C(50,n) boards.
// Observation index o in [0, C(52,2)*C(50,n)): pocket = o / C(50,n),
// board = o % C(50,n) unranked over the 50 remaining cards.
// Returns number written. out_pocket: [count, 2], out_board: [count, n].
int64_t rp_enumerate_observations(
    int64_t start, int64_t count, int n_board,
    int8_t* out_pocket, int8_t* out_board) {
    init_binom();
    const uint64_t n_pockets = BINOM[52][2];
    const uint64_t n_boards = BINOM[50][n_board];
    const uint64_t total = n_pockets * n_boards;
    int64_t written = 0;
    for (int64_t o = start; o < start + count && (uint64_t)o < total; ++o) {
        uint64_t pidx = (uint64_t)o / n_boards;
        uint64_t bidx = (uint64_t)o % n_boards;
        int8_t pocket[2];
        unrank_subset(pidx, 2, pocket);
        // board drawn from the 50 cards excluding the pocket: unrank over
        // [0,50) then map through the gap positions
        int8_t braw[5];
        unrank_subset(bidx, n_board, braw);
        int8_t lo = pocket[1] < pocket[0] ? pocket[1] : pocket[0];
        int8_t hi = pocket[1] < pocket[0] ? pocket[0] : pocket[1];
        for (int j = 0; j < n_board; ++j) {
            int8_t c = braw[j];
            if (c >= lo) c += 1;
            if (c >= hi) c += 1;
            out_board[written * n_board + j] = c;
        }
        out_pocket[written * 2 + 0] = pocket[0];
        out_pocket[written * 2 + 1] = pocket[1];
        ++written;
    }
    return written;
}

// ---------------------------------------------------------------------------
// scalar 7-card evaluator (same packed strength code as the device kernel:
// [ranking:4 | primary:4 | secondary:4 | kickers:13])
// ---------------------------------------------------------------------------

static inline int msb13(uint32_t x) {
    return x ? 31 - __builtin_clz(x) : -1;
}

static inline uint32_t top_k(uint32_t mask, int k) {
    while (__builtin_popcount(mask) > k) mask &= mask - 1;
    return mask;
}

static inline int straight_high(uint32_t ranks) {
    uint32_t bits = ranks;
    bits &= bits << 1; bits &= bits << 1; bits &= bits << 1; bits &= bits << 1;
    int hi = msb13(bits & 0x1FFF);
    if (hi >= 0) return hi;
    const uint32_t WHEEL = 0x100F;  // A5432
    if ((ranks & WHEEL) == WHEEL) return 3;
    return -1;
}

int32_t rp_strength(const int8_t* cards, int n) {
    uint32_t suits[4] = {0, 0, 0, 0};
    for (int i = 0; i < n; ++i) {
        int8_t c = cards[i];
        if (c < 0) continue;
        suits[c & 3] |= 1u << (c >> 2);
    }
    uint32_t s0 = suits[0], s1 = suits[1], s2 = suits[2], s3 = suits[3];
    uint32_t ranks = s0 | s1 | s2 | s3;
    uint32_t ge2 = (s0 & s1) | (s0 & s2) | (s0 & s3)
                 | (s1 & s2) | (s1 & s3) | (s2 & s3);
    uint32_t ge3 = (s0 & s1 & s2) | (s0 & s1 & s3)
                 | (s0 & s2 & s3) | (s1 & s2 & s3);
    uint32_t ge4 = s0 & s1 & s2 & s3;

    int flush_suit = -1;
    for (int s = 0; s < 4; ++s)
        if (__builtin_popcount(suits[s]) >= 5) { flush_suit = s; break; }

    auto pack = [](int code, int primary, int secondary, uint32_t kick) {
        return (int32_t)((code << 21) | (primary << 17) | (secondary << 13) | kick);
    };

    if (flush_suit >= 0) {
        int sf = straight_high(suits[flush_suit]);
        if (sf >= 0) return pack(8, sf, 0, 0);
    }
    int quad = msb13(ge4);
    if (quad >= 0)
        return pack(7, quad, 0, top_k(ranks & ~(1u << quad), 1));
    int trips = msb13(ge3);
    if (trips >= 0) {
        int pair = msb13(ge2 & ~(1u << trips));
        if (pair >= 0) return pack(6, trips, pair, 0);
    }
    if (flush_suit >= 0)
        return pack(5, msb13(suits[flush_suit]), 0, 0);
    int st = straight_high(ranks);
    if (st >= 0) return pack(4, st, 0, 0);
    if (trips >= 0)
        return pack(3, trips, 0, top_k(ranks & ~(1u << trips), 2));
    int p1 = msb13(ge2);
    if (p1 >= 0) {
        int p2 = msb13(ge2 & ~(1u << p1));
        if (p2 >= 0)
            return pack(2, p1, p2,
                        top_k(ranks & ~(1u << p1) & ~(1u << p2), 1));
        return pack(1, p1, 0, top_k(ranks & ~(1u << p1), 3));
    }
    int hc = msb13(ranks);
    return pack(0, hc, 0, top_k(ranks & ~(1u << hc), 4));
}

void rp_strength_batch(const int8_t* cards, int64_t n_hands, int n_cards,
                       int32_t* out) {
    for (int64_t i = 0; i < n_hands; ++i)
        out[i] = rp_strength(cards + i * n_cards, n_cards);
}

// Exact river equity vs all C(45,2) opponent pockets (HOT LOOP #1,
// ref: crates/deuce/src/observation.rs:45-62). cards: pocket[2]+board[5].
float rp_river_equity(const int8_t* pocket, const int8_t* board) {
    int8_t seven[7];
    memcpy(seven, pocket, 2);
    memcpy(seven + 2, board, 5);
    int32_t hero = rp_strength(seven, 7);

    uint64_t seen = 0;
    for (int i = 0; i < 7; ++i) seen |= 1ull << seven[i];

    int wins = 0, ties = 0, n = 0;
    int8_t opp[7];
    memcpy(opp + 2, board, 5);
    for (int a = 0; a < 52; ++a) {
        if (seen & (1ull << a)) continue;
        for (int b = a + 1; b < 52; ++b) {
            if (seen & (1ull << b)) continue;
            opp[0] = (int8_t)a; opp[1] = (int8_t)b;
            int32_t v = rp_strength(opp, 7);
            if (hero > v) ++wins;
            else if (hero == v) ++ties;
            ++n;
        }
    }
    return n ? (wins + 0.5f * ties) / (float)n : 0.5f;
}

void rp_river_equity_batch(const int8_t* pockets, const int8_t* boards,
                           int64_t n, float* out) {
    for (int64_t i = 0; i < n; ++i)
        out[i] = rp_river_equity(pockets + i * 2, boards + i * 5);
}

// ---------------------------------------------------------------------------
// plain k-subset enumeration (boards without pockets) — colex unranking of
// C(52,k); feeds the board-factored river sweep below
// ---------------------------------------------------------------------------

int64_t rp_enumerate_subsets(int64_t start, int64_t count, int k,
                             int8_t* out) {
    init_binom();
    const uint64_t total = BINOM[52][k];
    int64_t written = 0;
    for (int64_t o = start; o < start + count && (uint64_t)o < total; ++o) {
        unrank_subset((uint64_t)o, k, out + written * k);
        ++written;
    }
    return written;
}

// ---------------------------------------------------------------------------
// Board-factored exact river equity (the exhaustive 123M-iso sweep kernel).
//
// The reference tabulates equity per isomorphism one observation at a time
// (crates/lloyd/src/lookup.rs:177-193, ~990 opponent evals each). Factoring
// by BOARD amortizes: one 1326-strength pass per board serves all C(47,2) =
// 1081 pockets, with each pocket's (wins, ties) vs its 990 live opponents
// recovered from order statistics —
//   wins(p={a,b}) = |{q valid: s_q < s_p}| − |{q∋a: s_q < s_p}|
//                                          − |{q∋b: s_q < s_p}|
//   ties(p)       = T_all − T_a − T_b + 1      (each T counts p itself)
// via one sorted array of the 1081 valid codes plus 52 per-card sorted
// lists (≤46 entries each). ~1326 evals + O(n log n) counting per board
// instead of 1081 × 990 pairwise evals: ~800× fewer evaluator calls.
// ---------------------------------------------------------------------------

void rp_river_board_equities(const int8_t* board, float* out_equity,
                             uint8_t* out_valid) {
    uint64_t seen = 0;
    for (int i = 0; i < 5; ++i) seen |= 1ull << board[i];

    int32_t code[1326];
    uint8_t valid[1326];
    int32_t sorted_all[1326];
    int n_valid = 0;

    int8_t seven[7];
    memcpy(seven + 2, board, 5);
    int idx = 0;
    for (int a = 0; a < 52; ++a) {
        for (int b = a + 1; b < 52; ++b, ++idx) {
            if ((seen >> a & 1) | (seen >> b & 1)) {
                valid[idx] = 0;
                code[idx] = 0;
                continue;
            }
            seven[0] = (int8_t)a;
            seven[1] = (int8_t)b;
            code[idx] = rp_strength(seven, 7);
            valid[idx] = 1;
            sorted_all[n_valid++] = code[idx];
        }
    }
    std::sort(sorted_all, sorted_all + n_valid);

    // per-card sorted code lists over valid pockets containing that card
    int32_t by_card[52][51];
    int n_by_card[52] = {0};
    idx = 0;
    for (int a = 0; a < 52; ++a) {
        for (int b = a + 1; b < 52; ++b, ++idx) {
            if (!valid[idx]) continue;
            by_card[a][n_by_card[a]++] = code[idx];
            by_card[b][n_by_card[b]++] = code[idx];
        }
    }
    for (int c = 0; c < 52; ++c)
        std::sort(by_card[c], by_card[c] + n_by_card[c]);

    auto count_lt_eq = [](const int32_t* arr, int n, int32_t v,
                          int* lt, int* eq) {
        const int32_t* lo = std::lower_bound(arr, arr + n, v);
        const int32_t* hi = std::upper_bound(lo, arr + n, v);
        *lt = (int)(lo - arr);
        *eq = (int)(hi - lo);
    };

    idx = 0;
    for (int a = 0; a < 52; ++a) {
        for (int b = a + 1; b < 52; ++b, ++idx) {
            out_valid[idx] = valid[idx];
            if (!valid[idx]) { out_equity[idx] = 0.0f; continue; }
            int32_t v = code[idx];
            int lt_all, eq_all, lt_a, eq_a, lt_b, eq_b;
            count_lt_eq(sorted_all, n_valid, v, &lt_all, &eq_all);
            count_lt_eq(by_card[a], n_by_card[a], v, &lt_a, &eq_a);
            count_lt_eq(by_card[b], n_by_card[b], v, &lt_b, &eq_b);
            int wins = lt_all - lt_a - lt_b;
            int ties = eq_all - eq_a - eq_b + 1;
            out_equity[idx] = (wins + 0.5f * ties) / 990.0f;
        }
    }
}

void rp_river_board_equities_batch(const int8_t* boards, int64_t n_boards,
                                   float* out_equity, uint8_t* out_valid) {
    for (int64_t i = 0; i < n_boards; ++i)
        rp_river_board_equities(boards + i * 5, out_equity + i * 1326,
                                out_valid + i * 1326);
}

}  // extern "C"
