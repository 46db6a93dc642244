"""Micro-bench: fused Pallas settle vs the jnp settle (VERDICT r2 #7).

Times both settlement paths at production-like lane counts on the
current backend (run with the chip free). The decision rule from the
verdict: wire the kernel into the roll hot path only on a measured win;
record the delta either way.

    python3 scripts/bench_settle.py --n 131072 --iters 50
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from robopoker_tpu.kicker import MENU_PLURIBUS, game as G
    from robopoker_tpu.ops import settle_pallas

    MENU = jnp.asarray(MENU_PLURIBUS)
    key = jax.random.PRNGKey(5)
    state = G.root(key, args.n)
    rng = np.random.default_rng(7)
    for k in range(24):
        t = np.asarray(G.turn_of(state))
        acting = t <= G.TURN_P1
        legal = np.asarray(G.legal_cols(state, MENU))
        col = (rng.random(legal.shape) * legal).argmax(axis=1).astype(np.int32)
        state = G.apply_cols(state, jnp.asarray(col), MENU,
                             jnp.asarray(acting))
        state = G.deal_board(state, jax.random.fold_in(key, k))

    settle_jnp = jax.jit(G.settle)

    def bench(fn, label):
        # Timing discipline (round-4 finding): on the remote-TPU
        # runtime block_until_ready does NOT wait for execution, and a
        # per-call dispatch loop measures tunnel latency, not the
        # kernel. So: K chained kernel invocations inside ONE jitted
        # scan (the carry threads through an optimization_barrier with
        # the input, defeating CSE of identical calls), completion
        # forced by a scalar fetch, and two trip counts differenced to
        # cancel the ~30 ms dispatch+fetch constant.
        import functools

        from jax import lax

        @functools.partial(jax.jit, static_argnames="k")
        def sweep(s0, k):
            def body(c, _):
                s, cc = lax.optimization_barrier((s0, c))
                out = fn(s)
                return cc + out[0, 0], ()

            return lax.scan(body, jnp.float32(0.0), None, length=k)[0]

        def best_s(k):
            float(sweep(state, k))  # compile
            return min(
                (lambda t0: (float(sweep(state, k)), time.perf_counter()
                             - t0)[1])(time.perf_counter())
                for _ in range(3))

        k1, k2 = 4, 4 + args.iters
        dt = (best_s(k2) - best_s(k1)) / (k2 - k1)
        print(f"{label}: {dt*1e6:.0f} us / {args.n} lanes "
              f"({args.n/dt/1e6:.0f} M settles/s)")
        return dt

    dj = bench(settle_jnp, "jnp settle  ")
    dp = bench(settle_pallas, "pallas settle")
    print(f"pallas/jnp speedup: {dj/dp:.2f}x on {jax.devices()[0]}")


if __name__ == "__main__":
    main()
