"""Is the accept-cond's reject-path cost per-LEAF or per-BYTE?

The MCMC step forwards the carried factor state (leveldata H/prec per level,
gram segments, routed sums, prediction operators -- ~45 leaves, ~180 MB at
the n=1e5 config) through one `lax.cond`.  XLA cannot alias cond outputs to
the donated scan carry, so every rejected iteration pays a copy pass.  This
harness measures a scan over a cond that forwards K leaves totalling M bytes,
varying K at fixed M and M at fixed K, with the dependency-chained timing
discipline (fresh scalar perturbation per iteration, force both branches'
shapes identical).

Usage: python examples/microbench_cond.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    def bench(K, total_mb, iters=40, fresh=False):
        """fresh=True: the taken-on-accept branch produces buffers that
        CANNOT be computed in place (a roll + scale, like the factor-emitting
        sweep's outputs), so the cond's outputs get fresh buffer assignments
        and the reject branch must copy the carry into them -- the real MCMC
        step's structure.  fresh=False: both branches elementwise-in-place."""
        per = int(total_mb * 1e6 / 4 / K)
        leaves = tuple(
            jnp.full((per,), float(i), dtype=jnp.float32) for i in range(K)
        )

        @jax.jit
        def loop(leaves, xs):
            def body(carry, x):
                # data-dependent predicate; branches: identity vs +eps
                pred = x > 0.5

                def fwd(ls):
                    return ls

                def upd(ls):
                    if fresh:
                        return tuple(jnp.roll(l, 1) * x for l in ls)
                    return tuple(l + x for l in ls)

                ls = jax.lax.cond(pred, upd, fwd, carry)
                return ls, ls[0][0]

            return jax.lax.scan(body, leaves, xs)

        # xs below threshold -> all iterations take the forward branch
        xs = jnp.linspace(0.0, 0.4, iters)
        r = loop(leaves, xs)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = loop(leaves, xs)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters * 1e3
        return dt

    print("== identity-able accept branch (XLA aliases; copies elided) ==")
    for K in (2, 45, 90):
        print(f"  K={K:3d}: {bench(K, 180.0):7.3f} ms/iter", flush=True)
    print("== fresh-buffer accept branch, reject path (the real structure) ==")
    print("-- vary leaf count K at fixed 180 MB total --")
    for K in (2, 8, 16, 45, 90):
        print(f"  K={K:3d}: {bench(K, 180.0, fresh=True):7.3f} ms/iter",
              flush=True)
    print("-- vary bytes at fixed K=45 --")
    for mb in (20.0, 90.0, 180.0, 360.0):
        print(f"  {mb:5.0f} MB: {bench(45, mb, fresh=True):7.3f} ms/iter",
              flush=True)
    print("-- vary bytes at fixed K=4 (packed) --")
    for mb in (90.0, 180.0, 360.0):
        print(f"  {mb:5.0f} MB: {bench(4, mb, fresh=True):7.3f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()
