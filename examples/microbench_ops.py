"""Micro-benchmark the sweep's constituent ops at benchmark shapes.

The axon relay executes lazily: ``jax.block_until_ready`` can return without
forcing the computation, so naive timing loops measure dispatch only.  This
harness runs each op ``iters`` times inside one jitted ``lax.fori_loop`` with
a value dependency between iterations (CSE/hoist-proof) and forces execution
with a single scalar host fetch; the 1-iteration loop time is subtracted to
remove fetch/launch overhead.

Usage: python examples/microbench_ops.py
"""

import sys
import time

import numpy as np


def _timed(op, args, iters=10):
    """Milliseconds per op(*args), dependency-chained inside one program."""
    import jax
    import jax.numpy as jnp

    def make_loop(k):
        @jax.jit
        def loop(args):
            def body(i, carry):
                x0, acc = carry
                r = op(x0, *args[1:])
                s = jax.tree.reduce(
                    lambda a, b: a + jnp.sum(b).astype(jnp.float32),
                    r, jnp.zeros((), jnp.float32),
                )
                # re-inject the checksum so iterations are sequentially
                # dependent (multiply by ~0 without being foldable)
                x = x0 + (s * jnp.float32(1e-37)).astype(x0.dtype)
                return (x, acc + s)

            return jax.lax.fori_loop(0, k, body, (args[0], jnp.float32(0)))[1]

        return loop

    lo, hi = make_loop(1), make_loop(1 + iters)
    float(lo(args)); float(hi(args))  # compile both
    t0 = time.perf_counter()
    s0 = float(lo(args))
    t1 = time.perf_counter()
    s1 = float(hi(args))
    t2 = time.perf_counter()
    del s0, s1
    return ((t2 - t1) - (t1 - t0)) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from spamtree_tpu.ops.linalg import chol_inv_masked
    from spamtree_tpu.ops.pallas_chol import chol_and_inv_lanes

    key = jax.random.PRNGKey(0)
    f32 = jnp.float32

    # ---- t5 ref-level shapes: B=1024, S=47, P=249, Q=296
    B, S, P = 1024, 47, 249
    Q = P + S
    A = jax.random.normal(key, (B, S, S), f32)
    spd = A @ A.transpose(0, 2, 1) + 10.0 * jnp.eye(S, dtype=f32)
    mask = jnp.ones((B, S), bool)
    Kxc = jax.random.normal(key, (B, P, S), f32)
    LAi = jax.random.normal(key, (B, P, P), f32) * 0.01
    LAig = LAi[: B // 4]
    cxp = jax.random.uniform(key, (B, P, 2), f32)
    cxr = jax.random.uniform(key, (B, S, 2), f32)

    print(f"pallas chol+inv (1024,47,47)    {_timed(lambda a: chol_and_inv_lanes(a), (spd,)):8.2f} ms")
    print(f"xla chol+inv masked             {_timed(lambda a, m: chol_inv_masked(a, m, False), (spd, mask)):8.2f} ms")
    print(f"M = LAi@Kxc (1024,249,249x47)   {_timed(lambda l, k: l @ k, (LAi, Kxc)):8.2f} ms")
    print(f"H einsum bps,bpq->bsq           {_timed(lambda m, l: jnp.einsum('bps,bpq->bsq', m, l), (Kxc, LAi)):8.2f} ms")
    print(f"M grouped gc=4                  {_timed(lambda l, k: jnp.einsum('gpq,gcqs->gcps', l, k.reshape(B // 4, 4, P, S)), (LAig, Kxc)):8.2f} ms")
    print(f"Gram M'M (->1024,47,47)         {_timed(lambda m: jnp.einsum('bps,bpt->bst', m, m), (Kxc,)):8.2f} ms")

    def cov(cp, cr):
        d = cp[:, :, None, :] - cr[:, None, :, :]
        h = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 0.0))
        return jnp.exp(-h)

    print(f"cov build (1024,249,47)         {_timed(cov, (cxp, cxr)):8.2f} ms")

    Rinv = jax.random.normal(key, (B, S, S), f32)
    Hm = jax.random.normal(key, (B, S, P), f32)

    def jasm(lai, rinv, h):
        J = jnp.zeros((B, Q, Q), f32)
        J = J.at[:, :P, :P].set(lai)
        J = J.at[:, P:, :P].set(-jnp.einsum('bst,btp->bsp', rinv, h))
        J = J.at[:, P:, P:].set(rinv)
        return J

    print(f"J assembly (1024,296,296)       {_timed(jasm, (LAi, Rinv, Hm)):8.2f} ms")

    def jasm_concat(lai, rinv, h):
        top = jnp.concatenate([lai, jnp.zeros((B, P, S), f32)], axis=2)
        bot = jnp.concatenate(
            [-jnp.einsum('bst,btp->bsp', rinv, h), rinv], axis=2
        )
        return jnp.concatenate([top, bot], axis=1)

    print(f"J assembly via concat           {_timed(jasm_concat, (LAi, Rinv, Hm)):8.2f} ms")

    Bt, St, Pt = 357, 40, 296
    Kxt = jax.random.normal(key, (Bt, Pt, St), f32)
    LJt = jax.random.normal(key, (Bt, Pt, Pt), f32) * 0.01
    print(f"thin M (357,296,296x40)         {_timed(lambda l, k: l @ k, (LJt, Kxt)):8.2f} ms")
    print(f"thin H einsum                   {_timed(lambda m, l: jnp.einsum('bps,bpq->bsq', m, l), (Kxt, LJt)):8.2f} ms")

    tbl = jax.random.normal(key, (1024, Q, Q), f32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 1024, 1424), jnp.int32)
    print(f"gather 1424x(296,296)           {_timed(lambda t, i: t[i], (tbl, idx)):8.2f} ms")

    big = jax.random.normal(key, (256, 1024, 1024), f32)
    t_c = _timed(lambda x: x * 1.0000001, (big,))
    print(f"stream 1GB scale (r+w 2GB)      {t_c:8.2f} ms = {2.147/max(t_c,1e-9)*1e3:.0f} GB/s")

    Mm = jax.random.normal(key, (4096, 4096), f32)
    tm = _timed(lambda a: a @ a, (Mm,))
    print(f"4096^3 f32 matmul               {tm:8.2f} ms = {2 * 4096**3 / max(tm,1e-9) / 1e9:.1f} TF/s")
    Mb = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    tb = _timed(lambda a: (a @ a), (Mb,))
    print(f"4096^3 bf16 matmul              {tb:8.2f} ms = {2 * 4096**3 / max(tb,1e-9) / 1e9:.1f} TF/s")


if __name__ == "__main__":
    main()
