"""Geweke (2004) joint-distribution test of the Gibbs cycle.

With theta fixed, compares moments under two samplers of the joint
p(w, beta, tausq, y):

* marginal-conditional: iid forward draws  beta ~ N(0, Vi^-1),
  tausq^-1 ~ Gamma(a, rate b), w ~ treed prior, y | ... ~ N(Xb + w, tausq);
* successive-conditional: alternate one MCMC Gibbs cycle (w, tausq, beta |
  y) with re-simulation of y | (w, beta, tausq).

If the transition kernel is correct both samplers target the same joint, so
moment z-scores must be small.  This is the reference's missing test layer
(SURVEY.md section 4: "Geweke/joint-distribution tests for MCMC correctness").
"""

import numpy as np
import jax
import jax.numpy as jnp

from spamtree_tpu.model.core import (
    ModelStatic,
    gibbs_beta,
    gibbs_tausq,
    gibbs_w,
    prior_sample_w,
    sweep,
)
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


def test_geweke_gibbs_cycle():
    rng = np.random.default_rng(0)
    n, p = 64, 2
    coords = rng.uniform(size=(n, 2))
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords = coords[order]
    mv = np.zeros(n, dtype=np.int64)
    X = rng.normal(size=(n, p))
    tree = make_tree(coords, np.ones(n, bool), mv, axis_cell_size=4, K=2,
                     rng=rng)
    sched = build_schedule(tree)
    tspec = make_theta_spec(2, 1)
    theta = np.array([2.0, 1.0, 1.0, 5.0])

    a_t, b_t = 2.01, 1.0
    Vi = jnp.eye(p)  # beta ~ N(0, I)
    Vim = jnp.zeros((p,))

    # y placeholder; ModelStatic needs y but we rebuild resid each iter via ms.y
    ms = ModelStatic(sched, coords, mv, np.zeros(n), X, tspec.spec,
                     dtype=jnp.float64)
    leveldata, _pd, logdet, ok = sweep(ms, jnp.asarray(theta), jnp.zeros((n + 1,)))
    assert bool(ok)

    Xj = jnp.asarray(X)

    def forward(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        beta = jax.random.normal(k1, (p,))  # Vi = I
        tinv = jax.random.gamma(k2, a_t) / b_t
        w = prior_sample_w(ms, leveldata, k3)[:n]
        y = Xj @ beta + w + jax.random.normal(k4, (n,)) / jnp.sqrt(tinv)
        return beta, tinv, w, y

    fwd = jax.jit(forward)

    def gibbs_cycle(carry, key):
        beta, tinv, w_full, y = carry
        k1, k2, k3, k4 = jax.random.split(key, 4)
        yl = jnp.append(y, 0.0)
        XB = jnp.append(Xj @ beta, 0.0)
        w_full = gibbs_w(ms, leveldata, w_full, tinv[None], XB, k1, y=yl)
        tinv = gibbs_tausq(ms, w_full, XB, k2, (a_t, b_t), y=yl)[0]
        beta2, XB2 = gibbs_beta(ms, w_full, tinv[None], k3, Vi, Vim, y=yl)
        beta = beta2[:, 0]
        y = Xj @ beta + w_full[:n] + jax.random.normal(k4, (n,)) / jnp.sqrt(tinv)
        return (beta, tinv, w_full, y), None

    cyc = jax.jit(lambda c, k: gibbs_cycle(c, k)[0])

    N = 4000
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    fw_beta = np.zeros((N, p))
    fw_tinv = np.zeros(N)
    fw_w2 = np.zeros(N)
    for i in range(N):
        b, ti, w, y = fwd(keys[i])
        fw_beta[i] = np.asarray(b)
        fw_tinv[i] = float(ti)
        fw_w2[i] = float(jnp.mean(w * w))

    b0, t0, w0, y0 = fwd(jax.random.PRNGKey(2))
    carry = (b0, t0, jnp.append(w0, 0.0), y0)
    keys2 = jax.random.split(jax.random.PRNGKey(3), N + 500)
    sc_beta = np.zeros((N, p))
    sc_tinv = np.zeros(N)
    sc_w2 = np.zeros(N)
    for i in range(N + 500):
        carry = cyc(carry, keys2[i])
        if i >= 500:
            sc_beta[i - 500] = np.asarray(carry[0])
            sc_tinv[i - 500] = float(carry[1])
            sc_w2[i - 500] = float(jnp.mean(carry[2][:n] ** 2))

    def zscore(a, b, lag=20):
        # batch-means SE for the (autocorrelated) successive-conditional chain
        nb = len(b) // lag
        bm = b[: nb * lag].reshape(nb, lag).mean(axis=1)
        se = np.sqrt(a.var() / len(a) + bm.var() / nb)
        return (a.mean() - b.mean()) / se

    zs = [
        zscore(fw_beta[:, 0], sc_beta[:, 0]),
        zscore(fw_beta[:, 1], sc_beta[:, 1]),
        zscore(fw_tinv, sc_tinv),
        zscore(fw_w2, sc_w2),
    ]
    assert np.max(np.abs(zs)) < 4.5, zs
