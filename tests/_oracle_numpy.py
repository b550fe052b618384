"""Dense NumPy oracle implementing the REFERENCE sampler semantics.

A from-scratch, per-block, dense-matrix implementation of the reference
package's MCMC (R is absent in this environment, so this is the executable
stand-in for "run the Rcpp reference and compare chains").  It follows the
reference's semantics exactly while sharing no code or data layout with the
JAX sampler under test:

* iteration order  w-Gibbs -> theta-MH -> predict (kept) -> tausq-Gibbs ->
  beta-Gibbs -> save            (reference: src/spamtree_fit.cpp:167-391)
* w-Gibbs: leaf->root blocked Gibbs; reference blocks draw the full
  S-dimensional conditional, thin blocks draw each location independently
  given parents; children contributions enter exactly as the reference's
  Sigi_children/Smu_children messages
                                 (reference: src/spamtree_model.cpp:1011-1226)
* theta-MH: logit transform to the support box, RAM (Vihola 2012) adaptive
  proposal, jacobian term, Cholesky-failure auto-reject, flat prior
                                 (reference: src/spamtree_fit.cpp:203-289,
                                  src/mh_adapt.h:78-135)
* prediction: per-location conditional N(H w_par, r) at NA rows on kept
  iterations                     (reference: src/spamtree_model.cpp:1230-1360)
* tausq / beta conjugate Gibbs   (reference: src/spamtree_model.cpp:1364-1417)

Everything is computed densely from the covariance matrix with plain
``np.linalg`` per-block solves -- no padded level batching, no propagated
joint factors, no message caching across iterations -- so agreement with the
JAX sampler's posterior is evidence the two independently implement the same
model, not a shared-bug tautology.
"""

from __future__ import annotations

import numpy as np


def _logit(x, lo, hi):
    return -np.log((hi - lo) / (x - lo) - 1.0)


def _logistic(x, lo, hi):
    return lo + (hi - lo) / (1.0 + np.exp(-x))


class DenseOracle:
    """SpamTree sampler oracle; q = 1 uses the AG10 fast path
    C(h) = sigma2 * exp(-phi*h) with theta = (sigma2, ., ., phi), q = 2 the
    full AG10 eq.(7) cross-covariance with the reference's theta layout
    (ai1 (q), ai2 (q), phi_i (q), thetamv, D lower-tri) -- implemented here
    directly from the formulas (reference:
    src/covariance_functions.cpp:34-75,213-298), sharing no code with the
    JAX kernels under test."""

    def __init__(self, tree, coords, y, X, bounds, start_theta,
                 start_tausq=0.1, beta_Vi=0.01, tausq_ab=(2.01, 1.0),
                 mcmcsd=0.05, seed=0, mv_id=None, q=1):
        self.rng = np.random.default_rng(seed)
        self.coords = np.asarray(coords, dtype=np.float64)
        self.y = np.asarray(y, dtype=np.float64)
        self.obs = np.isfinite(self.y)
        self.y0 = np.where(self.obs, self.y, 0.0)
        self.X = np.asarray(X, dtype=np.float64)
        self.n, self.p = self.X.shape
        self.q = int(q)
        self.mv = (np.zeros(self.n, dtype=np.int64) if mv_id is None
                   else np.asarray(mv_id, dtype=np.int64))
        self.bounds = np.asarray(bounds, dtype=np.float64)
        self.tausq_ab = tausq_ab
        Vi = np.asarray(beta_Vi, dtype=np.float64)
        self.beta_Vi = Vi if Vi.ndim == 2 else float(Vi) * np.eye(self.p)
        self.D = np.linalg.norm(
            self.coords[:, None, :] - self.coords[None, :, :], axis=-1
        )

        # block structure straight off the tree (reference indexing/parents)
        nb = tree.n_blocks
        lv = np.asarray(tree.block_level)
        levels = sorted(set(int(v) for v in lv))
        is_ref_level = {res: bool(tree.res_is_ref[i] == 1)
                        for i, res in enumerate(levels)}
        self.blocks = []  # (rows, anc_rows, is_ref, anc_offsets per parent)
        self.pred_ids = []
        self.order_leaf_to_root = []
        for u in range(nb):
            rows = np.asarray(tree.block_rows[u], dtype=np.int64)
            pars = list(tree.parents[u])
            anc = (np.concatenate([tree.block_rows[p] for p in pars])
                   if pars else np.zeros(0, dtype=np.int64))
            offs = {}
            o = 0
            for pb in pars:
                offs[int(pb)] = (o, o + len(tree.block_rows[pb]))
                o += len(tree.block_rows[pb])
            self.blocks.append(
                (rows, anc.astype(np.int64), is_ref_level[int(lv[u])], offs)
            )
            if tree.block_ct_obs[u] == 0:
                self.pred_ids.append(u)
        obs_ids = [u for u in range(nb) if tree.block_ct_obs[u] > 0]
        # leaf -> root: deepest level first (reference loops g descending)
        self.order_leaf_to_root = sorted(
            obs_ids, key=lambda u: -int(lv[u])
        )

        # state (beta/tausq carry an outcome axis; q = 1 is the j = 0 slice)
        self.theta = np.asarray(start_theta, dtype=np.float64).copy()
        self.tausq_inv = np.full(self.q, 1.0 / start_tausq)
        self.beta = np.zeros((self.p, self.q))
        self.XB = np.zeros(self.n)
        self.w = np.zeros(self.n)
        sd = np.asarray(mcmcsd, dtype=np.float64)
        self.paramsd = np.linalg.cholesky(
            sd if sd.ndim == 2 else float(sd) * np.eye(len(self.theta))
        )
        self.accept_count = 0
        self.propos_count = 0
        self.cache = self._factor_cache(self.theta)
        assert self.cache is not None, "starting theta fails Cholesky"

    # --- covariance / per-block factors -------------------------------
    def _cov(self, theta):
        if self.q == 1:
            return theta[0] * np.exp(-theta[3] * self.D)
        # AG10 eq.(7): same-margin entries (latent distance v = 0) get
        # ai1^2 C(h,0) + ai2^2 exp(-phi_i h); cross entries
        # ai1_i ai1_j C(h, v).  The base C(h, v) is
        # exp(-c h / sqrt(v+1)) / (v+1) for q == 2 (n_cbase = 1) and the
        # psi-scaled form exp(-c h / psi) / psi^2, psi = (1 + a v)^(b/2),
        # for q > 2 (n_cbase = 3)   (covariance_functions.cpp:113-135,
        # 236-283 semantics, vectorized independently here)
        q = self.q
        n_cbase = 3 if q > 2 else 1
        ai1, ai2 = theta[0:q], theta[q:2 * q]
        phi_i = theta[2 * q:3 * q]
        Dmat = np.zeros((q, q))
        ix = 3 * q + n_cbase
        for j in range(q):
            for i in range(j + 1, q):
                Dmat[i, j] = Dmat[j, i] = theta[ix]
                ix += 1
        mvi, mvj = self.mv[:, None], self.mv[None, :]
        v = Dmat[mvi, mvj]
        if q > 2:
            a, b, c = theta[3 * q:3 * q + 3]
            psi = np.exp(0.5 * b * np.log1p(a * v))
            base = np.exp(-c * self.D / psi) / psi**2
        else:
            c = theta[3 * q]
            base = np.exp(-c * self.D / np.sqrt(v + 1.0)) / (v + 1.0)
        A1 = ai1[self.mv]
        cross = A1[:, None] * A1[None, :] * base
        # phi_i/ai2 are evaluated at mv1 only; on v == 0 entries mv_i == mv_j
        own = (ai2[self.mv] ** 2)[:, None] * np.exp(
            -phi_i[self.mv][:, None] * self.D
        )
        return np.where(v == 0, cross + own, cross)

    def _ti(self, rows):
        """Per-row noise precision tau^-2_{mv(i)}, zero at missing rows."""
        return self.tausq_inv[self.mv[rows]] * self.obs[rows]

    def _factor_cache(self, theta):
        """Per observed block: H (S,P), prior precision pieces; None on
        Cholesky failure (the reference's auto-reject)."""
        C = self._cov(theta)
        cache = {}
        loglik = 0.0
        for u in self.order_leaf_to_root:
            rows, anc, is_ref, _ = self.blocks[u]
            if anc.size:
                Kaa = C[np.ix_(anc, anc)]
                Kau = C[np.ix_(anc, rows)]
                try:
                    H = np.linalg.solve(Kaa, Kau).T
                except np.linalg.LinAlgError:
                    return None
                R = C[np.ix_(rows, rows)] - H @ Kau
            else:
                H = np.zeros((len(rows), 0))
                R = C[np.ix_(rows, rows)]
            if is_ref:
                try:
                    L = np.linalg.cholesky(0.5 * (R + R.T))
                except np.linalg.LinAlgError:
                    return None
                Rinv = np.linalg.inv(L.T) @ np.linalg.inv(L)
                logdet = 2.0 * np.sum(np.log(np.diag(L)))
                cache[u] = (H, Rinv, None, logdet)
            else:
                r = np.diag(R).copy()
                if np.any(r <= 0):
                    return None
                cache[u] = (H, None, r, np.sum(np.log(r)))
        return cache

    def _loglik_w(self, cache):
        """sum_u log N(w_u; H_u w_anc, R_u) under the cached factors."""
        ll = 0.0
        for u in self.order_leaf_to_root:
            rows, anc, is_ref, _ = self.blocks[u]
            H, Rinv, r, logdet = cache[u]
            e = self.w[rows] - (H @ self.w[anc] if anc.size else 0.0)
            if is_ref:
                ll += -0.5 * logdet - 0.5 * e @ Rinv @ e
            else:
                ll += -0.5 * logdet - 0.5 * np.sum(e * e / r)
        return ll

    # --- one reference-ordered MCMC iteration -------------------------
    def gibbs_w(self):
        """Leaf->root blocked Gibbs with child->parent messages.

        Messages are formed AT CHILD-UPDATE TIME (the reference writes
        Sigi_children/Smu_children when the child is sampled,
        spamtree_model.cpp:1158-1210, and never refreshes them), so a
        message's co-parent values can be one sweep stale by the time the
        parent reads it.  This is deliberate: it is the reference's kernel,
        and the JAX sampler under test reproduces the same timing
        (core.py gibbs_w emits per-segment messages inside the child's
        level pass) -- the oracle must too, or the two samplers would
        target minutely different distributions on trees with >= 3
        generations of full ancestry."""
        msgs = {u: [] for u in self.order_leaf_to_root}  # (Sig, vec) pairs
        for u in self.order_leaf_to_root:
            rows, anc, is_ref, offs = self.blocks[u]
            H, Rinv, r, _ = self.cache[u]
            S = len(rows)
            Qprior = Rinv if is_ref else np.diag(1.0 / r)
            ti = self._ti(rows)
            Q = Qprior + np.diag(ti)
            b = (Qprior @ (H @ self.w[anc]) if anc.size
                 else np.zeros(S))
            b = b + ti * (self.y0[rows] - self.XB[rows])
            for Sig_m, v_m in msgs[u]:
                Q += Sig_m
                b += v_m
            L = np.linalg.cholesky(0.5 * (Q + Q.T))
            mu = np.linalg.solve(L.T, np.linalg.solve(L, b))
            z = np.linalg.solve(L.T, self.rng.standard_normal(S))
            self.w[rows] = mu + z
            # emit messages to every ancestor now, from current state:
            # m_a = G_a' Qprior (w_u - H w_anc) + (G_a' Qprior G_a) w_a
            if anc.size:
                e = self.w[rows] - H @ self.w[anc]
                for pb, (lo, hi) in offs.items():
                    if pb not in msgs:
                        continue  # ancestor already sampled (never happens
                        # leaf->root) or not an observed block
                    G = H[:, lo:hi]
                    GQ = G.T @ Qprior
                    Sig_m = GQ @ G
                    v_m = GQ @ e + Sig_m @ self.w[anc[lo:hi]]
                    msgs[pb].append((Sig_m, v_m))

    def theta_mh(self, adapting, it):
        self.propos_count += 1
        nt = len(self.theta)
        lo, hi = self.bounds[:, 0], self.bounds[:, 1]
        U = self.rng.standard_normal(nt)
        prop = _logistic(
            _logit(self.theta, lo, hi) + self.paramsd @ U, lo, hi
        )
        margin = np.maximum(8.0 * np.finfo(float).eps * (hi - lo), 1e-10)
        prop = np.clip(prop, lo + margin, hi - margin)
        new_cache = self._factor_cache(prop)
        acceptable = new_cache is not None
        if acceptable:
            new_ll = self._loglik_w(new_cache)
            cur_ll = self._loglik_w(self.cache)
            jac = np.sum(
                -np.log(hi - self.theta) - np.log(self.theta - lo)
                + np.log(hi - prop) + np.log(prop - lo)
            )
            logaccept = new_ll - cur_ll + jac
            alpha = min(1.0, np.exp(min(logaccept, 0.0)))
        else:
            logaccept, alpha = -np.inf, 0.0
        if self.rng.uniform() < alpha:
            self.theta = prop
            self.cache = new_cache
            self.accept_count += 1
        if adapting:
            # Vihola (2012) rank-1 coercion toward acceptance 0.234
            a = min(1.0, np.exp(logaccept)) if acceptable else 0.0
            eta = min(1.0, nt * (it + 1.0) ** (-(0.5 + 1e-6)))
            Sig = np.eye(nt) + eta * (a - 0.234) * np.outer(U, U) / (U @ U)
            Snew = self.paramsd @ Sig @ self.paramsd.T
            try:
                self.paramsd = np.linalg.cholesky(0.5 * (Snew + Snew.T))
            except np.linalg.LinAlgError:
                pass

    def predict(self):
        """Sample w at NA locations given the current tree state."""
        C = self._cov(self.theta)
        for u in self.pred_ids:
            rows, anc, _is_ref, _ = self.blocks[u]
            Kaa = C[np.ix_(anc, anc)]
            Kau = C[np.ix_(anc, rows)]
            H = np.linalg.solve(Kaa, Kau).T
            r = np.maximum(
                np.diag(C[np.ix_(rows, rows)] - H @ Kau), 1e-12
            )
            self.w[rows] = H @ self.w[anc] + np.sqrt(r) * \
                self.rng.standard_normal(len(rows))

    def gibbs_tausq(self):
        # per outcome j (reference: gibbs_sample_tausq loops margins,
        # spamtree_model.cpp:1393-1417)
        resid_all = self.y0 - self.XB - self.w
        for j in range(self.q):
            m = self.obs & (self.mv == j)
            resid = resid_all[m]
            a = self.tausq_ab[0] + m.sum() / 2.0
            rate = self.tausq_ab[1] + 0.5 * resid @ resid
            self.tausq_inv[j] = self.rng.gamma(a, 1.0 / rate)

    def gibbs_beta(self):
        # per outcome j (reference: gibbs_sample_beta, .cpp:1360-1391)
        for j in range(self.q):
            m = self.obs & (self.mv == j)
            Xo = self.X[m]
            Si = self.tausq_inv[j] * Xo.T @ Xo + self.beta_Vi
            L = np.linalg.cholesky(0.5 * (Si + Si.T))
            rhs = self.tausq_inv[j] * Xo.T @ (self.y0 - self.w)[m]
            mu = np.linalg.solve(L.T, np.linalg.solve(L, rhs))
            self.beta[:, j] = mu + np.linalg.solve(
                L.T, self.rng.standard_normal(self.p)
            )
        self.XB = np.sum(self.X * self.beta[:, self.mv].T, axis=1)

    def run(self, keep, burn, thin=1, adapting=True, sample_theta=True):
        out = {"w": [], "yhat": [], "beta": [], "tausq": [], "theta": []}
        total = burn + keep * thin
        for m in range(total):
            kept = m >= burn and (m - burn) % thin == 0
            self.gibbs_w()
            if sample_theta:
                self.theta_mh(adapting, m)
            if kept:
                self.predict()
            self.gibbs_tausq()
            self.gibbs_beta()
            if kept:
                out["w"].append(self.w.copy())
                out["yhat"].append(
                    self.XB + self.w
                    + self.rng.standard_normal(self.n)
                    / np.sqrt(self.tausq_inv[self.mv])
                )
                out["beta"].append(self.beta.copy())
                out["tausq"].append(1.0 / self.tausq_inv)
                out["theta"].append(self.theta.copy())
        return {k: np.asarray(v) for k, v in out.items()}
