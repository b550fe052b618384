"""Theta parameterization: uniform-box priors, bounds and starting values.

Mirrors the defaults built by the reference front-end
(reference: R/spamtree_fit.R:84-157) for the AG10 spatial models, and the
multi-input nonspatial model (R/spamtree_fit.R:141-157).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from spamtree_tpu.ops.covariance import CovModel, make_cov_model


def auto_start_theta(dd: int, q: int, coords, y, mv_id, elevation: bool = False):
    """Moment-based starting theta (improvement over the reference, which
    starts every parameter at the bounds midpoint -- e.g. 500 with the
    default toplim=1e3, costing thousands of adaptation iterations at q > 1;
    R/spamtree_fit.R:138).

    ai1_j ~ sqrt(0.8 var(y_j)), ai2_j ~ sqrt(0.2 var(y_j)), decay ranges from
    the median pairwise distance of a coordinate subsample, unit latent
    cross-distances.
    """
    y = np.asarray(y, dtype=np.float64)
    mv_id = np.asarray(mv_id)
    coords = np.asarray(coords, dtype=np.float64)
    n = len(y)
    sub = np.random.default_rng(0).choice(n, size=min(n, 500), replace=False)
    d = np.linalg.norm(
        coords[sub, None, : min(coords.shape[1], 3)]
        - coords[None, sub, : min(coords.shape[1], 3)],
        axis=-1,
    )
    med = np.median(d[d > 0]) if (d > 0).any() else 1.0
    decay = 3.0 / max(med, 1e-6)

    var_q = np.array([
        np.nanvar(y[mv_id == u]) if np.isfinite(y[mv_id == u]).any() else 1.0
        for u in np.unique(mv_id)
    ])
    var_q = np.maximum(np.nan_to_num(var_q, nan=1.0), 1e-3)
    if coords.shape[1] == 2 or elevation:
        q_eff = len(var_q)
        n_cbase = 3 if q_eff > 2 else 1
        parts = [
            np.sqrt(0.8 * var_q),  # ai1
            np.sqrt(0.2 * var_q),  # ai2
            np.full(q_eff, decay),  # phi_i
        ]
        if n_cbase == 3:
            parts.append(np.array([1.0, 0.5, decay]))  # a_psi, beta_psi, c_phi
        else:
            parts.append(np.array([decay]))
        if elevation:
            parts.append(np.array([1.0]))
        k = q_eff * (q_eff - 1) // 2
        if k:
            parts.append(np.ones(k))
        return np.concatenate(parts)
    else:
        return np.concatenate([[float(var_q.mean())], np.full(coords.shape[1], decay)])


@dataclass(frozen=True)
class ThetaSpec:
    """Static description of the theta vector and its uniform support box."""

    spec: CovModel
    bounds: np.ndarray  # (n_theta, 2) float64
    start: np.ndarray  # (n_theta,)

    @property
    def n_theta(self) -> int:
        return self.bounds.shape[0]


def make_theta_spec(
    dd: int,
    q: int,
    btmlim: float = 1e-3,
    toplim: float = 1e3,
    vlim: float | None = None,
    elevation: bool = False,
    set_unif_bounds: np.ndarray | None = None,
    start_theta: np.ndarray | None = None,
) -> ThetaSpec:
    """Build bounds/start for theta (reference: R/spamtree_fit.R:84-157).

    Layout for the AG10 models: (ai1[q], ai2[q], phi_i[q], thetamv[n_cbase]
    [, d_elevation]) followed by k = q(q-1)/2 latent cross-distances (Dmat).
    For the nonspatial model: (sigmasq, kweights[dd]).
    """
    if vlim is None:
        vlim = toplim
    k = q * (q - 1) // 2

    if dd == 2 or (dd == 3 and elevation):
        spec = make_cov_model(2 if (dd == 3 and elevation) else dd, q,
                              2 if (dd == 3 and elevation) else -1)
        el = 1 if elevation and dd == 3 else 0
        n_cbase = 3 if q > 2 else 1
        npars = 3 * q + n_cbase + el

        bounds = np.zeros((npars, 2))
        bounds[:, 0] = btmlim
        bounds[:, 1] = toplim
        if q > 1:
            # ai1 entries beyond the first may be negative (sign of cross-cov)
            bounds[1:q, 0] = -toplim
        if n_cbase == 3:
            # beta_psi1 in (0, 1); R 1-based row npars-1-el -> 0-based npars-2-el
            bounds[npars - 2 - el, :] = (btmlim, 1.0 - btmlim)
        if q > 1:
            vb = np.zeros((k, 2))
            vb[:, 0] = btmlim
            vb[:, 1] = vlim - btmlim
            bounds = np.vstack([bounds, vb])
        if set_unif_bounds is not None:
            bounds = np.asarray(set_unif_bounds, dtype=np.float64)
        start = bounds.mean(axis=1) if start_theta is None else np.asarray(start_theta)
        start = np.clip(start, bounds[:, 0] + 1e-6, bounds[:, 1] - 1e-6)
        return ThetaSpec(spec=spec, bounds=bounds, start=start)
    else:
        # multi-input nonspatial univariate (reference: R/spamtree_fit.R:141-157)
        spec = make_cov_model(dd, q, -1)
        n_theta = 1 + dd
        if set_unif_bounds is None:
            bounds = np.zeros((n_theta, 2))
            bounds[:, 0] = btmlim
            bounds[:, 1] = toplim
        else:
            bounds = np.asarray(set_unif_bounds, dtype=np.float64)
        start = np.ones(n_theta) if start_theta is None else np.asarray(start_theta)
        return ThetaSpec(spec=spec, bounds=bounds, start=start)
