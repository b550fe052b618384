"""Theta parameterization: uniform-box priors, bounds and starting values.

Mirrors the defaults built by the reference front-end
(reference: R/spamtree_fit.R:84-157) for the AG10 spatial models, and the
multi-input nonspatial model (R/spamtree_fit.R:141-157).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from spamtree_tpu.ops.covariance import CovModel, make_cov_model


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
