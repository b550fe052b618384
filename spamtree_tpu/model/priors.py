"""Prior log-densities for covariance parameters.

The reference ships lognormal/gamma/invgamma/beta log-densities and a
``calc_prior_logratio`` that is computed but *omitted* from the MH acceptance
ratio (reference: src/mh_adapt.h:204-254, src/spamtree_fit.cpp:239-246), so
informative theta priors are unreachable there.  Here the same densities are
available and actually usable: build a prior with ``make_theta_prior`` and
pass it as ``MCMCConfig.theta_prior`` (or ``spamtree(prior=dict(theta=...))``).
The default (None) reproduces the reference's flat-prior behavior.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln


def lognormal_logdens(x, mu, sigma):
    lx = jnp.log(x)
    return (
        -jnp.log(x * sigma)
        - 0.5 * jnp.log(2.0 * jnp.pi)
        - 0.5 * ((lx - mu) / sigma) ** 2
    )


def gamma_logdens(x, a, b):
    """Shape a, rate b."""
    return a * jnp.log(b) - gammaln(a) + (a - 1.0) * jnp.log(x) - b * x


def invgamma_logdens(x, a, b):
    return a * jnp.log(b) - gammaln(a) - (a + 1.0) * jnp.log(x) - b / x


def beta_logdens(x, a, b):
    lbeta = gammaln(a) + gammaln(b) - gammaln(a + b)
    return (a - 1.0) * jnp.log(x) + (b - 1.0) * jnp.log(1.0 - x) - lbeta


_FAMILIES = {
    "lognormal": lognormal_logdens,
    "gamma": gamma_logdens,
    "invgamma": invgamma_logdens,
    "beta": beta_logdens,
}


def make_theta_prior(spec):
    """Build ``logp(theta) -> scalar`` from a per-dimension spec.

    ``spec`` is either a callable (returned unchanged), or a sequence with one
    entry per theta dimension: ``None`` (flat) or ``(family, a, b)`` with
    family in {lognormal, gamma, invgamma, beta}.  Dimensions left flat
    contribute zero, matching the reference's effective behavior for every
    dimension (spamtree_fit.cpp:239-246 computes and drops the logratio).
    """
    if spec is None:
        return None
    if callable(spec):
        return spec
    entries = []
    for i, s in enumerate(spec):
        if s is None:
            continue
        fam, a, b = s
        if fam not in _FAMILIES:
            raise ValueError(f"unknown prior family {fam!r} for theta[{i}]")
        entries.append((i, _FAMILIES[fam], float(a), float(b)))

    def logp(theta):
        total = jnp.zeros((), dtype=theta.dtype)
        for i, fn, a, b in entries:
            total = total + fn(theta[i], a, b)
        return total

    return logp
