"""Unconstrained-space reparameterisation of constrained random variables.

Replaces PyMC's automatic variable transforms: MAP optimisation and NUTS both
run over an unconstrained flat vector z; each RV contributes its prior logpdf
*plus the transform log-Jacobian*, exactly as PyMC's ``find_MAP``/NUTS operate
on transformed free RVs (this is what makes our MAP optima match the
reference's, e.g. the LogNormal hyperpriors of gpmcmc.py:207-208).

Supported priors mirror the reference's hyperprior menu (gpmcmc.py:193-264):
halfnormal (log transform), lognormal (log), normal (identity), and
truncated-normal (interval/logodds transform).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtr

_LOG_2PI = math.log(2.0 * math.pi)


@dataclass(frozen=True)
class RV:
    """One named block of the unconstrained parameter vector.

    prior: ('halfnormal', sigma) | ('lognormal', mu, sigma) |
           ('normal', mu, sigma) | ('truncnormal', mu, sigma, lo, hi) |
           ('uniform', lo, hi)
    The transform is implied by the prior family (log / log / identity /
    interval / interval respectively), matching PyMC defaults.
    """

    name: str
    size: int
    prior: tuple
    initval: float | None = None  # constrained-space start (default: moment)

    # -- transform ------------------------------------------------------
    def forward(self, z):
        """Unconstrained z -> constrained v."""
        kind = self.prior[0]
        if kind in ("halfnormal", "lognormal"):
            return jnp.exp(z)
        if kind == "normal":
            return z
        if kind == "truncnormal":
            _, _, _, lo, hi = self.prior
            return lo + (hi - lo) * jax.nn.sigmoid(z)
        if kind == "uniform":
            _, lo, hi = self.prior
            return lo + (hi - lo) * jax.nn.sigmoid(z)
        raise ValueError(kind)

    def inverse(self, v):
        kind = self.prior[0]
        if kind in ("halfnormal", "lognormal"):
            return jnp.log(v)
        if kind == "normal":
            return v
        if kind in ("truncnormal", "uniform"):
            lo, hi = self.prior[-2], self.prior[-1]
            p = (v - lo) / (hi - lo)
            p = jnp.clip(p, 1e-12, 1.0 - 1e-12)
            return jnp.log(p) - jnp.log1p(-p)
        raise ValueError(kind)

    def log_jac(self, z):
        """log |dv/dz| elementwise."""
        kind = self.prior[0]
        if kind in ("halfnormal", "lognormal"):
            return z
        if kind == "normal":
            return jnp.zeros_like(z)
        if kind in ("truncnormal", "uniform"):
            lo, hi = self.prior[-2], self.prior[-1]
            return (
                math.log(hi - lo)
                + jax.nn.log_sigmoid(z)
                + jax.nn.log_sigmoid(-z)
            )
        raise ValueError(kind)

    # -- prior ----------------------------------------------------------
    def logpdf(self, v):
        kind = self.prior[0]
        if kind == "halfnormal":
            sigma = self.prior[1]
            return (
                math.log(2.0)
                - 0.5 * ((v / sigma) ** 2 + _LOG_2PI)
                - math.log(sigma)
            )
        if kind == "lognormal":
            _, mu, sigma = self.prior
            logv = jnp.log(v)
            return (
                -0.5 * (((logv - mu) / sigma) ** 2 + _LOG_2PI)
                - logv
                - math.log(sigma)
            )
        if kind == "normal":
            _, mu, sigma = self.prior
            return -0.5 * (((v - mu) / sigma) ** 2 + _LOG_2PI) - math.log(sigma)
        if kind == "truncnormal":
            _, mu, sigma, lo, hi = self.prior
            za = (lo - mu) / sigma
            zb = (hi - mu) / sigma
            lognorm = jnp.log(ndtr(zb) - ndtr(za))
            return (
                -0.5 * (((v - mu) / sigma) ** 2 + _LOG_2PI)
                - math.log(sigma)
                - lognorm
            )
        if kind == "uniform":
            _, lo, hi = self.prior
            return -math.log(hi - lo) * jnp.ones_like(v)
        raise ValueError(kind)

    # -- init -----------------------------------------------------------
    def moment(self):
        """PyMC-style initial point in constrained space."""
        if self.initval is not None:
            return float(self.initval)
        kind = self.prior[0]
        if kind == "halfnormal":
            return self.prior[1] * math.sqrt(2.0 / math.pi)
        if kind == "lognormal":
            _, mu, sigma = self.prior
            return math.exp(mu + 0.5 * sigma * sigma)
        if kind == "normal":
            return self.prior[1]
        if kind == "truncnormal":
            _, mu, sigma, lo, hi = self.prior
            return float(min(max(mu, lo + 1e-3 * (hi - lo)), hi - 1e-3 * (hi - lo)))
        if kind == "uniform":
            _, lo, hi = self.prior
            return 0.5 * (lo + hi)
        raise ValueError(kind)


@dataclass(frozen=True)
class RVPack:
    """A fixed ordering of RVs = a flat unconstrained vector layout."""

    rvs: tuple
    offsets: tuple = field(default=())

    def __post_init__(self):
        offs = []
        c = 0
        for rv in self.rvs:
            offs.append(c)
            c += rv.size
        object.__setattr__(self, "offsets", tuple(offs))
        object.__setattr__(self, "total", c)

    def z0(self):
        """Default start: inverse-transform of each RV's moment."""
        import numpy as np

        z = np.zeros(self.total)
        for rv, off in zip(self.rvs, self.offsets):
            z[off : off + rv.size] = float(rv.inverse(rv.moment()))
        return jnp.asarray(z)

    def unpack(self, z):
        """z -> dict of constrained values."""
        out = {}
        for rv, off in zip(self.rvs, self.offsets):
            out[rv.name] = rv.forward(z[off : off + rv.size])
        return out

    def log_prior(self, z):
        """Sum of prior logpdfs + transform Jacobians (the quantity PyMC
        maximises over transformed space in find_MAP)."""
        total = 0.0
        for rv, off in zip(self.rvs, self.offsets):
            zi = z[off : off + rv.size]
            vi = rv.forward(zi)
            total += jnp.sum(rv.logpdf(vi)) + jnp.sum(rv.log_jac(zi))
        return total

    def pack_values(self, values: dict):
        """Constrained dict -> unconstrained flat vector (e.g. warm starts
        from self.hypers, gpmcmc.py:900)."""
        import numpy as np

        z = np.zeros(self.total)
        for rv, off in zip(self.rvs, self.offsets):
            v = np.asarray(values[rv.name], dtype=float).reshape(-1)
            z[off : off + rv.size] = np.asarray(rv.inverse(v))
        return jnp.asarray(z)
