"""Vmapped Gauss-Hermite reversion statistics.

The reference loops over prediction points in Python pushing deg-8 GH
sigma-points of the latent Gaussian through the output reversion
(gpmcmc.py:545-569); here the whole quadrature is one vmapped device op.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gh_nodes(deg: int = 8):
    xi, wi = np.polynomial.hermite.hermgauss(deg)
    return jnp.asarray(xi), jnp.asarray(wi)


def gh_stats(rev_fn, mu, var, mean_vals=None, deg: int = 8,
             EI: bool = False, EIopt: str = "min", yopt=0.0,
             normvar: bool = False):
    """Mean/variance (or EI) of the reverted variable.

    rev_fn: vectorised reversion (converted -> original space).
    mu, var: latent GP mean/variance per point, shape (n,).
    mean_vals: mean-function values per point (added after reversion,
    reference gpmcmc.py:551), shape (n,) or None.
    Returns (y, yv) shape (n,) — EI in y when EI=True.
    """
    xi, wi = gh_nodes(deg)
    isqrtpi = 1.0 / math.sqrt(math.pi)
    mu = jnp.asarray(mu).reshape(-1)
    var = jnp.asarray(var).reshape(-1)
    if mean_vals is None:
        mean_vals = jnp.zeros_like(mu)
    else:
        mean_vals = jnp.asarray(mean_vals).reshape(-1)

    def per_point(m, v, ym):
        yi = jnp.sqrt(2.0 * v) * xi + m
        yir = rev_fn(yi) + ym
        ymean = isqrtpi * jnp.sum(wi * yir)
        ym2 = isqrtpi * jnp.sum(wi * yir**2)
        if EI:
            ydiff = yir - yopt if EIopt == "max" else yopt - yir
            ydiff = jnp.where(ydiff > 0.0, ydiff, 0.0)
            out = isqrtpi * jnp.sum(wi * ydiff)
        else:
            out = ymean
        return out, ym2 - ymean**2

    y, yv = jax.vmap(per_point)(mu, var, mean_vals)
    if normvar:
        yv = yv / y**2
    return y, yv


def gh_var_inv(con_fn, yobs, yvarobs, deg: int = 8):
    """Variance of the *converted* variable given observed mean/var —
    observation-noise mapping for inverse problems (gpmcmc.py:573-585)."""
    xi, wi = gh_nodes(deg)
    isqrtpi = 1.0 / math.sqrt(math.pi)
    yobs = jnp.asarray(yobs).reshape(-1)
    yvarobs = jnp.asarray(yvarobs).reshape(-1)

    def per_point(m, v):
        yi = jnp.sqrt(2.0 * v) * xi + m
        yir = con_fn(yi)
        ym = isqrtpi * jnp.sum(wi * yir)
        ym2 = isqrtpi * jnp.sum(wi * yir**2)
        return ym2 - ym**2

    return jax.vmap(per_point)(yobs, yvarobs)
