"""Large-N MAP fitting through the mixed-precision path.

Reverse-mode autodiff through the blocked int8-Ozaki factorisation
compiles impractically on this platform, so gradients use the classical
closed form instead (what the reference's PyTensor graph computes
symbolically, gpmcmc.py:326-346 via pm.find_MAP):

    d logL / d theta = 1/2 a' (dK/dtheta) a - 1/2 tr(K^-1 dK/dtheta),
    a = K^-1 y

With W = (a a' - K^-1) o K_rbf, every hyperparameter gradient is an
elementwise contraction of W — one explicit K^-1 (two O(N^3) slice
matmuls via the stored block inverses) serves all parameters.

RBF (+noise) only for now — the small/medium-N engine path supports the
full kernel algebra; this module is the 16k-scale fit engine
(BASELINE.json north star).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import precision

_LOG_2PI = math.log(2.0 * math.pi)


@partial(jax.jit, static_argnames=("noise", "jitter", "block"))
def rbf_nlml_value_and_grad(X, y, z, noise=True, jitter=1e-6,
                            block: int = 1024):
    """Log marginal likelihood and gradient wrt unconstrained
    z = [log gv (if noise), log l (nx), log kv] for an ARD-RBF GP.

    Returns (logl, grad_z).
    """
    n, nx = X.shape
    off = 1 if noise else 0
    gv = jnp.exp(z[0]) if noise else 0.0
    l = jnp.exp(z[off : off + nx])
    kv = jnp.exp(z[off + nx])

    # ARD squared distance per dim (difference form; no f64 matmuls).
    # Per-dim matrices are recomputed in the gradient loop rather than
    # kept alive: nx extra O(n^2) buffers would OOM at 16k.
    Xs = X / l

    def dim_sq(k):
        d = Xs[:, k, None] - Xs[None, :, k]
        return d * d

    r2 = dim_sq(0)
    for k in range(1, nx):
        r2 = r2 + dim_sq(k)
    K = kv * jnp.exp(-0.5 * r2) + (jitter + gv) * jnp.eye(n, dtype=X.dtype)

    L, Dinv = precision.blocked_cholesky(
        K, block=block, return_inv=True)
    alpha = precision.refined_chol_solve(L, K, y, block=block, Dinv=Dinv)
    logl = (
        -0.5 * jnp.dot(y, alpha)
        - jnp.sum(jnp.log(jnp.diag(L)))
        - 0.5 * n * _LOG_2PI
    )

    # explicit K^-1 = Linv' Linv through the stored block inverses
    eye = jnp.eye(n, dtype=X.dtype)
    Linv = precision.blocked_solve_lower(
        L, eye, block=block, Dinv=Dinv)
    Kinv = precision.slice_matmul(Linv.T, Linv)

    # kv*R recovered from K (avoids keeping R); W fused into each
    # contraction rather than materialised
    kvR = K - (jitter + gv) * jnp.eye(n, dtype=X.dtype)

    def wsum(mask):
        return 0.5 * jnp.sum(
            (alpha[:, None] * alpha[None, :] - Kinv) * kvR * mask)

    grads = []
    if noise:
        g_zg = 0.5 * gv * (jnp.dot(alpha, alpha) - jnp.trace(Kinv))
        grads.append(g_zg)
    for k in range(nx):
        grads.append(wsum(dim_sq(k)))
    grads.append(wsum(1.0))
    return logl, jnp.stack(grads)


def big_map_fit(X, y, noise: bool = True, jitter: float = 1e-6,
                block: int = 1024, maxiter: int = 50, start=None,
                verbose: bool = False):
    """MAP fit of an ARD-RBF GP at large N: host-side scipy L-BFGS-B over
    the unconstrained hyperparameters with the jitted mixed-precision
    value-and-grad above, plus the reference hyperprior menu
    (gpmcmc.py:193-208) via the engine RV machinery.

    Returns (hypers dict, log posterior).
    """
    from scipy.optimize import minimize

    from ..lhc import _none_conrev
    from . import engine

    X = np.asarray(X, dtype=np.float64)
    y1 = np.asarray(y, dtype=np.float64).reshape(-1)
    nx = X.shape[1]
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=noise, truncate=False, jitter=jitter,
        iwgp=False, cwgp=False, priors=[None] * nx,
        xconrevs=[_none_conrev()] * nx, yconrevs=[_none_conrev()],
        x=X[:1], y=y1[:1].reshape(-1, 1))
    rvpack = engine.build_rvs(cfg)
    prior_grad = jax.jit(jax.value_and_grad(rvpack.log_prior))

    Xj = jnp.asarray(X)
    yj = jnp.asarray(y1)

    def fun(z_np):
        z = jnp.asarray(z_np)
        logl, g = rbf_nlml_value_and_grad(
            Xj, yj, z, noise=noise, jitter=jitter, block=block)
        lp, gp_ = prior_grad(z)
        val = -(float(logl) + float(lp))
        grad = -(np.asarray(g) + np.asarray(gp_))
        if not np.isfinite(val) or not np.isfinite(grad).all():
            # factorisation left its numerical range (extreme
            # hyperparameters); steer the line search back
            val = 1e12
            grad = np.nan_to_num(grad, nan=0.0, posinf=0.0, neginf=0.0)
        if verbose:
            print(f"  nlp={val:.6f}")
        return val, grad

    z0 = (
        np.asarray(rvpack.pack_values(start)) if start is not None
        else np.asarray(rvpack.z0()))
    # log-space box keeps the factorisation in its numerical range
    bounds = []
    if noise:
        bounds.append((np.log(1e-12), np.log(1e2)))
    bounds += [(np.log(1e-3), np.log(1e3))] * nx
    bounds.append((np.log(1e-6), np.log(1e6)))
    res = minimize(fun, z0, jac=True, method="L-BFGS-B", bounds=bounds,
                   options={"maxiter": maxiter})
    vals = rvpack.unpack(jnp.asarray(res.x))
    hypers = {k: np.asarray(v) for k, v in vals.items()}
    if "gv" in hypers:
        hypers["gv"] = hypers["gv"].reshape(())
    return hypers, -float(res.fun)
