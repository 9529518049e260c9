"""GP engine core: NLML, MAP fitting, prediction.

This replaces the reference's per-call PyMC model graphs (gpmcmc.py:189 —
a fresh symbolic graph every fit/BO-iteration/inverse call, recompiled by
PyTensor each time) with log-posterior closures jitted once per shape;
gradients come from JAX autodiff, optimisation from on-device L-BFGS.

Likelihood semantics match the reference exactly:
- K = kern(xin) + I*(jitter + gv)      (gpmcmc.py:311-312, 321-323)
- logL = -1/2 y'K^-1 y - sum(log diag L) - n/2 log 2pi [+ sum log yder]
  (gpmcmc.py:316-319)
- hyperpriors: menu of gpmcmc.py:193-264 via unconstrained.RV
- predict: mean = Ks' K^-1 y, var = kss - |L^-1 Ks|^2 + gv (pred_noise=True,
  gpmcmc.py:593 / pm.gp.Marginal._build_conditional)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import transform as tf
from ..inference.lbfgs import minimize_lbfgs
from ..inference.unconstrained import RV, RVPack
from . import kernels

_LOG_2PI = math.log(2.0 * math.pi)


def chol_nlml(K, y):
    """Gaussian log marginal likelihood via Cholesky (positive logL)."""
    L = jnp.linalg.cholesky(K)
    beta = jax.scipy.linalg.solve_triangular(L, y, lower=True)
    return (
        -0.5 * jnp.dot(beta, beta)
        - jnp.sum(jnp.log(jnp.diag(L)))
        - 0.5 * y.shape[0] * _LOG_2PI
    )


@dataclass
class FitConfig:
    """Everything the fit objective needs; python-level, closed over at
    trace time."""

    kerns: tuple
    ops: tuple
    noise: bool
    truncate: bool
    jitter: float
    iwgp: bool
    cwgp: bool
    priors: list            # JAX dists, length nx
    xconrevs: list          # transform objects, length nx
    yconrevs: list          # transform objects, length ny (ny=1 used)
    x: np.ndarray           # (n, nx) raw inputs
    y: np.ndarray           # (n, 1) mean-subtracted raw outputs


def build_rvs(cfg: FitConfig):
    """Hyperprior menu in reference RV order (gv, l, kv, alpha, iwgp,
    cwgp_pos, cwgp) — gpmcmc.py:193-264."""
    nx = cfg.x.shape[1]
    nkern = len(cfg.kerns)
    rvs = []
    if cfg.noise:
        prior = (
            ("truncnormal", 0.0, 1e-3, 1e-15, 1.0)
            if cfg.truncate else ("halfnormal", 1e-3)
        )
        rvs.append(RV("gv", 1, prior))
    rvs.append(RV(
        "l", nx * nkern,
        ("truncnormal", 0.5, 0.15, 1e-3, 100.0)
        if cfg.truncate else ("lognormal", 0.0, 1.0)))
    rvs.append(RV(
        "kv", nkern,
        ("truncnormal", 1.0, 0.15, 1e-1, 100.0)
        if cfg.truncate else ("lognormal", 0.56, 0.75)))
    if "RatQuad" in cfg.kerns:
        rvs.append(RV("alpha", 1, ("lognormal", 0.56, 0.75)))
    if cfg.iwgp:
        rc = sum(
            cr.np for cr in cfg.xconrevs if isinstance(cr, tf.wgp))
        if rc == 0:
            raise Exception(
                "Error: iwgp set to true but none of xconrevs are wgp classes")
        rvs.append(RV(
            "iwgp", rc,
            ("truncnormal", 1.0, 1.0, 1e-3, 5.0)
            if cfg.truncate else ("lognormal", 0.0, 0.25)))
    if cfg.cwgp:
        if not isinstance(cfg.yconrevs[0], tf.wgp):
            raise Exception(
                "Error: cwgp set to true but yconrevs class is not wgp")
        npar = cfg.yconrevs[0].np
        if npar == 0:
            raise Exception(
                "Error: cwgp set to true but wgp class has no tuneable "
                "parameters")
        pos = cfg.yconrevs[0].pos
        rcpos = int(np.sum(pos))
        rcfree = npar - rcpos
        if rcpos > 0:
            rvs.append(RV(
                "cwgp_pos", rcpos,
                ("truncnormal", 1.0, 1.0, 1e-3, 5.0)
                if cfg.truncate else ("lognormal", 0.0, 0.25)))
        if rcfree > 0:
            rvs.append(RV(
                "cwgp", rcfree,
                ("truncnormal", 0.0, 1.0, -10.0, 10.0)
                if cfg.truncate else ("normal", 0.0, 1.0)))
    return RVPack(tuple(rvs))


def interleave_cwgp(vals: dict, pos_mask) -> jnp.ndarray:
    """Merge cwgp_pos/cwgp blocks back into wgp parameter order by the
    positivity mask (gpmcmc.py:265-274)."""
    npar = len(pos_mask)
    pos_idx = np.cumsum(pos_mask) - 1
    free_idx = np.cumsum(~np.asarray(pos_mask)) - 1
    parts = []
    for i in range(npar):
        if pos_mask[i]:
            parts.append(vals["cwgp_pos"][pos_idx[i]])
        else:
            parts.append(vals["cwgp"][free_idx[i]])
    return jnp.stack(parts)


def _iwgp_xin(cfg: FitConfig, vals: dict, fixed_cols: dict):
    """Converted inputs with current iwgp params: wgp dims warped in-graph
    (stages fitted against the raw column, gpmcmc.py:224-231 via iwgp_set),
    other dims use their host-precomputed fixed conversions."""
    cols = []
    rc = 0
    x = cfg.x
    for i, cr in enumerate(cfg.xconrevs):
        if isinstance(cr, tf.wgp):
            ran = cr.np
            w = tf.wgp(
                cr.warping_names, vals["iwgp"][rc : rc + ran],
                y=x[:, i], xdist=cfg.priors[i])
            cols.append(w.con(x[:, i]))
            rc += ran
        else:
            cols.append(fixed_cols[i])
    return jnp.stack(cols, axis=1)


def build_objective(cfg: FitConfig):
    """Returns (rvpack, neg_log_posterior) — the jittable MAP/NUTS target."""
    rvpack = build_rvs(cfg)
    nx = cfg.x.shape[1]
    n = cfg.x.shape[0]
    y1 = cfg.y[:, 0]

    # Fixed (non-learnable) conversions precomputed eagerly on host (inside
    # the trace these would needlessly become graph constants-via-tracers).
    if not cfg.iwgp:
        xin_fixed = np.zeros((n, nx))
        for i in range(nx):
            xin_fixed[:, i] = np.asarray(cfg.xconrevs[i].con(cfg.x[:, i]))
        xin_fixed = jnp.asarray(xin_fixed)
    else:
        fixed_cols = {
            i: jnp.asarray(np.asarray(cr.con(cfg.x[:, i])))
            for i, cr in enumerate(cfg.xconrevs)
            if not isinstance(cr, tf.wgp)
        }
    if not cfg.cwgp:
        yin_fixed = jnp.asarray(np.asarray(cfg.yconrevs[0].con(y1)))
    pos_mask = (
        np.asarray(cfg.yconrevs[0].pos) if cfg.cwgp else None)
    y1j = jnp.asarray(y1)
    eye = jnp.eye(n)

    def neg_log_post(z):
        vals = rvpack.unpack(z)
        gv = vals["gv"][0] if cfg.noise else 0.0
        l = vals["l"]
        kv = vals["kv"]
        alpha = vals["alpha"][0] if "alpha" in vals else None

        if cfg.iwgp:
            xin = _iwgp_xin(cfg, vals, fixed_cols)
        else:
            xin = xin_fixed

        if cfg.cwgp:
            params = interleave_cwgp(vals, pos_mask)
            warper = tf.wgp(
                cfg.yconrevs[0].warping_names, params, y=y1j)
            yin = warper.con(y1j)
            ldj = jnp.sum(jnp.log(warper.der(y1j)))
        else:
            yin = yin_fixed
            ldj = 0.0

        K = kernels.gram(cfg.kerns, cfg.ops, xin, None, l, kv, alpha)
        K = K + eye * (cfg.jitter + gv)
        logl = chol_nlml(K, yin) + ldj
        return -(logl + rvpack.log_prior(z))

    return rvpack, neg_log_post


def round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def make_fit_program(kerns, ops, noise: bool, truncate: bool, jitter: float,
                     nx: int, max_iter: int = 500, tol: float = 1e-8):
    """Shape-polymorphic MAP program for the plain (non-learnable-warping)
    path: one compiled executable per (spec, padded-shape) bucket, reused
    across BO-loop refits and dataset growth (SURVEY.md §7 hard part 5).

    Returns (rvpack, run) with run(z0, xin, yin, valid, nreal) -> (z, val);
    xin/yin are padded to the bucket size with `valid` marking real rows.
    """
    from ..inference.lbfgs import minimize_lbfgs

    cfg_rvs = FitConfig(
        kerns=kerns, ops=ops, noise=noise, truncate=truncate, jitter=jitter,
        iwgp=False, cwgp=False, priors=[None] * nx, xconrevs=[None] * nx,
        yconrevs=[None], x=np.zeros((1, nx)), y=np.zeros((1, 1)))
    rvpack = build_rvs(cfg_rvs)

    def nlp(z, xin, yin, valid, nreal):
        vals = rvpack.unpack(z)
        gv = vals["gv"][0] if noise else 0.0
        l = vals["l"]
        kv = vals["kv"]
        alpha = vals["alpha"][0] if "alpha" in vals else None
        npad = xin.shape[0]
        K = kernels.gram(kerns, ops, xin, None, l, kv, alpha)
        vv = valid.astype(K.dtype)
        K = K * (vv[:, None] * vv[None, :])
        K = K + jnp.diag((1.0 - vv) + vv * (jitter + gv))
        # (mixed-precision large-N MAP goes through gp/bigfit.py's
        # closed-form gradients; this compiled program is the exact-f64
        # autodiff path)
        L = jnp.linalg.cholesky(K)
        beta = jax.scipy.linalg.solve_triangular(L, yin, lower=True)
        logl = (
            -0.5 * jnp.dot(beta, beta)
            - jnp.sum(jnp.log(jnp.diag(L)))
            - 0.5 * nreal * _LOG_2PI
        )
        return -(logl + rvpack.log_prior(z))

    @jax.jit
    def run(z0, xin, yin, valid, nreal):
        fun = lambda z: nlp(z, xin, yin, valid, nreal)  # noqa: E731
        z, val, gnorm, niter = minimize_lbfgs(
            fun, z0, max_iter=max_iter, tol=tol)
        return z, val

    return rvpack, run


def pad_data(xin, yin, bucket: int = 32):
    """Pad converted data to the next bucket multiple with phantom rows."""
    n = xin.shape[0]
    npad = round_up(max(n, 1), bucket)
    valid = jnp.arange(npad) < n
    if npad != n:
        xin = jnp.pad(jnp.asarray(xin), ((0, npad - n), (0, 0)))
        yin = jnp.pad(jnp.asarray(yin), (0, npad - n))
    return jnp.asarray(xin), jnp.asarray(yin), valid


_FIT_PROGRAMS: dict = {}


def get_fit_program(kerns, ops, noise, truncate, jitter, nx,
                    max_iter: int = 500, tol: float = 1e-8):
    """Process-level cache of compiled plain-path MAP programs, keyed by
    model spec (shapes handled by jit)."""
    key = (tuple(kerns), tuple(ops), bool(noise), bool(truncate),
           float(jitter), int(nx), int(max_iter), float(tol))
    if key not in _FIT_PROGRAMS:
        _FIT_PROGRAMS[key] = make_fit_program(
            tuple(kerns), tuple(ops), bool(noise), bool(truncate),
            float(jitter), int(nx), max_iter=max_iter, tol=tol)
    return _FIT_PROGRAMS[key]


def map_fit(cfg: FitConfig, start: dict | None = None, restarts: int = 1,
            seed: int = 0, max_iter: int = 500, tol: float = 1e-8):
    """MAP fit with restarts (random unconstrained-space starts — the
    reference intended this but never passed `start`, gpmcmc.py:330; fixed).

    Returns (hypers dict constrained numpy, logpost float).

    The plain path (no learnable warpings) runs through a cached
    shape-bucketed program: dataset growth in BO loops re-uses the compiled
    executable instead of recompiling per fit.
    """
    plain = not cfg.iwgp and not cfg.cwgp
    if plain:
        nx = cfg.x.shape[1]
        n = cfg.x.shape[0]
        xin = np.zeros((n, nx))
        for i in range(nx):
            xin[:, i] = np.asarray(cfg.xconrevs[i].con(cfg.x[:, i]))
        yin = np.asarray(cfg.yconrevs[0].con(cfg.y[:, 0]))
        xin_p, yin_p, valid = pad_data(xin, yin)
        rvpack, run = get_fit_program(
            cfg.kerns, cfg.ops, cfg.noise, cfg.truncate, cfg.jitter, nx,
            max_iter=max_iter, tol=tol)
        nreal = jnp.asarray(float(n))

        def attempt(zr):
            return run(zr, xin_p, yin_p, valid, nreal)
    else:
        rvpack, nlp = build_objective(cfg)

        def attempt(zr):
            z, val, gnorm, niter = minimize_lbfgs(
                nlp, zr, max_iter=max_iter, tol=tol)
            return z, val

    if start is not None:
        try:
            z0 = rvpack.pack_values(start)
        except (KeyError, TypeError):
            z0 = rvpack.z0()
    else:
        z0 = rvpack.z0()

    best_z, best_val = None, np.inf
    rng = np.random.default_rng(seed)
    for r in range(max(1, restarts)):
        zr = z0 if r == 0 else jnp.asarray(
            rng.normal(size=rvpack.total))
        z, val = attempt(zr)
        val = float(val)
        if np.isfinite(val) and val < best_val:
            best_val, best_z = val, z
    if best_z is None:
        raise RuntimeError("MAP optimisation failed from all starts")
    vals = rvpack.unpack(best_z)
    hypers = {k: np.asarray(v) for k, v in vals.items()}
    if "gv" in hypers:
        hypers["gv"] = hypers["gv"].reshape(())
    if "alpha" in hypers:
        hypers["alpha"] = hypers["alpha"].reshape(())
    return hypers, -best_val


# ---------------------------------------------------------------------------
# Prediction
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("kerns", "ops"))
def chol_state_masked(kerns, ops, xin, yin, valid, l, kv, gv, alpha, jitter):
    """Conditioning state over bucket-padded data: phantom rows form an
    identity block, so solves and predictions are exactly those of the real
    rows while the compiled shape stays fixed as the dataset grows."""
    npad = xin.shape[0]
    K = kernels.gram(kerns, ops, xin, None, l, kv, alpha)
    vv = valid.astype(K.dtype)
    K = K * (vv[:, None] * vv[None, :])
    K = K + jnp.diag((1.0 - vv) + vv * (jitter + gv))
    L = jnp.linalg.cholesky(K)
    v = jax.scipy.linalg.solve_triangular(L, yin, lower=True)
    return L, v


@partial(jax.jit, static_argnames=("kerns", "ops", "fast"))
def predict_from_chol_masked(kerns, ops, xin, valid, L, v, xnew, l, kv, gv,
                             alpha, fast: bool = False):
    Kxs = (
        kernels.gram_fast(kerns, ops, xin, xnew, l, kv, alpha) if fast
        else kernels.gram_cross(kerns, ops, xin, xnew, l, kv, alpha))
    Kxs = Kxs * valid.astype(Kxs.dtype)[:, None]
    A = jax.scipy.linalg.solve_triangular(L, Kxs, lower=True)
    mu = A.T @ v
    kss = kernels.gram(kerns, ops, xnew, None, l, kv, alpha, diag=True)
    # latent posterior variance is >= 0 in exact arithmetic; clamp
    # guards round-off negatives (f64) and the f32-grade fast-gram
    # error near interpolation, which otherwise NaN the GH reversion
    var = jnp.maximum(kss - jnp.sum(A * A, axis=0), 0.0) + gv
    return mu, var


@partial(jax.jit, static_argnames=("kerns", "ops", "block"))
def chol_state_masked_mixed(kerns, ops, xin, yin, valid, l, kv, gv, alpha,
                            jitter, block: int = 1024):
    """Large-N conditioning state through the mixed-precision blocked
    factorisation (no XLA cholesky/triangular_solve — emulated-f64
    cholesky compile-explodes at n >= 8192 on this TPU platform and trsm
    at any size, docs/TPU_NOTES.md).  Data must be padded to a multiple
    of `block` (GPState buckets at the block size on this path)."""
    from . import precision

    K = kernels.gram(kerns, ops, xin, None, l, kv, alpha)
    vv = valid.astype(K.dtype)
    K = K * (vv[:, None] * vv[None, :])
    K = K + jnp.diag((1.0 - vv) + vv * (jitter + gv))
    L, Dinv = precision.blocked_cholesky(K, block=block, return_inv=True,
                                         shrink=precision.fit_shrink())
    # alpha = K^-1 y by factorisation-preconditioned CG (plain refinement
    # stalls at the factorisation-residual floor, ~5e-5 relative at 16k):
    # predictive MEANS contract the exact cross-Gram against it, avoiding
    # the ill-conditioning amplification of a slice-arithmetic whitened
    # solve (measured 4e-4 / 2e-4 mean error via those routes at 16k)
    av = precision.pcg_solve(K, yin, L, Dinv=Dinv, block=block)
    return L, av, Dinv


@partial(jax.jit, static_argnames=("kerns", "ops", "fast"))
def predict_from_chol_masked_mixed(kerns, ops, xin, valid, L, av, Dinv,
                                   xnew, l, kv, gv, alpha,
                                   fast: bool = False):
    """Predictive mean/var from the mixed conditioning state.  Means
    contract the exact f64 cross-Gram against the refined alpha = K^-1 y
    (f64-grade); the variance's whitened solve runs through the blocked
    substitution (slice matmuls — its error is far below the clamped,
    noise-floored variance).  All contractions are fused f64
    broadcast-reduces (f64 dot_general is a platform pathology).

    fast=True swaps the cross-Gram for the fused Pallas f32 tile kernel —
    acquisition-grade accuracy only (BO programs inside compiled loops)."""
    from . import precision

    Kxs = (
        kernels.gram_fast(kerns, ops, xin, xnew, l, kv, alpha) if fast
        else kernels.gram(kerns, ops, xin, xnew, l, kv, alpha))
    Kxs = Kxs * valid.astype(Kxs.dtype)[:, None]
    mu = jnp.sum(Kxs * av[:, None], axis=0)
    # linear-JVP wrapper: BO refine differentiates predictions wrt the
    # query point; the raw mixed substitution's int8 slicing has no AD
    A = precision.solve_lower_linear(L, Kxs, Dinv)
    kss = kernels.gram(kerns, ops, xnew, None, l, kv, alpha, diag=True)
    var = jnp.maximum(kss - jnp.sum(A * A, axis=0), 0.0) + gv
    return mu, var


@partial(jax.jit, static_argnames=("kerns", "ops"))
def chol_state(kerns, ops, xin, yin, l, kv, gv, alpha, jitter):
    """One-time conditioning state: Cholesky of the noisy train Gram and
    whitened targets.  Amortises BO/DE acquisition loops (the reference
    re-conditions inside every gp.predict call)."""
    n = xin.shape[0]
    K = kernels.gram(kerns, ops, xin, None, l, kv, alpha)
    K = K + jnp.eye(n) * (jitter + gv)
    L = jnp.linalg.cholesky(K)
    v = jax.scipy.linalg.solve_triangular(L, yin, lower=True)
    return L, v


@partial(jax.jit, static_argnames=("kerns", "ops", "fast"))
def predict_from_chol(kerns, ops, xin, L, v, xnew, l, kv, gv, alpha,
                      fast: bool = False):
    """Predictive mean/var (pred_noise=True) from cached conditioning."""
    Kxs = (
        kernels.gram_fast(kerns, ops, xin, xnew, l, kv, alpha) if fast
        else kernels.gram_cross(kerns, ops, xin, xnew, l, kv, alpha))
    A = jax.scipy.linalg.solve_triangular(L, Kxs, lower=True)
    mu = A.T @ v
    kss = kernels.gram(kerns, ops, xnew, None, l, kv, alpha, diag=True)
    # latent posterior variance is >= 0 in exact arithmetic; clamp
    # guards round-off negatives (f64) and the f32-grade fast-gram
    # error near interpolation, which otherwise NaN the GH reversion
    var = jnp.maximum(kss - jnp.sum(A * A, axis=0), 0.0) + gv
    return mu, var


@partial(jax.jit, static_argnames=("kerns", "ops"))
def predict_diag(kerns, ops, xin, yin, xnew, l, kv, gv, alpha, jitter):
    """Latent predictive mean/var with noise (pred_noise=True semantics)."""
    n = xin.shape[0]
    K = kernels.gram(kerns, ops, xin, None, l, kv, alpha)
    K = K + jnp.eye(n) * (jitter + gv)
    L = jnp.linalg.cholesky(K)
    Kxs = kernels.gram_cross(kerns, ops, xin, xnew, l, kv, alpha)
    A = jax.scipy.linalg.solve_triangular(L, Kxs, lower=True)
    v = jax.scipy.linalg.solve_triangular(L, yin, lower=True)
    mu = A.T @ v
    kss = kernels.gram(kerns, ops, xnew, None, l, kv, alpha, diag=True)
    # latent posterior variance is >= 0 in exact arithmetic; clamp
    # guards round-off negatives (f64) and the f32-grade fast-gram
    # error near interpolation, which otherwise NaN the GH reversion
    var = jnp.maximum(kss - jnp.sum(A * A, axis=0), 0.0) + gv
    return mu, var


def hypers_to_args(hypers: dict, noise: bool):
    """hypers dict -> (l, kv, gv, alpha) jnp args for predict_diag."""
    l = jnp.asarray(hypers["l"]).reshape(-1)
    kv = jnp.atleast_1d(jnp.asarray(hypers["kv"]))
    gv = (
        jnp.asarray(hypers["gv"]).reshape(())
        if noise and "gv" in hypers else jnp.asarray(0.0)
    )
    alpha = (
        jnp.asarray(hypers["alpha"]).reshape(())
        if "alpha" in hypers and hypers["alpha"] is not None else None
    )
    return l, kv, gv, alpha
