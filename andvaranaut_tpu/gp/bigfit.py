"""Large-N MAP fitting through the mixed-precision path.

Reverse-mode autodiff through the blocked int8-Ozaki factorisation
compiles impractically on this platform, so gradients use the classical
closed form instead (what the reference's PyTensor graph computes
symbolically, gpmcmc.py:326-346 via pm.find_MAP):

    d logL / d theta = 1/2 a' (dK/dtheta) a - 1/2 tr(K^-1 dK/dtheta),
    a = K^-1 y

One explicit K^-1 (two O(N^3) slice matmuls via the stored block
inverses) serves every hyperparameter; each dK/dtheta comes from
forward-mode autodiff of the ELEMENTWISE Gram assembly only — no
factorisation in the differentiated graph, so the jvp lowers to pure
elementwise TPU code.  This covers the full reference kernel algebra
('+'/'*' compositions of RBF/Matern52/Matern32/Exponential/RatQuad,
gpmcmc.py:282-307) with ARD lengthscales, noise, and RatQuad alpha.

This module is the 16k-scale fit engine (BASELINE.json north star);
the small/medium-N engine path additionally supports learnable warpings
(iwgp/cwgp), which stay on the f64 autodiff path.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import kernels, precision

_LOG_2PI = math.log(2.0 * math.pi)


def _default_rvpack(nx, kerns, noise, truncate=False):
    from ..lhc import _none_conrev
    from . import engine

    cfg = engine.FitConfig(
        kerns=tuple(kerns), ops=(), noise=noise, truncate=truncate,
        jitter=0.0, iwgp=False, cwgp=False, priors=[None] * nx,
        xconrevs=[_none_conrev()] * nx, yconrevs=[_none_conrev()],
        x=np.zeros((1, nx)), y=np.zeros((1, 1)))
    return engine.build_rvs(cfg)


def _grad_inv_iters() -> int:
    """ANDVARANAUT_GRAD_INV_ITERS: refinement sweeps of the L^-1
    identity solve inside the GRADIENT pipeline (default 1).

    Each sweep is two extra (block, n) slice matmuls per factorisation
    step (~5e11 MACs over the 16k solve).  Measured on-chip
    (2026-08-20, 16k MAP A/B at the fused-grad config):
    - 2 sweeps: 1.76 s per value+grad, logpost 51911.75
    - 1 sweep:  1.55 s (-12%), logpost 51911.76, SAME hypers — the
      single sweep already restores the composed inverse past what
      the ftol test can see; now the default.
    - 0 sweeps: 1.34 s but logpost stalls at 51898.8 — the slice-grade
      errors compound across the 16 block-row steps into a ~1e-9
      composed inverse and L-BFGS-B reads the gradient noise as
      convergence ~13 nats early.  Throughput-only setting."""
    import os

    v = int(os.environ.get("ANDVARANAUT_GRAD_INV_ITERS", "1"))
    if v < 0:
        raise ValueError(
            "ANDVARANAUT_GRAD_INV_ITERS must be >= 0, got %d" % v)
    return v


def nlml_value_and_grad(X, y, z, kerns=("RBF",), ops=(), noise=True,
                        jitter=1e-6, block: int = 1024, rvpack=None):
    """Log marginal likelihood and gradient wrt unconstrained z for the
    full kernel algebra through the mixed-precision blocked factorisation.

    z is in the rvpack's unconstrained space (constrained values recovered
    via its forward transforms — log for the default menu, sigmoid-interval
    for truncate priors).  Returns (logl, grad_z).
    """
    if rvpack is None:
        rvpack = _default_rvpack(X.shape[1], kerns, noise)
    return _nlml_vg(X, y, z, rvpack, tuple(kerns), tuple(ops), noise,
                    float(jitter), int(block),
                    inv_iters=_grad_inv_iters(), shrink=_fit_shrink())


def _fit_shrink() -> int:
    """Cholesky level-shrink for the fit/MCMC value+grad programs —
    compile-bound workflows default to ONE full-height level (see
    precision.fit_shrink)."""
    return precision.fit_shrink()


@partial(jax.jit, static_argnames=(
    "rvpack", "kerns", "ops", "noise", "jitter", "block", "inv_iters",
    "shrink"))
def _nlml_vg(X, y, z, rvpack, kerns, ops, noise, jitter, block,
             inv_iters=2, shrink=None):
    n, nx = X.shape
    has_alpha = "RatQuad" in kerns
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def gram_fn(zz):
        """Elementwise-only Gram assembly (jvp-safe on TPU: no dots).

        The diagonal is added through a fused iota comparison — a
        materialised jnp.eye(n) is a whole-program-lifetime n^2 f64
        buffer (2.15 GB at 16k) on a chip this program already filled."""
        vals = rvpack.unpack(zz)
        gv_ = vals["gv"][0] if noise else jnp.asarray(0.0, zz.dtype)
        l_ = vals["l"]
        kv_ = vals["kv"]
        alpha_ = vals["alpha"][0] if has_alpha else None
        K_ = kernels.gram(kerns, ops, X, X, l_, kv_, alpha_)
        return K_ + jnp.where(row_iota == col_iota, jitter + gv_, 0.0)

    K = gram_fn(z)
    L, Dinv = precision.blocked_cholesky(K, block=block, return_inv=True,
                                         shrink=shrink)
    alpha_vec = precision.refined_chol_solve(L, K, y, block=block, Dinv=Dinv)
    logl = (
        -0.5 * jnp.dot(y, alpha_vec)
        - jnp.sum(jnp.log(jnp.diag(L)))
        - 0.5 * n * _LOG_2PI
    )

    # explicit K^-1 = Linv' Linv through the stored block inverses.  A
    # single-block factorisation already returns the full triangular
    # inverse (substitution/pair grade) — reuse it instead of re-deriving
    # it through five n^3 refinement matmuls.  The multi-block inverse
    # runs blocked_inv_lower's pair-carry path on TPU: ONE in-place
    # (hi, lo) carry instead of the generic identity solve's residual +
    # solution + per-step product f64 buffers (which, with the eye rhs,
    # pushed this program to a 20.6 GB compile-time HBM peak at 16k on
    # the 15.7 GB chip).  Its upper triangle is exact zero by
    # construction — no tril pass — so the syrk's w_lower k-chunk skip
    # stays exact.
    # K^-1 is symmetric: compute lower TILE-tiles only through the
    # triangular-grid A^T A syrk (half the MXU work of the full square
    # product), consuming L^-1 in its NATIVE layout — feeding the
    # A A^T kernel L^-T instead made XLA materialise transposed copies
    # of every slice-extraction stage (~18 GB of f32 temps at 16k, the
    # OOM's dominant allocations).  The full mirrored K^-1 is NEVER
    # materialised — the contraction scan below assembles each (n, gb)
    # column block from C's tile-lower half directly (lower part from
    # C's columns, upper part from C's rows transposed; diagonal tiles
    # are computed in full by the kernel so either source is valid
    # there).  At 16k the mirror would be two extra n^2 f64 buffers
    # (~4 GB) on a chip the whole-matrix reverse pass already OOMed
    # once.
    C = _kinv_lower(K, L, Dinv, n, block, inv_iters)

    # All hyperparameter gradients via reverse AD of the ELEMENTWISE Gram
    # assembly with a and K^-1 held constant:
    #   d/dz sum(W o K(z)) = (a' dK a - tr(K^-1 dK)) / 2 per entry,
    #   W = (a a' - K^-1) / 2.
    # The contraction is scanned over column blocks so the backward
    # cotangent planes are (n, gb) instead of (n, n): a whole-matrix
    # reverse pass peaked at 18.5G HBM at 16k (per-dim difference
    # residuals + cotangent accumulators), OOMing the 16G chip.
    a_c = jax.lax.stop_gradient(alpha_vec)
    C_c = jax.lax.stop_gradient(C)
    gb = min(2048, n)
    npad_cols = -(-n // gb) * gb
    nblocks = npad_cols // gb
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    # padded copies used only for column-block slicing; row-side operands
    # stay at their true size n.  Skip the pads entirely at divisible n
    # (the 16k production shape): a zero-width jnp.pad of C is still an
    # op XLA may materialise as a fresh 2.15 GB buffer.
    if npad_cols != n:
        Xp = jnp.pad(X, ((0, npad_cols - n), (0, 0)))
        ap = jnp.pad(a_c, (0, npad_cols - n))
        # C needs rows AND cols padded: each scan step reads a column
        # block (lower half of K^-1) and a row block (transposed upper
        # half)
        Cp = jnp.pad(C_c, ((0, npad_cols - n), (0, npad_cols - n)))
    else:
        Xp, ap, Cp = X, a_c, C_c
    # tile grain of the syrk kernel's defined-lower contract (the CPU
    # path returns the full product, for which either branch is valid)
    _TG = 256

    def gram_cols(zz, XB, s):
        """Columns [s, s+gb) of K(zz) incl. the (jitter+gv) diagonal."""
        vals = rvpack.unpack(zz)
        gv_ = vals["gv"][0] if noise else jnp.asarray(0.0, zz.dtype)
        l_ = vals["l"]
        kv_ = vals["kv"]
        alpha_ = vals["alpha"][0] if has_alpha else None
        Kc = kernels.gram(kerns, ops, X, XB, l_, kv_, alpha_)
        col_ids = s + jax.lax.broadcasted_iota(jnp.int32, (1, gb), 1)
        diag = (row_ids == col_ids).astype(Kc.dtype)
        return Kc + (jitter + gv_) * diag

    def block_term(carry, s):
        XB = jax.lax.dynamic_slice(Xp, (s, 0), (gb, nx))
        aB = jax.lax.dynamic_slice(ap, (s,), (gb,))
        # K^-1 column block assembled from the tile-lower syrk output:
        # rows in tiles >= the column tile come from C's columns, the
        # rest from C's rows transposed (diagonal tiles are computed in
        # full, so the >= branch is valid there).
        CB = jax.lax.dynamic_slice(Cp, (0, s), (n, gb))
        CRB = jax.lax.dynamic_slice(Cp, (s, 0), (gb, n)).T
        col_tile = (s + jnp.arange(gb))[None, :] // _TG
        KinvB = jnp.where(row_ids // _TG >= col_tile, CB, CRB)
        # zero weights on padded phantom columns
        col_ids = s + jnp.arange(gb)
        WB = jnp.where(
            (col_ids < n)[None, :],
            0.5 * (a_c[:, None] * aB[None, :] - KinvB), 0.0)

        @jax.checkpoint
        def h(zz):
            return jnp.sum(WB * gram_cols(zz, XB, s))

        return carry + jax.grad(h)(z), None

    starts = jnp.arange(nblocks) * gb
    grads, _ = jax.lax.scan(block_term, jnp.zeros_like(z), starts)
    return logl, grads


def make_warped_vg(cfg, block: int = 1024):
    """(rvpack, value_and_grad) for iwgp/cwgp FitConfigs through the
    mixed-precision factorisation — the large-N learnable-warping fit
    the reference runs through PyMC's symbolic graph
    (gpmcmc.py:211-277, 310-319).

    The kernel-hyperparameter gradients use the same closed form as
    `_nlml_vg` (W = (a a' - K^-1)/2 contracted against the jvp-safe
    elementwise Gram assembly), with the warped inputs x~(z) rebuilt
    INSIDE the per-column-block checkpoint so iwgp gradients flow
    through the Gram jvp.  The cwgp terms need no factorisation at
    all: d(-1/2 y~' K^-1 y~)/dp = -a' dy~/dp with a = K^-1 y~ held
    constant, and the warping-Jacobian term sum(log der) is
    elementwise — both come from one cheap reverse-AD pass over
    n-sized arrays.  The log-determinant has no y~ dependence.

    Reference RV order/priors come from engine.build_rvs; data-fitted
    wgp stages refit against the running warped data per evaluation
    exactly as the symbolic path does (engine._iwgp_xin /
    transform.wgp semantics)."""
    from . import engine

    rvpack = engine.build_rvs(cfg)
    n, nx = cfg.x.shape
    y1 = cfg.y[:, 0]
    kerns = tuple(cfg.kerns)
    ops = tuple(cfg.ops)
    noise = cfg.noise
    jitter = float(cfg.jitter)
    has_alpha = "RatQuad" in kerns
    import andvaranaut_tpu.transform as tf

    if not cfg.iwgp:
        xin_fixed = np.zeros((n, nx))
        for i in range(nx):
            xin_fixed[:, i] = np.asarray(cfg.xconrevs[i].con(cfg.x[:, i]))
        xin_fixed = jnp.asarray(xin_fixed)
        fixed_cols = None
    else:
        xin_fixed = None
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

    def xin_of(vals):
        if cfg.iwgp:
            return engine._iwgp_xin(cfg, vals, fixed_cols)
        return xin_fixed

    def yin_ldj_of(vals):
        if cfg.cwgp:
            params = engine.interleave_cwgp(vals, pos_mask)
            warper = tf.wgp(
                cfg.yconrevs[0].warping_names, params, y=y1j)
            return warper.con(y1j), jnp.sum(jnp.log(warper.der(y1j)))
        return yin_fixed, jnp.asarray(0.0)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    inv_iters = _grad_inv_iters()

    @jax.jit
    def value_and_grad(z):
        vals = rvpack.unpack(z)
        gv = vals["gv"][0] if noise else jnp.asarray(0.0, z.dtype)
        l = vals["l"]
        kv = vals["kv"]
        alpha_p = vals["alpha"][0] if has_alpha else None
        xin = xin_of(vals)
        yin, ldj = yin_ldj_of(vals)
        K = kernels.gram(kerns, ops, xin, None, l, kv, alpha_p)
        K = K + jnp.where(row_iota == col_iota, jitter + gv, 0.0)
        L, Dinv = precision.blocked_cholesky(
            K, block=block, return_inv=True, shrink=_fit_shrink())
        alpha_vec = precision.refined_chol_solve(
            L, K, yin, block=block, Dinv=Dinv)
        logl = (
            -0.5 * jnp.dot(yin, alpha_vec)
            - jnp.sum(jnp.log(jnp.diag(L)))
            - 0.5 * n * _LOG_2PI
            + ldj
        )
        C = _kinv_lower(K, L, Dinv, n, block, inv_iters)
        a_c = jax.lax.stop_gradient(alpha_vec)
        C_c = jax.lax.stop_gradient(C)

        gb = min(2048, n)
        npad_cols = -(-n // gb) * gb
        nblocks = npad_cols // gb
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        _TG = 256
        # padded slicing copies hoisted OUT of the scan body exactly as
        # _nlml_vg does: inside the body XLA can materialise the pad as
        # a fresh (npad, npad) buffer per step (multi-GB at 16k-scale);
        # zero-width pads are skipped entirely at divisible n
        if npad_cols != n:
            ap = jnp.pad(a_c, (0, npad_cols - n))
            Cp = jnp.pad(C_c, ((0, npad_cols - n), (0, npad_cols - n)))
        else:
            ap, Cp = a_c, C_c

        def block_term(carry, s):
            aB = jax.lax.dynamic_slice(ap, (s,), (gb,))
            CB = jax.lax.dynamic_slice(Cp, (0, s), (n, gb))
            CRB = jax.lax.dynamic_slice(Cp, (s, 0), (gb, n)).T
            col_tile = (s + jnp.arange(gb))[None, :] // _TG
            KinvB = jnp.where(row_ids // _TG >= col_tile, CB, CRB)
            col_ids = s + jnp.arange(gb)
            WB = jnp.where(
                (col_ids < n)[None, :],
                0.5 * (a_c[:, None] * aB[None, :] - KinvB), 0.0)

            @jax.checkpoint
            def h(zz):
                # the warped inputs are rebuilt inside the checkpoint:
                # iwgp gradients flow through the elementwise Gram jvp
                vz = rvpack.unpack(zz)
                gv_ = (vz["gv"][0] if noise
                       else jnp.asarray(0.0, zz.dtype))
                xz = xin_of(vz)
                xzB = (
                    jax.lax.dynamic_slice(
                        jnp.pad(xz, ((0, npad_cols - n), (0, 0))),
                        (s, 0), (gb, nx))
                    if npad_cols != n
                    else jax.lax.dynamic_slice(xz, (s, 0), (gb, nx)))
                az = vz["alpha"][0] if has_alpha else None
                Kc = kernels.gram(kerns, ops, xz, xzB, vz["l"],
                                  vz["kv"], az)
                cids = s + jax.lax.broadcasted_iota(
                    jnp.int32, (1, gb), 1)
                diag = (row_ids == cids).astype(Kc.dtype)
                return jnp.sum(WB * (Kc + (jitter + gv_) * diag))

            return carry + jax.grad(h)(z), None

        starts = jnp.arange(nblocks) * gb
        gK, _ = jax.lax.scan(block_term, jnp.zeros_like(z), starts)

        if cfg.cwgp:
            def warp_terms(zz):
                vz = rvpack.unpack(zz)
                yz, ldjz = yin_ldj_of(vz)
                return -jnp.dot(a_c, yz) + ldjz

            gW = jax.grad(warp_terms)(z)
        else:
            gW = jnp.zeros_like(z)
        return logl, gK + gW

    return rvpack, value_and_grad


def _kinv_lower(K, L, Dinv, n, block, inv_iters):
    """K^-1's lower TILE-tiles through the stored block inverses (the
    shared tail of both gradient pipelines — see the route notes in
    _nlml_vg)."""
    from . import pallas_panel

    single_block = Dinv.shape[0] == 1 and Dinv.shape[1] == n
    if (not single_block and pallas_panel.use_fused_grad()
            and n % block == 0 and precision._use_pair_carry(block, n)):
        from . import pallas_slicemm

        rhi, rlo = precision.blocked_inv_lower(
            L, Dinv=Dinv, solve_iters=inv_iters, return_pair=True)
        w_sl, sW = pallas_panel.pair_to_slices_cols(rhi, rlo)
        return pallas_slicemm.pallas_int_slice_syrk_tn_lower_presliced(
            w_sl, sW, K.dtype, w_lower=True)
    if single_block:
        Linv = jnp.tril(Dinv[0])
    else:
        Linv = precision.blocked_inv_lower(
            L, Dinv=Dinv, solve_iters=inv_iters)
    return precision.slice_syrk_tn_lower(Linv, w_lower=True)


def make_mixed_objective(X, y, kerns=("RBF",), ops=(), noise=True,
                         truncate=False, jitter=1e-6, block: int = 256):
    """(rvpack, neg_log_post) with the NLML through the mixed-precision
    blocked factorisation and a custom VJP from the closed-form gradient.

    This is the TPU NUTS/MAP objective: reverse-differentiating the f64
    chol_nlml graph inlines an emulated-f64 Cholesky + XLA
    triangular_solve into every leapfrog step — both multi-minute-compile
    pathologies on this platform (docs/TPU_NOTES.md) and the prime
    suspect in the round-1 axon worker crash at NUTS scale.  Here the
    compiled program is the compact fori_loop/MXU factorisation, and the
    'gradient' is just the saved closed-form vector.
    """
    X = jnp.asarray(X, dtype=jnp.float64)
    y1 = jnp.asarray(y, dtype=jnp.float64).reshape(-1)
    kerns = tuple(kerns)
    ops = tuple(ops)
    rvpack = _default_rvpack(X.shape[1], kerns, noise, truncate)

    @jax.custom_vjp
    def logl_fn(z):
        val, _ = nlml_value_and_grad(
            X, y1, z, kerns=kerns, ops=ops, noise=noise, jitter=jitter,
            block=block, rvpack=rvpack)
        return val

    def fwd(z):
        val, grad = nlml_value_and_grad(
            X, y1, z, kerns=kerns, ops=ops, noise=noise, jitter=jitter,
            block=block, rvpack=rvpack)
        return val, grad

    def bwd(grad, ct):
        return (ct * grad,)

    logl_fn.defvjp(fwd, bwd)

    def neg_log_post(z):
        return -(logl_fn(z) + rvpack.log_prior(z))

    return rvpack, neg_log_post


def big_warped_map_fit(cfg, block: int = 1024, maxiter: int = 50,
                       start=None, restarts: int = 1, seed: int = 0,
                       verbose: bool = False, ftol: float = 1e-7):
    """MAP fit with learnable warpings (iwgp/cwgp) at large N: host
    L-BFGS-B over the jitted mixed-precision value+grad of
    make_warped_vg.  No log-space box (warp parameters are regularised
    by their reference priors, gpmcmc.py:211-264); non-finite
    evaluations steer the line search back as in big_map_fit.

    Returns (hypers dict incl. iwgp/cwgp blocks, log posterior)."""
    from scipy.optimize import minimize

    rvpack, vg = make_warped_vg(cfg, block=block)
    prior_grad = jax.jit(jax.value_and_grad(rvpack.log_prior))

    def fun(z_np):
        import time as _time

        t0 = _time.time()
        z = jnp.asarray(z_np)
        logl, g = vg(z)
        lp, gp_ = prior_grad(z)
        val = -(float(logl) + float(lp))
        grad = -(np.asarray(g) + np.asarray(gp_))
        if not np.isfinite(val) or not np.isfinite(grad).all():
            val = 1e12
            grad = np.nan_to_num(grad, nan=0.0, posinf=0.0, neginf=0.0)
        if verbose:
            print(f"  nlp={val:.6f} ({_time.time() - t0:.2f} s)")
        return val, grad

    z0 = (
        np.asarray(rvpack.pack_values(start)) if start is not None
        else np.asarray(rvpack.z0()))
    rng = np.random.default_rng(seed)
    best = None
    last_err = None
    for r in range(max(1, restarts)):
        zr = z0 if r == 0 else rng.normal(size=rvpack.total)
        try:
            res = minimize(fun, zr, jac=True, method="L-BFGS-B",
                           options={"maxiter": maxiter, "ftol": ftol})
        except Exception as e:  # noqa: BLE001 — restart loop (see
            # big_map_fit): keep the cause for the all-starts error
            last_err = e
            print(f"big_warped_map_fit: start {r} failed: {e!r}")
            continue
        if np.isfinite(res.fun) and (best is None or res.fun < best.fun):
            best = res
    if best is None:
        raise RuntimeError(
            "mixed-precision warped MAP failed from all starts"
        ) from last_err
    vals = rvpack.unpack(jnp.asarray(best.x))
    hypers = {k: np.asarray(v) for k, v in vals.items()}
    if "gv" in hypers:
        hypers["gv"] = hypers["gv"].reshape(())
    if "alpha" in hypers:
        hypers["alpha"] = hypers["alpha"].reshape(())
    return hypers, -float(best.fun)


def big_map_fit(X, y, kerns=("RBF",), ops=(), noise: bool = True,
                truncate: bool = False, jitter: float = 1e-6,
                block: int = 1024, maxiter: int = 50, start=None,
                restarts: int = 1, seed: int = 0, verbose: bool = False,
                ftol: float = 1e-7):
    """MAP fit at large N: host-side scipy L-BFGS-B over the unconstrained
    hyperparameters with the jitted mixed-precision value-and-grad above,
    plus the reference hyperprior menu (gpmcmc.py:193-208, truncate
    variants included) via the engine RV machinery.

    Returns (hypers dict, log posterior).
    """
    from scipy.optimize import minimize

    from ..lhc import _none_conrev
    from . import engine

    X = np.asarray(X, dtype=np.float64)
    y1 = np.asarray(y, dtype=np.float64).reshape(-1)
    nx = X.shape[1]
    kerns = tuple(kerns)
    ops = tuple(ops)
    cfg = engine.FitConfig(
        kerns=kerns, ops=ops, noise=noise, truncate=truncate, jitter=jitter,
        iwgp=False, cwgp=False, priors=[None] * nx,
        xconrevs=[_none_conrev()] * nx, yconrevs=[_none_conrev()],
        x=X[:1], y=y1[:1].reshape(-1, 1))
    rvpack = engine.build_rvs(cfg)
    prior_grad = jax.jit(jax.value_and_grad(rvpack.log_prior))

    Xj = jnp.asarray(X)
    yj = jnp.asarray(y1)

    def fun(z_np):
        import time as _time

        t0 = _time.time()
        z = jnp.asarray(z_np)
        logl, g = nlml_value_and_grad(
            Xj, yj, z, kerns=kerns, ops=ops, noise=noise, jitter=jitter,
            block=block, rvpack=rvpack)
        lp, gp_ = prior_grad(z)
        val = -(float(logl) + float(lp))
        grad = -(np.asarray(g) + np.asarray(gp_))
        if not np.isfinite(val) or not np.isfinite(grad).all():
            # factorisation left its numerical range (extreme
            # hyperparameters); steer the line search back
            val = 1e12
            grad = np.nan_to_num(grad, nan=0.0, posinf=0.0, neginf=0.0)
        if verbose:
            # first call's wall = the one-time compile; the rest are the
            # steady per-eval cost (float() forces the device read, so
            # this is honest end-to-end timing on the remote service)
            print(f"  nlp={val:.6f} ({_time.time() - t0:.2f} s)")
        return val, grad

    if truncate:
        # truncate priors bound the constrained values through their
        # sigmoid-interval transform; z itself is unbounded
        bounds = None
    else:
        # log-space box keeps the factorisation in its numerical range
        nkern = len(kerns)
        bounds = []
        if noise:
            bounds.append((np.log(1e-12), np.log(1e2)))
        bounds += [(np.log(1e-3), np.log(1e3))] * (nx * nkern)
        bounds += [(np.log(1e-6), np.log(1e6))] * nkern
        if "RatQuad" in kerns:
            bounds.append((np.log(1e-3), np.log(1e3)))

    z0 = (
        np.asarray(rvpack.pack_values(start)) if start is not None
        else np.asarray(rvpack.z0()))
    rng = np.random.default_rng(seed)
    best = None
    last_err = None
    for r in range(max(1, restarts)):
        zr = z0 if r == 0 else rng.normal(size=rvpack.total)
        try:
            # ftol: at 16k each value+grad costs seconds on TPU and the
            # scipy default (2.2e-9 relative) spends ~half the fit's
            # evaluations chasing logpost digits far below statistical
            # meaning (measured: ~60 of 120 evals moved the 16k logpost
            # by < 3e-2 in 5.2e4, with hypers static to 5 digits).
            res = minimize(fun, zr, jac=True, method="L-BFGS-B",
                           bounds=bounds,
                           options={"maxiter": maxiter, "ftol": ftol})
        except Exception as e:  # noqa: BLE001 — restart loop: a start may
            # legitimately fail (line-search collapse at a bad init);
            # keep the error so an all-starts failure names its cause
            # instead of hiding a compile/runtime bug.
            last_err = e
            import traceback

            print(f"big_map_fit: start {r} failed: {e!r}")
            traceback.print_exc()
            continue
        if np.isfinite(res.fun) and (best is None or res.fun < best.fun):
            best = res
    if best is None:
        raise RuntimeError(
            "mixed-precision MAP failed from all starts") from last_err
    vals = rvpack.unpack(jnp.asarray(best.x))
    hypers = {k: np.asarray(v) for k, v in vals.items()}
    if "gv" in hypers:
        hypers["gv"] = hypers["gv"].reshape(())
    if "alpha" in hypers:
        hypers["alpha"] = hypers["alpha"].reshape(())
    return hypers, -float(best.fun)
