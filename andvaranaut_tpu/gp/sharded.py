"""Mesh-sharded GP linear algebra for large training sets.

The genuinely scalable axis in this workload is training-set size N: the
O(N^2) Gram matrix and O(N^3) Cholesky (SURVEY.md §2.6; the reference
delegates both to single-host BLAS under PyTensor, gpmcmc.py:310-319).
Here BOTH are distributed over a 1-D ICI device mesh via ``jax.shard_map``:

- Gram: each device builds only its own (N/D, N) row block against an
  all-gathered copy of the (small) input matrix — no device ever holds
  the full N x N matrix.
- Cholesky: an SPMD block-row right-looking factorisation.  At step k the
  diagonal block is psum-broadcast, every device factorises it redundantly
  (m x m, cheap), solves its own panel block locally, the panel column is
  all-gathered over ICI, and each device applies the trailing update to
  its unfinished columns only.  The forward substitution for the NLML
  quadratic form is fused into the same sweep (the per-step beta block is
  replicated, so the log-determinant and quadratic form come out
  replicated with no final collective).

Per step the wire carries one m x m block (psum) + one m-row panel
all-gather: O(N m) total per device — the same order as reading the
matrix once.  Layout is block-row (device d owns rows [d m, (d+1) m)); a
block-cyclic layout would improve tail-step load balance at the cost of
much harder indexing and is not worth it at D <= 16.

NUTS chain parallelism is handled separately (inference/nuts.py shards the
vmapped chain axis).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..inference.unconstrained import RV, RVPack
from . import kernels

_LOG_2PI = math.log(2.0 * math.pi)


def data_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (axis,))


def shard_data(mesh: Mesh, X, y, axis: str = "data"):
    """Place training inputs/targets row-sharded on the mesh (rows padded
    to a multiple of the mesh size by the NLML itself, so callers may pass
    any N)."""
    D = mesh.shape[axis]
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    if X.shape[0] % D:
        # leave padding to the objective; an indivisible array cannot be
        # row-sharded, so keep it replicated until then
        return X, y
    xs = jax.device_put(X, NamedSharding(mesh, P(axis, None)))
    ys = jax.device_put(y, NamedSharding(mesh, P(axis)))
    return xs, ys


def _dist_chol_quad(A, r, d, D: int, axis: str):
    """SPMD block-row distributed Cholesky with fused forward substitution.

    A: (m, n) local row block of the SPD matrix (n = D m), r: (m,) local
    rhs block, d: this device's mesh index.  Returns (quad, logdet) with
    quad = r' K^-1 r ... computed as |L^-1 r|^2 — both replicated.

    Unrolled over the D block rows (D is the static mesh size): at step k
      Akk   <- psum-broadcast of device k's diagonal block
      Lkk   <- chol(Akk) redundantly on every device (m x m)
      P_d   <- local panel solve A_dk Lkk^-T
      panel <- all-gather of the column-k panel over the mesh
      A     <- A - L_dk panel[trailing]^T   (unfinished columns only)
      beta_k = Lkk^-1 r_k broadcast; r_d -= L_dk beta_k
    Every per-step reduction quantity (log|Lkk|, |beta_k|^2) is replicated,
    so the outputs need no final collective.
    """
    m = A.shape[0]
    quad = jnp.zeros((), dtype=A.dtype)
    logdet = jnp.zeros((), dtype=A.dtype)
    for k in range(D):
        lo = k * m
        blk = A[:, lo:lo + m]
        Akk = jax.lax.psum(jnp.where(d == k, blk, 0.0), axis)
        Lkk = jnp.linalg.cholesky(Akk)
        Pd = jax.scipy.linalg.solve_triangular(Lkk, blk.T, lower=True).T
        Ldk = jnp.where(d == k, Lkk, jnp.where(d > k, Pd, 0.0))
        rk = jax.lax.psum(jnp.where(d == k, r, 0.0), axis)
        bk = jax.scipy.linalg.solve_triangular(Lkk, rk, lower=True)
        r = r - Ldk @ bk
        quad = quad + jnp.dot(bk, bk)
        logdet = logdet + jnp.sum(jnp.log(jnp.diag(Lkk)))
        if k + 1 < D:
            panel = jax.lax.all_gather(Ldk, axis, tiled=True)  # (n, m)
            A = A.at[:, lo + m:].add(-(Ldk @ panel[lo + m:, :].T))
    return quad, logdet


def _dist_chol_quad_cyclic(A, r, d, D: int, C: int, axis: str):
    """Block-CYCLIC SPMD distributed Cholesky with fused substitution.

    A: (C, mb, n) — device d's C local row blocks, local slot c holding
    GLOBAL block g = d + c*D (n = D*C*mb); r: (C, mb) matching rhs
    blocks.  Returns (quad, logdet), both replicated, identical in exact
    arithmetic to `_dist_chol_quad`.

    Why cyclic: under SPMD every device executes the same full-shape
    masked program, so a block-row layout cannot shed the trailing-update
    work of finished rows — device 0's rows finish after step 0 but the
    uniform program keeps updating them (masked) for all D steps (~2x
    wasted FLOPs, the distributed analogue of the single-chip masked
    full-height levels).  In cyclic layout block g = d + c*D is finished
    on EVERY device once g <= k, i.e. local slot c is globally dead as
    soon as k >= c*D + D - 1 — the same step on all devices — so the
    local row stack can be STATICALLY sliced down one slot every D steps
    and the update work genuinely shrinks (~2x fewer FLOPs at large C).
    Per step the wire carries one (mb, mb) psum + one (Ca, mb, mb)
    all-gather: total O(n mb) per device, as before.
    """
    mb = A.shape[1]
    nb = D * C
    quad = jnp.zeros((), dtype=A.dtype)
    logdet = jnp.zeros((), dtype=A.dtype)
    drop = 0  # local slots statically removed so far (= g // D)
    gidx = d + D * jnp.arange(C)  # global block index per original slot
    for g in range(nb):
        o = g % D  # owning device (static)
        lo = g * mb
        # at step g the owner's block g is its LOWEST unfinished slot:
        # original slot g // D == drop, i.e. local slot 0 after shrinking
        Agg = jax.lax.psum(
            jnp.where(d == o, A[0][:, lo:lo + mb], 0.0), axis)
        Lgg = jnp.linalg.cholesky(Agg)
        rg = jax.lax.psum(jnp.where(d == o, r[0], 0.0), axis)
        bg = jax.scipy.linalg.solve_triangular(Lgg, rg, lower=True)
        quad = quad + jnp.dot(bg, bg)
        logdet = logdet + jnp.sum(jnp.log(jnp.diag(Lgg)))
        if g + 1 < nb:
            # panels for local blocks with global index > g (the owner's
            # own diagonal slot and any finished slot mask to zero)
            P = jax.scipy.linalg.solve_triangular(
                Lgg, A[:, :, lo:lo + mb].reshape(-1, mb).T,
                lower=True).T.reshape(A.shape[0], mb, mb)
            P = jnp.where((gidx[drop:] > g)[:, None, None], P, 0.0)
            r = r - P @ bg
            # gathered (D, Ca, mb, mb) -> global row order: g' = d' +
            # (c'+drop)*D ascends in (c', d'), so transposing to
            # (Ca, D, mb, mb) and flattening yields rows for global
            # blocks drop*D, drop*D+1, ... in order
            gat = jax.lax.all_gather(P, axis)
            panel = jnp.swapaxes(gat, 0, 1).reshape(-1, mb)
            hi = (g + 1) * mb
            A = A.at[:, :, hi:].add(
                -jnp.einsum("cik,jk->cij", P, panel[hi - drop * D * mb:]))
            # static shrink: slot of global block g' is finished on EVERY
            # device once g >= g' for all d', i.e. after step c*D + D - 1
            # — drop the lowest remaining slot on all devices at once
            if g % D == D - 1:
                A = A[1:]
                r = r[1:]
                drop += 1
    return quad, logdet


def make_sharded_nlml(mesh: Mesh, kerns, ops, noise: bool,
                      jitter: float, axis: str = "data",
                      layout: str = "row", cyc_blocks: int = 4):
    """Returns (build_rvpack, neg_log_post) where neg_log_post(z, X, y,
    rvpack) evaluates the negative log posterior with the Gram matrix AND
    its Cholesky factorisation distributed over the mesh — no device ever
    materialises the full N x N matrix.  Differentiable (reverse-mode
    through the shard_map collectives) and padded to the mesh size, so any
    N works.

    layout='cyclic' distributes rows block-cyclically with `cyc_blocks`
    blocks per device: statically-shrinking trailing updates cut ~2x of
    the masked-update waste (see `_dist_chol_quad_cyclic`)."""
    D = mesh.shape[axis]

    def build_rvpack(nx: int):
        nkern = len(kerns)
        rvs = []
        if noise:
            rvs.append(RV("gv", 1, ("halfnormal", 1e-3)))
        rvs.append(RV("l", nx * nkern, ("lognormal", 0.0, 1.0)))
        rvs.append(RV("kv", nkern, ("lognormal", 0.56, 0.75)))
        if "RatQuad" in kerns:
            rvs.append(RV("alpha", 1, ("lognormal", 0.56, 0.75)))
        return RVPack(tuple(rvs))

    def _spmd_body(X_loc, y_loc, l, kv, alpha, gvj, nreal):
        d = jax.lax.axis_index(axis)
        m = X_loc.shape[0]
        X_full = jax.lax.all_gather(X_loc, axis, tiled=True)  # (n, nx)
        K_loc = kernels.gram(kerns, ops, X_loc, X_full, l, kv, alpha)
        grow = d * m + jnp.arange(m)
        gcol = jnp.arange(X_full.shape[0])
        real = (grow < nreal)[:, None] & (gcol < nreal)[None, :]
        # phantom (padded) rows/cols form an identity block: zero
        # off-diagonals, unit diagonal — logdet and quadratic-form
        # contributions vanish exactly
        K_loc = jnp.where(real, K_loc, 0.0)
        K_loc = K_loc.at[jnp.arange(m), grow].add(
            jnp.where(grow < nreal, gvj, 1.0))
        y_loc = jnp.where(grow < nreal, y_loc, 0.0)
        quad, logdet = _dist_chol_quad(K_loc, y_loc, d, D, axis)
        return -0.5 * quad - logdet - 0.5 * nreal * _LOG_2PI

    def _spmd_body_cyclic(X_loc, y_loc, l, kv, alpha, gvj, nreal):
        d = jax.lax.axis_index(axis)
        C = cyc_blocks
        mb = X_loc.shape[0] // C
        nx = X_loc.shape[1]
        X_full = jax.lax.all_gather(X_loc, axis, tiled=True)  # (n, nx)
        y_full = jax.lax.all_gather(y_loc, axis, tiled=True)
        gcol = jnp.arange(X_full.shape[0])
        K_slots, r_slots = [], []
        for c in range(C):
            g0 = (d + c * D) * mb  # first global row of this slot
            Xc = jax.lax.dynamic_slice(
                X_full, (g0, jnp.int32(0)), (mb, nx))
            grow = g0 + jnp.arange(mb)
            Kc = kernels.gram(kerns, ops, Xc, X_full, l, kv, alpha)
            real = (grow < nreal)[:, None] & (gcol < nreal)[None, :]
            Kc = jnp.where(real, Kc, 0.0)
            Kc = Kc.at[jnp.arange(mb), grow].add(
                jnp.where(grow < nreal, gvj, 1.0))
            K_slots.append(Kc)
            rc = jax.lax.dynamic_slice(y_full, (g0,), (mb,))
            r_slots.append(jnp.where(grow < nreal, rc, 0.0))
        quad, logdet = _dist_chol_quad_cyclic(
            jnp.stack(K_slots), jnp.stack(r_slots), d, D, C, axis)
        return -0.5 * quad - logdet - 0.5 * nreal * _LOG_2PI

    body = _spmd_body_cyclic if layout == "cyclic" else _spmd_body
    grain = D * cyc_blocks if layout == "cyclic" else D
    spmd = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(), P(), P(), P(), P()),
        out_specs=P())

    def neg_log_post(z, X, y, rvpack):
        vals = rvpack.unpack(z)
        gv = vals["gv"][0] if noise else 0.0
        l = vals["l"]
        kv = vals["kv"]
        alpha = vals["alpha"][0] if "alpha" in vals else None
        n0 = X.shape[0]
        npad = -(-n0 // grain) * grain
        if npad != n0:
            X = jnp.pad(X, ((0, npad - n0), (0, 0)))
            y = jnp.pad(y, (0, npad - n0))
        logl = spmd(X, y, l, kv,
                    jnp.asarray(0.0 if alpha is None else alpha, X.dtype),
                    jitter + gv, jnp.asarray(float(n0), X.dtype))
        return -(logl + rvpack.log_prior(z))

    return build_rvpack, neg_log_post


# ---------------------------------------------------------------------------
# Distributed closed-form value-and-grad (the multi-chip bigfit)
# ---------------------------------------------------------------------------

def _mv(M, v):
    """f64 matvec as an elementwise broadcast-reduce: XLA's emulated-f64
    dot_general materialises O(m^2) f32 component planes on TPU (platform
    pathology, docs/TPU_NOTES.md); the elementwise form fuses."""
    return jnp.sum(M * v[None, :], axis=1)


def _dist_factor(A, r, d, D: int, axis: str, mm, chol_inv):
    """SPMD block-row right-looking Cholesky with fused forward
    substitution (the shared core of the distributed objective and the
    distributed predict).

    A: (m, n) local row block of the SPD matrix, r: (m,) local rhs block,
    d: this device's mesh index.  Diagonal blocks are psum-broadcast and
    factorised redundantly on every device (they would otherwise idle);
    panel solves go through the explicit diagonal-block inverses from
    `chol_inv`; panel columns are all-gathered for the trailing update.

    Returns (L_loc, Linvs, beta, quad, logdet): the local (m, n) row block
    of L, the (D, m, m) stack of diagonal-block inverses (replicated),
    beta = L^-1 r, the quadratic form |beta|^2 and the half
    log-determinant — the last three replicated."""
    m, n = A.shape
    L_loc = jnp.zeros((m, n), A.dtype)
    Linvs = jnp.zeros((D, m, m), A.dtype)
    beta = jnp.zeros((n,), A.dtype)
    quad = jnp.zeros((), A.dtype)
    logdet = jnp.zeros((), A.dtype)
    for k in range(D):
        lo = k * m
        blk = A[:, lo:lo + m]
        Akk = jax.lax.psum(jnp.where(d == k, blk, 0.0), axis)
        Lkk, Linv_kk = chol_inv(Akk)
        Pd = mm(blk, Linv_kk.T)
        Ldk = jnp.where(d == k, Lkk, jnp.where(d > k, Pd, 0.0))
        rk = jax.lax.psum(jnp.where(d == k, r, 0.0), axis)
        bk = _mv(Linv_kk, rk)
        r = r - _mv(Ldk, bk)
        quad = quad + jnp.dot(bk, bk)
        logdet = logdet + jnp.sum(jnp.log(jnp.diag(Lkk)))
        L_loc = L_loc.at[:, lo:lo + m].set(Ldk)
        Linvs = Linvs.at[k].set(Linv_kk)
        beta = beta.at[lo:lo + m].set(bk)
        if k + 1 < D:
            panel = jax.lax.all_gather(Ldk, axis, tiled=True)
            A = A.at[:, lo + m:].add(-mm(Ldk, panel[lo + m:, :].T))
    return L_loc, Linvs, beta, quad, logdet


def _dist_solve_upper_vec(L_loc, Linvs, w, d, D: int, axis: str):
    """Solve L^T x = w over the mesh (w, x replicated (n,) vectors): per
    step one m-vector psum assembles the cross-device contribution."""
    m, n = L_loc.shape
    out = jnp.zeros((n,), L_loc.dtype)
    for k in range(D - 1, -1, -1):
        lo = k * m
        a_d = jax.lax.dynamic_slice(out, (d * m,), (m,))
        contrib = jnp.where(
            d > k, _mv(L_loc[:, lo:lo + m].T, a_d), 0.0)
        s = jax.lax.psum(contrib, axis)
        ak = _mv(Linvs[k].T, w[lo:lo + m] - s)
        out = out.at[lo:lo + m].set(ak)
    return out


def _dist_solve_lower_vec(L_loc, Linvs, rhs, d, D: int, axis: str):
    """Solve L w = rhs over the mesh (rhs, w replicated (n,) vectors)."""
    m, n = L_loc.shape
    w = jnp.zeros((n,), L_loc.dtype)
    r_loc = jax.lax.dynamic_slice(rhs, (d * m,), (m,))
    for k in range(D):
        lo = k * m
        rk = jax.lax.psum(jnp.where(d == k, r_loc, 0.0), axis)
        wk = _mv(Linvs[k], rk)
        r_loc = r_loc - _mv(L_loc[:, lo:lo + m], wk)
        w = w.at[lo:lo + m].set(wk)
    return w


def _dist_solve_lower_ssq(L_loc, Linvs, R_loc, d, D: int, axis: str, mm):
    """Forward-substitute L A = R over the mesh for a matrix rhs given as
    local (m, q) row blocks, returning the column sums of squares of A
    (replicated (q,)) — the whitened-solve reduction the predictive
    variance needs.  A itself is never materialised beyond one (m, q)
    block."""
    m = L_loc.shape[0]
    q = R_loc.shape[1]
    ssq = jnp.zeros((q,), L_loc.dtype)
    r = R_loc
    for k in range(D):
        lo = k * m
        rk = jax.lax.psum(jnp.where(d == k, r, 0.0), axis)
        xk = mm(Linvs[k], rk)
        r = r - mm(L_loc[:, lo:lo + m], xk)
        ssq = ssq + jnp.sum(xk * xk, axis=0)
    return ssq


def _mixed_ops(block: int):
    """(mm, chol_inv) pair for the mixed slice-arithmetic path (TPU-clean:
    no XLA triangular_solve, no f64 dot_general) — shared by the
    distributed objective and the distributed predict."""
    from . import precision

    def chol_inv(Akk):
        Lkk = precision.blocked_cholesky(Akk, block=block, mixed=True)
        return Lkk, precision.tri_inv_mixed(
            Lkk, base=min(block, precision.INV_BASE))

    return precision.slice_matmul, chol_inv


def _exact_ops():
    """(mm, chol_inv) for the exact-f64 path (CPU test meshes)."""

    def mm(a, b):
        return a @ b

    def chol_inv(Akk):
        Lkk = jnp.linalg.cholesky(Akk)
        return Lkk, jax.scipy.linalg.solve_triangular(
            Lkk, jnp.eye(Lkk.shape[0], dtype=Lkk.dtype), lower=True)

    return mm, chol_inv


def _closed_form_core(K_loc, y_loc, z, d, D: int, axis: str, mm,
                      chol_inv, m: int, n: int, n0: int, gb: int,
                      nblocks: int, gram_block):
    """Stages 2-6 of the distributed closed-form pipeline — the part
    shared by the fixed-warping and learnable-warping objectives:

      2. block-row factorisation + fused forward substitution
      3. alpha = K^-1 y (replicated)
      4. L^-1 row blocks by the broadcast pipeline
      5. K^-1 row blocks by psum_scatter reduce-scatter
      6. gradient row contraction scanned over column blocks, with
         W_d = (alpha_d alpha' - Kinv_d)/2 against the jvp of
         ``gram_block(zz, s, gcolB)`` (an (m, gb) local Gram block —
         the ONE hook the two objectives differ in: fixed conversions
         slice a precomputed X, learnable warpings rebuild x~(zz)
         inside the checkpoint)

    Returns (core logl WITHOUT any warp log|J| term, replicated
    stopped alpha, psum'd gradient)."""
    L_loc, Linvs, beta, quad, logdet = _dist_factor(
        K_loc, y_loc, d, D, axis, mm, chol_inv)
    logl = -0.5 * quad - logdet - 0.5 * n0 * _LOG_2PI

    alpha_vec = _dist_solve_upper_vec(L_loc, Linvs, beta, d, D, axis)

    S = jnp.zeros((m, n), K_loc.dtype)
    B_loc = jnp.zeros((m, n), K_loc.dtype)
    col = jnp.arange(n)
    for k in range(D):
        lo = k * m
        Ek = (col[None, :] == (lo + jnp.arange(m))[:, None]).astype(
            K_loc.dtype)
        Sk = jax.lax.psum(jnp.where(d == k, S, 0.0), axis)
        Bk = mm(Linvs[k], Ek - Sk)  # redundant, but all devices idle
        B_loc = jnp.where(d == k, Bk, B_loc)
        if k + 1 < D:
            S = S + jnp.where(d > k, 1.0, 0.0) * mm(
                L_loc[:, lo:lo + m], Bk)

    prods = jnp.stack(
        [mm(B_loc[:, c * m:(c + 1) * m].T, B_loc) for c in range(D)])
    Kinv_loc = jax.lax.psum_scatter(
        prods, axis, scatter_dimension=0, tiled=False)

    grow = d * m + jnp.arange(m)
    a_loc = jax.lax.stop_gradient(
        jax.lax.dynamic_slice(alpha_vec, (d * m,), (m,)))
    a_full = jax.lax.stop_gradient(alpha_vec)
    Kinv_c = jax.lax.stop_gradient(Kinv_loc)
    real_row = (grow < n0)

    def block_term(carry, s):
        aB = jax.lax.dynamic_slice(a_full, (s,), (gb,))
        KinvB = jax.lax.dynamic_slice(Kinv_c, (0, s), (m, gb))
        gcolB = s + jnp.arange(gb)
        WB = jnp.where(
            real_row[:, None] & (gcolB < n0)[None, :],
            0.5 * (a_loc[:, None] * aB[None, :] - KinvB), 0.0)

        @jax.checkpoint
        def h(zz):
            return jnp.sum(WB * gram_block(zz, s, gcolB))

        return carry + jax.grad(h)(z), None

    starts = jnp.arange(nblocks) * gb
    g_loc, _ = jax.lax.scan(block_term, jnp.zeros_like(z), starts)
    return logl, a_full, jax.lax.psum(g_loc, axis)


def _wrap_neg_log_post(rvpack, value_and_grad):
    """Custom-vjp scalar objective off a (logl, grad) pair — the host
    L-BFGS / MCMC contract shared by every sharded objective."""

    @jax.custom_vjp
    def logl_fn(z):
        return value_and_grad(z)[0]

    def fwd(z):
        return value_and_grad(z)

    def bwd(grad, ct):
        return (ct * grad,)

    logl_fn.defvjp(fwd, bwd)

    def neg_log_post(z):
        return -(logl_fn(z) + rvpack.log_prior(z))

    return neg_log_post


def make_sharded_mixed_objective(mesh: Mesh, X, y, kerns=("RBF",), ops=(),
                                 noise: bool = True, truncate: bool = False,
                                 jitter: float = 1e-6, block: int = 256,
                                 grad_block: int = 2048, mixed: bool = True,
                                 axis: str = "data"):
    """(rvpack, neg_log_post, value_and_grad) with the FULL closed-form
    NLML gradient pipeline distributed over the mesh — the multi-chip
    analogue of bigfit.make_mixed_objective (single-chip 16k MAP engine).

    Every O(N^2)-memory / O(N^3)-FLOP stage is row-sharded; no device ever
    materialises an N x N matrix:

      1. Gram row block per device (vs an all-gathered copy of the small X).
      2. Block-row right-looking Cholesky (psum diagonal broadcast,
         redundant m x m diagonal factorisations — free in wall-clock,
         every device would otherwise idle — local panel solves through
         explicit mixed-precision triangular inverses, all-gathered panel
         columns for the trailing update).  Fused forward substitution
         gives beta = L^-1 y, the quadratic form and the log-determinant,
         all replicated.
      3. alpha = K^-1 y by blocked backward substitution: per step one
         m-vector psum assembles the cross-device contribution.
      4. L^-1 row blocks by a broadcast pipeline: at step k device k's
         finished (m, n) row block is psum-broadcast and folded into every
         later device's running substitution sum.
      5. K^-1 row blocks by REDUCE-SCATTER: device k computes
         B_kc^T B_k: for every column block c from its own L^-1 row block;
         psum_scatter sums over k and lands row block c on device c — the
         ring-style panel-exchange collective SURVEY.md §5 designates for
         this workload.
      6. Gradient row contraction: grad = psum_d d/dz sum(W_d o K_d(z))
         with W_d = (alpha_d alpha^T - Kinv_d)/2, the Gram jvp scanned over
         column blocks (bounded cotangent planes, as in bigfit).

    mixed=True routes all O(N^3) products through the int8-Ozaki MXU
    slice_matmul and the diagonal factorisations through the blocked
    mixed-precision Cholesky — no XLA triangular_solve and no f64
    dot_general anywhere, so the SAME program is TPU-clean (the autodiff
    make_sharded_nlml path above relies on reverse-mode through
    solve_triangular: fine on the CPU test mesh, a multi-minute-compile
    pathology on real chips).

    Reference anchor: this replaces pm.find_MAP's PyTensor logp+dlogp at
    scale (ref gpmcmc.py:326-346) where the reference's only axis was
    single-host BLAS threads.
    """
    from . import bigfit, precision

    D = mesh.shape[axis]
    X = jnp.asarray(X, jnp.float64)
    y1 = jnp.asarray(y, jnp.float64).reshape(-1)
    kerns = tuple(kerns)
    ops = tuple(ops)
    has_alpha = "RatQuad" in kerns
    nx = X.shape[1]
    rvpack = bigfit._default_rvpack(nx, kerns, noise, truncate)

    n0 = X.shape[0]
    npad = -(-n0 // D) * D
    m = npad // D
    n = npad
    Xp = jnp.pad(X, ((0, npad - n0), (0, 0)))
    yp = jnp.pad(y1, (0, npad - n0))
    gb = min(grad_block, n)
    while n % gb:
        gb //= 2
    nblocks = n // gb

    mm, chol_inv = _mixed_ops(block) if mixed else _exact_ops()

    def _gram_rows(z, X_loc, X_cols, grow, gcol):
        """Local Gram rows of K(z) against column inputs X_cols, with the
        phantom-padding identity block and the (jitter+gv) diagonal."""
        vals = rvpack.unpack(z)
        gv = vals["gv"][0] if noise else jnp.asarray(0.0, z.dtype)
        l = vals["l"]
        kv = vals["kv"]
        al = vals["alpha"][0] if has_alpha else None
        K = kernels.gram(kerns, ops, X_loc, X_cols, l, kv, al)
        real = (grow < n0)[:, None] & (gcol < n0)[None, :]
        K = jnp.where(real, K, 0.0)
        diag = (grow[:, None] == gcol[None, :]).astype(K.dtype)
        return K + diag * jnp.where((grow < n0)[:, None], jitter + gv, 1.0)

    def _spmd_value_grad(X_loc, y_loc, z):
        d = jax.lax.axis_index(axis)
        X_full = jax.lax.all_gather(X_loc, axis, tiled=True)  # (n, nx)
        grow = d * m + jnp.arange(m)
        gcol = jnp.arange(n)
        K_loc = _gram_rows(z, X_loc, X_full, grow, gcol)
        y_loc = jnp.where(grow < n0, y_loc, 0.0)

        def gram_block(zz, s, gcolB):
            XB = jax.lax.dynamic_slice(X_full, (s, 0), (gb, nx))
            return _gram_rows(zz, X_loc, XB, grow, gcolB)

        logl, _, grad = _closed_form_core(
            K_loc, y_loc, z, d, D, axis, mm, chol_inv, m, n, n0, gb,
            nblocks, gram_block)
        return logl, grad

    # check_vma=False: the varying-manual-axes tracker rejects scan
    # carries initialised from literals inside the nested slice-matmul
    # programs (the carry starts axis-invariant, the body makes it
    # varying); the collectives themselves are explicit psums here, so
    # the replication bookkeeping adds nothing.
    spmd = jax.jit(jax.shard_map(
        _spmd_value_grad, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P()),
        out_specs=(P(), P()), check_vma=False))

    Xs = jax.device_put(Xp, NamedSharding(mesh, P(axis, None)))
    ys = jax.device_put(yp, NamedSharding(mesh, P(axis)))

    def value_and_grad(z):
        """(logl, dlogl/dz), both replicated."""
        return spmd(Xs, ys, z)

    return rvpack, _wrap_neg_log_post(rvpack, value_and_grad), \
        value_and_grad


def make_sharded_warped_objective(mesh: Mesh, cfg, block: int = 256,
                                  grad_block: int = 2048,
                                  mixed: bool = True, axis: str = "data"):
    """(rvpack, neg_log_post, value_and_grad) for iwgp/cwgp FitConfigs
    with the closed-form gradient pipeline distributed over the mesh —
    the multi-chip analogue of bigfit.make_warped_vg (reference warped
    fit: gpmcmc.py:211-277, which has NO N-scaling escape hatch at
    all).

    The O(N^2)/O(N^3) stages are row-sharded exactly as
    make_sharded_mixed_objective (same _dist_factor / L^-1 broadcast
    pipeline / K^-1 reduce-scatter); the warping layers bolt on top:

    - x~(z), y~(z) and the log|J| term are ELEMENTWISE over the n-row
      dataset — O(N nx) work, computed replicated on every device from
      the closed-over raw data (the warp evaluation is ~1e-5 of one
      factorisation step; sharding it would add collectives for
      nothing).  Each device slices its own row block.
    - iwgp gradients flow through the per-column-block Gram jvp: the
      warped inputs are rebuilt INSIDE the checkpointed contraction
      h(zz), so d(Gram)/d(warp params) rides the same scan as the
      kernel hyperparameters (bigfit.make_warped_vg's route, here with
      the (m, gb) local W block).
    - cwgp gradients need no factorisation: d/dp of
      (-1/2 y~'K^-1 y~ + log|J|) = (-a' dy~/dp + dlog|J|/dp) with
      a = K^-1 y~ stopped — one reverse-AD pass over n-vectors,
      computed replicated (every device holds the replicated alpha).
    """
    from . import bigfit, engine, precision  # noqa: F401
    import andvaranaut_tpu.transform as tf

    D = mesh.shape[axis]
    rvpack = engine.build_rvs(cfg)
    n0, nx = cfg.x.shape
    y1 = jnp.asarray(np.asarray(cfg.y[:, 0]), jnp.float64)
    kerns_ = tuple(cfg.kerns)
    ops_ = tuple(cfg.ops)
    noise = cfg.noise
    jitter = float(cfg.jitter)
    has_alpha = "RatQuad" in kerns_

    if not cfg.iwgp:
        xin_fixed = np.zeros((n0, nx))
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

    def xin_of(vals):
        if cfg.iwgp:
            return engine._iwgp_xin(cfg, vals, fixed_cols)
        return xin_fixed

    def yin_ldj_of(vals):
        if cfg.cwgp:
            params = engine.interleave_cwgp(vals, pos_mask)
            warper = tf.wgp(
                cfg.yconrevs[0].warping_names, params, y=y1)
            return warper.con(y1), jnp.sum(jnp.log(warper.der(y1)))
        return yin_fixed, jnp.asarray(0.0)

    npad = -(-n0 // D) * D
    m = npad // D
    n = npad
    gb = min(grad_block, n)
    while n % gb:
        gb //= 2
    nblocks = n // gb

    mm, chol_inv = _mixed_ops(block) if mixed else _exact_ops()

    def _spmd_value_grad(z):
        d = jax.lax.axis_index(axis)
        vals = rvpack.unpack(z)
        gv = vals["gv"][0] if noise else jnp.asarray(0.0, z.dtype)
        l = vals["l"]
        kv = vals["kv"]
        al = vals["alpha"][0] if has_alpha else None
        xin_full = jnp.pad(xin_of(vals), ((0, npad - n0), (0, 0)))
        yin, ldj = yin_ldj_of(vals)
        yin_p = jnp.pad(yin, (0, npad - n0))
        grow = d * m + jnp.arange(m)
        gcol = jnp.arange(n)
        X_loc = jax.lax.dynamic_slice(
            xin_full, (d * m, jnp.int32(0)), (m, nx))

        def gram_rows(xr, xc, grow_, gcol_, gv_, l_, kv_, al_):
            K = kernels.gram(kerns_, ops_, xr, xc, l_, kv_, al_)
            real = (grow_ < n0)[:, None] & (gcol_ < n0)[None, :]
            K = jnp.where(real, K, 0.0)
            diag = (grow_[:, None] == gcol_[None, :]).astype(K.dtype)
            return K + diag * jnp.where(
                (grow_ < n0)[:, None], jitter + gv_, 1.0)

        K_loc = gram_rows(X_loc, xin_full, grow, gcol, gv, l, kv, al)
        y_loc = jnp.where(
            grow < n0,
            jax.lax.dynamic_slice(yin_p, (d * m,), (m,)), 0.0)

        def gram_block(zz, s, gcolB):
            # warped inputs rebuilt inside the core's checkpoint: iwgp
            # gradients flow through the elementwise Gram jvp
            vz = rvpack.unpack(zz)
            gv_ = (vz["gv"][0] if noise
                   else jnp.asarray(0.0, zz.dtype))
            az = vz["alpha"][0] if has_alpha else None
            xz = jnp.pad(xin_of(vz), ((0, npad - n0), (0, 0)))
            xr = jax.lax.dynamic_slice(
                xz, (d * m, jnp.int32(0)), (m, nx))
            xc = jax.lax.dynamic_slice(xz, (s, 0), (gb, nx))
            return gram_rows(
                xr, xc, grow, gcolB, gv_, vz["l"], vz["kv"], az)

        logl_core, a_full, gK = _closed_form_core(
            K_loc, y_loc, z, d, D, axis, mm, chol_inv, m, n, n0, gb,
            nblocks, gram_block)
        logl = logl_core + ldj

        if cfg.cwgp:
            a_real = a_full[:n0]

            def warp_terms(zz):
                vz = rvpack.unpack(zz)
                yz, ldjz = yin_ldj_of(vz)
                return -jnp.dot(a_real, yz) + ldjz

            gW = jax.grad(warp_terms)(z)  # replicated-redundant, O(n)
        else:
            gW = jnp.zeros_like(z)
        return logl, gK + gW

    # check_vma=False: same scan-carry replication-tracker caveat as
    # make_sharded_mixed_objective above
    spmd = jax.jit(jax.shard_map(
        _spmd_value_grad, mesh=mesh, in_specs=(P(),),
        out_specs=(P(), P()), check_vma=False))

    def value_and_grad(z):
        """(logl incl. the log|J| warp term, dlogl/dz), replicated."""
        return spmd(z)

    return rvpack, _wrap_neg_log_post(rvpack, value_and_grad), \
        value_and_grad


def sharded_big_warped_map_fit(cfg, block: int = 256, maxiter: int = 50,
                               start=None, mesh: Mesh | None = None,
                               mixed: bool = True, verbose: bool = False,
                               grad_block: int = 2048):
    """MAP fit with learnable warpings distributed over the mesh
    (make_sharded_warped_objective): host L-BFGS-B, reference
    hyperprior + warp-prior menu.  Returns (hypers, log posterior) —
    the multi-chip route GPMCMC.fit(precision='distributed',
    iwgp/cwgp=True) takes."""
    from scipy.optimize import minimize

    mesh = mesh if mesh is not None else data_mesh()
    rvpack, _, vg = make_sharded_warped_objective(
        mesh, cfg, block=block, grad_block=grad_block, mixed=mixed)
    prior_grad = jax.jit(jax.value_and_grad(rvpack.log_prior))

    def fun(z_np):
        z = jnp.asarray(z_np)
        logl, g = vg(z)
        lp, gp_ = prior_grad(z)
        val = -(float(logl) + float(lp))
        grad = -(np.asarray(g) + np.asarray(gp_))
        if not np.isfinite(val) or not np.isfinite(grad).all():
            val = 1e12
            grad = np.nan_to_num(grad, nan=0.0, posinf=0.0, neginf=0.0)
        if verbose:
            print(f"  nlp={val:.6f}")
        return val, grad

    z0 = (
        np.asarray(rvpack.pack_values(start)) if start is not None
        else np.asarray(rvpack.z0()))
    res = minimize(fun, z0, jac=True, method="L-BFGS-B",
                   options={"maxiter": maxiter})
    vals = rvpack.unpack(jnp.asarray(res.x))
    hypers = {k: np.asarray(v) for k, v in vals.items()}
    if "gv" in hypers:
        hypers["gv"] = hypers["gv"].reshape(())
    if "alpha" in hypers:
        hypers["alpha"] = hypers["alpha"].reshape(())
    return hypers, -float(res.fun)


def sharded_big_map_fit(X, y, kerns=("RBF",), ops=(), noise: bool = True,
                        truncate: bool = False, jitter: float = 1e-6,
                        block: int = 256, maxiter: int = 50, start=None,
                        mesh: Mesh | None = None, mixed: bool = True,
                        verbose: bool = False):
    """MAP fit with the closed-form NLML gradient pipeline distributed
    over the mesh (make_sharded_mixed_objective): host L-BFGS-B over the
    unconstrained hyperparameters, reference hyperprior menu.  Returns
    (hypers dict, log posterior)."""
    from scipy.optimize import minimize

    mesh = mesh if mesh is not None else data_mesh()
    rvpack, _, vg = make_sharded_mixed_objective(
        mesh, X, y, kerns=kerns, ops=ops, noise=noise, truncate=truncate,
        jitter=jitter, block=block, mixed=mixed)
    prior_grad = jax.jit(jax.value_and_grad(rvpack.log_prior))

    def fun(z_np):
        z = jnp.asarray(z_np)
        logl, g = vg(z)
        lp, gp_ = prior_grad(z)
        val = -(float(logl) + float(lp))
        grad = -(np.asarray(g) + np.asarray(gp_))
        if not np.isfinite(val) or not np.isfinite(grad).all():
            val = 1e12
            grad = np.nan_to_num(grad, nan=0.0, posinf=0.0, neginf=0.0)
        if verbose:
            print(f"  nlp={val:.6f}")
        return val, grad

    z0 = (
        np.asarray(rvpack.pack_values(start)) if start is not None
        else np.asarray(rvpack.z0()))
    res = minimize(fun, z0, jac=True, method="L-BFGS-B",
                   options={"maxiter": maxiter})
    vals = rvpack.unpack(jnp.asarray(res.x))
    hypers = {k: np.asarray(v) for k, v in vals.items()}
    if "gv" in hypers:
        hypers["gv"] = hypers["gv"].reshape(())
    if "alpha" in hypers:
        hypers["alpha"] = hypers["alpha"].reshape(())
    return hypers, -float(res.fun)


def make_sharded_predict(mesh: Mesh, X, y, hypers, kerns=("RBF",), ops=(),
                         noise: bool = True, jitter: float = 1e-6,
                         block: int = 256, mixed: bool = True,
                         pcg_iters: int = 12, qbucket: int = 256,
                         axis: str = "data"):
    """Distributed GP prediction: conditioning state AND per-query
    cross-Gram solves sharded over the mesh — no device ever materialises
    an N x N matrix or an (N, Q) cross-Gram.

    State (computed once, kept sharded on the mesh): block-row distributed
    Cholesky (`_dist_factor`), then alpha = K^-1 y refined by distributed
    PCG with the factorisation as preconditioner (plain substitution
    stalls at the factorisation-residual floor on the mixed path — same
    finding as the single-chip large-N predict, docs/TPU_NOTES.md).

    Per query batch: each device contracts its local cross-Gram row block
    against its alpha rows (one q-vector psum for the mean) and the
    whitened variance solve runs as a distributed forward substitution
    (one (m, q) psum per block step).

    mixed=True keeps every O(N^3/D) product on the int8-Ozaki MXU path
    (TPU-clean); mixed=False is the exact-f64 path for CPU test meshes.

    Returns predict(Xq) -> (mu, var) numpy arrays of length len(Xq).
    Reference anchor: gp.predict / pm.gp.Marginal conditioning (ref
    gpmcmc.py:588-598) — single-host BLAS there; this is the multi-chip
    analogue completing the sharded fit story (sharded_big_map_fit).
    """
    from . import engine

    D = mesh.shape[axis]
    X = jnp.asarray(X, jnp.float64)
    y1 = jnp.asarray(y, jnp.float64).reshape(-1)
    kerns = tuple(kerns)
    ops = tuple(ops)
    nx = X.shape[1]
    n0 = X.shape[0]
    npad = -(-n0 // D) * D
    m = npad // D
    n = npad
    Xp = jnp.pad(X, ((0, npad - n0), (0, 0)))
    yp = jnp.pad(y1, (0, npad - n0))
    l, kv, gv, alq = engine.hypers_to_args(hypers, noise)
    mm, chol_inv = _mixed_ops(block) if mixed else _exact_ops()

    def _spmd_state(X_loc, y_loc):
        d = jax.lax.axis_index(axis)
        X_full = jax.lax.all_gather(X_loc, axis, tiled=True)
        grow = d * m + jnp.arange(m)
        gcol = jnp.arange(n)
        K = kernels.gram(kerns, ops, X_loc, X_full, l, kv, alq)
        real = (grow < n0)[:, None] & (gcol < n0)[None, :]
        K = jnp.where(real, K, 0.0)
        diag = (grow[:, None] == gcol[None, :]).astype(K.dtype)
        K_loc = K + diag * jnp.where(
            (grow < n0)[:, None], jitter + gv, 1.0)
        y_loc = jnp.where(grow < n0, y_loc, 0.0)

        L_loc, Linvs, beta, _, _ = _dist_factor(
            K_loc, y_loc, d, D, axis, mm, chol_inv)

        # alpha = K^-1 y by distributed PCG (factorisation preconditioner)
        b = jax.lax.all_gather(y_loc, axis, tiled=True)

        def S(r):
            w = _dist_solve_lower_vec(L_loc, Linvs, r, d, D, axis)
            return _dist_solve_upper_vec(L_loc, Linvs, w, d, D, axis)

        def Kmv(v):
            Kv_loc = jnp.sum(K_loc * v[None, :], axis=1)
            return jax.lax.all_gather(Kv_loc, axis, tiled=True)

        z0 = S(b)

        def body(_, carry):
            x, r, p, rz = carry
            Kp = Kmv(p)
            denom = jnp.dot(p, Kp)
            a = jnp.where(denom > 0.0, rz / denom, 0.0)
            x = x + a * p
            r = r - a * Kp
            zv = S(r)
            rz_new = jnp.dot(r, zv)
            bcoef = jnp.where(rz > 0.0, rz_new / rz, 0.0)
            p = zv + bcoef * p
            return x, r, p, rz_new

        alpha_vec, _, _, _ = jax.lax.fori_loop(
            0, pcg_iters, body, (jnp.zeros_like(b), b, z0,
                                 jnp.dot(b, z0)))
        return L_loc, Linvs, alpha_vec

    spmd_state = jax.jit(jax.shard_map(
        _spmd_state, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(), P()), check_vma=False))

    Xs = jax.device_put(Xp, NamedSharding(mesh, P(axis, None)))
    ys = jax.device_put(yp, NamedSharding(mesh, P(axis)))
    L_g, Linvs_g, alpha_g = spmd_state(Xs, ys)

    def _spmd_apply(L_loc, Linvs, alpha_vec, X_loc, Xq):
        d = jax.lax.axis_index(axis)
        grow = d * m + jnp.arange(m)
        Kxs = kernels.gram(kerns, ops, X_loc, Xq, l, kv, alq)
        Kxs = jnp.where((grow < n0)[:, None], Kxs, 0.0)
        a_loc = jax.lax.dynamic_slice(alpha_vec, (d * m,), (m,))
        mu = jax.lax.psum(jnp.sum(Kxs * a_loc[:, None], axis=0), axis)
        ssq = _dist_solve_lower_ssq(L_loc, Linvs, Kxs, d, D, axis, mm)
        kss = kernels.gram(kerns, ops, Xq, None, l, kv, alq, diag=True)
        var = jnp.maximum(kss - ssq, 0.0) + gv
        return mu, var

    spmd_apply = jax.jit(jax.shard_map(
        _spmd_apply, mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(axis, None), P()),
        out_specs=(P(), P()), check_vma=False))

    def predict(Xq):
        Xq = np.asarray(Xq, dtype=float)
        q = Xq.shape[0]
        qp = -(-max(q, 1) // qbucket) * qbucket
        Xqp = np.zeros((qp, nx))
        Xqp[:q] = Xq
        mu, var = spmd_apply(L_g, Linvs_g, alpha_g, Xs, jnp.asarray(Xqp))
        return np.asarray(mu)[:q], np.asarray(var)[:q]

    return predict


def sharded_map_fit(X, y, kerns=("RBF",), ops=(), noise=True, jitter=1e-6,
                    mesh: Mesh | None = None, max_iter: int = 200,
                    tol: float = 1e-8):
    """MAP fit with the Gram construction and Cholesky factorisation both
    distributed over the mesh.  Drop-in engine-level entry for large-N
    problems (bench + dryrun path)."""
    from ..inference.lbfgs import minimize_lbfgs

    mesh = mesh if mesh is not None else data_mesh()
    Xs, ys = shard_data(mesh, X, y)
    build_rvpack, nlp = make_sharded_nlml(
        mesh, tuple(kerns), tuple(ops), noise, jitter)
    rvpack = build_rvpack(X.shape[1])

    def fun(z):
        return nlp(z, Xs, ys, rvpack)

    z, val, gnorm, niter = minimize_lbfgs(
        fun, rvpack.z0(), max_iter=max_iter, tol=tol)
    vals = rvpack.unpack(z)
    hypers = {k: np.asarray(v) for k, v in vals.items()}
    return hypers, -float(val), int(niter)
