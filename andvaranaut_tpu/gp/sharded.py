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


def make_sharded_nlml(mesh: Mesh, kerns, ops, noise: bool,
                      jitter: float, axis: str = "data"):
    """Returns (build_rvpack, neg_log_post) where neg_log_post(z, X, y,
    rvpack) evaluates the negative log posterior with the Gram matrix AND
    its Cholesky factorisation distributed over the mesh — no device ever
    materialises the full N x N matrix.  Differentiable (reverse-mode
    through the shard_map collectives) and padded to the mesh size, so any
    N works."""
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

    spmd = jax.shard_map(
        _spmd_body, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(), P(), P(), P(), P()),
        out_specs=P())

    def neg_log_post(z, X, y, rvpack):
        vals = rvpack.unpack(z)
        gv = vals["gv"][0] if noise else 0.0
        l = vals["l"]
        kv = vals["kv"]
        alpha = vals["alpha"][0] if "alpha" in vals else None
        n0 = X.shape[0]
        npad = -(-n0 // D) * D
        if npad != n0:
            X = jnp.pad(X, ((0, npad - n0), (0, 0)))
            y = jnp.pad(y, (0, npad - n0))
        logl = spmd(X, y, l, kv,
                    jnp.asarray(0.0 if alpha is None else alpha, X.dtype),
                    jitter + gv, jnp.asarray(float(n0), X.dtype))
        return -(logl + rvpack.log_prior(z))

    return build_rvpack, neg_log_post


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
