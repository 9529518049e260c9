"""Mesh-sharded GP linear algebra for large training sets.

The genuinely scalable axis in this workload is training-set size N: the
O(N^2) Gram matrix and O(N^3) Cholesky (SURVEY.md §2.6).  Here the Gram
matrix is computed and stored 2-D/row-sharded over an ICI device mesh via
sharding constraints (XLA SPMD partitions the pairwise-distance + kernel
work and inserts the collectives); the Cholesky itself currently runs
single-device after an XLA-inserted gather — a distributed blocked Cholesky
(Pallas ring kernel) is the planned replacement behind the same interface.

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
    """Place training inputs/targets row-sharded on the mesh."""
    xs = jax.device_put(jnp.asarray(X), NamedSharding(mesh, P(axis, None)))
    ys = jax.device_put(jnp.asarray(y), NamedSharding(mesh, P(axis)))
    return xs, ys


def make_sharded_nlml(mesh: Mesh, kerns, ops, noise: bool,
                      jitter: float, axis: str = "data"):
    """Returns (rvpack, nlml_and_grad) where nlml_and_grad(z, X, y) computes
    the negative log posterior and its gradient with the Gram matrix
    row-sharded over the mesh."""
    row_sharding = NamedSharding(mesh, P(axis, None))

    def build_rvpack(nx: int):
        nkern = len(kerns)
        rvs = []
        if noise:
            rvs.append(RV("gv", 1, ("halfnormal", 1e-3)))
        rvs.append(RV("l", nx * nkern, ("lognormal", 0.0, 1.0)))
        rvs.append(RV("kv", nkern, ("lognormal", 0.56, 0.75)))
        return RVPack(tuple(rvs))

    def neg_log_post(z, X, y, rvpack):
        vals = rvpack.unpack(z)
        gv = vals["gv"][0] if noise else 0.0
        l = vals["l"]
        kv = vals["kv"]
        n = X.shape[0]
        K = kernels.gram(kerns, ops, X, X, l, kv, None)
        K = jax.lax.with_sharding_constraint(K, row_sharding)
        K = K + jnp.eye(n, dtype=X.dtype) * (jitter + gv)
        # Cholesky: gathered by XLA (single-device) for now.
        L = jnp.linalg.cholesky(K)
        beta = jax.scipy.linalg.solve_triangular(L, y, lower=True)
        logl = (
            -0.5 * jnp.dot(beta, beta)
            - jnp.sum(jnp.log(jnp.diag(L)))
            - 0.5 * n * _LOG_2PI
        )
        return -(logl + rvpack.log_prior(z))

    return build_rvpack, neg_log_post


def sharded_map_fit(X, y, kerns=("RBF",), ops=(), noise=True, jitter=1e-6,
                    mesh: Mesh | None = None, max_iter: int = 200,
                    tol: float = 1e-8):
    """MAP fit with mesh-sharded Gram construction.  Drop-in engine-level
    entry for large-N problems (bench + dryrun path)."""
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
