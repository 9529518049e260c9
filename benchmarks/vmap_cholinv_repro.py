#!/usr/bin/env python
"""On-chip check: jax.vmap over the fused pair chol+inverse kernel.

The small-n MCMC objective vmaps the whole mixed value+grad over chains;
before the grid=(1,)/int32-index-map fix in pallas_cholinv.py the pallas
batching rule produced i64 index-map constants under x64 and Mosaic
failed to legalize `func.return (i32, i64, i64)` (s11_hmc256 failure).

Usage: nohup python benchmarks/vmap_cholinv_repro.py > /tmp/log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from andvaranaut_tpu.gp import pallas_cholinv, precision


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    b, nb = 256, 4
    A = rng.normal(size=(nb, b, b))
    A = A @ np.swapaxes(A, 1, 2) + b * np.eye(b)
    Aj = jnp.asarray(A)

    t0 = time.time()
    L, X, ok = jax.jit(jax.vmap(pallas_cholinv.chol_inv_block_pair))(Aj)
    res = float(jnp.max(jnp.abs(L @ jnp.swapaxes(L, 1, 2) - Aj)))
    inv = float(jnp.max(jnp.abs(
        jnp.einsum("bij,bjk->bik", L, X) - jnp.eye(b))))
    print(f"vmapped chol_inv_block_pair: compile+run {time.time()-t0:.0f}s "
          f"residual {res:.2e} inv-residual {inv:.2e} ok={bool(jnp.all(ok))}",
          flush=True)

    # the full small-n single-block route under vmap (what _init_chain hits)
    def f(K):
        L, Dinv = precision.blocked_cholesky(K, block=b, return_inv=True)
        return jnp.sum(jnp.log(jnp.diag(L))) + Dinv[0][0, 0]

    t0 = time.time()
    out = jax.jit(jax.vmap(f))(Aj)
    print(f"vmapped blocked_cholesky small-n: compile+run "
          f"{time.time()-t0:.0f}s out[0]={float(out[0]):.6f}", flush=True)

    # the actual HMC surface: the mixed value+grad objective vmapped
    # over chain positions (covers the vmapped tri-grid syrk, the
    # row_start solve and the stored-inverse reuse too)
    from andvaranaut_tpu.gp import bigfit

    X = rng.uniform(size=(b, 2))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.01 * rng.normal(size=b)
    rvpack, nlp = bigfit.make_mixed_objective(
        jnp.asarray(X), jnp.asarray(y), kerns=("RBF",), block=b)
    z = jnp.asarray(np.log([1e-4, 0.5, 0.7, 1.0]))
    zs = jnp.stack([z, z + 0.05, z - 0.05, z + 0.1])
    t0 = time.time()
    vals, grads = jax.jit(jax.vmap(jax.value_and_grad(nlp)))(zs)
    print(f"vmapped mixed value+grad n={b}: compile+run "
          f"{time.time()-t0:.0f}s vals={np.asarray(vals)}", flush=True)
    assert np.isfinite(np.asarray(vals)).all()
    assert np.isfinite(np.asarray(grads)).all()
    print("PASS", flush=True)


if __name__ == "__main__":
    main()
