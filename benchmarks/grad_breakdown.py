#!/usr/bin/env python
"""Stage attribution of the bigfit value+grad pipeline at 16k.

The north-star MAP fit's per-evaluation cost (measured ~5 s at 16k)
is the closed-form gradient pipeline, not the factorisation (which
the headline bench puts at ~0.5 s).  This harness times nested
prefixes of the pipeline END-TO-END (each prefix is its own jitted
program, timed steady-state in this one process) so the deltas give
honest in-program stage costs:

  P0  gram + blocked factorisation (+ logdet + refined solve) — the NLML
  P1  P0 + identity solve Linv = L^-1 (blocked_solve_lower, row_start)
  P2  P1 + K^-1 = Linv^T Linv (triangular-grid syrk + mirror)
  P3  the full nlml_value_and_grad (adds the contraction scan)

Remote-service timing gotcha (docs/TPU_NOTES.md): block_until_ready
does not synchronise here — every timed region ends in a scalar
float(...) host read.

Usage: nohup python benchmarks/grad_breakdown.py > /tmp/gradbd.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from andvaranaut_tpu.gp import bigfit, kernels, precision

N = int(os.environ.get("GB_N", 16384))
BLOCK = int(os.environ.get("GB_BLOCK", 1024))
REPS = int(os.environ.get("GB_REPS", 2))


def make_data(n, nx=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.01 * rng.normal(size=n)
    return X, y


def timed(name, f, *args):
    t0 = time.time()
    out = f(*args)
    # force a host read of one scalar from the (pytree) output
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).reshape(-1)[0])
    compile_s = time.time() - t0
    walls = []
    for _ in range(REPS):
        t0 = time.time()
        out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        walls.append(time.time() - t0)
    dt = min(walls)
    print(f"{name}: {dt*1000:.1f} ms steady (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    X, y = make_data(N)
    Xj = jnp.asarray(X)
    yj = jnp.asarray(y)
    l = jnp.asarray([0.5, 0.7])
    kv = jnp.asarray([1.0])
    gv = 1e-4

    def base(Xa, ya):
        K = kernels.gram(("RBF",), (), Xa, None, l, kv, None)
        row = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        K = K + jnp.where(row == col, 1e-6 + gv, 0.0)
        L, Dinv = precision.blocked_cholesky(
            K, block=BLOCK, return_inv=True)
        alpha = precision.refined_chol_solve(L, K, ya, block=BLOCK,
                                             Dinv=Dinv)
        logl = (-0.5 * jnp.dot(ya, alpha)
                - jnp.sum(jnp.log(jnp.diag(L))))
        return logl, L, Dinv, alpha

    @jax.jit
    def p0(Xa, ya):
        logl, L, Dinv, alpha = base(Xa, ya)
        return logl

    @jax.jit
    def p1(Xa, ya):
        logl, L, Dinv, alpha = base(Xa, ya)
        Linv = precision.blocked_inv_lower(L, Dinv=Dinv)
        return logl + Linv[0, 0]

    @jax.jit
    def p2(Xa, ya):
        logl, L, Dinv, alpha = base(Xa, ya)
        Linv = precision.blocked_inv_lower(L, Dinv=Dinv)
        C = precision.slice_syrk_tn_lower(Linv, w_lower=True)
        return logl + C[0, 0]

    rvpack = bigfit._default_rvpack(2, ("RBF",), True)
    z = jnp.asarray(np.log([1e-4, 0.5, 0.7, 1.0]))

    def p3(Xa, ya):
        return bigfit.nlml_value_and_grad(
            Xa, ya, z, kerns=("RBF",), block=BLOCK, rvpack=rvpack)

    t0 = timed("P0 nlml (gram+chol+solve)", p0, Xj, yj)
    t1 = timed("P1 +Linv pair identity solve", p1, Xj, yj)
    t2 = timed("P2 +Kinv native tn syrk", p2, Xj, yj)
    t3 = timed("P3 full value+grad", p3, Xj, yj)
    print(f"deltas: Linv {1000*(t1-t0):.0f} ms, Kinv {1000*(t2-t1):.0f} ms, "
          f"contraction+rest {1000*(t3-t2):.0f} ms", flush=True)


if __name__ == "__main__":
    main()
