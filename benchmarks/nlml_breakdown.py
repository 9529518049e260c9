#!/usr/bin/env python
"""Stage-by-stage wall breakdown of the headline 16k NLML (bench.py).

Times each stage as its own jitted program (steady-state, post-compile):
Gram construction, blocked Cholesky (with and without stored inverses),
the triangular inverse of one diagonal block, the refined solve given the
factor, and the end-to-end mixed_nlml.  Guides kernel optimisation — see
docs/TPU_NOTES.md for recorded numbers.

Usage: nohup python benchmarks/nlml_breakdown.py > /tmp/breakdown.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from andvaranaut_tpu.gp import kernels, precision

N = int(os.environ.get("BD_N", 16384))
BLOCK = int(os.environ.get("BD_BLOCK", 1024))
REPS = int(os.environ.get("BD_REPS", 3))


def _time(tag, f, *args):
    t0 = time.time()
    out = f(*args)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = f(*args)
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
            else a, out)
    dt = (time.time() - t0) / REPS
    print(f"{tag:34s} {dt*1000:9.1f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return out


def main():
    print(f"backend={jax.default_backend()} N={N} block={BLOCK}", flush=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(N, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(X[:, 0])) + 0.01 * rng.normal(size=N))
    l = jnp.asarray([0.5, 0.7])
    kv = jnp.asarray([1.0])

    @jax.jit
    def gram_only(X):
        K = kernels.gram(("RBF",), (), X, None, l, kv, None)
        return K + jnp.eye(N, dtype=X.dtype) * (1e-4 + 1e-6)

    K = _time("gram (exact f64)", gram_only, X)

    chol = jax.jit(lambda K: precision.blocked_cholesky(
        K, block=BLOCK, return_inv=True))
    L, Dinv = _time("blocked_cholesky (+inverses)", chol, K)

    Ljj = jax.lax.dynamic_slice(L, (0, 0), (BLOCK, BLOCK))
    tri = jax.jit(lambda Lb: precision.tri_inv_mixed(Lb, base=128))
    _time(f"tri_inv_mixed ({BLOCK}) x1", tri, Ljj)

    solve = jax.jit(lambda L, K, y, Dinv: precision.refined_chol_solve(
        L, K, y, block=BLOCK, Dinv=Dinv))
    _time("refined_chol_solve (3 passes)", solve, L, K, y, Dinv)

    slicemm = jax.jit(lambda A, B: precision.slice_matmul(A, B))
    Apan = L[:, :BLOCK]
    _time(f"slice_matmul ({N}x{BLOCK})@({BLOCK}x{N})", slicemm, Apan, Apan.T)

    nlml = jax.jit(lambda K, y: precision.mixed_nlml(K, y, block=BLOCK))
    _time("mixed_nlml end-to-end (from K)", nlml, K, y)

    # ---- per-step component ladders (BD_LADDERS=diag,syrk,panel) ------
    # Each ladder replays ONE component of every factorisation step
    # inside a single jitted program, so per-step costs amortise the
    # launch/program-swap overheads exactly as they do in production
    # (docs/TPU_NOTES.md "Micro-benchmark trap": standalone stage numbers
    # are inflated by cross-executable swaps on this service).
    ladders = [
        s for s in os.environ.get("BD_LADDERS", "").split(",") if s]
    if ladders:
        def _levels():
            out, m = [], N
            while True:
                nbl = m // BLOCK
                if nbl == 1:
                    break
                nsteps = max(-(-nbl // precision.CHOL_SHRINK), 1)
                for j in range(nsteps):
                    out.append((m, (j + 1) * BLOCK))
                m -= nsteps * BLOCK
                if m == 0:
                    break
            return out

        levels = _levels()
        nb = N // BLOCK

        if "diag" in ladders:
            @jax.jit
            def diag_ladder(K):
                acc = jnp.zeros(())
                for j in range(nb):
                    Ajj = jax.lax.dynamic_slice(
                        K, (j * BLOCK, j * BLOCK), (BLOCK, BLOCK))
                    Lj, Xj = precision._chol_inv_diag(
                        Ajj, True, precision.DEFAULT_NSLICES)
                    acc = acc + jnp.sum(jnp.diag(Lj)) + Xj[0, 0]
                return acc

            _time(f"diag chol+inv ladder x{nb}", diag_ladder, K)

        if "panel" in ladders:
            Linv0 = Dinv[0]

            @jax.jit
            def panel_ladder(K, Linv):
                acc = jnp.zeros(())
                for (m, rs) in levels:
                    cols = jax.lax.dynamic_slice(K, (0, 0), (m, BLOCK))
                    P = precision.slice_matmul(cols, Linv.T, row_start=rs)
                    acc = acc + P[-1, -1]
                return acc

            _time(f"panel mm ladder x{len(levels)}", panel_ladder, K, Linv0)

        if "syrk" in ladders:
            from andvaranaut_tpu.gp import pallas_slicemm

            Ah0 = K.astype(jnp.float32)
            Al0 = (K - Ah0.astype(K.dtype)).astype(jnp.float32)
            Pan = jnp.asarray(L[:, :BLOCK])

            @jax.jit
            def syrk_ladder(Ahi, Alo, Pan):
                acc = jnp.zeros((), jnp.float32)
                for (m, rs) in levels:
                    ah = jax.lax.dynamic_slice(Ahi, (0, 0), (m, m))
                    al = jax.lax.dynamic_slice(Alo, (0, 0), (m, m))
                    pm = jax.lax.dynamic_slice(Pan, (0, 0), (m, BLOCK))
                    nh, nl = pallas_slicemm.pallas_int_slice_syrk_sub_pair(
                        ah, al, pm.astype(jnp.float64), row_start=rs)
                    acc = acc + nh[-1, -1] + nl[-1, -1]
                return acc

            _time(f"syrk+sub ladder x{len(levels)}", syrk_ladder,
                  Ah0, Al0, Pan)

    # free the 2 GB intermediates before compiling the full program
    del L, Dinv, K, Apan, Ljj

    @jax.jit
    def full(X, y):
        K = kernels.gram(("RBF",), (), X, None, l, kv, None)
        K = K + jnp.eye(N, dtype=X.dtype) * (1e-4 + 1e-6)
        return precision.mixed_nlml(K, y, block=BLOCK)

    _time("bench.py path (gram + nlml)", full, X, y)


if __name__ == "__main__":
    main()
