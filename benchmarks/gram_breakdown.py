#!/usr/bin/env python
"""Sub-stage wall breakdown of the 16k exact-f64 Gram (bench.py stage).

Separates the ARD squared-distance (emulated-f64 difference form) from
the emulated-f64 exp, and times candidate cheaper formulations, to decide
whether a fused pair-arithmetic Pallas Gram kernel is worth building.

Usage: nohup python benchmarks/gram_breakdown.py > /tmp/gram_bd.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

N = int(os.environ.get("BD_N", 16384))
REPS = int(os.environ.get("BD_REPS", 3))


def _time(tag, f, *args):
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = jax.block_until_ready(f(*args))
    dt = (time.time() - t0) / REPS
    print(f"{tag:40s} {dt*1000:9.1f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return out


def main():
    print(f"backend={jax.default_backend()} N={N}", flush=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(N, 2)))
    ls = jnp.asarray([0.5, 0.7])

    def r2_only(X):
        Xs = X / ls
        r2 = None
        for k in range(2):
            diff = Xs[:, k, None] - Xs[None, :, k]
            term = diff * diff
            r2 = term if r2 is None else r2 + term
        return r2

    r2 = _time("r2 difference form (emul f64)", jax.jit(r2_only), X)
    _time("exp(-0.5*r2) (emul f64)", jax.jit(lambda r2: jnp.exp(-0.5 * r2)),
          r2)
    _time("gram fused (r2+exp, emul f64)",
          jax.jit(lambda X: jnp.exp(-0.5 * r2_only(X))), X)
    # f32 versions for scale
    X32 = X.astype(jnp.float32)
    ls32 = ls.astype(jnp.float32)

    def r2_f32(X):
        Xs = X / ls32
        r2 = None
        for k in range(2):
            diff = Xs[:, k, None] - Xs[None, :, k]
            term = diff * diff
            r2 = term if r2 is None else r2 + term
        return r2

    _time("gram f32 (r2+exp)",
          jax.jit(lambda X: jnp.exp(-0.5 * r2_f32(X))), X32)
    # the elementwise subtraction-masking traffic of one chol step
    K = jnp.asarray(rng.uniform(size=(N, N)))
    M = jnp.asarray(rng.uniform(size=(N, N)))
    _time("A - where(upd, C, 0) full (emul f64)",
          jax.jit(lambda a, c: a - jnp.where(c > 0.5, c, 0.0)), K, M)


if __name__ == "__main__":
    main()
