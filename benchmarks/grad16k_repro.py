#!/usr/bin/env python
"""On-chip check of the bigfit gradient pipeline's new work-cut paths
(triangular-grid K^-1 syrk + row_start identity solve) at a reduced N
before committing the full 16k MAP-fit wall re-run.

s11_map16k failed with every restart's exception swallowed; this runs
ONE value+grad with the full traceback surfaced.

Usage: GR_N=4096 nohup python benchmarks/grad16k_repro.py > /tmp/log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from andvaranaut_tpu.gp import bigfit

N = int(os.environ.get("GR_N", 4096))
BLOCK = int(os.environ.get("GR_BLOCK", 1024))


def main():
    print("backend:", jax.default_backend(), "N", N, "block", BLOCK,
          flush=True)
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(N, 2))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.01 * rng.normal(size=N)
    rvpack, _ = bigfit.make_mixed_objective(
        jnp.asarray(X), jnp.asarray(y), kerns=("RBF",), block=BLOCK)
    z = jnp.asarray(np.log([1e-4, 0.5, 0.7, 1.0]))

    t0 = time.time()
    logl, g = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, kerns=("RBF",), block=BLOCK,
        rvpack=rvpack)
    logl = float(logl)
    g = np.asarray(g)
    dt = time.time() - t0
    print(f"value+grad: {dt:.0f}s (incl compile) logl={logl:.4f} "
          f"grad={g}", flush=True)
    assert np.isfinite(logl) and np.isfinite(g).all(), "non-finite!"

    # steady-state timing
    t0 = time.time()
    logl2, g2 = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, kerns=("RBF",), block=BLOCK,
        rvpack=rvpack)
    _ = float(logl2)
    print(f"steady: {(time.time()-t0)*1000:.0f} ms", flush=True)
    print("PASS", flush=True)


if __name__ == "__main__":
    main()
