#!/usr/bin/env python
"""North-star measurement: full 16k MAP fit wall clock on TPU
(BASELINE.json / docs/TPU_NOTES.md "Full 16k MAP fit").

Same synthetic problem as bench.py; bigfit.big_map_fit (closed-form
mixed-precision gradients, host L-BFGS-B, reference hyperprior menu).

Usage: nohup python benchmarks/map16k.py > /tmp/map16k.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from andvaranaut_tpu.gp import bigfit

N = int(os.environ.get("MAP_N", 16384))
BLOCK = int(os.environ.get("MAP_BLOCK", 1024))
MAXITER = int(os.environ.get("MAP_MAXITER", 200))
FTOL = float(os.environ.get("MAP_FTOL", 1e-7))


def make_data(n, nx=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.01 * rng.normal(size=n)
    return X, y


def main():
    X, y = make_data(N)
    t0 = time.time()
    hypers, logpost = bigfit.big_map_fit(
        X, y, kerns=("RBF",), block=BLOCK, maxiter=MAXITER, verbose=True,
        ftol=FTOL)
    wall = time.time() - t0
    print(f"MAP fit N={N} block={BLOCK}: {wall:.1f}s incl compile, "
          f"logpost {logpost:.2f}, hypers {hypers}", flush=True)


if __name__ == "__main__":
    main()
