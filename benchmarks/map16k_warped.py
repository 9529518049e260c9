#!/usr/bin/env python
"""16k MAP fit WITH a learnable output warping (cwgp) — the round-3
capability the reference could never reach at this scale (its cwgp path
rebuilds a PyMC graph whose NLML+grad costs minutes per evaluation at
16k; ours runs make_warped_vg's closed-form pipeline).

Same synthetic problem as bench.py/map16k.py, warped through
meanstd + sinharcsinh with learnable (a, b).

Usage: nohup python benchmarks/map16k_warped.py > /tmp/map16k_warped.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = int(os.environ.get("MAP_N", 16384))
BLOCK = int(os.environ.get("MAP_BLOCK", 1024))
MAXITER = int(os.environ.get("MAP_MAXITER", 60))


def main():
    import andvaranaut_tpu.transform as tf
    from andvaranaut_tpu.gp import bigfit, engine
    from andvaranaut_tpu.lhc import _none_conrev

    rng = np.random.default_rng(0)
    X = rng.uniform(size=(N, 2))
    y = (np.sin(3 * X[:, 0]) + X[:, 1] ** 2
         + 0.01 * rng.normal(size=N)).reshape(-1, 1)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=True, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[tf.wgp(["meanstd", "sinharcsinh"],
                         np.array([0.0, 1.0]), y=y[:, 0])],
        x=X, y=y)
    t0 = time.time()
    hypers, logpost = bigfit.big_warped_map_fit(
        cfg, block=BLOCK, maxiter=MAXITER, verbose=True)
    wall = time.time() - t0
    print(f"warped MAP fit N={N} block={BLOCK}: {wall:.1f}s incl "
          f"compile, logpost {logpost:.2f}, hypers {hypers}", flush=True)


if __name__ == "__main__":
    main()
