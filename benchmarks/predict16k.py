#!/usr/bin/env python
"""Large-N prediction latency (BASELINE.md): 10k query points against a
16k-row fitted surrogate through the mixed conditioning state
(GPState.predict above MIXED_N — blocked factorisation + PCG alpha).

Usage: nohup python benchmarks/predict16k.py > /tmp/predict16k.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = int(os.environ.get("PRED_N", 16384))
NQ = int(os.environ.get("PRED_NQ", 10000))


def main():
    from andvaranaut_tpu.gpmcmc import GPState

    rng = np.random.default_rng(0)
    X = rng.uniform(size=(N, 2))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.01 * rng.normal(size=N)
    hypers = {"gv": np.asarray(1e-4), "l": np.asarray([0.85, 2.56]),
              "kv": np.asarray([5.0])}
    st = GPState(("RBF",), (), True, 1e-6, X, y, hypers)
    Xq = rng.uniform(size=(NQ, 2))
    t0 = time.time()
    mu, var = st.predict(Xq)
    cold = time.time() - t0
    t0 = time.time()
    mu, var = st.predict(Xq)
    mu = np.asarray(mu)
    warm = time.time() - t0
    print(f"predict N={N} -> {NQ} pts: cold {cold:.1f} s (incl "
          f"conditioning+compile), warm {warm:.3f} s "
          f"({warm / NQ * 1e6:.1f} us/pt)", flush=True)
    # spot accuracy vs truth at the fitted-optimum hypers
    ytrue = np.sin(3 * Xq[:, 0]) + Xq[:, 1] ** 2
    rmse = float(np.sqrt(np.mean((mu.reshape(-1) - ytrue) ** 2)))
    print(f"RMSE vs truth {rmse:.2e}; var range "
          f"[{float(np.min(np.asarray(var))):.2e}, "
          f"{float(np.max(np.asarray(var))):.2e}]", flush=True)


if __name__ == "__main__":
    main()
