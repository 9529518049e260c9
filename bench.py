#!/usr/bin/env python
"""Headline benchmark: large-N GP marginal-likelihood evaluation.

Workload (BASELINE.json north star): N=16384 training points, 2-D inputs,
RBF kernel + noise — the O(N^3) Cholesky-dominated NLML at the heart of
MAP fitting and NUTS.

Ours: the mixed-precision blocked factorisation (int8-Ozaki slice
matmuls with exact int32 MXU accumulation, fused pair-arithmetic
diagonal Cholesky+inverse with MXU trailing syrks, the trailing matrix
carried as an f32 pair with the syrk update fused in place, and
f64-refined solves) on the TPU, end to end from raw inputs (Gram
construction included).

Baseline: the same f64 computation in numpy/OpenBLAS on the host CPU,
measured directly at the same N — the reference stack's PyTensor-compiled
NLML is BLAS-bound in the same way (PyMC itself is not installed in this
image).  The CPU value doubles as the f64 parity reference: the relative
deviation of the TPU result is reported alongside.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from andvaranaut_tpu.gp import kernels, precision

N = int(os.environ.get("BENCH_N", 16384))
BLOCK = int(os.environ.get("BENCH_BLOCK", 1024))
REPS = int(os.environ.get("BENCH_REPS", 3))


def make_data(n, nx=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.01 * rng.normal(size=n)
    return X, y


L_SCALES = np.array([0.5, 0.7])
KV, GV, JITTER = 1.0, 1e-4, 1e-6


def tpu_nlml(n):
    X, y = make_data(n)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    l = jnp.asarray(L_SCALES)
    kv = jnp.asarray([KV])

    @jax.jit
    def f(X, y):
        K = kernels.gram(("RBF",), (), X, None, l, kv, None)
        K = K + jnp.eye(n, dtype=X.dtype) * (JITTER + GV)
        return precision.mixed_nlml(K, y, block=min(BLOCK, max(n // 4, 1)))

    t0 = time.time()
    val = float(f(Xj, yj))  # compile + first run
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        val = float(f(Xj, yj))
    dt = (time.time() - t0) / REPS
    return dt, val, t_compile


def cpu_nlml(n):
    """Exact f64 reference on host BLAS; also the baseline timing."""
    from scipy.linalg import cho_factor, solve_triangular

    X, y = make_data(n)
    Xs = X / L_SCALES

    def run():
        sq = np.zeros((n, n))
        for k in range(X.shape[1]):
            d = Xs[:, k, None] - Xs[None, :, k]
            sq += d * d
        K = KV * np.exp(-0.5 * sq) + (GV + JITTER) * np.eye(n)
        L = np.linalg.cholesky(K)
        beta = solve_triangular(L, y, lower=True)
        return (
            -0.5 * beta @ beta
            - np.log(np.diag(L)).sum()
            - 0.5 * n * np.log(2 * np.pi)
        )

    t0 = time.time()
    val = run()
    return time.time() - t0, val


def _backend_watchdog(
        timeout_s: int = int(os.environ.get("BENCH_INIT_TIMEOUT", 900))):
    """Fail loudly instead of hanging forever when the remote TPU
    service is wedged (observed: jax.devices() blocks indefinitely
    inside the C++ plugin, where a Python signal handler can never run
    — only a separate thread can still act).  A daemon timer hard-exits
    if backend init has not completed in time."""
    import threading

    def _abort():
        print(
            "# bench: TPU backend initialisation exceeded "
            f"{timeout_s}s (remote service unresponsive) — aborting",
            file=sys.stderr, flush=True)
        os._exit(2)

    timer = threading.Timer(timeout_s, _abort)
    timer.daemon = True
    timer.start()
    jax.devices()  # forces backend init; blocks in C++ when wedged
    timer.cancel()


def main():
    _backend_watchdog()
    dt_tpu, val_tpu, t_compile = tpu_nlml(N)
    dt_cpu, val_cpu = cpu_nlml(N)
    rel_err = abs(val_tpu - val_cpu) / abs(val_cpu)
    result = {
        "metric": f"gp_nlml_n{N}_wall_ms",
        "value": round(dt_tpu * 1000.0, 2),
        "unit": "ms",
        "vs_baseline": round(dt_cpu / dt_tpu, 2),
    }
    print(json.dumps(result))
    print(
        f"# detail: tpu nlml={val_tpu:.8e} vs cpu f64 {val_cpu:.8e} "
        f"(rel err {rel_err:.2e}); tpu {dt_tpu*1000:.1f} ms/eval "
        f"(first incl compile {t_compile:.0f}s), cpu {dt_cpu:.2f}s; "
        f"backend={jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
