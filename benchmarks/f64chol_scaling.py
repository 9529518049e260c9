#!/usr/bin/env python
"""How does emulated-f64 Cholesky cost scale with block size on this TPU?

The 16k factorisation's 16 x 1024^2 diagonal chols cost 1171 ms in-program
(chol_attrib.py), i.e. ~73 ms each ~ 4.9 GFLOP/s — far below even the
measured 17-65 GFLOP/s emulated-f64 envelope, so the cost is latency/
structure-dominated, not FLOP-dominated.  This sweep times a dependent
chain of emulated-f64 chols per block size IN ONE PROGRAM per size, each
size in its own fresh subprocess (per-program timings in a reused process
are poisoned by the program-swap trap, docs/TPU_NOTES.md).

Usage: nohup python benchmarks/f64chol_scaling.py > /tmp/f64chol.log 2>&1 &
"""

import os
import subprocess
import sys

CHILD = r"""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
b = int(%d); reps = int(%d)
rng = np.random.default_rng(0)
G = rng.normal(size=(b, b))
A = jnp.asarray(G @ G.T + b * np.eye(b), jnp.float64)

@jax.jit
def chain(A):
    def body(i, carry):
        A, s = carry
        L = jnp.linalg.cholesky(A + s * 1e-300)
        return A + 1e-12 * jnp.tril(L), s + jnp.sum(jnp.diag(L))
    return jax.lax.fori_loop(0, reps, body, (A, jnp.float64(0.0)))

# force a HOST READ to synchronise: jax.block_until_ready on a tuple
# returns early on this axon backend (does not actually block)
float(chain(A)[1])
t0 = time.time(); s = float(chain(A)[1])
dt = (time.time() - t0) / reps
print(f"b={b:5d} reps={reps:3d}  {dt*1e3:8.2f} ms/chol  "
      f"{(b**3/3)/dt/1e9:8.1f} GFLOP/s  check={s:.3e}", flush=True)
"""


def main():
    for b, reps in [(256, 64), (512, 32), (1024, 16), (2048, 8)]:
        r = subprocess.run(
            [sys.executable, "-c", CHILD % (b, reps)],
            capture_output=True, text=True, timeout=1200)
        print(r.stdout.strip() or r.stderr.strip().splitlines()[-1],
              flush=True)


if __name__ == "__main__":
    main()
