#!/usr/bin/env python
"""In-program attribution of the blocked-Cholesky stages at 16k.

Standalone micro-timings on this service are poisoned by cross-executable
program-swap overhead (docs/TPU_NOTES.md "Micro-benchmark trap"), so the
only honest attribution is differential: compile VARIANTS of the full
factorisation with individual stages replaced by shape-identical
no-compute stand-ins, and subtract steady-state walls.

Variants (all one jitted program over the same 16k Gram):
  full    : the real blocked_cholesky (+ inverses)       — baseline
  noinv   : tri_inv_mixed replaced by tril(Ljj)          — saves inverse chain
  nochol  : additionally _chol_f64 replaced by tril(Ajj) — saves emulated-f64 chols
The nochol wall is the syrk+panel+glue floor.

Usage: nohup python benchmarks/chol_attrib.py > /tmp/chol_attrib.log 2>&1 &
"""

import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from andvaranaut_tpu.gp import kernels, precision

N = int(os.environ.get("BD_N", 16384))
BLOCK = int(os.environ.get("BD_BLOCK", 1024))
REPS = int(os.environ.get("BD_REPS", 3))


def _run(tag, K):
    f = jax.jit(lambda K: precision.blocked_cholesky(
        K, block=BLOCK, return_inv=True))
    t0 = time.time()
    out = f(K)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = f(K)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    dt = (time.time() - t0) / REPS
    print(f"{tag:10s} {dt*1000:9.1f} ms   (first {compile_s:.0f}s)",
          flush=True)
    del out
    f.clear_cache()
    return dt


def main():
    print(f"backend={jax.default_backend()} N={N} block={BLOCK}", flush=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(N, 2)))
    l = jnp.asarray([0.5, 0.7])
    kv = jnp.asarray([1.0])
    K = jax.jit(lambda X: kernels.gram(("RBF",), (), X, None, l, kv, None)
                + jnp.eye(N, dtype=X.dtype) * (1e-4 + 1e-6))(X)
    K.block_until_ready()

    t_full = _run("full", K)

    fake_inv = lambda L, **kw: jnp.tril(L)
    with mock.patch.object(precision, "tri_inv_mixed", fake_inv):
        t_noinv = _run("noinv", K)
        with mock.patch.object(precision, "_chol_f64", jnp.tril):
            t_nochol = _run("nochol", K)

    print(f"attribution: inverse chain {1000*(t_full-t_noinv):.0f} ms, "
          f"f64 diag chols {1000*(t_noinv-t_nochol):.0f} ms, "
          f"syrk+panel+glue {1000*t_nochol:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
