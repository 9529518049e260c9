#!/usr/bin/env python
"""Probe: the vmapped (chain-batched) 16k value+grad program.

The batched host sampler (host_hmc vec_eval) needs to know, per chain
count C: does the program compile, does it fit HBM, does it survive
launches (the round-3 fault class), and what does one batched launch
cost vs C serial launches?  The serial per-eval record is ~1.45 s
(docs/TPU_NOTES.md); C x 1.45 s per batched launch would make
batching a wash on wall-clock (its wins would then be ChEES + pooled
windows only), anything sublinear is a direct ESS/s multiplier.

Usage: nohup python benchmarks/vec16k_probe.py > /tmp/vec16k.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = int(os.environ.get("VEC_N", 16384))
BLOCK = int(os.environ.get("VEC_BLOCK", 1024))
CHAIN_LADDER = [int(s) for s in os.environ.get(
    "VEC_CHAINS", "1,2,4,8").split(",")]
REPS = int(os.environ.get("VEC_REPS", 3))


def make_data(n, nx=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.01 * rng.normal(size=n)
    return X, y


def main():
    import jax
    import jax.numpy as jnp

    from andvaranaut_tpu.gp import bigfit

    X, y = make_data(N)
    rvpack, nlp = bigfit.make_mixed_objective(
        jnp.asarray(X), jnp.asarray(y), kerns=("RBF",), noise=True,
        jitter=1e-6, block=BLOCK)
    z0 = np.asarray(rvpack.pack_values(
        {"gv": 1.011e-4, "l": [0.931, 1.817], "kv": 6.04}))
    dim = z0.size
    rng = np.random.default_rng(0)

    for C in CHAIN_LADDER:
        try:
            if C == 1:
                fn = jax.jit(jax.value_and_grad(nlp))

                def run(Z):
                    u, g = fn(jnp.asarray(Z[0]))
                    return float(u), np.asarray(g)
            else:
                fnv = jax.jit(jax.vmap(jax.value_and_grad(nlp)))

                def run(Z):
                    us, gs = fnv(jnp.asarray(Z))
                    return float(np.asarray(us)[0]), np.asarray(gs)

            Z = z0[None, :] + 0.01 * rng.standard_normal((max(C, 1),
                                                          dim))
            t0 = time.time()
            u0, _ = run(Z)
            t_compile = time.time() - t0
            times = []
            for r in range(REPS):
                Zr = z0[None, :] + 0.01 * rng.standard_normal(
                    (max(C, 1), dim))
                t0 = time.time()
                u, g = run(Zr)
                times.append(time.time() - t0)
            print(f"C={C}: compile+first {t_compile:.1f}s, steady "
                  f"{np.median(times):.3f}s/launch "
                  f"({np.median(times) / C:.3f}s per chain-eval), "
                  f"U0={u0:.2f}, grad finite="
                  f"{bool(np.isfinite(g).all())}", flush=True)
        except Exception as e:  # OOM / Mosaic / fault — record and go on
            print(f"C={C}: FAILED {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)


if __name__ == "__main__":
    main()
