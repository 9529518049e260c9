#!/usr/bin/env python
"""Probe 2: locate the vmapped value+grad compile-failure boundary.

vec16k_probe round-5 finding: the C=1 16k program compiles and runs
(1.454 s/launch) but jax.vmap over C=2/4 chains dies in the REMOTE
COMPILER (tpu_compile_helper subprocess exit 1 — not an HBM OOM at
runtime, not the round-3 launch fault).  This probe walks (a) the n
ladder at C=2 to find where vmap stops compiling, and (b) a
lax.map-over-chains variant at 16k (same per-chain program shape, no
Pallas batching rules) as the fallback batching mechanism.

Usage: nohup python benchmarks/vec16k_probe2.py > /tmp/vec16k2.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CASES = os.environ.get(
    "VEC2_CASES",
    "vmap:2:4096,vmap:2:8192,map:2:16384,map:4:16384")
BLOCK = int(os.environ.get("VEC2_BLOCK", 1024))
REPS = int(os.environ.get("VEC2_REPS", 3))


def make_data(n, nx=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.01 * rng.normal(size=n)
    return X, y


def main():
    import jax
    import jax.numpy as jnp

    from andvaranaut_tpu.gp import bigfit

    objs = {}

    def obj(n):
        if n not in objs:
            X, y = make_data(n)
            block = min(BLOCK, n)
            rvpack, nlp = bigfit.make_mixed_objective(
                jnp.asarray(X), jnp.asarray(y), kerns=("RBF",),
                noise=True, jitter=1e-6, block=block)
            objs[n] = (rvpack, nlp)
        return objs[n]

    rng = np.random.default_rng(0)
    for case in CASES.split(","):
        mode, C, n = case.split(":")
        C, n = int(C), int(n)
        try:
            rvpack, nlp = obj(n)
            vg = jax.value_and_grad(nlp)
            if mode == "vmap":
                fn = jax.jit(jax.vmap(vg))
            else:
                fn = jax.jit(lambda Z: jax.lax.map(vg, Z))
            z0 = np.asarray(rvpack.z0())
            Z = z0[None, :] + 0.01 * rng.standard_normal((C, z0.size))
            t0 = time.time()
            us, gs = fn(jnp.asarray(Z))
            us = np.asarray(us)
            t_compile = time.time() - t0
            times = []
            for r in range(REPS):
                Zr = z0[None, :] + 0.01 * rng.standard_normal(
                    (C, z0.size))
                t0 = time.time()
                us, gs = fn(jnp.asarray(Zr))
                us = np.asarray(us)
                gs = np.asarray(gs)
                times.append(time.time() - t0)
            print(f"{mode} C={C} n={n}: compile+first "
                  f"{t_compile:.1f}s, steady {np.median(times):.3f}s"
                  f"/launch ({np.median(times) / C:.3f}s per chain), "
                  f"U0={us[0]:.2f}, finite="
                  f"{bool(np.isfinite(gs).all())}", flush=True)
        except Exception as e:
            print(f"{mode} C={C} n={n}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
