#!/usr/bin/env python
"""Secondary performance measurements (BASELINE.md): prediction latency
per point post-warmup, and NUTS throughput (ESS/sec) for a GP
hyperparameter posterior.  Run manually on the target backend; results
recorded in docs/TPU_NOTES.md."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from andvaranaut_tpu.gp import engine
from andvaranaut_tpu.inference import nuts
from andvaranaut_tpu.lhc import _none_conrev


def bench_predict(n_train=512, n_pred=10000, nx=2):
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(n_train, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2
    Xq = rng.uniform(size=(n_pred, nx))
    l = jnp.asarray([0.5, 0.7])
    kv = jnp.asarray([1.0])
    gv = jnp.asarray(1e-4)
    L, v = engine.chol_state(
        ("RBF",), (), jnp.asarray(X), jnp.asarray(y), l, kv, gv, None, 1e-6)
    t0 = time.time()
    mu, var = engine.predict_from_chol(
        ("RBF",), (), jnp.asarray(X), L, v, jnp.asarray(Xq), l, kv, gv, None)
    float(jnp.sum(mu))
    t_compile = time.time() - t0
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        mu, var = engine.predict_from_chol(
            ("RBF",), (), jnp.asarray(X), L, v, jnp.asarray(Xq), l, kv, gv,
            None)
        float(jnp.sum(mu))
    per_pt_us = (time.time() - t0) / reps / n_pred * 1e6
    print(f"predict: {per_pt_us:.2f} us/pt at n_train={n_train}, "
          f"n_pred={n_pred} (compile {t_compile:.0f}s)")


def bench_nuts(n=256, chains=8, draws=500, tune=500, sampler=None,
               adapt_tlen=True):
    if sampler != "hmc" and jax.default_backend() not in ("cpu", "gpu"):
        # Documented platform cap (docs/TPU_NOTES.md + nuts_tpu_repro.py):
        # GP-objective NUTS beyond ~60 transitions crashes this TPU
        # runtime's worker; bench the safe single-launch config instead.
        # (sampler='hmc' — the TPU default in sample_model — has no cap;
        # use the `hmc` mode of this script.)
        print("TPU backend: GP NUTS capped to the safe config "
              "(see docs/TPU_NOTES.md / benchmarks/nuts_tpu_repro.py)")
        n, chains, draws, tune = 128, 2, 20, 20
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(n, 2))
    y = (np.sin(3 * X[:, 0]) + X[:, 1] ** 2).reshape(-1, 1)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y)
    t0 = time.time()
    data = nuts.sample_model(
        cfg, draws=draws, tune=tune, chains=chains, random_seed=0,
        sampler=sampler, adapt_tlen=adapt_tlen,
        steps_per_call=5 if jax.default_backend() == "tpu" else 100)
    wall = time.time() - t0
    ess = {k: np.min(np.atleast_1d(v)) for k, v in data.ess().items()}
    min_ess = min(ess.values())
    name = (sampler or "nuts") + (
        "" if sampler != "hmc" else
        ("+chees" if adapt_tlen else "+jitter"))
    print(f"{name}: {chains} chains x {draws} draws (+{tune} tune) on "
          f"n={n} GP posterior: {wall:.1f}s wall (incl compile), "
          f"min ESS {min_ess:.0f} -> {min_ess / wall:.1f} ESS/s; "
          f"divergences {int(np.asarray(data.sample_stats['diverging']).sum())}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "predict"):
        bench_predict()
    if which in ("all", "nuts"):
        bench_nuts()
    if which == "hmc":
        # the TPU-safe GP MCMC measurement (docs/TPU_NOTES.md);
        # MCMC_ADAPT_TLEN=0 measures the plain uniform-jitter variant
        bench_nuts(
            n=int(os.environ.get("MCMC_N", 256)),
            chains=int(os.environ.get("MCMC_CHAINS", 8)),
            draws=int(os.environ.get("MCMC_DRAWS", 300)),
            tune=int(os.environ.get("MCMC_TUNE", 300)),
            sampler="hmc",
            adapt_tlen=os.environ.get("MCMC_ADAPT_TLEN", "1") != "0")
