#!/usr/bin/env python
"""Does jittered fixed-budget HMC survive on the TPU where NUTS crashes?

Same GP hyperposterior as benchmarks/nuts_tpu_repro.py (which kills the
axon TPU worker after ~60-200 NUTS transitions) but with sampler='hmc':
the transition is a single bounded fori_loop of leapfrog steps — the
same program shape as the MAP fit, which runs for hours on this chip.

Also measures ESS/s on the TPU if the run survives (the BASELINE.json
metric NUTS could never produce on-chip).

Usage:  nohup python benchmarks/hmc_tpu_check.py > /tmp/hmc_tpu.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    from andvaranaut_tpu.gp import engine
    from andvaranaut_tpu.inference import nuts
    from andvaranaut_tpu.lhc import _none_conrev

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    rng = np.random.default_rng(0)
    n = int(os.environ.get("HMC_N", 256))
    chains = int(os.environ.get("HMC_CHAINS", 2))
    tune = int(os.environ.get("HMC_TUNE", 100))
    draws = int(os.environ.get("HMC_DRAWS", 100))
    X = rng.uniform(size=(n, 2))
    y = (np.sin(3 * X[:, 0]) + X[:, 1] ** 2
         + 0.05 * rng.normal(size=n)).reshape(-1, 1)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y)
    spc = int(os.environ.get("HMC_SPC", 5))
    smp = os.environ.get("HMC_SAMPLER", "hmc")  # hmc | hmc_fixed
    depth = int(os.environ.get("HMC_DEPTH", 6))
    adapt = os.environ.get("HMC_ADAPT_TLEN", "1") != "0"
    t0 = time.time()
    data = nuts.sample_model(
        cfg, draws=draws, tune=tune, chains=chains, random_seed=0,
        sampler=smp, mixed=True, verbose=False, steps_per_call=spc,
        max_treedepth=depth, adapt_tlen=adapt)
    wall = time.time() - t0
    print(f"SURVIVED: n={n} chains={chains} {tune}+{draws} in {wall:.1f}s",
          flush=True)
    print(data.summary(), flush=True)
    ess = data.ess()
    min_ess = min(float(np.min(np.asarray(v))) for v in ess.values())
    print(f"min ESS {min_ess:.0f} -> {min_ess / wall:.2f} ESS/s "
          f"(incl compile)", flush=True)


if __name__ == "__main__":
    main()
