#!/usr/bin/env python
"""Large-N workflow through the public GPMCMC facade.

The reference stack cannot fit GPs at tens of thousands of points (one
CPU f64 NLML+gradient at 16k costs minutes; a fit takes hours).  The
rebuild's `precision='mixed'` path runs the whole MAP fit through the
int8-Ozaki blocked factorisation with closed-form gradients
(gp/bigfit.py) — measured 1.76 s per value+grad at N=16384 on a TPU
v5e (docs/TPU_NOTES.md) — and predictions at that scale through the
mixed conditioning state automatically.

Learnable output warpings run through the same machinery
(`fit(precision='mixed', cwgp=True)`).

Usage:
  python examples/large_n.py              # N=512 (CPU-friendly smoke)
  LARGE_N=16384 nohup python examples/large_n.py &   # the real thing (TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from andvaranaut_tpu import GPMCMC, dists
import andvaranaut_tpu.transform as tf

N = int(os.environ.get("LARGE_N", 512))


def target(x):
    return np.array([np.sin(3 * x[0]) + x[1] ** 2])


def main():
    rng = np.random.default_rng(0)
    priors = [dists.Uniform(0.0, 1.0), dists.Uniform(0.0, 1.0)]
    x = rng.uniform(size=(N, 2))
    y = (np.sin(3 * x[:, 0]) + x[:, 1] ** 2
         + 0.01 * rng.normal(size=N)).reshape(-1, 1)

    g = GPMCMC(nx=2, ny=1, priors=priors, target=target,
               xconrevs=[tf.uniform(priors[0]), tf.uniform(priors[1])],
               verbose=True)
    g.set_data(x, y)

    t0 = time.time()
    g.fit(method="map", precision="mixed")
    print(f"mixed MAP fit N={N}: {time.time() - t0:.1f} s "
          f"(incl one-time compile), hypers {g.hypers}")

    xq = rng.uniform(size=(2000, 2))
    t0 = time.time()
    mu = g.predict(xq)
    dt = time.time() - t0
    ytrue = np.sin(3 * xq[:, 0]) + xq[:, 1] ** 2
    rmse = float(np.sqrt(np.mean((mu[:, 0] - ytrue) ** 2)))
    print(f"predict 2000 pts: {dt:.3f} s ({dt / 2000 * 1e6:.1f} us/pt), "
          f"RMSE vs truth {rmse:.2e}")

    if os.environ.get("LARGE_N_MCMC", "0") == "1":
        # Hyperparameter posterior at large N.  On TPU, sample_model
        # (reached via fit(method='mcmc_mean')) automatically uses the
        # host-driven HMC sampler above n=2048 — one value+grad launch
        # per leapfrog, the only program class that does not fault
        # this platform's worker at 16k-scale (docs/TPU_NOTES.md).
        # chains >= 2 advance in LOCKSTEP through one chain-batched
        # launch per leapfrog (lax.map above n=8192, vmap below), and
        # `start=g.hypers` fixes the mass to the curvature at the MAP
        # point probed through the same batched program.
        # LARGE_N_TEMPER > 0 adds that many parallel-tempering lanes
        # (flattened targets riding the same batched launch; free
        # replica-exchange swaps feed the cold chains) — the
        # between-chain mixing lever for the wide flat 16k posterior
        # basin (docs/TPU_NOTES.md round 5).
        temper = int(os.environ.get("LARGE_N_TEMPER", "0"))
        t0 = time.time()
        g.fit(method="mcmc_mean", mixed=True, draws=20, tune=20,
              chains=2, max_treedepth=3, start=g.hypers,
              temper=temper)
        print(f"mcmc_mean fit N={N}: {time.time() - t0:.1f} s, "
              f"hypers {g.hypers}")


if __name__ == "__main__":
    main()
