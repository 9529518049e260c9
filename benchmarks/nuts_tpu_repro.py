#!/usr/bin/env python
"""Minimal reproducer for the axon TPU worker crash in GP-objective NUTS.

Observed (round 2, TPU v5e behind the axon remote-compile service):
running the NUTS sampler over a GP hyperparameter posterior crashes the
TPU worker process ("UNAVAILABLE: TPU worker process crashed or
restarted ... kernel fault") after ~60-200 transitions.  The crash is
insensitive to:

- objective implementation: f64 autodiff chol_nlml (round 1) and the
  blocked mixed-precision closed-form objective (round 2) both crash;
- Pallas: forcing the XLA-composed integer-Ozaki matmul (no Mosaic
  custom calls at all) still crashes;
- host chunking: steps_per_call in {1, 2, 5, 10, 100, 250} all crash,
  so it is neither a single-execution watchdog nor a per-launch leak.

It is NOT reproduced by any of these (all green on the same chip):

- pure-target NUTS at larger scale (std normal, 8 chains x 500+500,
  depth 8, 88 s) — the sampler machinery alone is fine;
- the same GP objective evaluated 1300x inside a vmapped lax.fori_loop
  or a vmapped data-dependent lax.while_loop, re-launched 13 times —
  the objective machinery alone is fine;
- ~100 top-level launches of the same value-and-grad at N=16384 (the
  MAP fit) — repeated launches alone are fine.

The triggering combination is the full NUTS transition structure
(while_loop tree builder nested in the trajectory while_loop, vmapped
over chains) around the GP objective.  The identical program is correct
and stable on the CPU backend (tests/test_nuts.py runs it, including 64
device-sharded chains on the virtual mesh).

Run this file on the TPU to reproduce (expect the worker to die within
a few minutes):  python benchmarks/nuts_tpu_repro.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from andvaranaut_tpu.gp import engine
    from andvaranaut_tpu.inference import nuts
    from andvaranaut_tpu.lhc import _none_conrev

    rng = np.random.default_rng(0)
    n = 256
    X = rng.uniform(size=(n, 2))
    y = (np.sin(3 * X[:, 0]) + X[:, 1] ** 2
         + 0.05 * rng.normal(size=n)).reshape(-1, 1)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y)
    t0 = time.time()
    nuts.sample_model(cfg, draws=100, tune=100, chains=2, random_seed=0,
                      max_treedepth=8, mixed=True, steps_per_call=1)
    print(f"survived {time.time() - t0:.1f}s (bug not reproduced)")


if __name__ == "__main__":
    main()
