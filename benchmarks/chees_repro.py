#!/usr/bin/env python
"""CPU reproduction of the badly-measured on-chip ChEES config
(docs/TPU_NOTES.md round-2: 8x300(+300) n=256 GP posterior, min ESS 10).

Runs the exact TPU sampler shape on the CPU backend: sampler='hmc',
budget 64, leaps_per_call=256 (steps_per_call=5), 8 chains — with the
objective selectable (REPRO_MIXED=1 for the TPU closed-form mixed
objective, else f64 autodiff) so objective-vs-sampler causes separate.

Env: REPRO_N, REPRO_CHAINS, REPRO_DRAWS, REPRO_TUNE, REPRO_MIXED,
REPRO_ADAPT (0 => uniform jitter), REPRO_SPC (steps_per_call).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("REPRO_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from andvaranaut_tpu.gp import engine
from andvaranaut_tpu.inference import nuts
from andvaranaut_tpu.lhc import _none_conrev

os.environ.setdefault("ANDVARANAUT_HMC_TRACE", "1")


def main():
    n = int(os.environ.get("REPRO_N", 256))
    chains = int(os.environ.get("REPRO_CHAINS", 8))
    draws = int(os.environ.get("REPRO_DRAWS", 300))
    tune = int(os.environ.get("REPRO_TUNE", 300))
    mixed = os.environ.get("REPRO_MIXED", "0") != "0"
    adapt = os.environ.get("REPRO_ADAPT", "1") != "0"
    spc = int(os.environ.get("REPRO_SPC", 5))
    seed = int(os.environ.get("REPRO_SEED", 0))

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
        cfg, draws=draws, tune=tune, chains=chains, random_seed=seed,
        sampler="hmc", mixed=mixed, adapt_tlen=adapt, steps_per_call=spc)
    wall = time.time() - t0
    ess = {k: np.min(np.atleast_1d(v)) for k, v in data.ess().items()}
    min_ess = min(ess.values())
    rhat = {k: np.max(np.atleast_1d(v)) for k, v in data.rhat().items()}
    carry = nuts.hmc_flat_sample._last_carry
    ch = carry[15]
    da = carry[3]
    print(
        f"mixed={mixed} adapt={adapt} seed={seed}: "
        f"{chains}x{draws}(+{tune}) n={n}: "
        f"{wall:.1f}s wall, min ESS {min_ess:.0f} "
        f"({min_ess / wall:.2f} ESS/s), max rhat {max(rhat.values()):.3f}, "
        f"divergences {int(np.asarray(data.sample_stats['diverging']).sum())}")
    print(
        f"final tmean={np.exp(np.asarray(ch[0])).mean():.4g} "
        f"eps={np.exp(np.asarray(da.log_eps)).mean():.4g} "
        f"inv_mass mean={np.asarray(carry[4]).mean(0)}")
    print("per-var ESS:", {k: float(v) for k, v in ess.items()})
    # per-chain state: catches a single stuck chain (NaN accept, H0=inf)
    zf = np.asarray(carry[0])
    Uf = np.asarray(carry[1])
    acc = np.asarray(data.sample_stats["accept"])
    dep = np.asarray(data.sample_stats["depth"])
    for c in range(zf.shape[0]):
        print(f"  chain {c}: U={Uf[c]:.4g} accept_mean={acc[c].mean():.3f} "
              f"depth_mean={dep[c].mean():.1f} "
              f"eps={np.exp(np.asarray(da.log_eps))[c]:.4g} "
              f"nmean={np.exp(np.asarray(ch[0]))[c]:.4g} "
              f"z={np.array2string(zf[c], precision=3)}")


if __name__ == "__main__":
    main()
