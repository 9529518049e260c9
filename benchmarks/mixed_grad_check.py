#!/usr/bin/env python
"""Point-wise accuracy of the mixed-precision closed-form HMC objective
(bigfit.make_mixed_objective) vs f64 autodiff at the ChEES repro config
(n=256): value and gradient relative error at typical posterior points.

Diagnoses whether objective noise explains the on-chip ChEES ESS
collapse (docs/TPU_NOTES.md round-2 queue item 2)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("CHECK_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from andvaranaut_tpu.gp import bigfit, engine
from andvaranaut_tpu.lhc import _none_conrev


def main():
    n = int(os.environ.get("CHECK_N", 256))
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(n, 2))
    y = (np.sin(3 * X[:, 0]) + X[:, 1] ** 2).reshape(-1, 1)

    rvpack, nlp_mixed = bigfit.make_mixed_objective(
        X, y[:, 0], kerns=("RBF",), ops=(), noise=True,
        jitter=1e-6, block=min(256, max(32, n // 2)))
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y)
    rvpack2, nlp_f64 = engine.build_objective(cfg)

    vg_mixed = jax.jit(jax.value_and_grad(nlp_mixed))
    vg_f64 = jax.jit(jax.value_and_grad(nlp_f64))

    z0 = rvpack.z0()
    # probe points: init, plus draws around the known posterior bulk
    # (log gv ~ -9..-4, log l ~ -1..1, log kv ~ -1..1)
    pts = [np.asarray(z0)]
    prng = np.random.default_rng(1)
    for _ in range(12):
        pts.append(np.array([
            prng.uniform(-9, -4),
            prng.uniform(-1.5, 1.5),
            prng.uniform(-1.5, 1.5),
            prng.uniform(-1.0, 1.0),
        ]))
    if os.environ.get("CHECK_EXTREME", "0") != "0":
        # the near-singular warmup regime: tiny noise floors under long
        # lengthscales (low-rank Gram), huge noise, extreme kv — where
        # slice-arithmetic error is amplified by conditioning and the
        # diagonal-block gates must fall back cleanly
        pts = [np.asarray(z0)]
        for _ in range(16):
            pts.append(np.array([
                prng.uniform(-20, -9),
                prng.uniform(0.5, 3.0),
                prng.uniform(0.5, 3.0),
                prng.uniform(-2.0, 3.0),
            ]))
        for _ in range(4):
            pts.append(np.array([
                prng.uniform(2, 6),
                prng.uniform(-3, 3),
                prng.uniform(-3, 3),
                prng.uniform(-6, 2),
            ]))
    worst_v = worst_g = 0.0
    for p in pts:
        z = jnp.asarray(p)
        v1, g1 = vg_mixed(z)
        v2, g2 = vg_f64(z)
        rv = abs(float(v1) - float(v2)) / max(abs(float(v2)), 1.0)
        rg = float(jnp.linalg.norm(g1 - g2) / jnp.maximum(
            jnp.linalg.norm(g2), 1e-30))
        worst_v = max(worst_v, rv)
        worst_g = max(worst_g, rg)
        print(f"z={np.array2string(p, precision=2)}: |dv|/|v|={rv:.2e} "
              f"|dg|/|g|={rg:.2e} v={float(v2):.6e} gnorm={float(jnp.linalg.norm(g2)):.3e}")
    import andvaranaut_tpu.gp.precision as precision

    print(f"worst: value {worst_v:.2e} grad {worst_g:.2e} "
          f"[backend={jax.default_backend()} "
          f"FUSED_CHOL={precision.FUSED_CHOL} "
          f"SEED_CHOL={os.environ.get('ANDVARANAUT_SEED_CHOL', '')}]")


if __name__ == "__main__":
    main()
