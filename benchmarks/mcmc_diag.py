#!/usr/bin/env python
"""Diagnostics from an MCMC_DRAWS_LOG file (incremental draw
persistence): per-dim pooled ESS, split-rhat, movement, covariance.

Usage: python benchmarks/mcmc_diag.py /tmp/mcmc16k_dense24_draws.log
Works on PARTIAL logs (mid-run) — only complete draw rows across all
chains are used, so it doubles as a mid-run health check before
committing hours of TPU wall to a mis-tuned configuration.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load(path):
    d = np.loadtxt(path)
    if d.ndim == 1:
        d = d[None, :]
    chains = int(d[:, 0].max()) + 1
    dim = d.shape[1] - 3
    ndraw = int(d[:, 1].max()) + 1
    z = np.full((chains, ndraw, dim), np.nan)
    lp = np.full((chains, ndraw), np.nan)
    for row in d:
        c, i = int(row[0]), int(row[1])
        lp[c, i] = row[2]
        z[c, i] = row[3:]
    ok = np.isfinite(lp).all(axis=0)
    n_ok = int(ok.sum())
    return z[:, ok], lp[:, ok], chains, n_ok


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from andvaranaut_tpu.inference import nuts

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mcmc_draws.log"
    z, lp, chains, n_ok = load(path)
    dim = z.shape[-1]
    print(f"{chains} chains x {n_ok} complete draws, dim {dim}")
    print(f"lp range [{np.nanmin(lp):.2f}, {np.nanmax(lp):.2f}]")
    for c in range(chains):
        uniq = np.unique(z[c, :, 0]).size
        print(f"  chain {c}: {uniq}/{n_ok} unique positions "
              f"(accept proxy {uniq / max(n_ok, 1):.2f}), "
              f"lp mean {lp[c].mean():.2f}")
    if n_ok >= 8:
        ess = np.asarray([float(nuts.ess_bulk(z[..., i]))
                          for i in range(dim)])
        rh = np.asarray([float(nuts.split_rhat(z[..., i]))
                         for i in range(dim)])
        print("pooled ESS per dim:",
              " ".join(f"{e:.1f}" for e in ess))
        print("split-rhat per dim:",
              " ".join(f"{r:.3f}" for r in rh))
        print(f"min ESS {ess.min():.1f} of {chains * n_ok} "
              f"pooled draws (ESS/draw "
              f"{ess.min() / (chains * n_ok):.4f})")
    flat = z.reshape(-1, dim)
    print("pooled stds:", np.array2string(flat.std(axis=0),
                                          precision=4))
    print("pooled corr:\n",
          np.array2string(np.corrcoef(flat.T), precision=3))


if __name__ == "__main__":
    main()
