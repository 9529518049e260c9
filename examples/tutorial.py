#!/usr/bin/env python
"""End-to-end tutorial mirroring the reference notebook's workflow
(/root/reference/tutorial/tutorial.ipynb): the executable specification of
behaviour (SURVEY.md §4).

Run:  python examples/tutorial.py  (add --plots to show figures)
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from andvaranaut_tpu import GPMCMC, LHC, dists, load_object, save_object
import andvaranaut_tpu.transform as tf


def target(x):
    """Tutorial cell 5: f(x1,x2) = x1^2 - x1 - x2^2*x1 + x2."""
    return np.array([x[0] ** 2 - x[0] - x[1] ** 2 * x[0] + x[1]])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plots", action="store_true")
    ap.add_argument("--mcmc", action="store_true",
                    help="also run the NUTS hyperparameter posterior")
    args = ap.parse_args()
    if not args.plots:
        import matplotlib

        matplotlib.use("Agg")

    workdir = tempfile.mkdtemp(prefix="andvaranaut_tutorial_")
    os.chdir(workdir)
    print(f"working in {workdir}")

    # Cells 6-8: LHC construction and sampling
    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    lhc = LHC(nx=2, ny=1, priors=priors, target=target)
    lhc.sample(16, seed=0)
    print(f"LHC dataset: x{lhc.x.shape} y{lhc.y.shape}")

    # Cell 12: deletion modes
    lhc.del_samples(ndels=2, method="coarse_lhc")
    lhc.del_samples(ndels=2, method="random")
    lhc.del_samples(method="specific", idx=0)
    print(f"after deletions: nsamp={lhc.nsamp}")

    # Cells 18-27: GP surrogate with conversion/reversion stacks + MAP fit
    gp = GPMCMC(
        nx=2, ny=1, priors=priors, target=target,
        xconrevs=[tf.uniform(priors[0]), tf.uniform(priors[1])],
        kernel="RBF", noise=True, verbose=True)
    gp.sample(100, seed=5)
    gp.change_yconrevs([tf.meanstd(gp.y[:, 0])])
    gp.fit(method="map")
    print("MAP hypers:", {k: np.asarray(v) for k, v in gp.hypers.items()})

    # Cells 29-30: train/test split and metrics
    gp.train_test()
    gp.test_plots(yplots=args.plots, xplots=False)

    # Cell 32: change model to Matern52 and refit
    gp.change_model("Matern52", noise=True)
    gp.fit(method="map")
    gp.train_test()
    gp.test_plots(yplots=False, xplots=False)
    gp.change_model("RBF", noise=True)
    gp.fit(method="map")

    # Cells 34-40: forward UQ through the surrogate vs true evaluations
    xs, ys = gp.y_dist(mode="hist_kde", nsamps=1000, return_data=True)
    ytrue = np.array([target(x)[0] for x in xs])
    print(
        f"forward UQ: surrogate mean {ys.mean():.5f} vs true "
        f"{ytrue.mean():.5f}")

    # Cell 42: relative importances
    if args.plots:
        gp.relative_importances()

    # Cells 45-49: Bayesian optimisation (EI)
    np.random.seed(0)
    xopt, yopt = gp.BO(
        opt_type="min", opt_method="predict", method="EI", max_iter=8,
        predict_samps=2000, refine=False)
    print(f"BO optimum: y={yopt} at x={xopt}")

    # Inverse problem: recover x from an observed y
    xtrue = np.array([0.7, 1.2])
    data, xinv = gp.inverse_opt(target(xtrue), method="map")
    print(f"inverse: x={xinv} (ypred {target(xinv)} vs obs {target(xtrue)})")

    # Optional: NUTS hyperparameter posterior
    if args.mcmc:
        data = gp.fit(
            method="mcmc_mean", return_data=True, draws=500, tune=500,
            chains=4, random_seed=0)
        print(data.summary())

    # Cells 52-53: pickle persistence
    save_object(gp, "gp.pkl")
    gp2 = load_object("gp.pkl")
    assert np.allclose(gp2.predict(gp.x[:5]), gp.predict(gp.x[:5]))
    print("pickle round-trip OK")


if __name__ == "__main__":
    main()
