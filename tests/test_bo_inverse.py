"""Bayesian optimisation and inverse-problem tests.

BO: minimise the tutorial toy target over its prior box with each
acquisition/optimiser combination; the optimum must improve on the initial
design.  Inverse: recover a known input from its observed output."""

import numpy as np
import pytest

from andvaranaut_tpu import GPMCMC, dists
import andvaranaut_tpu.transform as tf


def _toy(x):
    return np.array([x[0] ** 2 - x[0] - x[1] ** 2 * x[0] + x[1]])


def _make(tmp_path, n=40, seed=11):
    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    g = GPMCMC(
        nx=2, ny=1, priors=priors, target=_toy,
        xconrevs=[tf.uniform(priors[0]), tf.uniform(priors[1])],
        verbose=False, rundir=str(tmp_path / "runs"))
    g.sample(n, seed=seed)
    g.change_yconrevs([tf.meanstd(g.y[:, 0])])
    g.fit(method="map")
    return g


# The true minimum of f over [0,2]x[1,1.5]: f decreases with x2^2*x0 term;
# evaluated on a fine grid the optimum is at the corner (2, 1.5) with
# f = 2^2 - 2 - 1.5^2*2 + 1.5 = -1.0
TRUE_MIN = -1.0


def test_bo_predict_mode(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    np.random.seed(1)
    g = _make(tmp_path, n=20)
    xopt, yopt = g.BO(
        opt_type="min", opt_method="predict", method="EI", max_iter=6,
        predict_samps=2000, refine=False)
    assert yopt <= g.y[:20].min() + 1e-9
    assert yopt < TRUE_MIN + 0.15


def test_bo_predict_refine(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    np.random.seed(2)
    g = _make(tmp_path, n=20)
    xopt, yopt = g.BO(
        opt_type="min", opt_method="predict", method="EI", max_iter=5,
        predict_samps=1000, refine=True)
    assert yopt < TRUE_MIN + 0.15


def test_bo_de_mode(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    np.random.seed(3)
    g = _make(tmp_path, n=20)
    xopt, yopt = g.BO(
        opt_type="min", opt_method="DE", method="EI", max_iter=5)
    assert yopt < TRUE_MIN + 0.15


def test_bo_explore_exploit_epsrs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    np.random.seed(4)
    g = _make(tmp_path, n=15)
    for method in ["explore", "exploit", "eps-RS"]:
        xopt, yopt = g.BO(
            opt_type="min", opt_method="predict", method=method,
            max_iter=2, predict_samps=500, refine=False)
        assert np.isfinite(yopt)


def test_bo_maximise(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    np.random.seed(5)
    g = _make(tmp_path, n=20)
    xopt, yopt = g.BO(
        opt_type="max", opt_method="predict", method="EI", max_iter=4,
        predict_samps=1000, refine=False)
    # true max on the box: x0=0 edge gives f = x2 -> max 1.5
    assert yopt > 1.35


def test_bo_requires_fit(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    g = GPMCMC(nx=2, ny=1, priors=priors, target=_toy, verbose=False,
               rundir=str(tmp_path / "runs"))
    g.sample(5, seed=0)
    with pytest.raises(Exception):
        g.BO()


def test_inverse_map(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    np.random.seed(6)
    g = _make(tmp_path, n=60)
    xtrue = np.array([0.7, 1.2])
    yobs = _toy(xtrue)
    data, xopt = g.inverse_opt(yobs, method="map")
    # the observed output must be reproduced at the inferred input
    ypred = _toy(xopt)
    np.testing.assert_allclose(ypred, yobs, atol=0.02)


def test_inverse_mcmc(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    np.random.seed(7)
    g = _make(tmp_path, n=40)
    xtrue = np.array([0.7, 1.2])
    yobs = _toy(xtrue)
    data, xopt = g.inverse_opt(
        yobs, yvarobs=np.array([1e-4]), method="mcmc_mean", draws=300,
        tune=300, chains=2, random_seed=0)
    assert data is not None
    assert set(data.posterior) == {"x0", "x1"}
    # posterior should concentrate near the observation level set
    ypred = _toy(xopt)
    np.testing.assert_allclose(ypred, yobs, atol=0.12)


def test_inverse_evaluate_opt(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    np.random.seed(8)
    g = _make(tmp_path, n=40)
    n0 = g.nsamp
    yobs = _toy(np.array([0.7, 1.2]))
    data, xopt, ysamp = g.inverse_opt(yobs, method="map", evaluate_opt=True)
    assert g.nsamp == n0 + 1
    np.testing.assert_allclose(g.x[-1], xopt, rtol=1e-12)
