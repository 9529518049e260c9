"""End-to-end GPMCMC tests on the tutorial workflow (SURVEY.md §4): the 2-D
toy target, uniform/meanstd conrevs, RBF MAP fit, predict with GH reversion,
held-out metrics matching tutorial-quality (RMSE ~1e-4, R^2 ~ 1.0), model
changes, learnable warping fits."""

import numpy as np
import pytest

from andvaranaut_tpu import GPMCMC, dists, load_object, save_object
import andvaranaut_tpu.transform as tf


def _toy(x):
    return np.array([x[0] ** 2 - x[0] - x[1] ** 2 * x[0] + x[1]])


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("runs")
    import os

    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
        g = GPMCMC(
            nx=2, ny=1, priors=priors, target=_toy,
            xconrevs=[tf.uniform(priors[0]), tf.uniform(priors[1])],
            yconrevs=None, kernel="RBF", noise=True, verbose=False,
            rundir=str(tmp / "runs"))
        g.sample(100, seed=5)
        g.change_yconrevs([tf.meanstd(g.y[:, 0])])
        g.fit(method="map")
    finally:
        os.chdir(cwd)
    return g


def test_fit_quality_tutorial_grade(fitted):
    g = fitted
    assert g.hypers is not None
    # tutorial cell 27: l ~ [1.13, 2.69], kv ~ 68 on its own random dataset;
    # same order of magnitude expected here
    assert 0.3 < g.hypers["l"][0] < 4.0
    assert 0.8 < g.hypers["l"][1] < 10.0
    assert 1.0 < g.hypers["kv"][0] < 1e4
    # near-noise-free fit of a smooth target
    assert float(g.hypers["gv"]) < 1e-4


def test_train_predictions_interpolate(fitted):
    g = fitted
    yhat = g.predict(g.x)
    assert np.abs(yhat[:, 0] - g.y[:, 0]).max() < 5e-3


def test_holdout_metrics(fitted):
    g = fitted
    np.random.seed(0)
    g.train_test()
    xt, yt, yp, yv = g.test_plots(yplots=False, xplots=False, returndat=True)
    rmse = float(np.sqrt(np.mean((yp - yt) ** 2)))
    r2 = 1 - np.sum((yp - yt) ** 2) / np.sum((yt - np.mean(g.y)) ** 2)
    assert rmse < 5e-3, "tutorial-grade fit quality (cell 30: 1.4e-4)"
    assert r2 > 0.9999
    # variance should be well-calibrated: errors within ~5 sigma
    assert (np.abs(yp - yt) < 5 * np.sqrt(yv) + 1e-4).all()
    # refit full model for other tests
    g.fit(method="map")


def test_predict_variance_positive(fitted):
    y, yv = fitted.predict(fitted.x[:7], return_var=True)
    assert (yv > 0).all()


def test_predict_normvar(fitted):
    y, yv = fitted.predict(fitted.x[:5], return_var=True, normvar=True)
    y2, yv2 = fitted.predict(fitted.x[:5], return_var=True, normvar=False)
    np.testing.assert_allclose(yv, yv2 / y2**2, rtol=1e-9)


def test_predict_convert_false(fitted):
    g = fitted
    xc = np.zeros_like(g.x[:4])
    for i in range(2):
        xc[:, i] = np.asarray(g.xconrevs[i].con(g.x[:4, i]))
    a = g.predict(g.x[:4].copy())
    b = g.predict(xc, convert=False)
    np.testing.assert_allclose(a, b, rtol=1e-9)


def test_change_model_refit(fitted, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    g = fitted
    g.change_model("Matern52", noise=True)
    assert g.m is None and g.hypers is None
    g.fit(method="map")
    yhat = g.predict(g.x)
    assert np.abs(yhat[:, 0] - g.y[:, 0]).max() < 1e-2
    # restore
    g.change_model("RBF", noise=True)
    g.fit(method="map")


def test_fit_method_none_keeps_hypers(fitted):
    g = fitted
    h0 = {k: np.array(v) for k, v in g.hypers.items()}
    g.fit(method="none")
    for k in h0:
        np.testing.assert_array_equal(g.hypers[k], h0[k])


def test_mean_function(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]

    def mymean(x):
        return np.array([x[0] - x[1]])

    g = GPMCMC(
        nx=2, ny=1, priors=priors, target=_toy, mean=mymean,
        verbose=False, rundir=str(tmp_path / "runs"))
    g.sample(30, seed=3)
    np.testing.assert_allclose(
        g.ym[:, 0], g.x[:, 0] - g.x[:, 1], rtol=1e-12)
    # converted data is mean-subtracted (gpmcmc.py:53-54)
    np.testing.assert_allclose(
        g.yc, g.y - g.ym, rtol=1e-12)
    g.fit(method="map")
    yhat = g.predict(g.x)
    # prediction adds mean back after reversion
    assert np.abs(yhat[:, 0] - g.y[:, 0]).max() < 2e-2


def test_cwgp_fit(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    g = GPMCMC(
        nx=2, ny=1, priors=priors, target=_toy,
        xconrevs=[tf.uniform(priors[0]), tf.uniform(priors[1])],
        verbose=False, rundir=str(tmp_path / "runs"))
    g.sample(40, seed=7)
    g.change_yconrevs([tf.wgp(
        ["meanstd", "sinharcsinh"], np.array([0.0, 1.0]), y=g.y[:, 0])])
    g.fit(method="map", cwgp=True)
    assert "cwgp" in g.hypers and "cwgp_pos" in g.hypers
    # warper written back with fitted params (gpmcmc.py:370-381)
    got = np.array([
        float(g.hypers["cwgp"][0]), float(g.hypers["cwgp_pos"][0])])
    cur = np.array([
        float(g.yconrevs[0].params[0]), float(g.yconrevs[0].params[1])])
    np.testing.assert_allclose(cur, got, rtol=1e-9)
    yhat = g.predict(g.x)
    assert np.abs(yhat[:, 0] - g.y[:, 0]).max() < 5e-2


def test_iwgp_fit(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    g = GPMCMC(
        nx=2, ny=1, priors=priors, target=_toy,
        xconrevs=[
            tf.wgp(["uniform", "kumaraswamy"], np.array([1.0, 1.0]),
                   y=None, xdist=priors[0]),
            tf.uniform(priors[1]),
        ],
        verbose=False, rundir=str(tmp_path / "runs"))
    g.sample(40, seed=9)
    g.change_yconrevs([tf.meanstd(g.y[:, 0])])
    g.fit(method="map", iwgp=True)
    assert "iwgp" in g.hypers and len(g.hypers["iwgp"]) == 2
    assert (np.asarray(g.hypers["iwgp"]) > 0).all()
    yhat = g.predict(g.x)
    assert np.abs(yhat[:, 0] - g.y[:, 0]).max() < 5e-2


def test_iwgp_requires_wgp_xconrev(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    g = GPMCMC(nx=2, ny=1, priors=priors, target=_toy, verbose=False,
               rundir=str(tmp_path / "runs"))
    g.sample(10, seed=1)
    with pytest.raises(Exception):
        g.fit(method="map", iwgp=True)
    with pytest.raises(Exception):
        g.fit(method="map", cwgp=True)


def test_pickle_fitted_model(fitted, tmp_path):
    f = str(tmp_path / "gp.pkl")
    save_object(fitted, f)
    g2 = load_object(f)
    np.testing.assert_allclose(
        g2.predict(fitted.x[:5]), fitted.predict(fitted.x[:5]), rtol=1e-12)


def test_relative_importances_smoke(fitted, monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    monkeypatch.setattr(plt, "show", lambda: None)
    fitted.relative_importances()
    fitted.relative_importances(logscale=True)


def test_predict_query_chunking(rng):
    """Chunked prediction (query count above GPState.QCHUNK) must equal
    the single-program path exactly — same compiled kernel, host-side
    concatenation only."""
    import jax.numpy as jnp

    from andvaranaut_tpu.gpmcmc import GPState

    n = 64
    X = rng.uniform(size=(n, 2))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2
    hypers = {"l": jnp.asarray([0.5, 0.7]), "kv": jnp.asarray([1.0]),
              "gv": jnp.asarray(1e-4)}
    state = GPState(("RBF",), (), True, 1e-6, X, y, hypers)
    Xq = rng.uniform(size=(197, 2))
    mu0, var0 = state.predict(Xq)
    state2 = GPState(("RBF",), (), True, 1e-6, X, y, hypers)
    state2.QCHUNK = 64  # force the chunked path
    mu1, var1 = state2.predict(Xq)
    np.testing.assert_allclose(mu1, mu0, rtol=0, atol=1e-12)
    np.testing.assert_allclose(var1, var0, rtol=0, atol=1e-12)
