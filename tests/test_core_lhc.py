"""Execution engine + LHC layer tests: serial/parallel evaluation with
per-task scratch dirs, submission-order results, failure and NaN masking,
constraints, set_data validation, netCDF + pickle persistence, deletion
modes — reference behaviours per SURVEY.md §2.1-2.2."""

import os

import numpy as np
import pytest

from andvaranaut_tpu import LHC, dists, load_object, load_xy, save_object, save_xy
from andvaranaut_tpu.lhc import _surrogate
import andvaranaut_tpu.transform as tf


def _mk(tmp_path, fun, parallel=False, nproc=1, **kw):
    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    return LHC(
        nx=2, ny=1, priors=priors, target=fun, parallel=parallel,
        nproc=nproc, rundir=str(tmp_path / "runs"), verbose=False, **kw)


def _toy(x):
    return np.array([x[0] ** 2 - x[0] - x[1] ** 2 * x[0] + x[1]])


def test_serial_sampling(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    l = _mk(tmp_path, _toy)
    l.sample(8, seed=0)
    assert l.x.shape == (8, 2) and l.y.shape == (8, 1)
    assert l.nsamp == 8
    # x/y correspondence
    for i in range(8):
        np.testing.assert_allclose(l.y[i], _toy(l.x[i]), rtol=1e-12)
    # per-task scratch dirs exist
    assert os.path.isdir(tmp_path / "runs" / "task0")
    # incremental sampling appends
    l.sample(4, seed=1)
    assert l.nsamp == 12


def test_parallel_sampling_submission_order(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    def slow_toy(x):
        import time

        # Later-submitted tasks finish first: out-of-order completion.
        time.sleep(float(x[0]) * 0.05)
        return np.array([x[0] ** 2 - x[0] - x[1] ** 2 * x[0] + x[1]])

    l = _mk(tmp_path, slow_toy, parallel=True, nproc=4, pulse=0.05)
    l.sample(6, seed=0)
    assert l.nsamp == 6
    for i in range(6):
        np.testing.assert_allclose(l.y[i], _toy(l.x[i]), rtol=1e-12,
                                   err_msg="rows misaligned: results must be "
                                   "in submission order")


def test_failures_masked(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)

    def flaky(x):
        if x[0] > 1.0:
            raise RuntimeError("boom")
        return np.array([x[0]])

    l = _mk(tmp_path, flaky)
    l.sample(10, seed=0)
    assert (l.x[:, 0] <= 1.0).all()
    assert len(l.x) == len(l.y) < 10
    assert "failed at sample" in capsys.readouterr().out


def test_nan_scrubbed(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)

    def nanfun(x):
        return np.array([np.nan if x[0] > 1.0 else x[0]])

    l = _mk(tmp_path, nanfun)
    l.sample(10, seed=0)
    assert np.isfinite(l.y).all()
    assert (l.x[:, 0] <= 1.0).all()
    assert "inf/nan" in capsys.readouterr().out


def test_constraints_filter(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    cons = {
        "constraints": [lambda x: x[0] + x[1]],
        "lower_bounds": [0.0],
        "upper_bounds": [2.5],
    }
    l = _mk(tmp_path, _toy, constraints=cons)
    l.sample(12, seed=0)
    assert (l.x.sum(axis=1) <= 2.5).all()
    assert "constraint" in capsys.readouterr().out


def test_constructor_validation(tmp_path):
    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    with pytest.raises(Exception):
        LHC(nx=0, ny=1, priors=priors, target=_toy)
    with pytest.raises(Exception):
        LHC(nx=2, ny=1, priors=priors[:1], target=_toy)
    with pytest.raises(Exception):
        LHC(nx=2, ny=1, priors=[1, 2], target=_toy)
    with pytest.raises(Exception):
        LHC(nx=2, ny=1, priors=priors, target="not callable")
    with pytest.raises(Exception):
        LHC(nx=2, ny=1, priors=priors, target=_toy, constraints={"bad": 1})


def test_set_data_validation(tmp_path):
    l = _mk(tmp_path, _toy)
    x = np.array([[0.5, 1.2], [1.5, 1.4]])
    y = np.array([[0.1], [0.2]])
    l.set_data(x, y)
    assert l.nsamp == 2
    with pytest.raises(Exception):
        l.set_data(x.astype(np.float32), y)
    with pytest.raises(Exception):
        l.set_data(np.array([[5.0, 1.2]]), np.array([[0.1]]))  # outside prior


def test_del_samples_modes(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    l = _mk(tmp_path, _toy)
    l.sample(12, seed=0)
    l.del_samples(ndels=3, method="coarse_lhc")
    assert l.nsamp == 9
    l.del_samples(ndels=2, method="random")
    assert l.nsamp == 7
    l.del_samples(method="specific", idx=[0, 1])
    assert l.nsamp == 5
    with pytest.raises(Exception):
        l.del_samples(ndels=1, method="bogus")


def test_netcdf_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    l = _mk(tmp_path, _toy)
    l.sample(5, seed=0)
    fname = str(tmp_path / "data.nc")
    l.save_netcdf(fname)
    l2 = _mk(tmp_path, _toy)
    l2.load_netcdf(fname)
    np.testing.assert_allclose(l2.x, l.x)
    np.testing.assert_allclose(l2.y, l.y)


def test_save_xy_roundtrip(tmp_path):
    x = np.linspace(0, 1, 7)
    y = x**2
    fname = str(tmp_path / "xy.nc")
    save_xy(x, y, fname)
    x2, y2 = load_xy(fname)
    np.testing.assert_allclose(x2, x)
    np.testing.assert_allclose(y2, y)
    save_xy(x, fname=str(tmp_path / "x.nc"))
    x3 = load_xy(str(tmp_path / "x.nc"), xonly=True)
    np.testing.assert_allclose(x3, x)


def test_pickle_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    l = _mk(tmp_path, lambda x: np.array([x[0] + x[1]]))  # closure/lambda
    l.sample(4, seed=0)
    fname = str(tmp_path / "obj.pkl")
    save_object(l, fname)
    l2 = load_object(fname)
    np.testing.assert_allclose(l2.x, l.x)
    np.testing.assert_allclose(l2.y, l.y)
    assert float(l2.target(np.array([1.0, 2.0]))[0]) == 3.0


def test_surrogate_conversion_tracking(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    s = _surrogate(
        nx=2, ny=1, priors=priors, target=_toy,
        xconrevs=[tf.uniform(priors[0]), tf.uniform(priors[1])],
        yconrevs=None, rundir=str(tmp_path / "runs"), verbose=False)
    s.sample(6, seed=0)
    assert s.xc.shape == (6, 2)
    np.testing.assert_allclose(
        s.xc[:, 0], np.asarray(s.xconrevs[0].con(s.x[:, 0])))
    np.testing.assert_allclose(s.yc, s.y)  # identity yconrev
    s.del_samples(method="specific", idx=[0])
    assert s.xc.shape == (5, 2) and len(s.x) == 5
    # change conrevs re-converts
    s.change_yconrevs([tf.meanstd(s.y[:, 0])])
    np.testing.assert_allclose(
        s.yc[:, 0], np.asarray(s.yconrevs[0].con(s.y[:, 0])))
