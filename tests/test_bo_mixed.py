"""BO conditioning through the mixed blocked factorisation.

GPState.predict already routes large-N conditioning through the
mixed-precision blocked path on TPU (the exact path's emulated-f64
cholesky cannot compile at 16k); these tests pin the SAME dispatch for
the BO acquisition programs (_bo_state_args / _acq_fn), forced on via
monkeypatch so it runs on the CPU suite.  Reference anchor: the BO
acquisition closures over gp.predict, /root/reference/andvaranaut/
gpmcmc.py:650-697.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from andvaranaut_tpu import GPMCMC, dists
from andvaranaut_tpu import gpmcmc as gpm


@pytest.fixture
def fitted(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(3)

    def fun(x):
        return np.array([x[0] ** 2 - x[0] - x[1] ** 2 * x[0] + x[1]])

    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    g = GPMCMC(nx=2, ny=1, priors=priors, target=fun, parallel=False,
               verbose=False)
    x = np.column_stack([rng.uniform(0, 2, 40), rng.uniform(1, 1.5, 40)])
    y = np.array([fun(r) for r in x])
    g.set_data(x, y)
    g.fit(method="map")
    return g, rng


def _force_mixed(monkeypatch, block=16):
    monkeypatch.setattr(gpm.GPMCMC, "_bo_mixed", lambda self: True)
    monkeypatch.setattr(gpm.GPState, "MIXED_BLOCK", block)


def test_bo_state_args_mixed_parity(fitted, monkeypatch):
    """Batch acquisition values through the mixed conditioning must match
    the exact path for every acquisition type."""
    g, rng = fitted
    X = np.column_stack([rng.uniform(0, 2, 13), rng.uniform(1, 1.5, 13)])
    yopt = jnp.asarray(float(np.min(g.y)))

    sargs0, ha0, m0 = g._bo_state_args(1e-6)
    assert m0 is False
    ref = {
        meth: np.asarray(
            g._acq_fn(meth, "min", True, ha0, False)(
                jnp.asarray(X), *sargs0, yopt))
        for meth in ("EI", "explore", "exploit")
    }

    _force_mixed(monkeypatch)
    sargs1, ha1, m1 = g._bo_state_args(1e-6)
    assert m1 is True
    assert len(sargs1) == len(sargs0) + 1  # Dinv threaded through
    # mean-driven acquisitions ride the f64-grade refined alpha; the
    # variance acquisition's whitened solve is slice-arithmetic grade,
    # relatively coarser where latent variances sit near zero at
    # interpolation points (ranking-safe for acquisition argmins)
    tols = {"EI": 1e-6, "exploit": 1e-6, "explore": 1e-2}
    for meth, v0 in ref.items():
        v1 = np.asarray(
            g._acq_fn(meth, "min", True, ha1, True)(
                jnp.asarray(X), *sargs1, yopt))
        np.testing.assert_allclose(v1, v0, rtol=tols[meth], atol=1e-10,
                                   err_msg=meth)


def test_bo_refine_grad_through_mixed(fitted, monkeypatch):
    """The refine program differentiates the acquisition wrt the query
    point: must trace through the mixed conditioning (solve_lower_linear
    custom JVP — the raw int8-slice substitution has no AD) and land on a
    finite optimum near the exact path's."""
    g, rng = fitted
    g.yopt = float(np.min(g.y))
    sargs0, ha0, _ = g._bo_state_args(1e-6)
    run0, rvpack0 = g._get_bo_program("refine", "EI", "min", True, ha0,
                                      False)
    z0 = jnp.asarray(np.zeros(rvpack0.total))
    zref, vref = run0(z0, *sargs0, jnp.asarray(g.yopt))

    _force_mixed(monkeypatch)
    sargs, ha, mixed = g._bo_state_args(1e-6)
    assert mixed
    run, rvpack = g._get_bo_program("refine", "EI", "min", True, ha, mixed)
    z, val = run(z0, *sargs, jnp.asarray(g.yopt))
    assert np.all(np.isfinite(np.asarray(z)))
    assert np.isfinite(float(val))
    np.testing.assert_allclose(float(val), float(vref), rtol=1e-4,
                               atol=1e-6)


def test_bo_loop_runs_mixed(fitted, monkeypatch):
    """One BO iteration end-to-end with the mixed conditioning forced."""
    g, rng = fitted
    _force_mixed(monkeypatch)
    xopt, yopt = g.BO(max_iter=1, opt_method="predict", refine=True,
                      predict_samps=64)
    assert np.all(np.isfinite(xopt))
    assert np.isfinite(yopt)


def test_bo_de_runs_mixed(fitted, monkeypatch):
    """On-device DE acquisition optimisation through the mixed state."""
    g, rng = fitted
    _force_mixed(monkeypatch)
    xopt, yopt = g.BO(max_iter=1, opt_method="DE", method="exploit")
    assert np.all(np.isfinite(xopt))
    assert np.isfinite(yopt)
