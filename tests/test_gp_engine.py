"""GP engine tests: kernel formula parity against independent numpy
implementations, NLML parity, closed-form posterior checks, hyperprior
logp parity, L-BFGS MAP behaviour."""

import math

import numpy as np
import pytest
import scipy.stats as st

import jax.numpy as jnp

from andvaranaut_tpu.gp import engine, kernels, quad
from andvaranaut_tpu.inference.unconstrained import RV, RVPack


def _np_sqdist(X, X2, ls):
    Xs = X / ls
    X2s = X2 / ls
    return ((Xs[:, None, :] - X2s[None, :, :]) ** 2).sum(-1)


def _np_kernel(name, X, X2, ls, alpha=None):
    r2 = _np_sqdist(X, X2, ls)
    r = np.sqrt(r2)
    if name == "RBF":
        return np.exp(-0.5 * r2)
    if name == "Matern52":
        return (1 + np.sqrt(5) * r + 5 / 3 * r2) * np.exp(-np.sqrt(5) * r)
    if name == "Matern32":
        return (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
    if name == "Exponential":
        return np.exp(-0.5 * r)
    if name == "RatQuad":
        return (1 + r2 / (2 * alpha)) ** (-alpha)


@pytest.mark.parametrize("name", kernels.KERNEL_NAMES)
def test_kernel_parity(name, rng):
    X = rng.normal(size=(13, 3))
    X2 = rng.normal(size=(7, 3))
    ls = np.array([0.7, 1.3, 2.1])
    ours = np.asarray(kernels.base_kernel(
        name, jnp.asarray(X), jnp.asarray(X2), jnp.asarray(ls), alpha=1.7))
    theirs = _np_kernel(name, X, X2, ls, alpha=1.7)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)


def test_kernel_algebra(rng):
    X = rng.normal(size=(9, 2))
    l_flat = np.array([0.5, 1.0, 2.0, 0.8, 1.1, 0.6])
    kv = np.array([1.5, 0.7, 2.2])
    kerns, ops = kernels.parse_kernel("RBF+Matern52*Exponential")
    assert kerns == ("RBF", "Matern52", "Exponential")
    assert ops == ("+", "*")
    ours = np.asarray(kernels.gram(
        kerns, ops, jnp.asarray(X), None, jnp.asarray(l_flat),
        jnp.asarray(kv)))
    # left-to-right application as in the reference loop (gpmcmc.py:301-307)
    expect = kv[0] * _np_kernel("RBF", X, X, l_flat[0:2])
    expect = expect + kv[1] * _np_kernel("Matern52", X, X, l_flat[2:4])
    expect = expect * (kv[2] * _np_kernel("Exponential", X, X, l_flat[4:6]))
    # matmul-form sq-dist loses ~1e-8 near r=0 (sqrt amplifies cancellation);
    # within the 1e-6 parity budget
    np.testing.assert_allclose(ours, expect, rtol=1e-7, atol=1e-6)


def test_parse_kernel_ratquad():
    # The reference's char-class ops regex mangles RatQuad (gpmcmc.py:498);
    # ours must not.
    kerns, ops = kernels.parse_kernel("RatQuad+RBF")
    assert kerns == ("RatQuad", "RBF") and ops == ("+",)
    with pytest.raises(Exception):
        kernels.parse_kernel("RBF+Bogus")


def test_nlml_parity(rng):
    n = 20
    X = rng.uniform(size=(n, 2))
    y = rng.normal(size=n)
    l = np.array([0.4, 0.9])
    kv = np.array([1.3])
    gv, jitter = 1e-3, 1e-6
    K = kv[0] * _np_kernel("RBF", X, X, l) + (gv + jitter) * np.eye(n)
    # independent: scipy multivariate normal logpdf
    expect = st.multivariate_normal(np.zeros(n), K).logpdf(y)
    ours = float(engine.chol_nlml(jnp.asarray(K), jnp.asarray(y)))
    np.testing.assert_allclose(ours, expect, rtol=1e-10)


def test_closed_form_posterior(rng):
    """Two-point RBF GP: predictive mean/var against hand linear algebra,
    including pred_noise=True semantics."""
    X = np.array([[0.2], [0.8]])
    y = np.array([1.0, -0.5])
    xs = np.array([[0.4], [0.9]])
    l, kv, gv, jitter = np.array([0.3]), np.array([2.0]), 0.01, 1e-6
    K = kv[0] * _np_kernel("RBF", X, X, l) + (gv + jitter) * np.eye(2)
    Ks = kv[0] * _np_kernel("RBF", X, xs, l)
    Kss = kv[0] * np.ones(2)
    mu_e = Ks.T @ np.linalg.solve(K, y)
    var_e = Kss - np.einsum("ij,ji->i", Ks.T, np.linalg.solve(K, Ks)) + gv
    mu, var = engine.predict_diag(
        ("RBF",), (), jnp.asarray(X), jnp.asarray(y), jnp.asarray(xs),
        jnp.asarray(l), jnp.asarray(kv), gv, None, jitter)
    np.testing.assert_allclose(np.asarray(mu), mu_e, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(var), var_e, rtol=1e-8)


def test_interpolation_noise_free(rng):
    """Noise-free GP must interpolate its training targets."""
    X = rng.uniform(size=(12, 2))
    y = np.sin(3 * X[:, 0]) + X[:, 1]
    mu, var = engine.predict_diag(
        ("RBF",), (), jnp.asarray(X), jnp.asarray(y), jnp.asarray(X),
        jnp.asarray([0.5, 0.5]), jnp.asarray([1.0]), 0.0, None, 1e-10)
    np.testing.assert_allclose(np.asarray(mu), y, atol=1e-6)
    assert (np.asarray(var) < 1e-6).all()


def test_rv_logprior_parity():
    """Prior logp + Jacobian in z-space must match hand-computed PyMC
    transformed-space logp."""
    rvs = RVPack((
        RV("gv", 1, ("halfnormal", 1e-3)),
        RV("l", 2, ("lognormal", 0.0, 1.0)),
        RV("t", 1, ("truncnormal", 0.5, 0.15, 1e-3, 100.0)),
    ))
    z = jnp.asarray([-2.0, 0.3, -0.7, 0.2])
    got = float(rvs.log_prior(z))
    gv = math.exp(-2.0)
    lp = st.halfnorm(scale=1e-3).logpdf(gv) + (-2.0)
    for zz in [0.3, -0.7]:
        lp += st.norm(0, 1).logpdf(zz)  # lognormal + log-jacobian == normal in z
    lo, hi = 1e-3, 100.0
    sig = 1 / (1 + math.exp(-0.2))
    v = lo + (hi - lo) * sig
    a, b = (lo - 0.5) / 0.15, (hi - 0.5) / 0.15
    lp += st.truncnorm(a, b, loc=0.5, scale=0.15).logpdf(v)
    lp += math.log(hi - lo) + math.log(sig) + math.log(1 - sig)
    np.testing.assert_allclose(got, lp, rtol=1e-9)


def test_map_recovers_known_hypers(rng):
    """Data drawn from a known GP: MAP should land near the truth."""
    n = 80
    X = rng.uniform(size=(n, 1))
    l_true, kv_true, gv_true = 0.2, 2.0, 1e-4
    K = kv_true * _np_kernel("RBF", X, X, np.array([l_true]))
    y = rng.multivariate_normal(np.zeros(n), K + gv_true * np.eye(n))

    from andvaranaut_tpu.lhc import _none_conrev

    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None], xconrevs=[_none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y.reshape(-1, 1))
    hypers, logp = engine.map_fit(cfg)
    assert np.isfinite(logp)
    assert 0.1 < hypers["l"][0] < 0.4
    assert 0.3 < hypers["kv"][0] < 10.0


def test_gh_stats_affine_exact():
    """For an affine reversion, GH quadrature must be exact: mean maps
    linearly, variance scales by 1/b^2."""
    import andvaranaut_tpu.transform as tf

    t = tf.affine(0.5, 2.0)
    mu = np.array([0.1, -0.3])
    var = np.array([0.04, 0.09])
    y, yv = quad.gh_stats(t.rev, mu, var)
    np.testing.assert_allclose(np.asarray(y), (mu - 0.5) / 2.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(yv), var / 4.0, rtol=1e-9)


def test_gh_stats_ei():
    """EI of a degenerate (zero-variance) latent equals max(0, yopt - mu)."""
    import andvaranaut_tpu.transform as tf

    t = tf.affine(0.0, 1.0)
    mu = np.array([1.0, 3.0])
    var = np.array([1e-20, 1e-20])
    yopt = 2.0
    ei, _ = quad.gh_stats(t.rev, mu, var, EI=True, EIopt="min", yopt=yopt)
    np.testing.assert_allclose(np.asarray(ei), [1.0, 0.0], atol=1e-9)


def test_mixed_conditioning_predict_parity(rng):
    """The large-N mixed conditioning/prediction path (blocked
    factorisation, no XLA cholesky/trsm — what GPState uses on TPU above
    MIXED_N) must match the exact masked path."""
    import jax.numpy as jnp

    n, m, nx = 96, 17, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + 0.2 * X[:, 1]
    Xq = rng.uniform(size=(m, nx))
    l = jnp.asarray([0.4, 0.7])
    kv = jnp.asarray([1.3])
    gv = jnp.asarray(1e-3)
    xin_p, yin_p, valid = engine.pad_data(X, y, 32)
    L0, v0 = engine.chol_state_masked(
        ("RBF",), (), xin_p, yin_p, valid, l, kv, gv, None, 1e-6)
    mu0, var0 = engine.predict_from_chol_masked(
        ("RBF",), (), xin_p, valid, L0, v0, jnp.asarray(Xq), l, kv, gv,
        None)
    L1, v1, Dinv = engine.chol_state_masked_mixed(
        ("RBF",), (), xin_p, yin_p, valid, l, kv, gv, None, 1e-6, block=32)
    mu1, var1 = engine.predict_from_chol_masked_mixed(
        ("RBF",), (), xin_p, valid, L1, v1, Dinv, jnp.asarray(Xq), l, kv,
        gv, None)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var0),
                               rtol=1e-6, atol=1e-10)


def test_gpstate_mixed_dispatch(rng, monkeypatch):
    """GPState routes through the mixed path when _mixed() is true and
    produces the same predictions as the exact path."""
    from andvaranaut_tpu import gpmcmc as gpm

    n, nx = 64, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + 0.2 * X[:, 1]
    hypers = {"l": np.array([0.4, 0.7]), "kv": np.array([1.3]),
              "gv": np.array(1e-3)}
    st = gpm.GPState(("RBF",), (), True, 1e-6, X, y, hypers)
    Xq = rng.uniform(size=(9, nx))
    mu0, var0 = st.predict(Xq)
    st2 = gpm.GPState(("RBF",), (), True, 1e-6, X, y, hypers)
    monkeypatch.setattr(gpm.GPState, "_mixed", lambda self: True)
    monkeypatch.setattr(gpm.GPState, "MIXED_BLOCK", 32)
    mu1, var1 = st2.predict(Xq)
    np.testing.assert_allclose(mu1, mu0, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(var1, var0, rtol=1e-6, atol=1e-10)
