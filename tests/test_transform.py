"""Transform library tests: inverse round-trips, analytic Jacobians vs
autodiff, wgp composite bookkeeping (pid/pos/np/default_priors), and parity
with the reference's formulas (see /root/reference/andvaranaut/transform.py).
"""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp

from andvaranaut_tpu import dists, transform as tf


def _roundtrip(t, y, tol=1e-9):
    y2 = np.asarray(t.rev(t.con(y)))
    np.testing.assert_allclose(y2, y, rtol=tol, atol=tol)


def _der_vs_autodiff(t, y, tol=1e-8):
    ad = jax.vmap(jax.grad(lambda v: t.con(v).sum()))(jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(t.der(y)), np.asarray(ad), rtol=tol)


YPOS = np.array([0.1, 0.5, 1.0, 2.3, 7.7])
YANY = np.array([-3.0, -0.4, 0.2, 1.1, 4.2])
Y01 = np.array([0.05, 0.2, 0.5, 0.8, 0.95])


def test_simple_roundtrips():
    d = dists.Uniform(1.0, 2.0)
    x = np.linspace(1.05, 2.95, 9)
    for t in [
        tf.normal(st.norm(1.0, 2.0)),
        tf.logit_logistic(d),
        tf.cdf(d),
        tf.probit(d),
        tf.normalise(3.3),
        tf.log1p(),
        tf.log10(),
    ]:
        _roundtrip(t, x if not isinstance(t, (tf.log1p, tf.log10)) else YPOS)
    _roundtrip(tf.nonneg(), YPOS)


def test_learnable_roundtrips_and_jacobians():
    cases = [
        (tf.logarithm(), YPOS),
        (tf.affine(0.3, 1.7), YANY),
        (tf.arcsinh(0.1, 1.2, -0.3, 0.8), YANY),
        (tf.boxcox(0.4), YPOS),
        (tf.sinharcsinh(0.2, 1.3), YANY),
        (tf.sal(0.2, 1.3, -0.1, 0.9), YANY),
        (tf.kumaraswamy(1.4, 2.2), Y01),
        (tf.meanstd(YANY), YANY),
        (tf.minshift(YANY), YANY),
        (tf.stddev(YANY), YANY),
        (tf.stdshift(0.3, YANY), YANY),
        (tf.maxmin(YANY), YANY),
        (tf.uniform(dists.Uniform(0.0, 2.0)), np.linspace(0.1, 1.9, 5)),
        (tf.preserve_zero(YANY, 0.0), YANY),
    ]
    for t, y in cases:
        _roundtrip(t, y)
        if hasattr(t, "der"):
            _der_vs_autodiff(t, y)


def test_sklearn_backed():
    rng = np.random.default_rng(0)
    y = rng.lognormal(size=200)
    for cls in [tf.quantile, tf.robust, tf.powerT]:
        t = cls(y)
        yc = t.con(y)
        np.testing.assert_allclose(t.rev(yc), y, rtol=1e-6, atol=1e-6)
    t = tf.boxcoxf(y)
    assert -0.2 < t.lamb < 1.5
    _roundtrip(t, y, tol=1e-7)


def test_positivity_validation():
    with pytest.raises(ValueError):
        tf.affine(0.0, -1.0)
    with pytest.raises(ValueError):
        tf.kumaraswamy(-1.0, 1.0)
    # Traced params skip the check (reference transform.py:212-216 semantics).
    jax.jit(lambda b: tf.affine(0.0, b).con(1.0))(-1.0)


def test_logit_clamping():
    # Reference clamps logit inputs at 1-1e-16 (transform.py:17-22) so no inf.
    t = tf.logit_logistic(dists.Uniform(0.0, 1.0))
    out = np.asarray(t.con(np.array([0.0, 1.0, 0.5])))
    assert np.isfinite(out).all()
    back = np.asarray(t.rev(np.array([-1e3, 1e3, 0.0])))
    assert np.isfinite(back).all()
    np.testing.assert_allclose(back[2], 0.5)


def test_meanstd_matches_reference_formula():
    y = YANY
    t = tf.meanstd(y)
    np.testing.assert_allclose(
        np.asarray(t.con(y)), (y - y.mean()) / y.std(), rtol=1e-12
    )


def test_wgp_bookkeeping():
    y = YANY
    params = np.array([0.1, 1.2, 0.3, 1.1])
    w = tf.wgp(["sinharcsinh", "affine"], params, y=y)
    assert w.np == 4
    np.testing.assert_array_equal(w.pid, [2, 4])
    np.testing.assert_array_equal(w.pos, [False, True, False, True])
    assert len(w.default_priors) == 4
    _roundtrip(w, y)
    _der_vs_autodiff(w, y)


def test_wgp_data_fitted_stages_use_running_warped_data():
    # meanstd after sinharcsinh must be fitted on the warped data
    # (reference transform.py:527-533).
    y = YPOS
    params = np.array([0.2, 1.1])
    w = tf.wgp(["sinharcsinh", "meanstd"], params, y=y)
    s = tf.sinharcsinh(0.2, 1.1)
    yc = np.asarray(s.con(y))
    expect = (np.asarray(s.con(y)) - yc.mean()) / yc.std()
    np.testing.assert_allclose(np.asarray(w.con(y)), expect, rtol=1e-9)
    # data-fitted stage adds no params
    assert w.np == 2
    np.testing.assert_array_equal(w.pid, [2, 2])


def test_wgp_pzero_tracks_warped_zero():
    y = YANY
    w = tf.wgp(["affine", "pzero"], np.array([0.5, 2.0]), y=y)
    out = float(w.con(0.0))
    np.testing.assert_allclose(out, 0.0, atol=1e-12)


def test_wgp_traced_params():
    # The learnable cwgp path: params is a traced vector inside jit
    # (gpmcmc.py:240-277).
    y = jnp.asarray(YANY)

    @jax.jit
    def f(p):
        w = tf.wgp(["sinharcsinh", "meanstd"], p, y=y)
        return jnp.sum(w.con(y)) + w.log_det_jac(y)

    g = jax.grad(f)(jnp.array([0.2, 1.1]))
    assert np.isfinite(np.asarray(g)).all()


def test_wgp_rejects_unknown():
    with pytest.raises(ValueError):
        tf.wgp(["nope"], np.zeros(1))


def test_wgp_requires_y_for_fitted_stages():
    with pytest.raises(ValueError):
        tf.wgp(["meanstd"], np.zeros(0))


def test_conmc_aliases():
    t = tf.affine(0.1, 2.0)
    y = jnp.asarray(YANY)
    np.testing.assert_allclose(np.asarray(t.conmc(y)), np.asarray(t.con(y)))
    np.testing.assert_allclose(np.asarray(t.revmc(y)), np.asarray(t.rev(y)))
    np.testing.assert_allclose(np.asarray(t.dermc(y)), np.asarray(t.der(y)))


# -- native preprocessing fits vs sklearn (round 2: sklearn removed from
#    the runtime path; kept here as the parity oracle) -----------------------

def test_quantile_matches_sklearn(rng):
    from sklearn.preprocessing import QuantileTransformer

    x = rng.normal(size=400) * 2.0 + 1.0
    y = rng.normal(size=50) * 2.0 + 1.0
    for mode in ("normal", "uniform"):
        ours = tf.quantile(x, mode=mode)
        sk = QuantileTransformer(
            n_quantiles=min(1000, len(x)), output_distribution=mode)
        sk.fit(x.reshape(-1, 1))
        np.testing.assert_allclose(
            np.asarray(ours.con(y)), sk.transform(y.reshape(-1, 1))[:, 0],
            rtol=1e-6, atol=1e-6, err_msg=mode)
        z = np.asarray(ours.con(y))
        np.testing.assert_allclose(
            np.asarray(ours.rev(z)),
            sk.inverse_transform(z.reshape(-1, 1))[:, 0],
            rtol=1e-6, atol=1e-6, err_msg=mode)


def test_robust_matches_sklearn(rng):
    from sklearn.preprocessing import RobustScaler

    x = rng.normal(size=300) * 3.0 - 2.0
    y = rng.normal(size=40)
    ours = tf.robust(x)
    sk = RobustScaler().fit(x.reshape(-1, 1))
    np.testing.assert_allclose(
        np.asarray(ours.con(y)), sk.transform(y.reshape(-1, 1))[:, 0],
        rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ours.rev(ours.con(y))), y,
                               rtol=1e-10)


def test_powerT_matches_sklearn(rng):
    from sklearn.preprocessing import PowerTransformer

    x = np.exp(rng.normal(size=300))  # skewed, positive
    y = np.exp(rng.normal(size=30))
    ours = tf.powerT(x)
    sk = PowerTransformer(method="yeo-johnson").fit(x.reshape(-1, 1))
    lam_sk = float(np.clip(sk.lambdas_[0], -0.01, 1.0))
    assert abs(ours.lam - lam_sk) < 1e-4
    np.testing.assert_allclose(np.asarray(ours.rev(ours.con(y))), y,
                               rtol=1e-8)


def test_powerT_boxcox_mode(rng):
    x = np.exp(rng.normal(size=200))
    y = np.exp(rng.normal(size=20))
    ours = tf.powerT(x, method="box-cox")
    np.testing.assert_allclose(np.asarray(ours.rev(ours.con(y))), y,
                               rtol=1e-8)


def test_boxcoxf_lambda_matches_sklearn(rng):
    from sklearn.preprocessing import PowerTransformer

    x = np.exp(rng.normal(size=250)) + 0.1
    ours = tf.boxcoxf(x)
    sk = PowerTransformer(method="box-cox", standardize=False)
    sk.fit(x.reshape(-1, 1))
    assert abs(ours.lamb - float(sk.lambdas_[0])) < 1e-4


def test_quantile_con_traceable(rng):
    """Native con/rev are pure jnp: they must trace under jit (the
    sklearn-backed versions could not)."""
    import jax

    x = rng.normal(size=100)
    t = tf.quantile(x)
    out = jax.jit(t.con)(jnp.asarray(rng.normal(size=10)))
    assert np.isfinite(np.asarray(out)).all()
    t2 = tf.powerT(np.exp(rng.normal(size=100)))
    out2 = jax.jit(t2.con)(jnp.asarray(np.exp(rng.normal(size=10))))
    assert np.isfinite(np.asarray(out2)).all()
