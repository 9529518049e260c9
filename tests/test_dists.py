"""Distribution library parity tests against scipy.stats.

The reference relies on scipy frozen dists throughout (lhc.py:46,
gpmcmc.py:632-637, 1053-1095); our JAX dists must agree so LHC samples, BO
bounds, and inverse-problem priors match.
"""

import numpy as np
import pytest
import scipy.stats as st

import jax

from andvaranaut_tpu import dists

CASES = [
    (st.uniform(loc=2.0, scale=3.0), dists.Uniform(2.0, 3.0)),
    (st.norm(loc=-1.0, scale=2.5), dists.Normal(-1.0, 2.5)),
    (st.truncnorm(-1.0, 2.0, loc=0.5, scale=1.5),
     dists.TruncNorm(-1.0, 2.0, 0.5, 1.5)),
    (st.truncnorm(1.0, 4.0), dists.TruncNorm(1.0, 4.0)),
    (st.lognorm(0.9, scale=np.exp(0.3)),
     dists.LogNormal.from_mu_sigma(0.3, 0.9)),
    (st.halfnorm(scale=2.0), dists.HalfNormal(0.0, 2.0)),
]


@pytest.mark.parametrize("sp,ours", CASES, ids=[c[1].__class__.__name__ + str(i) for i, c in enumerate(CASES)])
def test_ppf_cdf_parity(sp, ours):
    q = np.linspace(1e-8, 1 - 1e-8, 101)
    np.testing.assert_allclose(np.asarray(ours.ppf(q)), sp.ppf(q), rtol=1e-8, atol=2e-8)
    np.testing.assert_allclose(np.asarray(ours.isf(q)), sp.isf(q), rtol=1e-8, atol=2e-8)
    x = sp.ppf(np.linspace(0.01, 0.99, 53))
    np.testing.assert_allclose(np.asarray(ours.cdf(x)), sp.cdf(x), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours.sf(x)), sp.sf(x), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.logpdf(x)), sp.logpdf(x), rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("sp,ours", CASES, ids=[str(i) for i in range(len(CASES))])
def test_moments(sp, ours):
    np.testing.assert_allclose(float(ours.mean()), sp.mean(), rtol=1e-10)
    np.testing.assert_allclose(float(ours.std()), sp.std(), rtol=1e-10)


def test_interval_full_support():
    lo, hi = dists.Uniform(1.0, 0.5).interval(1.0)
    assert float(lo) == 1.0 and float(hi) == 1.5
    lo, hi = dists.Normal(0.0, 1.0).interval(1.0)
    assert np.isneginf(lo) and np.isposinf(hi)
    lo, hi = dists.TruncNorm(-1.0, 2.0, 0.5, 1.5).interval(1.0)
    np.testing.assert_allclose([float(lo), float(hi)], [-1.0, 3.5])


def test_from_scipy_roundtrip():
    for sp, ours in CASES:
        conv = dists.from_prior(sp)
        assert type(conv) is type(ours)
        q = np.linspace(0.001, 0.999, 21)
        np.testing.assert_allclose(np.asarray(conv.ppf(q)), sp.ppf(q), rtol=1e-9)


def test_from_prior_passthrough_and_reject():
    d = dists.Uniform(0.0, 1.0)
    assert dists.from_prior(d) is d
    with pytest.raises(TypeError):
        dists.from_prior(42)


def test_from_prior_arbitrary_scipy_family():
    """Reference accepts ANY scipy frozen dist as a prior (core.py:65-69);
    unsupported-fast-path families are wrapped host-side."""
    sp = st.beta(2.0, 3.0)
    d = dists.from_prior(sp)
    assert isinstance(d, dists.ScipyDist)
    q = np.linspace(0.01, 0.99, 23)
    np.testing.assert_allclose(np.asarray(d.ppf(q)), sp.ppf(q), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(d.isf(q)), sp.isf(q), rtol=1e-12)
    x = sp.ppf(q)
    np.testing.assert_allclose(np.asarray(d.cdf(x)), sp.cdf(x), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(d.logpdf(x)), sp.logpdf(x), rtol=1e-12)
    lo, hi = d.interval(1.0)
    assert float(lo) == 0.0 and float(hi) == 1.0
    np.testing.assert_allclose(float(d.mean()), sp.mean(), rtol=1e-12)
    s = np.asarray(d.rvs(500, random_state=3))
    assert s.shape == (500,) and (s >= 0).all() and (s <= 1).all()
    s2 = np.asarray(d.rvs(8, key=jax.random.PRNGKey(1)))
    assert s2.shape == (8,)


def test_from_prior_duck_typed_object():
    """Any object with ppf/cdf/rvs is usable (reference duck-compat)."""
    class MyDist:
        def ppf(self, q):
            return np.asarray(q) * 2.0

        def cdf(self, x):
            return np.asarray(x) / 2.0

        def rvs(self, size=None, random_state=None):
            return np.full(size or 1, 0.5)

    d = dists.from_prior(MyDist())
    assert isinstance(d, dists.ScipyDist)
    np.testing.assert_allclose(float(d.ppf(0.25)), 0.5)


def test_beta_prior_runs_lhc_workflow(tmp_path, monkeypatch):
    """An st.beta / st.gamma prior must construct LHC and sample end to end
    (VERDICT round-1 missing item 3)."""
    from andvaranaut_tpu import LHC

    monkeypatch.chdir(tmp_path)

    def fun(x):
        return np.array([x[0] + x[1] ** 2])

    lhc = LHC(nx=2, ny=1, priors=[st.beta(2.0, 3.0), st.gamma(2.0)],
              target=fun, parallel=False, verbose=False)
    lhc.sample(12, seed=0)
    assert lhc.x.shape == (12, 2) and lhc.y.shape == (12, 1)
    assert (lhc.x[:, 0] >= 0).all() and (lhc.x[:, 0] <= 1).all()
    assert (lhc.x[:, 1] >= 0).all()


def test_rvs_shapes_and_range():
    d = dists.TruncNorm(-1.0, 2.0, 0.5, 1.5)
    s = d.rvs(1000, key=jax.random.PRNGKey(0))
    s = np.asarray(s)
    assert s.shape == (1000,)
    lo, hi = d.interval(1.0)
    assert (s >= float(lo)).all() and (s <= float(hi)).all()
    # moments roughly right
    assert abs(s.mean() - float(d.mean())) < 5 * float(d.std()) / np.sqrt(1000)


def test_dists_are_pytrees():
    d = dists.Normal(0.0, 2.0)
    leaves = jax.tree_util.tree_leaves(d)
    assert len(leaves) == 2

    # usable inside jit
    @jax.jit
    def f(dist, x):
        return dist.logpdf(x)

    np.testing.assert_allclose(
        float(f(d, 1.0)), st.norm(0, 2).logpdf(1.0), rtol=1e-12
    )


def test_tail_accuracy_truncnorm():
    # scipy-parity ppf tails (SURVEY.md §7 hard part 3)
    sp = st.truncnorm(2.0, 8.0)
    ours = dists.TruncNorm(2.0, 8.0)
    for q in [1e-12, 1e-8, 1e-4, 0.5, 1 - 1e-8]:
        np.testing.assert_allclose(
            float(ours.ppf(q)), sp.ppf(q), rtol=1e-7,
            err_msg=f"q={q}",
        )
