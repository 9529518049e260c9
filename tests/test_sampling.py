"""LHC sampler tests: stratification property, CD2 discrepancy parity with
scipy, random-cd refinement actually lowering discrepancy, seed honoured."""

import numpy as np
import scipy.stats as st
from scipy.stats import qmc

import jax

from andvaranaut_tpu import dists, sampling


def test_cd2_matches_scipy():
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(37, 3))
    ours = float(sampling.cd2_discrepancy(x))
    theirs = float(qmc.discrepancy(x, method="CD"))
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)


def test_latin_hypercube_stratified():
    n, d = 64, 4
    pts = np.asarray(sampling.latin_hypercube(jax.random.PRNGKey(0), n, d, 0))
    assert pts.shape == (n, d)
    for j in range(d):
        strata = np.floor(pts[:, j] * n).astype(int)
        assert sorted(strata) == list(range(n)), "one point per stratum"


def test_random_cd_lowers_discrepancy():
    key = jax.random.PRNGKey(3)
    base = sampling.latin_hypercube(key, 50, 2, 0)
    opt = sampling.latin_hypercube(key, 50, 2, 2000)
    d0 = float(sampling.cd2_discrepancy(base))
    d1 = float(sampling.cd2_discrepancy(opt))
    assert d1 < d0
    # still a valid LHC after swaps (swaps happen within a column)
    pts = np.asarray(opt)
    for j in range(2):
        strata = np.floor(pts[:, j] * 50).astype(int)
        assert sorted(strata) == list(range(50))


def test_lhc_sample_maps_through_priors():
    priors = [dists.Uniform(0.0, 2.0), dists.Normal(5.0, 0.1)]
    x = sampling.lhc_sample(priors, 200, seed=7)
    assert x.shape == (200, 2)
    assert (x[:, 0] >= 0).all() and (x[:, 0] <= 2).all()
    # Normal column: LHC of a N(5, 0.1) should have near-exact moments
    assert abs(x[:, 1].mean() - 5.0) < 0.01
    # scipy frozen dists also accepted
    x2 = sampling.lhc_sample([st.uniform(0, 2), st.norm(5, 0.1)], 50, seed=1)
    assert x2.shape == (50, 2)


def test_seed_honoured_and_reproducible():
    priors = [dists.Uniform(0.0, 1.0)]
    a = sampling.lhc_sample(priors, 16, seed=11)
    b = sampling.lhc_sample(priors, 16, seed=11)
    c = sampling.lhc_sample(priors, 16, seed=12)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
