"""BO compiled-program cache keying (VERDICT round-1 weak item 6).

The cache must key on transform CONTENT, not object identity: refits that
rebuild identical transforms must hit, changed warping parameters must
miss, and the cache must stay bounded.
"""

import numpy as np

from andvaranaut_tpu import transform as tf
from andvaranaut_tpu.gpmcmc import _transform_content_key


def test_content_key_equal_for_identical_transforms():
    y = np.linspace(-2.0, 3.0, 20)
    a = tf.meanstd(y)
    b = tf.meanstd(y)
    assert a is not b
    assert _transform_content_key(a) == _transform_content_key(b)


def test_content_key_differs_for_different_params():
    y = np.linspace(-2.0, 3.0, 20)
    a = tf.meanstd(y)
    b = tf.meanstd(y * 2.0 + 1.0)
    assert _transform_content_key(a) != _transform_content_key(b)


def test_content_key_wgp_params():
    y = np.linspace(0.5, 3.0, 20)
    w1 = tf.wgp(["affine"], np.array([0.1, 1.2]), y=y)
    w2 = tf.wgp(["affine"], np.array([0.1, 1.2]), y=y)
    w3 = tf.wgp(["affine"], np.array([0.3, 0.9]), y=y)
    assert _transform_content_key(w1) == _transform_content_key(w2)
    assert _transform_content_key(w1) != _transform_content_key(w3)


def test_bo_cache_bounded_and_content_keyed(tmp_path, monkeypatch):
    from andvaranaut_tpu import GPMCMC, dists

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)

    def fun(x):
        return np.array([x[0] ** 2 + x[1]])

    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    g = GPMCMC(nx=2, ny=1, priors=priors, target=fun, parallel=False,
               verbose=False)
    x = np.column_stack([rng.uniform(0, 2, 24), rng.uniform(1, 1.5, 24)])
    y = np.array([fun(r) for r in x])
    g.set_data(x, y)
    g.fit(method="map")

    run1 = g._get_bo_program("batch", "EI", "min", True, False)
    # same content after rebuilding identical conrevs -> cache hit
    g.change_conrevs(xconrevs=list(g.xconrevs), yconrevs=list(g.yconrevs))
    run2 = g._get_bo_program("batch", "EI", "min", True, False)
    assert run1 is run2

    # changed yconrev content -> different program
    g.change_yconrevs([tf.meanstd(g.y[:, 0] * 3.0 + 1.0)])
    run3 = g._get_bo_program("batch", "EI", "min", True, False)
    assert run3 is not run1

    # bounded: filling past the cap evicts, never grows unbounded
    cap = g._BO_CACHE_MAX
    for i in range(cap + 5):
        g._bo_cache[("fake", i)] = i
        while len(g._bo_cache) > cap:
            g._bo_cache.popitem(last=False)
    g._get_bo_program("batch", "explore", "min", True, False)
    assert len(g._bo_cache) <= cap
