"""NUTS sampler correctness: recovers known posteriors (moments, R-hat,
ESS), handles correlated/ill-scaled targets via mass adaptation, and the
GP-hyperparameter MCMC path works end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from andvaranaut_tpu.inference import nuts


def _run(logp, dim, chains=4, draws=800, tune=800, seed=0):
    return nuts.nuts_sample(
        logp, jnp.zeros(dim), key=jax.random.PRNGKey(seed),
        num_warmup=tune, num_samples=draws, num_chains=chains)


def test_std_normal():
    dim = 5

    def logp(z):
        return -0.5 * jnp.sum(z * z)

    res = _run(logp, dim)
    z = np.asarray(res["z"])  # (chains, draws, dim)
    assert z.shape == (4, 800, dim)
    assert abs(z.mean()) < 0.08
    np.testing.assert_allclose(z.reshape(-1, dim).std(axis=0),
                               np.ones(dim), atol=0.1)
    rhat = nuts.split_rhat(z.reshape(4, 800, dim))
    assert (rhat < 1.05).all(), rhat
    assert np.asarray(res["diverging"]).mean() < 0.01


def test_ill_scaled_gaussian_mass_adaptation():
    # scales spanning 1e-2..1e1: requires diagonal mass adaptation
    scales = jnp.asarray([0.01, 0.1, 1.0, 10.0])

    def logp(z):
        return -0.5 * jnp.sum((z / scales) ** 2)

    res = _run(logp, 4, draws=1000, tune=1000)
    z = np.asarray(res["z"]).reshape(-1, 4)
    np.testing.assert_allclose(
        z.std(axis=0), np.asarray(scales), rtol=0.15)


def test_correlated_gaussian():
    rho = 0.9
    prec = np.linalg.inv(np.array([[1.0, rho], [rho, 1.0]]))
    precj = jnp.asarray(prec)

    def logp(z):
        return -0.5 * z @ precj @ z

    res = _run(logp, 2, draws=1500, tune=1000, seed=3)
    z = np.asarray(res["z"]).reshape(-1, 2)
    corr = np.corrcoef(z.T)[0, 1]
    assert abs(corr - rho) < 0.05
    np.testing.assert_allclose(z.std(axis=0), [1.0, 1.0], atol=0.12)


def test_ess_and_rhat_sane():
    def logp(z):
        return -0.5 * jnp.sum(z * z)

    res = _run(logp, 2, chains=4, draws=500, tune=500)
    z = np.asarray(res["z"])
    ess = nuts.ess_bulk(z[..., 0])
    assert ess > 200, "NUTS on std normal should give high ESS"
    # rhat on deliberately-unmixed fake draws should flag
    fake = np.concatenate(
        [np.random.randn(2, 500, 1), 5 + np.random.randn(2, 500, 1)])
    assert (nuts.split_rhat(fake) > 1.5).all()


def test_gp_hyper_mcmc(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from andvaranaut_tpu import GPMCMC, dists
    import andvaranaut_tpu.transform as tf

    def toy(x):
        return np.array([x[0] ** 2 - x[0] - x[1] ** 2 * x[0] + x[1]])

    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    g = GPMCMC(
        nx=2, ny=1, priors=priors, target=toy,
        xconrevs=[tf.uniform(priors[0]), tf.uniform(priors[1])],
        verbose=False, rundir=str(tmp_path / "runs"))
    g.sample(30, seed=5)
    g.change_yconrevs([tf.meanstd(g.y[:, 0])])
    data = g.fit(method="mcmc_mean", return_data=True, draws=200, tune=200,
                 chains=2, random_seed=1)
    assert g.hypers is not None
    assert set(g.hypers) >= {"gv", "l", "kv"}
    assert np.asarray(g.hypers["l"]).shape == (2,)
    assert (np.asarray(data.sample_stats["lp"]) != 0).any()
    # mcmc_map extraction + refinement path
    g.fit(method="mcmc_map", draws=100, tune=200, chains=2, random_seed=2)
    yhat = g.predict(g.x)
    assert np.abs(yhat[:, 0] - g.y[:, 0]).max() < 0.05


def test_chains_sharded_over_mesh():
    # 8 chains on the 8-device CPU mesh must actually shard (and produce
    # sane results) — the BASELINE.json 64-chain posterior path in miniature.
    import jax

    assert jax.device_count() == 8

    def logp(z):
        return -0.5 * jnp.sum(z * z)

    res = nuts.nuts_sample(
        logp, jnp.zeros(3), key=jax.random.PRNGKey(0), num_warmup=300,
        num_samples=300, num_chains=8, shard=True)
    z = np.asarray(res["z"])
    assert z.shape == (8, 300, 3)
    rhat = nuts.split_rhat(z)
    assert (rhat < 1.1).all()


def test_64_chains_sharded_over_mesh():
    """BASELINE north-star chain count: 64 device-sharded chains end to end
    on the 8-device mesh (VERDICT round-1 item 5a)."""
    assert jax.device_count() == 8

    def logp(z):
        return -0.5 * jnp.sum((z - 1.5) ** 2 / 0.25)

    res = nuts.nuts_sample(
        logp, jnp.zeros(2), key=jax.random.PRNGKey(3), num_warmup=150,
        num_samples=150, num_chains=64, shard=True)
    z = np.asarray(res["z"])
    assert z.shape == (64, 150, 2)
    rhat = nuts.split_rhat(z)
    assert (rhat < 1.05).all()
    assert abs(z.mean() - 1.5) < 0.05
    assert abs(z.std() - 0.5) < 0.07


def test_mcmc_to_inference_data_schema():
    """to_dict emits the arviz from_dict schema (chain/draw dims + coords);
    to_inference_data degrades gracefully without arviz installed."""
    def logp(z):
        return -0.5 * jnp.sum(z * z)

    from andvaranaut_tpu.inference.unconstrained import RV, RVPack

    rvpack = RVPack((RV("a", 1, ("normal", 0.0, 1.0)),
                     RV("b", 2, ("lognormal", 0.0, 1.0))))
    data = nuts.sample_rvpack(
        rvpack, lambda z: -logp(z), draws=50, tune=50, chains=4)
    d = data.to_dict()
    assert set(d) == {"posterior", "sample_stats", "coords", "dims"}
    assert d["posterior"]["a"].shape == (4, 50)
    assert d["posterior"]["b"].shape == (4, 50, 2)
    assert d["dims"]["b"] == ["b_dim_0"]
    assert list(d["coords"]["b_dim_0"]) == [0, 1]
    assert d["sample_stats"]["lp"].shape == (4, 50)
    out = data.to_inference_data()
    try:
        import arviz  # noqa: F401
        assert hasattr(out, "posterior")
    except ImportError:
        assert out["posterior"]["a"].shape == (4, 50)


def test_hmc_std_normal():
    """Jittered fixed-budget HMC (the TPU-safe sampler) recovers a known
    posterior with the same adaptation machinery as NUTS."""
    dim = 4

    def logp(z):
        return -0.5 * jnp.sum(z * z)

    res = nuts.nuts_sample(
        logp, jnp.zeros(dim), key=jax.random.PRNGKey(1), num_warmup=800,
        num_samples=800, num_chains=4, sampler="hmc", max_treedepth=5)
    z = np.asarray(res["z"])
    assert z.shape == (4, 800, dim)
    assert abs(z.mean()) < 0.08
    np.testing.assert_allclose(z.reshape(-1, dim).std(axis=0),
                               np.ones(dim), atol=0.1)
    rhat = nuts.split_rhat(z)
    assert (rhat < 1.05).all(), rhat
    # trajectory lengths are jittered in [1, 2**depth], quantised to the
    # scan's leapfrog-unroll granularity (multiples of 4)
    depth = np.asarray(res["depth"])
    assert depth.min() >= 1 and depth.max() <= 32
    assert len(np.unique(depth)) >= 6


def test_hmc_ill_scaled_mass_adaptation():
    scales = jnp.asarray([0.05, 1.0, 5.0])

    def logp(z):
        return -0.5 * jnp.sum((z / scales) ** 2)

    res = nuts.nuts_sample(
        logp, jnp.zeros(3), key=jax.random.PRNGKey(2), num_warmup=1000,
        num_samples=1000, num_chains=4, sampler="hmc", max_treedepth=5)
    z = np.asarray(res["z"]).reshape(-1, 3)
    np.testing.assert_allclose(z.std(axis=0), np.asarray(scales), rtol=0.15)


def test_hmc_chees_trajectory_adaptation():
    """Cross-chain ChEES trajectory-time adaptation (the sampler='hmc'
    default): correct posterior on an ill-scaled Gaussian, and the
    learned mean trajectory length must neither run away to the budget
    cap (the round-2 per-chain-mean pathology) nor collapse to 1."""
    dim = 6
    scales = jnp.asarray(np.logspace(0, 1.2, dim))

    def logp(z):
        return -0.5 * jnp.sum((z / scales) ** 2)

    budget = 2 ** 6
    res = nuts.hmc_flat_sample(
        logp, jnp.zeros(dim), key=jax.random.PRNGKey(3), num_warmup=800,
        num_samples=800, num_chains=4, max_treedepth=6,
        leaps_per_call=2048, adapt_tlen=True)
    z = np.asarray(res["z"])
    np.testing.assert_allclose(
        z.reshape(-1, dim).std(axis=0), np.asarray(scales), rtol=0.2)
    rhat = nuts.split_rhat(z)
    assert (rhat < 1.05).all(), rhat
    mean_len = np.asarray(res["depth"]).mean()
    assert 1.5 < mean_len < 0.85 * budget, mean_len
    # adaptation must actually RUN through the whole warmup — a frozen
    # tmean (e.g. a gate tied to state that a mass apply resets) still
    # samples correctly and passes the band above, so pin the Adam step
    # counter.  It is reset at the 0.6*warmup mass apply by design, so
    # the final count must be ~the post-apply warmup transitions
    # (0.4 * 800 = 320 here); the freeze regression gives exactly 0.
    adc = np.asarray(nuts.hmc_flat_sample._last_carry[15][4])
    assert (adc > 0.3 * 800).all(), adc
    # the learned coordinate is trajectory LENGTH (leapfrog steps) with
    # a 2-step floor, and draws are floored at 4 leapfrogs: the measured
    # mixed-objective collapse (learned length below ONE step -> pure
    # random walk, min ESS 7-10 — absorbing, since the ChEES gradient
    # has no signal at sub-step lengths) must be structurally impossible
    ln = np.asarray(nuts.hmc_flat_sample._last_carry[15][0])
    assert (np.exp(ln) >= 2.0 - 1e-9).all(), ln
    assert np.asarray(res["depth"]).min() >= 4


def test_eps_adam_no_collapse_and_recovery():
    """Step-size adaptation must survive a run of ~0 acceptances (a
    posterior funnel neck) without an absorbing collapse.

    Measured TPU failure (n=256 GP hyperposterior, 150+150): Nesterov
    dual averaging multiplies the running-mean acceptance excess by
    sqrt(t)/gamma, so ~60 rejections drove one chain's log_eps down by
    ~100 nats (frozen at eps=2e-16 when warmup ended — min ESS 1,
    rhat 6.8); recovery needs hundreds of transitions.  The hmc-flat
    sampler therefore adapts with bounded ADAM updates (ChEES-HMC
    style, _da_adam_update); this pins the mechanism."""
    eps0 = jnp.asarray(0.1)
    da = nuts._da_init(eps0)
    ad = nuts._da_adam_init(eps0)
    for _ in range(60):
        da = nuts._da_update(da, jnp.asarray(0.0), 0.8)
        ad = nuts._da_adam_update(ad, jnp.asarray(0.0), 0.8)
    # DA collapses by ~100 nats; ADAM's excursion is bounded by ~lr * 60
    assert float(da.log_eps) < np.log(0.1) - 25.0
    lo = float(ad.log_eps)
    assert lo > np.log(0.1) - 3.5, lo
    # recovery moves back UP at a bounded rate; DA stays collapsed (and
    # its primal average — the FROZEN post-warmup step size — with it)
    for _ in range(60):
        da = nuts._da_update(da, jnp.asarray(1.0), 0.8)
        ad = nuts._da_adam_update(ad, jnp.asarray(1.0), 0.8)
    assert float(ad.log_eps) > lo + 0.5, float(ad.log_eps)
    assert float(da.log_eps) < np.log(0.1) - 10.0
    assert float(da.log_eps_bar) < np.log(0.1) - 10.0


def test_hmc_funnel_neck_start_samples():
    """End-to-end guard for the same pathology: chains started deep in a
    Neal-funnel neck with a SHORT warmup must end with a usable frozen
    step size and actually traverse the funnel."""
    d = 5

    def logp(z):
        v = z[0]
        x = z[1:]
        return (-0.5 * v * v / 9.0
                - 0.5 * jnp.sum(x * x) * jnp.exp(-v) - 0.5 * (d - 1) * v)

    z0 = np.zeros(d)
    z0[0] = -6.0
    res = nuts.hmc_flat_sample(
        logp, jnp.asarray(z0), key=jax.random.PRNGKey(0), num_warmup=150,
        num_samples=150, num_chains=4, max_treedepth=6, jitter_init=0.5,
        shard=False, adapt_tlen=True)
    da = nuts.hmc_flat_sample._last_carry[3]
    eps_bar = np.exp(np.asarray(da.log_eps_bar))
    assert (eps_bar > 1e-4).all(), eps_bar
    v = np.asarray(res["z"])[:, :, 0]
    # every chain must move through the funnel (a frozen chain has ~0
    # spread); the pooled spread should be funnel-scale
    assert (v.std(axis=1) > 0.5).all(), v.std(axis=1)
    assert v.std() > 1.2


def test_hmc_gp_posterior_matches_nuts(rng):
    """sampler='hmc' through sample_model agrees with NUTS on a GP
    hyperposterior (the TPU fallback must be a correct sampler, not just
    a crash-avoider)."""
    from andvaranaut_tpu.gp import engine
    from andvaranaut_tpu.lhc import _none_conrev

    n = 48
    X = rng.uniform(size=(n, 2))
    y = np.sin(3 * X[:, 0]) + 0.2 * X[:, 1] + 0.05 * rng.normal(size=n)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y.reshape(-1, 1))
    d0 = nuts.sample_model(cfg, draws=200, tune=200, chains=4,
                           random_seed=0, sampler="nuts")
    d1 = nuts.sample_model(cfg, draws=200, tune=200, chains=4,
                           random_seed=0, sampler="hmc")
    m0 = d0.posterior_mean()
    m1 = d1.posterior_mean()
    for k in m0:
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m0[k]), rtol=0.35, atol=0.05,
            err_msg=k)


def test_mixed_objective_matches_f64(rng):
    """The mixed-precision NUTS objective (closed-form custom VJP) must
    match the f64 autodiff objective in value and gradient."""
    from andvaranaut_tpu.gp import bigfit, engine
    from andvaranaut_tpu.lhc import _none_conrev

    n = 64
    X = rng.uniform(size=(n, 2))
    y = np.sin(3 * X[:, 0]) + 0.2 * X[:, 1]
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y.reshape(-1, 1))
    rv0, nlp0 = engine.build_objective(cfg)
    rv1, nlp1 = bigfit.make_mixed_objective(X, y, block=32)
    z = np.asarray(rv0.z0()) + 0.1
    v0, g0 = jax.value_and_grad(nlp0)(jnp.asarray(z))
    v1, g1 = jax.value_and_grad(nlp1)(jnp.asarray(z))
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=5e-6)


def test_sample_model_mixed_path(rng):
    """NUTS through the mixed objective recovers the same posterior as the
    f64 path on a small GP."""
    from andvaranaut_tpu.gp import engine
    from andvaranaut_tpu.lhc import _none_conrev

    n = 48
    X = rng.uniform(size=(n, 2))
    y = np.sin(3 * X[:, 0]) + 0.2 * X[:, 1] + 0.05 * rng.normal(size=n)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y.reshape(-1, 1))
    d0 = nuts.sample_model(cfg, draws=150, tune=150, chains=4,
                           random_seed=0, mixed=False)
    d1 = nuts.sample_model(cfg, draws=150, tune=150, chains=4,
                           random_seed=0, mixed=True)
    m0 = d0.posterior_mean()
    m1 = d1.posterior_mean()
    for k in m0:
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m0[k]), rtol=0.35, atol=0.05,
            err_msg=k)


def test_64_hmc_chains_sharded_over_mesh():
    """The TPU production sampler (flat jittered/ChEES HMC) at the
    BASELINE north-star chain count, device-sharded: 64 chains on the
    8-device mesh, cross-chain ChEES pooling included."""
    assert jax.device_count() == 8

    def logp(z):
        return -0.5 * jnp.sum((z - 1.5) ** 2 / 0.25)

    res = nuts.hmc_flat_sample(
        logp, jnp.zeros(2), key=jax.random.PRNGKey(5), num_warmup=150,
        num_samples=150, num_chains=64, shard=True)
    z = np.asarray(res["z"])
    assert z.shape == (64, 150, 2)
    rhat = nuts.split_rhat(z)
    assert (rhat < 1.05).all()
    assert abs(z.mean() - 1.5) < 0.05
    assert abs(z.std() - 0.5) < 0.07


def test_hmc_single_chain_adapt_tlen_falls_back():
    """ChEES needs >= 2 chains (the criterion is defined against the
    cross-chain mean; a single chain's self-mean biases the halting
    gradient — the measured runaway mode).  One chain must warn, fall
    back to uniform jitter, and still sample correctly."""
    import warnings as _w

    def logp(z):
        return -0.5 * jnp.sum(z * z)

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        res = nuts.hmc_flat_sample(
            logp, jnp.zeros(3), key=jax.random.PRNGKey(7),
            num_warmup=500, num_samples=500, num_chains=1,
            max_treedepth=5, adapt_tlen=True)
    assert any("CROSS-chain" in str(w.message) for w in rec)
    z = np.asarray(res["z"])
    assert z.shape == (1, 500, 3)
    assert abs(z.mean()) < 0.15
    np.testing.assert_allclose(
        z.reshape(-1, 3).std(axis=0), np.ones(3), atol=0.15)


def test_sample_model_mcmc_block_env_override(rng, monkeypatch):
    """ANDVARANAUT_MCMC_BLOCK overrides the mixed-objective
    factorisation block (the 256 cap is wrong at 16k, where the MAP-fit
    evidence says 1024; the knob lets at-scale MCMC use it)."""
    from andvaranaut_tpu.gp import bigfit, engine
    from andvaranaut_tpu.lhc import _none_conrev

    n = 48
    X = rng.uniform(size=(n, 2))
    y = np.sin(3 * X[:, 0]) + 0.05 * rng.normal(size=n)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y.reshape(-1, 1))
    seen = {}
    orig = bigfit.make_mixed_objective

    def spy(xin, yin, **kw):
        seen["block"] = kw.get("block")
        return orig(xin, yin, **kw)

    monkeypatch.setattr(bigfit, "make_mixed_objective", spy)
    monkeypatch.setenv("ANDVARANAUT_MCMC_BLOCK", "16")
    nuts.sample_model(cfg, draws=10, tune=10, chains=2, random_seed=0,
                      mixed=True)
    assert seen["block"] == 16


def test_sample_model_mcmc_block_env_rejects_nonpositive(rng, monkeypatch):
    """A zero/negative ANDVARANAUT_MCMC_BLOCK fails fast with a message
    naming the env knob, instead of a ZeroDivisionError deep inside
    blocked_cholesky."""
    from andvaranaut_tpu.gp import engine
    from andvaranaut_tpu.lhc import _none_conrev

    X = rng.uniform(size=(16, 2))
    y = np.sin(3 * X[:, 0]).reshape(-1, 1)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y)
    monkeypatch.setenv("ANDVARANAUT_MCMC_BLOCK", "0")
    with pytest.raises(ValueError, match="ANDVARANAUT_MCMC_BLOCK"):
        nuts.sample_model(cfg, draws=2, tune=2, chains=2, random_seed=0,
                          mixed=True)


def test_hmc_host_std_normal():
    """Host-driven HMC (the 16k workaround: one value+grad launch per
    leapfrog, integrator in NumPy) recovers a standard normal with
    mass + step-size adaptation."""
    from andvaranaut_tpu.inference import host_hmc

    dim = 3

    def u_vg(z):
        z = np.asarray(z)
        return 0.5 * float(np.dot(z, z)), z

    res = host_hmc.hmc_host_sample(
        u_vg, np.zeros(dim), num_warmup=400, num_samples=600,
        num_chains=2, budget=16, seed=3)
    z = res["z"]
    assert z.shape == (2, 600, dim)
    assert abs(z.mean()) < 0.12
    np.testing.assert_allclose(z.reshape(-1, dim).std(axis=0),
                               np.ones(dim), atol=0.15)
    assert res["diverging"].mean() < 0.02
    assert 0.5 < res["accept"].mean() <= 1.0
    depth = res["depth"]
    assert depth.min() >= 1 and depth.max() <= 16


def test_hmc_host_ill_scaled_mass():
    """Welford diagonal mass (applied at 0.6*warmup) must whiten an
    ill-scaled Gaussian for the host sampler."""
    from andvaranaut_tpu.inference import host_hmc

    scales = np.asarray([0.05, 1.0, 5.0])

    def u_vg(z):
        z = np.asarray(z)
        return (0.5 * float(np.sum((z / scales) ** 2)),
                z / scales ** 2)

    res = host_hmc.hmc_host_sample(
        u_vg, np.zeros(3), num_warmup=800, num_samples=1200,
        num_chains=2, budget=16, seed=4)
    z = res["z"].reshape(-1, 3)
    np.testing.assert_allclose(z.std(axis=0), scales, rtol=0.2)


def test_sample_rvpack_hmc_host_gp(rng):
    """sampler='hmc_host' end to end through sample_rvpack on a real GP
    hyperposterior (the mixed objective): the same value+grad program
    class as the 16k MAP fit, one launch per leapfrog."""
    from andvaranaut_tpu.gp import bigfit

    n, nx = 64, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + 0.01 * rng.normal(size=n)
    rvpack, nlp = bigfit.make_mixed_objective(
        jnp.asarray(X), jnp.asarray(y), kerns=("RBF",), noise=True,
        jitter=1e-6, block=64)
    data = nuts.sample_rvpack(
        rvpack, nlp, draws=40, tune=40, chains=1, sampler="hmc_host",
        max_treedepth=3, random_seed=5)
    post = data.posterior
    assert post["l"].shape == (1, 40, nx)
    assert np.isfinite(data.sample_stats["lp"]).all()
    # the chain must move and stay in a sane hyperparameter range
    assert np.unique(post["kv"]).size > 5
    assert (post["gv"] > 0).all()


def test_sample_model_large_n_defaults_hmc_host(rng, monkeypatch):
    """On TPU, sample_model's default sampler must switch to 'hmc_host'
    above n=2048 (every compiled transition program faults the worker
    at 16k; n=2048 is the largest compiled-HMC config demonstrated
    green — docs/TPU_NOTES.md)."""
    from andvaranaut_tpu import _config
    from andvaranaut_tpu.gp import engine
    from andvaranaut_tpu.lhc import _none_conrev

    seen = {}

    def spy(rvpack, nlp, **kw):
        seen["sampler"] = kw.get("sampler")
        raise RuntimeError("stop")

    monkeypatch.setattr(nuts, "sample_rvpack", spy)
    monkeypatch.setattr(_config, "is_tpu", lambda: True)

    def cfg_of(n):
        X = rng.uniform(size=(n, 2))
        y = np.sin(3 * X[:, 0]).reshape(-1, 1)
        return engine.FitConfig(
            kerns=("RBF",), ops=(), noise=True, truncate=False,
            jitter=1e-6, iwgp=False, cwgp=False, priors=[None, None],
            xconrevs=[_none_conrev(), _none_conrev()],
            yconrevs=[_none_conrev()], x=X, y=y)

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="stop"):
        nuts.sample_model(cfg_of(2049), draws=2, tune=2, mixed=True)
    assert seen["sampler"] == "hmc_host"
    with _pytest.raises(RuntimeError, match="stop"):
        nuts.sample_model(cfg_of(64), draws=2, tune=2, mixed=True)
    assert seen["sampler"] == "hmc"


def test_hmc_host_chees_adaptation(rng):
    """Host-sampler ChEES (lockstep chains, pooled cross-chain mean):
    on a correlated Gaussian the learned mean trajectory length must
    leave the reset constant without running away to the budget cap
    (the compiled sampler's measured failure modes), and the posterior
    must stay correct.  Mechanism check: depths under adaptation are
    drawn from 2*nmean, so their spread reflects the learned value."""
    from andvaranaut_tpu.inference import host_hmc

    dim = 4
    scales = np.asarray([0.3, 1.0, 3.0, 10.0])

    def u_vg(z):
        z = np.asarray(z)
        return (0.5 * float(np.sum((z / scales) ** 2)),
                z / scales ** 2)

    res = host_hmc.hmc_host_sample(
        u_vg, np.zeros(dim), num_warmup=600, num_samples=800,
        num_chains=2, budget=32, seed=7)
    z = res["z"].reshape(-1, dim)
    np.testing.assert_allclose(z.std(axis=0), scales, rtol=0.25)
    depth = res["depth"]
    # ChEES draws clip to [4, budget]; cap saturation (every draw at
    # 32) and collapse (every draw at the 4 floor) both indicate the
    # adaptation failed
    assert depth.min() >= 4 and depth.max() <= 32
    assert (depth == 32).mean() < 0.9, "trajectory cap saturation"
    assert (depth == 4).mean() < 0.9, "trajectory collapse"
    # single chain falls back to uniform jitter with a warning
    import warnings as _w

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        host_hmc.hmc_host_sample(
            u_vg, np.zeros(dim), num_warmup=30, num_samples=10,
            num_chains=1, budget=8, seed=1, adapt_tlen=True)
    assert any("CROSS-chain" in str(r.message) for r in rec)


def test_hmc_host_curvature_mass():
    """map_diag_inv_mass recovers 1/H_ii at a mode, and a FIXED
    curvature mass (adapt_mass=False) whitens an ill-scaled Gaussian
    with a SHORT warmup — the 16k MAP-start regime, where the Welford
    window was the measured budget-16 accept collapse (accept 0.08,
    docs/TPU_NOTES.md round 4)."""
    from andvaranaut_tpu.inference import host_hmc

    scales = np.asarray([0.05, 1.0, 5.0])

    def u_vg(z):
        z = np.asarray(z)
        return (0.5 * float(np.sum((z / scales) ** 2)),
                z / scales ** 2)

    im = host_hmc.map_diag_inv_mass(u_vg, np.zeros(3), clip_max=None)
    np.testing.assert_allclose(im, scales ** 2, rtol=1e-3)
    # the default clip bounds weak/noisy directions at unit (prior) mass
    clipped = host_hmc.map_diag_inv_mass(u_vg, np.zeros(3))
    np.testing.assert_allclose(clipped, np.minimum(scales ** 2, 1.0),
                               rtol=1e-3)

    res = host_hmc.hmc_host_sample(
        u_vg, np.zeros(3), num_warmup=60, num_samples=900,
        num_chains=2, budget=16, seed=4, jitter_init=0.1,
        inv_mass0=im, adapt_mass=False)
    z = res["z"].reshape(-1, 3)
    np.testing.assert_allclose(z.std(axis=0), scales, rtol=0.2)
    assert res["accept"].mean() > 0.5


def test_sample_model_warm_start_curvature_mass(rng, monkeypatch):
    """sample_model(start=..., sampler='hmc_host') fixes the host
    sampler's mass to the curvature at the start (inv_mass0 set,
    adapt_mass off) — the facade's mcmc-after-map path at large N."""
    from andvaranaut_tpu.gp import engine
    from andvaranaut_tpu.inference import host_hmc
    from andvaranaut_tpu.lhc import _none_conrev

    n, nx = 32, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + 0.1 * rng.normal(size=n)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None] * nx,
        xconrevs=[_none_conrev()] * nx, yconrevs=[_none_conrev()],
        x=X, y=y.reshape(-1, 1))

    seen = {}
    real = host_hmc.hmc_host_sample

    def spy(fn, z0, **kw):
        seen["inv_mass0"] = kw.get("inv_mass0")
        seen["adapt_mass"] = kw.get("adapt_mass")
        return real(fn, z0, **kw)

    monkeypatch.setattr(host_hmc, "hmc_host_sample", spy)
    nuts.sample_model(
        cfg, draws=4, tune=4, chains=1, sampler="hmc_host",
        mixed=False, start={"gv": 0.01, "l": [1.0, 1.0], "kv": 1.0})
    assert seen["inv_mass0"] is not None
    assert seen["adapt_mass"] is False
    assert np.all(np.isfinite(seen["inv_mass0"]))


def test_hmc_host_pilot_mass(rng):
    """draws_inv_mass: per-dim variance from pilot draws, no additive
    regularisation (the 16k kv-dim's 1e-5 variance would be inflated
    ~24x by a PyMC-style 1e-3 pull — the measured crawl mode), and a
    fixed pilot mass samples the ill-scaled Gaussian correctly."""
    from andvaranaut_tpu.inference import host_hmc

    scales = np.asarray([0.03, 1.0, 4.0])
    draws = rng.normal(size=(2, 500, 3)) * scales
    im = host_hmc.draws_inv_mass(draws)
    np.testing.assert_allclose(im, scales ** 2, rtol=0.2)

    def u_vg(z):
        z = np.asarray(z)
        return (0.5 * float(np.sum((z / scales) ** 2)),
                z / scales ** 2)

    res = host_hmc.hmc_host_sample(
        u_vg, np.zeros(3), num_warmup=40, num_samples=800,
        num_chains=2, budget=16, seed=7, jitter_init=0.05,
        inv_mass0=im, adapt_mass=False)
    z = res["z"].reshape(-1, 3)
    np.testing.assert_allclose(z.std(axis=0), scales, rtol=0.2)
    assert res["accept"].mean() > 0.5


def test_curvature_mass_fallback_smallest():
    """An unresolvable (noise-negative) curvature direction falls back
    to the SMALLEST resolved inv_mass, not unit mass — one oversized
    axis collapses eps for every dimension (the measured 16k crawl)."""
    from andvaranaut_tpu.inference import host_hmc

    hdiag = np.asarray([400.0, 25.0, -1.0])  # dim 2 unresolvable

    def u_vg(z):
        z = np.asarray(z)
        return 0.5 * float(np.sum(hdiag * z * z)), hdiag * z

    im = host_hmc.map_diag_inv_mass(u_vg, np.zeros(3))
    np.testing.assert_allclose(im[:2], [1 / 400.0, 1 / 25.0], rtol=1e-6)
    assert im[2] == pytest.approx(1 / 400.0)


def test_curvature_mass_relative_resolution():
    """A barely-POSITIVE noise-scale curvature (h ~ 1e-9 next to 400)
    also takes the smallest-resolved fallback — 1/h would clip to
    clip_max and reproduce the documented unit-mass crawl; only
    h > rel_tol * max(h) counts as resolved."""
    from andvaranaut_tpu.inference import host_hmc

    hdiag = np.asarray([400.0, 25.0, 1e-9])  # dim 2 noise-positive

    def u_vg(z):
        z = np.asarray(z)
        return 0.5 * float(np.sum(hdiag * z * z)), hdiag * z

    im = host_hmc.map_diag_inv_mass(u_vg, np.zeros(3))
    np.testing.assert_allclose(im[:2], [1 / 400.0, 1 / 25.0], rtol=1e-6)
    assert im[2] == pytest.approx(1 / 400.0)
    # a legitimate wide-but-real span (1e4 curvature ratio) stays fully
    # resolved under the default rel_tol
    hdiag2 = np.asarray([400.0, 1.0, 0.04])

    def u_vg2(z):
        z = np.asarray(z)
        return 0.5 * float(np.sum(hdiag2 * z * z)), hdiag2 * z

    im2 = host_hmc.map_diag_inv_mass(u_vg2, np.zeros(3), clip_max=None)
    np.testing.assert_allclose(im2, 1.0 / hdiag2, rtol=1e-6)


def _batched_gaussian(scales):
    scales = np.asarray(scales)

    def vec_eval(Z):
        Z = np.asarray(Z)
        return (0.5 * np.sum((Z / scales) ** 2, axis=1),
                Z / scales ** 2)

    return vec_eval


def test_hmc_host_batched_std_normal():
    """vec_eval lockstep batching: every objective call carries ALL
    chains (one launch per leapfrog total, not per chain), and the
    batched sampler recovers a standard normal across 4 chains."""
    from andvaranaut_tpu.inference import host_hmc

    dim, C = 3, 4
    calls = {"n": 0, "shapes": set()}
    base = _batched_gaussian(np.ones(dim))

    def vec_eval(Z):
        calls["n"] += 1
        calls["shapes"].add(np.asarray(Z).shape)
        return base(Z)

    res = host_hmc.hmc_host_sample(
        None, np.zeros(dim), num_warmup=400, num_samples=600,
        num_chains=C, budget=16, seed=3, vec_eval=vec_eval)
    z = res["z"]
    assert z.shape == (C, 600, dim)
    assert calls["shapes"] == {(C, dim)}
    # one batched launch per leapfrog: <= (warmup+draws)*budget plus
    # init + eps searches — far below the serial C x count
    assert calls["n"] <= (400 + 600) * 16 * 0.75
    assert abs(z.mean()) < 0.12
    np.testing.assert_allclose(z.reshape(-1, dim).std(axis=0),
                               np.ones(dim), atol=0.15)
    assert res["diverging"].mean() < 0.02
    assert 0.5 < res["accept"].mean() <= 1.0


def test_hmc_host_batched_pooled_welford_mass():
    """The batched sampler's POOLED Welford window whitens an
    ill-scaled Gaussian (C chains feed one mass estimate)."""
    from andvaranaut_tpu.inference import host_hmc

    scales = np.asarray([0.05, 1.0, 5.0])
    res = host_hmc.hmc_host_sample(
        None, np.zeros(3), num_warmup=600, num_samples=900,
        num_chains=4, budget=16, seed=4,
        vec_eval=_batched_gaussian(scales))
    z = res["z"].reshape(-1, 3)
    np.testing.assert_allclose(z.std(axis=0), scales, rtol=0.2)


def test_hmc_host_batched_fixed_pilot_mass():
    """Batched chains + fixed pilot mass (adapt_mass=False): the 16k
    production configuration — no Welford apply, no mid-warmup eps
    re-search, short warmup suffices."""
    from andvaranaut_tpu.inference import host_hmc

    scales = np.asarray([0.03, 1.0, 4.0])
    res = host_hmc.hmc_host_sample(
        None, np.zeros(3), num_warmup=40, num_samples=800,
        num_chains=4, budget=16, seed=7, jitter_init=0.05,
        inv_mass0=scales ** 2, adapt_mass=False,
        vec_eval=_batched_gaussian(scales))
    z = res["z"].reshape(-1, 3)
    np.testing.assert_allclose(z.std(axis=0), scales, rtol=0.2)
    assert res["accept"].mean() > 0.5


def test_hmc_host_batched_divergence_freeze():
    """A lane that turns non-finite mid-trajectory freezes at its last
    finite state and is recorded as diverging; the OTHER chains keep
    integrating (no crash, finite draws everywhere)."""
    from andvaranaut_tpu.inference import host_hmc

    def vec_eval(Z):
        Z = np.asarray(Z)
        u = 0.5 * np.sum(Z * Z, axis=1)
        # a hard wall: any |z0| > 1.5 is outside the support
        u = np.where(np.abs(Z[:, 0]) > 1.5, np.inf, u)
        return u, Z

    res = host_hmc.hmc_host_sample(
        None, np.zeros(2), num_warmup=100, num_samples=300,
        num_chains=4, budget=8, seed=11, jitter_init=0.2,
        vec_eval=vec_eval)
    assert np.isfinite(res["z"]).all()
    assert np.isfinite(res["lp"]).all()
    assert (np.abs(res["z"][..., 0]) <= 1.5).all()


def test_hmc_host_batched_chees(rng):
    """ChEES trajectory adaptation engages for batched chains (the
    auto-gate sees >= 2 chains) and stays bounded: learned mean
    trajectory within the budget, posterior still correct."""
    from andvaranaut_tpu.inference import host_hmc

    scales = np.asarray([1.0, 2.0])
    res = host_hmc.hmc_host_sample(
        None, np.zeros(2), num_warmup=200, num_samples=600,
        num_chains=4, budget=16, seed=5, adapt_tlen=True,
        vec_eval=_batched_gaussian(scales))
    z = res["z"].reshape(-1, 2)
    np.testing.assert_allclose(z.std(axis=0), scales, rtol=0.25)
    assert res["depth"].max() <= 16
    assert res["depth"].min() >= 1
    # ChEES draws are shared across chains within a transition
    assert (res["depth"][0] == res["depth"][1]).all()


def test_hmc_host_batched_gp_posterior(rng):
    """Batched host HMC on a REAL GP hyperposterior (the vmapped mixed
    value+grad — the exact 16k production program class) agrees with
    the serial host sampler's posterior."""
    from andvaranaut_tpu.gp import bigfit
    from andvaranaut_tpu.inference import host_hmc

    n, nx = 64, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + 0.01 * rng.normal(size=n)
    rvpack, nlp = bigfit.make_mixed_objective(
        jnp.asarray(X), jnp.asarray(y), kerns=("RBF",), noise=True,
        jitter=1e-6, block=64)
    u_vg = jax.jit(jax.value_and_grad(nlp))
    vec_vg = jax.jit(jax.vmap(jax.value_and_grad(nlp)))

    def serial(z):
        u, g = u_vg(jnp.asarray(z))
        return float(u), np.asarray(g)

    def batched(Z):
        us, gs = vec_vg(jnp.asarray(Z))
        return np.asarray(us), np.asarray(gs)

    res_b = host_hmc.hmc_host_sample(
        None, np.asarray(rvpack.z0()), num_warmup=150,
        num_samples=150, num_chains=4, budget=8, seed=2,
        vec_eval=batched)
    res_s = host_hmc.hmc_host_sample(
        serial, np.asarray(rvpack.z0()), num_warmup=150,
        num_samples=300, num_chains=1, budget=8, seed=3)
    zb = res_b["z"].reshape(-1, res_b["z"].shape[-1])
    zs_ = res_s["z"].reshape(-1, res_s["z"].shape[-1])
    assert np.isfinite(res_b["lp"]).all()
    # same posterior bulk: means within a std of each other
    std = zs_.std(axis=0) + 1e-9
    assert np.all(np.abs(zb.mean(axis=0) - zs_.mean(axis=0))
                  < 1.2 * std + 0.3)


def test_sample_rvpack_vec_map_mode(rng, monkeypatch):
    """vec='map' (the >8192-n route) samples correctly through
    lax.map-over-chains, and sample_model picks it on TPU above the
    measured vmap compile boundary."""
    from andvaranaut_tpu.gp import bigfit

    n, nx = 48, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + 0.01 * rng.normal(size=n)
    rvpack, nlp = bigfit.make_mixed_objective(
        jnp.asarray(X), jnp.asarray(y), kerns=("RBF",), noise=True,
        jitter=1e-6, block=48)
    data = nuts.sample_rvpack(
        rvpack, nlp, draws=20, tune=20, chains=4, sampler="hmc_host",
        max_treedepth=3, random_seed=5, vec="map")
    assert data.posterior["l"].shape == (4, 20, nx)
    assert np.isfinite(data.sample_stats["lp"]).all()

    # dispatch pin: sample_model chooses vec='map' above n=8192 on TPU
    from andvaranaut_tpu import _config
    from andvaranaut_tpu.gp import engine
    from andvaranaut_tpu.lhc import _none_conrev

    seen = {}

    def spy(rvpack, nlp, **kw):
        seen["vec"] = kw.get("vec")
        raise RuntimeError("stop")

    monkeypatch.setattr(nuts, "sample_rvpack", spy)
    monkeypatch.setattr(_config, "is_tpu", lambda: True)

    def cfg_of(m):
        Xm = rng.uniform(size=(m, 2))
        ym = np.sin(3 * Xm[:, 0]).reshape(-1, 1)
        return engine.FitConfig(
            kerns=("RBF",), ops=(), noise=True, truncate=False,
            jitter=1e-6, iwgp=False, cwgp=False, priors=[None, None],
            xconrevs=[_none_conrev(), _none_conrev()],
            yconrevs=[_none_conrev()], x=Xm, y=ym)

    with pytest.raises(RuntimeError, match="stop"):
        nuts.sample_model(cfg_of(8193), draws=2, tune=2, mixed=True)
    assert seen["vec"] == "map"
    with pytest.raises(RuntimeError, match="stop"):
        nuts.sample_model(cfg_of(64), draws=2, tune=2, mixed=True)
    assert seen["vec"] == "vmap"


def test_map_diag_inv_mass_batched_matches_serial():
    """The batched curvature-mass prober (chunks of `lanes` probes per
    launch, padded last launch) must agree exactly with the serial
    estimator — it exists so a warm-start batched MCMC run never
    compiles the serial program."""
    from andvaranaut_tpu.inference import host_hmc

    hdiag = np.asarray([400.0, 25.0, 4.0, 0.25, 1e-9])

    def u_vg(z):
        z = np.asarray(z)
        return 0.5 * float(np.sum(hdiag * z * z)), hdiag * z

    calls = {"n": 0}

    def vec_eval(Z):
        calls["n"] += 1
        Z = np.asarray(Z)
        assert Z.shape[0] == 4  # every launch carries `lanes` rows
        return (0.5 * np.sum(hdiag * Z * Z, axis=1), hdiag * Z)

    im_serial = host_hmc.map_diag_inv_mass(u_vg, np.zeros(5))
    im_batched = host_hmc.map_diag_inv_mass_batched(
        vec_eval, np.zeros(5), lanes=4)
    np.testing.assert_allclose(im_batched, im_serial, rtol=1e-12)
    assert calls["n"] == 3  # ceil(2*5/4)


def test_sample_rvpack_warm_start_batched_no_serial_compile(
        rng, monkeypatch):
    """sample_model(start=..., chains>=2): the curvature probes and the
    run itself go through the batched program only — the serial
    objective is never evaluated."""
    from andvaranaut_tpu.gp import engine
    from andvaranaut_tpu.inference import host_hmc
    from andvaranaut_tpu.lhc import _none_conrev

    n, nx = 32, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + 0.1 * rng.normal(size=n)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None] * nx,
        xconrevs=[_none_conrev()] * nx, yconrevs=[_none_conrev()],
        x=X, y=y.reshape(-1, 1))

    seen = {}
    real = host_hmc.hmc_host_sample

    def spy(fn, z0, **kw):
        def poisoned(z):
            raise AssertionError("serial objective was called")

        seen["vec"] = kw.get("vec_eval") is not None
        seen["im0"] = kw.get("inv_mass0")
        return real(poisoned, z0, **kw)

    monkeypatch.setattr(host_hmc, "hmc_host_sample", spy)
    nuts.sample_model(
        cfg, draws=4, tune=4, chains=2, sampler="hmc_host",
        mixed=False, start={"gv": 0.01, "l": [1.0, 1.0], "kv": 1.0})
    assert seen["vec"] is True
    assert seen["im0"] is not None and np.isfinite(seen["im0"]).all()


def test_hmc_host_pilot_two_stage():
    """pilot=N: a pilot phase feeds draws_inv_mass, then the main run
    samples with the mass FIXED and chains re-seeded at the pilot's
    best-lp draw — the large-n recipe where in-warmup Welford fails.
    The ill-scaled Gaussian must come out whitened despite a warmup
    far too short for Welford."""
    from andvaranaut_tpu.inference import host_hmc

    scales = np.asarray([0.05, 1.0, 5.0])
    res = host_hmc.hmc_host_sample(
        None, np.zeros(3), num_warmup=30, num_samples=900,
        num_chains=4, budget=16, seed=9, jitter_init=0.1,
        pilot=80, vec_eval=_batched_gaussian(scales))
    z = res["z"].reshape(-1, 3)
    np.testing.assert_allclose(z.std(axis=0), scales, rtol=0.2)
    assert res["accept"].mean() > 0.5


def test_sample_rvpack_pilot_plumbs(rng, monkeypatch):
    """sample_model(pilot=...) reaches hmc_host_sample."""
    from andvaranaut_tpu.gp import engine
    from andvaranaut_tpu.inference import host_hmc
    from andvaranaut_tpu.lhc import _none_conrev

    n, nx = 24, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]).reshape(-1, 1)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None] * nx,
        xconrevs=[_none_conrev()] * nx, yconrevs=[_none_conrev()],
        x=X, y=y)

    seen = {}
    real = host_hmc.hmc_host_sample

    def spy(fn, z0, **kw):
        # the pilot stage re-enters hmc_host_sample (without pilot=);
        # record the OUTER call only
        seen.setdefault("pilot", kw.get("pilot"))
        return real(fn, z0, **kw)

    monkeypatch.setattr(host_hmc, "hmc_host_sample", spy)
    nuts.sample_model(cfg, draws=4, tune=4, chains=2, pilot=6,
                      sampler="hmc_host", mixed=False)
    assert seen["pilot"] == 6


def _corr_gaussian(scales, rho):
    """U and vec-eval for a correlated Gaussian with marginal stds
    `scales` and uniform correlation rho between all pairs."""
    scales = np.asarray(scales)
    dim = scales.size
    C = (np.full((dim, dim), rho) + (1 - rho) * np.eye(dim))
    cov = np.outer(scales, scales) * C
    prec = np.linalg.inv(cov)

    def vec_eval(Z):
        Z = np.asarray(Z)
        return (0.5 * np.einsum("ci,ij,cj->c", Z, prec, Z),
                Z @ prec)

    return cov, vec_eval


def test_dense_mass_correlated_gaussian():
    """A DenseMass at the true covariance whitens a strongly
    correlated, ill-scaled Gaussian: correct marginals AND
    correlations with good acceptance at a short warmup — the regime
    where the diagonal mass random-walks (the measured 16k failure)."""
    from andvaranaut_tpu.inference import host_hmc

    scales = np.asarray([0.03, 1.0, 4.0])
    cov, vec_eval = _corr_gaussian(scales, 0.8)
    res = host_hmc.hmc_host_sample(
        None, np.zeros(3), num_warmup=40, num_samples=1200,
        num_chains=4, budget=16, seed=3, jitter_init=0.02,
        inv_mass0=host_hmc.DenseMass(cov), adapt_mass=False,
        vec_eval=vec_eval)
    z = res["z"].reshape(-1, 3)
    np.testing.assert_allclose(z.std(axis=0), scales, rtol=0.2)
    corr = np.corrcoef(z.T)
    np.testing.assert_allclose(corr[0, 1], 0.8, atol=0.1)
    np.testing.assert_allclose(corr[1, 2], 0.8, atol=0.1)
    assert res["accept"].mean() > 0.6


def test_dense_mass_serial_path():
    """The serial (unbatched) sampler takes a DenseMass too."""
    from andvaranaut_tpu.inference import host_hmc

    scales = np.asarray([0.1, 2.0])
    cov, vec_eval = _corr_gaussian(scales, 0.9)

    def u_vg(z):
        us, gs = vec_eval(np.asarray(z)[None, :])
        return float(us[0]), gs[0]

    res = host_hmc.hmc_host_sample(
        u_vg, np.zeros(2), num_warmup=40, num_samples=1500,
        num_chains=1, budget=16, seed=5, jitter_init=0.02,
        inv_mass0=host_hmc.DenseMass(cov), adapt_mass=False)
    z = res["z"].reshape(-1, 2)
    np.testing.assert_allclose(z.std(axis=0), scales, rtol=0.2)
    assert abs(np.corrcoef(z.T)[0, 1] - 0.9) < 0.08


def test_draws_dense_mass_estimator(rng):
    """draws_dense_mass recovers the sample covariance from pilot
    draws of any leading shape."""
    from andvaranaut_tpu.inference import host_hmc

    cov = np.array([[1.0, 0.6], [0.6, 2.0]])
    L = np.linalg.cholesky(cov)
    draws = rng.standard_normal((4, 800, 2)) @ L.T
    dm = host_hmc.draws_dense_mass(draws)
    np.testing.assert_allclose(dm.cov, cov, atol=0.15)
    # momentum draws have covariance cov^-1; velocities = cov @ r
    r = dm.draw(np.random.default_rng(0), 4000)
    np.testing.assert_allclose(np.cov(r.T), np.linalg.inv(cov),
                               atol=0.15)
    np.testing.assert_allclose(dm.vel(r[:3]), r[:3] @ dm.cov)


def test_pilot_two_stage_dense_correlated():
    """The pilot schedule now feeds a DENSE mass: a correlated
    Gaussian that defeats diagonal whitening comes out correct."""
    from andvaranaut_tpu.inference import host_hmc

    scales = np.asarray([0.5, 1.0])
    cov, vec_eval = _corr_gaussian(scales, 0.9)
    res = host_hmc.hmc_host_sample(
        None, np.zeros(2), num_warmup=30, num_samples=1200,
        num_chains=4, budget=16, seed=11, jitter_init=0.1,
        pilot=100, vec_eval=vec_eval)
    z = res["z"].reshape(-1, 2)
    np.testing.assert_allclose(z.std(axis=0), scales, rtol=0.2)
    assert abs(np.corrcoef(z.T)[0, 1] - 0.9) < 0.1


def test_trajectory_eps_backoff():
    """The full-trajectory eps backoff halves a step size that is
    1-leapfrog-stable but loses acceptance over an L-step trajectory,
    and leaves a safe step size untouched."""
    from andvaranaut_tpu.inference import host_hmc

    dim, C = 4, 4
    vec_eval = _batched_gaussian(np.ones(dim))
    Z = np.random.default_rng(0).standard_normal((C, dim)) * 0.3
    us, gs = vec_eval(Z)
    IM = np.ones((C, dim))
    rng = np.random.default_rng(1)
    big = np.full(C, 1.9)  # near the leapfrog stability limit
    out = host_hmc._trajectory_eps_backoff(
        vec_eval, Z, us, gs, IM, rng, big.copy(), nleap=16)
    assert (out < big).all()
    small = np.full(C, 0.3)
    out2 = host_hmc._trajectory_eps_backoff(
        vec_eval, Z, us, gs, IM, np.random.default_rng(2),
        small.copy(), nleap=16)
    np.testing.assert_allclose(out2, small)


def test_batched_fixed_mass_uses_backoff(monkeypatch):
    """Fixed-mass batched runs route their initial eps through the
    trajectory backoff (eps0=None, adapt_mass=False)."""
    from andvaranaut_tpu.inference import host_hmc

    called = {}
    real = host_hmc._trajectory_eps_backoff

    def spy(*a, **kw):
        called["yes"] = True
        return real(*a, **kw)

    monkeypatch.setattr(host_hmc, "_trajectory_eps_backoff", spy)
    scales = np.asarray([0.5, 2.0])
    host_hmc.hmc_host_sample(
        None, np.zeros(2), num_warmup=10, num_samples=10,
        num_chains=4, budget=8, seed=1, inv_mass0=scales ** 2,
        adapt_mass=False, vec_eval=_batched_gaussian(scales))
    assert called.get("yes")


def _batched_bimodal(a=4.0, s=0.5):
    """U = -log( 0.5 N(-a, s^2) + 0.5 N(+a, s^2) ), 1-D, batched over
    lanes: a 2*(a/s)^2/2-nat inter-mode barrier that short-trajectory
    HMC cannot cross at beta=1."""

    def vec_eval(Z):
        Z = np.asarray(Z)
        z = Z[:, 0]
        e_p = -0.5 * ((z - a) / s) ** 2
        e_m = -0.5 * ((z + a) / s) ** 2
        m = np.maximum(e_p, e_m)
        lse = m + np.log(np.exp(e_p - m) + np.exp(e_m - m))
        u = -lse
        w_p = np.exp(e_p - lse)
        w_m = 1.0 - w_p
        g = (w_p * (z - a) + w_m * (z + a)) / s ** 2
        return u, g[:, None]

    return vec_eval


def test_hmc_host_temper_gaussian_parity():
    """Tempering must not bias a unimodal posterior: 2 cold + 2 hot
    lanes on a standard normal return ONLY the 2 cold chains, match
    N(0, 1), and record healthy ladder swap rates (a Gaussian ladder
    at beta >= 0.5 overlaps strongly)."""
    from andvaranaut_tpu.inference import host_hmc

    dim = 2
    res = host_hmc.hmc_host_sample(
        None, np.zeros(dim), num_warmup=400, num_samples=800,
        num_chains=4, budget=16, seed=11,
        vec_eval=_batched_gaussian(np.ones(dim)),
        betas=np.asarray([1.0, 1.0, 0.7, 0.5]))
    z = res["z"]
    assert z.shape == (2, 800, dim)  # cold lanes only
    assert abs(z.mean()) < 0.12
    np.testing.assert_allclose(z.reshape(-1, dim).std(axis=0),
                               np.ones(dim), atol=0.15)
    np.testing.assert_allclose(res["betas"],
                               [1.0, 1.0, 0.7, 0.5])
    assert res["swap_accept"].shape == (2,)
    assert (res["swap_accept"] > 0.3).all()


def test_hmc_host_temper_bimodal_mixing():
    """The tempering money test: chains started in ONE mode of a
    well-separated bimodal target.  Plain lockstep HMC stays pinned
    (the measured 16k between-chain-exchange failure mode in
    miniature); the tempered ladder's hot lanes cross the barrier and
    the free swap moves carry both modes into the cold chains at
    ~equal weight."""
    from andvaranaut_tpu.inference import host_hmc

    vec_eval = _batched_bimodal(a=4.0, s=0.5)
    kw = dict(num_warmup=300, num_samples=700, budget=8, seed=7,
              jitter_init=0.3, adapt_mass=False,
              inv_mass0=np.asarray([0.25]))
    plain = host_hmc.hmc_host_sample(
        None, np.asarray([4.0]), num_chains=4, vec_eval=vec_eval,
        **kw)
    # all plain chains remain in the start mode
    assert (plain["z"] > 0).mean() > 0.99
    temp = host_hmc.hmc_host_sample(
        None, np.asarray([4.0]), num_chains=6, vec_eval=vec_eval,
        betas=np.asarray([1.0, 1.0, 0.55, 0.3, 0.17, 0.09]), **kw)
    z = temp["z"]
    assert z.shape[0] == 2  # cold chains only
    neg_frac = (z < 0).mean()
    assert 0.25 < neg_frac < 0.75  # both modes, ~equal weight
    # each cold chain individually visits both modes (the swaps reach
    # every cold lane via the rotating junction)
    for c in range(2):
        assert 0.1 < (z[c] < 0).mean() < 0.9
    # ladder = rotating cold junction + 4 hot slots -> 4 edges
    assert temp["swap_accept"].shape == (4,)


def test_hmc_host_temper_validation():
    """Tempering misuse fails fast: no vec_eval, wrong length, betas
    out of range, no cold lane."""
    import pytest

    from andvaranaut_tpu.inference import host_hmc

    vec_eval = _batched_gaussian(np.ones(2))
    kw = dict(num_warmup=4, num_samples=4, budget=4, seed=0)
    with pytest.raises(ValueError, match="batched"):
        host_hmc.hmc_host_sample(
            None, np.zeros(2), num_chains=2,
            betas=np.asarray([1.0, 0.5]), **kw)
    with pytest.raises(ValueError, match="one entry per lane"):
        host_hmc.hmc_host_sample(
            None, np.zeros(2), num_chains=3, vec_eval=vec_eval,
            betas=np.asarray([1.0, 0.5]), **kw)
    with pytest.raises(ValueError, match="lie in"):
        host_hmc.hmc_host_sample(
            None, np.zeros(2), num_chains=2, vec_eval=vec_eval,
            betas=np.asarray([1.0, 1.5]), **kw)
    with pytest.raises(ValueError, match="cold lane"):
        host_hmc.hmc_host_sample(
            None, np.zeros(2), num_chains=2, vec_eval=vec_eval,
            betas=np.asarray([0.5, 0.25]), **kw)


def test_sample_rvpack_temper_gp(rng):
    """temper= through the public sample_rvpack facade: `chains` cold
    chains come back (hot lanes are internal), on a real GP
    hyperposterior through the mixed objective."""
    from andvaranaut_tpu.gp import bigfit

    n, nx = 48, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + 0.01 * rng.normal(size=n)
    rvpack, nlp = bigfit.make_mixed_objective(
        jnp.asarray(X), jnp.asarray(y), kerns=("RBF",), noise=True,
        jitter=1e-6, block=48)
    data = nuts.sample_rvpack(
        rvpack, nlp, draws=20, tune=20, chains=2, sampler="hmc_host",
        max_treedepth=3, random_seed=5, temper=2, beta_min=0.4)
    post = data.posterior
    assert post["l"].shape == (2, 20, nx)
    assert np.isfinite(data.sample_stats["lp"]).all()
    import pytest

    with pytest.raises(ValueError, match="batched"):
        nuts.sample_rvpack(
            rvpack, nlp, draws=4, tune=4, chains=2,
            sampler="hmc_host", max_treedepth=3, temper=2, vec="0")


def test_hmc_host_temper_pilot_two_stage():
    """temper + pilot compose: the pilot stage runs tempered too
    (same lanes -> one compiled batched program for the whole run),
    its dense mass comes from COLD draws only, and the main stage
    returns cold chains."""
    from andvaranaut_tpu.inference import host_hmc

    scales = np.asarray([0.5, 2.0])
    res = host_hmc.hmc_host_sample(
        None, np.zeros(2), num_warmup=30, num_samples=60,
        num_chains=4, budget=8, seed=3,
        vec_eval=_batched_gaussian(scales),
        betas=np.asarray([1.0, 1.0, 0.6, 0.36]), pilot=40)
    assert res["z"].shape == (2, 60, 2)
    assert np.isfinite(res["lp"]).all()
    assert (res["swap_accept"] > 0.2).all()


def test_sample_model_temper_passthrough(rng, monkeypatch):
    """sample_model forwards temper/beta_min to sample_rvpack."""
    from andvaranaut_tpu.gp import engine
    from andvaranaut_tpu.lhc import _none_conrev

    seen = {}

    def spy(rvpack, nlp, **kw):
        seen.update(kw)
        raise RuntimeError("stop")

    monkeypatch.setattr(nuts, "sample_rvpack", spy)
    X = rng.uniform(size=(24, 2))
    y = np.sin(3 * X[:, 0]).reshape(-1, 1)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False,
        jitter=1e-6, iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="stop"):
        nuts.sample_model(cfg, draws=2, tune=2, temper=3,
                          beta_min=0.2, mixed=True)
    assert seen["temper"] == 3 and seen["beta_min"] == 0.2
