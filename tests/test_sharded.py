"""Mesh-distributed NLML / Cholesky tests on the 8-virtual-device CPU mesh.

Round-2 coverage for gp/sharded.py (previously untested): the distributed
block-row Cholesky must agree with the single-device dense path to f64
round-off, including gradients and padded (mesh-indivisible) N.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from andvaranaut_tpu.gp import engine, kernels, sharded


def _toy(n, nx=2, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, nx)))
    y = jnp.asarray(np.sin(3 * np.asarray(X[:, 0])) + 0.1 * np.asarray(X).sum(1))
    return X, y


def _dense_nlp(z, X, y, rvpack, kerns, ops, noise, jitter):
    vals = rvpack.unpack(z)
    gv = vals["gv"][0] if noise else 0.0
    alpha = vals["alpha"][0] if "alpha" in vals else None
    K = kernels.gram(kerns, ops, X, None, vals["l"], vals["kv"], alpha)
    K = K + jnp.eye(X.shape[0], dtype=X.dtype) * (jitter + gv)
    return -(engine.chol_nlml(K, y) + rvpack.log_prior(z))


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provision 8 CPU devices"
    return sharded.data_mesh(jax.devices()[:8])


@pytest.mark.parametrize("kernel,noise", [
    ("RBF", True),
    ("Matern52+RBF", True),
    ("RatQuad", False),
])
def test_sharded_nlml_matches_dense(mesh, kernel, noise):
    kerns, ops = kernels.parse_kernel(kernel)
    X, y = _toy(48)
    build_rvpack, nlp = sharded.make_sharded_nlml(
        mesh, kerns, ops, noise, 1e-6)
    rvpack = build_rvpack(X.shape[1])
    z = rvpack.z0() + 0.1
    got = float(nlp(z, X, y, rvpack))
    want = float(_dense_nlp(z, X, y, rvpack, kerns, ops, noise, 1e-6))
    assert got == pytest.approx(want, rel=1e-10)


def test_sharded_nlml_grad_matches_dense(mesh):
    kerns, ops = ("RBF",), ()
    X, y = _toy(48)
    build_rvpack, nlp = sharded.make_sharded_nlml(
        mesh, kerns, ops, True, 1e-6)
    rvpack = build_rvpack(X.shape[1])
    z = rvpack.z0() + 0.05
    g_sh = jax.grad(lambda zz: nlp(zz, X, y, rvpack))(z)
    g_de = jax.grad(
        lambda zz: _dense_nlp(zz, X, y, rvpack, kerns, ops, True, 1e-6))(z)
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_de), rtol=1e-8, atol=1e-10)


def test_sharded_nlml_padded_n(mesh):
    """N not divisible by the mesh size: phantom identity rows must leave
    the NLML exactly that of the real rows."""
    kerns, ops = ("RBF",), ()
    X, y = _toy(43)  # 43 % 8 != 0
    build_rvpack, nlp = sharded.make_sharded_nlml(
        mesh, kerns, ops, True, 1e-6)
    rvpack = build_rvpack(X.shape[1])
    z = rvpack.z0() - 0.2
    got = float(nlp(z, X, y, rvpack))
    want = float(_dense_nlp(z, X, y, rvpack, kerns, ops, True, 1e-6))
    assert got == pytest.approx(want, rel=1e-10)


@pytest.mark.parametrize("kernel,noise,n,C", [
    ("RBF", True, 64, 2),
    ("Matern52+RBF", True, 64, 2),
    ("RBF", True, 43, 2),   # grain-indivisible N (pad to D*C)
])
def test_sharded_nlml_cyclic_matches_dense(mesh, kernel, noise, n, C):
    """Block-cyclic layout with statically-shrinking trailing updates:
    value AND gradient must match the dense single-device path.

    C=2 (16 unrolled SPMD steps): reverse-mode through the cyclic
    factorisation's per-step DISTINCT shapes (the static shrink defeats
    loop sharing) makes the compile graph O(steps); the old C=4 params
    (32 steps) took tens of minutes of XLA:CPU compile inside the full
    suite on this 1-core host.  C=4 value-only coverage below."""
    kerns, ops = kernels.parse_kernel(kernel)
    X, y = _toy(n)
    build_rvpack, nlp = sharded.make_sharded_nlml(
        mesh, kerns, ops, noise, 1e-6, layout="cyclic", cyc_blocks=C)
    rvpack = build_rvpack(X.shape[1])
    z = rvpack.z0() + 0.1
    got = float(nlp(z, X, y, rvpack))
    want = float(_dense_nlp(z, X, y, rvpack, kerns, ops, noise, 1e-6))
    assert got == pytest.approx(want, rel=1e-10)
    g_sh = jax.grad(lambda zz: nlp(zz, X, y, rvpack))(z)
    g_de = jax.grad(
        lambda zz: _dense_nlp(zz, X, y, rvpack, kerns, ops, noise,
                              1e-6))(z)
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_de), rtol=1e-8, atol=1e-10)


def test_sharded_nlml_cyclic_c4_value(mesh):
    """C=4 (four static shrink points over 32 steps), value-only: pins
    the multi-drop slot bookkeeping without the 32-step reverse-mode
    compile blow-up."""
    kerns, ops = kernels.parse_kernel("RBF")
    X, y = _toy(48)
    build_rvpack, nlp = sharded.make_sharded_nlml(
        mesh, kerns, ops, True, 1e-6, layout="cyclic", cyc_blocks=4)
    rvpack = build_rvpack(X.shape[1])
    z = rvpack.z0() + 0.1
    got = float(nlp(z, X, y, rvpack))
    want = float(_dense_nlp(z, X, y, rvpack, kerns, ops, True, 1e-6))
    assert got == pytest.approx(want, rel=1e-10)


def test_sharded_nlml_jit_and_sharded_inputs(mesh):
    """The objective must compile under jit with device-put row-sharded
    inputs (the dryrun path) and agree with the eager value."""
    kerns, ops = ("RBF",), ()
    X, y = _toy(64)
    Xs, ys = sharded.shard_data(mesh, X, y)
    build_rvpack, nlp = sharded.make_sharded_nlml(
        mesh, kerns, ops, True, 1e-6)
    rvpack = build_rvpack(X.shape[1])
    z = rvpack.z0()
    step = jax.jit(jax.value_and_grad(lambda zz: nlp(zz, Xs, ys, rvpack)))
    val, grad = step(z)
    want = float(_dense_nlp(z, X, y, rvpack, kerns, ops, True, 1e-6))
    assert float(val) == pytest.approx(want, rel=1e-10)
    assert np.isfinite(np.asarray(grad)).all()


@pytest.mark.parametrize("kernel,noise,n", [
    ("RBF", True, 96),
    ("Matern52+RBF", True, 64),
])
def test_sharded_closed_form_value_grad(mesh, kernel, noise, n):
    """The distributed closed-form value-and-grad pipeline (factorise,
    L^-1 broadcast pipeline, K^-1 reduce-scatter, gradient contraction)
    must match the single-device bigfit closed form."""
    from andvaranaut_tpu.gp import bigfit

    kerns, ops = kernels.parse_kernel(kernel)
    X, y = _toy(n)
    rvpack, nlp, vg = sharded.make_sharded_mixed_objective(
        mesh, X, y, kerns=kerns, ops=ops, noise=noise, block=32)
    z = rvpack.z0() + 0.1
    val_s, g_s = vg(z)
    val_b, g_b = bigfit.nlml_value_and_grad(
        jnp.asarray(X, jnp.float64), jnp.asarray(y, jnp.float64), z,
        kerns=kerns, ops=ops, noise=noise, block=32)
    np.testing.assert_allclose(float(val_s), float(val_b), rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_b), rtol=5e-6, atol=1e-8)
    # neg_log_post custom_vjp agrees with (value + prior) and its grad
    v, g = jax.value_and_grad(nlp)(z)
    assert float(v) == pytest.approx(
        -(float(val_b) + float(rvpack.log_prior(z))), rel=1e-7)
    np.testing.assert_allclose(
        np.asarray(g),
        -(np.asarray(g_b)
          + np.asarray(jax.grad(rvpack.log_prior)(z))),
        rtol=5e-6, atol=1e-8)


def test_sharded_closed_form_padded_n(mesh):
    """Mesh-indivisible N through the closed-form pipeline: phantom rows
    must not perturb value or gradient."""
    from andvaranaut_tpu.gp import bigfit

    X, y = _toy(53)  # 53 % 8 != 0
    rvpack, _, vg = sharded.make_sharded_mixed_objective(
        mesh, X, y, block=32)
    z = rvpack.z0() - 0.15
    val_s, g_s = vg(z)
    val_b, g_b = bigfit.nlml_value_and_grad(
        jnp.asarray(X, jnp.float64), jnp.asarray(y, jnp.float64), z,
        block=32)
    np.testing.assert_allclose(float(val_s), float(val_b), rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_b), rtol=1e-6, atol=1e-8)


def test_sharded_big_map_fit(mesh):
    """Distributed closed-form MAP fit lands on the single-device
    big_map_fit optimum."""
    from andvaranaut_tpu.gp import bigfit

    rng = np.random.default_rng(3)
    n, nx = 64, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.05 * rng.normal(size=n)

    hypers_s, logpost_s = sharded.sharded_big_map_fit(
        X, y, mesh=mesh, block=32, maxiter=100)
    hypers_b, logpost_b = bigfit.big_map_fit(
        X, y, block=32, maxiter=100)
    assert logpost_s == pytest.approx(logpost_b, rel=1e-4, abs=1e-3)
    np.testing.assert_allclose(hypers_s["l"], hypers_b["l"], rtol=5e-2)


@pytest.mark.parametrize("mixed,n,kernel", [
    (False, 96, "RBF"),
    (True, 96, "RBF"),
    (True, 53, "RBF"),          # mesh-indivisible N
    (True, 64, "Matern52+RBF"),
])
def test_sharded_predict_matches_dense(mesh, mixed, n, kernel):
    """Distributed prediction (sharded conditioning state + distributed
    cross-Gram solves) must match the single-device dense predict."""
    kerns, ops = kernels.parse_kernel(kernel)
    X, y = _toy(n)
    nkern = len(kerns)
    hypers = {"l": np.tile([0.4, 0.7], nkern), "kv": np.full(nkern, 1.3),
              "gv": np.array(1e-3)}
    predict = sharded.make_sharded_predict(
        mesh, np.asarray(X), np.asarray(y), hypers, kerns=kerns, ops=ops,
        block=32, mixed=mixed, qbucket=16)
    rng = np.random.default_rng(5)
    Xq = rng.uniform(size=(23, 2))
    mu, var = predict(Xq)
    l, kv, gv, al = engine.hypers_to_args(hypers, True)
    mu0, var0 = engine.predict_diag(
        kerns, ops, jnp.asarray(X), jnp.asarray(y), jnp.asarray(Xq), l, kv,
        gv, al, 1e-6)
    mtol = 1e-8 if not mixed else 1e-7
    vtol = 1e-8 if not mixed else 1e-4
    np.testing.assert_allclose(mu, np.asarray(mu0), rtol=mtol, atol=1e-10)
    np.testing.assert_allclose(var, np.asarray(var0), rtol=vtol,
                               atol=1e-10)


def test_sharded_map_fit_recovers_hypers(mesh):
    """End-to-end distributed MAP fit: must match the single-device engine
    fit on the same data to optimiser tolerance."""
    rng = np.random.default_rng(7)
    n, nx = 64, 2
    X = rng.uniform(size=(n, nx))
    l_true = np.array([0.4, 0.8])
    K = np.exp(-0.5 * (
        ((X[:, None, :] - X[None, :, :]) / l_true) ** 2).sum(-1))
    y = np.linalg.cholesky(K + 1e-8 * np.eye(n)) @ rng.normal(size=n)

    hypers, logpost, niter = sharded.sharded_map_fit(
        X, y, mesh=mesh, max_iter=300)
    assert np.isfinite(logpost)

    # single-device dense fit for comparison
    from andvaranaut_tpu.lhc import _none_conrev

    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None] * nx,
        xconrevs=[_none_conrev()] * nx, yconrevs=[_none_conrev()],
        x=X, y=y.reshape(-1, 1))
    hypers_d, logpost_d = engine.map_fit(cfg)
    assert logpost == pytest.approx(logpost_d, rel=1e-4, abs=1e-3)
    np.testing.assert_allclose(hypers["l"], hypers_d["l"], rtol=2e-2)


def _warped_cfg(n=44, iwgp=False, cwgp=False, kernel="RBF", seed=3):
    import andvaranaut_tpu.transform as tf
    from andvaranaut_tpu import dists
    from andvaranaut_tpu.lhc import _none_conrev

    rng = np.random.default_rng(seed)
    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    X = np.stack([rng.uniform(0.0, 2.0, n), rng.uniform(1.0, 1.5, n)],
                 axis=1)
    y = (X[:, 0] ** 2 - X[:, 0] - X[:, 1] ** 2 * X[:, 0] + X[:, 1]
         + 0.01 * rng.normal(size=n)).reshape(-1, 1)
    if iwgp:
        xconrevs = [
            tf.wgp(["uniform", "kumaraswamy"], np.array([1.0, 1.0]),
                   y=None, xdist=priors[0]),
            tf.uniform(priors[1])]
    else:
        xconrevs = [tf.uniform(priors[0]), tf.uniform(priors[1])]
    if cwgp:
        yconrevs = [tf.wgp(["meanstd", "sinharcsinh"],
                           np.array([0.0, 1.0]), y=y[:, 0])]
    else:
        yconrevs = [_none_conrev()]
    kerns, ops = kernels.parse_kernel(kernel)
    return engine.FitConfig(
        kerns=kerns, ops=ops, noise=True, truncate=False, jitter=1e-6,
        iwgp=iwgp, cwgp=cwgp, priors=priors, xconrevs=xconrevs,
        yconrevs=yconrevs, x=X, y=y)


@pytest.mark.parametrize("iwgp,cwgp,n", [
    (False, True, 48),   # divisible by D=8
    (True, False, 48),
    (True, True, 44),    # padded (8 does not divide 44)
])
def test_sharded_warped_vg_matches_autodiff(mesh, iwgp, cwgp, n):
    """Distributed warped value+grad (make_sharded_warped_objective)
    vs the f64 autodiff objective (engine.build_objective) — the
    multi-chip route for the flagship warped large-N fit (reference
    gpmcmc.py:211-277 has no N-scaling at all)."""
    cfg = _warped_cfg(n=n, iwgp=iwgp, cwgp=cwgp)
    rvpack, _, vg = sharded.make_sharded_warped_objective(
        mesh, cfg, block=32)
    rv2, nlp = engine.build_objective(cfg)
    assert rvpack.total == rv2.total
    rng = np.random.default_rng(1)
    z = jnp.asarray(np.asarray(rvpack.z0())
                    + 0.05 * rng.standard_normal(rvpack.total))
    v, g = vg(z)
    nlp_dist = -(float(v) + float(rvpack.log_prior(z)))
    nlp_ref = float(nlp(z))
    assert abs(nlp_dist - nlp_ref) < 1e-6 * max(1.0, abs(nlp_ref))
    g_ref = np.asarray(jax.grad(nlp)(z))
    g_dist = -(np.asarray(g)
               + np.asarray(jax.grad(rvpack.log_prior)(z)))
    np.testing.assert_allclose(g_dist, g_ref, rtol=2e-4, atol=2e-5)


def test_sharded_warped_neg_log_post_custom_vjp(mesh):
    """The distributed warped neg_log_post exposes gradients through
    its custom vjp (the host L-BFGS / MCMC contract)."""
    cfg = _warped_cfg(n=40, cwgp=True)
    rvpack, nlp, vg = sharded.make_sharded_warped_objective(
        mesh, cfg, block=32)
    z = jnp.asarray(np.asarray(rvpack.z0()) + 0.03)
    val, grad = jax.value_and_grad(nlp)(z)
    v2, g2 = vg(z)
    lp, gp_ = jax.value_and_grad(rvpack.log_prior)(z)
    assert float(val) == pytest.approx(-(float(v2) + float(lp)),
                                       rel=1e-12)
    np.testing.assert_allclose(
        np.asarray(grad), -(np.asarray(g2) + np.asarray(gp_)),
        rtol=1e-10, atol=1e-12)


def test_sharded_big_warped_map_fit(mesh):
    """End-to-end distributed warped MAP fit improves the posterior and
    returns the full hyper + warp-parameter menu."""
    cfg = _warped_cfg(n=48, cwgp=True)
    hypers, logp = sharded.sharded_big_warped_map_fit(
        cfg, block=32, maxiter=12, mesh=mesh)
    assert {"gv", "l", "kv", "cwgp", "cwgp_pos"} <= set(hypers)
    rvpack, nlp, _ = sharded.make_sharded_warped_objective(
        mesh, cfg, block=32)
    assert logp > -float(nlp(jnp.asarray(rvpack.z0())))


def test_sample_model_mesh_mcmc(mesh):
    """Multi-chip MCMC: sample_model(mesh=...) drives the host
    integrator's value+grad through the row-sharded closed-form
    pipeline — posterior recovery on the 8-device mesh, 2 lockstep
    chains (round-4 VERDICT gap #3: the 16k MCMC path was
    single-chip only)."""
    from andvaranaut_tpu.inference import nuts
    from andvaranaut_tpu.lhc import _none_conrev

    rng = np.random.default_rng(0)
    n, nx = 48, 2
    X = rng.uniform(size=(n, nx))
    y = (np.sin(3 * X[:, 0]) + 0.05 * rng.normal(size=n)).reshape(-1, 1)
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False,
        jitter=1e-6, iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y)
    data = nuts.sample_model(cfg, draws=30, tune=30, chains=2,
                             mesh=mesh, random_seed=1,
                             max_treedepth=3)
    post = data.posterior
    assert post["l"].shape == (2, 30, nx)
    assert np.isfinite(np.asarray(data.sample_stats["lp"])).all()
    assert np.unique(post["kv"]).size > 5
    assert (post["gv"] > 0).all()
    # the sharded objective's lp agrees with the dense objective at a
    # recorded draw (value parity through the whole mesh pipeline)
    rvp, nlp_dense = engine.build_objective(cfg)
    import andvaranaut_tpu.inference.unconstrained  # noqa: F401
    zdraw = {k: np.asarray(v)[0, -1] for k, v in post.items()}
    z = jnp.asarray(rvp.pack_values(
        {"gv": float(zdraw["gv"]), "l": zdraw["l"],
         "kv": float(zdraw["kv"])}))
    lp_dense = -float(nlp_dense(z))
    lp_mesh = float(np.asarray(data.sample_stats["lp"])[0, -1])
    assert abs(lp_dense - lp_mesh) < 1e-6 * max(1.0, abs(lp_dense))
