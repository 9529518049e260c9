"""Pallas Gram kernel parity vs the jnp reference implementation
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from andvaranaut_tpu.gp import kernels, pallas_ops


@pytest.mark.parametrize("name", kernels.KERNEL_NAMES)
def test_pallas_gram_parity(name, rng):
    n, m, d = 70, 45, 3
    X = rng.normal(size=(n, d))
    Y = rng.normal(size=(m, d))
    ls = np.array([0.7, 1.3, 0.9])
    ours = np.asarray(pallas_ops.gram_component(
        name, jnp.asarray(X), jnp.asarray(Y), jnp.asarray(ls), alpha=1.7))
    ref = np.asarray(kernels.base_kernel(
        name, jnp.asarray(X), jnp.asarray(Y), jnp.asarray(ls), alpha=1.7))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_pallas_gram_f32(rng):
    X = rng.normal(size=(33, 2)).astype(np.float32)
    ls = np.array([0.5, 0.5], dtype=np.float32)
    ours = np.asarray(pallas_ops.gram_component(
        "RBF", jnp.asarray(X), jnp.asarray(X), jnp.asarray(ls)))
    ref = np.asarray(kernels.base_kernel(
        "RBF", jnp.asarray(X.astype(np.float64)),
        jnp.asarray(X.astype(np.float64)), jnp.asarray(ls.astype(np.float64))))
    assert ours.dtype == np.float32
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_pallas_int_slice_matmul_parity(rng):
    """Fused integer-Ozaki kernel (interpret mode) vs the XLA-composed
    reduction: must agree to pair-representation accuracy."""
    from andvaranaut_tpu.gp import pallas_slicemm, precision
    import jax.numpy as jnp

    A = rng.normal(size=(130, 300)) * np.exp(rng.normal(size=(130, 1)) * 2)
    B = rng.normal(size=(300, 70))
    Cf = np.asarray(pallas_slicemm.pallas_int_slice_matmul(
        jnp.asarray(A), jnp.asarray(B)))
    Cx = np.asarray(precision.int_slice_matmul(jnp.asarray(A), jnp.asarray(B)))
    scale = np.abs(A @ B).max()
    assert np.abs(Cf - Cx).max() / scale < 1e-12
    assert np.abs(Cf - A @ B).max() / scale < 1e-9


def test_gram_cross_fast_dispatch_parity(rng, monkeypatch):
    """gram_cross with the fast path forced (interpret-mode Pallas on CPU)
    must match the exact composite gram to f32 grade, and its custom JVP
    must match autodiff of the exact form."""
    import jax

    monkeypatch.setenv("ANDVARANAUT_FAST_GRAM", "1")
    kerns, ops = ("RBF", "Matern32"), ("+",)
    n, m, d = 40, 25, 2
    X = jnp.asarray(rng.uniform(size=(n, d)))
    Y = jnp.asarray(rng.uniform(size=(m, d)))
    l = jnp.asarray([0.6, 1.1, 0.8, 0.9])
    kv = jnp.asarray([1.3, 0.7])

    fast = np.asarray(kernels.gram_cross(kerns, ops, X, Y, l, kv))
    exact = np.asarray(kernels.gram(kerns, ops, X, Y, l, kv))
    np.testing.assert_allclose(fast, exact, rtol=2e-6, atol=2e-6)

    # tangents must flow (exact-form JVP behind the Pallas primal)
    def f(lv):
        return jnp.sum(kernels.gram_cross(kerns, ops, X, Y, lv, kv))

    def f0(lv):
        return jnp.sum(kernels.gram(kerns, ops, X, Y, lv, kv))

    g_fast = np.asarray(jax.grad(f)(l))
    g_exact = np.asarray(jax.grad(f0)(l))
    np.testing.assert_allclose(g_fast, g_exact, rtol=1e-9)


def test_gram_cross_disabled_is_exact(rng, monkeypatch):
    monkeypatch.setenv("ANDVARANAUT_FAST_GRAM", "0")
    kerns, ops = ("RatQuad",), ()
    X = jnp.asarray(rng.uniform(size=(10, 2)))
    l = jnp.asarray([0.6, 1.1])
    kv = jnp.asarray([1.0])
    a = np.asarray(kernels.gram_cross(kerns, ops, X, X, l, kv, 1.3))
    b = np.asarray(kernels.gram(kerns, ops, X, X, l, kv, 1.3))
    np.testing.assert_array_equal(a, b)
