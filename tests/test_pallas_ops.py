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
