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


def test_pallas_int_slice_matmul_predicated(rng):
    """Tile-predicated kernel modes (interpret mode): lower_only /
    col_start zero the skipped 256-tiles; tile rows wholly above
    row_start are never visited (dynamic grid — contents undefined);
    every computed tile is bit-identical to the dense kernel."""
    from andvaranaut_tpu.gp import pallas_slicemm
    import jax.numpy as jnp

    m = 600  # 3 tile rows/cols, last partial
    A = rng.normal(size=(m, 300))
    B = rng.normal(size=(300, m))
    dense = np.asarray(pallas_slicemm.pallas_int_slice_matmul(
        jnp.asarray(A), jnp.asarray(B)))
    pred = np.asarray(pallas_slicemm.pallas_int_slice_matmul(
        jnp.asarray(A), jnp.asarray(B), lower_only=True,
        row_start=jnp.int32(256), col_start=jnp.int32(0)))
    TM = pallas_slicemm._TM
    ti = np.arange(m)[:, None] // TM
    tj = np.arange(m)[None, :] // TM
    visited = (ti + 1) * TM > 256
    keep = (ti >= tj) & visited
    np.testing.assert_array_equal(
        np.where(keep, pred, 0.0), np.where(keep, dense, 0.0))
    # within visited rows, skipped tiles (upper triangle) are exact zeros
    np.testing.assert_array_equal(
        np.where(visited & ~keep, pred, 0.0), 0.0)
    # an all-dead call still executes (grid clamped to one dead row)
    dead = pallas_slicemm.pallas_int_slice_matmul(
        jnp.asarray(A), jnp.asarray(B), row_start=jnp.int32(4096))
    assert np.asarray(dead).shape == (m, m)


def test_pallas_syrk_lower_triangular_grid(rng):
    """Triangular-grid syrk kernel (interpret mode): lower-triangle
    tiles must be bit-identical to the dense kernel's A @ A.T; tiles
    wholly below row_start are exact zeros."""
    from andvaranaut_tpu.gp import pallas_slicemm
    import jax.numpy as jnp

    m = 600
    A = rng.normal(size=(m, 280)) * np.exp(rng.normal(size=(m, 1)))
    dense = np.asarray(pallas_slicemm.pallas_int_slice_matmul(
        jnp.asarray(A), jnp.asarray(A.T)))
    low = np.asarray(pallas_slicemm.pallas_int_slice_syrk_lower(
        jnp.asarray(A)))
    TM = pallas_slicemm._TM
    ti = np.arange(m)[:, None] // TM
    tj = np.arange(m)[None, :] // TM
    tril = ti >= tj
    np.testing.assert_array_equal(
        np.where(tril, low, 0.0), np.where(tril, dense, 0.0))

    # row_start: masked-zero operand rows -> dead tile COLUMNS are never
    # visited (dynamic-grid prefix); everything in the live region must
    # match the dense product.  Unvisited tiles are undefined.
    A2 = A.copy()
    A2[:256] = 0.0
    low2 = np.asarray(pallas_slicemm.pallas_int_slice_syrk_lower(
        jnp.asarray(A2), row_start=jnp.int32(256)))
    dense2 = np.asarray(pallas_slicemm.pallas_int_slice_matmul(
        jnp.asarray(A2), jnp.asarray(A2.T)))
    keep = tril & ((tj + 1) * TM > 256)
    np.testing.assert_array_equal(
        np.where(keep, low2, 0.0), np.where(keep, dense2, 0.0))
    # an all-dead call (row_start >= m) must still execute (grid clamped
    # to one predicated-off cell) and produce a well-shaped output
    low3 = pallas_slicemm.pallas_int_slice_syrk_lower(
        jnp.asarray(A2), row_start=jnp.int32(768))
    assert np.asarray(low3).shape == (m, m)


def test_pallas_int_slice_matmul_col_end(rng):
    """col_end: with B's columns >= ce exactly zero (the identity
    solve's guarantee), the predicated product must be bit-identical to
    the dense kernel on live tiles and exact zeros on tiles wholly at or
    beyond ce."""
    from andvaranaut_tpu.gp import pallas_slicemm
    import jax.numpy as jnp

    m = 600
    ce = 300  # straddles the second tile
    A = rng.normal(size=(m, 200))
    B = rng.normal(size=(200, m))
    B[:, ce:] = 0.0
    dense = np.asarray(pallas_slicemm.pallas_int_slice_matmul(
        jnp.asarray(A), jnp.asarray(B)))
    pred = np.asarray(pallas_slicemm.pallas_int_slice_matmul(
        jnp.asarray(A), jnp.asarray(B), col_end=jnp.int32(ce)))
    TN = pallas_slicemm._TN
    tj = np.arange(m)[None, :] // TN
    live = np.broadcast_to(tj * TN < ce, dense.shape)
    np.testing.assert_array_equal(
        np.where(live, pred, 0.0), np.where(live, dense, 0.0))
    np.testing.assert_array_equal(np.where(live, 0.0, pred), 0.0)


def test_pallas_syrk_lower_a_upper_skip(rng):
    """a_upper: for an upper-triangular operand the k-chunk skip must be
    exact — lower tiles bit-identical to the dense syrk kernel."""
    from andvaranaut_tpu.gp import pallas_slicemm
    import jax.numpy as jnp

    m = 600
    A = np.triu(rng.normal(size=(m, m)) * np.exp(rng.normal(size=(m, 1))))
    skip = np.asarray(pallas_slicemm.pallas_int_slice_syrk_lower(
        jnp.asarray(A), a_upper=True))
    dense = np.asarray(pallas_slicemm.pallas_int_slice_syrk_lower(
        jnp.asarray(A)))
    TM = pallas_slicemm._TM
    ti = np.arange(m)[:, None] // TM
    tj = np.arange(m)[None, :] // TM
    tril = ti >= tj
    np.testing.assert_array_equal(
        np.where(tril, skip, 0.0), np.where(tril, dense, 0.0))


def test_blocked_solve_lower_rhs_lower_identity(rng, monkeypatch):
    """rhs_lower=True on the identity rhs must reproduce the plain
    blocked solve exactly (the skipped product tiles are exact zeros),
    through the Pallas kernels in interpret mode."""
    from andvaranaut_tpu.gp import precision
    from andvaranaut_tpu import _config
    import jax.numpy as jnp

    n, block = 512, 128
    A = rng.normal(size=(n, n))
    K = A @ A.T + n * np.eye(n)
    L = np.linalg.cholesky(K)
    eye = jnp.eye(n, dtype=jnp.float64)
    Lj = jnp.asarray(L)
    base = np.asarray(precision.blocked_solve_lower(Lj, eye, block=block))
    # force the TPU dispatch with interpret-mode Pallas for the kernels
    monkeypatch.setenv("ANDVARANAUT_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(_config, "is_tpu", lambda: True)
    fast = np.asarray(precision.blocked_solve_lower(
        Lj, eye, block=block, rhs_lower=True))
    ref = np.linalg.solve(L, np.eye(n))
    assert np.abs(fast - ref).max() < 1e-8
    assert np.abs(fast - base).max() < 1e-8


def test_slice_matmul_sparsity_flags_composed(rng):
    """The CPU/XLA-composed dispatcher path must apply the identical
    tile-granular zeroing as the Pallas kernel's predication."""
    from andvaranaut_tpu.gp import pallas_slicemm, precision
    import jax.numpy as jnp

    m = 600
    A = rng.normal(size=(m, 128))
    B = rng.normal(size=(128, m))
    full = np.asarray(precision.int_slice_matmul(
        jnp.asarray(A), jnp.asarray(B)))
    got = np.asarray(precision.slice_matmul(
        jnp.asarray(A), jnp.asarray(B), lower_only=True, row_start=256,
        col_start=256))
    TM = pallas_slicemm._TM
    ti = np.arange(m)[:, None] // TM
    tj = np.arange(m)[None, :] // TM
    keep = (ti >= tj) & ((ti + 1) * TM > 256) & ((tj + 1) * TM > 256)
    np.testing.assert_array_equal(got, np.where(keep, full, 0.0))


def test_blocked_cholesky_predicated_levels(rng):
    """blocked_cholesky's predicated trailing updates (lower-only syrk,
    masked-row skip) must reproduce the dense factor at sizes where the
    256-tile predication is actually active."""
    from andvaranaut_tpu.gp import precision
    import jax.numpy as jnp

    n = 768
    X = rng.uniform(size=(n, 2))
    d0 = X[:, 0, None] - X[None, :, 0]
    d1 = X[:, 1, None] - X[None, :, 1]
    K = np.exp(-0.5 * (d0 ** 2 / 0.25 + d1 ** 2 / 0.49))
    K = K + 1e-4 * np.eye(n)
    L = np.asarray(precision.blocked_cholesky(jnp.asarray(K), block=256))
    L0 = np.linalg.cholesky(K)
    # element grade matches the unpredicated mixed factor (ill-conditioned
    # kernel matrices amplify the ~4e-11 product error; the established
    # criterion is reconstruction, cf. test_blocked_cholesky_matches_f64)
    rel = np.abs(L - L0).max() / np.abs(L0).max()
    assert rel < 1e-5, rel
    rec = np.abs(np.tril(L) @ np.tril(L).T - K).max() / np.abs(K).max()
    assert rec < 5e-7, rec


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


def test_per_pair_accumulators_bit_identical(rng):
    """ANDVARANAUT_SYRK_ACC=pair gives every slice-pair product its own
    int32 scratch (max MXU ILP); int32 addition is associative, so all
    three kernels must be BIT-identical to the order-grouped default."""
    from andvaranaut_tpu.gp import pallas_slicemm as ps

    A = jnp.asarray(rng.standard_normal((256, 256)))
    B = jnp.asarray(rng.standard_normal((256, 256)))
    C0 = ps._pallas_int_slice_matmul(A, B, nslices=6, per_pair=False)
    C1 = ps._pallas_int_slice_matmul(A, B, nslices=6, per_pair=True)
    np.testing.assert_array_equal(np.asarray(C0), np.asarray(C1))

    P = jnp.asarray(rng.standard_normal((512, 256)))
    tril = np.tril(np.ones((512, 512), bool))
    S0 = np.asarray(ps._pallas_int_slice_syrk_lower(
        P, nslices=6, per_pair=False))
    S1 = np.asarray(ps._pallas_int_slice_syrk_lower(
        P, nslices=6, per_pair=True))
    np.testing.assert_array_equal(S0[tril], S1[tril])

    Ah = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))
    Al = jnp.asarray(
        (rng.standard_normal((512, 512)) * 1e-8).astype(np.float32))
    h0, l0 = ps._pallas_int_slice_syrk_sub_pair(
        Ah, Al, P, nslices=6, per_pair=False)
    h1, l1 = ps._pallas_int_slice_syrk_sub_pair(
        Ah, Al, P, nslices=6, per_pair=True)
    np.testing.assert_array_equal(np.asarray(h0)[tril], np.asarray(h1)[tril])
    np.testing.assert_array_equal(np.asarray(l0)[tril], np.asarray(l1)[tril])


def test_pallas_syrk_tn_lower(rng):
    """A^T A syrk (native-layout operand, transposed-LHS MXU dots): on
    lower tiles the result must match the composed int-slice product to
    the pair-assembly grade, and the w_lower k-chunk skip must be
    bit-exact vs its own dense variant."""
    from andvaranaut_tpu.gp import pallas_slicemm, precision
    import jax.numpy as jnp

    m = 600
    W = np.tril(rng.normal(size=(m, m)) * np.exp(rng.normal(size=(m, 1))))
    Wj = jnp.asarray(W)
    got = np.asarray(pallas_slicemm.pallas_int_slice_syrk_tn_lower(Wj))
    skip = np.asarray(
        pallas_slicemm.pallas_int_slice_syrk_tn_lower(Wj, w_lower=True))
    want = np.asarray(precision.int_slice_matmul(
        Wj.T, Wj, nslices=precision.INT_NSLICES))
    TM = pallas_slicemm._TM
    tril = (np.arange(m)[:, None] // TM) >= (np.arange(m)[None, :] // TM)
    err = np.abs(np.where(tril, got - want, 0.0)).max()
    assert err < 1e-10 * np.abs(want).max(), err
    np.testing.assert_array_equal(
        np.where(tril, skip, 0.0), np.where(tril, got, 0.0))


def test_syrk_nt_dot_bit_identical(rng):
    """ANDVARANAUT_SYRK_NT reads the syrk b operand from the SAME
    native-layout slice arrays via the nt dot (a @ b^T) instead of
    materialising transposed int8 copies.  Identical slice values in a
    different layout -> the int32 pair sums, and hence the outputs,
    must be BIT-identical."""
    from andvaranaut_tpu.gp import pallas_slicemm as ps

    P = jnp.asarray(rng.standard_normal((512, 256)))
    tril = np.tril(np.ones((512, 512), bool))
    S0 = np.asarray(ps._pallas_int_slice_syrk_lower(
        P, nslices=6, nt=False))
    S1 = np.asarray(ps._pallas_int_slice_syrk_lower(
        P, nslices=6, nt=True))
    np.testing.assert_array_equal(S0[tril], S1[tril])

    Ah = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))
    Al = jnp.asarray(
        (rng.standard_normal((512, 512)) * 1e-8).astype(np.float32))
    h0, l0 = ps._pallas_int_slice_syrk_sub_pair(
        Ah, Al, P, nslices=6, nt=False)
    h1, l1 = ps._pallas_int_slice_syrk_sub_pair(
        Ah, Al, P, nslices=6, nt=True)
    np.testing.assert_array_equal(np.asarray(h0)[tril], np.asarray(h1)[tril])
    np.testing.assert_array_equal(np.asarray(l0)[tril], np.asarray(l1)[tril])

    # row_start (dynamic grid) path, padded k
    P2 = jnp.asarray(rng.standard_normal((512, 200)))
    h2, l2 = ps._pallas_int_slice_syrk_sub_pair(
        Ah, Al, P2, nslices=6, row_start=256, nt=False)
    h3, l3 = ps._pallas_int_slice_syrk_sub_pair(
        Ah, Al, P2, nslices=6, row_start=256, nt=True)
    live = tril & (np.arange(512)[None, :] >= 256)
    np.testing.assert_array_equal(np.asarray(h2)[live], np.asarray(h3)[live])
    np.testing.assert_array_equal(np.asarray(l2)[live], np.asarray(l3)[live])
