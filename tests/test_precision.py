"""Mixed-precision (bf16-slice) linear algebra accuracy tests.

On CPU these validate the slice arithmetic itself (CPU matmuls of bf16
slices accumulate in f32 just like the MXU path): slice_matmul must agree
with f64 matmul to ~1e-7 relative, blocked Cholesky/solve to similar, and
the mixed NLML to the 1e-6 parity budget."""

import numpy as np
import pytest

import jax.numpy as jnp

from andvaranaut_tpu.gp import engine, precision


def _spd(n, rng, cond=1e4):
    A = rng.normal(size=(n, n))
    Q, _ = np.linalg.qr(A)
    eigs = np.logspace(0, -np.log10(cond), n)
    return (Q * eigs) @ Q.T


def test_slice_matmul_accuracy(rng):
    A = rng.normal(size=(300, 700))
    B = rng.normal(size=(700, 200))
    C = np.asarray(precision.slice_matmul(jnp.asarray(A), jnp.asarray(B)))
    C0 = A @ B
    rel = np.abs(C - C0).max() / np.abs(C0).max()
    assert rel < 2e-7, rel


def test_slice_matmul_scale_invariance(rng):
    A = rng.normal(size=(64, 128)) * 1e6
    B = rng.normal(size=(128, 32)) * 1e-6
    C = np.asarray(precision.slice_matmul(jnp.asarray(A), jnp.asarray(B)))
    C0 = A @ B
    rel = np.abs(C - C0).max() / np.abs(C0).max()
    assert rel < 2e-7, rel


def test_blocked_cholesky_matches_f64(rng):
    n = 600
    K = _spd(n, rng) + 1e-6 * np.eye(n)
    L = np.asarray(precision.blocked_cholesky(jnp.asarray(K), block=256))
    L0 = np.linalg.cholesky(K)
    rel = np.abs(L - L0).max() / np.abs(L0).max()
    assert rel < 1e-5, rel
    # reconstruction error is the real criterion
    rec = np.abs(L @ L.T - K).max() / np.abs(K).max()
    assert rec < 5e-7, rec


def test_blocked_cholesky_padding(rng):
    # n not a multiple of block
    n = 333
    K = _spd(n, rng) + 1e-6 * np.eye(n)
    L = np.asarray(precision.blocked_cholesky(jnp.asarray(K), block=128))
    rec = np.abs(L @ L.T - K).max() / np.abs(K).max()
    assert rec < 5e-7, rec
    assert np.allclose(np.triu(L, 1), 0.0)


def test_blocked_solve_lower(rng):
    n = 500
    K = _spd(n, rng) + 1e-3 * np.eye(n)
    L0 = np.linalg.cholesky(K)
    b = rng.normal(size=n)
    x = np.asarray(precision.blocked_solve_lower(
        jnp.asarray(L0), jnp.asarray(b), block=128))
    x0 = np.linalg.solve(L0, b)
    rel = np.abs(x - x0).max() / np.abs(x0).max()
    assert rel < 1e-6, rel


def test_mixed_nlml_parity(rng):
    n = 700
    K = _spd(n, rng, cond=1e6) + 1e-6 * np.eye(n)
    y = rng.normal(size=n)
    exact = float(engine.chol_nlml(jnp.asarray(K), jnp.asarray(y)))
    mixed = float(precision.mixed_nlml(jnp.asarray(K), jnp.asarray(y),
                                       block=256))
    assert abs(mixed - exact) / abs(exact) < 1e-6, (mixed, exact)


def test_mixed_nlml_smooth_kernel_matrix(rng):
    """Near-low-rank RBF kernel matrix (eigenvalues collapsing onto the
    noise floor) — the spectrum that exposed transient blow-up in a
    Newton-based triangular inverse.  Must stay finite and accurate."""
    from andvaranaut_tpu.gp import kernels

    n = 1024
    X = rng.uniform(size=(n, 2))
    l = jnp.asarray([0.5, 0.7])
    kv = jnp.asarray([1.0])
    K = kernels.gram(("RBF",), (), jnp.asarray(X), None, l, kv, None)
    K = K + (1e-6 + 1e-4) * jnp.eye(n)
    y = jnp.asarray(np.sin(3 * X[:, 0]) + X[:, 1] ** 2)
    exact = float(engine.chol_nlml(K, y))
    mixed = float(precision.mixed_nlml(K, y, block=256))
    assert np.isfinite(mixed)
    assert abs(mixed - exact) / abs(exact) < 1e-6, (mixed, exact)

@pytest.mark.parametrize("kernel", [
    "RBF", "Matern52+RBF", "RBF*Matern32", "RatQuad",
])
def test_bigfit_gradients_match_autodiff(rng, kernel):
    """Closed-form mixed-path gradients vs autodiff of the exact f64 NLML,
    across the full kernel algebra (round-2 extension beyond plain RBF)."""
    import jax
    from andvaranaut_tpu.gp import bigfit, kernels

    kerns, ops = kernels.parse_kernel(kernel)
    n, nx = 96, 2
    nkern = len(kerns)
    has_alpha = "RatQuad" in kerns
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2

    def exact_logl(z):
        gv = jnp.exp(z[0])
        l = jnp.exp(z[1 : 1 + nx * nkern])
        kv = jnp.exp(z[1 + nx * nkern : 1 + nx * nkern + nkern])
        alpha = (
            jnp.exp(z[1 + nx * nkern + nkern]) if has_alpha else None)
        K = kernels.gram(kerns, ops, jnp.asarray(X), None, l, kv, alpha)
        K = K + (1e-6 + gv) * jnp.eye(n)
        return engine.chol_nlml(K, jnp.asarray(y))

    dim = 1 + nx * nkern + nkern + (1 if has_alpha else 0)
    z = jnp.asarray(
        [-6.0] + [-0.5 + 0.1 * i for i in range(dim - 1)])
    v0 = float(exact_logl(z))
    g0 = np.asarray(jax.grad(exact_logl)(z))
    v1, g1 = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, kerns=kerns, ops=ops, block=48)
    np.testing.assert_allclose(float(v1), v0, rtol=1e-8)
    # small-magnitude entries are floored by the slice-arithmetic grade of
    # the explicit K^-1 (~1e-6 absolute)
    np.testing.assert_allclose(np.asarray(g1), g0, rtol=1e-5, atol=5e-6)


def test_bigfit_matches_engine_map(rng):
    """big_map_fit must land on the same MAP as the exact-f64 engine."""
    from andvaranaut_tpu.gp import bigfit
    from andvaranaut_tpu.lhc import _none_conrev

    n = 80
    X = rng.uniform(size=(n, 2))
    y = (np.sin(3 * X[:, 0]) + X[:, 1] ** 2 +
         0.01 * rng.normal(size=n))
    cfg = engine.FitConfig(
        kerns=("RBF",), ops=(), noise=True, truncate=False, jitter=1e-6,
        iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y.reshape(-1, 1))
    h0, lp0 = engine.map_fit(cfg)
    h1, lp1 = bigfit.big_map_fit(X, y, block=48)
    np.testing.assert_allclose(h1["l"], h0["l"], rtol=2e-2)
    np.testing.assert_allclose(h1["kv"], h0["kv"], rtol=5e-2)
    assert abs(lp1 - lp0) < 0.05 * abs(lp0) + 0.5


def test_bigfit_composite_truncate(rng):
    """Composite-kernel mixed MAP with the truncate hyperprior menu must
    match the exact-f64 engine fit."""
    from andvaranaut_tpu.gp import bigfit
    from andvaranaut_tpu.lhc import _none_conrev

    n = 80
    X = rng.uniform(size=(n, 2))
    y = np.sin(3 * X[:, 0]) + 0.3 * X[:, 1] + 0.01 * rng.normal(size=n)
    cfg = engine.FitConfig(
        kerns=("Matern52", "RBF"), ops=("+",), noise=True, truncate=True,
        jitter=1e-6, iwgp=False, cwgp=False, priors=[None, None],
        xconrevs=[_none_conrev(), _none_conrev()],
        yconrevs=[_none_conrev()], x=X, y=y.reshape(-1, 1))
    h0, lp0 = engine.map_fit(cfg)
    h1, lp1 = bigfit.big_map_fit(
        X, y, kerns=("Matern52", "RBF"), ops=("+",), truncate=True,
        block=48)
    assert abs(lp1 - lp0) < 0.05 * abs(lp0) + 0.5
    np.testing.assert_allclose(h1["l"], h0["l"], rtol=0.1)


def test_tri_inv_mixed_indivisible_size(rng):
    """Sizes not divisible by the block must go through the padded blocked
    path (round-2 fix of the silent full-substitution fallback) and stay
    accurate."""
    n = 300  # > base=256 and not a multiple of it
    A = _spd(n, rng)
    L = np.linalg.cholesky(A)
    Linv = np.asarray(precision.tri_inv_mixed(jnp.asarray(L), base=256))
    err = np.abs(Linv @ L - np.eye(n)).max()
    assert err < 1e-6, err
    # strictly lower-triangular result
    assert np.abs(np.triu(Linv, 1)).max() == 0.0


def test_pcg_solve_beats_refinement_floor(rng):
    """PCG with the blocked-factorisation preconditioner reaches f64
    grade on an ill-conditioned kernel system (where plain refinement
    stalls at the factorisation-residual floor)."""
    import jax.numpy as jnp
    from andvaranaut_tpu.gp import kernels

    n = 192
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    l = jnp.asarray([0.8, 1.2])
    kv = jnp.asarray([3.0])
    K = kernels.gram(("RBF",), (), X, None, l, kv, None)
    K = K + jnp.eye(n) * 2e-4  # near-interpolation conditioning
    y = jnp.asarray(rng.normal(size=n))
    L, Dinv = precision.blocked_cholesky(K, block=32, return_inv=True)
    x = precision.pcg_solve(K, y, L, Dinv=Dinv, block=32)
    x_ref = np.linalg.solve(np.asarray(K), np.asarray(y))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8, atol=1e-8)


def test_seeded_diag_chol_parity(rng, monkeypatch):
    """f32-seeded + Newton-refined diagonal Cholesky (the TPU default for
    256+-grain diagonal blocks) must hold blocked-Cholesky accuracy when
    forced on CPU (SEED_CHOL=2)."""
    monkeypatch.setattr(precision, "SEED_CHOL", 2)
    n = 768
    K = _spd(n, rng, cond=1e6) + 1e-8 * np.eye(n)
    L, Dinv = precision.blocked_cholesky(
        jnp.asarray(K), block=256, return_inv=True)
    L = np.asarray(L)
    rec = np.abs(L @ L.T - K).max() / np.abs(K).max()
    assert rec < 5e-7, rec
    # the diagonal-block inverses feed the substitution path: check them
    for j in range(3):
        Lj = L[256 * j:256 * (j + 1), 256 * j:256 * (j + 1)]
        err = np.abs(np.asarray(Dinv[j]) @ Lj - np.eye(256)).max()
        assert err < 1e-7, (j, err)


def test_seeded_diag_chol_fallback(rng, monkeypatch):
    """A block too ill-conditioned for the f32 seed must trip the
    residual check and fall back to the emulated-f64 path — accuracy
    never regresses, only speed."""
    monkeypatch.setattr(precision, "SEED_CHOL", 2)
    n = 256
    K = _spd(n, rng, cond=1e12) + 1e-14 * np.eye(n)
    Lj, Linv = precision._chol_inv_diag(jnp.asarray(K), True, 21)
    L0 = np.linalg.cholesky(K)
    rel = np.abs(np.asarray(Lj) - L0).max() / np.abs(L0).max()
    assert rel < 1e-5, rel


def test_seeded_diag_chol_f32_singular_gate(rng, monkeypatch):
    """The 16k MAP-fit-start failure mode in miniature: a long-
    lengthscale RBF Gram on an 8e-4 noise floor is numerically low-rank
    — f32-marginal WITHOUT producing NaN, so the factor residual can
    converge while the seed's inverse is garbage (the old factor-only
    gate let this poison the 16k MAP fit on TPU).  With the inverse-
    residual gate the seeded path must stay finite and match the
    non-seeded factorisation's accuracy."""
    from andvaranaut_tpu.gp import kernels

    monkeypatch.setattr(precision, "SEED_CHOL", 2)
    n = 512
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    K = kernels.gram(("RBF",), (), X, None,
                     jnp.asarray([1.6487, 1.6487]), jnp.asarray([2.3193]),
                     None)
    K = K + 8.08e-4 * jnp.eye(n)
    L, Dinv = precision.blocked_cholesky(K, block=256, return_inv=True)
    L = np.asarray(L)
    assert np.isfinite(L).all()
    assert np.isfinite(np.asarray(Dinv)).all()
    rec = np.abs(L @ L.T - np.asarray(K)).max() / float(jnp.abs(K).max())
    assert rec < 1e-6, rec
    assert (np.diag(L) > 0).all()


@pytest.mark.parametrize("cond", [1e2, 1e4, 1e6, 1e8, 1e10])
def test_seeded_chol_condition_sweep(rng, monkeypatch, cond):
    """Seeded-path robustness across conditioning: for every condition
    number the factorisation must stay finite and reconstruct K — via
    the refined seed where it is good, via the residual-gated f64
    fallback where it is not (cond >~1e7 exceeds the f32 seed's range).
    The gate logic, not the happy path, is what this pins."""
    monkeypatch.setattr(precision, "SEED_CHOL", 2)
    n = 512
    K = jnp.asarray(_spd(n, rng, cond=cond) + np.eye(n) * (1.0 / cond))
    L, Dinv = precision.blocked_cholesky(K, block=256, return_inv=True)
    L = np.asarray(L)
    assert np.isfinite(L).all()
    assert (np.diag(L) > 0).all()
    assert np.isfinite(np.asarray(Dinv)).all()
    rec = np.abs(np.tril(L) @ np.tril(L).T - np.asarray(K)).max()
    assert rec / float(jnp.abs(K).max()) < 5e-7, rec

def test_fused_diag_chol_parity(rng, monkeypatch):
    """The fused Pallas pair-arithmetic diag chol+inverse (the TPU
    default for 256+-grain diagonal blocks) must hold blocked-Cholesky
    accuracy when forced on CPU (FUSED_CHOL=2, interpret mode)."""
    monkeypatch.setattr(precision, "FUSED_CHOL", 2)
    n = 768
    K = _spd(n, rng, cond=1e6) + 1e-8 * np.eye(n)
    L, Dinv = precision.blocked_cholesky(
        jnp.asarray(K), block=256, return_inv=True)
    L = np.asarray(L)
    rec = np.abs(L @ L.T - K).max() / np.abs(K).max()
    assert rec < 5e-7, rec
    for j in range(3):
        Lj = L[256 * j:256 * (j + 1), 256 * j:256 * (j + 1)]
        err = np.abs(np.asarray(Dinv[j]) @ Lj - np.eye(256)).max()
        assert err < 1e-7, (j, err)


def test_fused_diag_chol_recursion(rng, monkeypatch):
    """Blocks above the 512 VMEM bound go through one level of 2x2
    blocked recursion (2 fused calls + 4 slice matmuls): both the
    factor and the assembled inverse X10 = -X11 L10 X00 must be
    substitution-grade."""
    monkeypatch.setattr(precision, "FUSED_CHOL", 2)
    n = 1024
    K = _spd(n, rng, cond=1e6) + 1e-8 * np.eye(n)
    Lj, Linv = precision._chol_inv_diag(jnp.asarray(K), True, 21)
    Lj, Linv = np.asarray(Lj), np.asarray(Linv)
    rec = np.abs(Lj @ Lj.T - K).max() / np.abs(K).max()
    assert rec < 5e-7, rec
    err = np.abs(Linv @ Lj - np.eye(n)).max()
    assert err < 1e-7, err


def test_fused_diag_chol_illconditioned(rng, monkeypatch):
    """cond 1e12: far beyond the old f32 seed's range, well within the
    ~48-bit pair mantissa — the fused path must stay accurate whether
    it gates to the f64 fallback or not."""
    monkeypatch.setattr(precision, "FUSED_CHOL", 2)
    n = 256
    K = _spd(n, rng, cond=1e12) + 1e-14 * np.eye(n)
    Lj, Linv = precision._chol_inv_diag(jnp.asarray(K), True, 21)
    L0 = np.linalg.cholesky(K)
    rel = np.abs(np.asarray(Lj) - L0).max() / np.abs(L0).max()
    assert rel < 1e-5, rel
    err = np.abs(np.asarray(Linv) @ np.asarray(Lj) - np.eye(n)).max()
    assert err < 1e-6, err


def test_fused_recursion_composition_grade(rng, monkeypatch):
    """Regression: the 2x2 recursion's assembly matmuls multiply
    triangular-inverse operands of magnitude ~1/sqrt(lambda_min) (~1e2
    on noise-floor GP blocks), and the int8-Ozaki absolute error scales
    with operand magnitude — at the factorisation's default 6 slices
    the composed X10 degraded to ~2e-4 and end-to-end NLML parity lost
    9x.  The composition must run at the higher FUSED_COMPOSE_NSLICES
    grade: on a bench-typical noise-floor 1024 Gram block the composed
    inverse residual must stay substitution-grade."""
    from andvaranaut_tpu.gp import kernels
    from andvaranaut_tpu.gp import pallas_cholinv as pc

    monkeypatch.setattr(precision, "FUSED_CHOL", 2)
    # pin the COMPOSE_NSLICES regression against the pair-loop syrk (the
    # mode this grade ladder was measured for); the MXU-syrk mode has
    # its own looser-grade assertions in test_cholinv_mxu_syrk_parity
    monkeypatch.setenv("ANDVARANAUT_CHOLINV_MXU", "0")
    pc.chol_inv_block_pair.clear_cache()
    n = 1024
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    K = kernels.gram(("RBF",), (), X, None,
                     jnp.asarray([0.5, 0.7]), jnp.asarray([1.0]), None)
    K = K + (1e-4 + 1e-6) * jnp.eye(n)
    L, Xi = precision._chol_inv_fused(K, 21)
    pc.chol_inv_block_pair.clear_cache()
    L, Xi = np.asarray(L), np.asarray(Xi)
    Lref = np.linalg.cholesky(np.asarray(K))
    assert np.abs(np.tril(L) - Lref).max() < 1e-9
    assert np.abs(Xi @ np.tril(L) - np.eye(n)).max() < 1e-7
    assert np.abs(np.tril(L) @ np.tril(L).T - np.asarray(K)).max() < 1e-11


def test_fused_diag_chol_lowrank_gate(rng, monkeypatch):
    """The 16k MAP-fit-start failure mode in miniature (see the seeded
    test above): a numerically low-rank long-lengthscale RBF Gram on an
    8e-4 noise floor.  The fused kernel's substitution inverse comes
    off the pair factor row by row — substitution-grade by
    construction — so the factorisation must stay finite and
    reconstruct K."""
    from andvaranaut_tpu.gp import kernels

    monkeypatch.setattr(precision, "FUSED_CHOL", 2)
    n = 512
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    K = kernels.gram(("RBF",), (), X, None,
                     jnp.asarray([1.6487, 1.6487]), jnp.asarray([2.3193]),
                     None)
    K = K + 8.08e-4 * jnp.eye(n)
    L, Dinv = precision.blocked_cholesky(K, block=256, return_inv=True)
    L = np.asarray(L)
    assert np.isfinite(L).all()
    assert np.isfinite(np.asarray(Dinv)).all()
    rec = np.abs(L @ L.T - np.asarray(K)).max() / float(jnp.abs(K).max())
    assert rec < 1e-6, rec
    assert (np.diag(L) > 0).all()


def test_syrk_sub_pair_kernel(rng):
    """Fused in-place trailing update (interpret mode): live lower
    tiles get A - panel@panel.T at slice grade; unvisited tiles —
    strictly-upper and tile columns wholly below row_start — PASS
    THROUGH unchanged (the masked-update semantics of the
    factorisation, with finished L columns preserved bit-exactly)."""
    from andvaranaut_tpu.gp import pallas_slicemm

    n, rs = 512, 256
    K = _spd(n, rng, cond=1e4)
    panel = rng.normal(size=(n, 256))
    panel[:rs] = 0.0
    pj = jnp.asarray(panel)
    Ahi, Alo = precision._pair_split(jnp.asarray(K))
    nhi, nlo = pallas_slicemm.pallas_int_slice_syrk_sub_pair(
        Ahi, Alo, pj, nslices=6, row_start=rs)
    got = np.asarray(nhi.astype(jnp.float64) + nlo.astype(jnp.float64))
    C = np.asarray(precision.int_slice_matmul(pj, pj.T, nslices=6))
    ti = np.arange(n)[:, None] // 256
    tj = np.arange(n)[None, :] // 256
    upd = (ti >= tj) & (((tj + 1) * 256) > rs)
    want = np.where(upd, K - C, K)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 1e-12, err
    # passthrough region must be BIT-exact (aliased tiles untouched)
    ahi0, alo0 = np.asarray(Ahi), np.asarray(Alo)
    keep = ~upd
    assert (np.asarray(nhi)[keep] == ahi0[keep]).all()
    assert (np.asarray(nlo)[keep] == alo0[keep]).all()


def test_syrk_sub_pair_all_dead(rng):
    """row_start >= m: the clamped single grid cell must write the
    carry through unchanged (value-wise)."""
    from andvaranaut_tpu.gp import pallas_slicemm

    n = 512
    K = _spd(n, rng)
    panel = jnp.zeros((n, 256))
    Ahi, Alo = precision._pair_split(jnp.asarray(K))
    nhi, nlo = pallas_slicemm.pallas_int_slice_syrk_sub_pair(
        Ahi, Alo, panel, nslices=6, row_start=n)
    assert (np.asarray(nhi) == np.asarray(Ahi)).all()
    assert (np.asarray(nlo) == np.asarray(Alo)).all()


def test_pair_carry_cholesky_parity(rng, monkeypatch):
    """PAIR_CARRY=2 (f32-pair trailing carry + fused in-place syrk,
    the TPU default) must match the f64-carry mixed path to well under
    the slice-product grade, including diagonal-block inverses and
    level transitions, on both well- and ill-conditioned inputs."""
    monkeypatch.setattr(precision, "PAIR_CARRY", 2)
    n = 1024
    K = _spd(n, rng, cond=1e6)
    Kj = jnp.asarray(K)
    L, Dinv = precision.blocked_cholesky(Kj, block=256, return_inv=True)
    monkeypatch.setattr(precision, "PAIR_CARRY", 0)
    L0, Dinv0 = precision.blocked_cholesky(Kj, block=256, return_inv=True)
    dL = np.abs(np.tril(np.asarray(L)) - np.tril(np.asarray(L0))).max()
    assert dL < 1e-9 * np.abs(np.asarray(L0)).max(), dL
    # diag-block inverses amplify the ~1e-13 pair-assembly difference
    # in Ajj by the block condition number — 1e-7 relative is still two
    # orders under the substitution-inverse grade consumers rely on
    dD = np.abs(np.asarray(Dinv) - np.asarray(Dinv0)).max()
    assert dD < 1e-7 * np.abs(np.asarray(Dinv0)).max(), dD
    rec = np.abs(np.tril(np.asarray(L)) @ np.tril(np.asarray(L)).T - K).max()
    assert rec / np.abs(K).max() < 5e-7, rec


def test_pair_carry_nlml_parity(rng, monkeypatch):
    """End-to-end mixed NLML through the pair-carry factorisation must
    match the host f64 value to the usual mixed-path tolerance."""
    from andvaranaut_tpu.gp import kernels

    monkeypatch.setattr(precision, "PAIR_CARRY", 2)
    n = 768
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(X[:, 0]))
                    + 0.01 * rng.normal(size=n))
    K = kernels.gram(("RBF",), (), X, None, jnp.asarray([0.5, 0.7]),
                     jnp.asarray([1.0]), None)
    K = K + (1e-4 + 1e-6) * jnp.eye(n)
    nlml = float(precision.mixed_nlml(K, y, block=256))
    ref = float(engine.chol_nlml(K, y))
    assert abs(nlml - ref) / abs(ref) < 1e-6, (nlml, ref)


def test_small_n_single_block_fused_cholesky(rng, monkeypatch):
    """n <= block routes through the fused pair kernel (forced on CPU):
    one factor+inverse call instead of emulated-f64 chol — the
    leapfrog-dominating cost of small-n GP MCMC on TPU.  Shapes off the
    128 grain are identity-padded and sliced back exactly."""
    monkeypatch.setattr(precision, "FUSED_CHOL", 2)
    for n in (256, 250):
        K = _spd(n, rng) + 1e-4 * np.eye(n)
        L, Dinv = precision.blocked_cholesky(
            jnp.asarray(K), block=512, return_inv=True)
        L = np.asarray(L)
        Dinv = np.asarray(Dinv)
        assert L.shape == (n, n) and Dinv.shape == (1, n, n)
        L0 = np.linalg.cholesky(K)
        rel = np.abs(L - L0).max() / np.abs(L0).max()
        assert rel < 1e-9, rel  # double-f32 pair grade
        R = Dinv[0] @ L - np.eye(n)
        assert np.abs(R).max() < 1e-8, np.abs(R).max()
        assert np.allclose(np.triu(L, 1), 0.0)


def test_bigfit_single_block_grad_parity(rng, monkeypatch):
    """block >= n: the gradient pipeline reuses the stored single-block
    inverse (Linv = Dinv[0]) — value AND gradient must still match
    autodiff of the exact f64 NLML."""
    import jax

    from andvaranaut_tpu.gp import bigfit, kernels

    monkeypatch.setattr(precision, "FUSED_CHOL", 2)
    n, nx = 96, 2  # identity-pads to the 256 fused grain inside
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2

    def exact_logl(z):
        gv = jnp.exp(z[0])
        l = jnp.exp(z[1:1 + nx])
        kv = jnp.exp(z[1 + nx:2 + nx])
        K = kernels.gram(("RBF",), (), jnp.asarray(X), None, l, kv, None)
        K = K + (1e-6 + gv) * jnp.eye(n)
        return engine.chol_nlml(K, jnp.asarray(y))

    z = jnp.asarray([-6.0, -0.5, -0.4, -0.3])
    v0 = float(exact_logl(z))
    g0 = np.asarray(jax.grad(exact_logl)(z))
    v1, g1 = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, kerns=("RBF",), block=128)
    np.testing.assert_allclose(float(v1), v0, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g1), g0, rtol=1e-5, atol=5e-6)


def test_mm_sub_pair_kernel(rng):
    """Rectangular fused in-place subtract (interpret mode): live tiles
    (rows >= row_start, cols < col_end) get R - A@B at slice grade;
    everything else passes through BIT-exactly (aliased pair planes
    untouched), including the clamped row of an all-dead call."""
    from andvaranaut_tpu.gp import pallas_slicemm

    m, k, n, rs, ce = 512, 256, 768, 256, 512
    A = rng.normal(size=(m, k))
    A[:rs] = 0.0
    B = rng.normal(size=(k, n))
    B[:, ce:] = 0.0
    R = rng.normal(size=(m, n))
    Rhi, Rlo = precision._pair_split(jnp.asarray(R))
    nhi, nlo = pallas_slicemm.pallas_int_slice_mm_sub_pair(
        Rhi, Rlo, jnp.asarray(A), jnp.asarray(B), row_start=rs, col_end=ce)
    got = np.asarray(nhi.astype(jnp.float64) + nlo.astype(jnp.float64))
    C = np.asarray(precision.int_slice_matmul(
        jnp.asarray(A), jnp.asarray(B), nslices=precision.INT_NSLICES))
    live = (np.arange(m)[:, None] >= rs) & (np.arange(n)[None, :] < ce)
    want = np.where(live, R - C, R)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 1e-12, err
    keep = ~live
    assert (np.asarray(nhi)[keep] == np.asarray(Rhi)[keep]).all()
    assert (np.asarray(nlo)[keep] == np.asarray(Rlo)[keep]).all()
    # all-dead call: carry passes through bit-exactly
    dhi, dlo = pallas_slicemm.pallas_int_slice_mm_sub_pair(
        Rhi, Rlo, jnp.asarray(A), jnp.asarray(B), row_start=m, col_end=ce)
    assert (np.asarray(dhi) == np.asarray(Rhi)).all()
    assert (np.asarray(dlo) == np.asarray(Rlo)).all()


def test_blocked_inv_lower_pair_parity(rng, monkeypatch):
    """The pair-carry identity solve (one in-place (hi, lo) carry — the
    16k gradient pipeline's OOM fix) must match the generic
    rhs_lower+tril path to well under the slice grade, produce an
    EXACT-zero upper triangle with no tril pass, and fuse the
    transpose."""
    n, block = 768, 256
    K = _spd(n, rng, cond=1e5) + 1e-4 * np.eye(n)
    Kj = jnp.asarray(K)
    monkeypatch.setattr(precision, "PAIR_CARRY", 2)
    L, Dinv = precision.blocked_cholesky(Kj, block=block, return_inv=True)
    X = precision.blocked_inv_lower(L, Dinv=Dinv)
    Xn = np.asarray(X)
    Ln = np.tril(np.asarray(L))
    res = np.abs(np.eye(n) - Ln @ Xn).max()
    assert res < 1e-8, res
    assert (np.triu(Xn, 1) == 0.0).all()
    monkeypatch.setattr(precision, "PAIR_CARRY", 0)
    Xf = np.asarray(precision.blocked_inv_lower(L, Dinv=Dinv))
    d = np.abs(Xn - Xf).max() / np.abs(Xf).max()
    assert d < 1e-11, d


def test_bigfit_grad_parity_pair_path(rng, monkeypatch):
    """Multi-block gradient pipeline routed entirely through the pair
    carries (PAIR_CARRY=2: pair factorisation + pair identity solve +
    a_upper syrk — the TPU production route) must agree with the
    f64-carry route to well under the closed-form pipeline's own
    grade."""
    import jax

    from andvaranaut_tpu.gp import bigfit

    n, nx = 512, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.01 * rng.normal(size=n)
    z = jnp.asarray(np.log([1e-3, 0.8, 1.7, 2.5]))
    # PAIR_CARRY is read at trace time and is NOT part of _nlml_vg's
    # jit cache key: clear the cache around each setting or the second
    # call silently reuses the first trace
    monkeypatch.setattr(precision, "PAIR_CARRY", 2)
    bigfit._nlml_vg.clear_cache()
    v1, g1 = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, block=256)
    monkeypatch.setattr(precision, "PAIR_CARRY", 0)
    bigfit._nlml_vg.clear_cache()
    v0, g0 = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, block=256)
    bigfit._nlml_vg.clear_cache()
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_fused_panel_cholesky_parity(rng, monkeypatch):
    """ANDVARANAUT_FUSED_PANEL=2 (in-kernel column-block slicing, panel
    product written in place into the carry, pre-sliced trailing syrk)
    must match the unfused pair-carry path to well under the
    slice-product grade — including the stale-upper-triangle contract
    (finished columns keep junk above the diagonal that every consumer
    must mask)."""
    monkeypatch.setattr(precision, "PAIR_CARRY", 2)
    monkeypatch.setenv("ANDVARANAUT_FUSED_PANEL", "2")
    n = 1024
    K = _spd(n, rng, cond=1e6)
    Kj = jnp.asarray(K)
    L, Dinv = precision.blocked_cholesky(Kj, block=256, return_inv=True)
    monkeypatch.setenv("ANDVARANAUT_FUSED_PANEL", "0")
    L0, Dinv0 = precision.blocked_cholesky(Kj, block=256, return_inv=True)
    dL = np.abs(np.tril(np.asarray(L)) - np.tril(np.asarray(L0))).max()
    assert dL < 1e-9 * np.abs(np.asarray(L0)).max(), dL
    dD = np.abs(np.asarray(Dinv) - np.asarray(Dinv0)).max()
    assert dD < 1e-7 * np.abs(np.asarray(Dinv0)).max(), dD
    rec = np.abs(np.tril(np.asarray(L)) @ np.tril(np.asarray(L)).T - K).max()
    assert rec / np.abs(K).max() < 5e-7, rec


def test_fused_panel_slices_reconstruct(rng, monkeypatch):
    """pair_to_slices must reproduce the sliced value to the 6-slice
    truncation grade: sum_s c_s 2^-7(s+1) * sa == v to ~2^-42 * sa."""
    from andvaranaut_tpu.gp import pallas_panel

    monkeypatch.setenv("ANDVARANAUT_FUSED_PANEL", "2")
    m, block = 512, 256
    V = rng.standard_normal((m, m)) * np.exp(rng.normal(size=(m, 1)))
    Vh = jnp.asarray(V.astype(np.float32))
    Vl = jnp.asarray((V - np.asarray(Vh)).astype(np.float32))
    sl, sa = pallas_panel.pair_to_slices(Vh, Vl, 0, 256, block)
    w = np.asarray(
        [2.0 ** (-7.0 * (s + 1)) for s in range(len(sl))])
    rec = sum(np.asarray(s)[256:].astype(np.float64) * wi
              for s, wi in zip(sl, w))
    rec = rec * np.asarray(sa)[256:]
    v = np.asarray(Vh).astype(np.float64) + np.asarray(Vl)
    err = np.abs(rec - v[256:, :block]).max()
    assert err < 2.0 ** -40 * np.abs(np.asarray(sa)).max(), err


def test_fused_panel_nlml_parity(rng, monkeypatch):
    """End-to-end mixed NLML through the fused panel kernels must match
    the host f64 value to the usual mixed-path tolerance."""
    from andvaranaut_tpu.gp import kernels

    monkeypatch.setattr(precision, "PAIR_CARRY", 2)
    monkeypatch.setenv("ANDVARANAUT_FUSED_PANEL", "2")
    n = 768
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(X[:, 0]))
                    + 0.01 * rng.normal(size=n))
    K = kernels.gram(("RBF",), (), X, None, jnp.asarray([0.5, 0.7]),
                     jnp.asarray([1.0]), None)
    K = K + (1e-4 + 1e-6) * jnp.eye(n)
    nlml = float(precision.mixed_nlml(K, y, block=256))
    ref = float(engine.chol_nlml(K, y))
    assert abs(nlml - ref) / abs(ref) < 1e-6, (nlml, ref)


def test_bigfit_grad_parity_fused_panel(rng, monkeypatch):
    """The gradient pipeline with the pair-native K^-1 route
    (FUSED_GRAD=2: pair L^-1 + column-scale slice kernel + pre-sliced
    tn syrk) must agree with the unfused pair route, at both
    GRAD_INV_ITERS settings."""
    from andvaranaut_tpu.gp import bigfit

    n, nx = 512, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.01 * rng.normal(size=n)
    z = jnp.asarray(np.log([1e-3, 0.8, 1.7, 2.5]))
    monkeypatch.setattr(precision, "PAIR_CARRY", 2)
    monkeypatch.setenv("ANDVARANAUT_FUSED_GRAD", "2")
    bigfit._nlml_vg.clear_cache()
    v1, g1 = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, block=256)
    monkeypatch.setenv("ANDVARANAUT_GRAD_INV_ITERS", "0")
    bigfit._nlml_vg.clear_cache()
    v2, g2 = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, block=256)
    monkeypatch.delenv("ANDVARANAUT_GRAD_INV_ITERS")
    monkeypatch.setenv("ANDVARANAUT_FUSED_GRAD", "0")
    bigfit._nlml_vg.clear_cache()
    v0, g0 = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, block=256)
    bigfit._nlml_vg.clear_cache()
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)
    # iters=0: composed-substitution L^-1 grade (~1e-9) — still far
    # below anything a gradient consumer can see
    np.testing.assert_allclose(float(v2), float(v0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g0),
                               rtol=1e-3, atol=1e-5)


def test_bigfit_fused_grad_n_not_tk_multiple(rng, monkeypatch):
    """n=1280 (a block multiple but NOT a multiple of the default
    tk=1024) through the FUSED_GRAD presliced tn syrk: the presliced
    wrappers cannot pad their pre-extracted slices along k, so the
    k-chunk must clamp to a divisor of n (regression for the
    trace-time AssertionError at n in {1280, 1536, 2560, ...})."""
    from andvaranaut_tpu.gp import bigfit, pallas_slicemm

    assert pallas_slicemm._tk_divisor_for(1280) == 256
    assert pallas_slicemm._tk_divisor_for(1536) == 768
    assert pallas_slicemm._tk_divisor_for(2048) == 1024
    assert pallas_slicemm._tk_divisor_for(256) == 256

    n, nx = 1280, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.01 * rng.normal(size=n)
    z = jnp.asarray(np.log([1e-3, 0.8, 1.7, 2.5]))
    monkeypatch.setattr(precision, "PAIR_CARRY", 2)
    monkeypatch.setenv("ANDVARANAUT_FUSED_GRAD", "2")
    bigfit._nlml_vg.clear_cache()
    v1, g1 = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, block=256)
    monkeypatch.setenv("ANDVARANAUT_FUSED_GRAD", "0")
    bigfit._nlml_vg.clear_cache()
    v0, g0 = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, block=256)
    bigfit._nlml_vg.clear_cache()
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_syrk_tile_512_parity(rng, monkeypatch):
    """ANDVARANAUT_SYRK_TILE=512 (fewer, larger fused-syrk grid cells)
    must reproduce the default-256 factorisation bit-for-bit: the tile
    size only changes the grid decomposition, not the int32 slice-pair
    sums.  block=256 makes row_start straddle the 512 tiles (rs=768,
    1280, ...), exercising the masked-panel zero-subtract contract."""
    n = 1024
    K = _spd(n, rng, cond=1e6)
    Kj = jnp.asarray(K)
    monkeypatch.setattr(precision, "PAIR_CARRY", 2)
    L0, D0 = precision.blocked_cholesky(Kj, block=256, return_inv=True)
    monkeypatch.setenv("ANDVARANAUT_SYRK_TILE", "512")
    L1, D1 = precision.blocked_cholesky(Kj, block=256, return_inv=True)
    np.testing.assert_array_equal(
        np.tril(np.asarray(L1)), np.tril(np.asarray(L0)))
    np.testing.assert_array_equal(np.asarray(D1), np.asarray(D0))
    # non-tile-aligned carry falls back to 256 (no assert, same result)
    from andvaranaut_tpu.gp import pallas_slicemm
    assert pallas_slicemm._syrk_tile(1280) == 256
    assert pallas_slicemm._syrk_tile(1024) == 512
    monkeypatch.delenv("ANDVARANAUT_SYRK_TILE")
    assert pallas_slicemm._syrk_tile(1024) == 256


def test_presliced_bf16_dot_parity(rng, monkeypatch):
    """ANDVARANAUT_MXU_DOT=bf16 must be HONOURED (not silently no-op)
    on the presliced syrk routes: the 7-bit integer slice values dot
    exactly on the bf16->f32 path at tk <= 1024, so the fused-grad
    pipeline must be bit-identical under either dot dtype."""
    from andvaranaut_tpu.gp import bigfit

    n, nx = 512, 2
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + 0.01 * rng.normal(size=n)
    z = jnp.asarray(np.log([1e-3, 0.8, 1.7, 2.5]))
    monkeypatch.setattr(precision, "PAIR_CARRY", 2)
    monkeypatch.setenv("ANDVARANAUT_FUSED_GRAD", "2")
    bigfit._nlml_vg.clear_cache()
    v_int8, g_int8 = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, block=256)
    monkeypatch.setenv("ANDVARANAUT_MXU_DOT", "bf16")
    bigfit._nlml_vg.clear_cache()
    v_bf16, g_bf16 = bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), z, block=256)
    bigfit._nlml_vg.clear_cache()
    assert float(v_bf16) == float(v_int8)
    np.testing.assert_array_equal(np.asarray(g_bf16), np.asarray(g_int8))


def test_cholinv_mxu_syrk_parity(rng, monkeypatch):
    """CHOLINV_MXU=1 (the fused diag kernel's sub-block trailing syrk
    on the MXU via in-kernel int8 slice extraction) must match the
    rank-1 pair-loop kernel to the slice-product grade, and the
    factorisation built on it must keep its reconstruction grade."""
    from andvaranaut_tpu.gp import pallas_cholinv as pc

    n = 512
    K = _spd(n, rng, cond=1e6)
    Kj = jnp.asarray(K)
    monkeypatch.setenv("ANDVARANAUT_CHOLINV_MXU", "1")
    L1, X1, ok1 = pc.chol_inv_block_pair(Kj)
    monkeypatch.setenv("ANDVARANAUT_CHOLINV_MXU", "0")
    L0, X0, ok0 = pc.chol_inv_block_pair(Kj)
    pc.chol_inv_block_pair.clear_cache()
    assert bool(ok1) and bool(ok0)
    # the MXU syrk's ~2^-42 slice grade sits above the pair loop's
    # ~2^-48 but well below the OUTER factorisation's own 4e-11
    # trailing-product grade: the criteria that matter are the block
    # reconstruction (backward error) and the inverse consistency
    # (the hard-won substitution-grade constraint), both measured
    # ~1e-12 / ~2e-14 at cond 1e6
    rec = np.abs(np.tril(np.asarray(L1)) @ np.tril(np.asarray(L1)).T
                 - K).max()
    assert rec < 1e-10 * np.abs(K).max(), rec
    res = np.abs(np.eye(n) - np.tril(np.asarray(L1))
                 @ np.asarray(X1)).max()
    assert res < 1e-12, res
    dL = np.abs(np.asarray(L1) - np.asarray(L0)).max()
    assert dL < 1e-7 * np.abs(np.asarray(L0)).max(), dL


def test_fit_shrink_policy(monkeypatch):
    """Compile-bound programs (fit/MCMC vg, prediction conditioning)
    default to ONE Cholesky level (fit_shrink()=1, ~12 fewer Mosaic
    variants at 16k — benchmarks/compile_audit.py); an explicit
    ANDVARANAUT_CHOL_SHRINK overrides."""
    from andvaranaut_tpu.gp import bigfit

    monkeypatch.delenv("ANDVARANAUT_CHOL_SHRINK", raising=False)
    assert precision.fit_shrink() == 1
    assert bigfit._fit_shrink() == 1
    monkeypatch.setenv("ANDVARANAUT_CHOL_SHRINK", "4")
    assert precision.fit_shrink() == 4


def test_vg_passes_fit_shrink(rng, monkeypatch):
    """nlml_value_and_grad threads fit_shrink() into blocked_cholesky
    (the compile-policy plumbing, not the math — parity is covered by
    the grad-parity tests above)."""
    from andvaranaut_tpu.gp import bigfit

    monkeypatch.delenv("ANDVARANAUT_CHOL_SHRINK", raising=False)
    seen = {}
    real = precision.blocked_cholesky

    def spy(K, **kw):
        seen["shrink"] = kw.get("shrink")
        return real(K, **kw)

    monkeypatch.setattr(precision, "blocked_cholesky", spy)
    # unique n to force a fresh trace past the jit cache
    n = 24
    X = rng.uniform(size=(n, 2))
    y = rng.normal(size=n)
    bigfit.nlml_value_and_grad(
        jnp.asarray(X), jnp.asarray(y), jnp.zeros(4), block=8)
    assert seen["shrink"] == 1
