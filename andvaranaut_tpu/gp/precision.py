"""Mixed-precision dense linear algebra for TPU.

TPU has no native f64: XLA emulates it at ~17-65 GFLOP/s (measured on this
chip) while the MXU runs bf16 matmuls at tens of TFLOP/s.  For the O(N^3)
GP hot path (Gram, Cholesky trailing updates) we use *slice* arithmetic:
split each f64 operand into bf16 mantissa slices (8 bits each), take the
cross products on the MXU with f32 accumulation over K-chunks, and combine
chunk results in f64.  With 4 slices and 512-wide chunks this yields
~1e-7-grade matmuls at a large fraction of MXU speed — the "f64-emulated
accumulation" design of SURVEY.md §7.

`blocked_cholesky` is a right-looking blocked factorisation: diagonal
panels in true (emulated) f64 — O(N b^2) work — and the O(N^3) trailing
syrk updates through `slice_matmul`.  `blocked_solve_lower` implements the
matching forward substitution.  Exact-f64 paths remain the default at
small N and on CPU; precision='mixed' switches large-N fits onto this
path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_NSLICES = 4
DEFAULT_CHUNK_K = 512

#: int8-Ozaki mantissa slice count (the MXU work scales with the
#: ns(ns+1)/2 slice-pair products: 6 -> 21 pairs at ~4e-11 product
#: grade, 5 -> 15 pairs at ~5e-9).  5 was A/B'd as a -29%-MXU-work
#: candidate and REJECTED: the blocked factorisation NaNs at n=2048
#: (the trailing-update cancellation amplifies the 5e-9 product error
#: into the ~1e-4 Schur diagonals — the 6-slice grade is load-bearing,
#: exactly the accuracy-ladder argument).  Env knob kept for re-testing
#: on better-conditioned problems.
import os as _os

INT_NSLICES = int(_os.environ.get("ANDVARANAUT_INT_NSLICES", "6"))

# Diagonal-block triangular-inverse tuning (read at trace time).  The
# per-factorisation-step inverse is launch-bound: its blocked substitution
# runs ~6 tiny slice matmuls per sub-block step, so a larger base and
# fewer refinement passes cut most of its wall (measured on 16k, see
# docs/TPU_NOTES.md) while the substitution inverses stay f64-exact.
INV_BASE = 128
INV_SOLVE_ITERS = 2

# How aggressively the blocked Cholesky's masked full-height levels
# shrink: each level factors ceil(nb/CHOL_SHRINK) block columns at the
# current height, then statically slices the trailing submatrix.  Larger
# = less masked-update waste (2 -> ~1.7x ideal FLOPs, 4 -> ~1.25x) but
# more compiled level bodies (~log_{s/(s-1)}(nb)).  CHOL_SHRINK=1 means
# ONE full-height level (fewest compiled bodies); since the Pallas
# kernel's tile predication (row/col_start + lower_only) now skips the
# masked rows and the upper triangle on the MXU, the level shrinking
# only saves elementwise A-update bandwidth, not matmul FLOPs.
CHOL_SHRINK = int(_os.environ.get("ANDVARANAUT_CHOL_SHRINK", "4"))


def fit_shrink() -> int:
    """Cholesky level-shrink for COMPILE-bound programs (MAP/MCMC
    value+grad, prediction conditioning — few launches per compile).

    Each shrink level adds ~2 big Mosaic kernel variants to the program
    (~15-45 s of remote compile each, benchmarks/compile_audit.py:
    16k vg 22 variants at shrink=4 vs 10 at shrink=1), while shrink=1
    costs only ~3% per evaluation there (the 16k MAP fit measured
    365.4 s incl compile at shrink=1 vs 393.7 s at shrink=4, identical
    optimum).  Steady-state programs (the headline NLML bench) keep the
    CHOL_SHRINK default.  An explicit ANDVARANAUT_CHOL_SHRINK overrides
    both.  Read at trace time.
    """
    env = _os.environ.get("ANDVARANAUT_CHOL_SHRINK")
    if env is not None:
        return int(env)
    return 1


def _split_slices(A, nslices: int):
    """A (f64/f32) ~= sum of bf16 slices with descending 8-bit mantissa
    windows.

    The truncation step MUST NOT be a bf16 cast round-trip: under
    --xla_allow_excess_precision=true (set by some TPU compile services)
    XLA may elide `f64 -> bf16 -> f64`, which zeroes every residual and
    silently degrades the whole scheme to single-bf16 accuracy (measured
    2e-3 on hardware).  64-bit bitcasts and reduce_precision are rejected
    by the TPU X64 rewriter, so each step drops the residual to f32 (the
    rewriter's native hi-part extraction) and truncates to the bf16 grid
    by u32 mantissa masking — the bitcast forces materialisation, and the
    masked value casts to bf16 exactly."""
    mask = np.uint32(0xFFFF0000)  # f32 sign+exp+top 7 mantissa bits
    slices = []
    R = A
    for _ in range(nslices):
        r32 = R.astype(jnp.float32)
        u = jax.lax.bitcast_convert_type(r32, jnp.uint32)
        s_trunc = jax.lax.bitcast_convert_type(u & mask, jnp.float32)
        slices.append(s_trunc.astype(jnp.bfloat16))
        R = R - s_trunc.astype(A.dtype)
    return slices


def _pow2_row_scales(A, axis):
    """Power-of-two per-row (axis=1) or per-column (axis=0) scales such
    that A/scale lies in (-0.5, 0.5].

    Built by integer exponent-bit manipulation on f32 (floor(log2) from
    the biased exponent field, scale from bit-assembled 2^e): emulated-f64
    log2/exp2 on TPU are not exact, and an inexact "power of two" breaks
    the exactness of the slice decomposition."""
    m = jnp.max(jnp.abs(A), axis=axis, keepdims=True)
    m32 = jnp.maximum(m.astype(jnp.float32), jnp.float32(1e-30))
    u = jax.lax.bitcast_convert_type(m32, jnp.uint32)
    e_floor = ((u >> 23) & jnp.uint32(0xFF)).astype(jnp.int32) - 127
    e = jnp.clip(e_floor + 2, -120, 120)
    scale32 = jax.lax.bitcast_convert_type(
        ((e + 127).astype(jnp.uint32)) << 23, jnp.float32)
    return scale32.astype(A.dtype)


def _int_slices(As, nslices: int):
    """Integer mantissa slices of As in (-0.5, 0.5]: As ~= sum_k c_k 2^-7(k+1)
    with int8 c_k in [-64, 64].  All arithmetic exact (powers of two)."""
    slices = []
    R = As
    for _ in range(nslices):
        c = jnp.trunc(R * 128.0)
        slices.append(c.astype(jnp.int8))
        R = R * 128.0 - c
    return slices


def int_slice_matmul(A, B, nslices: int | None = None):
    """See _int_slice_matmul; resolves the configurable default OUTSIDE
    the jit so the slice count is the compile-cache key."""
    return _int_slice_matmul(
        A, B, nslices=INT_NSLICES if nslices is None else nslices)


@partial(jax.jit, static_argnames=("nslices",))
def _int_slice_matmul(A, B, nslices: int):
    """C = A @ B via the integer Ozaki scheme: power-of-two row/col
    scaling, int8 mantissa slices, and EXACT int32 accumulation on the
    MXU.  Product accuracy ~2^-40 relative — accurate enough that the
    blocked Cholesky's small Schur diagonals (and hence the
    log-determinant) come out to f64-grade, with no f32-accumulation
    floor.  int32 is exact up to k*64^2 < 2^31, i.e. k <= 2^19."""
    out_dtype = A.dtype
    sA = _pow2_row_scales(A, axis=1)   # (m, 1)
    sB = _pow2_row_scales(B, axis=0)   # (1, n)
    As = A / sA
    Bs = B / sB
    a_st = jnp.stack(_int_slices(As, nslices))   # (ns, m, k) int8
    b_st = jnp.stack(_int_slices(Bs, nslices))   # (ns, k, n) int8
    pairs = [(i, j) for i in range(nslices) for j in range(nslices - i)]
    i_idx = jnp.asarray([p[0] for p in pairs], dtype=jnp.int32)
    j_idx = jnp.asarray([p[1] for p in pairs], dtype=jnp.int32)
    # exact host-computed power-of-two weights per slice-pair order
    w = jnp.asarray(
        [2.0 ** (-7.0 * (s + 2)) for s in range(2 * nslices)],
        dtype=out_dtype)
    m, n = A.shape[0], B.shape[1]

    def body(C, pij):
        i, j = pij
        p = jax.lax.dot_general(
            jax.lax.dynamic_index_in_dim(a_st, i, keepdims=False),
            jax.lax.dynamic_index_in_dim(b_st, j, keepdims=False),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # scanned accumulation: one int32 product tensor live at a time
        return C + p.astype(out_dtype) * w[i + j], None

    C, _ = jax.lax.scan(
        body, jnp.zeros((m, n), dtype=out_dtype), (i_idx, j_idx))
    return C * (sA * sB)


@partial(jax.jit, static_argnames=("nslices", "chunk_k"))
def slice_matmul_bf16(A, B, nslices: int = DEFAULT_NSLICES,
                      chunk_k: int = DEFAULT_CHUNK_K):
    """C = A @ B with ~1e-7 accuracy on the MXU (bf16 slices, f32 chunk
    accumulation recombined in f64).  Faster but accumulation-limited;
    int_slice_matmul is the accuracy-critical default.
    """
    out_dtype = A.dtype
    m, k = A.shape
    k2, n = B.shape
    kp = ((k + chunk_k - 1) // chunk_k) * chunk_k
    if kp != k:
        A = jnp.pad(A, ((0, 0), (0, kp - k)))
        B = jnp.pad(B, ((0, kp - k), (0, 0)))
    nchunks = kp // chunk_k
    As = _split_slices(A, nslices)
    Bs = _split_slices(B, nslices)
    # (nchunks, nslices, m, ck) / (nchunks, nslices, ck, n); scanned over
    # chunks with an f64 accumulator so peak temp memory is one (m, n) f32
    # tile rather than the full (nchunks, m, n) batch.
    Ac = jnp.stack(
        [s.reshape(m, nchunks, chunk_k).transpose(1, 0, 2) for s in As],
        axis=1)
    Bc = jnp.stack([s.reshape(nchunks, chunk_k, n) for s in Bs], axis=1)

    def body(C, xs):
        a, b = xs  # (nslices, m, ck), (nslices, ck, n)
        for i in range(nslices):
            for j in range(nslices - i):
                p = jax.lax.dot_general(
                    a[i], b[j],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                C = C + p.astype(out_dtype)
        return C, None

    C, _ = jax.lax.scan(
        body, jnp.zeros((m, n), dtype=out_dtype), (Ac, Bc))
    return C


def slice_matmul(A, B, nslices: int = DEFAULT_NSLICES,
                 chunk_k: int = DEFAULT_CHUNK_K,
                 lower_only: bool = False, row_start=None, col_start=None,
                 col_end=None):
    """Accurate MXU matmul — integer-Ozaki path (see int_slice_matmul).

    On TPU the fused Pallas kernel (one HBM pass per output tile) replaces
    the XLA-composed 21-dot version: measured 1.8x faster at 16k and
    bit-identical.  CPU/tests keep the XLA composition (interpret-mode
    Pallas is orders slower).

    lower_only / row_start / col_start declare output regions that are
    zero or ignored by the caller (256-tile granular — see
    pallas_int_slice_matmul): the Pallas kernel skips lower_only /
    col_start tiles on the MXU and NEVER VISITS tile rows wholly above
    row_start (dynamic grid — their output is UNDEFINED and callers
    must mask rows < row_start, as the blocked factorisation's panel
    updates do).  col_end declares that the CALLER's B operand is zero
    at cols >= col_end (so those output tiles are exact zeros and skip
    the MXU).  The composed path applies tile-wise zeroing in the other
    three regions — a refinement of that contract — and leaves col_end
    alone (the true product is already zero there by the caller's
    guarantee)."""
    from .._config import is_tpu

    if is_tpu():
        from . import pallas_slicemm

        return pallas_slicemm.pallas_int_slice_matmul(
            A, B, lower_only=lower_only, row_start=row_start,
            col_start=col_start, col_end=col_end)
    C = int_slice_matmul(A, B)
    if lower_only or row_start is not None or col_start is not None:
        from . import pallas_slicemm as _ps

        m, n = C.shape
        ti = jnp.arange(m)[:, None] // _ps._TM
        tj = jnp.arange(n)[None, :] // _ps._TN
        keep = jnp.ones((m, n), bool)
        if lower_only:
            keep = keep & (ti >= tj)
        if row_start is not None:
            keep = keep & ((ti + 1) * _ps._TM > row_start)
        if col_start is not None:
            keep = keep & ((tj + 1) * _ps._TN > col_start)
        C = jnp.where(keep, C, 0.0)
    return C


@partial(jax.jit, static_argnames=("nslices", "chunk_k"))
def slice_syrk(A, nslices: int = DEFAULT_NSLICES,
               chunk_k: int = DEFAULT_CHUNK_K):
    """A @ A.T via slice arithmetic."""
    return slice_matmul(A, A.T, nslices=nslices, chunk_k=chunk_k)


#: tile size of the Pallas slice kernels — the granularity of every
#: tile-sparsity contract (lower_only / row_start / syrk_lower)
TILE = 256


def slice_syrk_lower(A, nslices: int = DEFAULT_NSLICES, row_start=None,
                     a_upper: bool = False):
    """A @ A.T with only lower-triangle TILE-tiles defined.

    On TPU this runs the triangular-grid Pallas kernel: the strictly-
    upper half of the output grid does not exist (no MXU work, no input
    DMA, no sequencing), and its entries are UNSPECIFIED — as are all
    tiles whose tile COLUMN lies wholly below row_start (the dynamic
    grid never visits them).  Consumers must mask on
    `tril_tiles & (col >= row_start)`.  The composed CPU path returns
    the full product (a valid refinement).
    row_start marks zero operand rows.
    a_upper: caller guarantees A[i, k] == 0 for k < i (e.g. A = L^-T);
    the kernel then skips k-chunks wholly left of each pair's row tile
    (exact — ~2/3 of the dense chunk work for a full triangle)."""
    from .._config import is_tpu

    if is_tpu():
        from . import pallas_slicemm

        return pallas_slicemm.pallas_int_slice_syrk_lower(
            A, row_start=row_start, a_upper=a_upper)
    return int_slice_matmul(A, A.T)


def slice_syrk_tn_lower(W, nslices: int = DEFAULT_NSLICES,
                        w_lower: bool = False):
    """W.T @ W with only lower-triangle TILE-tiles defined, W consumed
    in its NATIVE layout (no transposed operand anywhere — the
    transposed-LHS dot runs on the MXU directly).

    This is the K^-1 = L^-T L^-1 product fed with L^-1: feeding the
    A A^T kernel L^-T instead made XLA materialise per-use transposed
    copies of every f64 slice-extraction stage (~18 GB at 16k — the
    gradient pipeline's compile-time OOM).  The composed CPU path
    returns the full product (a valid refinement).
    w_lower: caller guarantees W[k, i] == 0 for k < i (exact k-chunk
    skip, ~2/3 of the dense chunk work)."""
    from .._config import is_tpu

    if is_tpu():
        from . import pallas_slicemm

        return pallas_slicemm.pallas_int_slice_syrk_tn_lower(
            W, w_lower=w_lower)
    return int_slice_matmul(W.T, W)


def _chol_f64(A):
    return jnp.linalg.cholesky(A)


#: optional grain at which diagonal blocks recurse through the mixed
#: blocked path instead of true emulated-f64 Cholesky (0 = disabled).
#: The 1024-block emulated-f64 diagonal factorisations are the single
#: most expensive stage of the 16k NLML — 1171 of 1921 ms, measured
#: differentially by benchmarks/chol_attrib.py — and they are LATENCY-
#: dominated (~73 ms each ~ 4.9 GFLOP/s, far under the 17-65 GFLOP/s
#: emulated-f64 envelope).  But recursing at 256 grain REGRESSED the
#: headline 1983 -> 2312 ms (measured on idle host): the inner per-step
#: tri_inv/panel/syrk machinery is itself launch-bound at these sizes
#: and costs more than the f64 chol it replaces.  Kept env-gated for
#: re-testing if the inner launch overheads shrink.
DIAG_BLOCK = int(_os.environ.get("ANDVARANAUT_DIAG_BLOCK", "0"))


def _chol_diag(Ajj, mixed: bool, nslices: int):
    """Factor a diagonal block: true f64 by default; above DIAG_BLOCK
    grain (when enabled) the mixed right-looking recursion (mutual
    recursion with _chol_steps terminates — the inner grain is strictly
    smaller)."""
    b = Ajj.shape[0]
    if (not mixed or DIAG_BLOCK <= 0 or b <= DIAG_BLOCK
            or b % DIAG_BLOCK):
        return _chol_f64(Ajj)
    A, _ = _chol_steps(Ajj, b // DIAG_BLOCK, DIAG_BLOCK, True, nslices)
    return jnp.tril(A)


#: f32-seeded diagonal-block Cholesky with mixed-precision Newton
#: refinement: 0 = off, 1 = auto (TPU only — on CPU native f64 chol is
#: fast and exact), 2 = force (CPU parity tests).  The emulated-f64
#: chol cost is LINEAR in rows (~0.065 ms/row: 16/34/71 ms at
#: 256/512/1024, benchmarks/f64chol_scaling.py) — a fixed ~1.06 s
#: sequential-row tax over the 16k factorisation at ANY block size,
#: the single largest stage of the headline NLML.  The f32 chol pays
#: ~10x less per row, and Newton refinement restores f64 grade on the
#: MXU (standard mixed-precision iterative refinement, cf. Higham).
SEED_CHOL = int(_os.environ.get("ANDVARANAUT_SEED_CHOL", "1"))
SEED_REFINE_ITERS = int(_os.environ.get("ANDVARANAUT_SEED_REFINE", "2"))

#: fused Pallas pair-arithmetic diagonal chol+inverse (pallas_cholinv):
#: 0 = off, 1 = auto (TPU only), 2 = force (CPU parity tests run it in
#: interpret mode).  ONE Mosaic call per <=512 diagonal block replaces
#: the seeded path's ~15 sequential slice-matmul/substitution programs:
#: measured IN-PROGRAM (the standalone number is the documented ~30 ms
#: per-launch Mosaic executable overhead — docs/TPU_NOTES.md
#: "Micro-benchmark trap") 2.9 ms per 512 block vs ~50 ms for the
#: seeded machinery per 1024 block, at equal (double-f32 pair ~ 1e-14)
#: accuracy.
FUSED_CHOL = int(_os.environ.get("ANDVARANAUT_FUSED_CHOL", "1"))


def _use_fast_diag() -> bool:
    """True when a diagonal block would take the fused-pair or seeded
    path (rather than emulated-f64 chol) — used to decide whether the
    single-block small-n factorisation is worth padding to their 128
    grain."""
    from .._config import is_tpu

    if FUSED_CHOL == 2 or SEED_CHOL == 2:
        return True
    return is_tpu() and (FUSED_CHOL == 1 or SEED_CHOL == 1)


def _pow2_sqrt_scales(v):
    """Exact power-of-two scales ~ sqrt(v): 2^((e+1)>>1) from the f32
    exponent field (emulated-f64 log2/exp2 are inexact on TPU; the
    scale only needs to be an exact power of two near sqrt(v))."""
    m32 = jnp.maximum(v.astype(jnp.float32), jnp.float32(1e-30))
    u = jax.lax.bitcast_convert_type(m32, jnp.uint32)
    e = ((u >> 23) & jnp.uint32(0xFF)).astype(jnp.int32) - 127
    eh = jnp.clip((e + 1) >> 1, -60, 60)
    scale32 = jax.lax.bitcast_convert_type(
        ((eh + 127).astype(jnp.uint32)) << 23, jnp.float32)
    return scale32.astype(v.dtype)


def _chol_inv_seeded(Ajj, nslices: int):
    """(L, L^-1) of an SPD diagonal block via an f32 Cholesky seed and
    mixed-precision Newton refinement on the MXU.

    Equilibrate to ~unit diagonal with exact pow2 scales, factor in f32
    (cheap), then refine L_{k+1} = L_k + L_k Phi(X0 E_k X0^T) with
    E_k = As - L_k L_k^T in slice arithmetic and X0 the substitution
    inverse of the seed; Phi(M) = tril(M,-1) + diag(M)/2.  Seed error
    ~ f32eps * cond contracts quadratically then linearly (prototype:
    residual 1e-15/2.4e-15/2.4e-13 after 2 iters at cond 1e4/1e6/1e7);
    The inverse is then taken by blocked SUBSTITUTION from the refined
    factor (`tri_inv_mixed`), NOT by Newton-correcting X0.  This is a
    hard-won constraint, not a style choice: the Newton-corrected
    inverse converges to a ~eps_slice*|Xs| LEFT-residual (~1e-8 at cond
    1e6) which passes any per-block residual gate — but the trailing
    Schur update needs the substitution inverse's ~1e-10 entrywise
    grade, because at (e.g.) a GP MAP-fit start point the trailing
    blocks sit on an ~1e-3 noise floor under O(1)-norm panels and the
    inverse error is amplified ~1e4x by the cancellation.  Measured on
    TPU at 16k: the Newton inverse at block 0 (gates green: factor
    residual 4e-10, inverse residual 9e-9) drives every later diagonal
    block indefinite — even the f64 fallback chol NaNs from block 1 on.
    A per-block gate cannot see this (it is a property of the global
    matrix), so the inverse path must be substitution-grade always.

    A residual check falls back to the emulated-f64 path under lax.cond
    when the seed is bad (cond >~1e7 or non-PD in f32 — detected via
    NaN or a collapsed seed diagonal), so accuracy never regresses —
    only speed."""
    b = Ajj.shape[0]
    dt = Ajj.dtype
    eye = jnp.eye(b, dtype=dt)
    d = _pow2_sqrt_scales(jnp.diag(Ajj))
    As = Ajj / d[:, None] / d[None, :]
    L0 = jnp.linalg.cholesky(As.astype(jnp.float32)).astype(dt)
    finite = jnp.isfinite(L0).all() & (jnp.min(jnp.diag(L0)) > 1e-6)
    L0 = jnp.tril(jnp.where(jnp.isfinite(L0), L0, eye))
    # The SEED inverse only preconditions the Newton sweeps — its grade
    # sets the contraction rate, not the final accuracy (the factor is
    # gated on its own residual E and the production inverse Xs below is
    # substitution-grade).  Unrefined blocked substitution (~1e-9 from
    # slice-product composition over the sub-block steps) contracts just
    # as hard as the refined ~4e-11 inverse, at a third of the Mosaic
    # launches (2 vs 6 slice matmuls per sub-block step).
    X0 = tri_inv_mixed(L0, nslices=nslices, solve_iters=0)
    mm = partial(slice_matmul, nslices=nslices)
    Ls = L0
    E = As - mm(Ls, Ls.T)
    for _ in range(SEED_REFINE_ITERS):
        M = mm(X0, mm(E, X0.T))
        Phi = jnp.tril(M, -1) + 0.5 * jnp.diag(jnp.diag(M))
        Ls = Ls + mm(Ls, Phi)
        E = As - mm(Ls, Ls.T)
    Xs = tri_inv_mixed(Ls, nslices=nslices)
    Rinv = eye - mm(Ls, Xs)
    good = (finite & jnp.isfinite(Ls).all() & jnp.isfinite(Xs).all()
            & (jnp.max(jnp.abs(E)) < 1e-8)
            & (jnp.max(jnp.abs(Rinv)) < 1e-6))

    def seeded(_):
        return Ls * d[:, None], Xs * (1.0 / d)[None, :]

    def fallback(_):
        L = _chol_f64(Ajj)
        return L, tri_inv_mixed(L, nslices=nslices)

    return jax.lax.cond(good, seeded, fallback, None)


#: slice count for the fused-recursion composition matmuls.  The 2x2
#: assembly multiplies TRIANGULAR-INVERSE operands whose entries reach
#: ~1/sqrt(lambda_min) (|X| ~ 1e2 on bench-typical noise-floor blocks),
#: and the int8-Ozaki absolute product error scales with the operand
#: row/col maxima: at the default 6 slices the composed X10 came out
#: ~1e-4-grade and the inner Schur complement ~5e-10 absolute on 1e-4
#: diagonals — measured 9x end-to-end NLML parity loss (7.3e-6 vs
#: 8.2e-7 at n=4096).  8 slices (36 vs 21 pair products) restore ~2^-56
#: relative-to-operand grade; the cost is 4 small (512-grain) matmuls
#: per diagonal block, negligible against the factorisation's trailing
#: updates.
FUSED_COMPOSE_NSLICES = int(
    _os.environ.get("ANDVARANAUT_FUSED_COMPOSE_NSLICES", "8"))


def _compose_mm(A, B):
    """High-grade slice matmul for the fused-recursion assembly (see
    FUSED_COMPOSE_NSLICES)."""
    from .._config import is_tpu

    if is_tpu():
        from . import pallas_slicemm

        return pallas_slicemm.pallas_int_slice_matmul(
            A, B, nslices=FUSED_COMPOSE_NSLICES)
    return int_slice_matmul(A, B, nslices=FUSED_COMPOSE_NSLICES)


def _chol_inv_fused(Ajj, nslices: int):
    """(L, L^-1) for a diagonal block through the fused Pallas pair
    kernel (pallas_cholinv): ONE Mosaic call per <=512 block instead of
    the seeded path's ~15 sequential slice-matmul/substitution
    programs.  Blocks larger than 512 (the VMEM bound: six b*b f32
    buffers) take one level of 2x2 blocked recursion — panel solve via
    the sub-block inverse, slice-arithmetic syrk, and the standard
    triangular-inverse assembly X10 = -X11 L10 X00 — so a 1024 block is
    2 fused calls + 4 high-grade slice matmuls (_compose_mm: the
    inverse operands are ~1e2 in magnitude, so the composition runs 8
    int8 slices where the factorisation's O(1)-operand updates need
    only 6).  Each <=512 sub-block carries its own finiteness/pivot
    gate and falls back to emulated-f64 chol + substitution inverse
    under lax.cond (pair pivots fail only when the equilibrated block
    is non-PD in f32 or cond >~1e13).  Value-only (no autodiff rule):
    every caller sits inside the closed-form gradient pipeline (bigfit)
    or value-only objectives."""
    from .pallas_cholinv import chol_inv_block_pair

    b = Ajj.shape[0]
    if b <= 512:
        L, X, ok = chol_inv_block_pair(Ajj)

        def fused(_):
            return L, X

        def fallback(_):
            Lf = _chol_f64(Ajj)
            return Lf, tri_inv_mixed(Lf, nslices=nslices)

        return jax.lax.cond(ok, fused, fallback, None)

    m = 512
    dt = Ajj.dtype
    mm = _compose_mm
    A00 = Ajj[:m, :m]
    A10 = Ajj[m:, :m]
    A11 = Ajj[m:, m:]
    L00, X00 = _chol_inv_fused(A00, nslices)
    L10 = mm(A10, X00.T)
    S = A11 - mm(L10, L10.T)
    S = 0.5 * (S + S.T)
    L11, X11 = _chol_inv_fused(S, nslices)
    X10 = -mm(X11, mm(L10, X00))
    zt = jnp.zeros((m, b - m), dt)
    L = jnp.concatenate([
        jnp.concatenate([L00, zt], axis=1),
        jnp.concatenate([L10, L11], axis=1)], axis=0)
    X = jnp.concatenate([
        jnp.concatenate([X00, zt], axis=1),
        jnp.concatenate([X10, X11], axis=1)], axis=0)
    return L, X


def _chol_inv_diag(Ajj, mixed: bool, nslices: int):
    """(Ljj, Ljj^-1) for one diagonal block of the blocked
    factorisation, choosing the seeded-refined path when profitable."""
    b = Ajj.shape[0]
    if not mixed:
        L = _chol_f64(Ajj)
        return L, jax.scipy.linalg.solve_triangular(
            L, jnp.eye(b, dtype=Ajj.dtype), lower=True)
    from .._config import is_tpu

    use_fused = FUSED_CHOL == 2 or (FUSED_CHOL == 1 and is_tpu())
    if use_fused and b >= 256 and b % 128 == 0:
        return _chol_inv_fused(Ajj, nslices)

    use_seed = SEED_CHOL == 2 or (SEED_CHOL == 1 and is_tpu())
    if use_seed and b >= 256 and b % 128 == 0:
        return _chol_inv_seeded(Ajj, nslices)
    L = _chol_diag(Ajj, mixed, nslices)
    return L, tri_inv_mixed(L, nslices=nslices)


def _subst_inv(L):
    """Dense lower-triangular inverse by classical forward substitution,
    row by row, in (emulated) f64 elementwise arithmetic.

    No XLA triangular_solve (multi-minute compile times on this TPU
    platform) and no Newton iteration (transient blow-up for ill-scaled
    factors — the nilpotent-convergence argument only holds in exact
    arithmetic).  Intended for small static b (the factorisation block);
    the row loop is a fori_loop so compile size is O(1) in b."""
    b = L.shape[0]
    idx = jnp.arange(b)

    def body(i, X):
        Lrow = jax.lax.dynamic_slice(L, (i, 0), (1, b))[0]
        Lrow = jnp.where(idx < i, Lrow, 0.0)
        # elementwise broadcast-reduce: emulated-f64 dot_general expands
        # into large f32 component tensors
        acc = jnp.sum(Lrow[:, None] * X, axis=0)
        e_i = jnp.where(idx == i, 1.0, 0.0).astype(L.dtype)
        diag = jax.lax.dynamic_slice(L, (i, i), (1, 1))[0, 0]
        Xi = (e_i - acc) / diag
        return jax.lax.dynamic_update_slice(X, Xi[None, :], (i, 0))

    X = jax.lax.fori_loop(0, b, body, jnp.zeros_like(L))
    return X


def tri_inv_mixed(L, nslices: int = DEFAULT_NSLICES, base: int | None = None,
                  solve_iters: int | None = None):
    """Lower-triangular inverse: substitution for small matrices, blocked
    substitution (via blocked_solve_lower with identity rhs and per-block
    substitution inverses) for larger ones.  Sizes not divisible by the
    block are identity-padded (inv([[L,0],[0,I]]) = [[L^-1,0],[0,I]]) so
    large inputs never fall back to the O(b) row-loop substitution.

    A batched binary-tree inverse (pair-merging
    inv([[A,0],[B,C]]) = [[Ai,0],[-Ci B Ai, Ci]]) was tried in round 2:
    ~O(base + log b) sequential chain, but the explicit inverse
    composition amplifies error ~quadratically with the factor's
    condition number — measured 3.0e-6 NLML error at 16k on real
    kernel-matrix factors, breaking the 1e-6 parity budget, for only a
    3% wall-clock win.  Substitution's linear error growth stays at
    4.8e-7; accuracy wins."""
    if base is None:
        base = INV_BASE
    if solve_iters is None:
        solve_iters = INV_SOLVE_ITERS
    b = L.shape[0]
    if b <= base:
        return _subst_inv(L)
    if b % base != 0:
        bp = -(-b // base) * base
        Lp = jnp.eye(bp, dtype=L.dtype).at[:b, :b].set(L)
        return tri_inv_mixed(Lp, nslices=nslices, base=base,
                             solve_iters=solve_iters)[:b, :b]
    nb = b // base
    Ldiag = jnp.stack([
        jax.lax.dynamic_slice(L, (j * base, j * base), (base, base))
        for j in range(nb)])
    Dinv = jax.vmap(_subst_inv)(Ldiag)
    eye = jnp.eye(b, dtype=L.dtype)
    return blocked_solve_lower(
        L, eye, block=base, nslices=nslices, Dinv=Dinv,
        solve_iters=solve_iters)


def _mv(M, v):
    """Exact-f64 matvec as an elementwise broadcast-reduce.

    XLA's emulated-f64 dot_general materialises O(m n) f32 component
    planes per slice pair (platform pathology), and the int8-Ozaki
    Pallas path pads single-column rhs to a 256-wide tile (256x wasted
    MXU work); the fused elementwise form is both exact and the fastest
    option for vector rhs."""
    return jnp.sum(M * v[None, :], axis=1)


def tri_solve_mixed(L, b, trans: int = 0, iters: int = 2,
                    nslices: int = DEFAULT_NSLICES, Linv=None,
                    col_end=None):
    """Solve L x = b (or L^T x = b) via an explicit mixed-precision
    triangular inverse plus residual refinement (no XLA trsm; see
    tri_inv_mixed).  Vector rhs goes through exact-f64 broadcast-reduce
    matvecs (no refinement needed); matrix rhs through slice_matmul.

    col_end: caller guarantees b's columns >= col_end are exact zeros;
    every product in the solve+refinement then has exact-zero columns
    there too (zero columns are preserved by left-multiplication and by
    the kernel's exact-zero tile writes), so those tiles skip the MXU."""
    if Linv is None:
        Linv = tri_inv_mixed(L, nslices=nslices)
    if b.ndim == 1:
        A = L.T if trans else L
        X = Linv.T if trans else Linv
        x = _mv(X, b)
        for _ in range(min(iters, 1)):  # Linv is ~4e-11; one pass suffices
            x = x + _mv(X, b - _mv(A, x))
        return x
    Lop = (lambda v: slice_matmul(
        L.T if trans else L, v, nslices=nslices, col_end=col_end))
    Xop = (lambda v: slice_matmul(
        Linv.T if trans else Linv, v, nslices=nslices, col_end=col_end))

    def body(_, x):
        r = b - Lop(x)
        return x + Xop(r)

    return jax.lax.fori_loop(0, iters, body, Xop(b))


#: carry the factorisation's trailing matrix as an (hi, lo) f32 pair and
#: fuse the trailing-update subtraction into the Pallas syrk kernel
#: (pallas_int_slice_syrk_sub_pair): 0 = off, 1 = auto (TPU only),
#: 2 = force (CPU parity tests, interpret mode).  The f64-carry path's
#: `A - where(upd, Csy, 0)` is a full-matrix XLA elementwise pass per
#: step — measured ~30 ms per 16k^2 pass (pure HBM traffic: an f32 pass
#: costs the same, benchmarks/gram_breakdown.py), ~200 ms across the
#: 16k factorisation.  The fused kernel updates live lower tiles in
#: place (input_output_aliases) and unvisited tiles pass through, so
#: the masking pass disappears entirely.  Pair grade ~2^-48 sits above
#: the int8-slice product's ~2^-42 truncation grade: factor accuracy is
#: unchanged (parity-tested).
PAIR_CARRY = int(_os.environ.get("ANDVARANAUT_PAIR_CARRY", "1"))


def _use_pair_carry(block: int, n: int) -> bool:
    from .._config import is_tpu

    if block % TILE or n % TILE:
        return False
    return PAIR_CARRY == 2 or (PAIR_CARRY == 1 and is_tpu())


def _pair_split(A):
    hi = A.astype(jnp.float32)
    return hi, (A - hi.astype(A.dtype)).astype(jnp.float32)


def _chol_steps_pair(Ahi, Alo, nsteps: int, block: int, nslices: int,
                     dt):
    """`nsteps` factorisation steps with the trailing matrix carried as
    an (hi, lo) f32 pair; the trailing syrk update runs fused in-place
    in the Pallas kernel (see PAIR_CARRY).  Finished L columns
    accumulate pair-split in the planes' lower triangle.

    With ANDVARANAUT_FUSED_PANEL (default OFF — measured 498.4 vs
    469.7 ms end-to-end on the 16k headline: XLA already fuses the
    eliminated glue into a few cheap passes; enable via the env knob
    for A/Bs only) the whole panel stage runs in-kernel: the column
    block is sliced from the pair carry directly, the panel product
    lands in the carry in place, and the trailing syrk consumes
    pre-extracted slices — removing ~25 full-matrix XLA glue passes
    per step (pallas_panel docstring).  The
    stale strictly-upper values this leaves in the carry's finished
    columns are never consumed: every later read is tril-masked or
    row_start-gated (callers of _chol_steps_pair tril() the planes)."""
    from . import pallas_panel, pallas_slicemm

    m = Ahi.shape[0]
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    fused_panel = pallas_panel.use_fused_panel() and block % TILE == 0

    def body(j, carry):
        Ahi, Alo, Dinv = carry
        lo = j * block
        Ajj = (
            jax.lax.dynamic_slice(Ahi, (lo, lo), (block, block)).astype(dt)
            + jax.lax.dynamic_slice(Alo, (lo, lo), (block, block)).astype(dt))
        # only the lower triangle of the carry is maintained
        Ajj = jnp.tril(Ajj) + jnp.tril(Ajj, -1).T
        Ljj, Linv = _chol_inv_diag(Ajj, True, nslices)
        Dinv = jax.lax.dynamic_update_slice(Dinv, Linv[None], (j, 0, 0))
        if fused_panel:
            rs = lo + block
            Ahi, Alo = pallas_panel.panel_into_carry(
                Ahi, Alo, Linv, lo, rs, block)
            Ljh, Ljl = _pair_split(Ljj)
            Ahi = jax.lax.dynamic_update_slice(Ahi, Ljh, (lo, lo))
            Alo = jax.lax.dynamic_update_slice(Alo, Ljl, (lo, lo))
            p_sl, saP = pallas_panel.pair_to_slices(
                Ahi, Alo, lo, rs, block)
            Ahi, Alo = (
                pallas_slicemm.pallas_int_slice_syrk_sub_pair_presliced(
                    Ahi, Alo, p_sl, saP, row_start=rs))
            return Ahi, Alo, Dinv
        cols = (
            jax.lax.dynamic_slice(Ahi, (0, lo), (m, block)).astype(dt)
            + jax.lax.dynamic_slice(Alo, (0, lo), (m, block)).astype(dt))
        below = row_idx >= lo + block
        panel = jnp.where(
            below,
            slice_matmul(cols, Linv.T, nslices=nslices,
                         row_start=lo + block), 0.0)
        # fused in-place trailing update: unvisited tiles (upper
        # triangle, finished columns left of the trailing submatrix)
        # pass through — no masking pass.  The slice count resolves to
        # INT_NSLICES inside, like every other production slice call
        # (the legacy `nslices` arg of blocked_cholesky is NOT honoured
        # by the TPU dispatches in slice_matmul/slice_syrk_lower).
        Ahi, Alo = pallas_slicemm.pallas_int_slice_syrk_sub_pair(
            Ahi, Alo, panel, row_start=lo + block)
        Lcol = jax.lax.dynamic_update_slice(panel, Ljj, (lo, 0))
        Lch, Lcl = _pair_split(Lcol)
        Ahi = jax.lax.dynamic_update_slice(Ahi, Lch, (0, lo))
        Alo = jax.lax.dynamic_update_slice(Alo, Lcl, (0, lo))
        return Ahi, Alo, Dinv

    Dinv0 = jnp.zeros((nsteps, block, block), dtype=dt)
    return jax.lax.fori_loop(0, nsteps, body, (Ahi, Alo, Dinv0))


def _chol_steps(A, nsteps: int, block: int, mixed: bool, nslices: int):
    """`nsteps` right-looking factorisation steps on the active (m, m)
    submatrix A, with fixed-shape masked full-height updates (ONE compiled
    fori body per active size).  Finished L columns accumulate in A's
    lower triangle; returns (A, (nsteps, block, block) diagonal-block
    inverses)."""
    m = A.shape[0]
    mm = (
        partial(slice_matmul, nslices=nslices) if mixed
        else lambda a, b: a @ b
    )
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    def body(j, carry):
        # in-place factorisation: finished L columns live in A's lower
        # triangle (single full-size carry — two full f64 carries OOM at
        # N=16k on a 16G-HBM chip once XLA double-buffers the emulated-f64
        # planes).  Diagonal-block inverses are kept: every later solve
        # reuses them instead of re-running triangular inversions.
        A, Dinv = carry
        lo = j * block
        Ajj = jax.lax.dynamic_slice(A, (lo, lo), (block, block))
        if mixed:
            # the predicated syrk below maintains only A's lower
            # triangle: rebuild the diagonal block's upper half from it
            Ajj = jnp.tril(Ajj) + jnp.tril(Ajj, -1).T
        Ljj, Linv = _chol_inv_diag(Ajj, mixed, nslices)
        Dinv = jax.lax.dynamic_update_slice(
            Dinv, Linv[None], (j, 0, 0))
        cols = jax.lax.dynamic_slice(A, (0, lo), (m, block))
        below = row_idx >= lo + block
        if mixed:
            # panel rows above the trailing submatrix are discarded by
            # the mask; tell the kernel so it skips them on the MXU
            panel = jnp.where(
                below, mm(cols, Linv.T, row_start=lo + block), 0.0)
            # trailing syrk is symmetric with zero rows/cols above the
            # trailing submatrix, and only the lower triangle of A is
            # ever consumed: the triangular-grid kernel computes (and
            # DMAs) lower-triangle tiles only, and its DYNAMIC grid
            # stops before the dead tile columns left of the trailing
            # submatrix — the dominant MXU work, input streaming and
            # grid sequencing shrink to the live trailing triangle.
            # Unvisited tiles are UNDEFINED: the update mask must
            # exclude both the upper tile triangle and the dead columns
            # (it fuses into the subtraction as a single select).
            Csy = slice_syrk_lower(panel, nslices=nslices,
                                   row_start=lo + block)
            col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
            tri = (row_idx // TILE) >= (col_idx // TILE)
            upd = tri & (col_idx >= lo + block)
            A = A - jnp.where(upd, Csy, 0.0)
        else:
            panel = jnp.where(below, mm(cols, Linv.T), 0.0)
            # trailing syrk; masked panel rows make this a no-op outside
            # the trailing submatrix
            A = A - mm(panel, panel.T)
        # write the finished column block (diagonal + sub-diagonal panel)
        Lcol = jax.lax.dynamic_update_slice(panel, Ljj, (lo, 0))
        A = jax.lax.dynamic_update_slice(A, Lcol, (0, lo))
        return A, Dinv

    Dinv0 = jnp.zeros((nsteps, block, block), dtype=A.dtype)
    return jax.lax.fori_loop(0, nsteps, body, (A, Dinv0))


def blocked_cholesky(K, block: int = 256, mixed: bool = True,
                     nslices: int = DEFAULT_NSLICES,
                     return_inv: bool = False, shrink: int | None = None):
    """Right-looking blocked Cholesky with dyadically-shrinking height.

    Diagonal factorisations run in true f64 (cheap O(N b^2) emulated work);
    the O(N^3) panel products and trailing syrk updates run through
    slice_matmul when mixed=True.

    Masked full-height updates keep every level's fori body a single
    compiled program (per-shape TPU compiles cost minutes on this
    platform), but a SINGLE full-height loop pays ~3x the shrinking-loop
    FLOPs.  Instead the factorisation halves: factor the first half of
    the active submatrix's block columns at its height, then statically
    slice the bottom-right half and recurse — ~log2(nb) compiled bodies,
    total syrk work ~1.7x ideal instead of 3x (measured 2.9 s -> see
    TPU_NOTES for the round-2 number at 16k).

    shrink: overrides the module CHOL_SHRINK level-shrink factor for
    this factorisation (1 = ONE full-height level).  Every level is
    ~2 extra big Mosaic kernel variants (~15-45 s of remote compile
    each, benchmarks/compile_audit.py): compile-bound workflows (MAP
    fits, host MCMC) pass 1; steady-state programs (the headline bench)
    keep the env default 4.
    """
    shrink_f = CHOL_SHRINK if shrink is None else max(int(shrink), 1)
    n0 = K.shape[0]
    if n0 <= block:
        if return_inv and mixed and _use_fast_diag():
            # single-block factorisation: route through the fused pair
            # kernel / seeded path instead of the emulated-f64 chol.
            # This is the leapfrog-dominating cost of small-n GP MCMC on
            # TPU (n=256: ~16 ms of emulated-f64 chol per objective
            # evaluation vs ~1.5 ms for one fused Mosaic call).  Shapes
            # off the 128 grain are identity-padded — exact:
            # chol([[K,0],[0,I]]) = [[chol(K),0],[0,I]] and likewise for
            # the inverse, so the slice-back loses nothing.
            bp = max(-(-n0 // 128) * 128, 256)
            Kp = (
                K if bp == n0
                else jnp.eye(bp, dtype=K.dtype).at[:n0, :n0].set(K))
            L, Linv = _chol_inv_diag(Kp, True, nslices)
            return L[:n0, :n0], Linv[:n0, :n0][None]
        L = _chol_f64(K)
        if return_inv:
            return L, tri_inv_mixed(L, nslices=nslices)[None]
        return L
    nb = -(-n0 // block)
    n = nb * block
    if n != n0:
        # pad with identity to keep the factorisation well-posed
        Kp = jnp.eye(n, dtype=K.dtype)
        Kp = Kp.at[:n0, :n0].set(K)
        K = Kp

    L = jnp.zeros((n, n), dtype=K.dtype)
    Dparts = []
    pair = mixed and _use_pair_carry(block, n)
    if pair:
        Ahi, Alo = _pair_split(K)
    else:
        A = K
    offset = 0
    m = n
    while True:
        nbl = m // block
        if nbl == 1:
            if pair:
                A = Ahi.astype(K.dtype) + Alo.astype(K.dtype)
            if mixed:
                # predicated syrk levels maintain only the lower triangle
                A = jnp.tril(A) + jnp.tril(A, -1).T
            Ljj, Linv = _chol_inv_diag(A, mixed, nslices)
            L = jax.lax.dynamic_update_slice(L, Ljj, (offset, offset))
            Dparts.append(Linv[None])
            break
        nsteps = max(-(-nbl // shrink_f), 1)
        h = nsteps * block
        if pair:
            Ahi, Alo, Dpart = _chol_steps_pair(
                Ahi, Alo, nsteps, block, nslices, K.dtype)
            Lpart = jnp.tril(
                Ahi[:, :h].astype(K.dtype) + Alo[:, :h].astype(K.dtype))
            Ahi = Ahi[h:, h:]
            Alo = Alo[h:, h:]
        else:
            A, Dpart = _chol_steps(A, nsteps, block, mixed, nslices)
            Lpart = jnp.tril(A)[:, :h]
            A = A[h:, h:]
        L = jax.lax.dynamic_update_slice(L, Lpart, (offset, offset))
        Dparts.append(Dpart)
        offset += h
        m -= h
        if m == 0:  # CHOL_SHRINK=1: the single level factored everything
            break

    Dinv = jnp.concatenate(Dparts, axis=0)
    if n != n0:
        L = L[:n0, :n0]
    if return_inv:
        return L, Dinv
    return L


def blocked_solve_lower(L, b, block: int = 256, mixed: bool = True,
                        nslices: int = DEFAULT_NSLICES, Dinv=None,
                        solve_iters: int = 2, rhs_lower: bool = False):
    """Solve L x = b (L lower-triangular) by blocked forward substitution:
    sequential diagonal-block solves (via stored/Newton inverses) + MXU
    off-diagonal products.  When Dinv is given, the step grain is its
    stored grain (Dinv.shape[1]), overriding `block`.

    rhs_lower: caller guarantees b's block-row j is zero at columns
    >= (j+1)*block (e.g. b = I, giving x = L^-1): each residual
    update's product is then exactly zero right of the current block
    column and the kernel skips those tiles (col_end)."""
    if Dinv is not None:
        block = Dinv.shape[1]
    n = L.shape[0]
    if n <= block or n % block != 0:
        return (
            tri_solve_mixed(
                L, b, nslices=nslices, iters=solve_iters,
                Linv=(Dinv[0] if Dinv is not None and n <= block else None))
            if mixed
            else jax.scipy.linalg.solve_triangular(L, b, lower=True))
    squeeze = b.ndim == 1
    k = 1 if squeeze else b.shape[1]
    nb = n // block
    if mixed and squeeze:
        # vector rhs: exact-f64 broadcast-reduce matvecs (see _mv)
        def mm(a, c):
            return _mv(a, c)
    elif mixed:
        mm = partial(slice_matmul, nslices=nslices)
    else:
        def mm(a, c):
            return a @ c

    def blk_solve(j, Lb, r):
        if not mixed:
            return jax.scipy.linalg.solve_triangular(Lb, r, lower=True)
        Linv = (
            jax.lax.dynamic_index_in_dim(Dinv, j, keepdims=False)
            if Dinv is not None else None)
        # rhs_lower: this block-row's rhs has exact-zero columns right
        # of its own block column — the diag solves and their
        # refinement products skip those tiles too
        ce = (j * block + block) if (rhs_lower and not squeeze) else None
        return tri_solve_mixed(Lb, r, nslices=nslices, Linv=Linv,
                               iters=solve_iters, col_end=ce)

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def body(j, carry):
        r, x = carry
        lo = j * block
        Lblk = jax.lax.dynamic_slice(L, (lo, lo), (block, block))
        rblk = (
            jax.lax.dynamic_slice(r, (lo,), (block,)) if squeeze
            else jax.lax.dynamic_slice(r, (lo, 0), (block, k)))
        xj = blk_solve(j, Lblk, rblk)
        x = (
            jax.lax.dynamic_update_slice(x, xj, (lo,)) if squeeze
            else jax.lax.dynamic_update_slice(x, xj, (lo, 0)))
        Lcol = jnp.where(
            row_idx >= lo + block,
            jax.lax.dynamic_slice(L, (0, lo), (n, block)), 0.0)
        if mixed and not squeeze:
            # residual rows above the trailing blocks are never read
            # again (step j' > j only reads rows >= lo + block, and the
            # returned solution is assembled from the xj's) — tell the
            # kernel so its dynamic grid never visits those row tiles.
            # Their r entries become UNDEFINED, which is fine by the
            # same argument; halves the solve's MXU work on average.
            # col_end: for a lower-triangular-structured rhs (the
            # identity solve), xj's columns right of the current block
            # column are EXACT ZEROS (b zero there -> Linv@b zero ->
            # int-slice refinement of zeros is zero), so the product is
            # zero there too — declare it and the kernel skips those
            # tiles' MXU work (the live corner is ~1/3 of the square).
            ce = (lo + block) if rhs_lower else None
            r = r - slice_matmul(Lcol, xj, nslices=nslices,
                                 row_start=lo + block, col_end=ce)
        else:
            r = r - mm(Lcol, xj)
        return r, x

    _, x = jax.lax.fori_loop(0, nb, body, (b, jnp.zeros_like(b)))
    return x


def _inv_lower_pair(L, Dinv, block: int, nslices: int, solve_iters: int):
    """Blocked forward-substitution identity solve with the residual
    matrix carried as an (hi, lo) f32 pair and each step's trailing
    update fused IN PLACE into the Pallas kernel
    (pallas_int_slice_mm_sub_pair) — the finished solution block-rows
    are written INTO the same carry, so the whole solve holds ONE
    (n, n) pair instead of the separate residual + solution + product
    f64 buffers of the generic matrix-rhs path (which pushed the 16k
    gradient pipeline to a 20.6 GB compile-time HBM peak).

    Upper-strict entries stay EXACTLY zero by construction: the carry
    starts as I (f32-exact), updates only touch rows >= row_start and
    cols < col_end (both strictly-lower regions at every step), and
    each solved block-row is exact-zero right of its block column
    (zero rhs -> zero products -> zero refinements).  Returns the
    (hi, lo) pair of L^-1."""
    from . import pallas_slicemm

    n = L.shape[0]
    nb = n // block
    dt = L.dtype
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def body(j, carry):
        rhi, rlo = carry
        lo = j * block
        rblk = (
            jax.lax.dynamic_slice(rhi, (lo, 0), (block, n)).astype(dt)
            + jax.lax.dynamic_slice(rlo, (lo, 0), (block, n)).astype(dt))
        Lblk = jax.lax.dynamic_slice(L, (lo, lo), (block, block))
        Linvj = (
            jax.lax.dynamic_index_in_dim(Dinv, j, keepdims=False)
            if Dinv is not None else None)
        xj = tri_solve_mixed(Lblk, rblk, nslices=nslices, Linv=Linvj,
                             iters=solve_iters, col_end=lo + block)
        xh, xl = _pair_split(xj)
        rhi = jax.lax.dynamic_update_slice(rhi, xh, (lo, 0))
        rlo = jax.lax.dynamic_update_slice(rlo, xl, (lo, 0))
        Lcol = jnp.where(
            row_idx >= lo + block,
            jax.lax.dynamic_slice(L, (0, lo), (n, block)), 0.0)
        # nslices resolves to INT_NSLICES inside, like every other
        # production slice call (the legacy DEFAULT_NSLICES=4 arg is a
        # bf16-scheme relic and 100x too coarse for the solve)
        rhi, rlo = pallas_slicemm.pallas_int_slice_mm_sub_pair(
            rhi, rlo, Lcol, xj,
            row_start=lo + block, col_end=lo + block)
        return rhi, rlo

    init = (jnp.eye(n, dtype=jnp.float32), jnp.zeros((n, n), jnp.float32))
    return jax.lax.fori_loop(0, nb, body, init)


def blocked_inv_lower(L, Dinv=None, block: int = 256,
                      nslices: int = DEFAULT_NSLICES,
                      solve_iters: int = 2, return_pair: bool = False):
    """Full triangular inverse X = L^-1 (L lower), native layout.

    On the pair-carry path (TPU, or PAIR_CARRY=2 for CPU parity tests)
    this runs `_inv_lower_pair` — one in-place (hi, lo) carry, no eye /
    solution / product f64 temporaries, exact-zero upper triangle with
    no tril pass.  Otherwise it falls back to the generic identity
    solve (blocked_solve_lower with rhs_lower) plus a tril mask, since
    that path's row_start-compacted updates leave rows above the
    current step UNDEFINED.

    return_pair=True returns the (hi, lo) f32 pair instead of the f64
    assembly — the pre-sliced K^-1 syrk consumes it directly
    (pallas_panel.pair_to_slices_cols), skipping two full-matrix
    assembly passes."""
    if Dinv is not None:
        block = Dinv.shape[1]
    n = L.shape[0]
    dt = L.dtype
    if n <= block:
        X = jnp.tril(
            Dinv[0] if Dinv is not None else tri_inv_mixed(
                L, nslices=nslices))
        return _pair_split(X) if return_pair else X
    if n % block == 0 and _use_pair_carry(block, n):
        rhi, rlo = _inv_lower_pair(L, Dinv, block, nslices, solve_iters)
        if return_pair:
            return rhi, rlo
        return rhi.astype(dt) + rlo.astype(dt)
    X = jnp.tril(blocked_solve_lower(
        L, jnp.eye(n, dtype=dt), block=block, nslices=nslices,
        Dinv=Dinv, solve_iters=solve_iters, rhs_lower=True))
    return _pair_split(X) if return_pair else X


@jax.custom_vjp
def solve_lower_linear(L, b, Dinv):
    """blocked_solve_lower as a LINEAR operator in the rhs b for autodiff.

    The mixed substitution path contains int8-Ozaki slice extraction
    (rounding + exponent-bit assembly) whose autodiff is undefined; this
    wrapper supplies the exact adjoint of the linear map b -> L^-1 b,
    namely ct -> L^-T ct through the blocked upper solve.  L and Dinv are
    conditioning state and MUST be held constant under differentiation
    (their cotangents are returned as zero) — true in every caller (BO
    acquisition gradients wrt query points)."""
    return blocked_solve_lower(L, b, Dinv=Dinv)


def _solve_lower_linear_fwd(L, b, Dinv):
    return solve_lower_linear(L, b, Dinv), (L, Dinv)


def _solve_lower_linear_bwd(res, ct):
    L, Dinv = res
    ctb = blocked_solve_upper(L, ct, Dinv=Dinv)
    return jnp.zeros_like(L), ctb, jnp.zeros_like(Dinv)


solve_lower_linear.defvjp(_solve_lower_linear_fwd, _solve_lower_linear_bwd)


def blocked_solve_upper(L, b, block: int = 256, mixed: bool = True,
                        nslices: int = DEFAULT_NSLICES, Dinv=None):
    """Solve L^T x = b by blocked backward substitution (L lower-tri).
    When Dinv is given, the step grain is its stored grain."""
    if Dinv is not None:
        block = Dinv.shape[1]
    n = L.shape[0]
    if n <= block or n % block != 0:
        return (
            tri_solve_mixed(
                L, b, trans=1, nslices=nslices,
                Linv=(Dinv[0] if Dinv is not None and n <= block else None))
            if mixed
            else jax.scipy.linalg.solve_triangular(L, b, lower=True, trans=1))
    squeeze = b.ndim == 1
    k = 1 if squeeze else b.shape[1]
    nb = n // block
    if mixed and squeeze:
        def mm(a, c):
            return _mv(a, c)
    elif mixed:
        mm = partial(slice_matmul, nslices=nslices)
    else:
        def mm(a, c):
            return a @ c

    def blk_solve_t(j, Lb, r):
        if not mixed:
            return jax.scipy.linalg.solve_triangular(
                Lb, r, lower=True, trans=1)
        Linv = (
            jax.lax.dynamic_index_in_dim(Dinv, j, keepdims=False)
            if Dinv is not None else None)
        return tri_solve_mixed(Lb, r, trans=1, nslices=nslices, Linv=Linv)

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def body(jj, carry):
        r, x = carry
        j = nb - 1 - jj
        lo = j * block
        Lblk = jax.lax.dynamic_slice(L, (lo, lo), (block, block))
        rblk = (
            jax.lax.dynamic_slice(r, (lo,), (block,)) if squeeze
            else jax.lax.dynamic_slice(r, (lo, 0), (block, k)))
        xj = blk_solve_t(j, Lblk, rblk)
        x = (
            jax.lax.dynamic_update_slice(x, xj, (lo,)) if squeeze
            else jax.lax.dynamic_update_slice(x, xj, (lo, 0)))
        # propagate to rows above: r[:lo] -= L[lo:hi, :lo]^T @ xj; mask rows
        # >= lo of the (transposed) row panel to zero
        Lrow = jnp.where(
            row_idx >= lo,
            0.0,
            jax.lax.dynamic_slice(L, (lo, 0), (block, n)).T)
        r = r - mm(Lrow, xj)
        return r, x

    _, x = jax.lax.fori_loop(0, nb, body, (b, jnp.zeros_like(b)))
    return x


def refined_chol_solve(L, K, y, block: int = 256,
                       nslices: int = DEFAULT_NSLICES, iters: int = 2,
                       Dinv=None):
    """Solve K x = y through the mixed factorisation with iterative
    refinement: residuals in true f64 (O(N^2), cheap) knock the
    slice-arithmetic error down to f64 grade even at high condition
    numbers."""

    def solve(b):
        z = blocked_solve_lower(L, b, block=block, nslices=nslices,
                                Dinv=Dinv)
        return blocked_solve_upper(L, z, block=block, nslices=nslices,
                                   Dinv=Dinv)

    def body(_, x):
        # True-f64 residual as an elementwise broadcast-reduce: XLA's
        # emulated-f64 dot_general materialises O(N^2) f32 component
        # matrices (OOM at 16k); the elementwise form fuses.
        r = y - jnp.sum(K * x[None, :], axis=1)
        return x + solve(r)

    # first pass solves from x=0 (residual y); the rest refine
    return jax.lax.fori_loop(0, iters + 1, body, jnp.zeros_like(y))


def pcg_solve(K, b, L, Dinv=None, block: int = 256,
              nslices: int = DEFAULT_NSLICES, iters: int = 12):
    """Solve K x = b by preconditioned conjugate gradients with the mixed
    blocked factorisation as preconditioner.

    Plain iterative refinement x <- x + S(b - Kx) stalls once the
    factorisation residual E = K - LL^T is comparable to the noise floor
    (measured: |r|/|b| floors at ~5e-5 at 16k with gv=2e-4 — no
    contraction in the small-eigenvalue subspace).  PCG only needs
    S^-1 K well-conditioned, which it is (~1 + |K^-1 E|), so a dozen
    iterations reach f64 grade: each costs one exact-f64 elementwise
    matvec (O(N^2), fused) plus one preconditioner solve (exact-f64
    vector path through the stored block inverses)."""

    def S(r):
        z = blocked_solve_lower(L, r, block=block, nslices=nslices,
                                Dinv=Dinv)
        return blocked_solve_upper(L, z, block=block, nslices=nslices,
                                   Dinv=Dinv)

    def Kmv(x):
        # f64 elementwise broadcast-reduce (emulated-f64 dot_general is a
        # platform pathology)
        return jnp.sum(K * x[None, :], axis=1)

    x0 = jnp.zeros_like(b)
    z0 = S(b)

    def body(_, carry):
        x, r, p, rz = carry
        Kp = Kmv(p)
        denom = jnp.dot(p, Kp)
        a = jnp.where(denom > 0.0, rz / denom, 0.0)
        x = x + a * p
        r = r - a * Kp
        z = S(r)
        rz_new = jnp.dot(r, z)
        beta = jnp.where(rz > 0.0, rz_new / rz, 0.0)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(
        0, iters, body, (x0, b, z0, jnp.dot(b, z0)))
    return x


#: refinement sweeps for the NLML quadratic-form solve (each costs one
#: full L read per lower+upper pass).  Refinement stalls at the
#: factorisation-residual floor anyway (TPU_NOTES "Large-N prediction"),
#: so extra sweeps buy little once the factor grade dominates; knob for
#: on-chip A/B.
NLML_REFINE = int(_os.environ.get("ANDVARANAUT_NLML_REFINE", "2"))


def mixed_nlml(K, y, block: int = 256, nslices: int = DEFAULT_NSLICES,
               refine_iters: int | None = None):
    """Gaussian log marginal likelihood via the mixed-precision blocked
    factorisation.  The quadratic form uses iteratively-refined solves; the
    log-determinant comes from the factor diagonal."""
    import math

    if refine_iters is None:
        refine_iters = NLML_REFINE

    L, Dinv = blocked_cholesky(
        K, block=block, mixed=True, nslices=nslices, return_inv=True)
    x = refined_chol_solve(L, K, y, block=block, nslices=nslices,
                           iters=refine_iters, Dinv=Dinv)
    return (
        -0.5 * jnp.dot(y, x)
        - jnp.sum(jnp.log(jnp.diag(L)))
        - 0.5 * y.shape[0] * math.log(2.0 * math.pi)
    )
