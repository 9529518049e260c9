"""Pallas TPU kernel for the integer-Ozaki slice matmul.

`precision.int_slice_matmul` dispatches ~21 separate int8 dot_generals,
each round-tripping an (m, n) int32 partial through HBM.  This kernel
fuses the whole slice-pair reduction per output tile: all pair products
accumulate in VMEM int32 scratch grouped by slice order, and the groups
are combined with exact power-of-two weights into a two-float (hi, lo)
f32 pair — one HBM write per tile, no f64 inside the kernel (Pallas TPU
has no f64; the f64 result is assembled outside from the pair).

Numerically identical (up to f32-pair representation, ~2^-48) to the
XLA-composed version; parity-tested against it in interpret mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._config import interpret_mode
from . import precision

_TM = 256
_TN = 256
_TK = 256


def _pair_dot(a, b):
    """One slice-pair product on the MXU, exact int32 result.

    int8 operands take the int8->int32 MXU path.  bf16 operands (the
    SAME 7-bit integer slice values, upcast) take the bf16->f32 path and
    convert: a 256-chunk dot of 7-bit integers is <= 256*127^2 = 2^22 <
    2^24, so the f32 result is exactly integral and the int32 convert is
    lossless — bit-identical accumulation either way.  Which path wins
    is a hardware question (ANDVARANAUT_MXU_DOT, benchmarks/mxu_rate.py):
    the int8 kernels plateau at ~24% of the part's nominal 394 int8 TOPS
    == ~50% of its bf16 rate, so if Mosaic schedules int8 dots on the
    bf16 pipeline without the 2x, bf16 operands are free speed."""
    p = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=(
            jnp.int32 if a.dtype == jnp.int8 else jnp.float32),
    )
    return p if p.dtype == jnp.int32 else p.astype(jnp.int32)


def _pair_dot_tn(a, b):
    """Slice-pair product contracting dim 0 of BOTH operands:
    (tk, TM) x (tk, TN) -> (TM, TN), i.e. a^T @ b without any
    transposed operand copy.  Mosaic accepts the transposed-LHS
    dimension numbers on v5e for int8 and bf16 (hardware-probed,
    exact int32 result) — this is what lets the A^T A syrk consume a
    lower-triangular operand in its NATIVE layout."""
    p = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=(
            jnp.int32 if a.dtype == jnp.int8 else jnp.float32),
    )
    return p if p.dtype == jnp.int32 else p.astype(jnp.int32)


def _pair_dot_nt(a, b):
    """Slice-pair product contracting dim 1 of BOTH operands:
    (TM, tk) x (TN, tk) -> (TM, TN), i.e. a @ b^T without any
    transposed operand copy.  Lets the A A^T syrk kernels read their b
    operand as (TN, tk) windows of the SAME native-layout slice arrays
    instead of materialising transposed int8 copies (~6 full planes
    written+read per factorisation step).  Hardware acceptance probed
    by benchmarks/nt_dot_probe.py (exact int32, v5e)."""
    p = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=(
            jnp.int32 if a.dtype == jnp.int8 else jnp.float32),
    )
    return p if p.dtype == jnp.int32 else p.astype(jnp.int32)


def _dot_bf16() -> bool:
    import os

    return os.environ.get("ANDVARANAUT_MXU_DOT", "int8") == "bf16"


def _syrk_nt() -> bool:
    """ANDVARANAUT_SYRK_NT=1: syrk kernels read the b operand from the
    native-layout slice arrays via the nt dot (no transposed copies)."""
    import os

    return os.environ.get("ANDVARANAUT_SYRK_NT", "1") == "1"


def _dimsem(*sems, vmem_mb: int | None = None):
    """Optional Mosaic dimension_semantics for the slice kernels
    (ANDVARANAUT_DIMSEM, default ON): output-tile grid dims marked
    "parallel" (each cell owns a distinct window — Mosaic may
    reorder/overlap their DMA), the k-accumulation dim "arbitrary"
    (sequential scratch reuse).  Measured 2026-08-20: headline 457.4
    -> 453.7 ms at identical parity, compile 330 -> 288 s.

    vmem_mb: raise the kernel's scoped-VMEM budget above Mosaic's
    16.00 MB default (the v5e core has 128 MB physical VMEM — the
    default is a pipelining reserve, not the hardware bound).  Needed
    by the 512-tile syrk variants, whose scratch+carry windows alone
    are ~14 MB."""
    import os

    kw = {}
    if vmem_mb is not None:
        kw["vmem_limit_bytes"] = int(vmem_mb) * 1024 * 1024
    if os.environ.get("ANDVARANAUT_DIMSEM", "1") != "1":
        return pltpu.CompilerParams(**kw) if kw else None
    return pltpu.CompilerParams(dimension_semantics=tuple(sems), **kw)


def _tk() -> int:
    """k-chunk depth of the slice kernels (ANDVARANAUT_TK, default
    1024 since round 3).

    The grid iterates k in _TK-deep chunks, so an output tile is
    kp/_TK grid cells; at the factorisation's block-width operands a
    1024 chunk makes nk=1 — one cell per output tile, no k grid, one
    scratch init + combine.  HISTORY (the micro-benchmark-trap case
    study, docs/TPU_NOTES.md): standalone syrk A/Bs always preferred
    deeper chunks (60.7/58.9/55.6 ms at 256/512/1024 on the 16k x 1024
    syrk, bit-identical), but in round 2 the END-TO-END bench REGRESSED
    at 1024 (675.8 vs 519.98 ms at 256) — the old kernel structure's
    4x-deeper in-place pair-carry windows cost more in VMEM
    pressure/pipelining than they amortised.  Re-measured 2026-08-20
    AFTER the nt-dot (no transposed-copy operands), MXU-cholinv and
    dimension_semantics changes: 256 -> 453.7, 512 -> 433.9,
    1024 -> 421.9 ms at identical 3.25e-7 parity, and the 16k MAP fit
    at tk=1024 reaches the identical optimum at 1.45 s per value+grad
    (was 1.55 at 256).  int32 dot accumulation stays exact to
    k = 2^19 (k * 127^2 < 2^31); the bf16 dot path needs tk <= 1024
    for exactness (2^24/127^2 ~ 1040) but its 2x-wider operand windows
    exceed the part's 16.00 MB scoped VMEM at tk=1024 (compile error,
    measured: 16.27 MB requested) — set ANDVARANAUT_TK=512 when
    A/B-ing ANDVARANAUT_MXU_DOT=bf16.  _tk_for clamps to the operand's
    padded k so small-k calls never pad."""
    import os

    return int(os.environ.get("ANDVARANAUT_TK", "1024"))


def _tk_for(k: int) -> int:
    """Requested k-chunk clamped to the operand's padded k: a deep
    default must not PAD small-k calls (the 512-grain composition
    matmuls would double their dot work at tk=1024)."""
    return min(_tk(), max(-(-int(k) // 256) * 256, 256))


def _syrk_tile(m: int) -> int:
    """Output tile size of the fused trailing-update syrk
    (ANDVARANAUT_SYRK_TILE, default 256).  Larger tiles mean FEWER grid
    cells (pairs scale ~1/t^2) and so less per-cell overhead (scratch
    scheduling, window DMA setup, inter-cell pipeline bubbles) at the
    cost of more VMEM per cell; 512 needs ~13-15 MB at tk<=512 against
    the part's 16.00 MB scoped budget.  Clamped to 256 when the carry
    is not tile-aligned (dynamic row_start needs no alignment: wholly-
    dead columns are still wholly dead at any tile size, and straddling
    tiles subtract exact zeros on the masked panel rows)."""
    import os

    t = int(os.environ.get("ANDVARANAUT_SYRK_TILE", "256"))
    if t < 256 or t % 256 or int(m) % t:
        return 256
    return t


def _tk_divisor_for(k: int) -> int:
    """_tk_for for the PRESLICED kernels, which consume pre-extracted
    int8 slice arrays and therefore cannot pad along k inside the
    wrapper: the largest multiple of 256 that is <= _tk_for(k) AND
    divides k.  Callers guarantee 256 | k (operands are padded to the
    256 tile grain before slicing), so the loop always terminates at a
    valid chunk; e.g. k=1280 -> 256, k=1536 -> 768, k=2048 -> 1024."""
    k = int(k)
    t = _tk_for(k)
    while t > 256 and k % t:
        t -= 256
    return t


def _acc_per_pair() -> bool:
    """Accumulator structure knob (ANDVARANAUT_SYRK_ACC=order|pair).

    'order' (default): slice-pair products of equal order i+j share one
    int32 scratch — nslices scratches, but the shared `+=` makes a RAW
    dependency chain up to (order+1)*nk dots deep per scratch.
    'pair': every (i, j) pair gets its own scratch (npair = ns(ns+1)/2,
    5.5 MB VMEM at 256-tiles/6 slices) and the order groups are summed
    at combine time — maximum dot-level ILP, bit-identical results
    (int32 addition is associative).  The synthetic probe
    (benchmarks/mxu_rate.py) measured 19x from accumulator independence;
    this knob tests whether the production kernel's 6-way grouping
    still leaves MXU throughput on the table."""
    import os

    return os.environ.get("ANDVARANAUT_SYRK_ACC", "order") == "pair"


def _pairs(nslices: int):
    return [(i, j) for i in range(nslices) for j in range(nslices - i)]


def _accumulate(nslices, per_pair, acc_refs, a_refs, b_refs, tn=False,
                nt=False):
    """One k-chunk of slice-pair MXU products into the scratches.
    tn: contract dim 0 of both operands (see _pair_dot_tn).
    nt: contract dim 1 of both operands (see _pair_dot_nt)."""
    dot = _pair_dot_nt if nt else (_pair_dot_tn if tn else _pair_dot)
    if per_pair:
        for idx, (i, j) in enumerate(_pairs(nslices)):
            acc_refs[idx][:] += dot(a_refs[i][:], b_refs[j][:])
    else:
        for i in range(nslices):
            for j in range(nslices - i):
                acc_refs[i + j][:] += dot(a_refs[i][:], b_refs[j][:])


def _order_group(nslices, per_pair, acc_refs, s):
    """int32 sum of all slice-pair scratches of order s (exact)."""
    if not per_pair:
        return acc_refs[s][:]
    members = [
        idx for idx, (i, j) in enumerate(_pairs(nslices)) if i + j == s]
    g = acc_refs[members[0]][:]
    for idx in members[1:]:
        g = g + acc_refs[idx][:]
    return g


def _n_scratch(nslices: int, per_pair: bool) -> int:
    return len(_pairs(nslices)) if per_pair else nslices


def _slice_operands(a_sl, dot_bf16: bool):
    if not dot_bf16:
        return a_sl
    # exact upcast: slice values are integers in [-127, 127]
    return [a.astype(jnp.bfloat16) for a in a_sl]


def _two_sum(hi, lo, x):
    """Error-free (Knuth) accumulation of x into the (hi, lo) f32 pair."""
    s = hi + x
    # Neumaier compensation
    comp = jnp.where(
        jnp.abs(hi) >= jnp.abs(x), (hi - s) + x, (x - s) + hi)
    return s, lo + comp


def _kernel(nslices, nk, lower_only, tmax, per_pair, *refs):
    """One (TM, TN) output tile; grid dim 2 iterates k-chunks.

    refs: bounds (3,) int32 scalar-prefetch [row_start, col_start,
    col_end], then a_0..a_{ns-1} (TM, TK) int8, b_0..b_{ns-1} (TK, TN)
    int8, hi/lo (TM, TN) f32 outputs, then ns (TM, TN) int32 group
    scratches.

    Dead tile ROWS (wholly above row_start) are NEVER VISITED: grid
    dim 0 is dynamic and the row index maps add the row_start tile
    offset, so their DMA, MXU work and sequencing vanish (their output
    is undefined; production callers mask rows < row_start).  The other
    skip conditions stay predicated (scratches zero, combine writes
    exact zeros):
    - lower_only (static): strictly-upper tiles ti < tj — for syrk
      updates whose consumers only read the lower triangle;
    - col_start (dynamic): output cols below this global index are zero
      or discarded by the caller;
    - col_end (dynamic): output cols at/above this global index are
      known exact zeros (the caller's B operand is zero there — e.g.
      the triangular identity solve's residual updates);
    - the clamped single row of an all-dead call (row_start >= m).
    """
    bounds_ref = refs[0]
    refs = refs[1:]
    a_refs = refs[:nslices]
    b_refs = refs[nslices : 2 * nslices]
    hi_ref, lo_ref = refs[2 * nslices], refs[2 * nslices + 1]
    acc_refs = refs[2 * nslices + 2 :]
    ti = jnp.minimum(
        pl.program_id(0) + jax.lax.div(bounds_ref[0], jnp.int32(_TM)),
        jnp.int32(tmax - 1))
    tj = pl.program_id(1)
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _():
        for acc in acc_refs:
            acc[:] = jnp.zeros_like(acc)

    active = (
        ((ti + jnp.int32(1)) * jnp.int32(_TM) > bounds_ref[0])
        & ((tj + jnp.int32(1)) * jnp.int32(_TN) > bounds_ref[1])
        & (tj * jnp.int32(_TN) < bounds_ref[2]))
    if lower_only:
        active = active & (ti >= tj)

    @pl.when(active)
    def _():
        _accumulate(nslices, per_pair, acc_refs, a_refs, b_refs)

    @pl.when(kidx == nk - 1)
    def _():
        hi = jnp.zeros_like(hi_ref)
        lo = jnp.zeros_like(lo_ref)
        for s in range(nslices):
            g = _order_group(nslices, per_pair, acc_refs, s)
            # group sums exceed 2^24: split exactly in integer space so
            # each f32 conversion is lossless.  Arithmetic shifts (floor
            # semantics) in int32 — `// 4096` promotes through int64 under
            # x64 and breaks kernel tracing.
            ghi = jax.lax.shift_right_arithmetic(g, jnp.int32(12))
            glo = g - jax.lax.shift_left(ghi, jnp.int32(12))
            w = jnp.float32(2.0 ** (-7.0 * (s + 2)))
            hi, lo = _two_sum(
                hi, lo, ghi.astype(jnp.float32) * (w * 4096.0))
            hi, lo = _two_sum(hi, lo, glo.astype(jnp.float32) * w)
        hi_ref[:] = hi
        lo_ref[:] = lo


def _syrk_kernel(nslices, nk, per_pair, tk, tri_skip, tn, nt, *refs):
    """Triangular-grid syrk tile: grid dim 0 walks a host-precomputed
    list of lower-triangle (ti, tj) tile pairs (scalar-prefetched index
    arrays — upper tiles are never visited, never DMA'd); grid dim 1
    iterates k-chunks.  Same slice-pair reduction as _kernel.

    tn (static): the A^T A form — tiles are (tk, TM)/(tk, TN) reads of
    the SAME native-layout operand slices and the dot contracts dim 0
    of both (no transposed operand copies anywhere; see _pair_dot_tn).

    tri_skip (static): the CALLER GUARANTEES the operand's k-index is
    zero below each pair's row tile — A[i, k] == 0 for k < i (A
    upper-triangular, tn=False, e.g. L^-T) or W[k, i] == 0 for k < i
    (W lower-triangular, tn=True, e.g. L^-1): k-chunks wholly left of
    the pair's ROW tile contribute exact zeros and skip the MXU (~2/3
    of the dense chunk work for a full triangle).

    refs: i_arr, j_arr (nT,) i32, rs (1,) i32 row_start — all scalar
    prefetch — then a/b slice tiles, hi/lo outputs, int32 scratches."""
    i_ref, j_ref, rs_ref = refs[0], refs[1], refs[2]
    refs = refs[3:]
    a_refs = refs[:nslices]
    b_refs = refs[nslices : 2 * nslices]
    hi_ref, lo_ref = refs[2 * nslices], refs[2 * nslices + 1]
    acc_refs = refs[2 * nslices + 2 :]
    t = pl.program_id(0)
    kidx = pl.program_id(1)
    tj = j_ref[t]

    @pl.when(kidx == 0)
    def _():
        for acc in acc_refs:
            acc[:] = jnp.zeros_like(acc)

    # masked rows above the trailing submatrix: zero operand rows.  The
    # pair list orders ti >= tj, so a tile is dead iff its COLUMN is
    # wholly above row_start; the dynamic grid already stops before the
    # dead suffix — this predicate only covers the clamped t=0 cell of
    # an all-dead call (it then writes exact zeros).
    active = (tj + jnp.int32(1)) * jnp.int32(_TN) > rs_ref[0]
    if tri_skip:
        # pair list has ti >= tj, so the first live chunk is at ti's
        # tile: chunks wholly below it multiply exact-zero operand rows
        active = active & (
            (kidx + jnp.int32(1)) * jnp.int32(tk)
            > i_ref[t] * jnp.int32(_TM))

    @pl.when(active)
    def _():
        _accumulate(nslices, per_pair, acc_refs, a_refs, b_refs, tn=tn,
                    nt=nt)

    @pl.when(kidx == nk - 1)
    def _():
        hi = jnp.zeros_like(hi_ref)
        lo = jnp.zeros_like(lo_ref)
        for s in range(nslices):
            g = _order_group(nslices, per_pair, acc_refs, s)
            ghi = jax.lax.shift_right_arithmetic(g, jnp.int32(12))
            glo = g - jax.lax.shift_left(ghi, jnp.int32(12))
            w = jnp.float32(2.0 ** (-7.0 * (s + 2)))
            hi, lo = _two_sum(
                hi, lo, ghi.astype(jnp.float32) * (w * 4096.0))
            hi, lo = _two_sum(hi, lo, glo.astype(jnp.float32) * w)
        hi_ref[:] = hi
        lo_ref[:] = lo


def _syrk_sub_kernel(nslices, nk, per_pair, nt, tile, *refs):
    """Triangular-grid fused trailing update: A_tile -= panel @ panel.T.

    Same slice-pair reduction and dynamic triangular grid as
    `_syrk_kernel`, but the combine step finishes the whole trailing
    update in-kernel: the composed (hi, lo) f32 product pair is scaled
    by the power-of-two row/col scales and subtracted from the carried
    matrix's (hi, lo) pair IN PLACE (outputs alias the Ahi/Alo inputs).
    This removes the separate full-matrix XLA elementwise pass
    (`A - where(upd, Csy, 0)`) that read/wrote the whole (m, m) carry
    per factorisation step — measured ~30 ms per 16k^2 pass, ~200 ms
    over the 16k factorisation (benchmarks/gram_breakdown.py).

    refs: i_arr, j_arr (nT,) i32, rs (1,) i32 — scalar prefetch — then
    a/b slice tiles, Ahi/Alo carry tiles, sa (TM, 128) / sb (8, TN) f32
    scale tiles, hi/lo outputs (aliased to Ahi/Alo), int32 scratches."""
    i_ref, j_ref, rs_ref = refs[0], refs[1], refs[2]
    refs = refs[3:]
    a_refs = refs[:nslices]
    b_refs = refs[nslices : 2 * nslices]
    ahi_ref, alo_ref, sa_ref, sb_ref = refs[2 * nslices : 2 * nslices + 4]
    hi_ref, lo_ref = refs[2 * nslices + 4], refs[2 * nslices + 5]
    acc_refs = refs[2 * nslices + 6 :]
    t = pl.program_id(0)
    kidx = pl.program_id(1)
    tj = j_ref[t]

    @pl.when(kidx == 0)
    def _():
        for acc in acc_refs:
            acc[:] = jnp.zeros_like(acc)

    # the dynamic grid stops before dead tile columns; this predicate
    # only covers the clamped t=0 cell of an all-dead call, which must
    # write the carry through unchanged (outputs alias the carry).
    active = (tj + jnp.int32(1)) * jnp.int32(tile) > rs_ref[0]

    @pl.when(active)
    def _():
        _accumulate(nslices, per_pair, acc_refs, a_refs, b_refs, nt=nt)

    @pl.when(kidx == nk - 1)
    def _():
        @pl.when(active)
        def _():
            chi = jnp.zeros_like(hi_ref)
            clo = jnp.zeros_like(lo_ref)
            for s in range(nslices):
                g = _order_group(nslices, per_pair, acc_refs, s)
                ghi = jax.lax.shift_right_arithmetic(g, jnp.int32(12))
                glo = g - jax.lax.shift_left(ghi, jnp.int32(12))
                w = jnp.float32(2.0 ** (-7.0 * (s + 2)))
                chi, clo = _two_sum(
                    chi, clo, ghi.astype(jnp.float32) * (w * 4096.0))
                chi, clo = _two_sum(chi, clo, glo.astype(jnp.float32) * w)
            # power-of-two row scale then col scale: each mult exact,
            # single-axis broadcasts only
            sa = sa_ref[:, :1]
            sb = sb_ref[:1, :]
            chi = (chi * sa) * sb
            clo = (clo * sa) * sb
            # pair subtraction (A - C), renormalised to a proper pair
            h1, l1 = _two_sum(ahi_ref[:], alo_ref[:], -chi)
            h2, l2 = _two_sum(h1, l1, -clo)
            nh = h2 + l2
            hi_ref[:] = nh
            lo_ref[:] = (h2 - nh) + l2

        @pl.when(jnp.logical_not(active))
        def _():
            # clamped cell of an all-dead call: carry passes through
            hi_ref[:] = ahi_ref[:]
            lo_ref[:] = alo_ref[:]


def pallas_int_slice_syrk_sub_pair(Ahi, Alo, panel, nslices: int | None = None,
                                   row_start=None):
    """See _pallas_int_slice_syrk_sub_pair; resolves the slice count
    OUTSIDE the jit so it is the compile-cache key."""
    return _pallas_int_slice_syrk_sub_pair(
        Ahi, Alo, panel,
        nslices=precision.INT_NSLICES if nslices is None else nslices,
        row_start=row_start, dot_bf16=_dot_bf16(),
        per_pair=_acc_per_pair(), tk=_tk_for(panel.shape[1]),
        nt=_syrk_nt(), tile=_syrk_tile(Ahi.shape[0]))


@partial(jax.jit,
         static_argnames=("nslices", "dot_bf16", "per_pair", "tk", "nt",
                          "tile"))
def _pallas_int_slice_syrk_sub_pair(Ahi, Alo, panel, nslices: int,
                                    row_start=None, dot_bf16=False,
                                    per_pair=False, tk=_TK, nt=False,
                                    tile=_TM):
    """(Ahi, Alo) -= panel @ panel.T on live lower-triangle tiles, fused.

    The trailing matrix is carried as an (hi, lo) f32 pair (~2^-48
    grade — comfortably above the int8-slice product's own ~2^-42
    truncation grade, so factorisation accuracy is unchanged).  One
    kernel does the whole trailing update per step: slice-pair MXU
    products, power-of-two scaling, and pair subtraction from the
    carry, writing in place (input_output_aliases).  Tiles never
    visited by the dynamic triangular grid — strictly-upper tiles and
    tile columns wholly below `row_start` — PASS THROUGH unchanged,
    which is exactly the masked-update semantics the factorisation
    needs (finished L columns below row_start are preserved without
    any masking pass).

    panel rows below `row_start` must already be zero (the caller's
    `where(below, …)` mask): straddling tiles then subtract exact
    zeros outside the live region.  Requires square (m, m) carries
    with m a multiple of the 256 tile; panel k is padded as needed."""
    m, k = panel.shape
    assert Ahi.shape == (m, m) and Alo.shape == (m, m)
    assert m % tile == 0, "pair carry requires tile-aligned m"
    sA = precision._pow2_row_scales(panel, axis=1)
    a_sl = precision._int_slices(panel / sA, nslices)
    b_sl = None if nt else [a.T for a in a_sl]

    kp = -(-k // tk) * tk
    if kp != k:
        a_sl = [jnp.pad(a, ((0, 0), (0, kp - k))) for a in a_sl]
        if b_sl is not None:
            b_sl = [jnp.pad(b, ((0, kp - k), (0, 0))) for b in b_sl]
    a_sl = _slice_operands(a_sl, dot_bf16)
    if nt:
        # nt dot: the b operand reads (TN, tk) windows of the SAME
        # native-layout slice arrays — no transposed copies
        b_sl = a_sl
    else:
        b_sl = _slice_operands(b_sl, dot_bf16)
    nk = kp // tk
    T = m // tile
    pairs = [(i, j) for j in range(T - 1, -1, -1)
             for i in range(T - 1, j - 1, -1)]
    i_arr = jnp.asarray(np.array([p[0] for p in pairs], dtype=np.int32))
    j_arr = jnp.asarray(np.array([p[1] for p in pairs], dtype=np.int32))
    rs = jnp.asarray(
        [0 if row_start is None else row_start], dtype=jnp.int32)
    if row_start is None:
        tgrid = len(pairs)
    else:
        kliv = jnp.maximum(
            jnp.int32(T) - jnp.asarray(row_start, jnp.int32) // tile, 0)
        tgrid = jnp.maximum((kliv * (kliv + 1)) // 2, 1)

    sa32 = jnp.broadcast_to(sA.astype(jnp.float32), (m, 128))
    sb32 = jnp.broadcast_to(
        sA.reshape(1, -1).astype(jnp.float32), (8, m))

    a_spec = pl.BlockSpec(
        (tile, tk), lambda t, kk, i_a, j_a, r: (i_a[t], kk),
        memory_space=pltpu.VMEM)
    if nt:
        b_spec = pl.BlockSpec(
            (tile, tk), lambda t, kk, i_a, j_a, r: (j_a[t], kk),
            memory_space=pltpu.VMEM)
    else:
        b_spec = pl.BlockSpec(
            (tk, tile), lambda t, kk, i_a, j_a, r: (kk, j_a[t]),
            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec(
        (tile, tile), lambda t, kk, i_a, j_a, r: (i_a[t], j_a[t]),
        memory_space=pltpu.VMEM)
    # index-map constants MUST be explicit i32: a literal 0 traces as
    # i64 under x64 and Mosaic rejects i64 in index maps (TPU_NOTES)
    sa_spec = pl.BlockSpec(
        (tile, 128), lambda t, kk, i_a, j_a, r: (i_a[t], np.int32(0)),
        memory_space=pltpu.VMEM)
    sb_spec = pl.BlockSpec(
        (8, tile), lambda t, kk, i_a, j_a, r: (np.int32(0), j_a[t]),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tgrid, nk),
        in_specs=[a_spec] * nslices + [b_spec] * nslices
        + [o_spec, o_spec, sa_spec, sb_spec],
        out_specs=(o_spec, o_spec),
        scratch_shapes=[
            pltpu.VMEM((tile, tile), jnp.int32)
            for _ in range(_n_scratch(nslices, per_pair))
        ],
    )
    # flat input order: 3 scalar-prefetch, 2*nslices slice operands,
    # then Ahi, Alo (aliased to outputs 0, 1), sa, sb
    base = 3 + 2 * nslices
    nhi, nlo = pl.pallas_call(
        partial(_syrk_sub_kernel, nslices, nk, per_pair, nt, tile),
        grid_spec=grid_spec,
        compiler_params=_dimsem(
            "parallel", "arbitrary",
            vmem_mb=None if tile <= 256 else 48),
        out_shape=(
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
        ),
        input_output_aliases={base: 0, base + 1: 1},
        interpret=interpret_mode(),
    )(i_arr, j_arr, rs, *a_sl, *b_sl, Ahi, Alo, sa32, sb32)
    return nhi, nlo


def _mm_sub_kernel(nslices, nk, tmax, per_pair, *refs):
    """Rectangular fused in-place subtract: R_tile -= (A @ B)_tile.

    Same slice-pair reduction / pair-subtract combine as
    `_syrk_sub_kernel`, but over a rectangular (rows, cols, k) grid whose
    row dimension is dynamic (offset past `row_start`) and whose column
    dimension the CALLER truncates at col_end (live columns are a
    prefix).  Tiles never visited pass through via the output aliasing;
    the clamped row of an all-dead call (row_start >= m) writes the
    carry through unchanged.

    refs: rs (1,) i32 scalar prefetch, then a/b slice tiles, Rhi/Rlo
    carry tiles, sa (TM, 128) / sb (8, TN) f32 scale tiles, hi/lo
    outputs (aliased to Rhi/Rlo), int32 scratches."""
    rs_ref = refs[0]
    refs = refs[1:]
    a_refs = refs[:nslices]
    b_refs = refs[nslices : 2 * nslices]
    rhi_ref, rlo_ref, sa_ref, sb_ref = refs[2 * nslices : 2 * nslices + 4]
    hi_ref, lo_ref = refs[2 * nslices + 4], refs[2 * nslices + 5]
    acc_refs = refs[2 * nslices + 6 :]
    ti = jnp.minimum(
        pl.program_id(0) + jax.lax.div(rs_ref[0], jnp.int32(_TM)),
        jnp.int32(tmax - 1))
    kidx = pl.program_id(2)
    active = (ti + jnp.int32(1)) * jnp.int32(_TM) > rs_ref[0]

    @pl.when(kidx == 0)
    def _():
        for acc in acc_refs:
            acc[:] = jnp.zeros_like(acc)

    @pl.when(active)
    def _():
        _accumulate(nslices, per_pair, acc_refs, a_refs, b_refs)

    @pl.when(kidx == nk - 1)
    def _():
        @pl.when(active)
        def _():
            chi = jnp.zeros_like(hi_ref)
            clo = jnp.zeros_like(lo_ref)
            for s in range(nslices):
                g = _order_group(nslices, per_pair, acc_refs, s)
                ghi = jax.lax.shift_right_arithmetic(g, jnp.int32(12))
                glo = g - jax.lax.shift_left(ghi, jnp.int32(12))
                w = jnp.float32(2.0 ** (-7.0 * (s + 2)))
                chi, clo = _two_sum(
                    chi, clo, ghi.astype(jnp.float32) * (w * 4096.0))
                chi, clo = _two_sum(chi, clo, glo.astype(jnp.float32) * w)
            sa = sa_ref[:, :1]
            sb = sb_ref[:1, :]
            chi = (chi * sa) * sb
            clo = (clo * sa) * sb
            h1, l1 = _two_sum(rhi_ref[:], rlo_ref[:], -chi)
            h2, l2 = _two_sum(h1, l1, -clo)
            nh = h2 + l2
            hi_ref[:] = nh
            lo_ref[:] = (h2 - nh) + l2

        @pl.when(jnp.logical_not(active))
        def _():
            hi_ref[:] = rhi_ref[:]
            lo_ref[:] = rlo_ref[:]


def pallas_int_slice_syrk_sub_pair_presliced(Ahi, Alo, p_sl, sa,
                                             row_start=None):
    """(Ahi, Alo) -= P @ P^T on live lower-triangle tiles, with P given
    as PRE-EXTRACTED int8 slices + exact pow2 row scales (from
    pallas_panel.pair_to_slices) — the extraction XLA passes of
    `pallas_int_slice_syrk_sub_pair` disappear entirely.  Rows of p_sl
    above `row_start` may be UNDEFINED: the dynamic triangular grid
    never reads them (every live pair has ti >= tj >= row_start/TM)."""
    # honour ANDVARANAUT_MXU_DOT=bf16 here too (exact upcast of the
    # 7-bit integer slice values — see _pair_dot): the presliced routes
    # must not silently no-op the knob during A/Bs
    p_sl = _slice_operands(list(p_sl), _dot_bf16())
    return _pallas_int_slice_syrk_sub_pair_presliced(
        Ahi, Alo, tuple(p_sl), sa, nslices=len(p_sl),
        row_start=row_start, per_pair=_acc_per_pair(),
        tk=_tk_divisor_for(p_sl[0].shape[1]))


@partial(jax.jit,
         static_argnames=("nslices", "per_pair", "tk"))
def _pallas_int_slice_syrk_sub_pair_presliced(Ahi, Alo, p_sl, sa,
                                              nslices: int,
                                              row_start=None,
                                              per_pair=False, tk=_TK):
    m, k = p_sl[0].shape
    assert Ahi.shape == (m, m) and Alo.shape == (m, m)
    assert m % _TM == 0 and k % tk == 0
    a_sl = list(p_sl)
    b_sl = a_sl  # nt dot: b reads the same native-layout slices
    nk = k // tk
    T = m // _TM
    pairs = [(i, j) for j in range(T - 1, -1, -1)
             for i in range(T - 1, j - 1, -1)]
    i_arr = jnp.asarray(np.array([p[0] for p in pairs], dtype=np.int32))
    j_arr = jnp.asarray(np.array([p[1] for p in pairs], dtype=np.int32))
    rs = jnp.asarray(
        [0 if row_start is None else row_start], dtype=jnp.int32)
    if row_start is None:
        tgrid = len(pairs)
    else:
        kliv = jnp.maximum(
            jnp.int32(T) - jnp.asarray(row_start, jnp.int32) // _TM, 0)
        tgrid = jnp.maximum((kliv * (kliv + 1)) // 2, 1)

    sa32 = jnp.broadcast_to(sa.astype(jnp.float32), (m, 128))
    sb32 = jnp.broadcast_to(
        sa.reshape(1, -1).astype(jnp.float32), (8, m))

    a_spec = pl.BlockSpec(
        (_TM, tk), lambda t, kk, i_a, j_a, r: (i_a[t], kk),
        memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec(
        (_TN, tk), lambda t, kk, i_a, j_a, r: (j_a[t], kk),
        memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec(
        (_TM, _TN), lambda t, kk, i_a, j_a, r: (i_a[t], j_a[t]),
        memory_space=pltpu.VMEM)
    sa_spec = pl.BlockSpec(
        (_TM, 128), lambda t, kk, i_a, j_a, r: (i_a[t], np.int32(0)),
        memory_space=pltpu.VMEM)
    sb_spec = pl.BlockSpec(
        (8, _TN), lambda t, kk, i_a, j_a, r: (np.int32(0), j_a[t]),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tgrid, nk),
        in_specs=[a_spec] * nslices + [b_spec] * nslices
        + [o_spec, o_spec, sa_spec, sb_spec],
        out_specs=(o_spec, o_spec),
        scratch_shapes=[
            pltpu.VMEM((_TM, _TN), jnp.int32)
            for _ in range(_n_scratch(nslices, per_pair))
        ],
    )
    base = 3 + 2 * nslices
    nhi, nlo = pl.pallas_call(
        partial(_syrk_sub_kernel, nslices, nk, per_pair, True, _TM),
        grid_spec=grid_spec,
        compiler_params=_dimsem("parallel", "arbitrary"),
        out_shape=(
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
        ),
        input_output_aliases={base: 0, base + 1: 1},
        interpret=interpret_mode(),
    )(i_arr, j_arr, rs, *a_sl, *b_sl, Ahi, Alo, sa32, sb32)
    return nhi, nlo


def pallas_int_slice_mm_sub_pair(Rhi, Rlo, A, B, nslices: int | None = None,
                                 row_start=None, col_end=None):
    """See _pallas_int_slice_mm_sub_pair; resolves the slice count
    OUTSIDE the jit so it is the compile-cache key."""
    return _pallas_int_slice_mm_sub_pair(
        Rhi, Rlo, A, B,
        nslices=precision.INT_NSLICES if nslices is None else nslices,
        row_start=row_start, col_end=col_end, dot_bf16=_dot_bf16(),
        per_pair=_acc_per_pair(), tk=_tk_for(A.shape[1]))


@partial(jax.jit,
         static_argnames=("nslices", "dot_bf16", "per_pair", "tk"))
def _pallas_int_slice_mm_sub_pair(Rhi, Rlo, A, B, nslices: int,
                                  row_start=None, col_end=None,
                                  dot_bf16=False, per_pair=False, tk=_TK):
    """(Rhi, Rlo) -= A @ B on live tiles, fused and in place.

    The rectangular sibling of `_pallas_int_slice_syrk_sub_pair`, built
    for the blocked triangular identity solve (precision.
    blocked_inv_lower): the residual matrix is carried as an (hi, lo)
    f32 pair and each step's update R[rows >= row_start, cols <
    col_end] -= Lcol @ xj runs as ONE kernel that subtracts from the
    carry in place (input_output_aliases).  This removes the identity
    solve's three full-size (m, n) f64 temporaries per step (the
    product, the subtraction result, and the separate solution
    accumulator) — the buffers that pushed the 16k gradient-pipeline
    program to a 20.6 GB compile-time HBM peak on a 15.7 GB chip.

    Live tiles: tile rows at/after `row_start` (dynamic grid offset,
    like `_pallas_int_slice_matmul`) x tile cols below `col_end` (the
    caller's B is exact-zero at cols >= col_end, so the dynamic column
    grid simply stops there).  Tiles outside PASS THROUGH unchanged.
    A rows above `row_start` must already be zero (the caller's
    `where(below, ...)` mask).  row_start/col_end must be multiples of
    the 256 tile, as the blocked solve's step boundaries are."""
    m, k = A.shape
    k2, n = B.shape
    assert k2 == k and Rhi.shape == (m, n) and Rlo.shape == (m, n)
    assert m % _TM == 0 and n % _TN == 0, "pair carry requires tile-aligned R"
    sA = precision._pow2_row_scales(A, axis=1)
    sB = precision._pow2_row_scales(B, axis=0)
    a_sl = precision._int_slices(A / sA, nslices)
    b_sl = precision._int_slices(B / sB, nslices)
    kp = -(-k // tk) * tk
    if kp != k:
        a_sl = [jnp.pad(a, ((0, 0), (0, kp - k))) for a in a_sl]
        b_sl = [jnp.pad(b, ((0, kp - k), (0, 0))) for b in b_sl]
    a_sl = _slice_operands(a_sl, dot_bf16)
    b_sl = _slice_operands(b_sl, dot_bf16)
    nk = kp // tk
    tm = m // _TM
    tn = n // _TN
    rs = jnp.asarray(
        [0 if row_start is None else row_start], dtype=jnp.int32)
    if row_start is None:
        mgrid = tm
    else:
        mgrid = jnp.maximum(
            jnp.int32(tm) - jnp.asarray(row_start, jnp.int32) // _TM, 1)
    if col_end is None:
        ngrid = tn
    else:
        ngrid = jnp.maximum(
            jnp.minimum(
                -(-jnp.asarray(col_end, jnp.int32) // jnp.int32(_TN)),
                jnp.int32(tn)), 1)
    sa32 = jnp.broadcast_to(sA.astype(jnp.float32), (m, 128))
    sb32 = jnp.broadcast_to(sB.astype(jnp.float32), (8, n))

    def _row(i, b):
        # i32 throughout: `//` on a Python int promotes through i64
        # under x64 and Mosaic rejects i64 in index maps (TPU_NOTES)
        rs_t = jax.lax.div(b[0], np.int32(_TM))
        return jnp.minimum(i + rs_t, np.int32(tm - 1))

    a_spec = pl.BlockSpec((_TM, tk),
                          lambda i, j, kk, b: (_row(i, b), kk),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((tk, _TN), lambda i, j, kk, b: (kk, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((_TM, _TN),
                          lambda i, j, kk, b: (_row(i, b), j),
                          memory_space=pltpu.VMEM)
    sa_spec = pl.BlockSpec(
        (_TM, 128), lambda i, j, kk, b: (_row(i, b), np.int32(0)),
        memory_space=pltpu.VMEM)
    sb_spec = pl.BlockSpec(
        (8, _TN), lambda i, j, kk, b: (np.int32(0), j),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mgrid, ngrid, nk),
        in_specs=[a_spec] * nslices + [b_spec] * nslices
        + [o_spec, o_spec, sa_spec, sb_spec],
        out_specs=(o_spec, o_spec),
        scratch_shapes=[
            pltpu.VMEM((_TM, _TN), jnp.int32)
            for _ in range(_n_scratch(nslices, per_pair))
        ],
    )
    # flat input order: 1 scalar-prefetch, 2*nslices slice operands,
    # then Rhi, Rlo (aliased to outputs 0, 1), sa, sb
    base = 1 + 2 * nslices
    nhi, nlo = pl.pallas_call(
        partial(_mm_sub_kernel, nslices, nk, tm, per_pair),
        grid_spec=grid_spec,
        compiler_params=_dimsem("parallel", "parallel", "arbitrary"),
        out_shape=(
            jax.ShapeDtypeStruct((m, n), jnp.float32),
            jax.ShapeDtypeStruct((m, n), jnp.float32),
        ),
        input_output_aliases={base: 0, base + 1: 1},
        interpret=interpret_mode(),
    )(rs, *a_sl, *b_sl, Rhi, Rlo, sa32, sb32)
    return nhi, nlo


def pallas_int_slice_syrk_lower(A, nslices: int | None = None,
                                row_start=None, a_upper: bool = False):
    """See _pallas_int_slice_syrk_lower; resolves the configurable slice
    count OUTSIDE the jit so it is the compile-cache key."""
    return _pallas_int_slice_syrk_lower(
        A, nslices=precision.INT_NSLICES if nslices is None else nslices,
        row_start=row_start, dot_bf16=_dot_bf16(),
        per_pair=_acc_per_pair(), tk=_tk_for(A.shape[1]),
        a_upper=a_upper, nt=_syrk_nt())


@partial(jax.jit,
         static_argnames=(
             "nslices", "dot_bf16", "per_pair", "tk", "a_upper", "nt"))
def _pallas_int_slice_syrk_lower(A, nslices: int, row_start=None,
                                 dot_bf16=False, per_pair=False, tk=_TK,
                                 a_upper=False, nt=False):
    """C = A @ A.T, LOWER-TRIANGLE TILES ONLY, via a triangular grid.

    Strictly-upper 256-tiles of the output are NEVER COMPUTED OR
    WRITTEN — their contents are unspecified (the predicated rectangular
    kernel merely skipped their MXU work while still streaming inputs
    and writing zeros; here the dead half of the grid does not exist, so
    its input DMA and sequencing vanish too).  Callers must mask the
    output tile-triangularly before consuming it
    (`A - where(tril_tiles, C, 0)` fuses to a single elementwise pass).

    row_start: operand rows below this index are zero.  Tiles whose
    tile COLUMN lies wholly below it are NEVER VISITED — the pair list
    is ordered by descending tj so the live set (tj-tile overlapping
    [row_start, m)) is a prefix, and a DYNAMIC grid dimension stops at
    its length: the dead cells' DMA, MXU work and grid sequencing all
    vanish.  Unvisited output tiles are UNDEFINED (not zero): consumers
    must mask on `tril_tiles & (col >= row_start)`.

    a_upper (static): caller guarantees A[i, k] == 0 for k < i (upper-
    triangular operand, e.g. L^-T): k-chunks wholly left of a pair's
    row tile skip the MXU — exact, ~2/3 of the dense chunk work."""
    out_dtype = A.dtype
    m, k = A.shape
    sA = precision._pow2_row_scales(A, axis=1)
    sB = sA.reshape(1, -1)
    a_sl = precision._int_slices(A / sA, nslices)
    b_sl = None if nt else [a.T for a in a_sl]

    mp = -(-m // _TM) * _TM
    kp = -(-k // tk) * tk
    if (mp, kp) != (m, k):
        a_sl = [jnp.pad(a, ((0, mp - m), (0, kp - k))) for a in a_sl]
        if b_sl is not None:
            b_sl = [jnp.pad(b, ((0, kp - k), (0, mp - m))) for b in b_sl]
    a_sl = _slice_operands(a_sl, dot_bf16)
    if nt:
        # nt dot: b reads (TN, tk) windows of the same slice arrays
        b_sl = a_sl
    else:
        b_sl = _slice_operands(b_sl, dot_bf16)
    nk = kp // tk
    T = mp // _TM
    # descending tile column, then descending row: dead pairs (tj wholly
    # below row_start) form the suffix for ANY row_start value
    pairs = [(i, j) for j in range(T - 1, -1, -1) for i in range(T - 1, j - 1, -1)]
    i_arr = jnp.asarray(np.array([p[0] for p in pairs], dtype=np.int32))
    j_arr = jnp.asarray(np.array([p[1] for p in pairs], dtype=np.int32))
    rs = jnp.asarray(
        [0 if row_start is None else row_start], dtype=jnp.int32)
    if row_start is None:
        tgrid = len(pairs)
    else:
        kliv = jnp.maximum(
            jnp.int32(T) - jnp.asarray(row_start, jnp.int32) // _TM, 0)
        tgrid = jnp.maximum((kliv * (kliv + 1)) // 2, 1)

    a_spec = pl.BlockSpec(
        (_TM, tk), lambda t, kk, i_a, j_a, r: (i_a[t], kk),
        memory_space=pltpu.VMEM)
    if nt:
        b_spec = pl.BlockSpec(
            (_TN, tk), lambda t, kk, i_a, j_a, r: (j_a[t], kk),
            memory_space=pltpu.VMEM)
    else:
        b_spec = pl.BlockSpec(
            (tk, _TN), lambda t, kk, i_a, j_a, r: (kk, j_a[t]),
            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec(
        (_TM, _TN), lambda t, kk, i_a, j_a, r: (i_a[t], j_a[t]),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tgrid, nk),
        in_specs=[a_spec] * nslices + [b_spec] * nslices,
        out_specs=(o_spec, o_spec),
        scratch_shapes=[
            pltpu.VMEM((_TM, _TN), jnp.int32)
            for _ in range(_n_scratch(nslices, per_pair))
        ],
    )
    hi, lo = pl.pallas_call(
        partial(_syrk_kernel, nslices, nk, per_pair, tk, a_upper, False,
                nt),
        grid_spec=grid_spec,
        compiler_params=_dimsem("parallel", "arbitrary"),
        out_shape=(
            jax.ShapeDtypeStruct((mp, mp), jnp.float32),
            jax.ShapeDtypeStruct((mp, mp), jnp.float32),
        ),
        interpret=interpret_mode(),
    )(i_arr, j_arr, rs, *a_sl, *b_sl)
    C = hi[:m, :m].astype(out_dtype) + lo[:m, :m].astype(out_dtype)
    return C * (sA * sB)


def pallas_int_slice_syrk_tn_lower(W, nslices: int | None = None,
                                   w_lower: bool = False):
    """See _pallas_int_slice_syrk_tn_lower; resolves the slice count
    OUTSIDE the jit so it is the compile-cache key."""
    return _pallas_int_slice_syrk_tn_lower(
        W, nslices=precision.INT_NSLICES if nslices is None else nslices,
        dot_bf16=_dot_bf16(), per_pair=_acc_per_pair(),
        tk=_tk_for(W.shape[0]), w_lower=w_lower)


@partial(jax.jit,
         static_argnames=("nslices", "dot_bf16", "per_pair", "tk",
                          "w_lower"))
def _pallas_int_slice_syrk_tn_lower(W, nslices: int, dot_bf16=False,
                                    per_pair=False, tk=_TK,
                                    w_lower=False):
    """C = W^T @ W, LOWER-TRIANGLE TILES ONLY, with W consumed in its
    NATIVE layout: both kernel operands read the SAME slice arrays
    ((tk, TM) and (tk, TN) windows) and the dot contracts dim 0 of
    both (_pair_dot_tn) — no transposed operand, no transposed slice
    copies.  This is the K^-1 = L^-T L^-1 form fed with L^-1 directly:
    the A A^T kernel needed A = L^-T, and slicing that transposed f64
    operand made XLA materialise per-use transposed copies of every
    extraction-chain stage — ~18 GB of f32[16k, 16k] temporaries, the
    dominant allocations in the 16k gradient pipeline's compile-time
    OOM (20.6 GB on the 15.7 GB chip).

    Strictly-upper output tiles are never computed (triangular grid);
    consumers mask on tril tiles.

    w_lower (static): caller guarantees W[k, i] == 0 for k < i (W
    lower-triangular, e.g. L^-1): k-chunks wholly above each pair's
    row tile skip the MXU — exact, ~2/3 of the dense chunk work."""
    out_dtype = W.dtype
    k, m = W.shape
    sW = precision._pow2_row_scales(W, axis=0)   # (1, m) column scales
    w_sl = precision._int_slices(W / sW, nslices)

    mp = -(-m // _TM) * _TM
    kp = -(-k // tk) * tk
    if (kp, mp) != (k, m):
        w_sl = [jnp.pad(w, ((0, kp - k), (0, mp - m))) for w in w_sl]
    w_sl = _slice_operands(w_sl, dot_bf16)
    nk = kp // tk
    T = mp // _TM
    pairs = [(i, j) for j in range(T - 1, -1, -1)
             for i in range(T - 1, j - 1, -1)]
    i_arr = jnp.asarray(np.array([p[0] for p in pairs], dtype=np.int32))
    j_arr = jnp.asarray(np.array([p[1] for p in pairs], dtype=np.int32))
    rs = jnp.zeros((1,), dtype=jnp.int32)  # no row_start: all pairs live

    a_spec = pl.BlockSpec(
        (tk, _TM), lambda t, kk, i_a, j_a, r: (kk, i_a[t]),
        memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec(
        (tk, _TN), lambda t, kk, i_a, j_a, r: (kk, j_a[t]),
        memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec(
        (_TM, _TN), lambda t, kk, i_a, j_a, r: (i_a[t], j_a[t]),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(len(pairs), nk),
        in_specs=[a_spec] * nslices + [b_spec] * nslices,
        out_specs=(o_spec, o_spec),
        scratch_shapes=[
            pltpu.VMEM((_TM, _TN), jnp.int32)
            for _ in range(_n_scratch(nslices, per_pair))
        ],
    )
    hi, lo = pl.pallas_call(
        partial(_syrk_kernel, nslices, nk, per_pair, tk, w_lower, True,
                False),
        grid_spec=grid_spec,
        compiler_params=_dimsem("parallel", "arbitrary"),
        out_shape=(
            jax.ShapeDtypeStruct((mp, mp), jnp.float32),
            jax.ShapeDtypeStruct((mp, mp), jnp.float32),
        ),
        interpret=interpret_mode(),
    )(i_arr, j_arr, rs, *w_sl, *w_sl)
    C = hi[:m, :m].astype(out_dtype) + lo[:m, :m].astype(out_dtype)
    return C * (sW.reshape(-1, 1) * sW)


def pallas_int_slice_syrk_tn_lower_presliced(w_sl, sW, out_dtype,
                                             w_lower: bool = False):
    """C = W^T @ W (lower TILE-tiles only) with W given as pre-extracted
    native-layout int8 slices + exact pow2 COLUMN scales (from
    pallas_panel.pair_to_slices_cols) — the in-wrapper f64 extraction of
    `pallas_int_slice_syrk_tn_lower` disappears."""
    # honour ANDVARANAUT_MXU_DOT=bf16 (exact upcast — see _pair_dot)
    w_sl = _slice_operands(list(w_sl), _dot_bf16())
    return _pallas_int_slice_syrk_tn_lower_presliced(
        tuple(w_sl), sW, nslices=len(w_sl),
        out_dtype=jnp.dtype(out_dtype).name, per_pair=_acc_per_pair(),
        tk=_tk_divisor_for(w_sl[0].shape[0]), w_lower=w_lower)


@partial(jax.jit,
         static_argnames=("nslices", "out_dtype", "per_pair", "tk",
                          "w_lower"))
def _pallas_int_slice_syrk_tn_lower_presliced(w_sl, sW, nslices: int,
                                              out_dtype="float64",
                                              per_pair=False, tk=_TK,
                                              w_lower=False):
    k, m = w_sl[0].shape
    assert k == m and m % _TM == 0 and k % tk == 0
    nk = k // tk
    T = m // _TM
    pairs = [(i, j) for j in range(T - 1, -1, -1)
             for i in range(T - 1, j - 1, -1)]
    i_arr = jnp.asarray(np.array([p[0] for p in pairs], dtype=np.int32))
    j_arr = jnp.asarray(np.array([p[1] for p in pairs], dtype=np.int32))
    rs = jnp.zeros((1,), dtype=jnp.int32)

    a_spec = pl.BlockSpec(
        (tk, _TM), lambda t, kk, i_a, j_a, r: (kk, i_a[t]),
        memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec(
        (tk, _TN), lambda t, kk, i_a, j_a, r: (kk, j_a[t]),
        memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec(
        (_TM, _TN), lambda t, kk, i_a, j_a, r: (i_a[t], j_a[t]),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(len(pairs), nk),
        in_specs=[a_spec] * nslices + [b_spec] * nslices,
        out_specs=(o_spec, o_spec),
        scratch_shapes=[
            pltpu.VMEM((_TM, _TN), jnp.int32)
            for _ in range(_n_scratch(nslices, per_pair))
        ],
    )
    hi, lo = pl.pallas_call(
        partial(_syrk_kernel, nslices, nk, per_pair, tk, w_lower, True,
                False),
        grid_spec=grid_spec,
        compiler_params=_dimsem("parallel", "arbitrary"),
        out_shape=(
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
        ),
        interpret=interpret_mode(),
    )(i_arr, j_arr, rs, *w_sl, *w_sl)
    dt = jnp.dtype(out_dtype)
    C = hi.astype(dt) + lo.astype(dt)
    sW = sW.astype(dt)
    return C * (sW.reshape(-1, 1) * sW.reshape(1, -1))


def pallas_int_slice_matmul(A, B, nslices: int | None = None,
                            lower_only: bool = False,
                            row_start=None, col_start=None,
                            col_end=None):
    """See _pallas_int_slice_matmul; resolves the configurable slice
    count OUTSIDE the jit so it is the compile-cache key."""
    return _pallas_int_slice_matmul(
        A, B, nslices=precision.INT_NSLICES if nslices is None else nslices,
        lower_only=lower_only, row_start=row_start, col_start=col_start,
        col_end=col_end,
        dot_bf16=_dot_bf16(), per_pair=_acc_per_pair(),
        tk=_tk_for(A.shape[1]))


@partial(jax.jit,
         static_argnames=(
             "nslices", "lower_only", "dot_bf16", "per_pair", "tk"))
def _pallas_int_slice_matmul(A, B, nslices: int,
                             lower_only: bool = False,
                             row_start=None, col_start=None,
                             col_end=None,
                             dot_bf16=False, per_pair=False, tk=_TK):
    """C = A @ B via the fused integer-Ozaki Pallas kernel.

    Same scaling/slicing as precision.int_slice_matmul; the pair-product
    reduction runs in one kernel.

    Sparsity contract (all optional, default = dense):
    - lower_only=True: only tiles on/below the tile diagonal are
      computed; strictly-upper tiles are EXACT ZEROS in the output (the
      caller must not rely on them — for symmetric products whose
      consumers read the lower triangle only).
    - row_start (dynamic i32 scalar): output tile rows wholly above this
      global index are NEVER VISITED — grid dim 0 is dynamic, so their
      DMA/MXU/sequencing vanish and their output is UNDEFINED; callers
      must mask rows < row_start (the blocked factorisation's panel
      products do).
    - col_start (dynamic i32 scalar): output cols below this index are
      zeroed tile-wise (tiles wholly below skip the MXU).
    - col_end (dynamic i32 scalar): the CALLER GUARANTEES output cols
      at/above this index are exact zeros (B's columns there are zero);
      tiles wholly at/above skip the MXU and write exact zeros.  The
      triangular identity solve's residual updates use this — their
      solution panels are exactly zero right of the current block
      column, so each update only pays for its live lower-left corner.
    """
    out_dtype = A.dtype
    m, k = A.shape
    _, n = B.shape
    sA = precision._pow2_row_scales(A, axis=1)
    sB = precision._pow2_row_scales(B, axis=0)
    a_sl = precision._int_slices(A / sA, nslices)
    b_sl = precision._int_slices(B / sB, nslices)

    mp = -(-m // _TM) * _TM
    np_ = -(-n // _TN) * _TN
    kp = -(-k // tk) * tk
    if (mp, kp) != (m, k):
        a_sl = [jnp.pad(a, ((0, mp - m), (0, kp - k))) for a in a_sl]
    if (kp, np_) != (k, n):
        b_sl = [jnp.pad(b, ((0, kp - k), (0, np_ - n))) for b in b_sl]
    a_sl = _slice_operands(a_sl, dot_bf16)
    b_sl = _slice_operands(b_sl, dot_bf16)
    nk = kp // tk
    tm = mp // _TM

    bounds = jnp.stack([
        jnp.asarray(0 if row_start is None else row_start, jnp.int32),
        jnp.asarray(0 if col_start is None else col_start, jnp.int32),
        jnp.asarray(np_ if col_end is None else col_end, jnp.int32),
    ])
    if row_start is None:
        mgrid = tm
    else:
        mgrid = jnp.maximum(
            jnp.int32(tm) - jnp.asarray(row_start, jnp.int32) // _TM, 1)

    def _row(i, b):
        # i32 throughout: `//` on a Python int promotes through i64
        # under x64 and Mosaic rejects i64 in index maps (TPU_NOTES)
        rs_t = jax.lax.div(b[0], np.int32(_TM))
        return jnp.minimum(i + rs_t, np.int32(tm - 1))

    a_spec = pl.BlockSpec((_TM, tk),
                          lambda i, j, kk, b: (_row(i, b), kk),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((tk, _TN), lambda i, j, kk, b: (kk, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((_TM, _TN),
                          lambda i, j, kk, b: (_row(i, b), j),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mgrid, np_ // _TN, nk),
        in_specs=[a_spec] * nslices + [b_spec] * nslices,
        out_specs=(o_spec, o_spec),
        scratch_shapes=[
            pltpu.VMEM((_TM, _TN), jnp.int32)
            for _ in range(_n_scratch(nslices, per_pair))
        ],
    )
    hi, lo = pl.pallas_call(
        partial(_kernel, nslices, nk, lower_only, tm, per_pair),
        grid_spec=grid_spec,
        compiler_params=_dimsem("parallel", "parallel", "arbitrary"),
        out_shape=(
            jax.ShapeDtypeStruct((mp, np_), jnp.float32),
            jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        ),
        interpret=interpret_mode(),
    )(bounds, *a_sl, *b_sl)
    C = hi[:m, :n].astype(out_dtype) + lo[:m, :n].astype(out_dtype)
    return C * (sA * sB)
