"""Fused Pallas kernels for the blocked factorisation's panel stage.

Per factorisation step the pair-carry path (`precision._chol_steps_pair`)
used to run, all in XLA elementwise passes over (m, block) operands:
assemble the f64 column block from the (hi, lo) carry, int8-slice it
(~13 passes), run the panel matmul, `where`-mask the dead rows, slice the
panel AGAIN inside the trailing-syrk kernel (~13 passes), and assemble +
pair-split + write the finished L column back into the carry.  At 16k
that is ~40 GB of pure HBM glue per NLML evaluation (measured ~28-30 ms
per full-matrix pass, docs/TPU_NOTES.md).

These kernels collapse the stage to two Mosaic launches per step:

- `panel_into_carry` (K1): reads the carry pair's column-block window
  directly, extracts the int8 slices IN-KERNEL (pair-aware truncation;
  the exact power-of-two row scales are computed outside — one cheap
  rowmax pass — because f32 exponent-bit tricks are host/XLA territory),
  runs the panel product against the diagonal-block inverse's slices in
  their NATIVE layout (nt dot — no transposed copies), applies the exact
  pow2 scales, and writes the finished panel IN PLACE into the carry
  (input_output_aliases) — which also replaces the Lcol assembly /
  pair-split / update-slice glue.  Rows above `row_start` are never
  visited (dynamic grid).
- `pair_to_slices` (K1b): re-reads the finished panel from the carry and
  emits its int8 slices + nothing else, so the trailing syrk kernel
  (`pallas_slicemm._pallas_int_slice_syrk_sub_pair` with pre-sliced
  operands) does no extraction at all.

Slice semantics are identical to `precision._int_slices` (truncation to
7-bit windows below an exact pow2 row scale); the only difference is the
value being sliced is the (hi, lo) f32 pair (~2^-48) instead of the
assembled f64 (~2^-52) — both grades sit far below the int8 product's
own ~2^-42 truncation floor, so factor accuracy is unchanged
(parity-tested).  Reference anchor: this is the `pt.slinalg.cholesky`
panel work of /root/reference/andvaranaut/gpmcmc.py:310-319, restructured
for the MXU.
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
from .pallas_slicemm import (_TM, _TN, _n_scratch, _order_group,
                             _pair_dot_nt, _two_sum)


def _fused_panel() -> int:
    """ANDVARANAUT_FUSED_PANEL: 0 = off (DEFAULT), 1 = auto (TPU only),
    2 = force (CPU parity tests run the kernels in interpret mode).

    Default off — measured END-TO-END REGRESSION on hardware
    (2026-08-20): 498.4 ms vs 469.7 ms at the nt-dot config, parity
    unchanged 3.22e-7.  The XLA glue this path eliminates (column
    assembly, slice extraction, panel mask, Lcol pair-split) fuses into
    a handful of cheap elementwise passes in practice, while K1's
    in-register slice-pair accumulation (no k grid dimension, whole
    block contraction per cell) loses more than the glue saved.  Kept
    behind the knob with full CPU parity coverage for re-testing if
    the kernel is restructured (k-grid + scratch accumulators)."""
    import os

    return int(os.environ.get("ANDVARANAUT_FUSED_PANEL", "0"))


def use_fused_panel() -> bool:
    from .._config import is_tpu

    mode = _fused_panel()
    return mode == 2 or (mode == 1 and is_tpu())


def _fused_grad() -> int:
    """ANDVARANAUT_FUSED_GRAD: the GRADIENT pipeline's pair-native
    K^-1 route (pair L^-1 -> column-scale slice kernel -> pre-sliced
    tn syrk, bigfit._nlml_vg) — 0 = off, 1 = auto (TPU only, DEFAULT),
    2 = force (interpret mode).  Measured on-chip (2026-08-20, 16k MAP
    A/B): per value+grad 1.76 s vs 1.80 s baseline at the SAME optimum
    (logpost 51911.75) — a small wall win, plus it drops the f64 L^-1
    plane and its extraction temporaries from the program's HBM peak
    (~2-4 GB on a chip the 16k gradient program already OOMed once).
    Unlike the panel fusion (regressed, off), this route reuses the
    production syrk kernel unchanged."""
    import os

    return int(os.environ.get("ANDVARANAUT_FUSED_GRAD", "1"))


def use_fused_grad() -> bool:
    from .._config import is_tpu

    mode = _fused_grad()
    return mode == 2 or (mode == 1 and is_tpu())


def _extract_slices(vh, vl, inv_sa, nslices, out):
    """In-kernel int8 slice extraction of the pair value (vh + vl) / sa.

    Mirrors precision._int_slices: nslices truncation steps on the
    running residual, carried as an f32 pair.  inv_sa is the exact pow2
    reciprocal row scale, so every scale multiply is exact; `Rh * 128`
    is exact (pow2); `Rh2 - c` is exact (c = trunc(Rh2 + Rl2) is an
    integer within 1 of Rh2, and the fractional bits are inside Rh2's
    mantissa).  The trunc goes through an int32 convert (round toward
    zero — hardware-probed, benchmarks/nt_dot_probe.py) which also
    yields the int8 slice value directly.  |c| <= 64 + 1 stays inside
    int8 comfortably."""
    Rh = vh * inv_sa
    Rl = vl * inv_sa
    for s in range(nslices):
        Rh = Rh * jnp.float32(128.0)
        Rl = Rl * jnp.float32(128.0)
        ci = (Rh + Rl).astype(jnp.int32)
        out[s][:] = ci.astype(jnp.int8)
        c = ci.astype(jnp.float32)
        r = Rh - c
        # renormalise the (r, Rl) pair
        s_ = r + Rl
        comp = jnp.where(jnp.abs(r) >= jnp.abs(Rl), (r - s_) + Rl,
                         (Rl - s_) + r)
        Rh, Rl = s_, comp


def _panel_kernel(nslices, nct, block, tmax, *refs):
    """One (TM, 256) finished-panel tile written in place into the carry.

    Grid: (live row tiles, block/256 output column tiles).  The k loop
    (over the block-wide contraction) is internal, so the slice-pair
    accumulators live in registers; the column-block slices are
    extracted once per row tile (ct == 0) into scratch.

    refs: bounds (2,) i32 scalar prefetch [lo, row_start]; linv slices
    (nslices x (256, block) windows of the NATIVE-layout inverse);
    sb (8, 256) pow2 row scales of Linv for this ct; ah/al (TM, block)
    carry read windows at column block lo; sa (TM, 128) pow2 row scales
    of the column block (computed outside from the carry hi plane);
    awh/awl (TM, 256) carry windows aliased to the outputs; oh/ol
    outputs; csl scratch (nslices x (TM, block) int8)."""
    bounds = refs[0]
    refs = refs[1:]
    linv_refs = refs[:nslices]
    sb_ref = refs[nslices]
    ah_ref, al_ref, sa_ref = refs[nslices + 1 : nslices + 4]
    awh_ref, awl_ref = refs[nslices + 4 : nslices + 6]
    oh_ref, ol_ref = refs[nslices + 6], refs[nslices + 7]
    csl = refs[nslices + 8 :]
    t = pl.program_id(0)
    ct = pl.program_id(1)
    row = jnp.minimum(
        t + jax.lax.div(bounds[1], jnp.int32(_TM)), jnp.int32(tmax - 1))
    active = (row + jnp.int32(1)) * jnp.int32(_TM) > bounds[1]

    @pl.when(active & (ct == 0))
    def _():
        inv_sa = jnp.float32(1.0) / sa_ref[:, :1]  # exact pow2 recip
        _extract_slices(ah_ref[:], al_ref[:], inv_sa, nslices, csl)

    @pl.when(active)
    def _():
        norders = _n_scratch(nslices, False)
        accs = [jnp.zeros((_TM, _TN), jnp.int32) for _ in range(norders)]
        for kc in range(block // _TN):
            k0 = kc * _TN
            for i in range(nslices):
                a = csl[i][:, k0 : k0 + _TN]
                for j in range(nslices - i):
                    b = linv_refs[j][:, k0 : k0 + _TN]
                    accs[i + j] = accs[i + j] + _pair_dot_nt(a, b)
        chi = jnp.zeros((_TM, _TN), jnp.float32)
        clo = jnp.zeros((_TM, _TN), jnp.float32)
        for s in range(nslices):
            g = accs[s]
            ghi = jax.lax.shift_right_arithmetic(g, jnp.int32(12))
            glo = g - jax.lax.shift_left(ghi, jnp.int32(12))
            w = jnp.float32(2.0 ** (-7.0 * (s + 2)))
            chi, clo = _two_sum(
                chi, clo, ghi.astype(jnp.float32) * (w * 4096.0))
            chi, clo = _two_sum(chi, clo, glo.astype(jnp.float32) * w)
        sa = sa_ref[:, :1]
        sb = sb_ref[:1, :]
        oh_ref[:] = (chi * sa) * sb
        ol_ref[:] = (clo * sa) * sb

    @pl.when(jnp.logical_not(active))
    def _():
        # clamped cell of an all-dead call: carry passes through
        oh_ref[:] = awh_ref[:]
        ol_ref[:] = awl_ref[:]


def panel_into_carry(Ahi, Alo, Linv, lo, row_start, block: int,
                     nslices: int | None = None):
    """Finished panel P = A[:, lo:lo+block] @ Linv^T written in place
    into the carry pair at the same column block, rows >= row_start;
    rows above are never visited (their carry tiles pass through
    untouched, preserving earlier finished columns).  See module
    docstring.  `lo`/`row_start` are dynamic (traced) multiples of the
    256 tile; `block` is static."""
    ns = precision.INT_NSLICES if nslices is None else nslices
    m = Ahi.shape[0]
    assert Ahi.shape == (m, m) and Alo.shape == (m, m)
    assert m % _TM == 0 and block % _TN == 0
    dt = Linv.dtype
    T = m // _TM
    nct = block // _TN

    # b operand: native-layout int8 slices of Linv (small, XLA passes)
    sB = precision._pow2_row_scales(Linv, axis=1)   # (block, 1)
    b_sl = [s for s in precision._int_slices(Linv / sB, ns)]
    sb32 = jnp.broadcast_to(
        sB.reshape(1, -1).astype(jnp.float32), (8, block))
    # a operand row scales from the carry hi plane (|v| <= |hi|(1+eps);
    # the +2 exponent margin in _pow2_row_scales absorbs the pair lo)
    cols_hi = jax.lax.dynamic_slice(
        Ahi, (0, lo), (m, block))
    sa = precision._pow2_row_scales(cols_hi, axis=1)
    sa32 = jnp.broadcast_to(sa, (m, 128))

    bounds = jnp.stack([
        jnp.asarray(lo, jnp.int32), jnp.asarray(row_start, jnp.int32)])
    tgrid = jnp.maximum(
        jnp.int32(T) - jnp.asarray(row_start, jnp.int32) // _TM, 1)

    def _row(t, ct, b):
        return jnp.minimum(
            t + jax.lax.div(b[1], np.int32(_TM)), np.int32(T - 1))

    linv_spec = pl.BlockSpec(
        (_TN, block), lambda t, ct, b: (ct, np.int32(0)),
        memory_space=pltpu.VMEM)
    sb_spec = pl.BlockSpec(
        (8, _TN), lambda t, ct, b: (np.int32(0), ct),
        memory_space=pltpu.VMEM)
    aread_spec = pl.BlockSpec(
        (_TM, block),
        lambda t, ct, b: (_row(t, ct, b), jax.lax.div(
            b[0], np.int32(block))),
        memory_space=pltpu.VMEM)
    sa_spec = pl.BlockSpec(
        (_TM, 128), lambda t, ct, b: (_row(t, ct, b), np.int32(0)),
        memory_space=pltpu.VMEM)
    awr_spec = pl.BlockSpec(
        (_TM, _TN),
        lambda t, ct, b: (_row(t, ct, b),
                          jax.lax.div(b[0], np.int32(_TN)) + ct),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tgrid, nct),
        in_specs=[linv_spec] * ns
        + [sb_spec, aread_spec, aread_spec, sa_spec, awr_spec, awr_spec],
        out_specs=(awr_spec, awr_spec),
        scratch_shapes=[
            pltpu.VMEM((_TM, block), jnp.int8) for _ in range(ns)
        ],
    )
    # flat inputs: 1 scalar-prefetch, ns linv slices, sb, Ahi-read,
    # Alo-read, sa, Ahi-write, Alo-write (aliased to outputs 0, 1)
    base = 1 + ns + 4
    nhi, nlo = pl.pallas_call(
        partial(_panel_kernel, ns, nct, block, T),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
        ),
        input_output_aliases={base: 0, base + 1: 1},
        interpret=interpret_mode(),
    )(bounds, *b_sl, sb32, Ahi, Alo, sa32, Ahi, Alo)
    return nhi, nlo


def _slices_kernel(nslices, tmax, *refs):
    """Extract the int8 slices of one (TM, block) pair window.

    refs: bounds (2,) i32 [lo, row_start]; ah/al (TM, block) carry
    windows; sa (TM, 128); nslices output windows (TM, block) int8."""
    bounds = refs[0]
    ah_ref, al_ref, sa_ref = refs[1], refs[2], refs[3]
    out = refs[4:]
    t = pl.program_id(0)
    row = jnp.minimum(
        t + jax.lax.div(bounds[1], jnp.int32(_TM)), jnp.int32(tmax - 1))
    active = (row + jnp.int32(1)) * jnp.int32(_TM) > bounds[1]

    @pl.when(active)
    def _():
        inv_sa = jnp.float32(1.0) / sa_ref[:, :1]
        _extract_slices(ah_ref[:], al_ref[:], inv_sa, nslices, out)


def pair_to_slices(Ahi, Alo, lo, row_start, block: int,
                   nslices: int | None = None):
    """int8 slices + exact pow2 row scales of the carry pair's
    (m, block) column block at `lo`, rows >= row_start (rows above are
    UNDEFINED in the outputs — consumers' grids never visit them).
    Returns (slices list, sa (m, 1) in Ahi dtype)."""
    ns = precision.INT_NSLICES if nslices is None else nslices
    m = Ahi.shape[0]
    T = m // _TM
    cols_hi = jax.lax.dynamic_slice(Ahi, (0, lo), (m, block))
    sa = precision._pow2_row_scales(cols_hi, axis=1)
    sa32 = jnp.broadcast_to(sa, (m, 128))
    bounds = jnp.stack([
        jnp.asarray(lo, jnp.int32), jnp.asarray(row_start, jnp.int32)])
    tgrid = jnp.maximum(
        jnp.int32(T) - jnp.asarray(row_start, jnp.int32) // _TM, 1)

    def _row(t, b):
        return jnp.minimum(
            t + jax.lax.div(b[1], np.int32(_TM)), np.int32(T - 1))

    aread_spec = pl.BlockSpec(
        (_TM, block),
        lambda t, b: (_row(t, b), jax.lax.div(b[0], np.int32(block))),
        memory_space=pltpu.VMEM)
    sa_spec = pl.BlockSpec(
        (_TM, 128), lambda t, b: (_row(t, b), np.int32(0)),
        memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec(
        (_TM, block), lambda t, b: (_row(t, b), np.int32(0)),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tgrid,),
        in_specs=[aread_spec, aread_spec, sa_spec],
        out_specs=tuple(o_spec for _ in range(ns)),
    )
    sl = pl.pallas_call(
        partial(_slices_kernel, ns, T),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((m, block), jnp.int8)
            for _ in range(ns)),
        interpret=interpret_mode(),
    )(bounds, Ahi, Alo, sa32)
    return list(sl), sa


def _slices_cols_kernel(nslices, ah_ref, al_ref, sb_ref, *out):
    """Extract the int8 slices of one (TM, TN) pair tile with
    per-COLUMN scales (the K^-1 = W^T W operand convention: the tn
    syrk contracts dim 0, so slice windows sit below a column-wise
    pow2 scale)."""
    inv_sb = jnp.float32(1.0) / sb_ref[:1, :]
    _extract_slices(ah_ref[:], al_ref[:], inv_sb, nslices, out)


def pair_to_slices_cols(Whi, Wlo, nslices: int | None = None):
    """int8 slices + exact pow2 COLUMN scales of a full (m, m) pair —
    the native-layout operand of the pre-sliced tn syrk
    (pallas_slicemm.pallas_int_slice_syrk_tn_lower_presliced), fed with
    the pair-carried L^-1 so its f64 assembly + in-wrapper extraction
    (~25 full-matrix passes at 16k) disappear.  Exact-zero pair entries
    (the triangular inverse's upper half) yield exact-zero slices, so
    the caller's w_lower k-chunk-skip contract is preserved.  Returns
    (slices list, column scales (1, m) f32)."""
    ns = precision.INT_NSLICES if nslices is None else nslices
    m = Whi.shape[0]
    assert Whi.shape == (m, m) and Wlo.shape == (m, m)
    assert m % _TM == 0
    sb = precision._pow2_row_scales(Whi, axis=0)   # (1, m) f32
    sb32 = jnp.broadcast_to(sb, (8, m))
    T = m // _TM
    pair_spec = pl.BlockSpec(
        (_TM, _TN), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    sb_spec = pl.BlockSpec(
        (8, _TN), lambda i, j: (np.int32(0), j), memory_space=pltpu.VMEM)
    sl = pl.pallas_call(
        partial(_slices_cols_kernel, ns),
        grid=(T, m // _TN),
        in_specs=[pair_spec, pair_spec, sb_spec],
        out_specs=tuple(pair_spec for _ in range(ns)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((m, m), jnp.int8) for _ in range(ns)),
        interpret=interpret_mode(),
    )(Whi, Wlo, sb32)
    return list(sl), sb
