"""Fused Pallas TPU kernel: diagonal-block Cholesky + triangular inverse
in double-f32 pair arithmetic.

The blocked factorisation's per-diagonal-block machinery (f32 seed chol,
Newton refinement, blocked substitution inverses — `_chol_inv_seeded`)
is DISPATCH-BOUND on this platform: ~50 ms per 1024 block measured in a
fresh process, i.e. most of the 1.10 s 16k NLML, while the essential
FLOPs are trivial.  XLA's own f32 Cholesky is row-latency-bound the same
way (~29 ms standalone at 1024).  This kernel computes the factor AND
its inverse for a whole block in ONE Mosaic call, entirely in VMEM, so
the ~80 sequential XLA launches per block collapse into in-kernel loop
iterations.

Numerics: no f64 exists inside Pallas TPU, so every value is carried as
an UNEVALUATED f32 PAIR (hi, lo) with |lo| <= ulp(hi)/2 — the classic
double-word representation (Dekker/Knuth error-free transforms; Dekker
product split at 2^12+1, valid for f32).  A pair has ~48 mantissa bits
(~3.6e-15 relative), comfortably above the ~1e-10 entrywise grade the
trailing Schur updates require (docs/TPU_NOTES.md accuracy ladder) and
equal in practice to the emulated-f64 path it replaces.  All pair
operations are VPU elementwise; there are NO matmul reductions anywhere
— the factorisation and the substitution inverse are organised as
rank-1 (outer-product) updates, which keep the pair arithmetic
associative-order-exact and map to full-width vector ops.

Mosaic constraints shape the implementation (each cost hours — see
docs/TPU_NOTES.md):
- NO dynamic indexing of the lane dim (dim 1 must be statically
  128-aligned) and none of the sublane dim either: single rows/columns
  are extracted from statically-sliced panels by 0/1-mask multiply +
  axis reduction (exact: one nonzero per output element).
- A column (h,1) is transposed to a row (1,h) by the diag trick
  `sum(col * eye, axis=0)` — no reshape/transpose across lanes.
- No bool->float `.astype` (the Mosaic convert helper recurses under
  x64); masks come from `jnp.where(cond, 1.0f, 0.0f)`.
- All loop indices/iota are int32.

Layout per sub-block step (grain `_SB` = 128):

- column Cholesky: for each of the 128 columns of a sub-block, extract
  the trailing column from the (h, 128) panel, scale by the pair
  reciprocal square root of its pivot and rank-1-update the remaining
  columns of the SAME panel; after a sub-block finishes, one k=128
  rank-1 loop applies its panel's syrk update to the trailing
  sub-blocks.  (Reference anchor: this replaces the per-fit
  pt.slinalg.cholesky of /root/reference/andvaranaut/gpmcmc.py:313.)
- forward-substitution inverse: X starts as I; row g is extracted from
  the (h, w) live column range by row-mask reduce, scaled by the pair
  reciprocal of L[g,g], and eliminated from the rows below by a rank-1
  update with L's column g (extracted from the L panel the same way).

The caller equilibrates the block to ~unit diagonal with exact
power-of-two scales (f64, outside) and splits it into the (hi, lo) pair
— both exact — so pair dynamic range is never stressed.  A NaN/pivot
gate falls back to the seeded path under lax.cond.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from .._config import interpret_mode

_SB = 128  # sub-block grain: columns per chol pass / rows per subst pass

_SPLIT = np.float32(4097.0)  # Dekker split constant for f32: 2^12 + 1


def _two_sum(ah, al, bh, bl):
    """Pair addition (hi, lo) = (ah, al) + (bh, bl), Knuth two-sum on the
    his, lows folded in, one renormalisation."""
    s = ah + bh
    v = s - ah
    e = (ah - (s - v)) + (bh - v)
    w = al + bl + e
    hi = s + w
    lo = w - (hi - s)
    return hi, lo


def _two_prod(a, b):
    """Exact f32 product a*b = p + e via Dekker splitting (no FMA)."""
    p = a * b
    a1 = a * _SPLIT
    ah = a1 - (a1 - a)
    al = a - ah
    b1 = b * _SPLIT
    bh = b1 - (b1 - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _pair_mul(ah, al, bh, bl):
    """Pair product: exact hi*hi plus first-order cross terms."""
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    hi = p + e
    lo = e - (hi - p)
    return hi, lo


def _pair_recip(ah, al):
    """Pair reciprocal: f32 seed + one pair-Newton step (quadratic:
    ~1e-14 after one step from a 6e-8 seed)."""
    r = 1.0 / ah
    ph, pl_ = _pair_mul(ah, al, r, jnp.zeros_like(r))
    eh, el = _two_sum(jnp.float32(1.0), jnp.float32(0.0), -ph, -pl_)
    ch, cl = _pair_mul(eh, el, r, jnp.zeros_like(r))
    return _two_sum(r, jnp.zeros_like(r), ch, cl)


def _pair_rsqrt(ah, al):
    """Pair reciprocal square root: f32 seed + one pair-Newton step
    r <- r + r*(1 - a*r^2)/2."""
    r = jax.lax.rsqrt(ah)
    z = jnp.zeros_like(r)
    r2h, r2l = _pair_mul(r, z, r, z)
    ph, pl_ = _pair_mul(ah, al, r2h, r2l)
    eh, el = _two_sum(jnp.float32(1.0), jnp.float32(0.0), -ph, -pl_)
    he_h, he_l = _pair_mul(eh, el, 0.5 * r, z)
    return _two_sum(r, z, he_h, he_l)


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _cholinv_mxu() -> bool:
    """ANDVARANAUT_CHOLINV_MXU, read per call like every other knob in
    the kernel stack (_syrk_nt/_dimsem pattern — an import-time read
    would silently ignore env changes after the module loads): run the
    kernel's sub-block trailing syrk on the MXU via in-kernel int8
    slice extraction (6 slices, int32 accumulation) instead of the
    128-iteration rank-1 pair loop.  1 = on (DEFAULT — measured
    2026-08-20: headline 16k NLML 469.7 -> 457.4 ms at parity 3.25e-7
    vs 3.22e-7), 0 = the rank-1 pair loop.  The rank-1 loop is
    SEQUENTIAL-ITERATION-bound, so the 384 syrk iterations of a 512
    block were a large share of the fused call's wall; the MXU form
    replaces them with one in-kernel extraction + 21 dots.  Accuracy:
    the equilibrated operands are O(1), so the slice product's ~2^-42
    absolute grade gives ~1e-12 block reconstruction error (below the
    OUTER factorisation's 4e-11 product grade) and the inverse stays
    substitution-consistent (~2e-14); the factor gate and the
    composition-grade regression tests stand guard."""
    import os

    return int(os.environ.get("ANDVARANAUT_CHOLINV_MXU", "1")) != 0


_NSL = 6  # slice count for the in-kernel syrk (int8 Ozaki)


def _syrk_mxu(lh_ref, ll_ref, lo, hp, eye_hp):
    """Trailing syrk W -= P P^T on the MXU: in-kernel int8 slice
    extraction of the finished (hp, SB) pair panel (per-row pow2
    scales from exponent bits — hardware-probed bitcasts), nt-form
    slice-pair dots with exact int32 accumulation, pow2 rescale, pair
    subtraction."""
    Ph = lh_ref[lo + _SB :, lo : lo + _SB]  # (hp, SB)
    Pl = ll_ref[lo + _SB :, lo : lo + _SB]
    # exact pow2 row scales: floor(log2 max|Ph|) + 2 (margin covers lo).
    # u32<->i32 VALUE converts trip the Mosaic convert-helper recursion
    # under x64 — same-width BITCASTS are value-preserving here (the
    # exponent field is < 2^31) and lower cleanly (hardware-probed).
    m = jnp.maximum(jnp.max(jnp.abs(Ph), axis=1, keepdims=True),
                    jnp.float32(1e-30))
    u = jax.lax.bitcast_convert_type(m, jnp.uint32)
    e = jax.lax.bitcast_convert_type(
        (u >> jnp.uint32(23)) & jnp.uint32(0xFF), jnp.int32)
    e = jnp.clip(e - jnp.int32(125), jnp.int32(-120), jnp.int32(120))
    eb = jax.lax.bitcast_convert_type(e + jnp.int32(127), jnp.uint32)
    sa = jax.lax.bitcast_convert_type(
        eb << jnp.uint32(23), jnp.float32)
    inv_sa = jnp.float32(1.0) / sa  # (hp, 1), exact pow2 recip
    Rh = Ph * inv_sa
    Rl = Pl * inv_sa
    slices = []
    for _ in range(_NSL):
        Rh = Rh * jnp.float32(128.0)
        Rl = Rl * jnp.float32(128.0)
        ci = (Rh + Rl).astype(jnp.int32)
        slices.append(ci.astype(jnp.int8))
        c = ci.astype(jnp.float32)
        r = Rh - c
        s_ = r + Rl
        comp = jnp.where(jnp.abs(r) >= jnp.abs(Rl), (r - s_) + Rl,
                         (Rl - s_) + r)
        Rh, Rl = s_, comp
    accs = [jnp.zeros((hp, hp), jnp.int32) for _ in range(_NSL)]
    for i in range(_NSL):
        for j2 in range(_NSL - i):
            p = jax.lax.dot_general(
                slices[i], slices[j2],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            accs[i + j2] = accs[i + j2] + p
    chi = jnp.zeros((hp, hp), jnp.float32)
    clo = jnp.zeros((hp, hp), jnp.float32)
    for s in range(_NSL):
        g = accs[s]
        ghi = jax.lax.shift_right_arithmetic(g, jnp.int32(12))
        glo = g - jax.lax.shift_left(ghi, jnp.int32(12))
        w = jnp.float32(2.0 ** (-7.0 * (s + 2)))
        chi, clo = _two_sum(chi, clo,
                            ghi.astype(jnp.float32) * (w * 4096.0),
                            jnp.float32(0.0))
        chi, clo = _two_sum(chi, clo, glo.astype(jnp.float32) * w,
                            jnp.float32(0.0))
    # row then column pow2 scales (column vector transposed by the
    # diag trick — no lane reshape)
    sb = jnp.sum(sa * eye_hp, axis=0, keepdims=True)  # (1, hp)
    chi = (chi * sa) * sb
    clo = (clo * sa) * sb
    Wh = lh_ref[lo + _SB :, lo + _SB :]
    Wl = ll_ref[lo + _SB :, lo + _SB :]
    nh, nl = _two_sum(Wh, Wl, -chi, -clo)
    lh_ref[lo + _SB :, lo + _SB :] = nh
    ll_ref[lo + _SB :, lo + _SB :] = nl


def _mask(cond):
    """0/1 f32 mask without astype (Mosaic convert-helper recursion)."""
    return jnp.where(cond, jnp.float32(1.0), jnp.float32(0.0))


def _kernel(b, mxu, ah_ref, al_ref, lh_ref, ll_ref, xh_ref, xl_ref):
    """Factor + invert one (b, b) SPD block.  All refs VMEM f32.
    mxu (static): sub-block trailing syrks on the MXU (see _syrk_mxu)."""
    nsb = b // _SB
    f0 = jnp.float32(0.0)
    eye_sb = _mask(_iota((_SB, _SB), 0) == _iota((_SB, _SB), 1))

    # working copy of A in the L output refs (factorisation is in-place)
    lh_ref[:] = ah_ref[:]
    ll_ref[:] = al_ref[:]

    # ---- blocked column Cholesky --------------------------------------
    for j in range(nsb):  # static python loop: static region slices
        lo = j * _SB
        h = b - lo  # trailing height

        def col_step(i, _, lo=lo, h=h):
            Ph = lh_ref[lo:, lo:lo + _SB]  # (h, SB) static aligned slice
            Pl = ll_ref[lo:, lo:lo + _SB]
            # extract trailing column i (lane-mask reduce; exact)
            cm = _mask(_iota((h, _SB), 1) == i)
            ch = jnp.sum(Ph * cm, axis=1, keepdims=True)  # (h, 1)
            cl = jnp.sum(Pl * cm, axis=1, keepdims=True)
            # pivot = element i of the column (sublane-mask reduce)
            rm = _mask(_iota((h, 1), 0) == i)
            dh = jnp.sum(ch * rm)
            dl = jnp.sum(cl * rm)
            rh, rl = _pair_rsqrt(dh, dl)
            # scaled column, zero above the pivot
            gh, gl = _pair_mul(ch, cl, rh, rl)
            below = _iota((h, 1), 0) >= i
            gh = jnp.where(below, gh, f0)
            gl = jnp.where(below, gl, f0)
            # row vector g[0:SB] via the diag trick (no lane reshape)
            gbh = jnp.sum(gh[:_SB] * eye_sb, axis=0, keepdims=True)
            gbl = jnp.sum(gl[:_SB] * eye_sb, axis=0, keepdims=True)
            colgt = _iota((1, _SB), 1) > i
            gbh = jnp.where(colgt, gbh, f0)
            gbl = jnp.where(colgt, gbl, f0)
            # rank-1 update of the remaining columns, write column i
            ph, pl_ = _pair_mul(gh, gl, gbh, gbl)
            nh, nl = _two_sum(Ph, Pl, -ph, -pl_)
            iscol = _iota((h, _SB), 1) == i
            lh_ref[lo:, lo:lo + _SB] = jnp.where(iscol, gh, nh)
            ll_ref[lo:, lo:lo + _SB] = jnp.where(iscol, gl, nl)
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(_SB), col_step,
                          jnp.int32(0))

        if j + 1 < nsb:
            # trailing syrk: W[lo+SB:, lo+SB:] -= P P^T, P the finished
            # panel W[lo+SB:, lo:lo+SB]; MXU slice products or a k=128
            # rank-1 loop (CHOLINV_MXU)
            hp = h - _SB
            eye_hp = _mask(_iota((hp, hp), 0) == _iota((hp, hp), 1))

            if mxu:
                _syrk_mxu(lh_ref, ll_ref, lo, hp, eye_hp)
                continue

            def syrk_step(k, _, lo=lo, hp=hp, eye_hp=eye_hp):
                P2h = lh_ref[lo + _SB:, lo:lo + _SB]  # (hp, SB)
                P2l = ll_ref[lo + _SB:, lo:lo + _SB]
                cm = _mask(_iota((hp, _SB), 1) == k)
                uh = jnp.sum(P2h * cm, axis=1, keepdims=True)  # (hp, 1)
                ul = jnp.sum(P2l * cm, axis=1, keepdims=True)
                # transpose to (1, hp) via the diag trick
                vh = jnp.sum(uh * eye_hp, axis=0, keepdims=True)
                vl = jnp.sum(ul * eye_hp, axis=0, keepdims=True)
                qh, ql = _pair_mul(uh, ul, vh, vl)  # (hp, hp)
                Wh = lh_ref[lo + _SB:, lo + _SB:]
                Wl = ll_ref[lo + _SB:, lo + _SB:]
                nh, nl = _two_sum(Wh, Wl, -qh, -ql)
                lh_ref[lo + _SB:, lo + _SB:] = nh
                ll_ref[lo + _SB:, lo + _SB:] = nl
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(_SB), syrk_step,
                              jnp.int32(0))

    # zero the strictly-upper triangle of L (the workspace holds stale A)
    tril = _iota((b, b), 0) >= _iota((b, b), 1)
    lh_ref[:] = jnp.where(tril, lh_ref[:], f0)
    ll_ref[:] = jnp.where(tril, ll_ref[:], f0)

    # ---- forward-substitution inverse, in place on X = I --------------
    xh_ref[:] = _mask(_iota((b, b), 0) == _iota((b, b), 1))
    xl_ref[:] = jnp.zeros_like(xl_ref)
    for j in range(nsb):
        lo = j * _SB
        w = lo + _SB  # columns this block-row can touch (static)
        h = b - lo

        def row_step(i, _, lo=lo, w=w, h=h):
            Xh = xh_ref[lo:, :w]  # (h, w) static aligned slice
            Xl = xl_ref[lo:, :w]
            Lph = lh_ref[lo:, lo:lo + _SB]  # (h, SB) L panel
            Lpl = ll_ref[lo:, lo:lo + _SB]
            rowi = _iota((h, 1), 0) == i
            # pivot L[g, g] (double-mask reduce on the panel)
            pm = _mask(rowi & (_iota((h, _SB), 1) == i))
            dh = jnp.sum(Lph * pm)
            dl = jnp.sum(Lpl * pm)
            rh, rl = _pair_recip(dh, dl)
            # row g of X (sublane-mask reduce), scaled by the reciprocal
            rm = _mask(rowi)
            vh = jnp.sum(Xh * rm, axis=0, keepdims=True)  # (1, w)
            vl = jnp.sum(Xl * rm, axis=0, keepdims=True)
            vh, vl = _pair_mul(vh, vl, rh, rl)
            # L column g strictly below the pivot (lane-mask reduce)
            cm = _mask(_iota((h, _SB), 1) == i)
            ch = jnp.sum(Lph * cm, axis=1, keepdims=True)  # (h, 1)
            cl = jnp.sum(Lpl * cm, axis=1, keepdims=True)
            strictly_below = _iota((h, 1), 0) > i
            ch = jnp.where(strictly_below, ch, f0)
            cl = jnp.where(strictly_below, cl, f0)
            # eliminate below, write the scaled row at g
            uh, ul = _pair_mul(ch, cl, vh, vl)  # (h, w)
            nh, nl = _two_sum(Xh, Xl, -uh, -ul)
            xh_ref[lo:, :w] = jnp.where(rowi, vh, nh)
            xl_ref[lo:, :w] = jnp.where(rowi, vl, nl)
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(_SB), row_step,
                          jnp.int32(0))


def chol_inv_block_pair(Ajj):
    """(L, X=L^-1, ok) of an SPD diagonal block via the fused pair
    kernel.  Equilibrates with exact pow2 scales, splits to an f32 pair,
    runs ONE Mosaic call, recombines in f64.  `ok` is False when the
    block was too ill-conditioned for the f32-pair pivots (caller falls
    back under lax.cond).  The MXU-syrk knob resolves OUTSIDE the jit
    so it is part of the compile-cache key."""
    return _chol_inv_block_pair(Ajj, mxu=_cholinv_mxu())


@partial(jax.jit, static_argnames=("mxu",))
def _chol_inv_block_pair(Ajj, mxu: bool):
    from . import precision

    b = Ajj.shape[0]
    d = precision._pow2_sqrt_scales(jnp.diag(Ajj))
    As = Ajj / d[:, None] / d[None, :]
    ah = As.astype(jnp.float32)
    al = (As - ah.astype(As.dtype)).astype(jnp.float32)
    # grid=(1,) with explicit np.int32 index maps, NOT a gridless call:
    # under jax.vmap (chains of the small-n MCMC objective) the pallas
    # batching rule composes new index maps by evaluating the existing
    # ones and prepending the batch index — a gridless spec's implicit
    # map returns literal-0 constants that trace as i64 under x64, which
    # Mosaic rejects at func.return (measured on-chip: the n=256 HMC
    # init failed to legalize `func.return (i32, i64, i64)`).  With
    # int32 zeros here the composed maps are all-i32 and legalise.
    _z2 = lambda i: (np.int32(0), np.int32(0))
    lh, ll, xh, xl = pl.pallas_call(
        partial(_kernel, b, mxu),
        grid=(1,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, b), jnp.float32) for _ in range(4)),
        in_specs=[pl.BlockSpec((b, b), _z2, memory_space=pltpu.VMEM)] * 2,
        out_specs=tuple(
            pl.BlockSpec((b, b), _z2, memory_space=pltpu.VMEM)
            for _ in range(4)),
        interpret=interpret_mode(),
    )(ah, al)
    L = lh.astype(Ajj.dtype) + ll.astype(Ajj.dtype)
    X = xh.astype(Ajj.dtype) + xl.astype(Ajj.dtype)
    ok = (jnp.isfinite(lh).all() & jnp.isfinite(xh).all()
          & (jnp.min(jnp.diag(lh)) > 1e-6))
    L = L * d[:, None]
    X = X * (1.0 / d)[None, :]
    return L, X, ok


# tests clear the underlying jit cache through the public name
chol_inv_block_pair.clear_cache = _chol_inv_block_pair.clear_cache
