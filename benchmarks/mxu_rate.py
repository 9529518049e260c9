#!/usr/bin/env python
"""MXU rate probe: int8->int32 vs bf16->f32 dot throughput in a Pallas
kernel shaped like the slice-matmul inner loop.

Motivation (docs/TPU_NOTES.md): the fused int8 slice kernel plateaus at
~24% of the part's 394 int8 TOPS == ~50% of its 197 bf16 TFLOPS, which
smells like the int8 dots executing on the bf16 pipeline without the 2x
int8 rate.  The slices are 7-bit integers and the k-chunk is 256, so a
bf16 x bf16 -> f32 dot of the SAME slice values is bit-exact (chunk sums
<= 2^22 < 2^24): if bf16 dots run 2x the int8 rate here, the dominant
factorisation stage can switch dtype for free.

Run on the real TPU in a FRESH process (cross-executable swap overhead
corrupts warm-process timings — TPU_NOTES "Micro-benchmark trap").
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 256
NPAIR = 21  # slice-pair products per tile, as in the production kernel


def _kernel_int8(nk, *refs):
    a_ref, b_ref, o_ref, acc = refs
    kidx = pl.program_id(1)

    @pl.when(kidx == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    for _ in range(NPAIR):
        acc[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    @pl.when(kidx == nk - 1)
    def _():
        o_ref[:] = acc[:]


def _kernel_bf16(nk, *refs):
    a_ref, b_ref, o_ref, acc = refs
    kidx = pl.program_id(1)

    @pl.when(kidx == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    for _ in range(NPAIR):
        p = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # exact: chunk dot of 7-bit integers <= 256*127^2 = 2^22 < 2^24
        acc[:] += p.astype(jnp.int32)

    @pl.when(kidx == nk - 1)
    def _():
        o_ref[:] = acc[:]


def _kernel_bf16_f32acc(nk, *refs):
    a_ref, b_ref, o_ref, acc = refs
    kidx = pl.program_id(1)

    @pl.when(kidx == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    for _ in range(NPAIR):
        acc[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kidx == nk - 1)
    def _():
        o_ref[:] = acc[:].astype(jnp.int32)


INTERPRET = False  # set by --interpret for a CPU smoke test


@functools.partial(jax.jit, static_argnames=("mode", "tiles", "nk"))
def _run(a, b, mode: str, tiles: int, nk: int):
    kern = {"int8": _kernel_int8, "bf16": _kernel_bf16,
            "bf16f32": _kernel_bf16_f32acc}[mode]
    acc_dt = jnp.float32 if mode == "bf16f32" else jnp.int32
    a_spec = pl.BlockSpec((_T, _T), lambda t, kk: (t, kk),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((_T, _T), lambda t, kk: (kk, t),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((_T, _T), lambda t, kk: (t, np.int32(0)),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kern, nk),
        grid=(tiles, nk),
        in_specs=[a_spec, b_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((tiles * _T, _T), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_T, _T), acc_dt)],
        interpret=INTERPRET,
    )(a, b)


def main():
    global INTERPRET
    args = [a for a in sys.argv[1:] if a != "--interpret"]
    INTERPRET = "--interpret" in sys.argv
    tiles = int(args[0]) if len(args) > 0 else 16
    nk = int(args[1]) if len(args) > 1 else 32
    rng = np.random.default_rng(0)
    ci = rng.integers(-64, 65, size=(tiles * _T, nk * _T), dtype=np.int64)
    a8 = jnp.asarray(ci, dtype=jnp.int8)
    b8 = jnp.asarray(ci.T, dtype=jnp.int8)
    a16 = jnp.asarray(ci, dtype=jnp.bfloat16)
    b16 = jnp.asarray(ci.T, dtype=jnp.bfloat16)
    ops = 2.0 * NPAIR * tiles * _T * _T * (nk * _T)

    outs = {}
    for mode, a, b in (("int8", a8, b8), ("bf16", a16, b16),
                       ("bf16f32", a16, b16)):
        o = _run(a, b, mode, tiles, nk)
        outs[mode] = np.asarray(o)
        t0 = time.time()
        reps = 10
        for _ in range(reps):
            o = _run(a, b, mode, tiles, nk)
        float(o[0, 0])  # force a host read: block_until_ready lies here
        dt = (time.time() - t0) / reps
        print(f"{mode:8s}: {dt * 1e3:8.2f} ms -> {ops / dt / 1e12:7.1f} "
              f"TOPS  (tiles={tiles}, nk={nk})")
    same = np.array_equal(outs["int8"], outs["bf16"])
    same2 = np.array_equal(outs["int8"], outs["bf16f32"])
    print(f"bf16 bit-exact vs int8: {same}; bf16/f32acc: {same2}")


if __name__ == "__main__":
    main()
