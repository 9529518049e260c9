#!/usr/bin/env python
"""Does CompilerParams(allow_input_fusion=...) fuse an int8
slice-extraction producer INTO a Pallas kernel call, and is it worth
anything?  (Round-4 lead: the slice operands of the factorisation
kernels are materialised int8 planes; fusing their producers would
trade HBM for recompute.)

Measures a 4096x1024 @ 1024x4096 slice product whose int8 operands are
produced by the standard extraction chain, with and without
allow_input_fusion on the operand inputs.  Correctness vs the unfused
call; steady timing in-process (same-program sizes, so the
program-swap overhead cancels in the comparison).

Usage: nohup python benchmarks/input_fusion_probe.py > /tmp/if_probe.log 2>&1 &
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from andvaranaut_tpu.gp import precision
from andvaranaut_tpu.gp.pallas_slicemm import (_TM, _TN, _pair_dot,
                                               _two_sum)

M = N = 4096
K = 1024
NS = 6
TK = 1024


def _kern(nk, *refs):
    a_refs = refs[:NS]
    b_refs = refs[NS : 2 * NS]
    hi_ref, lo_ref = refs[2 * NS], refs[2 * NS + 1]
    accs = [jnp.zeros((_TM, _TN), jnp.int32) for _ in range(NS)]
    for i in range(NS):
        for j in range(NS - i):
            accs[i + j] = accs[i + j] + _pair_dot(a_refs[i][:],
                                                  b_refs[j][:])
    hi = jnp.zeros((_TM, _TN), jnp.float32)
    lo = jnp.zeros((_TM, _TN), jnp.float32)
    for s in range(NS):
        g = accs[s]
        ghi = jax.lax.shift_right_arithmetic(g, jnp.int32(12))
        glo = g - jax.lax.shift_left(ghi, jnp.int32(12))
        w = jnp.float32(2.0 ** (-7.0 * (s + 2)))
        hi, lo = _two_sum(hi, lo, ghi.astype(jnp.float32) * (w * 4096.0))
        hi, lo = _two_sum(hi, lo, glo.astype(jnp.float32) * w)
    hi_ref[:] = hi
    lo_ref[:] = lo


def run(A, B, fuse):
    sA = precision._pow2_row_scales(A, axis=1)
    sB = precision._pow2_row_scales(B, axis=0)
    a_sl = precision._int_slices(A / sA, NS)
    b_sl = precision._int_slices(B / sB, NS)
    a_spec = pl.BlockSpec((_TM, TK), lambda i, j: (i, np.int32(0)),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((TK, _TN), lambda i, j: (np.int32(0), j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((_TM, _TN), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    params = None
    if fuse:
        params = pltpu.CompilerParams(
            allow_input_fusion=[True] * (2 * NS))
    hi, lo = pl.pallas_call(
        partial(_kern, 1),
        grid=(M // _TM, N // _TN),
        in_specs=[a_spec] * NS + [b_spec] * NS,
        out_specs=(o_spec, o_spec),
        out_shape=(jax.ShapeDtypeStruct((M, N), jnp.float32),
                   jax.ShapeDtypeStruct((M, N), jnp.float32)),
        compiler_params=params,
    )(*a_sl, *b_sl)
    C = hi.astype(A.dtype) + lo.astype(A.dtype)
    return C * (sA * sB)


def main():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((M, K)))
    B = jnp.asarray(rng.standard_normal((K, N)))
    f0 = jax.jit(lambda A, B: run(A, B, False))
    f1 = jax.jit(lambda A, B: run(A, B, True))
    out = {}
    for tag, f in (("nofuse", f0), ("fuse", f1)):
        try:
            C = f(A, B)
            float(C[0, 0])
            t0 = time.time()
            for _ in range(5):
                C = f(A, B)
                float(C[0, 0])
            out[tag] = (np.asarray(C), (time.time() - t0) / 5)
            print(f"{tag}: {out[tag][1] * 1e3:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    if len(out) == 2:
        d = np.abs(out["fuse"][0] - out["nofuse"][0]).max()
        print(f"max |fuse - nofuse| = {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
