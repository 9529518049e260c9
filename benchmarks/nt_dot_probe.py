#!/usr/bin/env python
"""Does Mosaic accept the "nt" dot form (contract dim 1 of BOTH
operands, a @ b^T) for int8 and bf16 on this part?

The syrk kernels currently materialise transposed int8 slice copies
(`b_sl = [a.T for a in a_sl]` — ~6 full int8 planes written+read per
factorisation step).  If dot_general dimension_numbers ((1,), (1,))
lowers on hardware (the ((0,), (0,)) "tn" form already does —
pallas_slicemm._pair_dot_tn), the b operand can read (TN, tk) windows
of the SAME native-layout slice arrays and the copies vanish.

Usage: nohup python benchmarks/nt_dot_probe.py > /tmp/nt_probe.log 2>&1 &
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(dt, a_ref, b_ref, o_ref):
    p = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=(
            jnp.int32 if dt == jnp.int8 else jnp.float32),
    )
    o_ref[:] = p if p.dtype == jnp.int32 else p.astype(jnp.int32)


def probe(dt, m=256, n=256, k=256):
    rng = np.random.default_rng(0)
    a = rng.integers(-64, 65, size=(m, k)).astype(np.int8)
    b = rng.integers(-64, 65, size=(n, k)).astype(np.int8)
    av = jnp.asarray(a, dtype=dt)
    bv = jnp.asarray(b, dtype=dt)
    out = pl.pallas_call(
        partial(_kernel, dt),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(av, bv)
    ref = a.astype(np.int32) @ b.astype(np.int32).T
    ok = np.array_equal(np.asarray(out), ref)
    print(f"nt dot {dt.__name__}: exact={ok}", flush=True)
    return ok


def _convert_kernel(x_ref, i8_ref, f_ref, bc_ref):
    t = x_ref[:]
    c = t.astype(jnp.int32)          # f32 -> i32 (trunc toward zero?)
    i8_ref[:] = c.astype(jnp.int8)   # i32 -> i8
    f_ref[:] = c.astype(jnp.float32)
    u = jax.lax.bitcast_convert_type(t, jnp.uint32)
    bc_ref[:] = jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32)


def probe_converts():
    """In-kernel converts the panel-emit extraction needs: f32->i32
    (must truncate toward zero), i32->i8, and f32<->u32 bitcast."""
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((256, 256)) * 50).astype(np.float32)
    i8, f, bc = pl.pallas_call(
        _convert_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((256, 256), jnp.int8),
            jax.ShapeDtypeStruct((256, 256), jnp.float32),
            jax.ShapeDtypeStruct((256, 256), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
    )(jnp.asarray(x))
    want = np.trunc(x).astype(np.int32)
    ok_i8 = np.array_equal(np.asarray(i8), want.astype(np.int8))
    ok_f = np.array_equal(np.asarray(f), want.astype(np.float32))
    wbc = (x.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)
    ok_bc = np.array_equal(np.asarray(bc), wbc)
    print(f"convert f32->i32->i8 exact={ok_i8} i32->f32 exact={ok_f} "
          f"bitcast-mask exact={ok_bc}", flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    for dt in (jnp.int8, jnp.bfloat16):
        try:
            probe(dt)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"nt dot {dt.__name__}: REJECTED ({type(e).__name__}: "
                  f"{str(e)[:300]})", flush=True)
    try:
        probe_converts()
    except Exception as e:  # noqa: BLE001 - report and continue
        print(f"converts: REJECTED ({type(e).__name__}: {str(e)[:300]})",
              flush=True)


if __name__ == "__main__":
    main()
