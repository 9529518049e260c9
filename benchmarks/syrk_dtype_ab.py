#!/usr/bin/env python
"""A/B the production fused syrk kernel's MXU dot dtype at the dominant
factorisation shape: int8->int32 dots vs bf16->f32 dots of the same
7-bit integer slices (bit-identical results — see pallas_slicemm._pair_dot).

Run each mode in a FRESH process (TPU_NOTES "Micro-benchmark trap"):
    ANDVARANAUT_MXU_DOT=int8 python benchmarks/syrk_dtype_ab.py [m k]
    ANDVARANAUT_MXU_DOT=bf16 python benchmarks/syrk_dtype_ab.py [m k]

Context (benchmarks/mxu_rate.py): a synthetic 21-dot chain measured int8
4.3 TOPS vs bf16 82.5 TOPS, but its single-scratch serialisation is not
the production structure; this script measures the real kernel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from andvaranaut_tpu.gp import pallas_slicemm, precision


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    mode = os.environ.get("ANDVARANAUT_MXU_DOT", "int8")
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((m, k)))

    t0 = time.time()
    C = pallas_slicemm.pallas_int_slice_syrk_lower(A, row_start=0)
    v = float(C[m - 1, 0])
    t_compile = time.time() - t0
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        C = pallas_slicemm.pallas_int_slice_syrk_lower(A, row_start=0)
    v = float(C[m - 1, 0])  # host read: block_until_ready lies here
    dt = (time.time() - t0) / reps
    npair = precision.INT_NSLICES * (precision.INT_NSLICES + 1) // 2
    ops = npair * 2.0 * (m * (m + 256) / 2) * k  # lower-triangle tiles
    print(f"syrk_lower[{mode}] m={m} k={k}: {dt * 1e3:.1f} ms "
          f"({ops / dt / 1e12:.1f} TOPS-equiv incl triangular grid; "
          f"compile {t_compile:.0f}s)  C[-1,0]={v:.17g}")


if __name__ == "__main__":
    main()
