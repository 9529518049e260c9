"""Pallas TPU kernels for the GP hot path.

`pallas_gram` computes the kernel (Gram) matrix tile-by-tile in VMEM,
fusing the ARD-scaled pairwise distance (MXU dot for the cross term) with
the kernel transcendental (VPU) so each output tile is produced in a
single pass — no materialised n^2 distance intermediate in HBM.

Kernels run compiled on TPU and in interpreter mode elsewhere (tests), per
_config.interpret_mode().
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._config import interpret_mode

_TILE = 256

# Index-map constants must be strongly-typed int32: with jax_enable_x64 a
# bare Python `0` literal becomes an i64 constant next to the i32 program
# ids, and Mosaic rejects the mixed (i32, i64) index tuple ("failed to
# legalize operation 'func.return'", observed on v5e).
_I0 = np.int32(0)


def _kernel_eval(name: str, r2, alpha):
    if name == "RBF":
        return jnp.exp(-0.5 * r2)
    if name == "RatQuad":
        return jnp.power(1.0 + r2 / (2.0 * alpha), -alpha)
    r = jnp.sqrt(r2 + 1e-36)
    if name == "Matern52":
        s5 = math.sqrt(5.0)
        return (1.0 + s5 * r + (5.0 / 3.0) * r2) * jnp.exp(-s5 * r)
    if name == "Matern32":
        s3 = math.sqrt(3.0)
        return (1.0 + s3 * r) * jnp.exp(-s3 * r)
    if name == "Exponential":
        return jnp.exp(-0.5 * r)
    raise ValueError(name)


def _gram_kernel(name, d, x_ref, y_ref, alpha_ref, o_ref):
    """One (TILE_M, TILE_N) output tile via the per-dimension difference
    form: rows from x_ref (TILE_M, d), cols from y_ref (d, TILE_N).

    The difference form avoids both the |x|^2+|y|^2-2xy cancellation (its
    absolute error floor scales with coordinate magnitude, not r2) and a
    degenerate k=d MXU dot whose d=2 contraction is lane-hostile.  d is
    tiny, so the loop is d broadcast-subtract-square-accumulate VPU passes
    over the tile.
    """
    r2 = None
    for k in range(d):
        xk = x_ref[:, k:k + 1]          # (TILE_M, 1)
        yk = y_ref[k:k + 1, :]          # (1, TILE_N)
        diff = xk - yk
        t = diff * diff
        r2 = t if r2 is None else r2 + t
    o_ref[:] = _kernel_eval(name, r2, alpha_ref[0]).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("name", "tile_m", "tile_n"))
def pallas_gram(name: str, Xs, Ys, alpha=1.0, tile_m: int = 512,
                tile_n: int = 1024):
    """Gram matrix of one kernel component over pre-scaled inputs.

    Xs: (n, d) rows / Ys: (m, d) cols, already divided by the ARD
    lengthscales; returns (n, m) in Xs.dtype.  Large tiles amortise the
    per-grid-step overhead (the kernel is a handful of VPU passes per
    tile); the column input rides transposed (d, m) so its per-tile block
    is lane-major.
    """
    n, d = Xs.shape
    m = Ys.shape[0]
    np_ = -(-n // tile_m) * tile_m
    mp_ = -(-m // tile_n) * tile_n
    if np_ != n:
        Xs = jnp.pad(Xs, ((0, np_ - n), (0, 0)))
    YsT = Ys.T
    if mp_ != m:
        YsT = jnp.pad(YsT, ((0, 0), (0, mp_ - m)))
    alpha_arr = jnp.full((1,), alpha, dtype=Xs.dtype)

    out = pl.pallas_call(
        partial(_gram_kernel, name, d),
        grid=(np_ // tile_m, mp_ // tile_n),
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda i, j: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_n), lambda i, j: (_I0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i, j: (_I0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), Xs.dtype),
        interpret=interpret_mode(),
    )(Xs, YsT, alpha_arr)
    return out[:n, :m]


def gram_component(name: str, X, Y, ls, alpha=None, dtype=None):
    """Drop-in single-component Gram via the Pallas kernel (used by the
    performance path; the jnp reference implementation in kernels.py stays
    the parity anchor)."""
    Xs = (X / ls).astype(dtype or X.dtype)
    Ys = (Y / ls).astype(dtype or X.dtype)
    a = 1.0 if alpha is None else alpha
    return pallas_gram(name, Xs, Ys, alpha=a)
