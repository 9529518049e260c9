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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._config import interpret_mode

_TILE = 256


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


def _gram_kernel(name, x_ref, y_ref, alpha_ref, o_ref):
    """One (TILE, TILE) output tile: rows from x_ref, cols from y_ref."""
    x = x_ref[:]  # (TILE, d) scaled rows
    y = y_ref[:]  # (TILE, d) scaled cols
    xn = jnp.sum(x * x, axis=1, keepdims=True)        # (TILE, 1)
    yn = jnp.sum(y * y, axis=1, keepdims=True).T      # (1, TILE)
    cross = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    r2 = jnp.maximum(xn + yn - 2.0 * cross, 0.0)
    o_ref[:] = _kernel_eval(name, r2, alpha_ref[0]).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("name", "tile"))
def pallas_gram(name: str, Xs, Ys, alpha=1.0, tile: int = _TILE):
    """Gram matrix of one kernel component over pre-scaled inputs.

    Xs: (n, d) rows / Ys: (m, d) cols, already divided by the ARD
    lengthscales; returns (n, m) in Xs.dtype.
    """
    n, d = Xs.shape
    m = Ys.shape[0]
    np_ = -(-n // tile) * tile
    mp_ = -(-m // tile) * tile
    if np_ != n:
        Xs = jnp.pad(Xs, ((0, np_ - n), (0, 0)))
    if mp_ != m:
        Ys = jnp.pad(Ys, ((0, mp_ - m), (0, 0)))
    alpha_arr = jnp.full((1,), alpha, dtype=Xs.dtype)

    out = pl.pallas_call(
        partial(_gram_kernel, name),
        grid=(np_ // tile, mp_ // tile),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), Xs.dtype),
        interpret=interpret_mode(),
    )(Xs, Ys, alpha_arr)
    return out[:n, :m]


def gram_component(name: str, X, Y, ls, alpha=None, dtype=None):
    """Drop-in single-component Gram via the Pallas kernel (used by the
    performance path; the jnp reference implementation in kernels.py stays
    the parity anchor)."""
    Xs = (X / ls).astype(dtype or X.dtype)
    Ys = (Y / ls).astype(dtype or X.dtype)
    a = 1.0 if alpha is None else alpha
    return pallas_gram(name, Xs, Ys, alpha=a)
