"""Covariance kernels with PyMC semantics (reference gpmcmc.py:282-307).

Definitions match pm.gp.cov exactly for parity:
  RBF (ExpQuad):    exp(-0.5 * r2)
  Matern52:         (1 + sqrt(5) r + 5/3 r2) exp(-sqrt(5) r)
  Matern32:         (1 + sqrt(3) r) exp(-sqrt(3) r)
  Exponential:      exp(-0.5 * r)        [PyMC's convention]
  RatQuad:          (1 + r2 / (2 alpha)) ** (-alpha)
with r2 the ARD-scaled squared distance sum_k ((x_k - x'_k)/ls_k)^2.

Kernel algebra: a '+'/'*' composition string like 'RBF*Matern52+RatQuad',
each component scaled by its own variance kv[i] with its own lengthscale
block l[i*nx:(i+1)*nx].  The reference's ops parser (gpmcmc.py:498, a
char-class regex that mangles 'RatQuad') is replaced by a correct one.
"""

from __future__ import annotations

import math
import re
from functools import partial

import jax
import jax.numpy as jnp

KERNEL_NAMES = ("RBF", "Matern52", "Matern32", "Exponential", "RatQuad")


def parse_kernel(kernel: str):
    """Split a kernel composition string into component names and operators.

    Returns (kerns, ops): len(ops) == len(kerns) - 1, ops[i] applied between
    component i and i+1 left-to-right (reference gpmcmc.py:301-307).
    """
    kerns = tuple(re.split(r"[+*]", kernel))
    ops = tuple(re.findall(r"[+*]", kernel))
    for k in kerns:
        if k not in KERNEL_NAMES:
            raise Exception(
                f"Error: kernel string must contain only {list(KERNEL_NAMES)}")
    if len(ops) != len(kerns) - 1:
        raise Exception(f"Error: malformed kernel string '{kernel}'")
    return kerns, ops


def _scaled_sqdist(X, X2, ls):
    """ARD-scaled squared distance.

    Difference form with a static loop over the (small) input dimension:
    exact (no a^2+b^2-2ab cancellation) and free of f64 matmuls, whose XLA
    emulation on TPU materialises O(nx * n * m) f32 component tensors.
    The MXU matmul form lives in the f32/bf16 Pallas Gram kernel
    (pallas_ops.py) where it belongs.
    """
    Xs = X / ls
    X2s = X2 / ls
    d = X.shape[1]
    r2 = None
    for k in range(d):
        diff = Xs[:, k, None] - X2s[None, :, k]
        term = diff * diff
        r2 = term if r2 is None else r2 + term
    return r2


def base_kernel(name: str, X, X2, ls, alpha=None, diag: bool = False):
    """One unscaled component k(X, X2) (variance applied by caller)."""
    if diag:
        n = X.shape[0]
        return jnp.ones(n, dtype=X.dtype)  # all five have k(x,x) = 1
    r2 = _scaled_sqdist(X, X2, ls)
    if name == "RBF":
        return jnp.exp(-0.5 * r2)
    if name == "RatQuad":
        return jnp.power(1.0 + r2 / (2.0 * alpha), -alpha)
    r = jnp.sqrt(r2 + 1e-36)  # guard d/dr at r=0; exact value unaffected
    if name == "Matern52":
        s5 = math.sqrt(5.0)
        return (1.0 + s5 * r + (5.0 / 3.0) * r2) * jnp.exp(-s5 * r)
    if name == "Matern32":
        s3 = math.sqrt(3.0)
        return (1.0 + s3 * r) * jnp.exp(-s3 * r)
    if name == "Exponential":
        return jnp.exp(-0.5 * r)
    raise ValueError(f"Unknown kernel {name}")


def gram(kerns, ops, X, X2, l_flat, kv, alpha=None, diag: bool = False,
         component=None):
    """Composite Gram matrix (or its diagonal) over converted inputs.

    l_flat: (nkern*nx,) ARD lengthscales, block per component.
    kv:     (nkern,) per-component variances.
    alpha:  RatQuad shape (scalar; at most one RatQuad, as in the reference).
    component: per-component evaluator override (defaults to base_kernel).
    """
    nx = X.shape[1]
    if X2 is None:
        X2 = X
    if component is None:
        component = base_kernel
    out = None
    for i, name in enumerate(kerns):
        ls = l_flat[i * nx : (i + 1) * nx]
        ki = kv[i] * component(name, X, X2, ls, alpha=alpha, diag=diag)
        if out is None:
            out = ki
        elif ops[i - 1] == "+":
            out = out + ki
        else:
            out = out * ki
    return out


# ---------------------------------------------------------------------------
# TPU fast cross-Gram (fused Pallas tiles, f32 grade)
# ---------------------------------------------------------------------------

@partial(jax.custom_jvp, nondiff_argnums=(0,))
def _component_fast(name, X, X2, ls, alpha):
    """One component via the fused Pallas distance+kernel tile kernel
    (pallas_ops.pallas_gram): f32 MXU cross term + VPU transcendental,
    one HBM pass per output tile.  Tangents fall back to the exact jnp
    form (Pallas kernels carry no AD rules), so acquisition-refinement
    gradients through predictions keep working."""
    from . import pallas_ops

    out = pallas_ops.gram_component(
        name, X.astype(jnp.float32), X2.astype(jnp.float32),
        ls.astype(jnp.float32), alpha=alpha.astype(jnp.float32))
    return out.astype(X.dtype)


@_component_fast.defjvp
def _component_fast_jvp(name, primals, tangents):
    X, X2, ls, alpha = primals

    def ref(X, X2, ls, alpha):
        return base_kernel(
            name, X, X2, ls, alpha=(alpha if name == "RatQuad" else None))

    primal_out = _component_fast(name, X, X2, ls, alpha)
    _, tangent_out = jax.jvp(ref, primals, tangents)
    return primal_out, tangent_out


def gram_fast(kerns, ops, X, X2, l_flat, kv, alpha=None):
    """Composite cross-Gram through the fused Pallas tile kernel (f32
    grade).  Callers own the accuracy trade — see _config.fast_gram."""
    a = jnp.asarray(1.0 if alpha is None else alpha, X.dtype)

    def component(name, X, X2, ls, alpha=None, diag=False):
        return _component_fast(name, X, X2 if X2 is not None else X, ls, a)

    return gram(kerns, ops, X, X2, l_flat, kv, alpha=alpha,
                component=component)


def gram_cross(kerns, ops, X, X2, l_flat, kv, alpha=None,
               diag: bool = False):
    """Cross-covariance Gram for user-facing prediction paths: the fused
    Pallas kernel when opted in (_config.fast_gram()), the exact jnp
    difference form otherwise.  NLML/fit paths must call gram() directly
    — their accuracy budget needs the exact form."""
    from .._config import fast_gram

    if diag or not fast_gram():
        return gram(kerns, ops, X, X2, l_flat, kv, alpha=alpha, diag=diag)
    return gram_fast(kerns, ops, X, X2, l_flat, kv, alpha=alpha)
