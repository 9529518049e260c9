"""Global configuration for the TPU-native andvaranaut rebuild.

The reference stack (PyMC/PyTensor/scipy, see /root/reference) is float64
end-to-end; NLML parity to 1e-6 (BASELINE.md) requires f64 accumulation, so we
enable JAX x64 at package import.  On TPU, f64 is emulated by XLA — the
performance-critical kernels (Gram matrix, blocked Cholesky) provide f32 /
compensated-f32 Pallas paths selectable via ``precision``.
"""

from __future__ import annotations

import os

import jax

# Must happen before any jax array is created by this package.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA compile times for emulated-f64 and large
# blocked programs on TPU run into minutes; caching amortises them across
# processes/sessions.
_cache_dir = os.environ.get(
    "ANDVARANAUT_JAX_CACHE", os.path.expanduser("~/.cache/andvaranaut_jax"))
try:  # pragma: no cover
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402

#: dtype used for all probabilistic host/device math unless overridden.
default_dtype = jnp.float64


def platform() -> str:
    """Best-effort backend platform string ('tpu', 'cpu', ...)."""
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover
        return "cpu"


def is_tpu() -> bool:
    return platform() not in ("cpu", "gpu")


def fast_gram() -> bool:
    """Whether USER-FACING prediction cross-Gram matrices use the fused
    Pallas f32 tile kernel (pallas_ops.pallas_gram) instead of the exact
    f64 difference form.

    Default OFF: near interpolation (tiny gv) the ill-conditioned solve
    amplifies the f32 cross-covariance error to ~1e-4 relative on
    predictive means — too coarse to impose silently.  Opt in with
    ANDVARANAUT_FAST_GRAM=1 when prediction throughput matters more
    (the engine clamps the latent variance at 0, its exact-arithmetic
    bound, so the fast path never NaNs the GH reversion).  BO
    acquisition programs use the fast kernel on TPU unconditionally —
    acquisition values tolerate f32 noise and run thousands of times
    per iteration.  Read at trace time: set before first predict.
    """
    env = os.environ.get("ANDVARANAUT_FAST_GRAM")
    if env is not None:
        return env not in ("0", "false", "False", "")
    return False


def interpret_mode() -> bool:
    """Whether Pallas kernels should run in interpreter mode.

    Pallas TPU kernels cannot execute on the CPU backend used by the test
    suite; interpret mode makes them runnable (slowly) anywhere.
    """
    if os.environ.get("ANDVARANAUT_PALLAS_INTERPRET"):
        return True
    return not is_tpu()
