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


def interpret_mode() -> bool:
    """Whether Pallas kernels should run in interpreter mode.

    Pallas TPU kernels cannot execute on the CPU backend used by the test
    suite; interpret mode makes them runnable (slowly) anywhere.
    """
    if os.environ.get("ANDVARANAUT_PALLAS_INTERPRET"):
        return True
    return not is_tpu()
