"""GP engine: kernels, Gram construction, Cholesky/NLML, prediction,
Gauss-Hermite reversion, MAP/NUTS fitting — all jit/vmap-compatible."""

from . import engine, kernels, quad  # noqa: F401
