"""On-device inference machinery: unconstrained-space reparameterisation,
jitted L-BFGS MAP optimisation, multi-chain NUTS, differential evolution."""

from . import lbfgs, unconstrained  # noqa: F401
