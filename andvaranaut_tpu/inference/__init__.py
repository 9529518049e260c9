"""On-device inference machinery: unconstrained-space reparameterisation,
jitted L-BFGS MAP optimisation, multi-chain NUTS, differential evolution,
and the host-driven HMC used for MCMC beyond the platform's
compiled-transition scale cap (host_hmc)."""

from . import host_hmc, lbfgs, unconstrained  # noqa: F401
