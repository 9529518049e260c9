"""Test configuration.

Runs the whole suite on a virtual 8-device CPU mesh so every sharded code
path (mesh-sharded Gram/NLML, device-sharded NUTS chains) is exercised
without TPU pod hardware, per SURVEY.md §4's multi-device test strategy.

Must set env vars before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# The env var alone is not enough on machines where a TPU platform plugin
# registers itself with higher priority; force the CPU backend explicitly
# (tests rely on CPU f64 for exact parity and on the 8-device virtual mesh).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules: by late in the
    suite the process holds hundreds of jitted programs (~7 GB RSS) and
    XLA:CPU compiles measurably degrade — the 32-step cyclic SPMD test
    compiled in ~10 min solo but 45+ min at suite position ~206 on this
    1-core host.  Per-module clearing bounds that state; programs
    shared WITHIN a module still reuse their cache."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def toy_problem():
    """The tutorial's 2-D analytic target (tutorial.ipynb cell 5):
    f(x1,x2) = x1^2 - x1 - x2^2*x1 + x2 with priors U(0,2) x U(1,1.5)."""
    from andvaranaut_tpu import dists

    def fun(x):
        return np.array([x[0] ** 2 - x[0] - x[1] ** 2 * x[0] + x[1]])

    priors = [dists.Uniform(0.0, 2.0), dists.Uniform(1.0, 0.5)]
    return fun, priors
