"""andvaranaut_tpu — TPU-native predictive modelling & UQ suite.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
andrew-angus/andvaranaut (see SURVEY.md): Latin-hypercube sampling with
parallel target evaluation, composable learnable warping stacks, GP
surrogates with MAP/NUTS hyperparameter fitting, forward UQ, Bayesian
optimisation, and inverse Bayesian problems.

The public namespace is flat, mirroring the reference's star-exporting
__init__ (reference __init__.py:1-4).
"""

from . import _config  # noqa: F401  (enables x64 before anything else)
from . import dists  # noqa: F401
from . import sampling  # noqa: F401
from . import timing  # noqa: F401
from .core import load_object, load_xy, save_object, save_xy  # noqa: F401
from .lhc import LHC  # noqa: F401
from .transform import *  # noqa: F401,F403

try:  # GP layer (available once the engine is importable)
    from .gpmcmc import GPMCMC  # noqa: F401
except ImportError:  # pragma: no cover
    pass

__version__ = "0.1.0"
