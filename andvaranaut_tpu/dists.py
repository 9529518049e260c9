"""JAX-native univariate distribution library.

Replaces the reference's pervasive scipy.stats usage (lhc.py:46 prior ppf
mapping, gpmcmc.py:632-637 BO bounds, gpmcmc.py:1053-1095 scipy->pymc prior
conversion, core.py:65 prior validation) with pytree-registered distributions
whose ppf/cdf/sf/isf/logpdf/rvs are pure jnp functions, so they can sit inside
jitted log-posteriors (inverse problems, NUTS) and be vmapped on device.

scipy.stats frozen distributions remain accepted everywhere in the public API
(``from_prior`` converts them), so reference user code ports unchanged.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfc, ndtr, ndtri

from ._config import default_dtype

__all__ = [
    "Distribution",
    "Uniform",
    "Normal",
    "TruncNorm",
    "LogNormal",
    "HalfNormal",
    "ScipyDist",
    "from_prior",
    "is_distribution_like",
]

_LOG_2PI = math.log(2.0 * math.pi)


def _distclass(cls):
    """Register a dataclass of array-leaf parameters as a JAX pytree."""
    cls = dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


def _asarr(x):
    return jnp.asarray(x, dtype=default_dtype)


class Distribution:
    """Common functionality; concrete subclasses define the core methods.

    API mirrors scipy.stats frozen distributions (ppf/isf/cdf/sf/logpdf/pdf/
    rvs/mean/std/var/interval/support) so instances are drop-in replacements
    for the priors the reference passes around.
    """

    # -- derived defaults ------------------------------------------------
    def pdf(self, x):
        return jnp.exp(self.logpdf(x))

    def sf(self, x):
        return 1.0 - self.cdf(x)

    def isf(self, q):
        return self.ppf(1.0 - _asarr(q))

    def var(self):
        return self.std() ** 2

    def median(self):
        return self.ppf(0.5)

    def interval(self, alpha=1.0):
        alpha = float(alpha)
        lo = self.ppf((1.0 - alpha) / 2.0)
        hi = self.ppf(1.0 - (1.0 - alpha) / 2.0)
        return lo, hi

    def support(self):
        return self.interval(1.0)

    def rvs(self, size=None, *, key=None, random_state=None):
        """Draw samples.  Accepts either a jax PRNG key or an int seed."""
        if key is None:
            if random_state is None:
                import numpy as _np

                random_state = int(_np.random.randint(0, 2**31 - 1))
            key = jax.random.PRNGKey(random_state)
        shape = () if size is None else (
            (size,) if isinstance(size, int) else tuple(size)
        )
        u = jax.random.uniform(
            key, shape, dtype=default_dtype,
            minval=jnp.finfo(default_dtype).tiny, maxval=1.0,
        )
        out = self.ppf(u)
        return out if shape else out.reshape(())


@_distclass
class Uniform(Distribution):
    """Uniform on [loc, loc + scale] (scipy.stats.uniform convention)."""

    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def ppf(self, q):
        return _asarr(self.loc) + _asarr(self.scale) * _asarr(q)

    def cdf(self, x):
        z = (_asarr(x) - _asarr(self.loc)) / _asarr(self.scale)
        return jnp.clip(z, 0.0, 1.0)

    def logpdf(self, x):
        x = _asarr(x)
        lo = _asarr(self.loc)
        hi = lo + _asarr(self.scale)
        inside = (x >= lo) & (x <= hi)
        return jnp.where(inside, -jnp.log(_asarr(self.scale)), -jnp.inf)

    def mean(self):
        return _asarr(self.loc) + 0.5 * _asarr(self.scale)

    def std(self):
        return _asarr(self.scale) / jnp.sqrt(_asarr(12.0))

    def interval(self, alpha=1.0):
        # Exact endpoints (avoids 0*inf issues for alpha=1).
        alpha = float(alpha)
        lo = _asarr(self.loc)
        sc = _asarr(self.scale)
        return lo + sc * (1.0 - alpha) / 2.0, lo + sc * (1.0 + alpha) / 2.0


@_distclass
class Normal(Distribution):
    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def ppf(self, q):
        return _asarr(self.loc) + _asarr(self.scale) * ndtri(_asarr(q))

    def isf(self, q):
        return _asarr(self.loc) - _asarr(self.scale) * ndtri(_asarr(q))

    def cdf(self, x):
        return ndtr((_asarr(x) - _asarr(self.loc)) / _asarr(self.scale))

    def sf(self, x):
        return ndtr(-(_asarr(x) - _asarr(self.loc)) / _asarr(self.scale))

    def logpdf(self, x):
        z = (_asarr(x) - _asarr(self.loc)) / _asarr(self.scale)
        return -0.5 * (z * z + _LOG_2PI) - jnp.log(_asarr(self.scale))

    def mean(self):
        return _asarr(self.loc)

    def std(self):
        return _asarr(self.scale)

    def interval(self, alpha=1.0):
        if float(alpha) >= 1.0:
            return -jnp.inf, jnp.inf
        return Distribution.interval(self, alpha)


def _ndtr_c(x):
    """Tail-accurate standard-normal sf via erfc."""
    return 0.5 * erfc(x / jnp.sqrt(_asarr(2.0)))


@_distclass
class TruncNorm(Distribution):
    """scipy.stats.truncnorm convention: a, b in standard units of the
    underlying normal; support [loc + a*scale, loc + b*scale]."""

    a: jnp.ndarray = -jnp.inf
    b: jnp.ndarray = jnp.inf
    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def _z(self, x):
        return (_asarr(x) - _asarr(self.loc)) / _asarr(self.scale)

    def _norm_const(self):
        a, b = _asarr(self.a), _asarr(self.b)
        return ndtr(b) - ndtr(a)

    def ppf(self, q):
        q = _asarr(q)
        a, b = _asarr(self.a), _asarr(self.b)
        # Tail-stable: work in whichever tail is better conditioned.
        Fa, Fb = ndtr(a), ndtr(b)
        Sa, Sb = _ndtr_c(a), _ndtr_c(b)
        z_lower = ndtri(Fa + q * (Fb - Fa))
        z_upper = -ndtri(Sa - q * (Sa - Sb))
        z = jnp.where(a >= 0.0, z_upper, z_lower)
        z = jnp.clip(z, a, b)
        return _asarr(self.loc) + _asarr(self.scale) * z

    def isf(self, q):
        return self.ppf(1.0 - _asarr(q))

    def cdf(self, x):
        a, b = _asarr(self.a), _asarr(self.b)
        z = jnp.clip(self._z(x), a, b)
        return (ndtr(z) - ndtr(a)) / self._norm_const()

    def sf(self, x):
        a, b = _asarr(self.a), _asarr(self.b)
        z = jnp.clip(self._z(x), a, b)
        return (_ndtr_c(z) - _ndtr_c(b)) / self._norm_const()

    def logpdf(self, x):
        a, b = _asarr(self.a), _asarr(self.b)
        z = self._z(x)
        lp = (
            -0.5 * (z * z + _LOG_2PI)
            - jnp.log(_asarr(self.scale))
            - jnp.log(self._norm_const())
        )
        return jnp.where((z >= a) & (z <= b), lp, -jnp.inf)

    def mean(self):
        a, b = _asarr(self.a), _asarr(self.b)
        phi = lambda t: jnp.exp(-0.5 * t * t) / jnp.sqrt(_asarr(2 * math.pi))
        phi_a = jnp.where(jnp.isfinite(a), phi(a), 0.0)
        phi_b = jnp.where(jnp.isfinite(b), phi(b), 0.0)
        return _asarr(self.loc) + _asarr(self.scale) * (phi_a - phi_b) / self._norm_const()

    def std(self):
        a, b = _asarr(self.a), _asarr(self.b)
        Z = self._norm_const()
        phi = lambda t: jnp.exp(-0.5 * t * t) / jnp.sqrt(_asarr(2 * math.pi))
        phi_a = jnp.where(jnp.isfinite(a), phi(a), 0.0)
        phi_b = jnp.where(jnp.isfinite(b), phi(b), 0.0)
        a0 = jnp.where(jnp.isfinite(a), a, 0.0)
        b0 = jnp.where(jnp.isfinite(b), b, 0.0)
        num = a0 * phi_a - b0 * phi_b
        var = 1.0 + num / Z - ((phi_a - phi_b) / Z) ** 2
        return _asarr(self.scale) * jnp.sqrt(var)

    def interval(self, alpha=1.0):
        if float(alpha) >= 1.0:
            lo = _asarr(self.loc) + _asarr(self.scale) * _asarr(self.a)
            hi = _asarr(self.loc) + _asarr(self.scale) * _asarr(self.b)
            return lo, hi
        return Distribution.interval(self, alpha)


@_distclass
class LogNormal(Distribution):
    """scipy.stats.lognorm convention: s = sigma of log, scale = exp(mu).

    PyMC's ``LogNormal(mu, sigma)`` (hyperpriors at gpmcmc.py:207-208) maps to
    ``LogNormal(s=sigma, scale=exp(mu))``.
    """

    s: jnp.ndarray = 1.0
    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    @classmethod
    def from_mu_sigma(cls, mu, sigma):
        return cls(s=sigma, loc=0.0, scale=jnp.exp(_asarr(mu)))

    def ppf(self, q):
        return _asarr(self.loc) + _asarr(self.scale) * jnp.exp(
            _asarr(self.s) * ndtri(_asarr(q))
        )

    def cdf(self, x):
        z = (_asarr(x) - _asarr(self.loc)) / _asarr(self.scale)
        safe = jnp.maximum(z, jnp.finfo(default_dtype).tiny)
        return jnp.where(z > 0, ndtr(jnp.log(safe) / _asarr(self.s)), 0.0)

    def logpdf(self, x):
        z = (_asarr(x) - _asarr(self.loc)) / _asarr(self.scale)
        safe = jnp.maximum(z, jnp.finfo(default_dtype).tiny)
        logz = jnp.log(safe)
        s = _asarr(self.s)
        lp = (
            -0.5 * ((logz / s) ** 2 + _LOG_2PI)
            - logz
            - jnp.log(s)
            - jnp.log(_asarr(self.scale))
        )
        return jnp.where(z > 0, lp, -jnp.inf)

    def mean(self):
        s = _asarr(self.s)
        return _asarr(self.loc) + _asarr(self.scale) * jnp.exp(0.5 * s * s)

    def std(self):
        s = _asarr(self.s)
        s2 = s * s
        return _asarr(self.scale) * jnp.sqrt((jnp.exp(s2) - 1.0) * jnp.exp(s2))

    def interval(self, alpha=1.0):
        if float(alpha) >= 1.0:
            return _asarr(self.loc), jnp.inf
        return Distribution.interval(self, alpha)


@_distclass
class HalfNormal(Distribution):
    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def ppf(self, q):
        return _asarr(self.loc) + _asarr(self.scale) * ndtri(
            0.5 * (1.0 + _asarr(q))
        )

    def cdf(self, x):
        z = (_asarr(x) - _asarr(self.loc)) / _asarr(self.scale)
        return jnp.where(z > 0, erf(z / jnp.sqrt(_asarr(2.0))), 0.0)

    def logpdf(self, x):
        z = (_asarr(x) - _asarr(self.loc)) / _asarr(self.scale)
        lp = (
            math.log(2.0)
            - 0.5 * (z * z + _LOG_2PI)
            - jnp.log(_asarr(self.scale))
        )
        return jnp.where(z >= 0, lp, -jnp.inf)

    def mean(self):
        return _asarr(self.loc) + _asarr(self.scale) * jnp.sqrt(
            _asarr(2.0 / math.pi)
        )

    def std(self):
        return _asarr(self.scale) * jnp.sqrt(_asarr(1.0 - 2.0 / math.pi))

    def interval(self, alpha=1.0):
        if float(alpha) >= 1.0:
            return _asarr(self.loc), jnp.inf
        return Distribution.interval(self, alpha)


# ---------------------------------------------------------------------------
# scipy interop
# ---------------------------------------------------------------------------

class ScipyDist(Distribution):
    """Host-side passthrough for an arbitrary frozen distribution.

    The reference accepts ANY ``scipy.stats`` frozen distribution as a prior
    (core.py:65-69) and the host-side paths only ever need
    ppf/isf/cdf/rvs/interval (LHC column mapping lhc.py:46, BO bounds
    gpmcmc.py:635-637, eps-RS rvs gpmcmc.py:697).  Families without a
    JAX-native implementation are wrapped here: every method defers to the
    frozen object on host (numpy in/out, converted to jnp on return), so
    e.g. ``st.beta``/``st.gamma`` priors run the full LHC/GPMCMC/BO
    workflow unchanged.  Not traceable — using one where device-side logpdf
    is required (inverse_opt unknown-x priors) raises at that call site.
    """

    def __init__(self, frozen):
        for m in ("ppf", "cdf", "rvs"):
            if not callable(getattr(frozen, m, None)):
                raise TypeError(
                    f"{frozen!r} lacks .{m}(); not a frozen distribution")
        self.frozen = frozen

    def __repr__(self):
        return f"ScipyDist({self.frozen!r})"

    def _host(self, method, *args, **kw):
        import numpy as _np

        out = getattr(self.frozen, method)(
            *(_np.asarray(a) if hasattr(a, "shape") or isinstance(
                a, (list, tuple)) else a for a in args), **kw)
        return jnp.asarray(out, dtype=default_dtype)

    def ppf(self, q):
        return self._host("ppf", q)

    def isf(self, q):
        return self._host("isf", q)

    def cdf(self, x):
        return self._host("cdf", x)

    def sf(self, x):
        return self._host("sf", x)

    def logpdf(self, x):
        return self._host("logpdf", x)

    def pdf(self, x):
        return self._host("pdf", x)

    def mean(self):
        return self._host("mean")

    def std(self):
        return self._host("std")

    def interval(self, alpha=1.0):
        lo, hi = self.frozen.interval(float(alpha))
        return jnp.asarray(lo, default_dtype), jnp.asarray(hi, default_dtype)

    def rvs(self, size=None, *, key=None, random_state=None):
        if key is not None:
            # derive a scipy-usable seed from the jax key deterministically
            random_state = int(jax.random.randint(
                key, (), 0, 2**31 - 1))
        out = self.frozen.rvs(size=size, random_state=random_state)
        return jnp.asarray(out, dtype=default_dtype)


_SCIPY_MODULE = "scipy.stats._distn_infrastructure"


def _is_scipy_frozen(obj) -> bool:
    return getattr(type(obj), "__module__", "").startswith("scipy.stats")


def is_distribution_like(obj) -> bool:
    """Accepts both our distributions and scipy frozen dists (the reference
    validates priors by module name, core.py:65-69; we duck-type instead)."""
    if isinstance(obj, Distribution):
        return True
    return all(callable(getattr(obj, m, None)) for m in ("ppf", "cdf", "rvs"))


def from_prior(obj) -> Distribution:
    """Convert a prior specification into a Distribution.

    Fast scipy families (uniform/norm/truncnorm/lognorm/halfnorm — the only
    ones the reference tutorial and inverse problems use) become JAX-native
    distributions usable inside jitted code; any OTHER frozen distribution
    (scipy or duck-typed with ppf/cdf/rvs) is wrapped in a host-side
    :class:`ScipyDist` passthrough, matching the reference's acceptance of
    arbitrary scipy.stats priors (core.py:65-69)."""
    if isinstance(obj, Distribution):
        return obj
    if _is_scipy_frozen(obj) and hasattr(obj, "dist"):
        name = obj.dist.name
        shapes, loc, scale = obj.dist._parse_args(*obj.args, **obj.kwds)
        if name == "uniform":
            return Uniform(loc=loc, scale=scale)
        if name == "norm":
            return Normal(loc=loc, scale=scale)
        if name == "truncnorm":
            a, b = shapes
            return TruncNorm(a=a, b=b, loc=loc, scale=scale)
        if name == "lognorm":
            (s,) = shapes
            return LogNormal(s=s, loc=loc, scale=scale)
        if name == "halfnorm":
            return HalfNormal(loc=loc, scale=scale)
        return ScipyDist(obj)
    if all(callable(getattr(obj, m, None)) for m in ("ppf", "cdf", "rvs")):
        return ScipyDist(obj)
    raise TypeError(
        f"Cannot interpret {obj!r} as a prior distribution; pass an "
        "andvaranaut_tpu.dists.Distribution, a scipy.stats frozen "
        "distribution, or any object with ppf/cdf/rvs methods."
    )
