"""Input/output warping library (TPU-native rebuild of reference transform.py).

Design: every transform exposes ``con`` (forward/conversion), ``rev``
(inverse/reversion) and — for the learnable, wgp-eligible subset — ``der``
(d con/dy Jacobian).  All three are written in jax.numpy, so one code path
serves both eager host use (numpy in, array out) and traced use inside jitted
log-posteriors.  This collapses the reference's numpy/pytensor dual
implementations (transform.py:193-417 ``con``/``conmc`` twins) into one;
``conmc``/``revmc``/``dermc`` remain as aliases for API parity.

Parameter conventions, default priors, positivity masks, data-fitted stage
semantics (fitted against the *running warped* data, transform.py:527-533) and
the clamping constants of ``__logit``/``__logistic`` (transform.py:17-22,
79-86) are reproduced exactly for numerical parity.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import dists
from ._config import default_dtype

__all__ = [
    "logit", "logistic", "std_uniform", "uniform_rev", "std_normal",
    "normal_rev", "log1p_con", "log1p_rev", "log10_con", "log10_rev",
    "nonneg_con", "nonneg_rev", "probit_con", "probit_rev", "cdf_con",
    "cdf_rev", "normalise_con", "normalise_rev", "meanstd_con", "meanstd_rev",
    "quantile_con", "quantile_rev", "robust_con", "robust_rev", "powerT_con",
    "powerT_rev",
    "normal", "logit_logistic", "probit", "cdf", "nonneg", "log1p", "log10",
    "normalise", "quantile", "robust", "powerT", "logarithm", "affine",
    "meanstd", "minshift", "stddev", "stdshift", "maxmin", "uniform",
    "arcsinh", "boxcox", "boxcoxf", "sinharcsinh", "sal", "kumaraswamy",
    "preserve_zero", "wgp",
]

# Clamp constants matching reference transform.py:19 and transform.py:81.
_LOGIT_BND = 0.9999999999999999
_LOGISTIC_BND = 36.73680056967710072513000341132283210754394531250


def _arr(x):
    return jnp.asarray(x, dtype=default_dtype)


def _is_concrete(v) -> bool:
    return not isinstance(v, jax.core.Tracer)


def _check_positive(value, name):
    """Reference wraps positivity checks in try/except so symbolic params
    pass through (transform.py:212-216); we skip the check for tracers."""
    if _is_concrete(value):
        try:
            ok = float(value) > 0.0
        except (TypeError, ValueError):
            return
        if not ok:
            raise ValueError(f"Parameter {name} must be positive")


# ---------------------------------------------------------------------------
# Free-function tier (reference transform.py:17-135)
# ---------------------------------------------------------------------------

def _logit_clamped(x):
    x = _arr(x)
    x = jnp.minimum(_LOGIT_BND, x)
    x = jnp.maximum(1.0 - _LOGIT_BND, x)
    return jnp.log(x) - jnp.log1p(-x)


def _logistic_clamped(x):
    x = _arr(x)
    sign = jnp.sign(x)
    xc = jnp.clip(x, -_LOGISTIC_BND, _LOGISTIC_BND)
    ex = jnp.exp(sign * xc)
    return 0.5 - sign * 0.5 + sign * ex / (ex + 1.0)


def cdf_con(x, dist):
    dist = dists.from_prior(dist)
    x = _arr(x)
    return jnp.where(x < dist.mean(), 1.0 - dist.sf(x), dist.cdf(x))


def cdf_rev(x, dist):
    dist = dists.from_prior(dist)
    x = _arr(x)
    return jnp.where(x < 0.5, dist.isf(1.0 - x), dist.ppf(x))


def logit(x, dist):
    return _logit_clamped(cdf_con(x, dist))


def logistic(x, dist):
    return cdf_rev(_logistic_clamped(x), dist)


def std_uniform(x, dist):
    dist = dists.from_prior(dist)
    lo, hi = dist.interval(1.0)
    return (_arr(x) - lo) / (hi - lo)


def uniform_rev(x, dist):
    dist = dists.from_prior(dist)
    lo, hi = dist.interval(1.0)
    return _arr(x) * (hi - lo) + lo


def std_normal(x, dist):
    dist = dists.from_prior(dist)
    return (_arr(x) - dist.mean()) / dist.std()


def normal_rev(x, dist):
    dist = dists.from_prior(dist)
    return _arr(x) * dist.std() + dist.mean()


def log1p_con(y):
    return jnp.log1p(_arr(y))


def log1p_rev(y):
    return jnp.expm1(_arr(y))


def log10_con(y):
    return jnp.log10(_arr(y))


def log10_rev(y):
    return jnp.power(10.0, _arr(y))


def nonneg_con(y):
    y = _arr(y)
    return _logit_clamped(y / (1.0 + y))


def nonneg_rev(y):
    y01 = _logistic_clamped(y)
    return y01 / (1.0 - y01)


def probit_con(x, dist):
    dist = dists.from_prior(dist)
    std_norm = dists.Normal(0.0, 1.0)
    x = _arr(x)
    xcdf = jnp.where(x < 0, 1.0 - dist.sf(x), dist.cdf(x))
    return jnp.where(xcdf < 0.5, std_norm.isf(1.0 - xcdf), std_norm.ppf(xcdf))


def probit_rev(x, dist):
    dist = dists.from_prior(dist)
    std_norm = dists.Normal(0.0, 1.0)
    x = _arr(x)
    xcdf = jnp.where(x < 0, 1.0 - std_norm.sf(x), std_norm.cdf(x))
    return jnp.where(xcdf < 0.5, dist.isf(1.0 - xcdf), dist.ppf(xcdf))


def normalise_con(y, fac):
    return _arr(y) / fac


def normalise_rev(y, fac):
    return _arr(y) * fac


def meanstd_con(y, mean, std):
    return (_arr(y) - mean) / std


def meanstd_rev(y, mean, std):
    return _arr(y) * std + mean


# -- data-fitted preprocessing (native; no sklearn) -------------------------
# Fits run once on host (numpy/scipy 1-D MLE); con/rev are pure jnp so the
# transforms can sit inside jitted graphs.  Semantics match
# sklearn.preprocessing Quantile/Robust/Power transformers (what the
# reference wraps at transform.py:66-73,128-135) to interpolation grade.

_QT_BOUND = 1e-7  # sklearn's BOUNDS_THRESHOLD for the normal output


def _sp_ndtri(q):
    from scipy.special import ndtri as _ndtri

    return _ndtri(q)


def quantile_fit(x, n_quantiles=1000):
    """(quantiles, references) grid of an empirical-CDF map."""
    x = np.asarray(x, dtype=float).reshape(-1)
    nq = max(2, min(int(n_quantiles), len(x)))
    refs = np.linspace(0.0, 1.0, nq)
    quants = np.nanpercentile(x, refs * 100.0)
    return jnp.asarray(quants), jnp.asarray(refs)


def quantile_con(y, quants, refs, mode="normal"):
    y = _arr(y)
    # two-sided interpolation (handles repeated quantile values the same
    # way sklearn does)
    p = 0.5 * (
        jnp.interp(y, quants, refs)
        - jnp.interp(-y, -quants[::-1], -refs[::-1]))
    if mode == "normal":
        from jax.scipy.special import ndtri

        bound = float(_sp_ndtri(_QT_BOUND))  # host constant (traceable con)
        return jnp.clip(
            ndtri(jnp.clip(p, _QT_BOUND, 1.0 - _QT_BOUND)), bound, -bound)
    return p


def quantile_rev(y, quants, refs, mode="normal"):
    y = _arr(y)
    if mode == "normal":
        from jax.scipy.special import ndtr

        y = ndtr(y)
    return jnp.interp(y, refs, quants)


def robust_fit(x):
    """(center, scale) = (median, IQR), zero-IQR guarded like sklearn."""
    x = np.asarray(x, dtype=float).reshape(-1)
    center = float(np.median(x))
    q25, q75 = np.percentile(x, [25.0, 75.0])
    scale = float(q75 - q25)
    if scale == 0.0:
        scale = 1.0
    return center, scale


def robust_con(y, center, scale):
    return (_arr(y) - center) / scale


def robust_rev(y, center, scale):
    return _arr(y) * scale + center


def _yeojohnson_con(y, lam):
    """Yeo-Johnson forward for a concrete lambda; branch-safe under AD
    (no NaN in unselected branches)."""
    y = _arr(y)
    yp = jnp.where(y >= 0, y, 0.0)
    yn = jnp.where(y < 0, y, 0.0)
    if abs(lam) < 1e-12:
        pos = jnp.log1p(yp)
    else:
        pos = ((1.0 + yp) ** lam - 1.0) / lam
    if abs(lam - 2.0) < 1e-12:
        neg = -jnp.log1p(-yn)
    else:
        neg = -((1.0 - yn) ** (2.0 - lam) - 1.0) / (2.0 - lam)
    return jnp.where(y >= 0, pos, neg)


def _yeojohnson_rev(y, lam):
    y = _arr(y)
    yp = jnp.where(y >= 0, y, 0.0)
    yn = jnp.where(y < 0, y, 0.0)
    if abs(lam) < 1e-12:
        pos = jnp.expm1(yp)
    else:
        pos = (yp * lam + 1.0) ** (1.0 / lam) - 1.0
    if abs(lam - 2.0) < 1e-12:
        neg = -jnp.expm1(-yn)
    else:
        neg = 1.0 - (1.0 - (2.0 - lam) * yn) ** (1.0 / (2.0 - lam))
    return jnp.where(y >= 0, pos, neg)


def _boxcox_plain_con(y, lam):
    y = _arr(y)
    if abs(lam) < 1e-12:
        return jnp.log(y)
    return (y ** lam - 1.0) / lam


def _boxcox_plain_rev(y, lam):
    y = _arr(y)
    if abs(lam) < 1e-12:
        return jnp.exp(y)
    return (y * lam + 1.0) ** (1.0 / lam)


def power_fit(x, method="yeo-johnson", standardize=True):
    """(lambda, mean, std) by 1-D profile MLE (scipy.stats normmax — the
    same optimisation sklearn's PowerTransformer runs)."""
    import scipy.stats as st

    x = np.asarray(x, dtype=float).reshape(-1)
    if method == "yeo-johnson":
        lam = float(st.yeojohnson_normmax(x))
        xt = st.yeojohnson(x, lmbda=lam)
    elif method == "box-cox":
        lam = float(st.boxcox_normmax(x, method="mle"))
        xt = st.boxcox(x, lmbda=lam)
    else:
        raise Exception(
            "Error: power transform method must be 'yeo-johnson' or "
            "'box-cox'")
    if standardize:
        return lam, float(np.mean(xt)), float(np.std(xt))
    return lam, 0.0, 1.0


def powerT_con(y, lam, mean, std, method="yeo-johnson"):
    f = _yeojohnson_con if method == "yeo-johnson" else _boxcox_plain_con
    return (f(y, lam) - mean) / std


def powerT_rev(y, lam, mean, std, method="yeo-johnson"):
    f = _yeojohnson_rev if method == "yeo-johnson" else _boxcox_plain_rev
    return f(_arr(y) * std + mean, lam)


# ---------------------------------------------------------------------------
# Class tier
# ---------------------------------------------------------------------------

class _Transform:
    """Base: subclasses implement con/rev (+ der for wgp-eligible ones).
    ``conmc``/``revmc``/``dermc`` alias the jnp implementations, preserving
    the reference API (transform.py:202-207 etc.)."""

    def conmc(self, y):
        return self.con(y)

    def revmc(self, y):
        return self.rev(y)

    def dermc(self, y):
        return self.der(y)


class normal(_Transform):
    def __init__(self, dist):
        self.dist = dists.from_prior(dist)

    def con(self, x):
        return std_normal(x, self.dist)

    def rev(self, x):
        return normal_rev(x, self.dist)


class logit_logistic(_Transform):
    def __init__(self, dist):
        self.dist = dists.from_prior(dist)

    def con(self, x):
        return logit(x, self.dist)

    def rev(self, x):
        return logistic(x, self.dist)


class probit(_Transform):
    def __init__(self, dist):
        self.dist = dists.from_prior(dist)

    def con(self, x):
        return probit_con(x, self.dist)

    def rev(self, x):
        return probit_rev(x, self.dist)


class cdf(_Transform):
    def __init__(self, dist):
        self.dist = dists.from_prior(dist)

    def con(self, x):
        return cdf_con(x, self.dist)

    def rev(self, x):
        return cdf_rev(x, self.dist)


class nonneg(_Transform):
    def con(self, y):
        return nonneg_con(y)

    def rev(self, y):
        return nonneg_rev(y)


class log1p(_Transform):
    def con(self, y):
        return log1p_con(y)

    def rev(self, y):
        return log1p_rev(y)


class log10(_Transform):
    def con(self, y):
        return log10_con(y)

    def rev(self, y):
        return log10_rev(y)


class normalise(_Transform):
    def __init__(self, fac):
        self.fac = fac

    def con(self, y):
        return normalise_con(y, self.fac)

    def rev(self, y):
        return normalise_rev(y, self.fac)


class quantile(_Transform):
    """Empirical-CDF quantile map to a uniform or normal target (native
    rebuild of the sklearn-backed reference transform, transform.py:171-177);
    con/rev are pure jnp interpolations."""

    def __init__(self, x, mode="normal"):
        self.mode = mode
        self.quants, self.refs = quantile_fit(x)

    def con(self, y):
        return quantile_con(y, self.quants, self.refs, self.mode)

    def rev(self, y):
        return quantile_rev(y, self.quants, self.refs, self.mode)


class robust(_Transform):
    """Median/IQR scaling (native rebuild of sklearn RobustScaler;
    reference transform.py:178-183)."""

    def __init__(self, x):
        self.center, self.scale = robust_fit(x)

    def con(self, y):
        return robust_con(y, self.center, self.scale)

    def rev(self, y):
        return robust_rev(y, self.center, self.scale)


class powerT(_Transform):
    """Yeo-Johnson/Box-Cox power transform, lambda by 1-D profile MLE and
    clamped to [-0.01, 1.0] as in the reference (transform.py:190);
    standardised output, pure-jnp con/rev."""

    def __init__(self, x, method="yeo-johnson"):
        self.method = method
        lam, mean, std = power_fit(x, method=method, standardize=True)
        self.lam = float(np.clip(lam, -0.01, 1.0))
        if self.lam != lam:
            # re-standardise against the clamped lambda
            import scipy.stats as st

            xt = (
                st.yeojohnson(np.asarray(x, dtype=float), lmbda=self.lam)
                if method == "yeo-johnson"
                else st.boxcox(np.asarray(x, dtype=float), lmbda=self.lam))
            mean, std = float(np.mean(xt)), float(np.std(xt))
        self.mean = mean
        self.std = std

    def con(self, y):
        return powerT_con(y, self.lam, self.mean, self.std, self.method)

    def rev(self, y):
        return powerT_rev(y, self.lam, self.mean, self.std, self.method)


class logarithm(_Transform):
    def con(self, y):
        return jnp.log(_arr(y))

    def rev(self, y):
        return jnp.exp(_arr(y))

    def der(self, y):
        return 1.0 / _arr(y)


class affine(_Transform):
    def __init__(self, a, b):
        self.a = a
        self.b = b
        _check_positive(b, "b")
        self.default_priors = [dists.Normal(), dists.Normal()]

    def con(self, y):
        return self.a + self.b * _arr(y)

    def rev(self, y):
        return (_arr(y) - self.a) / self.b

    def der(self, y):
        return self.b * jnp.ones_like(_arr(y))


class meanstd(affine):
    def __init__(self, y, mode="numpy"):
        y = _arr(y)
        mean = jnp.mean(y)
        std = jnp.std(y)
        self.a = -mean / std
        self.b = 1.0 / std
        self.default_priors = [dists.Normal(), dists.Normal()]


class minshift(affine):
    def __init__(self, y, mode="numpy", safety=1000):
        mini = jnp.min(_arr(y))
        self.a = -mini * safety
        self.b = 1.0
        self.default_priors = [dists.Normal(), dists.Normal()]


class stddev(affine):
    def __init__(self, y, mode="numpy"):
        std = jnp.std(_arr(y))
        self.a = 0.0
        self.b = 1.0 / std
        self.default_priors = [dists.Normal(), dists.Normal()]


class stdshift(affine):
    def __init__(self, a, y, mode="numpy"):
        std = jnp.std(_arr(y))
        self.a = a
        self.b = 1.0 / std
        self.default_priors = [dists.Normal()]


class maxmin(affine):
    def __init__(self, x, centred=False, safety=0.01, mode="numpy"):
        x = _arr(x)
        xmin = jnp.min(x)
        xmax = jnp.max(x)
        xminus = (xmax - xmin) / (1 - 2 * safety)
        xplus = xmax + xmin
        if centred:
            self.a = -xplus / xminus
            self.b = 2.0 / xminus
        else:
            self.a = -xmin / xminus + safety
            self.b = 1.0 / xminus
        self.default_priors = [dists.Normal(), dists.Normal()]


class uniform(affine):
    def __init__(self, dist, safety=1e-10):
        dist = dists.from_prior(dist)
        lo, hi = dist.interval(1.0)
        xminus = (hi - lo) / (1 - 2 * safety)
        self.a = -lo / xminus + safety
        self.b = 1.0 / xminus
        self.default_priors = [dists.Normal(), dists.Normal()]


class arcsinh(_Transform):
    def __init__(self, a, b, c, d):
        self.a, self.b, self.c, self.d = a, b, c, d
        _check_positive(b, "b")
        _check_positive(d, "d")
        self.default_priors = [dists.Normal() for _ in range(4)]

    def con(self, y):
        return self.a + self.b * jnp.arcsinh((_arr(y) - self.c) / self.d)

    def rev(self, y):
        return self.c + self.d * jnp.sinh((_arr(y) - self.a) / self.b)

    def der(self, y):
        y = _arr(y)
        return self.b / jnp.sqrt(self.d**2 + (y - self.c) ** 2)


class boxcox(_Transform):
    """Signed-power Box-Cox shifted so lamb=0 is (almost) the identity
    (reference transform.py:316-337)."""

    def __init__(self, lamb):
        self.lamb = lamb
        self.default_priors = [dists.Normal(0.0, 1.0)]

    def con(self, y):
        y = _arr(y)
        lambp = self.lamb + 1.0
        return (jnp.sign(y) * jnp.power(jnp.abs(y), lambp) - 1.0) / lambp

    def rev(self, y):
        y = _arr(y)
        lambp = self.lamb + 1.0
        term = y * lambp + 1.0
        return jnp.sign(term) * jnp.power(jnp.abs(term), 1.0 / lambp)

    def der(self, y):
        return jnp.power(jnp.abs(_arr(y)), self.lamb)


class boxcoxf(boxcox):
    """Box-Cox with lambda auto-fitted by 1-D profile MLE (native rebuild
    of the sklearn-backed reference transform, transform.py:339-343)."""

    def __init__(self, y):
        if not _is_concrete(y):
            raise ValueError(
                "boxcoxf requires concrete data to fit lambda; it cannot be "
                "fitted inside a traced (learnable-warping) computation."
            )
        import scipy.stats as st

        self.lamb = float(
            st.boxcox_normmax(np.asarray(y, dtype=float).reshape(-1),
                              method="mle"))
        self.default_priors = [dists.Normal(0.0, 1.0)]


class sinharcsinh(_Transform):
    def __init__(self, a, b):
        self.a, self.b = a, b
        _check_positive(b, "b")
        self.default_priors = [dists.Normal(), dists.Normal()]

    def con(self, y):
        return jnp.sinh(self.b * jnp.arcsinh(_arr(y)) - self.a)

    def rev(self, y):
        return jnp.sinh((jnp.arcsinh(_arr(y)) + self.a) / self.b)

    def der(self, y):
        y = _arr(y)
        return (
            self.b
            * jnp.cosh(self.b * jnp.arcsinh(y) - self.a)
            / jnp.sqrt(1.0 + y**2)
        )


class sal(_Transform):
    """sinh-arcsinh + affine location/scale (reference transform.py:366-391)."""

    def __init__(self, a, b, c, d):
        self.a, self.b, self.c, self.d = a, b, c, d
        _check_positive(b, "b")
        _check_positive(d, "d")
        self.default_priors = [dists.Normal() for _ in range(4)]

    def con(self, y):
        return self.c + self.d * jnp.sinh(self.b * jnp.arcsinh(_arr(y)) - self.a)

    def rev(self, y):
        return jnp.sinh(
            (jnp.arcsinh((_arr(y) - self.c) / self.d) + self.a) / self.b
        )

    def der(self, y):
        y = _arr(y)
        return (
            self.b
            * self.d
            * jnp.cosh(self.b * jnp.arcsinh(y) - self.a)
            / jnp.sqrt(1.0 + y**2)
        )


class kumaraswamy(_Transform):
    """Input warping on [0,1] (reference transform.py:394-417)."""

    def __init__(self, a, b):
        self.a, self.b = a, b
        _check_positive(a, "a")
        _check_positive(b, "b")
        self.default_priors = [dists.Normal(), dists.Normal()]

    def con(self, x):
        x = _arr(x)
        return 1.0 - jnp.power(1.0 - jnp.power(x, self.a), self.b)

    def rev(self, x):
        x = _arr(x)
        return jnp.power(1.0 - jnp.power(1.0 - x, 1.0 / self.b), 1.0 / self.a)

    def der(self, x):
        x = _arr(x)
        return (
            self.a
            * self.b
            * jnp.power(x, self.a - 1.0)
            * jnp.power(1.0 - jnp.power(x, self.a), self.b - 1.0)
        )


class preserve_zero(affine):
    """Maps a reference yzero to 0 — delta learning (transform.py:421-428)."""

    def __init__(self, y, yzero, mode="numpy"):
        ystd = jnp.std(_arr(y))
        self.a = -yzero / ystd
        self.b = 1.0 / ystd
        self.default_priors = [dists.Normal(), dists.Normal()]


# ---------------------------------------------------------------------------
# Composite warping
# ---------------------------------------------------------------------------

#: stage name -> (constructor arity in params, positivity mask)
_WGP_PARAMS = {
    "affine": (2, [False, True]),
    "logarithm": (0, []),
    "arcsinh": (4, [False, True, False, True]),
    "boxcox": (1, [False]),
    "sinharcsinh": (2, [False, True]),
    "sal": (4, [False, True, False, True]),
    "kumaraswamy": (2, [True, True]),
    "stdshift": (1, [False]),
    "meanstd": (0, []),
    "minshift": (0, []),
    "stddev": (0, []),
    "boxcoxf": (0, []),
    "uniform": (0, []),
    "maxmin": (0, []),
    "pzero": (0, []),
}

_WGP_ALLOWED = list(_WGP_PARAMS)


class wgp(_Transform):
    """Composite warping sharing a flat parameter vector (reference
    transform.py:431-574).

    ``params`` may be a concrete array or a traced jnp vector (the learnable
    iwgp/cwgp path, gpmcmc.py:211-277); data-fitted stages are fitted against
    the running warped data ``yc`` exactly as in the reference
    (transform.py:527-533), and ``pzero`` tracks the warped image of zero.
    """

    def __init__(self, warpings, params, y=None, xdist=None, mode="numpy"):
        for name in warpings:
            if name not in _WGP_ALLOWED:
                raise ValueError(f"Only {_WGP_ALLOWED} classes allowed")
        self.warping_names = list(warpings)
        self.params = params
        self.warpings = []
        self.pid = np.zeros(len(warpings), dtype=np.int32)
        nparams = (
            len(params) if hasattr(params, "__len__") else int(params.shape[0])
        )
        self.pos = np.zeros(nparams, dtype=np.bool_)
        self.default_priors = []
        pc = 0
        yzero = 0.0
        yc = _arr(y) if y is not None else None

        def need_y(name):
            if yc is None:
                raise ValueError(f"Must supply y array to use {name}")

        for pidc, name in enumerate(warpings):
            arity, posmask = _WGP_PARAMS[name]
            stage_params = [params[pc + k] for k in range(arity)]
            if name == "affine":
                stage = affine(*stage_params)
            elif name == "logarithm":
                stage = logarithm()
            elif name == "arcsinh":
                stage = arcsinh(*stage_params)
            elif name == "boxcox":
                stage = boxcox(lamb=stage_params[0])
            elif name == "sinharcsinh":
                stage = sinharcsinh(*stage_params)
            elif name == "sal":
                stage = sal(*stage_params)
            elif name == "kumaraswamy":
                stage = kumaraswamy(*stage_params)
            elif name == "stdshift":
                need_y(name)
                stage = stdshift(stage_params[0], yc)
            elif name == "meanstd":
                need_y(name)
                stage = meanstd(yc)
            elif name == "minshift":
                need_y(name)
                stage = minshift(yc)
            elif name == "stddev":
                need_y(name)
                stage = stddev(yc)
            elif name == "boxcoxf":
                need_y(name)
                stage = boxcoxf(y=yc)
            elif name == "uniform":
                if xdist is None:
                    raise ValueError("Must supply x distribution to use uniform")
                stage = uniform(xdist)
            elif name == "maxmin":
                need_y(name)
                stage = maxmin(yc)
            elif name == "pzero":
                need_y(name)
                stage = preserve_zero(yc, yzero)
            self.warpings.append(stage)
            if arity:
                self.pos[pc : pc + arity] = np.array(posmask, dtype=np.bool_)
                self.default_priors.extend(stage.default_priors)
                pc += arity
            self.pid[pidc] = pc
            if yc is not None:
                yc = stage.con(yc)
                yzero = stage.con(yzero)
        self.np = pc

    def con(self, y):
        res = _arr(y)
        for stage in self.warpings:
            res = stage.con(res)
        return res

    def rev(self, y):
        res = _arr(y)
        for stage in reversed(self.warpings):
            res = stage.rev(res)
        return res

    def der(self, y):
        x = _arr(y)
        res = jnp.ones_like(x)
        for stage in self.warpings:
            res = res * stage.der(x)
            x = stage.con(x)
        return res

    def log_det_jac(self, y):
        """Sum of log |d con/dy| — the warping-Jacobian NLML term
        (gpmcmc.py:319's ``pt.sum(pt.log(yder))``)."""
        return jnp.sum(jnp.log(self.der(y)))
