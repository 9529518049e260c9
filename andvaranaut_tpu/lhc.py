"""Latin-hypercube sampling/dataset layer (rebuild of reference lhc.py).

``LHC`` keeps the reference's stateful notebook API (sample/del_samples/
y_dist/set_data/save_netcdf) while delegating point generation to the
on-device sampler in sampling.py.  ``_surrogate`` is the generic surrogate
base maintaining converted copies xc/yc (reference lhc.py:163-273) — kept, as
in the reference, for non-GP surrogates.
"""

from __future__ import annotations

import copy
from functools import partial

import numpy as np

from . import sampling
from .core import _core

__all__ = ["LHC", "_none_conrev"]


class LHC(_core):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.x = np.empty((0, self.nx))
        self.y = np.empty((0, self.ny))

    # -- sampling --------------------------------------------------------
    def sample(self, nsamps, seed=None):
        """LHC-sample nsamps points, constraint-filter, evaluate the target,
        append (reference lhc.py:24-37).  ``seed`` is honoured here."""
        if not isinstance(nsamps, int) or nsamps < 1:
            raise Exception("Error: nsamps argument must be an integer > 0")
        if self.verbose:
            print(f"Evaluating {nsamps} latin hypercube samples...")
        xsamps = self.__latin_sample(nsamps, seed)
        if self.constraints is not None:
            xsamps = self._core__check_constraints(xsamps)
        xsamps, ysamps = self._core__vector_solver(xsamps)
        self.x = np.r_[self.x, xsamps]
        self.y = np.r_[self.y, ysamps]
        self.nsamp = len(self.x)

    def __latin_sample(self, nsamps, seed=None):
        return sampling.lhc_sample(self.priors, nsamps, seed=seed)

    # -- deletion --------------------------------------------------------
    def del_samples(self, ndels=None, method="coarse_lhc", idx=None):
        self.__del_samples(ndels, method, idx, returns=False)
        self.nsamp = len(self.x)

    def __del_samples(self, ndels, method, idx, returns):
        """Three deletion modes (reference lhc.py:55-93)."""
        if method == "coarse_lhc":
            if not isinstance(ndels, int) or ndels < 1:
                raise Exception("Error: must specify positive int for ndels")
            xsamps = self.__latin_sample(ndels)
            dmins = np.zeros(ndels, dtype=np.intc)
            for i in range(ndels):
                dis = np.linalg.norm(self.x - xsamps[i], axis=1)
                dmins[i] = np.argmin(dis)
                self.x = np.delete(self.x, dmins[i], axis=0)
                self.y = np.delete(self.y, dmins[i], axis=0)
            if returns:
                return dmins
        elif method == "random":
            if not isinstance(ndels, int) or ndels < 1:
                raise Exception("Error: must specify positive int for ndels")
            left = self.nsamp - ndels
            inds = np.random.choice(
                np.arange(self.nsamp), size=left, replace=False)
            self.x = self.x[inds, :]
            self.y = self.y[inds, :]
            if returns:
                return inds
        elif method == "specific":
            if not isinstance(idx, (int, list)):
                raise Exception(
                    "Error: must specify int or list of ints for idx")
            mask = np.ones(self.nsamp, dtype=bool)
            mask[idx] = False
            self.x = self.x[mask]
            self.y = self.y[mask]
            if returns:
                return mask
        else:
            raise Exception(
                "Error: method must be one of 'coarse_lhc','random',"
                "'specific'")

    # -- plotting --------------------------------------------------------
    def y_dist(self, mode="hist_kde"):
        self.__y_dist(self.y, mode)

    def __y_dist(self, y, mode):
        import matplotlib.pyplot as plt
        import seaborn as sns

        modes = ["hist", "kde", "ecdf", "hist_kde"]
        if mode not in modes:
            raise Exception(f"Error: selected mode must be one of {modes}")
        funs = [
            partial(sns.displot, kind="hist"),
            partial(sns.displot, kind="kde"),
            partial(sns.displot, kind="ecdf"),
            partial(sns.displot, kind="hist", kde=True),
        ]
        for i in range(self.ny):
            funs[modes.index(mode)](y[:, i])
            plt.xlabel(f"y[{i}]")
            plt.ylabel("Density")
            plt.show()

    # -- data injection / persistence -----------------------------------
    def set_data(self, x, y):
        """Inject existing datasets with validation (reference lhc.py:113-131)."""
        if (
            not isinstance(x, np.ndarray)
            or x.ndim != 2
            or x.dtype != "float64"
            or x.shape[1] != self.nx
        ):
            raise Exception(
                "Error: Setting data requires a 2d numpy array of float64 "
                "inputs")
        if (
            not isinstance(y, np.ndarray)
            or y.ndim != 2
            or y.dtype != "float64"
            or y.shape[1] != self.ny
        ):
            raise Exception(
                "Error: Setting data requires a 2d numpy array of float64 "
                "outputs")
        for i in range(self.nx):
            lo, hi = self.priors[i].interval(1.0)
            if not (np.all(x[:, i] >= float(lo)) and np.all(x[:, i] <= float(hi))):
                raise Exception(
                    "Error: provided x data must fit within provided input "
                    "distribution ranges.")
        self.x = x
        self.y = y
        self.nsamp = len(x)

    def save_netcdf(self, fname):
        """Dataset persistence with the reference's dims/vars layout
        (lhc.py:134-150) for interchange with reference runs."""
        from .core import _netcdf_backend

        if _netcdf_backend() == "netCDF4":
            from netCDF4 import Dataset

            f = Dataset(fname, "w")
            f.createDimension("inputs", self.nx)
            f.createDimension("outputs", self.ny)
            f.createDimension("samples", self.x.shape[0])
            xs = f.createVariable(
                "input_samples", "f8", ("samples", "inputs"))
            ys = f.createVariable(
                "output_samples", "f8", ("samples", "outputs"))
            xs[:, :] = self.x
            ys[:, :] = self.y
            f.close()
        else:
            from scipy.io import netcdf_file

            f = netcdf_file(fname, "w")
            f.createDimension("inputs", self.nx)
            f.createDimension("outputs", self.ny)
            f.createDimension("samples", self.x.shape[0])
            xs = f.createVariable("input_samples", "d", ("samples", "inputs"))
            ys = f.createVariable(
                "output_samples", "d", ("samples", "outputs"))
            xs[:, :] = self.x
            ys[:, :] = self.y
            f.close()

    def load_netcdf(self, fname):
        from .core import _netcdf_backend

        if _netcdf_backend() == "netCDF4":
            from netCDF4 import Dataset

            f = Dataset(fname, "r")
            self.x = np.array(f.variables["input_samples"][:, :])
            self.y = np.array(f.variables["output_samples"][:, :])
            f.close()
        else:
            from scipy.io import netcdf_file

            f = netcdf_file(fname, "r")
            self.x = np.array(f.variables["input_samples"][:, :])
            self.y = np.array(f.variables["output_samples"][:, :])
            f.close()
        self.nsamp = len(self.x)


class _surrogate(LHC):
    """Generic surrogate base maintaining converted datasets xc/yc
    (reference lhc.py:163-273).  GPMCMC does not inherit this (it needs
    mean-function-aware conversion); kept for future non-GP surrogates."""

    def __init__(self, xconrevs=None, yconrevs=None, **kwargs):
        super().__init__(**kwargs)
        self.xc = copy.deepcopy(self.x)
        self.yc = copy.deepcopy(self.y)
        self.__conrev_check(xconrevs, yconrevs)

    def sample(self, nsamps, seed=None):
        nold = len(self.x)
        super().sample(nsamps, seed)
        self.__con(len(self.x) - nold)

    def __con(self, nsamps):
        self.xc = np.r_[self.xc, np.zeros((nsamps, self.nx))]
        self.yc = np.r_[self.yc, np.zeros((nsamps, self.ny))]
        for i in range(self.nx):
            self.xc[-nsamps:, i] = np.asarray(
                self.xconrevs[i].con(self.x[-nsamps:, i]))
        for i in range(self.ny):
            self.yc[-nsamps:, i] = np.asarray(
                self.yconrevs[i].con(self.y[-nsamps:, i]))

    def del_samples(self, ndels=None, method="coarse_lhc", idx=None):
        returned = super()._LHC__del_samples(ndels, method, idx, returns=True)
        if method == "coarse_lhc":
            for i in range(ndels):
                self.xc = np.delete(self.xc, returned[i], axis=0)
                self.yc = np.delete(self.yc, returned[i], axis=0)
        elif method == "random":
            self.xc = self.xc[returned, :]
            self.yc = self.yc[returned, :]
        elif method == "specific":
            self.xc = self.xc[returned]
            self.yc = self.yc[returned]
        self.nsamp = len(self.x)

    def change_conrevs(self, xconrevs=None, yconrevs=None):
        self.__conrev_check(xconrevs, yconrevs)
        for i in range(self.nx):
            self.xc[:, i] = np.asarray(self.xconrevs[i].con(self.x[:, i]))
        for i in range(self.ny):
            self.yc[:, i] = np.asarray(self.yconrevs[i].con(self.y[:, i]))

    def change_xconrevs(self, xconrevs=None):
        self.__conrev_check(xconrevs, yconrevs=self.yconrevs)
        for i in range(self.nx):
            self.xc[:, i] = np.asarray(self.xconrevs[i].con(self.x[:, i]))

    def change_yconrevs(self, yconrevs=None):
        self.__conrev_check(self.xconrevs, yconrevs)
        for i in range(self.ny):
            self.yc[:, i] = np.asarray(self.yconrevs[i].con(self.y[:, i]))

    def __conrev_check(self, xconrevs, yconrevs):
        if xconrevs is None:
            xconrevs = [None for _ in range(self.nx)]
        if yconrevs is None:
            yconrevs = [None for _ in range(self.ny)]
        if not isinstance(xconrevs, list) or len(xconrevs) != self.nx:
            raise Exception(
                "Error: xconrevs must be None or list of conversion/"
                "reversion classes of size nx")
        if not isinstance(yconrevs, list) or len(yconrevs) != self.ny:
            raise Exception(
                "Error: yconrevs must be None or list of conversion/"
                "reversion classes of size ny")
        for j, cr in enumerate(xconrevs + yconrevs):
            if cr is not None and (
                not callable(getattr(cr, "con", None))
                or not callable(getattr(cr, "rev", None))
            ):
                raise Exception(
                    "Error: Provided data conversion/reversion function not "
                    "callable.")
            elif cr is None:
                if j < self.nx:
                    xconrevs[j] = _none_conrev()
                else:
                    yconrevs[j - self.nx] = _none_conrev()
        self.xconrevs = xconrevs
        self.yconrevs = yconrevs

    def set_data(self, x, y):
        super().set_data(x, y)
        self.xc = np.empty((0, self.nx))
        self.yc = np.empty((0, self.ny))
        self.__con(self.nsamp)

    def y_dist(self, mode="hist_kde", nsamps=None, return_data=False,
               surrogate=True, predictfun=None):
        """Forward-UQ propagation of a fresh LHC through an arbitrary
        predict function (reference lhc.py:254-273)."""
        if surrogate:
            xsamps = self._LHC__latin_sample(nsamps)
            xcons = np.zeros((nsamps, self.nx))
            for i in range(self.nx):
                xcons[:, i] = np.asarray(self.xconrevs[i].con(xsamps[:, i]))
            ypreds = np.asarray(predictfun(xcons))
            yrevs = np.zeros((nsamps, self.ny))
            for i in range(self.ny):
                yrevs[:, i] = np.asarray(self.yconrevs[i].rev(ypreds[:, i]))
            self._LHC__y_dist(yrevs, mode)
            if return_data:
                return xsamps, yrevs
        elif not surrogate:
            super().y_dist(mode)
        else:
            raise Exception("Error: surrogate argument must be of type bool")


class _none_conrev:
    """Identity conversion used for None conrev slots (reference
    lhc.py:276-280); `der` provided so inverse problems work without an
    explicit output warping."""

    def con(self, x):
        return x

    def rev(self, x):
        return x

    def der(self, x):
        import numpy as _np

        return _np.ones_like(_np.asarray(x, dtype=float))
