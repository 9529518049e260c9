"""GP surrogate with MAP/MCMC hyperparameter fitting (rebuild of reference
gpmcmc.py).

The public class keeps the reference's stateful API (fit/predict/y_dist/
train_test/test_plots/relative_importances/change_model/BO/inverse_opt,
gpmcmc.py:30-1217) while all numerics run through the jitted engine in
gp/engine.py: one log-posterior per fit shape instead of a fresh PyMC graph
per call, autodiff gradients, on-device L-BFGS and NUTS, vmapped GH
quadrature.
"""

from __future__ import annotations

import copy

import numpy as np
import jax.numpy as jnp

from . import transform as tflib
from .gp import engine, kernels, quad
from .lhc import LHC, _none_conrev
from .transform import wgp

__all__ = ["GPMCMC"]


class GPState:
    """Fitted surrogate state: converted data bound to hyperparameters
    (the analogue of the reference's rebuilt pm.gp.Marginal,
    gpmcmc.py:386-399)."""

    def __init__(self, kerns, ops, noise, jitter, xin, yin, hypers):
        self.kerns = tuple(kerns)
        self.ops = tuple(ops)
        self.noise = noise
        self.jitter = jitter
        self.xin = np.asarray(xin)
        self.yin = np.asarray(yin)
        self.hypers = hypers

    def predict(self, xnew, jitter=None):
        l, kv, gv, alpha = engine.hypers_to_args(self.hypers, self.noise)
        mu, var = engine.predict_diag(
            self.kerns, self.ops, jnp.asarray(self.xin),
            jnp.asarray(self.yin), jnp.asarray(xnew), l, kv, gv, alpha,
            self.jitter if jitter is None else jitter)
        return np.asarray(mu), np.asarray(var)


class GPMCMC(LHC):
    def __init__(self, xconrevs=None, yconrevs=None, kernel="RBF",
                 noise=True, mean=0, **kwargs):
        super().__init__(**kwargs)
        self.xc = copy.deepcopy(self.x)
        self.yc = copy.deepcopy(self.y)
        self.__conrev_check(xconrevs, yconrevs)
        self.change_model(kernel, noise, mean)
        self.__scrub_train_test()
        self.ym = copy.deepcopy(self.y)

    # -- mean function ---------------------------------------------------
    def zero_mean(self, x):
        return np.zeros(self.ny)

    def _mean_vals(self, x):
        """Mean-function values per row (host-side; the mean is an arbitrary
        user callable, reference gpmcmc.py:551)."""
        if self.mean == self.zero_mean or getattr(
                self.mean, "__func__", None) is GPMCMC.zero_mean:
            return np.zeros(len(x))
        return np.array([np.asarray(self.mean(x[i, :])).reshape(-1)[0]
                         for i in range(len(x))])

    # -- conversion plumbing (mean-aware, gpmcmc.py:47-137) --------------
    def __con(self, nsamps):
        self.xc = np.r_[self.xc, np.zeros((nsamps, self.nx))]
        self.yc = np.r_[self.yc, np.zeros((nsamps, self.ny))]
        for i in range(self.nx):
            self.xc[-nsamps:, i] = np.asarray(
                self.xconrevs[i].con(self.x[-nsamps:, i]))
        for i in range(self.ny):
            self.yc[-nsamps:, i] = np.asarray(self.yconrevs[i].con(
                self.y[-nsamps:, i] - self.ym[-nsamps:, i]))

    def del_samples(self, ndels=None, method="coarse_lhc", idx=None):
        returned = super()._LHC__del_samples(ndels, method, idx, returns=True)
        if method == "coarse_lhc":
            for i in range(ndels):
                self.xc = np.delete(self.xc, returned[i], axis=0)
                self.yc = np.delete(self.yc, returned[i], axis=0)
                self.ym = np.delete(self.ym, returned[i], axis=0)
        elif method == "random":
            self.xc = self.xc[returned, :]
            self.yc = self.yc[returned, :]
            self.ym = self.ym[returned, :]
        elif method == "specific":
            self.xc = self.xc[returned]
            self.yc = self.yc[returned]
            self.ym = self.ym[returned]
        self.nsamp = len(self.x)
        self.__scrub_train_test()

    def change_conrevs(self, xconrevs=None, yconrevs=None):
        self.__conrev_check(xconrevs, yconrevs)
        for i in range(self.nx):
            self.xc[:, i] = np.asarray(self.xconrevs[i].con(self.x[:, i]))
        for i in range(self.ny):
            self.yc[:, i] = np.asarray(self.yconrevs[i].con(
                self.y[:, i] - self.ym[:, i]))

    def change_xconrevs(self, xconrevs=None):
        self.__conrev_check(xconrevs, yconrevs=self.yconrevs)
        for i in range(self.nx):
            self.xc[:, i] = np.asarray(self.xconrevs[i].con(self.x[:, i]))

    def change_yconrevs(self, yconrevs=None):
        self.__conrev_check(self.xconrevs, yconrevs)
        for i in range(self.ny):
            self.yc[:, i] = np.asarray(self.yconrevs[i].con(
                self.y[:, i] - self.ym[:, i]))

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

    # -- data management -------------------------------------------------
    def set_data(self, x, y):
        super().set_data(x, y)
        self.xc = np.empty((0, self.nx))
        self.yc = np.empty((0, self.ny))
        xm, ym = self._core__vector_solver(self.x, self.mean)
        if len(xm) != len(self.x):
            raise Exception(
                "Mean function not valid at every x point in dataset")
        self.ym = ym
        self.__con(self.nsamp)
        self.__scrub_train_test()

    def y_dist(self, mode="hist_kde", nsamps=None, return_data=False,
               surrogate=True):
        if surrogate:
            xsamps = self._LHC__latin_sample(nsamps)
            ypreds = self.predict(xsamps)
            self._LHC__y_dist(ypreds, mode)
            if return_data:
                return xsamps, ypreds
        elif not surrogate:
            super().y_dist(mode)
        else:
            raise Exception("Error: surrogate argument must be of type bool")

    def __scrub_train_test(self):
        self.train = None
        self.test = None

    def sample(self, nsamps, seed=None):
        super().sample(nsamps=nsamps, seed=seed)
        xm, ym = self._core__vector_solver(self.x, self.mean)
        if len(xm) != len(self.x):
            raise Exception(
                "Mean function not valid at every x point in dataset")
        self.ym = ym
        self.xc = np.empty((0, self.nx))
        self.yc = np.empty((0, self.ny))
        self.nsamp = len(xm)
        self.__con(self.nsamp)

    # -- model configuration ---------------------------------------------
    def change_model(self, kernel=None, noise=None, mean=None):
        """Set kernel string / noise / mean function; scrubs fitted state
        (reference gpmcmc.py:472-519, with a fixed ops parser)."""
        if kernel is None:
            kernel = self.kernel
        if noise is None:
            noise = self.noise
        if mean is None:
            pass
        elif mean == 0:
            self.mean = self.zero_mean
            xm, ym = self._core__vector_solver(self.x, self.mean)
            if len(xm) != len(self.x):
                raise Exception(
                    "Mean function not valid at every x point in dataset")
            self.ym = ym
        else:
            self.mean = mean
            xm, ym = self._core__vector_solver(self.x, self.mean)
            if len(xm) != len(self.x):
                raise Exception(
                    "Mean function not valid at every x point in dataset")
            self.ym = ym

        kerns, ops = kernels.parse_kernel(kernel)
        if not isinstance(noise, bool):
            raise Exception("Error: noise must be of type bool")
        self.kernel = kernel
        self.kerns = list(kerns)
        self.ops = list(ops)
        self.nkern = len(kerns)
        self.noise = noise
        self.m = None
        self.gp = None
        self.hypers = None

    # -- fitting ----------------------------------------------------------
    def fit(self, method="map", return_data=False, iwgp=False, cwgp=False,
            jitter=1e-6, truncate=False, restarts=1, **kwargs):
        self.m, self.gp, self.hypers, data = self.__fit(
            self.x, self.y - self.ym, method, iwgp, cwgp, jitter, truncate,
            restarts, **kwargs)
        if return_data:
            return data

    def __fit(self, x, y, method, iwgp, cwgp, jitter=1e-6, truncate=False,
              restarts=1, **kwargs):
        cfg = engine.FitConfig(
            kerns=tuple(self.kerns), ops=tuple(self.ops), noise=self.noise,
            truncate=truncate, jitter=jitter, iwgp=iwgp, cwgp=cwgp,
            priors=self.priors, xconrevs=self.xconrevs,
            yconrevs=self.yconrevs, x=np.asarray(x), y=np.asarray(y))

        data = None
        if method == "map":
            start = kwargs.pop("start", None)
            mp, _logp = engine.map_fit(
                cfg, start=start, restarts=restarts, **kwargs)
        elif method == "none":
            mp = self.hypers
            if mp is None:
                raise Exception(
                    "method='none' requires previously fitted hypers")
        elif method in ("mcmc_mean", "mcmc_map"):
            from .inference import nuts

            data = nuts.sample_model(cfg, verbose=self.verbose, **kwargs)
            if method == "mcmc_mean":
                mp = self.mean_extract(data)
            else:
                mp = self.map_extract(data)
                try:
                    mp2, _ = engine.map_fit(cfg, start=mp, restarts=1)
                    mp = mp2
                except Exception:
                    pass
        else:
            raise Exception(
                "method must be one of map, mcmc_map, or mcmc_mean")

        # Post-fit: write learnable warpings back and bind converted data
        # (reference gpmcmc.py:364-399).
        if method != "none":
            if iwgp:
                self.iwgp_set(mp["iwgp"])
            if cwgp:
                pos = self.yconrevs[0].pos
                rc = rcpos = 0
                params = []
                for i in range(self.yconrevs[0].np):
                    if pos[i]:
                        params.append(np.asarray(mp["cwgp_pos"])[rcpos])
                        rcpos += 1
                    else:
                        params.append(np.asarray(mp["cwgp"])[rc])
                        rc += 1
                self.cwgp_set(np.array(params))

        xin = np.zeros_like(x)
        for i in range(self.nx):
            xin[:, i] = np.asarray(self.xconrevs[i].con(x[:, i]))
        yin = np.asarray(self.yconrevs[0].con(y[:, 0]))
        gpstate = GPState(
            self.kerns, self.ops, self.noise, jitter, xin, yin, mp)
        return gpstate, gpstate, mp, data

    # -- MCMC extraction (gpmcmc.py:404-430) ------------------------------
    def mean_extract(self, data):
        mean = data.posterior_mean()
        return {k: np.asarray(v) for k, v in mean.items()}

    def map_extract(self, data):
        mp, lpmax = data.max_logp_point()
        if self.verbose:
            print(f"Max log posterior: {lpmax}")
            print(f"Max log posterior sample: {mp}")
        return {k: np.asarray(v) for k, v in mp.items()}

    # -- learnable warping write-back (gpmcmc.py:433-462) -----------------
    def cwgp_set(self, params, mode="numpy", y=None):
        if y is None:
            y = self.y - self.ym
        warper = wgp(
            self.yconrevs[0].warping_names, params, y[:, 0])
        if mode == "numpy":
            self.change_yconrevs([warper])
        else:
            return warper

    def iwgp_set(self, params, mode="numpy", x=None):
        if x is None:
            x = self.x
        xconrevs = []
        rc = 0
        for i in range(self.nx):
            if isinstance(self.xconrevs[i], wgp):
                ran = self.xconrevs[i].np
                xconrevs.append(wgp(
                    self.xconrevs[i].warping_names, params[rc : rc + ran],
                    y=x[:, i], xdist=self.priors[i]))
                rc += ran
            else:
                xconrevs.append(self.xconrevs[i])
        if mode == "numpy":
            self.change_xconrevs(xconrevs=xconrevs)
        else:
            return xconrevs

    # -- train/test -------------------------------------------------------
    def train_test(self, training_frac=0.9):
        from sklearn.model_selection import train_test_split

        self.nsamp = len(self.x)
        indexes = np.arange(self.nsamp)
        self.train, self.test = train_test_split(
            indexes, train_size=training_frac)

    # -- prediction -------------------------------------------------------
    def predict(self, x, return_var=False, convert=True, revert=True,
                normvar=False, jitter=1e-6, EI=False, EIopt=None, deg=8):
        """Predict at raw x (convert=True) or converted x (convert=False),
        reverting through the output warping by GH quadrature
        (gpmcmc.py:522-542)."""
        x = np.asarray(x)
        if convert:
            xarg = np.zeros_like(x)
            for i in range(self.nx):
                xarg[:, i] = np.asarray(self.xconrevs[i].con(x[:, i]))
            xraw = x
        else:
            xarg = x
            xraw = np.zeros_like(x)
            for i in range(self.nx):
                xraw[:, i] = np.asarray(self.xconrevs[i].rev(x[:, i]))

        y, yv = self.__predict(self.m, self.gp, self.hypers, xarg, jitter)

        if revert:
            y, yv = self.__gh_stats(
                xraw, y, yv, normvar, deg, EI=EI, EIopt=EIopt)

        if return_var:
            return y, yv
        return y

    def __gh_stats(self, x, y, yv, normvar=True, deg=8, EI=False, EIopt=None):
        mean_vals = self._mean_vals(x)
        yy, yyv = quad.gh_stats(
            self.yconrevs[0].rev, y[:, 0], yv[:, 0], mean_vals, deg=deg,
            EI=EI, EIopt=(EIopt if EIopt else "min"),
            yopt=getattr(self, "yopt", 0.0), normvar=normvar)
        return np.asarray(yy).reshape(-1, 1), np.asarray(yyv).reshape(-1, 1)

    def __predict(self, m, gp, hyps, x, jitter=1e-6):
        if self.verbose:
            print("Predicting...")
        from time import time as stopwatch

        t0 = stopwatch()
        if gp is None:
            raise Exception("Model must be fitted before predicting")
        state = GPState(
            gp.kerns, gp.ops, gp.noise, jitter, gp.xin, gp.yin, hyps)
        y, yv = state.predict(x)
        t1 = stopwatch()
        if self.verbose:
            print(f"Time taken: {t1 - t0:0.2f} s")
        return y.reshape(-1, 1), yv.reshape(-1, 1)

    # -- diagnostics ------------------------------------------------------
    def test_plots(self, revert=True, yplots=True, xplots=True,
                   logscale=False, iwgp=False, cwgp=False, method="none",
                   errorbars=True, saveyfig=None, xlab=None, ylab=None,
                   returndat=False):
        """Held-out fit assessment: RMSE/MAE/MPE/R2 + parity plots
        (reference gpmcmc.py:933-1027)."""
        if self.train is None:
            self.train_test()
        xtrain = self.x[self.train, :]
        xtest = self.x[self.test, :]
        ytrain = self.y[self.train, :]
        ytest = self.y[self.test, :]
        ymtrain = self.ym[self.train, :]
        ymtest = self.ym[self.test, :]

        m, gp, hypers, data = self.__fit(
            xtrain, ytrain - ymtrain, method, iwgp, cwgp)
        xctest = np.zeros_like(xtest)
        for i in range(self.nx):
            xctest[:, i] = np.asarray(self.xconrevs[i].con(xtest[:, i]))
        ypred, yvars = self.__predict(m, gp, hypers, xctest)

        if revert:
            ytest = ytest[:, 0]
            ypred, yvars = self.__gh_stats(
                xtest, ypred, yvars, normvar=False)
            ypred = ypred[:, 0]
            yvars = yvars[:, 0]
            meany = np.mean(self.y)
        else:
            xtest = xctest
            ytest = np.asarray(
                self.yconrevs[0].con(ytest[:, 0] - ymtest[:, 0]))
            ypred = ypred[:, 0]
            yvars = yvars[:, 0]
            meany = np.mean(self.yc)

        rmse = np.sqrt(np.mean(np.power(ypred - ytest, 2)))
        mea = np.mean(np.abs(ypred - ytest))
        mpe = np.mean(np.abs(ypred - ytest) / np.abs(ytest))
        r2 = 1 - np.sum(np.power(ypred - ytest, 2)) / np.sum(
            np.power(ytest - meany, 2))
        if self.verbose:
            print(f"RMSE for y is: {rmse:0.5e}")
            print(f"Mean absoulte error for y is: {mea:0.5e}")
            print(f"Mean percentage error for y is: {mpe:0.5%}")
            print(f"R^2 for y is: {r2:0.5f}")

        if yplots or xplots:
            import matplotlib.pyplot as plt

            if yplots:
                plt.plot(ytest, ytest, "-", label="True")
                if logscale:
                    plt.plot(ytest, ypred, "o", label="GP")
                    plt.xscale("log")
                    plt.yscale("log")
                elif errorbars:
                    plt.errorbar(ytest, ypred, fmt="o",
                                 yerr=np.sqrt(yvars), label="GP", capsize=3)
                else:
                    plt.plot(ytest, ypred, "x", label="GP")
                plt.xlabel("y" if xlab is None else xlab)
                plt.ylabel("y" if ylab is None else ylab)
                plt.legend()
                if saveyfig is not None:
                    plt.tight_layout()
                    plt.savefig(saveyfig, bbox_inches="tight")
                else:
                    plt.title("y")
                plt.show()
            if xplots:
                for j in range(self.nx):
                    plt.title(f"y wrt x[{j}]")
                    plt.plot(xtest[:, j], ytest, ".", label="Test")
                    if logscale:
                        plt.plot(xtest[:, j], ypred, "o", label="GP")
                        plt.yscale("log")
                    elif errorbars:
                        plt.errorbar(xtest[:, j], ypred, fmt="o",
                                     yerr=np.sqrt(yvars), label="GP",
                                     capsize=3)
                    else:
                        plt.plot(xtest[:, j], ypred, "o", label="GP")
                    plt.ylabel("y")
                    plt.xlabel(f"x[{j}]")
                    plt.legend()
                    plt.show()

        if returndat:
            return xtest, ytest, ypred, yvars

    def relative_importances(self, logscale=False):
        """Inverse-lengthscale sensitivity bars (gpmcmc.py:1030-1037)."""
        import matplotlib.pyplot as plt

        vals = 1 / np.asarray(self.hypers["l"])[: self.nx]
        if logscale:
            vals = np.log(vals)
        plt.bar([f"x[{i}]" for i in range(self.nx)], vals)
        plt.ylabel("Relative importance")
        plt.show()

    # -- conversion shortcuts (gpmcmc.py:909-929) -------------------------
    def __yconrev__(self, yin, mode="con"):
        yout = np.zeros_like(yin)
        if mode == "con":
            yout[:, 0] = np.asarray(self.yconrevs[0].con(yin[:, 0]))
        elif mode == "rev":
            yout[:, 0] = np.asarray(self.yconrevs[0].rev(yin[:, 0]))
        else:
            raise Exception("Error: Mode must be one of con or rev")
        return yout

    def __xconrev__(self, xin, mode="con"):
        xout = np.zeros_like(xin)
        for i in range(self.nx):
            if mode == "con":
                xout[:, i] = np.asarray(self.xconrevs[i].con(xin[:, i]))
            elif mode == "rev":
                xout[:, i] = np.asarray(self.xconrevs[i].rev(xin[:, i]))
            else:
                raise Exception("Error: Mode must be one of con or rev")
        return xout
