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
import jax
import jax.numpy as jnp

from .gp import engine, kernels, quad
from .lhc import LHC, _convert_columns, _none_conrev, _validated_conrevs
from .transform import wgp

__all__ = ["GPMCMC"]


class GPState:
    """Fitted surrogate state: converted data bound to hyperparameters
    (the analogue of the reference's rebuilt pm.gp.Marginal,
    gpmcmc.py:386-399).

    Data is bucket-padded with phantom identity rows so the compiled
    conditioning/prediction programs are reused as the dataset grows
    (per-shape TPU compiles cost minutes; SURVEY.md §7 hard part 5).

    Above MIXED_N training rows on TPU, conditioning and prediction route
    through the mixed-precision blocked factorisation (emulated-f64
    cholesky compile-explodes at n >= 8192 and XLA trsm at any size,
    docs/TPU_NOTES.md) — predictions after a precision='mixed' 16k fit
    run on-chip instead of failing to compile."""

    BUCKET = 32
    MIXED_N = 4096
    MIXED_BLOCK = 1024

    def __init__(self, kerns, ops, noise, jitter, xin, yin, hypers):
        self.kerns = tuple(kerns)
        self.ops = tuple(ops)
        self.noise = noise
        self.jitter = jitter
        self.xin = np.asarray(xin)
        self.yin = np.asarray(yin)
        self.hypers = hypers
        self._cache = {}

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_cache"] = {}
        return d

    def _mixed(self):
        from ._config import is_tpu

        return is_tpu() and self.xin.shape[0] >= self.MIXED_N

    def _bucket(self):
        return self.MIXED_BLOCK if self._mixed() else self.BUCKET

    def padded(self):
        return engine.pad_data(self.xin, self.yin, self._bucket())

    def hyper_args(self):
        return engine.hypers_to_args(self.hypers, self.noise)

    def chol(self, jitter=None):
        """Cached conditioning state over padded data: (L, v, xin_p,
        valid) on the exact path, plus the diagonal-block inverses on the
        mixed path."""
        j = self.jitter if jitter is None else jitter
        if j not in self._cache:
            l, kv, gv, alpha = self.hyper_args()
            xin_p, yin_p, valid = self.padded()
            if self._mixed():
                L, v, Dinv = engine.chol_state_masked_mixed(
                    self.kerns, self.ops, xin_p, yin_p, valid, l, kv, gv,
                    alpha, j, block=self.MIXED_BLOCK)
                self._cache[j] = (L, v, xin_p, valid, Dinv)
            else:
                L, v = engine.chol_state_masked(
                    self.kerns, self.ops, xin_p, yin_p, valid, l, kv, gv,
                    alpha, j)
                self._cache[j] = (L, v, xin_p, valid, None)
        return self._cache[j]

    #: query rows per compiled predict call: bounds the (n_train, nq)
    #: cross-Gram working set (at 16k train rows an unchunked 200k-point
    #: query would materialise a ~26 GB f64 cross-Gram and OOM the 16 GB
    #: chip).  All chunks share one padded shape, so the host loop
    #: reuses a single compiled program.
    QCHUNK = 16384

    def predict(self, xnew, jitter=None):
        l, kv, gv, alpha = self.hyper_args()
        L, v, xin_p, valid, Dinv = self.chol(jitter)
        m = xnew.shape[0]

        def run(xq):
            if Dinv is not None:
                return engine.predict_from_chol_masked_mixed(
                    self.kerns, self.ops, xin_p, valid, L, v, Dinv, xq,
                    l, kv, gv, alpha)
            return engine.predict_from_chol_masked(
                self.kerns, self.ops, xin_p, valid, L, v, xq, l, kv, gv,
                alpha)

        if m > self.QCHUNK:
            mus, vars_ = [], []
            for lo in range(0, m, self.QCHUNK):
                xq = jnp.asarray(xnew[lo:lo + self.QCHUNK])
                if xq.shape[0] != self.QCHUNK:  # pad the tail chunk
                    xq = jnp.pad(
                        xq, ((0, self.QCHUNK - xq.shape[0]), (0, 0)))
                take = min(self.QCHUNK, m - lo)
                mu, var = run(xq)
                mus.append(np.asarray(mu[:take]))
                vars_.append(np.asarray(var[:take]))
            return np.concatenate(mus), np.concatenate(vars_)

        mpad = engine.round_up(max(m, 1), self.BUCKET)
        xq = jnp.asarray(xnew)
        if mpad != m:
            xq = jnp.pad(xq, ((0, mpad - m), (0, 0)))
        mu, var = run(xq)
        return np.asarray(mu[:m]), np.asarray(var[:m])


class GPMCMC(LHC):
    def __init__(self, xconrevs=None, yconrevs=None, kernel="RBF",
                 noise=True, mean=0, **kwargs):
        super().__init__(**kwargs)
        self.ym = copy.deepcopy(self.y)
        self.__conrev_check(xconrevs, yconrevs)
        self._reconvert()
        self.change_model(kernel, noise, mean)
        self.__scrub_train_test()

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
    # Unlike _surrogate, the converted outputs are of the MEAN-SUBTRACTED
    # targets: yc = ycon(y - ym) (reference gpmcmc.py:53-54).  All converted
    # copies are rebuilt wholesale from (x, y, ym) through one helper —
    # transforms are deterministic given their fitted state, so there is
    # nothing to gain from the reference's incremental per-mode mirroring.
    def _reconvert(self):
        self.xc = _convert_columns(self.xconrevs, self.x)
        self.yc = _convert_columns(self.yconrevs, self.y - self.ym)

    def del_samples(self, ndels=None, method="coarse_lhc", idx=None):
        keep = self._LHC__keep_mask(ndels, method, idx)
        for name in ("x", "y", "xc", "yc", "ym"):
            setattr(self, name, getattr(self, name)[keep])
        self.nsamp = len(self.x)
        self.__scrub_train_test()

    def change_conrevs(self, xconrevs=None, yconrevs=None):
        self.__conrev_check(xconrevs, yconrevs)
        self._reconvert()

    def change_xconrevs(self, xconrevs=None):
        self.__conrev_check(xconrevs, yconrevs=self.yconrevs)
        self.xc = _convert_columns(self.xconrevs, self.x)

    def change_yconrevs(self, yconrevs=None):
        self.__conrev_check(self.xconrevs, yconrevs)
        self.yc = _convert_columns(self.yconrevs, self.y - self.ym)

    def __conrev_check(self, xconrevs, yconrevs):
        self.xconrevs = _validated_conrevs(xconrevs, self.nx, "xconrevs")
        self.yconrevs = _validated_conrevs(yconrevs, self.ny, "yconrevs")

    # -- data management -------------------------------------------------
    def set_data(self, x, y):
        super().set_data(x, y)
        xm, ym = self._core__vector_solver(self.x, self.mean)
        if len(xm) != len(self.x):
            raise Exception(
                "Mean function not valid at every x point in dataset")
        self.ym = ym
        self._reconvert()
        self.__scrub_train_test()

    def y_dist(self, mode="hist_kde", nsamps=None, return_data=False,
               surrogate=True):
        """Forward-UQ output distribution through the surrogate
        (reference gpmcmc.py:253-263).  nsamps=None defaults to 1000
        prior samples — the reference crashes on its own default
        (np.zeros((None, ...)) at lhc.py:257); fixed here like its
        other bugs."""
        if surrogate:
            if nsamps is None:
                nsamps = 1000
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
        self.nsamp = len(xm)
        self._reconvert()

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
        """Fit hyperparameters; return_data=True returns the MCMC draws
        as an arviz InferenceData when arviz is importable (reference
        gpmcmc.py:175-182 returns pm.sample's InferenceData), else the
        MCMCData carrier (same from_dict schema via .to_dict())."""
        self.m, self.gp, self.hypers, data = self.__fit(
            self.x, self.y - self.ym, method, iwgp, cwgp, jitter, truncate,
            restarts, **kwargs)
        if return_data:
            from .inference import nuts

            return nuts.as_inference_data(data)

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
            precision_ = kwargs.pop("precision", "f64")
            if precision_ == "distributed":
                # multi-chip path: the closed-form gradient pipeline
                # row-sharded over a device mesh (gp/sharded.py); pass
                # mesh=... to select devices (default: all)
                from .gp import sharded

                if iwgp or cwgp:
                    # learnable warpings over the mesh: the elementwise
                    # warp layers ride the distributed closed-form
                    # pipeline (sharded.make_sharded_warped_objective)
                    mp, _logp = sharded.sharded_big_warped_map_fit(
                        cfg, start=start, **kwargs)
                else:
                    xin = _apply_conrevs(self.xconrevs, x, "con")
                    yin = np.asarray(self.yconrevs[0].con(y[:, 0]))
                    mp, _logp = sharded.sharded_big_map_fit(
                        xin, yin, kerns=tuple(self.kerns),
                        ops=tuple(self.ops), noise=self.noise,
                        truncate=truncate, jitter=jitter,
                        start=start, **kwargs)
            elif precision_ == "mixed":
                # large-N path: closed-form gradients through the
                # int8-Ozaki blocked factorisation (gp/bigfit.py); full
                # kernel algebra + learnable warpings (iwgp/cwgp via
                # make_warped_vg: kernel grads closed-form, warp grads
                # one elementwise AD pass off the stored alpha)
                from .gp import bigfit

                if iwgp or cwgp:
                    mp, _logp = bigfit.big_warped_map_fit(
                        cfg, start=start, restarts=restarts, **kwargs)
                else:
                    xin = _apply_conrevs(self.xconrevs, x, "con")
                    yin = np.asarray(self.yconrevs[0].con(y[:, 0]))
                    mp, _logp = bigfit.big_map_fit(
                        xin, yin, kerns=tuple(self.kerns),
                        ops=tuple(self.ops), noise=self.noise,
                        truncate=truncate, jitter=jitter,
                        start=start, restarts=restarts, **kwargs)
            else:
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
        """Random train/test index split (reference gpmcmc.py:521-526,
        which delegates to sklearn's train_test_split; the same
        semantics natively — shuffled permutation, n_train =
        floor(frac * n))."""
        self.nsamp = len(self.x)
        if isinstance(training_frac, (int, np.integer)) and not isinstance(
                training_frac, bool):
            # sklearn train_size int = absolute training count
            if not 0 < training_frac < self.nsamp:
                raise Exception(
                    "Error: integer training_frac must be in "
                    f"(0, {self.nsamp})")
            ntrain = int(training_frac)
        else:
            frac = float(training_frac)
            if not 0.0 < frac < 1.0:
                raise Exception(
                    "Error: training_frac must be a fraction in (0, 1) "
                    "or an integer training count")
            ntrain = int(np.floor(self.nsamp * frac))
        perm = np.random.default_rng().permutation(self.nsamp)
        self.train, self.test = perm[:ntrain], perm[ntrain:]

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
        if gp is None:
            raise Exception("Model must be fitted before predicting")
        from . import timing

        with timing.stopwatch("predict", verbose=self.verbose):
            state = GPState(
                gp.kerns, gp.ops, gp.noise, jitter, gp.xin, gp.yin, hyps)
            y, yv = state.predict(x)
        return y.reshape(-1, 1), yv.reshape(-1, 1)

    # -- diagnostics ------------------------------------------------------
    def test_plots(self, revert=True, yplots=True, xplots=True,
                   logscale=False, iwgp=False, cwgp=False, method="none",
                   errorbars=True, saveyfig=None, xlab=None, ylab=None,
                   returndat=False):
        """Held-out fit assessment: refit on the train split, predict the
        test split, report RMSE/MAE/MPE/R2 and draw parity / per-input
        scatter plots (same outputs as reference gpmcmc.py:933-1027)."""
        if self.train is None:
            self.train_test()
        tr, te = self.train, self.test
        xtest = self.x[te]

        m, gp, hypers, _ = self.__fit(
            self.x[tr], self.y[tr] - self.ym[tr], method, iwgp, cwgp)
        xctest = _convert_columns(self.xconrevs, xtest)
        ypred, yvars = self.__predict(m, gp, hypers, xctest)

        if revert:
            ypred, yvars = self.__gh_stats(
                xtest, ypred, yvars, normvar=False)
            ytest = self.y[te, 0]
            ybar = np.mean(self.y)
        else:
            ytest = np.asarray(
                self.yconrevs[0].con(self.y[te, 0] - self.ym[te, 0]))
            xtest = xctest
            ybar = np.mean(self.yc)
        ypred, yvars = ypred[:, 0], yvars[:, 0]

        metrics = _regression_metrics(ypred, ytest, ybar)
        if self.verbose:
            print(f"RMSE for y is: {metrics['rmse']:0.5e}")
            print(f"Mean absolute error for y is: {metrics['mae']:0.5e}")
            print(f"Mean percentage error for y is: {metrics['mpe']:0.5%}")
            print(f"R^2 for y is: {metrics['r2']:0.5f}")

        if yplots:
            _gp_scatter_plot(
                ytest, ytest, ypred, yvars, logscale=logscale,
                errorbars=errorbars, truth_style="-", truth_label="True",
                points_fmt="x", log_x=True,
                xlabel=("y" if xlab is None else xlab),
                ylabel=("y" if ylab is None else ylab),
                title="y", savefig=saveyfig)
        if xplots:
            for j in range(self.nx):
                _gp_scatter_plot(
                    xtest[:, j], ytest, ypred, yvars, logscale=logscale,
                    errorbars=errorbars, truth_style=".", truth_label="Test",
                    points_fmt="o", log_x=False, xlabel=f"x[{j}]",
                    ylabel="y", title=f"y wrt x[{j}]")

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

    # -- Bayesian optimisation (gpmcmc.py:601-906) ------------------------
    def _prior_rv(self, k):
        """Map prior k to an unconstrained RV (the scipy->pymc conversion of
        gpmcmc.py:705-730 / 1053-1095, for our JAX dists)."""
        from . import dists
        from .inference.unconstrained import RV

        d = self.priors[k]
        if isinstance(d, dists.Uniform):
            lo, hi = d.interval(1.0)
            return RV(f"x{k}", 1, ("uniform", float(lo), float(hi)))
        if isinstance(d, dists.Normal):
            return RV(f"x{k}", 1, ("normal", float(d.loc), float(d.scale)))
        if isinstance(d, dists.TruncNorm):
            lo, hi = d.interval(1.0)
            return RV(f"x{k}", 1, (
                "truncnormal", float(d.loc), float(d.scale),
                float(lo), float(hi)))
        raise Exception(
            "Prior distribution conversion not implemented for "
            f"{type(d).__name__}")

    def _is_zero_mean(self):
        mref = getattr(self.mean, "__func__", self.mean)
        return mref is GPMCMC.zero_mean or self.mean == self.zero_mean

    def _bo_mixed(self):
        """Whether BO conditioning/acquisition should route through the
        mixed-precision blocked factorisation — same dispatch rule as
        GPState.predict (the exact path's emulated-f64 cholesky cannot
        compile at large N on this TPU platform, docs/TPU_NOTES.md)."""
        from ._config import is_tpu

        return is_tpu() and len(self.xc) >= GPState.MIXED_N

    def _bo_state_args(self, jitter):
        """Padded conditioning state for the CURRENT converted dataset —
        recomputed cheaply each BO iteration through shape-stable compiled
        programs.  Returns (state args, has_alpha, mixed)."""
        l, kv, gv, alpha = engine.hypers_to_args(self.hypers, self.noise)
        has_alpha = alpha is not None
        alpha_arg = alpha if has_alpha else jnp.asarray(0.0)
        if self._bo_mixed():
            blk = GPState.MIXED_BLOCK
            xin_p, yin_p, valid = engine.pad_data(
                self.xc, self.yc[:, 0], blk)
            L, av, Dinv = engine.chol_state_masked_mixed(
                tuple(self.kerns), tuple(self.ops), xin_p, yin_p, valid, l,
                kv, gv, alpha, jitter, block=blk)
            return ((xin_p, valid, L, av, Dinv, l, kv, gv, alpha_arg),
                    has_alpha, True)
        xin_p, yin_p, valid = engine.pad_data(
            self.xc, self.yc[:, 0], GPState.BUCKET)
        L, v = engine.chol_state_masked(
            tuple(self.kerns), tuple(self.ops), xin_p, yin_p, valid, l, kv,
            gv, alpha, jitter)
        return (xin_p, valid, L, v, l, kv, gv, alpha_arg), has_alpha, False

    def _acq_fn(self, method, opt_type, normvar, has_alpha, mixed=False):
        """Pure batched acquisition: (X, *state args, yopt) -> values to
        MINIMISE; closes only over static config + transform objects."""
        from ._config import is_tpu

        conrevs = list(self.xconrevs)
        yrev = self.yconrevs[0].rev
        kerns, ops = tuple(self.kerns), tuple(self.ops)
        nx = self.nx
        # acquisition values tolerate f32 noise and are evaluated
        # thousands of times per BO iteration: on TPU the cross-Gram
        # rides the fused Pallas tile kernel
        fast = is_tpu()

        def acq(X, *args):
            if mixed:
                xin_p, valid, L, v, Dinv, l, kv, gv, alpha, yopt = args
            else:
                xin_p, valid, L, v, l, kv, gv, alpha, yopt = args
            cols = [conrevs[i].con(X[:, i]) for i in range(nx)]
            Xc = jnp.stack(cols, axis=1)
            if mixed:
                mu, var = engine.predict_from_chol_masked_mixed(
                    kerns, ops, xin_p, valid, L, v, Dinv, Xc, l, kv, gv,
                    alpha if has_alpha else None, fast=fast)
            else:
                mu, var = engine.predict_from_chol_masked(
                    kerns, ops, xin_p, valid, L, v, Xc, l, kv, gv,
                    alpha if has_alpha else None, fast=fast)
            if method in ("eps-RS", "exploit"):
                y, _ = quad.gh_stats(yrev, mu, var)
                return y if opt_type == "min" else -y
            if method == "explore":
                y, yv = quad.gh_stats(yrev, mu, var, normvar=normvar)
                return -yv
            if method == "EI":
                ei, _ = quad.gh_stats(
                    yrev, mu, var, EI=True, EIopt=opt_type, yopt=yopt)
                return -ei
            raise Exception(
                "method must be one of eps-RS ,EI, exploit, or explore")

        return acq

    _BO_CACHE_MAX = 32

    def _get_bo_program(self, kind, method, opt_type, normvar, has_alpha,
                        mixed=False):
        """Jitted BO programs cached per (kind, acquisition, model spec,
        transform CONTENT, data bucket) so BO iterations re-use compiled
        executables (a fresh trace per iteration costs ~a minute of XLA
        compile on TPU).

        Keys use transform content (type + parameter state) rather than
        object identity: id() can be recycled after GC, silently returning
        a program traced for a different warping.  The cache is bounded
        (LRU) so long-running sessions cannot grow it without limit."""
        from collections import OrderedDict

        bucket = GPState.MIXED_BLOCK if mixed else GPState.BUCKET
        key = (
            kind, method, opt_type, bool(normvar), self.kernel, self.noise,
            tuple(_transform_content_key(c) for c in self.xconrevs),
            _transform_content_key(self.yconrevs[0]),
            engine.round_up(max(len(self.xc), 1), bucket),
            has_alpha, bool(mixed))
        cache = self.__dict__.setdefault("_bo_cache", OrderedDict())
        if key in cache:
            cache.move_to_end(key)
            return cache[key]
        while len(cache) >= self._BO_CACHE_MAX:
            cache.popitem(last=False)
        acq = self._acq_fn(method, opt_type, normvar, has_alpha, mixed)
        if kind == "batch":
            run = jax.jit(acq)
        elif kind == "de":
            from .inference import de as de_mod

            @jax.jit
            def run(keyrng, lo, hi, *sargs):
                return de_mod.differential_evolution(
                    lambda X: acq(X, *sargs), lo, hi, keyrng)
        elif kind == "refine":
            from .inference.lbfgs import minimize_lbfgs
            from .inference.unconstrained import RVPack

            rvpack = RVPack(
                tuple(self._prior_rv(k) for k in range(self.nx)))

            @jax.jit
            def run(z0, *sargs):
                def nlp(z):
                    vals = rvpack.unpack(z)
                    xrow = jnp.stack(
                        [vals[f"x{k}"][0] for k in range(self.nx)])
                    val = acq(xrow[None, :], *sargs)[0]
                    return val - rvpack.log_prior(z)

                z, val, gnorm, niter = minimize_lbfgs(nlp, z0)
                return z, val

            run = (run, rvpack)
        cache[key] = run
        return run

    def __getstate__(self):
        d = dict(self.__dict__)
        d.pop("_bo_cache", None)
        return d

    def _acq_host(self, method, opt_type, normvar):
        """Host-callable acquisition via self.predict (handles custom mean
        functions) — mirrors the reference optf closures
        (gpmcmc.py:650-674)."""

        def optf(x):
            x = np.asarray(x, dtype=float)
            if x.ndim == 1:
                x = np.array([x])
            if method in ("eps-RS", "exploit"):
                ym = self.predict(x)
                return ym[:, 0] if opt_type == "min" else -ym[:, 0]
            if method == "explore":
                ym, yv = self.predict(x, return_var=True, normvar=normvar)
                return -yv[:, 0]
            if method == "EI":
                ym = self.predict(x, EI=True, EIopt=opt_type)
                return -ym[:, 0]
            raise Exception(
                "method must be one of eps-RS ,EI, exploit, or explore")

        return optf

    def _refine_nlp(self, method, opt_type, normvar, jitter):
        """Unconstrained objective over the input point for the BO refine
        stage (reference's fixed-hyper pm model, gpmcmc.py:699-860)."""
        from .inference.unconstrained import RVPack

        if not self._is_zero_mean():
            raise Exception(
                "BO refine/map optimisation requires the zero mean function "
                "(the reference's symbolic path has the same restriction)")
        rvpack = RVPack(tuple(self._prior_rv(k) for k in range(self.nx)))
        gp = self.gp
        l, kv, gv, alpha = engine.hypers_to_args(self.hypers, gp.noise)
        xin = jnp.asarray(self.xc)
        yin = jnp.asarray(self.yc[:, 0])
        L, v = engine.chol_state(
            gp.kerns, gp.ops, xin, yin, l, kv, gv, alpha, jitter)
        yrev = self.yconrevs[0].rev
        yopt = float(getattr(self, "yopt", 0.0))
        conrevs = list(self.xconrevs)
        kerns, ops = gp.kerns, gp.ops

        def nlp(z):
            vals = rvpack.unpack(z)
            xrow = jnp.stack(
                [vals[f"x{k}"][0] for k in range(self.nx)])
            xc = jnp.stack(
                [conrevs[k].con(xrow[k]) for k in range(self.nx)]
            ).reshape(1, -1)
            mu, var = engine.predict_from_chol(
                kerns, ops, xin, L, v, xc, l, kv, gv, alpha)
            if method in ("eps-RS", "exploit"):
                y, _ = quad.gh_stats(yrev, mu, var)
                pot = y[0] if opt_type == "max" else -y[0]
            elif method == "explore":
                y, yv = quad.gh_stats(yrev, mu, var, normvar=normvar)
                pot = yv[0]
            elif method == "EI":
                ei, _ = quad.gh_stats(
                    yrev, mu, var, EI=True, EIopt=opt_type, yopt=yopt)
                pot = ei[0]
            else:
                raise Exception(
                    "method must be one of eps-RS ,EI, exploit, or explore")
            return -(pot + rvpack.log_prior(z))

        return rvpack, nlp

    def BO(self, opt_type="min", opt_method="predict", fit_method="map",
           max_iter=16, method="EI", eps=0.1, iwgp=False, cwgp=False,
           jitter=1e-6, conv=0.01, predict_samps=10000, normvar=True,
           refine=True, **kwargs):
        """Bayesian optimisation loop (reference gpmcmc.py:601-906).

        opt_method: 'predict' (LHC argmin of the acquisition, optionally
        refined by gradient ascent), 'DE' (on-device differential
        evolution), 'map' (gradient ascent from a random start), or
        'mcmc_map'/'mcmc_mean' (NUTS over the acquisition posterior).
        """
        from .inference import de as de_mod
        from .inference.lbfgs import minimize_lbfgs

        if self.ny > 1:
            raise Exception(
                "Bayesian minimisation only implemented for single output")
        if opt_type == "max":
            xoptf, yoptf = np.argmax, np.max
        elif opt_type == "min":
            xoptf, yoptf = np.argmin, np.min
        else:
            raise Exception(
                "Error: opt_type argument must be one of max or min")
        self.xopt = self.x[xoptf(self.y[:, 0]), :]
        self.yopt = yoptf(self.y)

        if self.verbose:
            print("Running Bayesian minimisation...")
            print(f"Current optima is {self.yopt} at x point {self.xopt}")
        if self.m is None:
            raise Exception(
                "Model must be fitted before running Bayesian optimisation")
        if method == "exploit":
            eps = 0.0

        lbs = np.array([float(p.ppf(1e-8)) for p in self.priors])
        ubs = np.array([float(p.isf(1e-8)) for p in self.priors])

        xsampold = np.array([[1e300 for _ in range(self.nx)]])
        for i in range(max_iter):
            if self.verbose:
                print(f"Iteration {i + 1}")
            xsamp = None

            if opt_method in ("DE", "predict"):
                roll = np.random.rand()
                if method != "eps-RS" or roll > eps:
                    on_device = self._is_zero_mean()
                    if on_device:
                        sargs, has_alpha, mixed = self._bo_state_args(jitter)
                        yopt_j = jnp.asarray(float(self.yopt))
                    if opt_method == "DE":
                        if not on_device:
                            from scipy.optimize import (
                                differential_evolution as scipy_de)

                            optf = self._acq_host(method, opt_type, normvar)
                            verb, self.verbose = self.verbose, False
                            res = scipy_de(
                                optf, list(zip(lbs, ubs)))
                            self.verbose = verb
                            xsamp = np.array([res.x])
                            fopt = res.fun
                        else:
                            run = self._get_bo_program(
                                "de", method, opt_type, normvar, has_alpha,
                                mixed)
                            xbest, fopt, _ = run(
                                jax.random.PRNGKey(
                                    np.random.randint(2**31 - 1)),
                                jnp.asarray(lbs), jnp.asarray(ubs),
                                *sargs, yopt_j)
                            xsamp = np.asarray(xbest)[None, :]
                        if self.verbose:
                            print(f"Function opt is {float(fopt):0.3f}")
                    else:
                        xsamps = self._LHC__latin_sample(predict_samps)
                        if on_device:
                            run = self._get_bo_program(
                                "batch", method, opt_type, normvar,
                                has_alpha, mixed)
                            ysamps = np.asarray(run(
                                jnp.asarray(xsamps), *sargs, yopt_j))
                        else:
                            ysamps = self._acq_host(
                                method, opt_type, normvar)(xsamps)
                        xsamp = np.array([xsamps[np.argmin(ysamps), :]])
                        if self.verbose:
                            print(f"Function opt is {np.min(ysamps):0.3f}")
                else:
                    xsamp = np.array(
                        [[float(p.rvs()) for p in self.priors]])

            if opt_method not in ("DE", "predict") or (
                opt_method == "predict" and refine
            ):
                roll = np.random.rand()
                if method != "eps-RS" or roll > eps:
                    if opt_method in ("map", "predict"):
                        sargs, has_alpha, mixed = self._bo_state_args(jitter)
                        run, rvpack = self._get_bo_program(
                            "refine", method, opt_type, normvar, has_alpha,
                            mixed)
                        if opt_method == "map":
                            z0 = jnp.asarray(
                                np.random.normal(size=rvpack.total))
                        else:
                            if self.verbose:
                                print(f"Refining {xsamp[0, :]}")
                            z0 = rvpack.pack_values({
                                f"x{k}": xsamp[0, k]
                                for k in range(self.nx)})
                        z, val = run(
                            z0, *sargs, jnp.asarray(float(self.yopt)))
                        vals = rvpack.unpack(z)
                        xsamp = np.array([[
                            float(np.asarray(vals[f"x{k}"])[0])
                            for k in range(self.nx)]])
                    elif opt_method in ("mcmc_map", "mcmc_mean"):
                        rvpack, nlp = self._refine_nlp(
                            method, opt_type, normvar, jitter)
                        from .inference import nuts as nuts_mod

                        data = nuts_mod.sample_rvpack(
                            rvpack, nlp, **kwargs)
                        mp = (
                            self.mean_extract(data)
                            if opt_method == "mcmc_mean"
                            else self.map_extract(data))
                        xsamp = np.array([[
                            float(np.asarray(mp[f"x{k}"]))
                            for k in range(self.nx)]])
                    else:
                        raise Exception(
                            "opt_method must be one of predict, DE, map, "
                            "mcmc_map, or mcmc_mean")
                elif xsamp is None:
                    xsamp = np.array(
                        [[float(p.rvs()) for p in self.priors]])

            # convergence on relative x change (gpmcmc.py:862-873)
            xdiff = np.sum(
                np.abs(xsamp - xsampold) / np.abs(xsampold)) / self.nx
            if xdiff < conv:
                if self.verbose:
                    print(
                        f"Convergence at relative tolerance {xdiff} achieved "
                        f"with point {xsamp}")
                break
            else:
                if self.verbose and i > 0:
                    print(f"Relative convergence in sample: {xdiff}")
                xsampold = xsamp

            ypred = self.predict(xsamp)
            if self.verbose:
                print(f"Predicted {ypred} at x point {xsamp}")

            # evaluate target + mean, append to datasets (gpmcmc.py:875-895)
            xsamp, ysamp = self._core__vector_solver(xsamp)
            xm, ym = self._core__vector_solver(xsamp, self.mean)
            self.x = np.r_[self.x, xsamp]
            self.y = np.r_[self.y, ysamp]
            self.xc = np.r_[self.xc, self.__xconrev__(xsamp)]
            self.yc = np.r_[self.yc, self.__yconrev__(ysamp - ym)]
            self.ym = np.r_[self.ym, ym]
            self.nsamp = len(self.x)

            if self.verbose:
                print(f"New sample is {ysamp + ym} at x point {xsamp}")

            self.xopt = self.x[xoptf(self.y[:, 0]), :]
            self.yopt = yoptf(self.y)

            # refit GP (warm start with cold fallback, gpmcmc.py:897-904)
            if fit_method == "map":
                try:
                    self.fit(method=fit_method, iwgp=iwgp, cwgp=cwgp,
                             start=self.hypers)
                except Exception:
                    self.fit(method=fit_method, iwgp=iwgp, cwgp=cwgp)
            else:
                self.fit(method=fit_method, iwgp=iwgp, cwgp=cwgp)

        return self.xopt, self.yopt

    # -- inverse Bayesian problem (gpmcmc.py:1039-1217) -------------------
    def inverse_opt(self, yobs, yvarobs=None, method="map",
                    evaluate_opt=False, jitter=1e-6, **kwargs):
        """Posterior over unknown inputs given observed outputs, via a joint
        GP over [training xc ; warped unknown x] with fixed fitted hypers.

        Returns (data, xopt) or (data, xopt, ysamp) when evaluate_opt.
        """
        from .inference.lbfgs import minimize_lbfgs
        from .inference.unconstrained import RVPack

        if self.m is None:
            raise Exception(
                "Model must be fitted before running Bayesian optimisation")
        if self.verbose:
            print("Running Bayesian inverse solver...")

        yobs = np.asarray(yobs, dtype=float).reshape(-1)
        nobs = len(yobs)
        rvpack = RVPack(tuple(self._prior_rv(k) for k in range(self.nx)))

        gp = self.gp
        l, kv, gv_, alpha = engine.hypers_to_args(self.hypers, gp.noise)
        xc = jnp.asarray(self.xc)
        kerns, ops = gp.kerns, gp.ops
        conrevs = list(self.xconrevs)

        # y vector and per-point noise variance (reference builds a noise
        # *std* vector and adds it unsquared, gpmcmc.py:1137-1158 — we add
        # variances, which is the correct GP algebra)
        yin = np.concatenate([
            self.yc[:, 0], np.asarray(self.yconrevs[0].con(yobs))])
        noise_var = np.zeros(self.nsamp + nobs)
        if self.noise:
            noise_var[: self.nsamp] = float(np.asarray(self.hypers["gv"]))
        if yvarobs is not None:
            yvarobs = np.asarray(yvarobs, dtype=float).reshape(-1)
            noise_var[self.nsamp :] = np.asarray(
                quad.gh_var_inv(self.yconrevs[0].con, yobs, yvarobs))
        noise_var = noise_var + jitter

        # warping-Jacobian term (constant in x, kept for logp parity)
        yfull = np.r_[self.y[:, 0], yobs]
        yder = np.asarray(self.yconrevs[0].der(yfull))
        ldj = float(np.sum(np.log(yder)))

        yin_j = jnp.asarray(yin)
        nv_j = jnp.asarray(noise_var)
        ntot = self.nsamp + nobs

        def nlp(z):
            vals = rvpack.unpack(z)
            xrow = jnp.stack([vals[f"x{k}"][0] for k in range(self.nx)])
            xcrow = jnp.stack(
                [conrevs[k].con(xrow[k]) for k in range(self.nx)])
            xin = jnp.concatenate(
                [xc, jnp.tile(xcrow, (nobs, 1))], axis=0)
            K = kernels.gram(kerns, ops, xin, None, l, kv, alpha)
            K = K + jnp.diag(nv_j)
            logl = engine.chol_nlml(K, yin_j) + ldj
            return -(logl + rvpack.log_prior(z))

        if method == "map":
            z0 = jnp.asarray(np.random.normal(size=rvpack.total))
            z, val, gnorm, _ = minimize_lbfgs(nlp, z0)
            vals = rvpack.unpack(z)
            mp = {f"x{k}": np.asarray(vals[f"x{k}"])[0]
                  for k in range(self.nx)}
            data = None
            if self.verbose:
                print(f"MAP logp: {-float(val)}")
        elif method in ("mcmc_mean", "mcmc_map"):
            from .inference import nuts as nuts_mod

            data = nuts_mod.sample_rvpack(rvpack, nlp, **kwargs)
            if method == "mcmc_mean":
                mp = self.mean_extract(data)
            else:
                mp = self.map_extract(data)
        else:
            raise Exception(
                "method must be one of map, mcmc_map, or mcmc_mean")

        xopt = np.zeros((1, self.nx))
        for j in range(self.nx):
            xopt[0, j] = float(np.asarray(mp[f"x{j}"]))

        ypred = self.predict(xopt)
        if self.verbose:
            print(f"Predicted {ypred} at x point {xopt}")

        if evaluate_opt:
            xsamp, ysamp = self._core__vector_solver(xopt)
            xm, ym = self._core__vector_solver(xopt, self.mean)
            self.x = np.r_[self.x, xsamp]
            self.y = np.r_[self.y, ysamp]
            self.xc = np.r_[self.xc, self.__xconrev__(xsamp)]
            self.yc = np.r_[self.yc, self.__yconrev__(ysamp - ym)]
            self.ym = np.r_[self.ym, ym]
            self.nsamp = len(self.x)
            if self.verbose:
                print(
                    f"Actual evaluation is {ysamp + ym} at x point {xsamp}")
            return data, xopt[0, :], ysamp[0]
        return data, xopt[0, :]

    # -- conversion shortcuts (gpmcmc.py:909-929) -------------------------
    def __yconrev__(self, yin, mode="con"):
        return _apply_conrevs(self.yconrevs, yin, mode)

    def __xconrev__(self, xin, mode="con"):
        return _apply_conrevs(self.xconrevs, xin, mode)


# ---------------------------------------------------------------------------
# module helpers
# ---------------------------------------------------------------------------

def _transform_content_key(cr, depth: int = 6):
    """Hashable content key for a transform object: type plus parameter
    state (recursing into nested stages/distributions), so BO program
    caching survives refits that rebuild transform objects with identical
    parameters and never aliases different ones.  State that cannot be
    content-hashed within the depth budget falls back to id(), which at
    worst costs a retrace — never a wrong program."""
    if isinstance(cr, (int, float, str, bool, type(None))):
        return cr
    if isinstance(cr, (list, tuple)):
        if depth <= 0:
            return id(cr)
        return tuple(_transform_content_key(v, depth - 1) for v in cr)
    if hasattr(cr, "shape"):
        a = np.asarray(cr)
        return (a.shape, a.dtype.str, a.tobytes())
    import types

    if isinstance(cr, (types.FunctionType, types.MethodType,
                       types.BuiltinFunctionType)):
        return id(cr)
    state = getattr(cr, "__dict__", None)
    if depth > 0 and isinstance(state, dict):
        return (type(cr).__qualname__,) + tuple(
            (k, _transform_content_key(state[k], depth - 1))
            for k in sorted(state))
    return id(cr)


def _apply_conrevs(conrevs, arr, mode):
    """Column-wise convert ('con') or revert ('rev') through a conrev list."""
    if mode not in ("con", "rev"):
        raise Exception("Error: Mode must be one of con or rev")
    return np.column_stack([
        np.asarray(getattr(cr, mode)(arr[:, i]), dtype=np.float64)
        for i, cr in enumerate(conrevs)])


def _regression_metrics(ypred, ytrue, ybar):
    """Held-out fit metrics: RMSE, MAE, mean percentage error, R^2
    (the quantities reference test_plots reports, gpmcmc.py:967-976)."""
    err = ypred - ytrue
    return {
        "rmse": float(np.sqrt(np.mean(err ** 2))),
        "mae": float(np.mean(np.abs(err))),
        "mpe": float(np.mean(np.abs(err) / np.abs(ytrue))),
        "r2": 1.0 - float(np.sum(err ** 2)) / float(
            np.sum((ytrue - ybar) ** 2)),
    }


def _gp_scatter_plot(xvals, ytrue, ypred, yvars, *, logscale, errorbars,
                     truth_style, truth_label, points_fmt, log_x,
                     xlabel, ylabel, title=None, savefig=None):
    """One GP-vs-truth scatter panel: truth overlay, then predictions as
    log-log points, error bars, or plain markers."""
    import matplotlib.pyplot as plt

    if title is not None and savefig is None:
        plt.title(title)
    plt.plot(xvals, ytrue, truth_style, label=truth_label)
    if logscale:
        plt.plot(xvals, ypred, "o", label="GP")
        if log_x:
            plt.xscale("log")
        plt.yscale("log")
    elif errorbars:
        plt.errorbar(xvals, ypred, fmt="o", yerr=np.sqrt(yvars),
                     label="GP", capsize=3)
    else:
        plt.plot(xvals, ypred, points_fmt, label="GP")
    plt.xlabel(xlabel)
    plt.ylabel(ylabel)
    plt.legend()
    if savefig is not None:
        plt.tight_layout()
        plt.savefig(savefig, bbox_inches="tight")
    plt.show()
