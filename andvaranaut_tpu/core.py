"""Target-function execution engine and persistence.

TPU-native rebuild of reference core.py: the dask.distributed client
(core.py:105-134) becomes a host-side ``concurrent.futures`` process pool —
target functions are arbitrary user Python / external codes and stay on CPU
(SURVEY.md §2.6).  Results are returned in **submission order** (the reference
appends in completion-scan order, core.py:120-132, which silently misaligns
x/y rows — a bug we fix).  Per-sample scratch directories (``rundir/task{i}``),
per-sample failure capture, NaN/inf scrubbing, and the wall-time UX are kept.

Persistence: cloudpickle whole-object save/load (core.py:21-27) and netCDF
x/y data files (core.py:30-50), written with netCDF4 when available and
scipy.io.netcdf_file (NetCDF3) otherwise.
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor, wait, FIRST_COMPLETED
from time import time as stopwatch

import cloudpickle
import numpy as np

from . import dists

__all__ = ["save_object", "load_object", "save_xy", "load_xy", "_core"]


# ---------------------------------------------------------------------------
# Persistence
# ---------------------------------------------------------------------------

def save_object(obj, fname):
    """Pickle a whole instance (datasets, transforms, fitted state) with
    cloudpickle — reference core.py:21-23."""
    with open(fname, "wb") as f:
        cloudpickle.dump(obj, f)


def load_object(fname):
    with open(fname, "rb") as f:
        return cloudpickle.load(f)


def _netcdf_backend():
    try:
        import netCDF4  # noqa: F401

        return "netCDF4"
    except ImportError:
        return "scipy"


def save_xy(x, y=None, fname="savexy.nc"):
    """Save 1-D x (and optionally y) arrays to netCDF — reference
    core.py:30-38 (same dimension/variable names for interchange)."""
    x = np.asarray(x)
    if _netcdf_backend() == "netCDF4":
        from netCDF4 import Dataset

        f = Dataset(fname, "w")
        f.createDimension("n", len(x))
        xdat = f.createVariable("x", "f8", ("n",))
        if y is not None:
            ydat = f.createVariable("y", "f8", ("n",))
            ydat[:] = np.asarray(y)
        xdat[:] = x
        f.close()
    else:
        from scipy.io import netcdf_file

        f = netcdf_file(fname, "w")
        f.createDimension("n", len(x))
        xdat = f.createVariable("x", "d", ("n",))
        xdat[:] = x
        if y is not None:
            ydat = f.createVariable("y", "d", ("n",))
            ydat[:] = np.asarray(y)
        f.close()


def load_xy(fname, xonly=False):
    """Load netCDF x(,y) data — reference core.py:41-50."""
    if _netcdf_backend() == "netCDF4":
        from netCDF4 import Dataset

        f = Dataset(fname, "r")
        x = np.array(f.variables["x"][:])
        y = None if xonly else np.array(f.variables["y"][:])
        f.close()
    else:
        from scipy.io import netcdf_file

        f = netcdf_file(fname, "r")
        x = np.array(f.variables["x"][:])
        y = None if xonly else np.array(f.variables["y"][:])
        f.close()
    return x if xonly else (x, y)


# ---------------------------------------------------------------------------
# Process-pool target evaluation
# ---------------------------------------------------------------------------

def _parallel_wrap(payload, rundir, inp, idx):
    """Worker-side task: run the target inside its scratch dir
    (reference core.py:249-256)."""
    fn = cloudpickle.loads(payload)
    d = os.path.join(rundir, f"task{idx}")
    os.makedirs(d, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(d)
    try:
        return fn(inp)
    finally:
        os.chdir(cwd)


# ---------------------------------------------------------------------------
# Core class
# ---------------------------------------------------------------------------

class _core:
    """Execution core every public class inherits (reference core.py:53-246).

    Accepts both scipy.stats frozen priors and andvaranaut_tpu.dists
    distributions; priors are normalised to JAX-native dists internally.
    """

    def __init__(self, nx, ny, priors, target, parallel=False, nproc=1,
                 constraints=None, rundir=None, verbose=True, pulse=1):
        if (not isinstance(nx, int)) or nx < 1:
            raise Exception(
                "Error: must specify an integer number of input dimensions > 0")
        if (not isinstance(ny, int)) or ny < 1:
            raise Exception(
                "Error: must specify an integer number of output dimensions > 0")
        if (not isinstance(priors, list)) or len(priors) != nx:
            raise Exception(
                "Error: must provide list of univariate priors of length nx")
        if not all(dists.is_distribution_like(p) for p in priors):
            raise Exception(
                "Error: priors must be scipy.stats frozen distributions or "
                "andvaranaut_tpu.dists distributions")
        if not callable(target):
            raise Exception(
                "Error: must provide target function which produces output "
                "from specified inputs")
        if not isinstance(parallel, bool):
            raise Exception("Error: parallel must be type bool.")
        if not isinstance(nproc, int) or nproc < 1:
            raise Exception("Error: nproc argument must be an integer > 0")
        if nproc > (os.cpu_count() or 1):
            # The reference rejects this outright (core.py:77-78); we allow
            # oversubscription (IO-bound targets benefit) with a warning.
            import warnings

            warnings.warn(
                "nproc exceeds available processors; oversubscribing.")
        keys = ["constraints", "lower_bounds", "upper_bounds"]
        if constraints is not None:
            if not isinstance(constraints, dict) or not all(
                k in constraints for k in keys
            ):
                raise Exception(
                    f"Error: provided constraints must be a dictionary with "
                    f"keys {keys} and list items.")

        self.nx = nx
        self.ny = ny
        self.priors = [dists.from_prior(p) for p in priors]
        self.target = target
        self.parallel = parallel
        self.nproc = nproc
        self.pulse = pulse
        self.constraints = constraints
        self.verbose = verbose
        self.rundir = rundir if rundir is not None else "runs"
        self.nsamp = 0
        # monotonic scratch-dir counter: unlike the reference (which keys
        # task dirs on nsamp and so reuses them across BO target/mean
        # evaluations within one iteration, ref gpmcmc.py:908-909), every
        # __vector_solver call gets fresh task{i} directories
        self._task_counter = 0

    def _next_task_ids(self, n):
        """Reserve n fresh task-directory indices (monotonic across every
        evaluation in this object's lifetime; unpickled pre-counter objects
        resume from nsamp)."""
        base = getattr(self, "_task_counter", None)
        if base is None:
            base = self.nsamp
        self._task_counter = base + n
        return base

    # -- parallel path ---------------------------------------------------
    def __parallel_runs(self, inps, fun, task_base):
        payload = cloudpickle.dumps(fun)
        l = len(inps)
        results = [None] * l
        fails = []
        # spawn: forking a process that has initialised JAX/XLA threads can
        # deadlock the child.
        import multiprocessing

        ctx = multiprocessing.get_context("spawn")
        with ProcessPoolExecutor(max_workers=self.nproc, mp_context=ctx) as pool:
            futmap = {
                pool.submit(
                    _parallel_wrap, payload, self.rundir, inps[i],
                    i + task_base,
                ): i
                for i in range(l)
            }
            pending = set(futmap)
            while pending:
                done, pending = wait(
                    pending, timeout=self.pulse, return_when=FIRST_COMPLETED)
                for fut in done:
                    i = futmap[fut]
                    try:
                        results[i] = np.asarray(fut.result())
                    except Exception:
                        fails.append(i)
        # Submission-order assembly (fixes reference completion-order bug,
        # core.py:120-132).
        fails = np.array(sorted(fails), dtype=np.intc)
        mask = np.ones(l, dtype=bool)
        mask[fails] = False
        kept = [results[i] for i in range(l) if mask[i]]
        outs = (
            np.stack(kept).reshape(len(kept), -1)
            if kept else np.empty((0, self.ny))
        )
        return outs, fails

    # -- main evaluation loop -------------------------------------------
    def __vector_solver(self, xsamps, fun=None):
        if fun is None:
            fun = self.target
        t0 = stopwatch()
        n_samples = len(xsamps)
        os.makedirs(self.rundir, exist_ok=True)
        task_base = self._next_task_ids(n_samples)

        if self.parallel:
            ysamps, fails = self.__parallel_runs(xsamps, fun, task_base)
            if len(ysamps) and ysamps.shape[1] != self.ny:
                raise AssertionError(
                    "Specified ny does not match function output")
            for i in fails:
                print(
                    f"Warning: Target function evaluation failed at sample "
                    f"{i} with x values: {xsamps[i, :]}")
            mask = np.ones(n_samples, dtype=bool)
            mask[fails] = False
            xsamps = xsamps[mask]
        else:
            if self.verbose:
                from tqdm import trange as rangef
            else:
                rangef = range
            ysamps = np.empty((0, self.ny))
            fails = np.empty(0, dtype=np.intc)
            cwd = os.getcwd()
            for i in rangef(n_samples):
                d = os.path.join(self.rundir, f"task{i + task_base}")
                os.makedirs(d, exist_ok=True)
                os.chdir(d)
                try:
                    yout = fun(xsamps[i, :])
                except Exception as e:
                    print(
                        f"Warning: Target function evaluation failed at "
                        f"sample {i} with x values: {xsamps[i, :]}; error "
                        f"message: {e}")
                    fails = np.append(fails, i)
                    os.chdir(cwd)
                    continue
                os.chdir(cwd)
                try:
                    ysamps = np.vstack((ysamps, yout))
                except Exception:
                    raise Exception(
                        "Error: number of target function outputs is not "
                        "equal to ny")
            mask = np.ones(n_samples, dtype=bool)
            mask[fails] = False
            xsamps = xsamps[mask]
        t1 = stopwatch()

        # NaN/inf scrub (reference core.py:198-208).
        fails = np.empty(0, dtype=np.intc)
        for i, j in enumerate(ysamps):
            if np.any(np.isnan(j)) or np.any(np.abs(j) == np.inf):
                fails = np.append(fails, i)
                print(
                    f"Warning: Target function evaluation returned inf/nan "
                    f"at sample with x values: {xsamps[i, :]}\n"
                    "Check range of input values valid.")
        mask = np.ones(len(xsamps), dtype=bool)
        mask[fails] = False
        xsamps = xsamps[mask]
        ysamps = ysamps[mask]

        from . import timing

        timing.record("vector_solver", t1 - t0)
        if self.verbose:
            print()
            print(f"Time taken: {t1 - t0:0.2f} s")

        return xsamps, ysamps

    # -- constraint filtering -------------------------------------------
    def __check_constraints(self, xsamps):
        nsamps0 = len(xsamps)
        mask = np.ones(nsamps0, dtype=bool)
        for i, x in enumerate(xsamps):
            for e, f in enumerate(self.constraints["constraints"]):
                flag = True
                res = f(x)
                lower_bounds = self.constraints["lower_bounds"][e]
                upper_bounds = self.constraints["upper_bounds"][e]
                if isinstance(lower_bounds, list):
                    for k, l in enumerate(lower_bounds):
                        if res[k] < l:
                            flag = False
                    for k, u in enumerate(upper_bounds):
                        if res[k] > u:
                            flag = False
                else:
                    if res < lower_bounds or res > upper_bounds:
                        flag = False
                mask[i] = flag
                if not flag:
                    print(
                        f"Sample {i + 1} with x values {x} removed due to "
                        f"invalidating constraint {e + 1}.")
        xsamps = xsamps[mask]
        if len(xsamps) < nsamps0:
            print(
                f"{nsamps0 - len(xsamps)} samples removed due to violating "
                "constraints.")
        return xsamps
