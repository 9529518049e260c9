#!/usr/bin/env python
"""16k on-chip GP MCMC via HOST-DRIVEN HMC (inference/host_hmc.py).

Every compiled MCMC transition program faults the axon worker at
n=16384 (docs/TPU_NOTES.md round 3: jittered HMC crashed at
steps_per_call=2 AND 1).  The host sampler sidesteps the fault class
entirely: each leapfrog is one independent launch of the jitted
value+grad — the MAP program class, stable for hours (~100 launches
per L-BFGS fit).  Per-launch overhead ~30 ms vs the ~1.45 s 16k
value+grad: ~2%.

Same synthetic problem as bench.py / map16k.py.  Defaults are a short
demonstration run (budget-8 trajectories); scale MCMC_TUNE/MCMC_DRAWS
up for production posteriors.

Usage: nohup python benchmarks/mcmc16k_host.py > /tmp/mcmc16k.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = int(os.environ.get("MCMC_N", 16384))
BLOCK = int(os.environ.get("MCMC_BLOCK", 1024))
TUNE = int(os.environ.get("MCMC_TUNE", 6))
DRAWS = int(os.environ.get("MCMC_DRAWS", 6))
BUDGET = int(os.environ.get("MCMC_BUDGET", 8))
CHAINS = int(os.environ.get("MCMC_CHAINS", 1))  # >=2 enables ChEES
#: "map" = start chains at the best recorded 16k MAP optimum (logpost
#: 51935.52, docs/TPU_NOTES.md round 4) instead of the prior default —
#: warmup then tunes eps/mass on the posterior bulk from transition 1
#: rather than spending itself on the transit (the measured budget-32
#: accept collapse).  Or "gv,l1,l2,kv" comma floats (constrained).
START = os.environ.get("MCMC_START", "")
#: 1 = fix the mass matrix to the finite-difference curvature at the
#: start point (host_hmc.map_diag_inv_mass; 2*dim extra launches) and
#: disable Welford adaptation — for MAP starts, where the Welford
#: window is the measured budget-16 accept collapse.  NOTE: at 16k the
#: mixed-precision gradient noise limits the FD curvature (measured
#: 10-60x variance overestimates + one unresolvable dim); prefer
#: MCMC_MASS from a pilot run's draws.
HESS_MASS = int(os.environ.get("MCMC_HESS_MASS", "0"))
#: comma-separated per-dim inv_mass (positional variances) — e.g. the
#: empirical draw variances of a short pilot run (MCMC_DRAWS_LOG gives
#: the draws; np.var over column 3: is the estimate).  Fixes the mass
#: (adapt_mass=False).  Takes precedence over MCMC_HESS_MASS.
MASS = os.environ.get("MCMC_MASS", "")
JITTER = float(os.environ.get("MCMC_JITTER", "1.0"))
#: '' = auto gate (chains>=2 AND warmup>=100 AND budget>=16);
#: 1/0 force ChEES trajectory adaptation on/off (chains>=2 required)
TLEN = os.environ.get("MCMC_TLEN", "")
#: > 0 = two-stage pilot-mass schedule (host_hmc pilot=)
PILOT = int(os.environ.get("MCMC_PILOT", "0"))
#: > 0 = parallel tempering: this many EXTRA hot lanes on a geometric
#: inverse-temperature ladder down to MCMC_BETA_MIN ride in the same
#: batched launch; free host-side replica-exchange swaps feed the
#: CHAINS cold chains — the between-chain mixing lever for the
#: measured ~5-nat-wide 16k posterior basin (docs/TPU_NOTES.md r5).
TEMPER = int(os.environ.get("MCMC_TEMPER", "0"))
BETA_MIN = float(os.environ.get("MCMC_BETA_MIN", "0.25"))


def make_data(n, nx=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(size=(n, nx))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.01 * rng.normal(size=n)
    return X, y


def main():
    import jax
    import jax.numpy as jnp

    from andvaranaut_tpu.gp import bigfit
    from andvaranaut_tpu.inference import host_hmc

    X, y = make_data(N)
    rvpack, nlp = bigfit.make_mixed_objective(
        jnp.asarray(X), jnp.asarray(y), kerns=("RBF",), noise=True,
        jitter=1e-6, block=BLOCK)
    u_vg = jax.jit(jax.value_and_grad(nlp))

    if START == "map":
        start_vals = {"gv": 1.011e-4, "l": [0.931, 1.817], "kv": 6.04}
        z0 = np.asarray(rvpack.pack_values(start_vals))
        print(f"starting at the recorded MAP optimum: {start_vals}",
              flush=True)
    elif START:
        v = [float(s) for s in START.split(",")]
        z0 = np.asarray(rvpack.pack_values(
            {"gv": v[0], "l": v[1:-1], "kv": v[-1]}))
        print(f"starting at {v}", flush=True)
    else:
        z0 = np.asarray(rvpack.z0())
    betas = None
    lanes = CHAINS
    if TEMPER:
        betas = np.concatenate([
            np.ones(CHAINS),
            BETA_MIN ** (np.arange(1, TEMPER + 1) / TEMPER)])
        lanes = CHAINS + TEMPER
        print(f"tempering: {CHAINS} cold + {TEMPER} hot lanes, "
              f"betas {np.array2string(betas, precision=3)}",
              flush=True)
    vec_active = (lanes >= 2
                  and os.environ.get("MCMC_VEC", "map") != "0")
    if not vec_active:
        # the serial program only compiles when it will actually run
        # (batched runs never call it: ~80 s compile saved at 16k)
        t0 = time.time()
        u0, g0 = u_vg(jnp.asarray(z0))
        print(f"compile+first eval {time.time() - t0:.1f}s, "
              f"U0={float(u0):.2f}", flush=True)

    nevals = [0]
    t_evals = [0.0]

    def vg(z):
        t = time.time()
        u, g = u_vg(jnp.asarray(z))
        u = float(u)
        g = np.asarray(g)
        t_evals[0] += time.time() - t
        nevals[0] += 1
        return u, g

    # lockstep batched chains: ONE launch advances all chains a
    # leapfrog (host_hmc vec_eval).  MCMC_VEC: 'map' (default —
    # lax.map over the chain axis; jax.vmap of the 16k program DIES IN
    # THE REMOTE COMPILER, measured round 5, while vmap is fine at
    # n <= 8192), 'vmap', or '0' for serial chains.
    vec_mode = os.environ.get("MCMC_VEC", "map")
    vec_fn = None
    if TEMPER and vec_mode == "0":
        raise SystemExit("MCMC_TEMPER requires the batched route "
                         "(MCMC_VEC map or vmap)")
    if lanes >= 2 and vec_mode != "0":
        vg_one = jax.value_and_grad(nlp)
        if vec_mode == "vmap":
            vec_vg = jax.jit(jax.vmap(vg_one))
        else:
            vec_vg = jax.jit(lambda Z: jax.lax.map(vg_one, Z))

        def vec_fn(Z):
            t = time.time()
            us, gs = vec_vg(jnp.asarray(Z))
            us = np.asarray(us)
            gs = np.asarray(gs)
            t_evals[0] += time.time() - t
            nevals[0] += 1
            return us, gs

        t0 = time.time()
        us0, _ = vec_fn(np.broadcast_to(z0, (lanes, z0.size)).copy())
        nevals[0] = 0
        t_evals[0] = 0.0
        print(f"batched C={lanes} compile+first eval "
              f"{time.time() - t0:.1f}s, U0={us0[0]:.2f}", flush=True)

    def progress(c, t, phase):
        print(f"chain {c} transition {t} ({phase}), "
              f"{nevals[0]} evals, {t_evals[0]:.0f}s eval time",
              flush=True)

    draws_log = os.environ.get("MCMC_DRAWS_LOG")

    def dump(c, i, z, lp):
        # incremental persistence: a wedged remote runtime otherwise
        # loses the whole run (draws only return at the end)
        if draws_log:
            with open(draws_log, "a") as f:
                f.write(f"{c} {i} {lp:.6f} "
                        + " ".join(f"{v:.10g}" for v in z) + "\n")

    inv_mass0 = None
    mass_log = os.environ.get("MCMC_MASS_LOG", "")
    if mass_log:
        # DENSE mass from a previous run's draws log (cols 3: are z):
        # captures the correlation directions the diagonal MCMC_MASS
        # cannot (the measured ~3.4x residual condition at 16k).
        # MCMC_MASS_WITHIN=1 centres each chain before pooling — the
        # pooled covariance of UNMIXED chains is inflated 1.5-2.4x by
        # between-chain spread (measured round 5), and an oversized
        # mass overshoots (conservative-small is the safe direction)
        rows = np.loadtxt(mass_log)
        zpilot = rows[:, 3:]
        if os.environ.get("MCMC_MASS_WITHIN", "0") == "1":
            for c in np.unique(rows[:, 0]):
                sel = rows[:, 0] == c
                zpilot[sel] -= zpilot[sel].mean(axis=0)
        inv_mass0 = host_hmc.draws_dense_mass(zpilot)
        print(f"dense pilot mass from {mass_log} "
              f"({zpilot.shape[0]} draws, within="
              f"{os.environ.get('MCMC_MASS_WITHIN', '0')}):\n"
              f"{inv_mass0.cov}", flush=True)
    elif MASS:
        inv_mass0 = np.asarray([float(s) for s in MASS.split(",")])
        print(f"pilot inv_mass: {inv_mass0}", flush=True)
    elif HESS_MASS:
        if vec_fn is not None:
            # probe through the batched program — the serial program
            # then never compiles (~80 s saved)
            inv_mass0 = host_hmc.map_diag_inv_mass_batched(
                vec_fn, z0, lanes)
        else:
            inv_mass0 = host_hmc.map_diag_inv_mass(vg, z0)
        print(f"curvature inv_mass at start: {inv_mass0}", flush=True)

    t0 = time.time()
    res = host_hmc.hmc_host_sample(
        vg, z0, num_warmup=TUNE, num_samples=DRAWS, num_chains=lanes,
        budget=BUDGET, seed=0, callback=progress, on_draw=dump,
        jitter_init=JITTER, inv_mass0=inv_mass0,
        adapt_mass=inv_mass0 is None, vec_eval=vec_fn,
        adapt_tlen=None if TLEN == "" else bool(int(TLEN)),
        pilot=PILOT, betas=betas)
    wall = time.time() - t0
    lp = res["lp"][0]
    kind = "batched launches" if vec_fn is not None else "evals"
    print(f"16k host-HMC: {CHAINS} chain(s) x {TUNE}+{DRAWS} "
          f"transitions, budget {BUDGET}, "
          f"{wall:.1f}s sampling wall, {nevals[0]} {kind} "
          f"({t_evals[0] / max(nevals[0], 1):.2f}s each), "
          f"accept {res['accept'].mean():.2f}, "
          f"{int(res['diverging'].sum())} divergences", flush=True)
    if TEMPER:
        print("ladder swap accept:",
              np.array2string(res["swap_accept"], precision=2),
              flush=True)
    print("lp draws (chain 0):", np.array2string(lp, precision=2),
          flush=True)
    means = {k: np.asarray(v).mean(axis=(0, 1))
             for k, v in _posterior(rvpack, res).items()}
    print("posterior means:", means, flush=True)
    if DRAWS >= 8:
        from andvaranaut_tpu.inference import nuts

        z = res["z"]  # (chains, draws, dim)
        ess = np.asarray([float(nuts.ess_bulk(z[..., i]))
                          for i in range(z.shape[-1])])
        print(f"min ESS {ess.min():.1f} of {CHAINS}x{DRAWS} draws "
              f"({ess.min() / wall:.4f} ESS/s sampling wall)",
              flush=True)
        if CHAINS >= 2:
            rh = np.asarray([float(nuts.split_rhat(z[..., i]))
                             for i in range(z.shape[-1])])
            print(f"max split-rhat {rh.max():.4f}", flush=True)


def _posterior(rvpack, res):
    import jax.numpy as jnp

    zdraws = np.asarray(res["z"])
    out = {}
    for rv, off in zip(rvpack.rvs, rvpack.offsets):
        block = zdraws[..., off : off + rv.size]
        vals = np.asarray(rv.forward(jnp.asarray(block)))
        out[rv.name] = vals[..., 0] if rv.size == 1 else vals
    return out


if __name__ == "__main__":
    main()
