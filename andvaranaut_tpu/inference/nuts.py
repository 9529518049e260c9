"""On-device multi-chain No-U-Turn Sampler.

Replaces pm.sample's multiprocess NUTS chains (reference gpmcmc.py:351, 842,
1175) with a fully jitted sampler: iterative tree building under
lax.while_loop (checkpoint-stack U-turn detection, so max_treedepth=10 costs
an O(depth) stack rather than an O(2^depth) unrolled graph), multinomial
leaf sampling with biased progressive doubling, dual-averaging step-size
adaptation and Welford diagonal mass adaptation.  Chains are vmapped and
sharded across the device mesh — 64-chain hyperparameter posteriors are one
compiled program (BASELINE.json north star).

Samples over the unconstrained vector z of an
``inference.unconstrained.RVPack``; constrained draws are unpacked
post-hoc.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_MAX_DELTA_ENERGY = 1000.0

import os as _os


class _DAState(NamedTuple):
    """Dual-averaging state (Hoffman & Gelman 2014, §3.2)."""

    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    mu: jnp.ndarray
    t: jnp.ndarray


def _da_init(eps0):
    return _DAState(
        log_eps=jnp.log(eps0),
        log_eps_bar=jnp.zeros_like(eps0),
        h_bar=jnp.zeros_like(eps0),
        mu=jnp.log(10.0 * eps0),
        t=jnp.zeros_like(eps0),
    )


def _da_update(state: _DAState, accept_prob, target):
    gamma, t0, kappa = 0.05, 10.0, 0.75
    t = state.t + 1.0
    w = 1.0 / (t + t0)
    h_bar = (1.0 - w) * state.h_bar + w * (target - accept_prob)
    log_eps = state.mu - jnp.sqrt(t) / gamma * h_bar
    wt = t ** (-kappa)
    log_eps_bar = wt * log_eps + (1.0 - wt) * state.log_eps_bar
    return _DAState(log_eps, log_eps_bar, h_bar, state.mu, t)


def _da_adam_init(eps0):
    """ADAM step-size state (ChEES-HMC style), packed into _DAState:
    h_bar -> first moment, mu -> second moment, t -> step count."""
    return _DAState(
        log_eps=jnp.log(eps0),
        log_eps_bar=jnp.zeros_like(eps0),
        h_bar=jnp.zeros_like(eps0),
        mu=jnp.zeros_like(eps0),
        t=jnp.zeros_like(eps0),
    )


def _da_adam_update(state: _DAState, accept_prob, target):
    """Bounded ADAM ascent on log_eps toward the target acceptance
    (Hoffman, Radul & Sountsov 2021 adapt step size this way).

    Nesterov dual averaging multiplies the RUNNING MEAN acceptance
    excess by sqrt(t)/gamma (~155 nats at t=60): a run of ~0
    acceptances mid-warmup (a posterior funnel neck) drives log_eps
    down by tens of nats and the recovery needs hundreds of
    transitions a short warmup does not have — measured on the n=256
    GP hyperposterior on TPU: one chain froze at eps=2e-16 and min ESS
    collapsed to 1 (docs/TPU_NOTES.md).  ADAM's per-transition step is
    bounded by lr (~0.05 nats), so the collapse state is not
    absorbing; recovery is symmetric at the same rate."""
    # b2=0.95 (short second-moment memory): after a rejection run flips
    # to accepts, a long-memory v keeps the step normalised against the
    # big |g|=0.8 rejection gradients and recovery crawls at ~lr/4
    b1, b2, lr, kappa = 0.9, 0.95, 0.05, 0.75
    t = state.t + 1.0
    g = accept_prob - target  # ascent: accept too high -> grow eps
    m = b1 * state.h_bar + (1.0 - b1) * g
    v = b2 * state.mu + (1.0 - b2) * g * g
    mhat = m / (1.0 - b1 ** t)
    vhat = v / (1.0 - b2 ** t)
    log_eps = state.log_eps + lr * mhat / (jnp.sqrt(vhat) + 1e-8)
    wt = t ** (-kappa)
    log_eps_bar = wt * log_eps + (1.0 - wt) * state.log_eps_bar
    return _DAState(log_eps, log_eps_bar, m, v, t)


def _leapfrog(z, r, grad, eps, inv_mass, U_and_grad):
    """One leapfrog step; grad is dU/dz at z (cached)."""
    r = r - 0.5 * eps * grad
    z = z + eps * inv_mass * r
    U, grad = U_and_grad(z)
    r = r - 0.5 * eps * grad
    return z, r, U, grad


def _kinetic(r, inv_mass):
    return 0.5 * jnp.sum(inv_mass * r * r)


def _trailing_ones(i):
    u = i + 1
    lowbit = u & (-u)
    return jax.lax.population_count(lowbit - 1)


def _uturn(r_sum, r_first, r_last, inv_mass):
    v = inv_mass * r_sum
    return (jnp.dot(v, r_first) <= 0.0) | (jnp.dot(v, r_last) <= 0.0)


def _build_subtree(key, depth, z0, r0, U0, grad0, direction, eps, inv_mass,
                   H0, U_and_grad, max_treedepth):
    """Iteratively build a balanced subtree of 2^depth leaves extending from
    (z0, r0) in `direction`.

    Checkpoint scheme: leaf i (0-based) even -> store (r_i, S_before_i) at
    slot popcount(i); at odd i with t trailing ones, the completed level-k
    subtrees (k=1..t) are checked against slots popcount(i)-k.

    Returns dict with endpoint state, momentum sum, proposal, log weight,
    accept-stat sum, and turning/diverging flags.
    """
    dim = z0.shape[0]
    num_leaves = jnp.asarray(2, jnp.int32) ** depth
    seps = direction * eps

    def cond(c):
        return (c["i"] < num_leaves) & (~c["turning"]) & (~c["diverging"])

    def body(c):
        key = c["key"]
        key, ksel = jax.random.split(key)
        z, r, U, grad = _leapfrog(
            c["z"], c["r"], c["grad"], seps, inv_mass, U_and_grad)
        H = U + _kinetic(r, inv_mass)
        H = jnp.where(jnp.isnan(H), jnp.inf, H)
        diverging = (H - H0) > _MAX_DELTA_ENERGY
        lw_leaf = H0 - H  # log multinomial weight

        i = c["i"]
        # store checkpoint at even leaves
        is_even = (i % 2) == 0
        slot = jax.lax.population_count(i)
        r_ck = jnp.where(
            is_even, c["r_ckpts"].at[slot].set(r), c["r_ckpts"])
        s_ck = jnp.where(
            is_even, c["s_ckpts"].at[slot].set(c["S"]), c["s_ckpts"])

        S = c["S"] + r

        # U-turn checks for completed subtrees ending at odd i
        t = _trailing_ones(i)
        pc = jax.lax.population_count(i)

        def check(k, turning):
            do = k <= t
            ck = pc - k
            ck = jnp.clip(ck, 0, max_treedepth)
            r_first = r_ck[ck]
            r_sum_k = S - s_ck[ck]
            return turning | (do & _uturn(r_sum_k, r_first, r, inv_mass))

        turning = jax.lax.fori_loop(
            1, max_treedepth + 1, check, jnp.asarray(False))

        # multinomial proposal update within subtree
        lw_new = jnp.logaddexp(c["lw"], lw_leaf)
        p_take = jnp.exp(lw_leaf - lw_new)
        take = jax.random.uniform(ksel, ()) < p_take
        z_prop = jnp.where(take, z, c["z_prop"])

        accept = jnp.minimum(1.0, jnp.exp(H0 - H))

        return {
            "key": key, "i": i + 1, "z": z, "r": r, "U": U, "grad": grad,
            "S": S, "lw": lw_new, "z_prop": z_prop,
            "sum_accept": c["sum_accept"] + accept,
            "n_leaves": c["n_leaves"] + 1,
            "turning": turning, "diverging": diverging,
            "r_ckpts": r_ck, "s_ckpts": s_ck,
        }

    init = {
        "key": key, "i": jnp.asarray(0, jnp.int32),
        "z": z0, "r": r0, "U": U0, "grad": grad0,
        "S": jnp.zeros(dim, z0.dtype),
        "lw": jnp.asarray(-jnp.inf, z0.dtype),
        "z_prop": z0,
        "sum_accept": jnp.asarray(0.0, z0.dtype),
        "n_leaves": jnp.asarray(0, jnp.int32),
        "turning": jnp.asarray(False), "diverging": jnp.asarray(False),
        "r_ckpts": jnp.zeros((max_treedepth + 1, dim), z0.dtype),
        "s_ckpts": jnp.zeros((max_treedepth + 1, dim), z0.dtype),
    }
    out = jax.lax.while_loop(cond, body, init)
    return out


def _nuts_transition(key, z, U, grad, eps, inv_mass, U_and_grad,
                     max_treedepth):
    """One NUTS trajectory from z.  Returns (z', U', grad', stats)."""
    dim = z.shape[0]
    kr, kloop = jax.random.split(key)
    mass_sqrt = 1.0 / jnp.sqrt(inv_mass)
    r0 = jax.random.normal(kr, (dim,), z.dtype) * mass_sqrt
    H0 = U + _kinetic(r0, inv_mass)

    init = {
        "key": kloop,
        "z_left": z, "r_left": r0, "U_left": U, "grad_left": grad,
        "z_right": z, "r_right": r0, "U_right": U, "grad_right": grad,
        "S": r0, "lw": jnp.asarray(0.0, z.dtype),
        "z_prop": z, "depth": jnp.asarray(0, jnp.int32),
        "turning": jnp.asarray(False), "diverging": jnp.asarray(False),
        "sum_accept": jnp.asarray(0.0, z.dtype),
        "n_leaves": jnp.asarray(0, jnp.int32),
    }

    def cond(c):
        return (
            (c["depth"] < max_treedepth)
            & (~c["turning"]) & (~c["diverging"])
        )

    def body(c):
        key, kdir, ksub, kmerge = jax.random.split(c["key"], 4)
        direction = jnp.where(
            jax.random.bernoulli(kdir, 0.5), 1.0, -1.0).astype(z.dtype)
        go_right = direction > 0
        z0 = jnp.where(go_right, c["z_right"], c["z_left"])
        r0 = jnp.where(go_right, c["r_right"], c["r_left"])
        U0 = jnp.where(go_right, c["U_right"], c["U_left"])
        g0 = jnp.where(go_right, c["grad_right"], c["grad_left"])

        sub = _build_subtree(
            ksub, c["depth"], z0, r0, U0, g0, direction, eps, inv_mass,
            H0, U_and_grad, max_treedepth)

        ok = (~sub["turning"]) & (~sub["diverging"])

        # merge endpoints
        z_left = jnp.where(go_right, c["z_left"], jnp.where(ok, sub["z"], c["z_left"]))
        r_left = jnp.where(go_right, c["r_left"], jnp.where(ok, sub["r"], c["r_left"]))
        U_left = jnp.where(go_right, c["U_left"], jnp.where(ok, sub["U"], c["U_left"]))
        g_left = jnp.where(go_right, c["grad_left"], jnp.where(ok, sub["grad"], c["grad_left"]))
        z_right = jnp.where(go_right, jnp.where(ok, sub["z"], c["z_right"]), c["z_right"])
        r_right = jnp.where(go_right, jnp.where(ok, sub["r"], c["r_right"]), c["r_right"])
        U_right = jnp.where(go_right, jnp.where(ok, sub["U"], c["U_right"]), c["U_right"])
        g_right = jnp.where(go_right, jnp.where(ok, sub["grad"], c["grad_right"]), c["grad_right"])

        # biased progressive sampling: favour the new subtree
        p_new = jnp.exp(jnp.minimum(0.0, sub["lw"] - c["lw"]))
        take = ok & (jax.random.uniform(kmerge, ()) < p_new)
        z_prop = jnp.where(take, sub["z_prop"], c["z_prop"])
        lw = jnp.where(ok, jnp.logaddexp(c["lw"], sub["lw"]), c["lw"])
        S = jnp.where(ok, c["S"] + sub["S"], c["S"])

        # full-trajectory U-turn check after merge
        full_turn = ok & _uturn(S, r_left, r_right, inv_mass)

        return {
            "key": key,
            "z_left": z_left, "r_left": r_left, "U_left": U_left,
            "grad_left": g_left,
            "z_right": z_right, "r_right": r_right, "U_right": U_right,
            "grad_right": g_right,
            "S": S, "lw": lw, "z_prop": z_prop,
            "depth": c["depth"] + 1,
            "turning": sub["turning"] | full_turn,
            "diverging": sub["diverging"],
            "sum_accept": c["sum_accept"] + sub["sum_accept"],
            "n_leaves": c["n_leaves"] + sub["n_leaves"],
        }

    out = jax.lax.while_loop(cond, body, init)
    z_new = out["z_prop"]
    U_new, grad_new = U_and_grad(z_new)
    accept_stat = out["sum_accept"] / jnp.maximum(out["n_leaves"], 1)
    stats = {
        "accept": accept_stat,
        "diverging": out["diverging"],
        "depth": out["depth"],
        "n_leaves": out["n_leaves"],
    }
    return z_new, U_new, grad_new, stats


def _hmc_transition(key, z, U, grad, eps, inv_mass, U_and_grad, num_steps):
    """One fixed-length HMC trajectory with uniform trajectory-length
    jitter (Neal 2011 §4.2) and a Metropolis accept.

    TPU-safe alternative to NUTS: the compiled program is a single
    bounded fori_loop of leapfrog steps — no nested while_loop, which is
    the trigger of the GP-objective NUTS runtime fault on this platform
    (docs/TPU_NOTES.md, benchmarks/nuts_tpu_repro.py).  Trajectory
    length is drawn uniformly in [1, num_steps] per transition (masked
    trailing steps), removing the resonance pathologies of a fixed
    length while keeping the program shape static.
    """
    dim = z.shape[0]
    kr, klen, kacc = jax.random.split(key, 3)
    mass_sqrt = 1.0 / jnp.sqrt(inv_mass)
    r0 = jax.random.normal(kr, (dim,), z.dtype) * mass_sqrt
    H0 = U + _kinetic(r0, inv_mass)
    nsteps = jax.random.randint(klen, (), 1, num_steps + 1)

    def body(i, c):
        z_c, r_c, U_c, g_c = c
        z_n, r_n, U_n, g_n = _leapfrog(
            z_c, r_c, g_c, eps, inv_mass, U_and_grad)
        take = i < nsteps
        return (
            jnp.where(take, z_n, z_c),
            jnp.where(take, r_n, r_c),
            jnp.where(take, U_n, U_c),
            jnp.where(take, g_n, g_c),
        )

    z1, r1, U1, grad1 = jax.lax.fori_loop(
        0, num_steps, body, (z, r0, U, grad))
    H1 = U1 + _kinetic(r1, inv_mass)
    H1 = jnp.where(jnp.isnan(H1), jnp.inf, H1)
    diverging = (H1 - H0) > _MAX_DELTA_ENERGY
    accept_prob = jnp.minimum(1.0, jnp.exp(H0 - H1))
    accept = (~diverging) & (
        jax.random.uniform(kacc, (), z.dtype) < accept_prob)
    z_new = jnp.where(accept, z1, z)
    U_new = jnp.where(accept, U1, U)
    grad_new = jnp.where(accept, grad1, grad)
    stats = {
        "accept": accept_prob,
        "diverging": diverging,
        "depth": nsteps.astype(jnp.int32),
        "n_leaves": nsteps.astype(jnp.int32),
    }
    return z_new, U_new, grad_new, stats


def _find_reasonable_eps(key, z, U, grad, inv_mass, U_and_grad):
    """Heuristic initial step size (Hoffman & Gelman Alg. 4)."""
    dim = z.shape[0]
    r0 = jax.random.normal(key, (dim,), z.dtype) / jnp.sqrt(inv_mass)
    H0 = U + _kinetic(r0, inv_mass)

    def accept_prob(eps):
        z1, r1, U1, _ = _leapfrog(z, r0, grad, eps, inv_mass, U_and_grad)
        H1 = U1 + _kinetic(r1, inv_mass)
        H1 = jnp.where(jnp.isnan(H1), jnp.inf, H1)
        return jnp.exp(H0 - H1)

    eps0 = jnp.asarray(1.0, z.dtype)
    direction = jnp.where(accept_prob(eps0) > 0.5, 1.0, -1.0)

    def cond(c):
        eps, it = c
        p = accept_prob(eps)
        keep = jnp.where(
            direction > 0, p > 0.5, p < 0.5)
        return keep & (it < 50) & (eps > 1e-10) & (eps < 1e10)

    def body(c):
        eps, it = c
        return eps * jnp.where(direction > 0, 2.0, 0.5), it + 1

    eps, _ = jax.lax.while_loop(cond, body, (eps0, jnp.asarray(0)))
    return eps


@partial(jax.jit, static_argnames=("logp_fn", "dim"))
def _init_chain(key, z_init, logp_fn, dim):
    """Initial state: gradient cache, reasonable step size, unit mass."""

    def U_and_grad(z):
        lp, g = jax.value_and_grad(logp_fn)(z)
        return -lp, -g

    U0, grad0 = U_and_grad(z_init)
    inv_mass0 = jnp.ones(dim, z_init.dtype)
    eps0 = _find_reasonable_eps(
        key, z_init, U0, grad0, inv_mass0, U_and_grad)
    da0 = _da_init(eps0)
    welford0 = (
        jnp.asarray(0.0, z_init.dtype),
        jnp.zeros(dim, z_init.dtype),
        jnp.zeros(dim, z_init.dtype),
    )
    return (z_init, U0, grad0, da0, inv_mass0, welford0)


@partial(jax.jit, static_argnames=(
    "logp_fn", "num_warmup", "max_treedepth", "chunk", "sampler"))
def _run_chunk(carry, keys, step_start, logp_fn, num_warmup,
               target_accept, max_treedepth, chunk, sampler="nuts"):
    """Advance one chain by `chunk` transitions (vmapped over chains by
    the caller).  Sampling is chunked into bounded device executions: a
    single multi-minute execution of the full scan crashes this
    platform's TPU worker (watchdog)."""

    def U_and_grad(z):
        lp, g = jax.value_and_grad(logp_fn)(z)
        return -lp, -g

    # Welford mass window [0.15W, 0.95W)
    w_start = jnp.asarray(int(0.15 * num_warmup))
    w_end = jnp.asarray(
        max(int(0.95 * num_warmup), int(0.15 * num_warmup) + 1))

    def step(carry, inp):
        step_idx, key = inp
        z, U, grad, da, inv_mass, welford = carry
        in_warmup = step_idx < num_warmup
        eps = jnp.where(
            in_warmup, jnp.exp(da.log_eps), jnp.exp(da.log_eps_bar))
        if sampler == "hmc":
            # max_treedepth doubles as the trajectory-length budget:
            # 2**depth leapfrogs, matching the NUTS leaf count
            z, U, grad, stats = _hmc_transition(
                key, z, U, grad, eps, inv_mass, U_and_grad,
                2 ** max_treedepth)
        else:
            z, U, grad, stats = _nuts_transition(
                key, z, U, grad, eps, inv_mass, U_and_grad, max_treedepth)

        # dual averaging during warmup
        da_new = _da_update(da, stats["accept"], target_accept)
        da = jax.tree_util.tree_map(
            lambda a, b: jnp.where(in_warmup, a, b), da_new, da)

        # Welford accumulation in window
        count, mean, m2 = welford
        in_window = in_warmup & (step_idx >= w_start) & (step_idx < w_end)
        delta = z - mean
        count1 = count + 1
        mean1 = mean + delta / count1
        m2_1 = m2 + delta * (z - mean1)
        welford = (
            jnp.where(in_window, count1, count),
            jnp.where(in_window, mean1, mean),
            jnp.where(in_window, m2_1, m2),
        )

        # apply mass estimate at window end, restart step-size adaptation
        apply_mass = step_idx == w_end
        cnt = jnp.maximum(welford[0], 1.0)
        var = welford[2] / cnt
        var_reg = (cnt / (cnt + 5.0)) * var + 1e-3 * (5.0 / (cnt + 5.0))
        inv_mass = jnp.where(apply_mass, var_reg, inv_mass)
        da_reset = _da_init(jnp.exp(da.log_eps))
        da = jax.tree_util.tree_map(
            lambda a, b: jnp.where(apply_mass, a, b), da_reset, da)

        out = {
            "z": z, "lp": -U,
            "diverging": stats["diverging"],
            "accept": stats["accept"],
            "depth": stats["depth"],
            "eps": eps,
        }
        return (z, U, grad, da, inv_mass, welford), out

    steps = (step_start + jnp.arange(chunk), keys)
    return jax.lax.scan(step, carry, steps)


@partial(jax.jit, static_argnames=(
    "logp_fn", "num_warmup", "budget", "chunk", "unroll", "adapt_tlen",
    "w_fracs", "chees_sign", "eps_adam"))
def _run_chunk_flat(carry, keys, zbar, logp_fn, num_warmup, target_accept,
                    budget, chunk, unroll: int = 1,
                    adapt_tlen: bool = False, w_fracs=(0.6,),
                    chees_sign: bool = False, eps_adam: bool = True):
    """Advance one chain by `chunk` LEAPFROGS (vmapped over chains by the
    caller): a flat scan over leapfrog steps with dynamic trajectory
    boundaries.

    The fixed-budget _hmc_transition pays its full 2**depth leapfrog
    budget every transition (masked trailing steps still evaluate the
    objective — the fori bound must be static on this platform), wasting
    ~2x at the uniform-jitter mean.  Here each scan step is exactly one
    leapfrog; when the current trajectory's sampled length is reached the
    step additionally performs the (cheap, masked) Metropolis accept,
    adaptation bookkeeping, momentum refresh and next-length draw — so
    the compiled program does no wasted objective evaluations while
    keeping the TPU-safe shape: a single bounded scan, no nested
    while_loop (the NUTS worker-fault trigger, docs/TPU_NOTES.md).

    Each scan step runs `unroll` leapfrogs back-to-back with the
    boundary bookkeeping only between blocks (trajectory lengths are
    quantised to multiples of `unroll`): bare back-to-back leapfrogs
    let XLA software-pipeline consecutive objective evaluations, which
    per-leapfrog bookkeeping was measured to break (32 vs 20
    ms/leapfrog at n=256 on the TPU).  `chunk` is a LEAPFROG count and
    must be a multiple of `unroll`; `keys` has chunk/unroll rows.

    adapt_tlen: ChEES-style adaptation of the MEAN trajectory length
    during warmup (Hoffman, Radul & Sountsov 2021): trajectory length
    drawn ~ U(0, 2*nmean) leapfrog steps, log(nmean) under Adam ascent
    on the halting-derivative estimate of the ChEES criterion
    d/dt (|z1-zbar|^2 - |z0-zbar|^2)^2/4 = (...)*(z1-zbar)@v1, weighted
    by the jitter fraction u and the accept probability.  The learned
    coordinate is length in STEPS (= trajectory time / eps) rather than
    the paper's trajectory time — see the inline note at the ascent for
    the measured failure that motivates it.  `zbar` is the CROSS-CHAIN
    mean position, computed by the caller at the previous chunk
    boundary and held fixed through the chunk (the caller also pools
    log_nmean across chains between chunks).  An earlier variant used
    the per-chain warmup Welford mean instead — its correlation with
    the chain's own history biases the gradient positive and the length
    ran away to the budget cap (18x worse ESS/leapfrog than uniform
    jitter on an ill-scaled Gaussian); the paper's cross-chain mean is
    essential.  Ignored (pass zeros) when adapt_tlen=False."""
    unroll = max(1, min(unroll, budget))

    def U_and_grad(z):
        lp, g = jax.value_and_grad(logp_fn)(z)
        return -lp, -g

    w_start_i = int(0.15 * num_warmup)
    w_start = jnp.asarray(w_start_i)
    # With trajectory-time adaptation the mass matrix must land EARLY:
    # ChEES learns tmean for the CURRENT metric, and the optimum shifts
    # by orders of magnitude when the mass applies — it needs the tail
    # of warmup to re-adapt in the final metric (measured: a 0.95 apply
    # point leaves tmean tuned for the unwhitened target and ESS 3-5x
    # WORSE than uniform jitter; 0.6 leaves 40% to re-learn).  Staged
    # Stan-style windows (apply at 0.4/0.7 or 0.4/0.6/0.8, resetting
    # ChEES each time) were A/B'd on the n=128 GP hyperposterior and
    # REJECTED: every extra reset restarts the trajectory-time descent
    # and the shorter final window leaves it stranded near the reset
    # point (GP ESS/leapfrog win 7x -> 1.4-2.3x, the Adam second-moment
    # transient after a reset stalls progress); carrying tmean across
    # applies instead loses the ill-scaled-Gaussian robustness.  The
    # single 0.6 window wins on the production workload.
    if adapt_tlen:
        w_ends = sorted({
            max(int(float(f) * num_warmup), w_start_i + 1)
            for f in w_fracs})
    else:
        w_ends = [max(int(0.95 * num_warmup), w_start_i + 1)]
    w_end = jnp.asarray(w_ends[-1])

    def step(carry, key):
        (z, U, grad, da, inv_mass, welford, zc, rc, Uc, gc, H0, eps_cur,
         sdone, nsteps, tidx, ch) = carry
        kmom, klen, kacc = jax.random.split(key, 3)

        boundary = sdone >= nsteps
        real = boundary & (nsteps > 0)

        # -- complete the trajectory (masked no-op when not at boundary)
        H1 = Uc + _kinetic(rc, inv_mass)
        H1 = jnp.where(jnp.isnan(H1), jnp.inf, H1)
        diverging = (H1 - H0) > _MAX_DELTA_ENERGY
        aprob = jnp.minimum(1.0, jnp.exp(H0 - H1))
        accept = (~diverging) & (
            jax.random.uniform(kacc, (), z.dtype) < aprob)
        z_start = z  # trajectory start, for the ChEES gradient
        z = jnp.where(real & accept, zc, z)
        U = jnp.where(real & accept, Uc, U)
        grad = jnp.where(real & accept, gc, grad)
        nsteps_done = nsteps  # completed trajectory's length, for stats

        in_warmup = tidx < num_warmup
        da_new = (_da_adam_update if eps_adam else _da_update)(
            da, aprob, target_accept)
        da = jax.tree_util.tree_map(
            lambda a, b: jnp.where(real & in_warmup, a, b), da_new, da)

        count, mean, m2 = welford
        in_window = (
            real & in_warmup & (tidx >= w_start) & (tidx < w_end))
        delta = z - mean
        count1 = count + 1
        mean1 = mean + delta / count1
        m2_1 = m2 + delta * (z - mean1)
        welford = (
            jnp.where(in_window, count1, count),
            jnp.where(in_window, mean1, mean),
            jnp.where(in_window, m2_1, m2),
        )
        is_end = jnp.zeros((), bool)
        for e in w_ends:
            is_end = is_end | (tidx == e)
        apply_mass = real & is_end
        cnt = jnp.maximum(welford[0], 1.0)
        var = welford[2] / cnt
        var_reg = (cnt / (cnt + 5.0)) * var + 1e-3 * (5.0 / (cnt + 5.0))
        inv_mass = jnp.where(apply_mass, var_reg, inv_mass)
        da_reset = (_da_adam_init if eps_adam else _da_init)(
            jnp.exp(da.log_eps))
        da = jax.tree_util.tree_map(
            lambda a, b: jnp.where(apply_mass, a, b), da_reset, da)
        # staged windows: the accumulator restarts in the new metric
        welford = jax.tree_util.tree_map(
            lambda w: jnp.where(apply_mass, jnp.zeros_like(w), w),
            welford)

        # -- ChEES trajectory-LENGTH ascent (warmup, once zbar stabilises)
        #
        # The learned coordinate is log MEAN TRAJECTORY LENGTH IN
        # LEAPFROG STEPS (log_nmean = log(tmean/eps)), not trajectory
        # TIME.  Time-parameterised adaptation anchored tmean to the
        # step size at reset points while dual averaging subsequently
        # moved eps by 7-15x at the mass-matrix whitening — measured on
        # the n=256 GP hyperposterior with the mixed-precision
        # objective: the post-apply ascent could not track the moving
        # optimum, tmean collapsed below ONE leapfrog step, the chains
        # random-walked (min ESS 7-10 vs 500-700 healthy; the ChEES
        # gradient itself dies at sub-step lengths since z1 ~= z0, so
        # the collapse is absorbing).  In step units the eps motion
        # cancels out of the coordinate entirely; post-warmup eps is
        # frozen, so the two parameterisations sample identically.
        log_nmean, u_cur, adm, adv, adc = ch
        if adapt_tlen:
            # the metric just changed: everything learned is for the
            # OLD metric — restart at HALF the uniform-jitter mean
            # (budget/4 steps; a mild shortward bias toward the typical
            # post-whitening optimum) with fresh Adam moments (carrying
            # the value across applies was A/B'd and loses when the
            # metric legitimately moves at the later applies).
            log_reset = jnp.log(budget / 4.0) + jnp.zeros((), z.dtype)
            log_nmean = jnp.where(apply_mass, log_reset, log_nmean)
            adm = jnp.where(apply_mass, 0.0, adm)
            adv = jnp.where(apply_mass, 0.0, adv)
            adc = jnp.where(apply_mass, 0.0, adc)
            d1 = zc - zbar
            d0 = z_start - zbar
            v1 = inv_mass * rc
            dCdt = (jnp.sum(d1 * d1) - jnp.sum(d0 * d0)) * jnp.dot(d1, v1)
            # d/dlog nmean = dC/dt * tmean, tmean = nmean * eps
            g = dCdt * u_cur * aprob * jnp.exp(log_nmean) * eps_cur
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            if chees_sign:
                # experimental: sign-normalised gradient — immune to the
                # heavy-tailed dCdt magnitudes that inflate Adam's
                # second moment and stall the descent
                g = jnp.sign(g)
            # grace period for zbar to stabilise; NOT the Welford count
            # (that is zeroed at each mass apply, which would freeze
            # adaptation for the rest of warmup — regression caught by
            # review: the 7x ESS/leapfrog win silently reverted to
            # fixed-length jitter at the reset constant)
            do_ad = real & in_warmup & (tidx > w_start + 20)
            b1, b2, lr = 0.9, 0.999, 0.025
            adc1 = adc + 1.0
            adm1 = b1 * adm + (1.0 - b1) * g
            adv1 = b2 * adv + (1.0 - b2) * g * g
            mhat = adm1 / (1.0 - b1 ** adc1)
            vhat = adv1 / (1.0 - b2 ** adc1)
            log_new = log_nmean + lr * mhat / (jnp.sqrt(vhat) + 1e-10)
            # floor at a 2-step mean: below ~1 step the halting
            # gradient has no signal (the collapse is absorbing) and
            # sub-step trajectories are pure random walk
            log_new = jnp.clip(
                log_new, jnp.log(2.0), jnp.log(float(budget)))
            log_nmean = jnp.where(do_ad, log_new, log_nmean)
            adm = jnp.where(do_ad, adm1, adm)
            adv = jnp.where(do_ad, adv1, adv)
            adc = jnp.where(do_ad, adc1, adc)

        out = {
            "z": z, "lp": -U, "accept": aprob, "diverging": diverging,
            "depth": nsteps_done.astype(jnp.int32), "eps": eps_cur,
            "real": real, "tidx": tidx,
        }
        tidx = tidx + jnp.where(real, 1, 0)

        # -- start the next trajectory (masked when mid-trajectory)
        in_warmup2 = tidx < num_warmup
        eps_next = jnp.where(
            in_warmup2, jnp.exp(da.log_eps), jnp.exp(da.log_eps_bar))
        mass_sqrt = 1.0 / jnp.sqrt(inv_mass)
        r0 = jax.random.normal(kmom, z.shape, z.dtype) * mass_sqrt
        if adapt_tlen:
            u = jax.random.uniform(klen, (), z.dtype)
            # a mean the budget cannot draw is unlearnable: clamp the
            # DRAW (not the learned value) so that 2*nmean <= budget —
            # at the clamp ChEES degenerates to uniform jitter instead
            # of saturating every trajectory at the cap
            ln_draw = jnp.minimum(log_nmean, jnp.log(budget / 2.0))
            ns = jnp.ceil(2.0 * jnp.exp(ln_draw) * u).astype(jnp.int32)
            if unroll > 1:
                ns = -(-ns // unroll) * unroll
            # floor at 4 leapfrogs: a lower bound on exploration per
            # transition that costs nothing when the learned length is
            # healthy and bounds the damage when it is not
            nsteps_new = jnp.clip(
                ns, max(unroll, min(4, budget)), budget)
            u_cur = jnp.where(boundary, u, u_cur)
        else:
            nsteps_new = unroll * jax.random.randint(
                klen, (), 1, budget // unroll + 1, dtype=jnp.int32)
        ch = (log_nmean, u_cur, adm, adv, adc)
        zc = jnp.where(boundary, z, zc)
        rc = jnp.where(boundary, r0, rc)
        Uc = jnp.where(boundary, U, Uc)
        gc = jnp.where(boundary, grad, gc)
        H0 = jnp.where(boundary, U + _kinetic(r0, inv_mass), H0)
        eps_cur = jnp.where(boundary, eps_next, eps_cur)
        nsteps = jnp.where(boundary, nsteps_new, nsteps)
        sdone = jnp.where(boundary, 0, sdone)

        # -- `unroll` back-to-back leapfrogs (every step)
        for _ in range(unroll):
            zc, rc, Uc, gc = _leapfrog(zc, rc, gc, eps_cur, inv_mass,
                                       U_and_grad)
        sdone = sdone + unroll

        carry = (z, U, grad, da, inv_mass, welford, zc, rc, Uc, gc, H0,
                 eps_cur, sdone, nsteps, tidx, ch)
        return carry, out

    return jax.lax.scan(step, carry, keys)


def _flat_carry_init(chain_init, budget, eps_adam=True):
    """Extend an _init_chain carry with the flat-scan trajectory state:
    a zero-length 'trajectory' whose completion is a no-op, so the first
    scan step starts trajectory 1 cleanly.  The ChEES mean trajectory
    LENGTH (leapfrog steps — step units track the moving step size, see
    _run_chunk_flat) starts at the uniform-jitter mean, budget / 2."""
    z, U, grad, da, inv_mass, welford = chain_init
    if eps_adam:
        da = _da_adam_init(jnp.exp(da.log_eps))
    zeros = jnp.zeros_like(z)
    i0 = jnp.zeros((), jnp.int32)
    f0 = jnp.zeros((), z.dtype)
    ch = (jnp.log(budget / 2.0) + f0, 0.5 + f0, f0, f0, f0)
    return (z, U, grad, da, inv_mass, welford, z, zeros, U, grad, U,
            jnp.exp(da.log_eps), i0, i0, i0, ch)


def hmc_flat_sample(logp_fn, z0, *, key, num_warmup=1000, num_samples=1000,
                    num_chains=4, target_accept=0.8, max_treedepth=6,
                    jitter_init=1.0, shard=True, leaps_per_call=2048,
                    unroll=1, adapt_tlen=False):
    """Jittered-trajectory HMC through the flat leapfrog-level scan
    (_run_chunk_flat): the TPU sampler with no masked-step waste.

    Trajectory lengths are drawn uniformly in [1, 2**max_treedepth] per
    transition; expected cost per transition is half the budget plus the
    boundary bookkeeping, vs the full budget for the padded
    _hmc_transition.  Chains are vmapped (and sharded when the chain
    count divides the device count); chunks of `leaps_per_call` leapfrogs
    per device execution keep runs clear of runtime watchdogs.  Returns
    the same (chains, draws) dict schema as nuts_sample."""
    if adapt_tlen and num_chains < 2:
        import warnings

        warnings.warn(
            "ChEES trajectory-length adaptation needs >= 2 chains: the "
            "halting criterion is defined against the CROSS-chain mean, "
            "and a single chain's self-mean biases the gradient (the "
            "measured runaway mode; docs/TPU_NOTES.md).  Falling back "
            "to uniform trajectory jitter for this run.",
            stacklevel=2)
        adapt_tlen = False
    dim = int(np.asarray(z0).shape[0])
    budget = 2 ** max_treedepth
    kinit, keps, krun = jax.random.split(key, 3)
    z_inits = jnp.asarray(z0)[None, :] + jax.random.uniform(
        kinit, (num_chains, dim), minval=-jitter_init, maxval=jitter_init,
        dtype=jnp.asarray(z0).dtype)
    eps_keys = jax.random.split(keps, num_chains)

    sharding = None
    if (shard and jax.device_count() > 1
            and num_chains % jax.device_count() == 0):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()), ("chains",))
        sharding = NamedSharding(mesh, P("chains"))
        eps_keys = jax.device_put(eps_keys, sharding)
        z_inits = jax.device_put(z_inits, sharding)

    import sys as _sys
    import time as _time

    trace = bool(_os.environ.get("ANDVARANAUT_HMC_TRACE"))
    # ADAM step-size adaptation (bounded updates — no dual-averaging
    # funnel collapse, see _da_adam_update); env knob for A/B only
    eps_adam = _os.environ.get("ANDVARANAUT_EPS_ADAM", "1") != "0"
    t0 = _time.time()
    init = jax.vmap(lambda k, z: _init_chain(k, z, logp_fn, dim))
    carry = jax.vmap(lambda c: _flat_carry_init(c, budget, eps_adam))(
        init(eps_keys, z_inits))
    jax.block_until_ready(carry)
    if trace:
        print(f"[hmc-flat] chain init (reasonable-eps search + compile) "
              f"{_time.time() - t0:.0f}s", file=_sys.stderr, flush=True)

    total = num_warmup + num_samples
    unroll = max(1, min(unroll, budget))
    leaps_per_call = max(unroll, leaps_per_call // unroll * unroll)
    nsteps_call = leaps_per_call // unroll
    # env knobs resolved OUTSIDE the jit so they are compile-cache keys
    # (an in-process A/B that changes them must not reuse stale programs)
    w_fracs = tuple(
        float(f) for f in
        _os.environ.get("ANDVARANAUT_CHEES_WINDOWS", "0.6").split(","))
    chees_sign = _os.environ.get("ANDVARANAUT_CHEES_SIGN", "0") != "0"
    run = jax.vmap(
        lambda c, ks, zb: _run_chunk_flat(
            c, ks, zb, logp_fn, num_warmup, target_accept, budget,
            leaps_per_call, unroll, adapt_tlen, w_fracs, chees_sign,
            eps_adam),
        in_axes=(0, 0, None))
    zbar = jnp.mean(z_inits, axis=0)

    # run chunks of leapfrogs until every chain has `total` completed
    # transitions (+1 scan step commits the final trajectory)
    t_start = _time.time()
    collected = [[] for _ in range(num_chains)]
    done = np.zeros(num_chains, dtype=int)
    max_leaps = (total + 2) * (budget + 1) * 4  # generous runaway bound
    leaps = 0
    while done.min() < num_samples and leaps < max_leaps:
        krun, kchunk = jax.random.split(krun)
        ks = jax.random.split(
            kchunk, num_chains * nsteps_call).reshape(
            num_chains, nsteps_call, 2)
        if sharding is not None:
            ks = jax.device_put(ks, sharding)
        carry, hist = run(carry, ks, zbar)
        leaps += leaps_per_call
        if adapt_tlen:
            # cross-chain pooling at the chunk boundary (the ChEES
            # criterion is defined against the ACROSS-chain mean; the
            # shared tmean keeps chains on one trajectory distribution)
            zbar = jnp.mean(carry[0], axis=0)
            ch = carry[15]
            lt_pool = jnp.broadcast_to(
                jnp.mean(ch[0]), ch[0].shape)
            if sharding is not None:
                lt_pool = jax.device_put(lt_pool, sharding)
            carry = carry[:15] + ((lt_pool,) + ch[1:],)
        real = np.asarray(hist["real"])
        tidx = np.asarray(hist["tidx"])
        for c in range(num_chains):
            sel = real[c] & (tidx[c] >= num_warmup) & (tidx[c] < total)
            if sel.any():
                collected[c].append({
                    k: np.asarray(v[c])[sel]
                    for k, v in hist.items() if k not in ("real", "tidx")
                })
        done = np.array([
            sum(len(part["lp"]) for part in collected[c])
            for c in range(num_chains)])
        if trace:
            ch_now = carry[15]
            da_now = carry[3]
            depth = np.asarray(hist["depth"])
            realm = np.asarray(hist["real"])
            mean_len = (
                float(depth[realm].mean()) if realm.any() else float("nan"))
            print(
                f"[hmc-flat] t={_time.time() - t_start:.0f}s "
                f"leaps={leaps} post-warmup draws/chain min={done.min()} "
                f"max={done.max()} nmean={float(np.exp(np.asarray(ch_now[0])).mean()):.3g} "
                f"eps={float(np.exp(np.asarray(da_now.log_eps)).mean()):.3g} "
                f"tidx={int(np.asarray(carry[14]).min())} "
                f"len/traj={mean_len:.1f}",
                file=_sys.stderr, flush=True)

    # debugging hook: final sampler state (adaptation diagnostics) —
    # host copies, so no device buffers stay pinned after sampling
    hmc_flat_sample._last_carry = jax.tree_util.tree_map(
        lambda a: np.asarray(a) if hasattr(a, "shape") else a, carry)

    def chain_stack(c, k):
        arr = np.concatenate([part[k] for part in collected[c]], axis=0)
        return arr[:num_samples]

    keysout = ("z", "lp", "accept", "diverging", "depth", "eps")
    return {
        k: jnp.asarray(np.stack(
            [chain_stack(c, k) for c in range(num_chains)]))
        for k in keysout
    }


def nuts_sample(logp_fn, z0, *, key, num_warmup=1000, num_samples=1000,
                num_chains=4, target_accept=0.8, max_treedepth=10,
                jitter_init=1.0, shard=True, steps_per_call=100,
                sampler="nuts", adapt_tlen=True):
    """Run `num_chains` adaptive NUTS (or jittered-HMC) chains, vmapped
    and (optionally) sharded over available devices.

    logp_fn: unconstrained log posterior, R^dim -> R.
    z0: (dim,) initial point; chains start at z0 + U(-jitter, jitter)
    (PyMC's jitter+adapt_diag init).
    Sampling advances in `steps_per_call` chunks (one compiled stepper
    re-invoked from the host) so no single device execution runs long
    enough to trip runtime watchdogs.
    sampler: 'nuts' (adaptive tree building), 'hmc' (jittered
    trajectories through the flat leapfrog-level scan — the TPU-safe
    mode with no masked-step waste, see _run_chunk_flat), or
    'hmc_fixed' (the padded fixed-budget transition, kept for A/B).
    Trajectory budget for both HMC modes is 2**max_treedepth leapfrogs.
    adapt_tlen (sampler='hmc' only): ChEES-style warmup adaptation of
    the mean trajectory time (cross-chain pooled; _run_chunk_flat).
    Default ON — measured 7x ESS/leapfrog over plain uniform jitter on
    a GP hyperposterior (typical learned length ~4 leapfrogs vs the
    budget-uniform mean of budget/2), parity on an adversarial
    ill-scaled Gaussian.  Pass False for the plain jitter.
    Returns dict of stacked arrays with leading (chains, draws).
    """
    if sampler == "hmc":
        budget = 2 ** max_treedepth
        return hmc_flat_sample(
            logp_fn, z0, key=key, num_warmup=num_warmup,
            num_samples=num_samples, num_chains=num_chains,
            target_accept=target_accept, max_treedepth=max_treedepth,
            jitter_init=jitter_init, shard=shard,
            leaps_per_call=max(256, steps_per_call * (budget + 1) // 2),
            adapt_tlen=adapt_tlen)
    if sampler == "hmc_fixed":
        sampler = "hmc"  # the padded per-transition path below
    dim = int(np.asarray(z0).shape[0])
    kinit, keps, krun = jax.random.split(key, 3)
    z_inits = jnp.asarray(z0)[None, :] + jax.random.uniform(
        kinit, (num_chains, dim), minval=-jitter_init, maxval=jitter_init,
        dtype=jnp.asarray(z0).dtype)
    eps_keys = jax.random.split(keps, num_chains)
    total = num_warmup + num_samples
    step_keys = jax.random.split(krun, num_chains * total).reshape(
        num_chains, total, 2)

    if shard and jax.device_count() > 1 and num_chains % jax.device_count() == 0:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()), ("chains",))
        sharding = NamedSharding(mesh, P("chains"))
        eps_keys = jax.device_put(eps_keys, sharding)
        z_inits = jax.device_put(z_inits, sharding)
        step_keys = jax.device_put(step_keys, sharding)

    init = jax.vmap(lambda k, z: _init_chain(k, z, logp_fn, dim))
    carry = init(eps_keys, z_inits)

    chunk = min(steps_per_call, total)
    # pad total to a chunk multiple; surplus steps are discarded
    n_calls = -(-total // chunk)
    run = jax.vmap(
        lambda c, ks, s0: _run_chunk(
            c, ks, s0, logp_fn, num_warmup, target_accept, max_treedepth,
            chunk, sampler),
        in_axes=(0, 0, None))
    outs = []
    for ci in range(n_calls):
        s0 = ci * chunk
        nk = min(chunk, total - s0)
        ks = step_keys[:, s0 : s0 + chunk]
        if nk < chunk:  # reuse tail keys for padded steps; sliced off below
            pad = jnp.repeat(ks[:, -1:], chunk - nk, axis=1)
            ks = jnp.concatenate([ks[:, :nk], pad], axis=1)
        carry, hist = run(carry, ks, jnp.asarray(s0))
        outs.append(jax.tree_util.tree_map(lambda a: a[:, :nk], hist))
    hist = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=1), *outs)
    # post-warmup draws only
    return jax.tree_util.tree_map(lambda a: a[:, num_warmup:], hist)


# ---------------------------------------------------------------------------
# Diagnostics (arviz-free)
# ---------------------------------------------------------------------------

def split_rhat(x):
    """Split-R-hat over (chains, draws) samples (Vehtari et al. 2021)."""
    x = np.asarray(x)
    c, n = x.shape[:2]
    half = n // 2
    halves = np.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)
    m, nn = halves.shape[:2]
    chain_means = halves.mean(axis=1)
    chain_vars = halves.var(axis=1, ddof=1)
    W = chain_vars.mean(axis=0)
    B = nn * chain_means.var(axis=0, ddof=1)
    var_est = (nn - 1) / nn * W + B / nn
    return np.sqrt(var_est / W)


def ess_bulk(x):
    """Bulk effective sample size via autocorrelation (Geyer initial
    monotone sequence), on rank-normalised draws."""
    x = np.asarray(x, dtype=np.float64)
    c, n = x.shape[:2]
    if x.ndim == 2:
        x = x[..., None]
    out = []
    for j in range(x.shape[-1]):
        xj = x[..., j]
        # rank-normalise
        r = np.argsort(np.argsort(xj.reshape(-1))).reshape(c, n) + 1.0
        z = (r - 0.375) / (c * n + 0.25)
        from scipy.special import ndtri

        z = ndtri(z)
        out.append(_ess_raw(z))
    return np.array(out) if len(out) > 1 else out[0]


def _ess_raw(x):
    c, n = x.shape
    means = x.mean(axis=1, keepdims=True)
    xc = x - means
    # per-chain autocovariance via FFT
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, nfft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), nfft, axis=1)[:, :n].real / n
    W = acov[:, 0].mean()
    var_w = x.var(axis=1, ddof=1).mean()
    B = x.mean(axis=1).var(ddof=1) * 1.0 if c > 1 else 0.0
    var_plus = (n - 1) / n * var_w + B
    rho = 1.0 - (W - acov.mean(axis=0)) / var_plus
    # Geyer initial monotone positive sequence
    tau = 0.0
    prev = np.inf
    t = 1
    tau = 1.0
    while t + 1 < n:
        pair = rho[t] + rho[t + 1]
        if pair < 0:
            break
        pair = min(pair, prev)
        prev = pair
        tau += 2.0 * pair
        t += 2
    return c * n / max(tau, 1e-12)


class MCMCData:
    """Minimal InferenceData-like container: posterior draws per RV with
    leading (chain, draw) plus sample stats — what mean_extract/map_extract
    (gpmcmc.py:404-430) and the diagnostics need."""

    def __init__(self, posterior: dict, sample_stats: dict):
        self.posterior = posterior
        self.sample_stats = sample_stats

    def posterior_mean(self):
        return {
            k: np.asarray(v).mean(axis=(0, 1)) for k, v in self.posterior.items()
        }

    def max_logp_point(self):
        lp = np.asarray(self.sample_stats["lp"])
        idx = np.unravel_index(np.argmax(lp), lp.shape)
        point = {
            k: np.asarray(v)[idx] for k, v in self.posterior.items()
        }
        return point, float(lp[idx])

    def rhat(self):
        return {
            k: split_rhat(
                np.asarray(v).reshape(v.shape[0], v.shape[1], -1))
            for k, v in self.posterior.items()
        }

    def ess(self):
        return {
            k: ess_bulk(np.asarray(v)) for k, v in self.posterior.items()
        }

    def summary(self):
        lines = []
        for k, v in self.posterior.items():
            v = np.asarray(v)
            lines.append(
                f"{k}: mean={v.mean(axis=(0, 1))}, rhat={self.rhat()[k]}")
        div = np.asarray(self.sample_stats.get("diverging", np.zeros(1)))
        lines.append(f"divergences: {int(div.sum())}")
        return "\n".join(lines)

    def to_dict(self):
        """The arviz ``from_dict`` schema: posterior/sample_stats groups of
        (chain, draw[, ...]) arrays plus coords/dims, so downstream arviz
        workflows from the reference (``fit(return_data=True)`` returning
        InferenceData, gpmcmc.py:175-182) interchange cleanly even without
        arviz installed."""
        chains, draws = next(iter(
            np.asarray(v).shape[:2] for v in self.posterior.values()))
        dims = {}
        coords = {"chain": np.arange(chains), "draw": np.arange(draws)}
        for k, v in self.posterior.items():
            v = np.asarray(v)
            if v.ndim > 2:
                dims[k] = [f"{k}_dim_{i}" for i in range(v.ndim - 2)]
                for i, size in enumerate(v.shape[2:]):
                    coords[f"{k}_dim_{i}"] = np.arange(size)
        return {
            "posterior": {k: np.asarray(v) for k, v in self.posterior.items()},
            "sample_stats": {
                k: np.asarray(v) for k, v in self.sample_stats.items()},
            "coords": coords,
            "dims": dims,
        }

    def to_inference_data(self):
        """arviz InferenceData when arviz is importable; otherwise the
        equivalent ``to_dict`` schema (arviz is an optional dependency)."""
        d = self.to_dict()
        try:
            import arviz as az
        except ImportError:
            return d
        return az.from_dict(
            posterior=d["posterior"], sample_stats=d["sample_stats"],
            coords={k: v for k, v in d["coords"].items()
                    if k not in ("chain", "draw")},
            dims=d["dims"])


def as_inference_data(data):
    """arviz InferenceData when arviz is importable, the input
    otherwise — the facade's ``fit(return_data=True)`` contract
    (reference gpmcmc.py:175-182 returns pm.sample's InferenceData;
    arviz is an optional dependency here, and MCMCData carries the
    same schema via .to_dict())."""
    if not isinstance(data, MCMCData):
        return data
    try:
        import arviz  # noqa: F401
    except ImportError:
        return data
    return data.to_inference_data()


def sample_rvpack(rvpack, neg_log_post, draws=1000, tune=1000, chains=4,
                  target_accept=0.8, random_seed=0, max_treedepth=10,
                  z0=None, verbose=False, sampler=None,
                  steps_per_call=100, adapt_tlen=True,
                  curvature_mass=False, vec="vmap",
                  pilot=0, temper=0, beta_min=0.25) -> "MCMCData":
    """Run NUTS/HMC over an RVPack's unconstrained space and unpack draws
    into constrained posterior arrays.

    sampler=None resolves to 'hmc' on TPU (the nested-while NUTS
    transition trips a runtime fault there — docs/TPU_NOTES.md; this
    covers the BO-refinement and inverse-problem posteriors, which carry
    the same GP-NLML potential), 'nuts' elsewhere.  'hmc_host' keeps the
    integrator on the host and launches ONE value+grad program per
    leapfrog — the MAP program class, the only one demonstrated stable
    at n=16384 on this platform (every compiled transition program
    faults the worker there; docs/TPU_NOTES.md round 3).

    vec ('hmc_host', chains >= 2): chain-batching mode — 'vmap'
    (default), 'map' (lax.map over chains: the n=16384 route, where
    the vmapped program dies in the remote compiler), '0' (serial
    per-chain launches).  ANDVARANAUT_MCMC_VEC overrides.
    pilot ('hmc_host'): > 0 runs the two-stage pilot-mass schedule
    (host_hmc.hmc_host_sample pilot=) — the measured large-n recipe
    where in-warmup Welford mass fails.
    temper ('hmc_host', batched): > 0 adds `temper` parallel-tempering
    lanes on a geometric inverse-temperature ladder down to beta_min
    (host_hmc betas=) — the `chains` cold chains plus `temper` hot
    lanes all advance in the one batched launch, and free host-side
    replica-exchange swaps carry basin-crossing states from the hot
    lanes into the cold chains (the between-chain mixing lever for
    wide flat posterior basins — the measured 16k regime,
    docs/TPU_NOTES.md round 5).  Returned MCMCData has `chains`
    chains, as without tempering.
    curvature_mass: for 'hmc_host' with a warm z0 (a MAP point): fix
    the mass matrix to the finite-difference curvature at z0
    (host_hmc.map_diag_inv_mass, 2*dim extra launches) and skip Welford
    adaptation — the short-warmup Welford window was the measured 16k
    budget-16 accept collapse (0.08, docs/TPU_NOTES.md round 4).
    Ignored by the compiled samplers."""
    from .._config import is_tpu

    if sampler is None:
        sampler = "hmc" if is_tpu() else "nuts"
    if sampler in ("hmc", "hmc_host") and max_treedepth == 10:
        max_treedepth = 6

    def logp(z):
        return -neg_log_post(z)

    if z0 is None:
        z0 = rvpack.z0()
    if sampler == "hmc_host":
        import os

        from . import host_hmc

        u_vg = jax.jit(jax.value_and_grad(neg_log_post))

        def host_fn(z):
            return u_vg(jnp.asarray(z))

        vec_fn = None
        mode = os.environ.get("ANDVARANAUT_MCMC_VEC", "") or vec
        if mode not in ("vmap", "map", "0"):
            # never silently fall through to vmap — at 16k that is
            # the mode that kills the remote compiler
            raise ValueError(
                f"vec / ANDVARANAUT_MCMC_VEC must be one of "
                f"'vmap', 'map', '0'; got {mode!r}")
        betas = None
        if temper:
            if mode == "0":
                raise ValueError(
                    "temper requires the batched route (vec 'vmap' "
                    "or 'map'), not vec='0'")
            # geometric hot ladder below the cold chains: e.g.
            # temper=4, beta_min=0.25 -> 0.71, 0.50, 0.35, 0.25
            betas = np.concatenate([
                np.ones(chains),
                float(beta_min) ** (np.arange(1, int(temper) + 1)
                                    / float(temper))])
            chains = chains + int(temper)
        if chains >= 2 and mode != "0":
            # one batched launch advances ALL chains a leapfrog — the
            # lockstep multi-chain route (host_hmc vec_eval).  Mode
            # 'vmap' batches the chain axis; 'map' runs lax.map over
            # chains inside one program (same per-chain shape — the
            # 16k route: jax.vmap of the 16k value+grad dies in the
            # remote compiler while lax.map compiles and runs,
            # measured round 5); '0' = serial per-chain launches.
            # ANDVARANAUT_MCMC_VEC overrides.
            vg_one = jax.value_and_grad(neg_log_post)
            if mode == "map":
                vec_vg = jax.jit(lambda Z: jax.lax.map(vg_one, Z))
            else:
                vec_vg = jax.jit(jax.vmap(vg_one))

            def vec_fn(Z):
                return vec_vg(jnp.asarray(Z))

        if not curvature_mass or pilot:
            # an explicit pilot schedule supersedes the automatic
            # curvature mass: pilot-draw variances are the estimand
            # itself and measured better at 16k (docs/TPU_NOTES.md)
            im0 = None
        elif vec_fn is not None:
            # probe through the chain-batched program: the serial
            # program then never compiles (~80 s saved at 16k)
            im0 = host_hmc.map_diag_inv_mass_batched(
                vec_fn, np.asarray(z0), chains)
        else:
            im0 = host_hmc.map_diag_inv_mass(host_fn, np.asarray(z0))
        res = host_hmc.hmc_host_sample(
            host_fn, z0, num_warmup=tune,
            num_samples=draws, num_chains=chains,
            target_accept=target_accept, budget=2 ** max_treedepth,
            seed=random_seed, inv_mass0=im0, adapt_mass=im0 is None,
            vec_eval=vec_fn, pilot=pilot, betas=betas)
    else:
        res = nuts_sample(
            logp, z0, key=jax.random.PRNGKey(random_seed),
            num_warmup=tune, num_samples=draws, num_chains=chains,
            target_accept=target_accept, max_treedepth=max_treedepth,
            sampler=sampler, steps_per_call=steps_per_call,
            adapt_tlen=adapt_tlen)
    zdraws = np.asarray(res["z"])  # (chains, draws, dim)
    posterior = {}
    for rv, off in zip(rvpack.rvs, rvpack.offsets):
        block = zdraws[..., off : off + rv.size]
        vals = np.asarray(rv.forward(jnp.asarray(block)))
        posterior[rv.name] = vals[..., 0] if rv.size == 1 else vals
    stats = {
        "lp": np.asarray(res["lp"]),
        "diverging": np.asarray(res["diverging"]),
        "accept": np.asarray(res["accept"]),
        "depth": np.asarray(res["depth"]),
        "eps": np.asarray(res["eps"]),
    }
    data = MCMCData(posterior, stats)
    if verbose:
        print(data.summary())
        if "swap_accept" in res:
            print("tempering ladder swap accept:",
                  np.array2string(np.asarray(res["swap_accept"]),
                                  precision=2))
    return data


def _converted_xy(cfg):
    """Apply the (non-learnable) per-column conversions: the shared
    prologue of every fixed-warping objective builder."""
    n, nx = cfg.x.shape
    xin = np.zeros((n, nx))
    for i in range(nx):
        xin[:, i] = np.asarray(cfg.xconrevs[i].con(cfg.x[:, i]))
    yin = np.asarray(cfg.yconrevs[0].con(cfg.y[:, 0]))
    return xin, yin


def _resolve_mcmc_block(n: int) -> int:
    """Factorisation block of the mixed MCMC objective (see the inline
    rationale at the make_mixed_objective call site);
    ANDVARANAUT_MCMC_BLOCK overrides."""
    env_block = _os.environ.get("ANDVARANAUT_MCMC_BLOCK")
    if env_block:
        block = int(env_block)
        if block < 1:
            raise ValueError(
                "ANDVARANAUT_MCMC_BLOCK must be a positive int, got "
                f"{env_block!r}")
        return block
    return n if n <= 512 else min(256, max(32, n // 2))


def sample_model(cfg, draws=1000, tune=1000, chains=4, target_accept=0.8,
                 random_seed=0, max_treedepth=10, verbose=False,
                 mixed=None, sampler=None, steps_per_call=100,
                 adapt_tlen=True, mesh=None, pilot=0, temper=0,
                 beta_min=0.25, **kwargs):
    """NUTS/HMC posterior over a FitConfig's hyperparameters — the
    engine-level analogue of pm.sample inside __fit (gpmcmc.py:351).

    mesh: a jax.sharding.Mesh routes every leapfrog's value+grad
    through the row-sharded closed-form pipeline
    (sharded.make_sharded_mixed_objective, or the warped variant for
    iwgp/cwgp configs) — N chips per leapfrog, host integrator
    (sampler defaults to 'hmc_host'; the reference's only multi-chain
    axis was multiprocessing on one host, gpmcmc.py:351).

    mixed: route the NLML through the blocked mixed-precision
    factorisation with closed-form gradients (bigfit.make_mixed_objective)
    — the compact program TPU needs (reverse-differentiated f64
    chol_nlml inlines platform-pathological ops into every leapfrog).
    Default: on for TPU when the model has no learnable warpings.

    sampler: 'nuts', 'hmc' or 'hmc_host'.  Default: on TPU, 'hmc' up to
    n=2048 (the largest compiled-transition config demonstrated green —
    the nested-while NUTS transition AND, at 16k, every compiled
    transition shape trip a runtime fault on this platform,
    docs/TPU_NOTES.md) and 'hmc_host' above it (host integrator, one
    MAP-class value+grad launch per leapfrog — measured fault-free at
    n=16384 with ~2% launch overhead); 'nuts' elsewhere.
    """
    from ..gp import engine

    from .._config import is_tpu

    if sampler is None:
        if mesh is not None:
            sampler = "hmc_host"
        elif is_tpu():
            sampler = "hmc_host" if cfg.x.shape[0] > 2048 else "hmc"
        else:
            sampler = "nuts"
    if sampler in ("hmc", "hmc_host") and max_treedepth == 10:
        # HMC trajectory lengths are jittered uniformly within the
        # 2**depth budget (NUTS stops adaptively); these low-dimensional
        # hyperposteriors mix well under a 64-step budget
        max_treedepth = 6
    if is_tpu() and sampler == "nuts" and draws + tune > 40:
        import warnings

        warnings.warn(
            "GP-objective NUTS beyond ~40-60 transitions is known to "
            "crash this TPU platform's worker process (runtime fault; "
            "see docs/TPU_NOTES.md and benchmarks/nuts_tpu_repro.py). "
            "Use sampler='hmc' (the TPU default), run MCMC on the CPU "
            "backend, or reduce draws+tune.")
    if mixed is None:
        mixed = is_tpu()
    if mesh is not None:
        from ..gp import sharded

        n = cfg.x.shape[0]
        block = min(_resolve_mcmc_block(n), 256)
        if cfg.iwgp or cfg.cwgp:
            rvpack, nlp, _ = sharded.make_sharded_warped_objective(
                mesh, cfg, block=block)
        else:
            xin, yin = _converted_xy(cfg)
            rvpack, nlp, _ = sharded.make_sharded_mixed_objective(
                mesh, xin, yin, kerns=cfg.kerns, ops=cfg.ops,
                noise=cfg.noise, truncate=cfg.truncate,
                jitter=cfg.jitter, block=block)
    elif mixed and (cfg.iwgp or cfg.cwgp):
        # learnable warpings through the mixed path: closed-form kernel
        # gradients + elementwise-AD warp terms (bigfit.make_warped_vg),
        # wrapped as a custom-vjp scalar objective exactly like
        # make_mixed_objective
        import jax as _jax

        from ..gp import bigfit

        n = cfg.x.shape[0]
        block = _resolve_mcmc_block(n)
        rvpack, _vg = bigfit.make_warped_vg(cfg, block=block)

        @_jax.custom_vjp
        def _logl(z):
            return _vg(z)[0]

        def _fwd(z):
            return _vg(z)

        def _bwd(grad, ct):
            return (ct * grad,)

        _logl.defvjp(_fwd, _bwd)

        def nlp(z):
            return -(_logl(z) + rvpack.log_prior(z))
    elif mixed:
        from ..gp import bigfit

        n = cfg.x.shape[0]
        xin, yin = _converted_xy(cfg)
        # factorisation block: 256-capped measured best for the full
        # value+grad objective (block=512 at n=2048 was 18% SLOWER
        # end-to-end despite the bare NLML preferring larger blocks —
        # the gradient pipeline's inverse/contraction stages scale
        # differently; docs/TPU_NOTES.md).  At n <= 512 a single-block
        # factorisation wins outright: blocked_cholesky routes it
        # through ONE fused pair-kernel call (vs per-step emulated-f64
        # chols + panel/syrk machinery), and the gradient pipeline
        # reuses its stored inverse directly.
        # ANDVARANAUT_MCMC_BLOCK overrides (e.g. 1024 at n=16k, where
        # the 64-step block=256 pipeline pays its per-step glue 4x and
        # the MAP-fit evidence says 1024 is the value+grad optimum).
        block = _resolve_mcmc_block(n)
        rvpack, nlp = bigfit.make_mixed_objective(
            xin, yin, kerns=cfg.kerns, ops=cfg.ops, noise=cfg.noise,
            truncate=cfg.truncate, jitter=cfg.jitter,
            block=block)
    else:
        rvpack, nlp = engine.build_objective(cfg)
    z0 = rvpack.z0()
    start = kwargs.pop("start", None)
    warm = False
    if start is not None:
        try:
            z0 = rvpack.pack_values(start)
            warm = True
        except (KeyError, TypeError):
            pass
    return sample_rvpack(
        rvpack, nlp, draws=draws, tune=tune, chains=chains,
        target_accept=target_accept, random_seed=random_seed,
        max_treedepth=max_treedepth, z0=z0, verbose=verbose,
        sampler=sampler, steps_per_call=steps_per_call,
        adapt_tlen=adapt_tlen,
        # a warm start is (almost always) a fitted MAP point: fix the
        # host sampler's mass to the curvature there instead of a
        # short-warmup Welford estimate (no-op for compiled samplers)
        curvature_mass=warm, pilot=pilot, temper=temper,
        beta_min=beta_min,
        # chain batching: lax.map above the measured vmap
        # compile-death boundary (vmap green through n=8192, dead at
        # 16384 — benchmarks/vec16k_probe*.py)
        vec="map" if is_tpu() and cfg.x.shape[0] > 8192 else "vmap")
