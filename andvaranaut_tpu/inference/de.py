"""On-device differential evolution (best/1/bin with dithered mutation).

Replaces scipy.optimize.differential_evolution in the BO candidate search
(reference gpmcmc.py:683): the whole population loop runs jitted, with the
batched acquisition evaluated as one device op per generation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("fn", "popsize", "maxiter"))
def differential_evolution(fn, lo, hi, key, popsize: int = 0,
                           maxiter: int = 200, tol: float = 0.01,
                           recombination: float = 0.7):
    """Minimise fn over box [lo, hi].

    fn: batched objective (m, d) -> (m,).
    Returns (x_best (d,), f_best, n_gens).
    """
    d = lo.shape[0]
    npop = popsize if popsize > 0 else 15 * d
    k0, key = jax.random.split(key)
    pop = lo + (hi - lo) * jax.random.uniform(
        k0, (npop, d), dtype=lo.dtype)
    f = fn(pop)

    def cond(c):
        pop, f, key, it = c
        conv = jnp.std(f) <= tol * jnp.abs(jnp.mean(f)) + 1e-12
        return (it < maxiter) & (~conv)

    def body(c):
        pop, f, key, it = c
        key, kf, kr1, kr2, kcr, kj = jax.random.split(key, 6)
        F = jax.random.uniform(kf, (), minval=0.5, maxval=1.0,
                               dtype=lo.dtype)
        best = pop[jnp.argmin(f)]
        idx = jnp.arange(npop)
        r1 = jax.random.randint(kr1, (npop,), 0, npop - 1)
        r1 = jnp.where(r1 >= idx, r1 + 1, r1)
        r2 = jax.random.randint(kr2, (npop,), 0, npop - 1)
        r2 = jnp.where(r2 >= idx, r2 + 1, r2)
        mutant = best[None, :] + F * (pop[r1] - pop[r2])
        cross = jax.random.uniform(kcr, (npop, d)) < recombination
        # guarantee at least one crossed dim per member
        jrand = jax.random.randint(kj, (npop,), 0, d)
        cross = cross | (jnp.arange(d)[None, :] == jrand[:, None])
        trial = jnp.where(cross, mutant, pop)
        trial = jnp.clip(trial, lo, hi)
        ft = fn(trial)
        better = ft < f
        pop = jnp.where(better[:, None], trial, pop)
        f = jnp.where(better, ft, f)
        return pop, f, key, it + 1

    pop, f, key, it = jax.lax.while_loop(
        cond, body, (pop, f, key, jnp.asarray(0)))
    b = jnp.argmin(f)
    return pop[b], f[b], it
