"""Latin-hypercube sampling with on-device random-CD optimisation.

Replaces ``scipy.stats.qmc.LatinHypercube(d, optimization="random-cd")``
(reference lhc.py:42-43).  The stratified draw and the centered-L2-discrepancy
coordinate-descent refinement both run as a single jitted JAX program, so the
10k-candidate LHC draws inside BO loops (gpmcmc.py:690-693) stay on device.

Unlike the reference, the ``seed`` argument is honoured (lhc.py:40-47 accepts
``seed`` but ignores it — SURVEY.md §7 lists this as a bug not to reproduce).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import dists
from ._config import default_dtype


def cd2_discrepancy(x) -> jnp.ndarray:
    """Centered L2 discrepancy (matches scipy.stats.qmc.discrepancy
    method='CD')."""
    x = jnp.asarray(x, dtype=default_dtype)
    n, d = x.shape
    z = x - 0.5
    az = jnp.abs(z)
    g = 1.0 + 0.5 * az - 0.5 * z * z
    term2 = jnp.sum(jnp.prod(g, axis=1))
    h = (
        1.0
        + 0.5 * (az[:, None, :] + az[None, :, :])
        - 0.5 * jnp.abs(x[:, None, :] - x[None, :, :])
    )
    term3 = jnp.sum(jnp.prod(h, axis=2))
    return (13.0 / 12.0) ** d - (2.0 / n) * term2 + (1.0 / n**2) * term3


def _stratified(key, n: int, d: int) -> jnp.ndarray:
    """Classic LHC: per column, one uniform point in each of n strata,
    randomly permuted."""
    kp, ku = jax.random.split(key)
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, n)
    )(jax.random.split(kp, d)).T  # (n, d)
    u = jax.random.uniform(ku, (n, d), dtype=default_dtype)
    return (perms.astype(default_dtype) + u) / n


def _swap_delta(x, r1, r2, c):
    """Change in CD2 from swapping rows r1<->r2 in column c.  O(n*d).

    Only the two entries x[r1,c], x[r2,c] change.  The pair term H[r1,r2] and
    all H entries not involving r1/r2 are invariant; diagonal entries swap
    (net zero).  So the delta reduces to the off-diagonal rows r1,r2 against
    all other rows, plus the row-product (term2) updates.
    """
    n, d = x.shape
    z = x - 0.5
    az = jnp.abs(z)
    g = 1.0 + 0.5 * az - 0.5 * z * z  # (n, d)

    a1, a2 = x[r1, c], x[r2, c]
    za1, za2 = jnp.abs(a1 - 0.5), jnp.abs(a2 - 0.5)
    g1_old, g1_new = g[r1, c], 1.0 + 0.5 * za2 - 0.5 * (a2 - 0.5) ** 2
    g2_old, g2_new = g[r2, c], 1.0 + 0.5 * za1 - 0.5 * (a1 - 0.5) ** 2
    p = jnp.prod(g, axis=1)
    d_term2 = p[r1] * (g1_new / g1_old - 1.0) + p[r2] * (g2_new / g2_old - 1.0)

    # Off-diagonal H rows for r1 and r2 against all j.
    xc = x[:, c]
    azc = az[:, c]
    h_r1 = jnp.prod(
        1.0
        + 0.5 * (az[r1] + az)
        - 0.5 * jnp.abs(x[r1] - x),
        axis=1,
    )  # (n,) full products, old values
    h_r2 = jnp.prod(
        1.0
        + 0.5 * (az[r2] + az)
        - 0.5 * jnp.abs(x[r2] - x),
        axis=1,
    )
    hc_r1_old = 1.0 + 0.5 * (za1 + azc) - 0.5 * jnp.abs(a1 - xc)
    hc_r1_new = 1.0 + 0.5 * (za2 + azc) - 0.5 * jnp.abs(a2 - xc)
    hc_r2_old = 1.0 + 0.5 * (za2 + azc) - 0.5 * jnp.abs(a2 - xc)
    hc_r2_new = 1.0 + 0.5 * (za1 + azc) - 0.5 * jnp.abs(a1 - xc)

    dh1 = h_r1 * (hc_r1_new / hc_r1_old - 1.0)
    dh2 = h_r2 * (hc_r2_new / hc_r2_old - 1.0)
    # Exclude j in {r1, r2}: the pair entry is invariant, diagonals swap.
    idx = jnp.arange(n)
    mask = (idx != r1) & (idx != r2)
    d_term3 = 2.0 * jnp.sum(jnp.where(mask, dh1 + dh2, 0.0))

    return -(2.0 / n) * d_term2 + (1.0 / n**2) * d_term3


@partial(jax.jit, static_argnums=(1, 2, 3))
def latin_hypercube(key, nsamps: int, nx: int, iters: int = 0) -> jnp.ndarray:
    """Unit-cube LHC points, optionally refined by ``iters`` random-CD swaps."""
    kx, ko = jax.random.split(key)
    x = _stratified(kx, nsamps, nx)
    if iters <= 0 or nsamps < 2:
        return x

    def body(i, carry):
        x, key = carry
        key, kc, kr = jax.random.split(key, 3)
        c = jax.random.randint(kc, (), 0, nx)
        r = jax.random.choice(kr, nsamps, (2,), replace=False)
        r1, r2 = r[0], r[1]
        delta = _swap_delta(x, r1, r2, c)
        v1, v2 = x[r1, c], x[r2, c]
        x = jax.lax.cond(
            delta < 0.0,
            lambda x: x.at[r1, c].set(v2).at[r2, c].set(v1),
            lambda x: x,
            x,
        )
        return x, key

    x, _ = jax.lax.fori_loop(0, iters, body, (x, ko))
    return x


def default_cd_iters(nsamps: int, nx: int) -> int:
    """Swap budget: enough to matter for experiment-design-sized draws, but
    bounded so 10k-candidate BO draws stay cheap."""
    if nsamps > 2048:
        return 0
    return min(10_000, 10 * nsamps * nx)


def lhc_sample(priors, nsamps: int, seed=None, optimization: str = "random-cd",
               iters: int | None = None) -> np.ndarray:
    """Draw nsamps LHC samples mapped through each prior's ppf per column
    (reference lhc.py:40-47)."""
    priors = [dists.from_prior(p) for p in priors]
    nx = len(priors)
    if seed is None:
        seed = int(np.random.randint(0, 2**31 - 1))
    key = jax.random.PRNGKey(seed)
    if optimization is None:
        n_iters = 0
    elif optimization == "random-cd":
        n_iters = default_cd_iters(nsamps, nx) if iters is None else iters
    else:
        raise ValueError("optimization must be None or 'random-cd'")
    pts = latin_hypercube(key, nsamps, nx, n_iters)
    # Keep strictly inside (0,1) so unbounded priors stay finite.
    tiny = np.finfo(np.float64).tiny
    pts = jnp.clip(pts, tiny, 1.0 - 1e-16)
    cols = [priors[j].ppf(pts[:, j]) for j in range(nx)]
    return np.stack([np.asarray(c) for c in cols], axis=1)
