"""Jit-compiled L-BFGS with zoom linesearch (optax), run under lax.while_loop.

Replaces pm.find_MAP's host-side scipy L-BFGS-B over a PyTensor-compiled
objective (reference gpmcmc.py:326-346): here objective, gradient, line
search, and the update loop all execute on device in one compiled program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
import optax.tree_utils as otu

# optax renamed tree_l2_norm -> tree_norm in 0.2.5 (the old name warns
# and will be removed); support both
_tree_norm = getattr(otu, "tree_norm", None) or otu.tree_l2_norm


@partial(jax.jit, static_argnames=("fun", "max_iter", "tol"))
def minimize_lbfgs(fun, z0, max_iter: int = 500, tol: float = 1e-8):
    """Minimise fun(z) from z0.  Returns (z_opt, value, grad_norm, n_iter)."""
    opt = optax.lbfgs()
    value_and_grad_fun = optax.value_and_grad_from_state(fun)

    def step(carry):
        z, state = carry
        value, grad = value_and_grad_fun(z, state=state)
        updates, state = opt.update(
            grad, state, z, value=value, grad=grad, value_fn=fun)
        z = optax.apply_updates(z, updates)
        return z, state

    def cont(carry):
        _, state = carry
        count = otu.tree_get(state, "count")
        grad = otu.tree_get(state, "grad")
        err = _tree_norm(grad)
        return (count == 0) | ((count < max_iter) & (err >= tol))

    z, state = jax.lax.while_loop(cont, step, (z0, opt.init(z0)))
    value = otu.tree_get(state, "value")
    grad = otu.tree_get(state, "grad")
    count = otu.tree_get(state, "count")
    return z, value, _tree_norm(grad), count
