"""LARS optimizer (Layer-wise Adaptive Rate Scaling).

API-surface parity: the reference ships util/lars.py (LARS for large-batch
training, never imported at runtime — SURVEY.md 1 'dead/vestigial').  Here it
is a first-class optax gradient transformation: trust-ratio scaling applied
to params with ndim > 1 (weights), plain SGD-with-momentum for biases/norms,
matching the standard LARS recipe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LarsState(NamedTuple):
    momentum: optax.Updates


def lars(learning_rate: float = 0.0, weight_decay: float = 0.0,
         momentum: float = 0.9, trust_coefficient: float = 0.001,
         eps: float = 1e-8):
    """Build a LARS gradient transformation.

    update = -lr * local_lr * (g + wd * p) applied through momentum, where
    local_lr = trust_coefficient * ||p|| / (||g + wd*p|| + eps) for
    multi-dimensional params and 1.0 otherwise.
    """

    def init_fn(params):
        return LarsState(momentum=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        assert params is not None, "LARS requires params"

        def one(g, p, m):
            g = g + weight_decay * p
            if jnp.ndim(p) > 1:
                p_norm = jnp.linalg.norm(p)
                g_norm = jnp.linalg.norm(g)
                local_lr = jnp.where(
                    (p_norm > 0) & (g_norm > 0),
                    trust_coefficient * p_norm / (g_norm + eps), 1.0)
            else:
                local_lr = 1.0
            m_new = momentum * m + local_lr * g
            return -learning_rate * m_new, m_new

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_p = treedef.flatten_up_to(params)
        flat_m = treedef.flatten_up_to(state.momentum)
        outs = [one(g, p, m) for g, p, m in zip(flat_u, flat_p, flat_m)]
        new_updates = treedef.unflatten([o[0] for o in outs])
        new_momentum = treedef.unflatten([o[1] for o in outs])
        return new_updates, LarsState(momentum=new_momentum)

    return optax.GradientTransformation(init_fn, update_fn)
