"""Jitted SPMD train step: bf16 forward/backward, fp32 AdamW, per-iteration
LR injection, gradient accumulation.

Replaces the reference's DDP + AMP GradScaler stack
(tulip/util/misc.py:288-329, engine_upsampling.py:77-98): on TPU the model
computes in bf16 (fp32 exponent range — no loss scaling needed), master
params and Adam moments stay fp32, and the cross-chip gradient reduction is
an XLA collective inserted by the partitioner — parameters replicated, batch
sharded over the 'data' mesh axis.

Optimizer parity: AdamW(betas=(0.9, 0.95)), weight decay applied only to
params with ndim > 1 — the effective behaviour of timm's
param_groups_layer_decay grouping used by the reference
(main_lidar_upsampling.py:282-283).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.tulip import TulipModel, apply_model


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 micro-step counter


def make_optimizer(weight_decay: float, accum_iter: int = 1):
    """AdamW with lr injected per-step (the reference adjusts lr every
    iteration, engine_upsampling.py:69-70) and mean-gradient accumulation
    over ``accum_iter`` micro-steps (engine:90-98)."""
    def wd_mask(params):
        return jax.tree_util.tree_map(lambda p: jnp.ndim(p) > 1, params)

    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, b1=0.9, b2=0.95, eps=1e-8,
        weight_decay=weight_decay, mask=wd_mask)
    if accum_iter > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_iter)
    return tx


def _set_lr(opt_state, lr, accum_iter: int):
    """Write the per-iteration LR into the injected-hyperparams state."""
    if accum_iter > 1:
        inner = opt_state.inner_opt_state
        inner.hyperparams["learning_rate"] = lr
        return opt_state._replace(inner_opt_state=inner)
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def make_train_step(model: TulipModel, tx, *, accum_iter: int = 1,
                    compute_dtype=jnp.bfloat16, donate: bool = True):
    """Build the jitted train step.

    step(state, low, high, lr, rng) -> (state, (total_loss, pixel_loss))

    low/high: (B, C, H, W) device arrays (batch sharded over 'data').
    lr: scalar fp32 (host-computed per-iteration cosine schedule).
    """
    def loss_fn(params, low, high, rng):
        _, total_loss, pixel_loss = apply_model(
            params, model, low, high, mode="train", rng=rng,
            compute_dtype=compute_dtype)
        return total_loss, pixel_loss

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, low, high, lr, rng):
        (total_loss, pixel_loss), grads = grad_fn(state.params, low, high, rng)
        opt_state = _set_lr(state.opt_state, lr, accum_iter)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), (total_loss,
                                                               pixel_loss)

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def init_train_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))
