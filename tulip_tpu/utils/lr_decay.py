"""Layer-wise learning-rate decay (BEiT-style).

API-surface parity: the reference ships util/lr_decay.py (never imported at
runtime — main uses timm's param_groups_layer_decay instead,
main_lidar_upsampling.py:282).  Functional equivalent for the flat param
dict: assign each parameter a layer id from its key, scale its LR by
layer_decay ** (num_layers - layer_id).
"""

from __future__ import annotations

from typing import Dict


def get_layer_id(name: str, num_layers: int) -> int:
    """Map a parameter key to a depth index: patch embed -> 0, encoder stage
    i -> i+1, everything else (decoder/head) -> num_layers."""
    if name.startswith("patch_embed"):
        return 0
    if name.startswith("layers."):
        return int(name.split(".")[1]) + 1
    return num_layers


def lr_scale_tree(params: Dict, num_layers: int,
                  layer_decay: float = 0.75) -> Dict[str, float]:
    """Per-parameter LR multipliers; feed into optax.masked / a custom
    scale-by-tree transformation."""
    return {k: layer_decay ** (num_layers - get_layer_id(k, num_layers))
            for k in params}


def scale_by_lr_tree(scales: Dict[str, float]):
    """optax transformation multiplying each update by its LR scale."""
    import optax

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return ({k: v * scales[k] for k, v in updates.items()}, state)

    return optax.GradientTransformation(init_fn, update_fn)
