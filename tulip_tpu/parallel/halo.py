"""Halo-exchange primitives for width (W-axis) sequence parallelism.

The TULIP token grid is a *cylindrical* range image: every cross-shard op in
the model is a cyclic pattern along W — the circular padding of the patch
embed (tulip/model/tulip.py:59-61) and the shifted-window rolls
(tulip.py:289-291).  Under a W-sharded layout both become a
``lax.ppermute`` of a few boundary columns over the mesh ring (ICI
neighbors), which is exactly the "shard the token grid, halo-exchange the
shifted windows" design anticipated in SURVEY.md section 5.7.

The helpers are context-switched: outside a sequence-parallel trace they are
the plain single-device ops, so the model code has ONE implementation.  The
context is set by parallel/sp.py around the shard_map'd region.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

_SEQ_AXIS = None  # mesh axis name active inside a shard_map trace, else None


@contextmanager
def sequence_axis(name: str):
    """Activate W-sharded semantics for roll_hw/circular_pad_w during a
    shard_map trace."""
    global _SEQ_AXIS
    prev = _SEQ_AXIS
    _SEQ_AXIS = name
    try:
        yield
    finally:
        _SEQ_AXIS = prev


def current_sequence_axis():
    return _SEQ_AXIS


def _axis_size(name: str) -> int:
    return jax.lax.psum(1, name)


def _recv_from_right(block: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Every shard receives ``block`` from its right (cyclic) neighbor."""
    n = _axis_size(axis_name)
    perm = [(i, (i - 1) % n) for i in range(n)]   # i sends to i-1
    return jax.lax.ppermute(block, axis_name, perm)


def _recv_from_left(block: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Every shard receives ``block`` from its left (cyclic) neighbor."""
    n = _axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]   # i sends to i+1
    return jax.lax.ppermute(block, axis_name, perm)


def roll_w(x: jnp.ndarray, shift: int, axis: int = 2) -> jnp.ndarray:
    """Global cyclic roll along the (possibly sharded) W axis.

    |shift| must be < the local width — true for the model's rolls (half a
    window, 4 columns) at any practical shard width."""
    if shift == 0:
        return x
    if _SEQ_AXIS is None:
        return jnp.roll(x, shift, axis=axis)
    idx = [slice(None)] * x.ndim
    if shift < 0:    # left roll: tail keeps, first |s| cols go to left nbr
        s = -shift
        idx[axis] = slice(0, s)
        halo = _recv_from_right(x[tuple(idx)], _SEQ_AXIS)
        idx[axis] = slice(s, None)
        return jnp.concatenate([x[tuple(idx)], halo], axis=axis)
    s = shift        # right roll: last s cols go to right nbr
    idx[axis] = slice(x.shape[axis] - s, None)
    halo = _recv_from_left(x[tuple(idx)], _SEQ_AXIS)
    idx[axis] = slice(0, x.shape[axis] - s)
    return jnp.concatenate([halo, x[tuple(idx)]], axis=axis)


def roll_hw(x: jnp.ndarray, sh: int, sw: int) -> jnp.ndarray:
    """Roll a (B, H, W, C) grid by (sh, sw).  H stays shard-local; W is
    cyclic across shards when a sequence axis is active."""
    if _SEQ_AXIS is None:
        if sh or sw:
            return jnp.roll(x, shift=(sh, sw), axis=(1, 2))
        return x
    if sh:
        x = jnp.roll(x, sh, axis=1)
    return roll_w(x, sw, axis=2)


def circular_pad_w(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Cyclically pad the W axis of (B, H, W, C) by (left, right) columns —
    the patch-embed circular padding (reference: tulip.py:59-61).  Under
    sequence parallelism the pad columns come from the ring neighbors."""
    if _SEQ_AXIS is None:
        return jnp.concatenate(
            [x[:, :, x.shape[2] - left:], x, x[:, :, :right]], axis=2)
    lh = _recv_from_left(x[:, :, x.shape[2] - left:], _SEQ_AXIS)
    rh = _recv_from_right(x[:, :, :right], _SEQ_AXIS)
    return jnp.concatenate([lh, x, rh], axis=2)
