"""Fixed Sobel edge-detection filters.

API-surface parity: the reference ships util/filter.py (Horizontal/Vertical
EdgeDetectionCNN star-imported by the model and engine but never invoked —
SURVEY.md 1).  Implemented as pure jnp convolutions with the fixed kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_H_KERNEL = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)
_V_KERNEL = _H_KERNEL.T.copy()


def _edge_conv(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """x: (B, 1, H, W) -> same shape, 3x3 fixed-kernel conv, padding 1."""
    w = jnp.asarray(kernel.reshape(3, 3, 1, 1))
    x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
    y = jax.lax.conv_general_dilated(
        x_nhwc, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.transpose(y, (0, 3, 1, 2))


def horizontal_edges(x: jnp.ndarray) -> jnp.ndarray:
    return _edge_conv(x, _H_KERNEL)


def vertical_edges(x: jnp.ndarray) -> jnp.ndarray:
    return _edge_conv(x, _V_KERNEL)


class HorizontalEdgeDetectionCNN:
    """Callable-class spelling kept for API parity."""

    def __call__(self, x):
        return horizontal_edges(x)


class VerticalEdgeDetectionCNN:
    def __call__(self, x):
        return vertical_edges(x)
