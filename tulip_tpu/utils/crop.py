"""RandomResizedCrop for range maps (numpy, host-side).

API-surface parity: the reference ships util/crop.py (a TF/TPU-style
RandomResizedCrop, never imported at runtime — SURVEY.md 1).  Reimplemented
as a numpy transform consistent with our host data pipeline: sample an area
fraction and log-uniform aspect ratio, crop, bilinear-resize back.
"""

from __future__ import annotations

import math

import numpy as np


class RandomResizedCrop:
    def __init__(self, size, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.scale = scale
        self.ratio = ratio

    def _sample_box(self, h, w):
        area = h * w
        for _ in range(10):
            target_area = area * np.random.uniform(*self.scale)
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            aspect = math.exp(np.random.uniform(*log_ratio))
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                i = np.random.randint(0, h - ch + 1)
                j = np.random.randint(0, w - cw + 1)
                return i, j, ch, cw
        return 0, 0, h, w  # fallback: full image

    @staticmethod
    def _resize_bilinear(img, out_h, out_w):
        h, w = img.shape[-2:]
        ys = np.linspace(0, h - 1, out_h)
        xs = np.linspace(0, w - 1, out_w)
        y0 = np.floor(ys).astype(int)
        x0 = np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = (ys - y0)[:, None]
        wx = (xs - x0)[None, :]
        g = img
        out = (g[..., y0, :][..., :, x0] * (1 - wy) * (1 - wx)
               + g[..., y0, :][..., :, x1] * (1 - wy) * wx
               + g[..., y1, :][..., :, x0] * wy * (1 - wx)
               + g[..., y1, :][..., :, x1] * wy * wx)
        return out.astype(img.dtype)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """img: (C, H, W) float array."""
        h, w = img.shape[-2:]
        i, j, ch, cw = self._sample_box(h, w)
        crop = img[..., i:i + ch, j:j + cw]
        return self._resize_bilinear(crop, *self.size)
