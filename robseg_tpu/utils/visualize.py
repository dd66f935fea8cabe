"""Segmentation palettes and mask rendering.

Parity target: ``semseg/utils/visualize.py`` — ADE/VOC color palettes and
``generate_palette``. Palettes here are generated procedurally (the classic
VOC bit-twiddling palette and an HSV-spread fallback) rather than stored as
literal tables.
"""

from __future__ import annotations

import colorsys
from typing import Optional

import numpy as np


def voc_palette(num_classes: int = 21) -> np.ndarray:
    """The canonical PASCAL-VOC palette (bit-reversal construction)."""
    def bitget(v, i):
        return (v >> i) & 1

    pal = np.zeros((num_classes, 3), np.uint8)
    for k in range(num_classes):
        r = g = b = 0
        c = k
        for j in range(8):
            r |= bitget(c, 0) << (7 - j)
            g |= bitget(c, 1) << (7 - j)
            b |= bitget(c, 2) << (7 - j)
            c >>= 3
        pal[k] = (r, g, b)
    return pal


def generate_palette(num_classes: int, seed: int = 0) -> np.ndarray:
    """Deterministic HSV-spread palette for arbitrary class counts."""
    rng = np.random.default_rng(seed)
    pal = np.zeros((num_classes, 3), np.uint8)
    for k in range(num_classes):
        h = (k * 0.6180339887) % 1.0  # golden-ratio hue spread
        s = 0.55 + 0.4 * float(rng.random())
        v = 0.7 + 0.3 * float(rng.random())
        pal[k] = tuple(int(255 * c) for c in colorsys.hsv_to_rgb(h, s, v))
    return pal


def colorize_mask(mask: np.ndarray, palette: Optional[np.ndarray] = None,
                  num_classes: Optional[int] = None,
                  ignore_label: int = -1) -> np.ndarray:
    """(H, W) int mask -> (H, W, 3) uint8 RGB; ignored pixels are black."""
    if palette is None:
        n = num_classes or int(mask.max()) + 1
        palette = voc_palette(n) if n <= 21 else generate_palette(n)
    out = np.zeros(mask.shape + (3,), np.uint8)
    valid = mask != ignore_label
    out[valid] = palette[np.clip(mask[valid], 0, len(palette) - 1)]
    return out


def overlay(image: np.ndarray, mask_rgb: np.ndarray,
            alpha: float = 0.5) -> np.ndarray:
    """Blend a [0,1] float image with a palette mask."""
    img = (image * 255).astype(np.float32)
    return np.clip((1 - alpha) * img + alpha * mask_rgb.astype(np.float32),
                   0, 255).astype(np.uint8)
