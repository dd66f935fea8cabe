"""Sliding-window inference for large images (Segmenter eval helper).

Parity target: ``semseg/utils/segmenter_eval.py:51-123`` — pad/resize the
image so the short side is >= window, run the model over a regular grid of
(window, stride) crops, average overlapping logits, crop back.

TPU note: all windows of one image are batched into a single model call
(static window shape), so the whole sweep is one jitted forward instead of
a Python loop of small launches.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax.numpy as jnp

from robseg_tpu.ops.resize import resize_bilinear

Array = jnp.ndarray


def sliding_window_logits(logits_fn: Callable, image: Array, *,
                          window: int = 512, stride: int = 512,
                          num_classes: int) -> Array:
    """image: (H, W, 3) -> logits (H, W, C) averaged over window grid."""
    h, w = image.shape[:2]
    pad_h = max(window - h, 0)
    pad_w = max(window - w, 0)
    if pad_h or pad_w:
        image = jnp.pad(image, ((0, pad_h), (0, pad_w), (0, 0)))
    ph, pw = image.shape[:2]

    hs = list(range(0, max(ph - window, 0) + 1, stride))
    ws = list(range(0, max(pw - window, 0) + 1, stride))
    if hs[-1] + window < ph:
        hs.append(ph - window)
    if ws[-1] + window < pw:
        ws.append(pw - window)

    crops = jnp.stack([image[i:i + window, j:j + window]
                       for i in hs for j in ws])
    logits = logits_fn(crops)  # (n, window, window, C) in one call

    out = jnp.zeros((ph, pw, num_classes), logits.dtype)
    count = jnp.zeros((ph, pw, 1), logits.dtype)
    idx = 0
    for i in hs:
        for j in ws:
            out = out.at[i:i + window, j:j + window].add(logits[idx])
            count = count.at[i:i + window, j:j + window].add(1.0)
            idx += 1
    out = out / count
    return out[:h, :w]


def multi_scale_flip_logits(logits_fn: Callable, images: Array, *,
                            scales=(1.0,), flip: bool = False,
                            num_classes: int, align: int = 32) -> Array:
    """Multi-scale + horizontal-flip softmax-probability averaging.

    Parity: ``semseg/val.py:329-374`` (``evaluate_msf``): each scale is
    rounded up to a multiple of ``align``; probabilities (not logits) are
    summed across scales and flips.
    """
    import jax
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    acc = jnp.zeros((b, h, w, num_classes), jnp.float32)
    for scale in scales:
        nh = -(-int(scale * h) // align) * align
        nw = -(-int(scale * w) // align) * align
        scaled = resize_bilinear(images, (nh, nw), align_corners=True)
        logits = logits_fn(scaled)
        logits = resize_bilinear(logits, (h, w), align_corners=True)
        acc = acc + jax.nn.softmax(logits, axis=-1)
        if flip:
            fl = scaled[:, :, ::-1]
            logits = logits_fn(fl)[:, :, ::-1]
            logits = resize_bilinear(logits, (h, w), align_corners=True)
            acc = acc + jax.nn.softmax(logits, axis=-1)
    return acc
