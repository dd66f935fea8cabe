"""Interpolation as matrix multiplies — the TPU-native way to resize.

``F.interpolate(..., mode='bilinear')`` and ``nn.AdaptiveAvgPool2d`` are
separable linear maps along H and W. For the static shapes this framework
runs (fixed crops, fixed pool bins) we materialize the two 1-D interpolation
matrices at trace time (numpy constants folded into the XLA program) and
apply them as einsums, which XLA places on the MXU. This supports *both*
align_corners conventions exactly:

  * align_corners=False (UperNet/Segmenter, ``uperforseg.py:416-418``):
    source coord = (i + 0.5) * scale - 0.5, clamped;
  * align_corners=True (PSPNet/PPM, ``ddcat_psp.py:28,474``):
    source coord = i * (in - 1) / (out - 1).

Adaptive average pooling uses torch's region rule start=floor(i*In/Out),
end=ceil((i+1)*In/Out).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

Array = jnp.ndarray


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool
                   ) -> np.ndarray:
    """(out_size, in_size) row-stochastic linear-interpolation matrix."""
    m = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (
                out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    m[rows, lo] += 1.0 - w_hi
    m[rows, hi] += w_hi
    return m


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) averaging matrix for adaptive avg pooling."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        s = (i * in_size) // out_size
        e = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, s:e] = 1.0 / (e - s)
    return m


def _apply_separable(x: Array, mh: np.ndarray, mw: np.ndarray) -> Array:
    """x: (..., H, W, C); apply mh along H and mw along W.

    The einsums follow the CONTEXT matmul precision (round-3 change): under
    the strict-parity configuration (``--precision f32`` /
    ``jax_default_matmul_precision=float32``, as every CPU parity test
    pins) they are exact f32, unchanged from the old HIGHEST pin; under
    the production DEFAULT they run single-pass bf16 on the MXU like every
    conv in the model — profiled at 41 ms/attack-iteration when pinned to
    HIGHEST (6-pass f32 emulation), the single largest non-conv cost. The
    data quantization this admits is the same class as the model's own
    convs; the bf16 deviation probe (tools/bench_bf16.py) bounds the
    metric effect.
    """
    a = jnp.asarray(mh, x.dtype)
    b = jnp.asarray(mw, x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", a, x)
    x = jnp.einsum("pw,...owc->...opc", b, x)
    return x


# A polyphase shift+FMA upsample alternative was built and measured SLOWER
# than the einsum path (78.0 -> 64.2 step*imgs/s) — negative result recorded
# in BENCHMARKS.md ("polyphase upsample"); the code lived here until r4.


def resize_bilinear(x: Array, out_hw, align_corners: bool = False) -> Array:
    """Bilinear resize of NHWC (or HWC) tensors to ``out_hw = (H', W')``."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, _interp_matrix(h, oh, align_corners),
                            _interp_matrix(w, ow, align_corners))


def adaptive_avg_pool(x: Array, out_hw) -> Array:
    """torch AdaptiveAvgPool2d for NHWC tensors."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, _adaptive_pool_matrix(h, oh),
                            _adaptive_pool_matrix(w, ow))
