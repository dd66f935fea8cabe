"""On-device training augmentation (the BASELINE north-star item).

Replaces the host-side PIL pipeline (``dataset_wrappers.py:45-93``: random
hflip, random short-edge scale in [0.5, 2]*base_size, pad-to-crop, gaussian
blur p=0.5, random crop) with a single batched, jit-compiled sampler:

  * all four geometric ops compose into ONE affine map from output-crop
    coordinates to source coordinates, evaluated with a bilinear gather
    (nearest for masks) — so the augmentation is a static-shape XLA program
    that runs on the accelerator, overlapped with the train step;
  * out-of-range samples read as 0 / label 0, reproducing the reference's
    bottom-right zero padding;
  * blur is a separable 5-tap gaussian with PIL-matching kernel radius
    semantics, applied with probability 0.5.

Numerics note: PIL's ``resize(BILINEAR)`` antialiases when downscaling;
direct bilinear sampling does not, so augmented pixels are not bit-identical
to the host pipeline — both are valid instances of the same augmentation
distribution. Use the host pipeline when strict reference-reproduction
matters; use this for throughput.

Inputs are batches padded to a fixed source size: images (B, Hs, Ws, 3)
float32 in [0,1], masks (B, Hs, Ws) int32, plus per-image valid (h, w).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _sample_bilinear(img: Array, ys: Array, xs: Array) -> Array:
    """img (H, W, C); ys/xs (h, w) float source coords; 0 outside."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]

    def gather(yi, xi):
        inside = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return img[yc, xc] * inside

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _sample_nearest(mask: Array, ys: Array, xs: Array, fill: int = 0) -> Array:
    h, w = mask.shape[0], mask.shape[1]
    yi = jnp.round(ys).astype(jnp.int32)
    xi = jnp.round(xs).astype(jnp.int32)
    inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yc = jnp.clip(yi, 0, h - 1)
    xc = jnp.clip(xi, 0, w - 1)
    return jnp.where(inside, mask[yc, xc], fill)


def _gauss_kernel(radius: Array) -> Array:
    """5-tap gaussian; sigma ~ radius (PIL GaussianBlur(radius) analogue)."""
    sigma = jnp.maximum(radius, 1e-3)
    off = jnp.arange(-2.0, 3.0)
    k = jnp.exp(-(off ** 2) / (2.0 * sigma ** 2))
    return k / k.sum()


def _blur(img: Array, radius: Array) -> Array:
    k = _gauss_kernel(radius)
    pad = [(2, 2), (0, 0), (0, 0)]
    x = jnp.pad(img, pad, mode="edge")
    x = sum(k[i] * x[i:i + img.shape[0]] for i in range(5))
    x = jnp.pad(x, [(0, 0), (2, 2), (0, 0)], mode="edge")
    x = sum(k[i] * x[:, i:i + img.shape[1]] for i in range(5))
    return x


def _augment_one(img, mask, valid_hw, rng, *, base_size, crop_size,
                 scale_lo, scale_hi):
    h = valid_hw[0].astype(jnp.float32)
    w = valid_hw[1].astype(jnp.float32)
    r_flip, r_scale, r_bp, r_br, r_cx, r_cy = jax.random.split(rng, 6)

    # random short-edge target in [0.5, 2] * base_size (inclusive randint in
    # the reference; a uniform float here)
    short = jax.random.uniform(r_scale, (), minval=scale_lo * base_size,
                               maxval=scale_hi * base_size)
    short_src = jnp.minimum(h, w)
    scale = short / short_src          # output px per source px
    # scaled size (reference rounds via int(); float here)
    oh = h * scale
    ow = w * scale
    # random crop origin in the scaled (and zero-padded to >= crop) image
    max_y = jnp.maximum(oh - crop_size, 0.0)
    max_x = jnp.maximum(ow - crop_size, 0.0)
    cy = jax.random.uniform(r_cy, ()) * max_y
    cx = jax.random.uniform(r_cx, ()) * max_x

    # output pixel (i, j) -> scaled coords (cy + i, cx + j) -> source coords
    ii = jnp.arange(crop_size, dtype=jnp.float32)
    ys = (cy + ii) / scale
    xs = (cx + ii) / scale
    ys2 = jnp.broadcast_to(ys[:, None], (crop_size, crop_size))
    xs2 = jnp.broadcast_to(xs[None, :], (crop_size, crop_size))

    # horizontal flip in source space (p = .5)
    do_flip = jax.random.bernoulli(r_flip, 0.5)
    xs2 = jnp.where(do_flip, (w - 1.0) - xs2, xs2)

    out_img = _sample_bilinear(img, ys2, xs2)
    out_mask = _sample_nearest(mask, ys2, xs2, fill=0)

    # gaussian blur p = .5, radius ~ U(0, 1)
    do_blur = jax.random.bernoulli(r_bp, 0.5)
    radius = jax.random.uniform(r_br, ())
    out_img = jnp.where(do_blur, _blur(out_img, radius), out_img)
    return out_img, out_mask


def load_raw_batch(dataset, indices, *, buffer_hw: Tuple[int, int],
                   max_edge: int):
    """Host-side raw loading for the on-device pipeline.

    Loads images via the dataset's ``_load``, resizes so the longest edge is
    <= max_edge (deterministic, cacheable — the only host resample), and
    zero-pads into a static (len(indices), *buffer_hw) buffer. Returns
    (images f32, masks i32, valid_hw i32).
    """
    import numpy as np
    from PIL import Image
    bh, bw = buffer_hw
    n = len(indices)
    imgs = np.zeros((n, bh, bw, 3), np.float32)
    masks = np.zeros((n, bh, bw), np.int32)
    valid = np.zeros((n, 2), np.int32)
    for bi, i in enumerate(indices):
        img, mask = dataset._load(int(i))
        w, h = img.size
        scale = min(max_edge / max(h, w), 1.0)
        if scale < 1.0:
            nw, nh = int(w * scale), int(h * scale)
            img = img.resize((nw, nh), Image.BILINEAR)
            mask = mask.resize((nw, nh), Image.NEAREST)
            w, h = nw, nh
        ia = np.asarray(img, np.float32) / 255.0
        ma = dataset._mask_transform(np.asarray(mask).astype(np.int32))
        imgs[bi, :h, :w] = ia
        masks[bi, :h, :w] = ma
        valid[bi] = (h, w)
    return imgs, masks, valid


def color_jitter(img: Array, rng: Array, *, brightness: float = 0.5,
                 contrast: float = 0.5, saturation: float = 0.5) -> Array:
    """On-device ColorJitter (brightness/contrast/saturation).

    Parity target: the one live transform of the reference's augmentation
    library (``semseg/datasets/augmentations.py:402-419`` uses
    ColorJitter(0.5, 0.5, 0.5) — dead code per SURVEY §2.4, provided here as
    a working on-device option). Factors ~ U(max(0, 1-f), 1+f), torchvision
    convention; ops applied brightness -> contrast -> saturation.
    """
    rb, rc, rs = jax.random.split(rng, 3)

    def factor(r, f):
        return jax.random.uniform(r, (), minval=max(0.0, 1.0 - f),
                                  maxval=1.0 + f)

    img = jnp.clip(img * factor(rb, brightness), 0.0, 1.0)
    mean = img.mean(axis=(-3, -2, -1), keepdims=True)
    img = jnp.clip(mean + (img - mean) * factor(rc, contrast), 0.0, 1.0)
    gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]
    img = jnp.clip(gray + (img - gray) * factor(rs, saturation), 0.0, 1.0)
    return img


@functools.partial(jax.jit,
                   static_argnames=("base_size", "crop_size", "scale_lo",
                                    "scale_hi"))
def augment_batch(images: Array, masks: Array, valid_hw: Array, rng: Array, *,
                  base_size: int, crop_size: int,
                  scale_lo: float = 0.5, scale_hi: float = 2.0
                  ) -> Tuple[Array, Array]:
    """Batched on-device train augmentation.

    images (B, Hs, Ws, 3) f32; masks (B, Hs, Ws) int32; valid_hw (B, 2)
    int32 actual sizes inside the padded buffers; rng: single key.
    Returns (B, crop, crop, 3) and (B, crop, crop).
    """
    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(
        lambda i, m, v, r: _augment_one(
            i, m, v, r, base_size=base_size, crop_size=crop_size,
            scale_lo=scale_lo, scale_hi=scale_hi)
    )(images, masks, valid_hw, rngs)
