"""PGD over per-class convolution filters (research attack).

Parity target: ``semseg/attacker.py:731-773`` (``pgd_filters``): learn one
3x3 filter bank per class; each image is convolved (depthwise over RGB)
with the filter of its label, normalized by its max, and the filters are
updated by L2-normalized gradient ascent on the attack loss with an L1
regularizer.

TPU-native: the reference convolves image-by-image in a Python loop
(``attacker.py:758-759``); here every image is convolved against its
class's filter in one grouped conv via gather + vmap.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from robseg_tpu.ops.losses import ATTACK_CRITERIA, pixel_to_img_loss

Array = jnp.ndarray


def _apply_filters(x: Array, f: Array, y_img: Array) -> Array:
    """x: (B, H, W, 3); f: (n_cls, 3, 3); y_img: (B,) class per image."""
    fb = f[y_img]  # (B, 3, 3)

    def conv_one(img, k):
        # depthwise: same 3x3 kernel on each RGB channel ('same' padding)
        kern = jnp.tile(k[:, :, None, None], (1, 1, 1, 3))  # (3,3,1,3)
        return jax.lax.conv_general_dilated(
            img[None], kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3)[0]

    out = jax.vmap(conv_one)(x, fb)
    denom = jnp.abs(out).reshape(out.shape[0], -1).max(-1)
    return out / denom.reshape(-1, 1, 1, 1)


@functools.partial(jax.jit,
                   static_argnames=("logits_fn", "n_iter", "loss", "n_cls"))
def pgd_filters(logits_fn: Callable, x: Array, y: Array, y_img: Array, *,
                n_iter: int = 10, alpha: float = 0.2, loss: str = "ce",
                n_cls: int = 10, alpha_reg: float = 0.0,
                rng=None, init_f: Array = None):
    """Returns (x_filtered, filters). ``y_img``: per-image class driving
    filter selection (the reference's classification-style ``y``).
    ``init_f``: optional (n_cls, 3, 3) starting filter bank (the
    reference's ``init_f``, ``attacker.py:746-749``)."""
    criterion = ATTACK_CRITERIA[loss]
    if init_f is not None:
        f0 = init_f
    else:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        f0 = jax.random.uniform(rng, (n_cls, 3, 3), jnp.float32)

    def loss_fn(f):
        xf = _apply_filters(x, f, y_img)
        out = logits_fn(xf)
        li = pixel_to_img_loss(criterion(out, y, None))
        # |f| written as sign(sg(f))*f: same value, but the subgradient at
        # exactly 0 is 0 (torch's convention; jax.grad(abs)(0) is 1 and the
        # clamp to [0,1] parks entries exactly at 0 — trajectories would
        # split there otherwise, verified in tests)
        f_sign = jnp.sign(jax.lax.stop_gradient(f))
        reg = (f_sign * f).reshape(n_cls, -1).sum(-1).mean()
        return li.mean() - alpha_reg * reg

    def step(f, _):
        g = jax.grad(loss_fn)(f)
        gn = jnp.sqrt((g.reshape(n_cls, -1) ** 2).sum(-1) + 1e-24)
        f_new = jnp.clip(f + alpha * g / gn.reshape(-1, 1, 1), 0.0, 1.0)
        return f_new, f  # carry updated f; emit the f used this step

    f, f_used = jax.lax.scan(step, f0, None, length=n_iter)
    # the reference returns the xf of the LAST iteration, i.e. built from
    # the filters BEFORE their final update (attacker.py:755-773 returns
    # the loop-local xf alongside the updated f) — replicated exactly
    return _apply_filters(x, f_used[-1], y_img), f
