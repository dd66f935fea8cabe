"""Cheap sign-PGD used during PIR-AT training (and a random-start variant).

Behavioral parity target: ``semseg/val.py:130-218`` (``Pgd_Attack``,
``Pgd_Attack_1``). Implemented as a ``lax.scan`` over steps so the whole
attack fuses into the compiled train step — no cross-replica gradient sync
per inner backward (the reference pays a DDP all-reduce for every attack
backward, ``SURVEY.md §3.3``).

Faithfully reproduced quirk: the reference tracks the best per-image loss
*before* the gradient step but stores the *post-step* delta for those images
(``val.py:158-175``).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from robseg_tpu.ops.losses import (js_div_pixelwise, cross_entropy_pixelwise,
                                   segmentation_cross_entropy)

Array = jnp.ndarray


def _pgd_scalar_ce(logits, y):
    """losses['pgd'] = F.cross_entropy(x, y) — scalar mean CE.

    The reference's training labels contain no ignore pixels (VOC folds 255
    into background, ``pascal_voc.py:114-117``), so plain mean CE; we still
    guard ignore_index=-1 for safety.
    """
    return segmentation_cross_entropy(logits, y, -1)


def _mask_ce_avg(logits, y):
    """Parity ``val.py:112-118`` (no ignore handling in the train variant)."""
    mask = (jnp.argmax(logits, axis=-1) == y).astype(logits.dtype)
    loss = cross_entropy_pixelwise(logits, y, None, ignore_index=-1)
    return (mask * loss).reshape(logits.shape[0], -1).mean(-1)


def _js_avg(logits, y):
    return js_div_pixelwise(logits, y, ignore_index=-1
                            ).reshape(logits.shape[0], -1).mean(-1)


def segpgd_loss(logits, y, t, total_iters, ignore_index: int = -1):
    """SegPGD loss (Gu et al., ECCV 2022, arXiv:2207.12391): per-pixel CE
    weighted (1-lambda) for correctly classified pixels and lambda for
    misclassified ones, lambda = t / (2*T).

    The reference *dispatches* on the name "segpgd-loss" (``val.py:153-155``)
    but never defines it in its registry — this is the working
    implementation.
    """
    lam = t / (2.0 * total_iters)
    correct = (jnp.argmax(logits, axis=-1) == y).astype(logits.dtype)
    ce = cross_entropy_pixelwise(logits, y, None, ignore_index)
    w = (1.0 - lam) * correct + lam * (1.0 - correct)
    return (w * ce).reshape(logits.shape[0], -1).mean(-1)


TRAIN_ATTACK_LOSSES = {
    "pgd": _pgd_scalar_ce,
    "mask-ce-avg": _mask_ce_avg,
    "js-avg": _js_avg,
    "l2-loss": lambda lg, y: ((lg - y) ** 2).reshape(lg.shape[0], -1).sum(-1),
    # segpgd-loss handled specially (needs the step index); see pgd_attack
}


def pgd_attack_body(logits_fn: Callable, x: Array, y: Array, *,
                    eps: float = 4.0 / 255.0, alpha: float = 1e-2,
                    num_iter: int = 2, loss: str = "pgd") -> Array:
    """``Pgd_Attack.adv_attack`` (``val.py:138-178``): no random start,
    best-loss delta tracking; returns x_adv.

    Plain traceable function (no jit) so it can be inlined under
    ``shard_map`` by the trainer; ``pgd_attack`` is its jitted wrapper.
    """
    if loss == "segpgd-loss":
        loss_fn = lambda lg, yy, t: segpgd_loss(lg, yy, t, num_iter)  # noqa
    else:
        base = TRAIN_ATTACK_LOSSES[loss]
        loss_fn = lambda lg, yy, t: base(lg, yy)  # noqa: E731
    bs = x.shape[0]
    ndims = x.ndim - 1

    def grad_fn(delta, t):
        def f(d):
            logits = logits_fn(jnp.clip(x + d, 0.0, 1.0))
            per_img = loss_fn(logits, y, t)
            return jnp.sum(per_img), per_img
        (_, per_img), g = jax.value_and_grad(f, has_aux=True)(delta)
        return g, per_img

    def step(carry, t):
        delta, best_delta, running_best = carry
        g, per_img = grad_fn(delta, t)
        per_img = jnp.broadcast_to(per_img, (bs,))
        ind = per_img >= running_best
        running_best = jnp.where(ind, per_img, running_best)
        delta = delta + alpha * jnp.sign(g)
        delta = jnp.clip(x + delta, 0.0, 1.0) - x
        delta = jnp.clip(delta, -eps, eps)
        ind_b = ind.reshape((bs,) + (1,) * ndims).astype(x.dtype)
        best_delta = ind_b * delta + (1 - ind_b) * best_delta
        return (delta, best_delta, running_best), None

    init = (jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros((bs,), jnp.float32))
    (_, best_delta, _), _ = jax.lax.scan(step, init,
                                         jnp.arange(num_iter, dtype=jnp.float32))
    return jnp.clip(x + best_delta, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("logits_fn", "num_iter", "loss"))
def pgd_attack(logits_fn: Callable, x: Array, y: Array, *,
               eps: float = 4.0 / 255.0, alpha: float = 1e-2,
               num_iter: int = 2, loss: str = "pgd") -> Array:
    """Jitted wrapper over :func:`pgd_attack_body`."""
    return pgd_attack_body(logits_fn, x, y, eps=eps, alpha=alpha,
                           num_iter=num_iter, loss=loss)


@functools.partial(jax.jit, static_argnames=("logits_fn", "num_iter", "loss"))
def pgd_attack_rs(logits_fn: Callable, x: Array, y: Array, rng: Array, *,
                  eps: float = 4.0 / 255.0, alpha: float = 1e-2,
                  num_iter: int = 2, loss: str = "pgd",
                  delta_init: Optional[Array] = None) -> Array:
    """``Pgd_Attack_1.adv_attack`` (``val.py:189-218``): uniform random
    start, returns the final (not best) point.

    ``delta_init`` overrides the random start (RNG-free differential
    testing against the reference loop)."""
    loss_fn = TRAIN_ATTACK_LOSSES[loss]

    def step(delta, _):
        def f(d):
            # quirk parity: this variant does NOT clamp inside the forward
            logits = logits_fn(x + d)
            return jnp.sum(loss_fn(logits, y))
        g = jax.grad(f)(delta)
        delta = delta + alpha * jnp.sign(g)
        delta = jnp.clip(x + delta, 0.0, 1.0) - x
        delta = jnp.clip(delta, -eps, eps)
        return delta, None

    if delta_init is not None:
        delta0 = delta_init
    else:
        delta0 = jax.random.uniform(rng, x.shape, x.dtype, -eps, eps)
    delta, _ = jax.lax.scan(step, delta0, None, length=num_iter)
    return jnp.clip(x + delta, 0.0, 1.0)
