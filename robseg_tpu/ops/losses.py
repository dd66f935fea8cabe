"""Attack criteria and training losses (channels-last).

All attack criteria mirror the semantics of the reference registry
``semseg/attacker.py:251-257`` (``criterion_dict``) exactly — these losses
*define* the SEA attacks, so robust-accuracy parity depends on bit-level
agreement in masking/reduction conventions:

  * logits are (B, H, W, C); labels (B, H, W) int, ``ignore_index = -1``;
  * "pixelwise" criteria return (B, H, W) with zeros at ignored pixels;
  * ``pixel_to_img_loss`` averages over *all* H*W pixels (including ignored
    ones — the reference divides by the full pixel count,
    ``semseg/attacker.py:237-240``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _log_softmax(logits: Array) -> Array:
    return jax.nn.log_softmax(logits, axis=-1)


def _gather_class(x: Array, target: Array) -> Array:
    """x: (..., C), target: (...) int -> x[..., target] elementwise.

    Deliberately NOT ``take_along_axis``: XLA lowers that gather (and its
    scatter-add VJP) to the TPU scalar core — profiled at 64.6 ms per
    attack iteration on (16,512,512,21), ~35% of the whole APGD step. The
    one-hot select-and-sum runs on the VPU, fuses into the log-softmax
    pass, and is exact (a single selected element plus hard zeros)."""
    oh = (jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
          == target[..., None])
    return jnp.where(oh, x, 0.0).sum(-1)


def _table_lookup(table: Array, idx: Array) -> Array:
    """table: (C,), idx: (...) int -> table[idx], VPU-vectorized (the
    direct ``table[idx]`` gather scalarizes exactly like take_along_axis)."""
    c = table.shape[0]
    oh = (jax.lax.broadcasted_iota(jnp.int32, idx.shape + (c,), idx.ndim)
          == idx[..., None])
    return jnp.where(oh, table, 0.0).sum(-1)


def cross_entropy_pixelwise(logits: Array, target: Array,
                            weights: Optional[Array] = None,
                            ignore_index: int = -1) -> Array:
    """Per-pixel CE, zero at ignored pixels; optional per-class weights.

    Matches ``F.cross_entropy(pred, target, reduction="none",
    ignore_index=-1[, weight=w])`` (``semseg/attacker.py:252-253,162-168``):
    unreduced weighted CE is ``-w[y] * log p_y`` with no weight
    renormalization.
    """
    valid = target != ignore_index
    t = jnp.where(valid, target, 0)
    nll = -_gather_class(_log_softmax(logits), t)
    if weights is not None:
        nll = nll * _table_lookup(weights, t)
    return jnp.where(valid, nll, 0.0)


def masked_cross_entropy(logits: Array, target: Array,
                         weights: Optional[Array] = None,
                         ignore_index: int = -1) -> Array:
    """CE restricted to currently-correctly-classified pixels (Mask-CE).

    Parity: ``semseg/attacker.py:143-152`` — the mask is detached
    (non-differentiable here by construction: argmax comparison).
    """
    mask = jnp.argmax(logits, axis=-1) == target
    mask = mask & (target != ignore_index)
    loss = cross_entropy_pixelwise(logits, target, None, ignore_index)
    return jax.lax.stop_gradient(mask.astype(loss.dtype)) * loss


def masked_cross_entropy_balanced(logits: Array, target: Array,
                                  weights: Optional[Array] = None,
                                  ignore_index: int = -1) -> Array:
    """Class-balanced Mask-CE (inverse-frequency weights).

    Parity: ``semseg/attacker.py:155-173``.
    """
    mask = jnp.argmax(logits, axis=-1) == target
    mask = mask & (target != ignore_index)
    loss = cross_entropy_pixelwise(logits, target, weights, ignore_index)
    return jax.lax.stop_gradient(mask.astype(loss.dtype)) * loss


def _kl_term(log_m: Array, p: Array) -> Array:
    """Pointwise torch ``F.kl_div(log_m, p)`` = p * (log p - log m).

    ``0 * log 0`` is defined as 0 (torch xlogy convention).
    """
    xlogx = jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0)
    return xlogx - p * log_m


# Smallest normal float32: clamping log arguments here only changes behavior
# in the regime where the torch reference would emit NaN (softmax saturated
# to exact zeros), and keeps attack gradients finite.
_TINY = 1.1754944e-38


def js_div_pixelwise(logits: Array, target: Array,
                     ignore_index: int = -1) -> Array:
    """Per-pixel JS divergence between softmax(logits) and one-hot(target).

    Parity: ``semseg/attacker.py:187-234`` (``js_div_fn`` with
    ``red_dim=1``): ignored labels are folded to class 0 for the one-hot and
    the per-pixel loss is zeroed afterwards by the background mask.
    """
    valid = target != ignore_index
    t = jnp.where(valid, target, 0)
    p = jax.nn.softmax(logits, axis=-1)
    q = jax.nn.one_hot(t, logits.shape[-1], dtype=logits.dtype)
    m = (p + q) / 2.0
    log_m = jnp.log(jnp.maximum(m, _TINY))
    loss = (_kl_term(log_m, p) + _kl_term(log_m, q)) / 2.0
    loss = loss.sum(-1)  # sum over classes
    return jnp.where(valid, loss, 0.0)


def js_loss(logits: Array, target: Array, weights: Optional[Array] = None,
            ignore_index: int = -1) -> Array:
    """JS-Avg attack criterion (pixelwise; weights accepted and ignored).

    Parity: ``semseg/attacker.py:229-234`` with ``reduction='none'``.
    """
    del weights
    return js_div_pixelwise(logits, target, ignore_index)


def margin_loss(logits: Array, target: Array,
                ignore_index: int = -1) -> Array:
    """Per-pixel logit margin (other_max - target_logit).

    Parity: ``semseg/attacker.py:176-184``. The reference takes the raw
    target id into one_hot (no ignore handling); we fold ignored labels to 0
    the same way one_hot of a negative index yields a zero row in torch.
    """
    valid = target != ignore_index
    y = jax.nn.one_hot(jnp.where(valid, target, -1), logits.shape[-1],
                       dtype=logits.dtype)
    logits_target = (y * logits).sum(-1)
    logits_other = (logits - 1e10 * y).max(-1)
    return logits_other - logits_target


def dlr_loss(logits: Array, target: Array) -> Array:
    """DLR loss over the class axis (classification-style; legacy).

    Parity: ``semseg/attacker.py:123-131`` generalized to pixel logits.
    """
    x_sorted = jnp.sort(logits, axis=-1)
    ind = (jnp.argmax(logits, axis=-1) == target).astype(logits.dtype)
    zy = _gather_class(logits, target)
    return -(zy - x_sorted[..., -2] * ind - x_sorted[..., -1] * (1.0 - ind)) / (
        x_sorted[..., -1] - x_sorted[..., -3] + 1e-12)


def pixel_to_img_loss(loss: Array, mask_background: Optional[Array] = None
                      ) -> Array:
    """(B, H, W) pixel losses -> (B,) image losses (mean over ALL pixels).

    Parity: ``semseg/attacker.py:237-240``.
    """
    if mask_background is not None:
        loss = loss * mask_background
    return loss.reshape(loss.shape[0], -1).mean(-1)


def dlr_loss_targeted(logits: Array, target: Array, y_target: Array) -> Array:
    """Targeted DLR over the class axis; parity ``attacker.py:134-140``."""
    x_sorted = jnp.sort(logits, axis=-1)
    zy = _gather_class(logits, target)
    zt = _gather_class(logits, y_target)
    return -(zy - zt) / (x_sorted[..., -1]
                         - 0.5 * (x_sorted[..., -3] + x_sorted[..., -4])
                         + 1e-12)


def targeted_cross_entropy(logits: Array, y_target: Array,
                           weights: Optional[Array] = None,
                           ignore_index: int = -1) -> Array:
    """-CE toward the target class: maximizing it pushes pixels to the
    target (the working form of the reference's broken targeted branch,
    ``attacker.py:600-620`` — its loss names are not in criterion_dict)."""
    return -cross_entropy_pixelwise(logits, y_target, weights, ignore_index)


# Registry parity: ``semseg/attacker.py:251-257``. Every entry maps
# (logits, target, weights) -> per-pixel loss (B, H, W).
ATTACK_CRITERIA = {
    "ce": lambda lg, y, w=None: cross_entropy_pixelwise(lg, y, None),
    "ce-avg": lambda lg, y, w=None: cross_entropy_pixelwise(lg, y, None),
    "mask-ce-avg": masked_cross_entropy,
    "mask-ce-bal": masked_cross_entropy_balanced,
    "js-avg": js_loss,
    "ce-targeted": targeted_cross_entropy,
}


def make_attack_criterion(name: str) -> Callable:
    if name not in ATTACK_CRITERIA:
        raise ValueError(
            f"Unknown attack criterion {name!r}; available: "
            f"{sorted(ATTACK_CRITERIA)}")
    return ATTACK_CRITERIA[name]


# ---------------------------------------------------------------------------
# Training losses (parity: semseg/losses.py)
# ---------------------------------------------------------------------------

def segmentation_cross_entropy(logits, target, ignore_index: int = -1,
                               weights: Optional[Array] = None,
                               aux_weights=(1.0, 0.4, 0.4)) -> Array:
    """Mean CE over non-ignored pixels; tuple logits use aux weights.

    Parity: ``semseg/losses.py:6-27`` (torch CE `reduction='mean'` divides by
    the count of non-ignored pixels, or by the weight sum when class weights
    are given).
    """
    if isinstance(logits, (tuple, list)):
        return sum(w * segmentation_cross_entropy(lg, target, ignore_index,
                                                  weights)
                   for lg, w in zip(logits, aux_weights))
    valid = target != ignore_index
    per_pix = cross_entropy_pixelwise(logits, target, weights, ignore_index)
    if weights is not None:
        denom = jnp.where(
            valid, _table_lookup(weights, jnp.where(valid, target, 0)),
            0.0).sum()
    else:
        denom = valid.sum()
    return per_pix.sum() / jnp.maximum(denom, 1.0)


def ohem_cross_entropy(logits, target, ignore_index: int = -1,
                       thresh: float = 0.7, aux_weights=(1.0, 1.0)) -> Array:
    """Online hard-example-mining CE.

    Parity: ``semseg/losses.py:30-63``: keep pixels with loss > -log(thresh);
    if fewer than n_min = #valid // 16 survive, keep the top-n_min instead.

    TPU note: recast as a static-shape reduction — instead of boolean
    gathering we sort once and combine the two selection rules with masks.
    """
    if isinstance(logits, (tuple, list)):
        return sum(w * ohem_cross_entropy(lg, target, ignore_index, thresh)
                   for lg, w in zip(logits, aux_weights))
    thresh_v = -jnp.log(jnp.asarray(thresh, jnp.float32))
    valid = target != ignore_index
    n_min = valid.sum() // 16
    loss = cross_entropy_pixelwise(logits, target, None, ignore_index).reshape(-1)
    loss_sorted = jnp.sort(loss)[::-1]  # descending
    n_hard = (loss > thresh_v).sum()
    n_keep = jnp.maximum(n_hard, n_min)
    idx = jnp.arange(loss_sorted.shape[0])
    keep = idx < n_keep
    return jnp.where(keep, loss_sorted, 0.0).sum() / jnp.maximum(n_keep, 1)


def dice_loss(logits, target, delta: float = 0.5,
              aux_weights=(1.0, 0.4, 0.4)) -> Array:
    """Dice loss; parity: ``semseg/losses.py:66-93`` (operates on raw
    ``preds`` exactly as the reference does — no softmax)."""
    if isinstance(logits, (tuple, list)):
        return sum(w * dice_loss(lg, target, delta)
                   for lg, w in zip(logits, aux_weights))
    num_classes = logits.shape[-1]
    labels = jax.nn.one_hot(target, num_classes, dtype=logits.dtype)
    axes = tuple(range(1, logits.ndim - 1))
    tp = (labels * logits).sum(axes)
    fn = (labels * (1.0 - logits)).sum(axes)
    fp = ((1.0 - labels) * logits).sum(axes)
    dice = (tp + 1e-6) / (tp + delta * fn + (1 - delta) * fp + 1e-6)
    return ((1.0 - dice).sum(-1) / num_classes).mean()


def get_train_loss(name: str = "CrossEntropy", ignore_label: int = -1,
                   cls_weights: Optional[Array] = None) -> Callable:
    """Training-loss factory; parity: ``semseg/losses.py:99-109``."""
    if name == "CrossEntropy":
        return lambda lg, y: segmentation_cross_entropy(
            lg, y, ignore_label, cls_weights)
    if name == "OhemCrossEntropy":
        return lambda lg, y: ohem_cross_entropy(lg, y, ignore_label)
    if name == "Dice":
        return lambda lg, y: dice_loss(lg, y)
    raise ValueError(f"Unavailable loss function name >> {name}")
