"""On-device segmentation metrics.

The reference computes mAcc/aAcc/mIoU with per-class Python loops on the host
(``semseg/attacker.py:9-52``, ``semseg/metrics.py:21-60``,
``tools/infer.py:56-133``). Here every metric derives from a single K x K
confusion matrix built on device. The matrix is accumulated with one-hot
matmuls over pixel chunks — a shape XLA tiles straight onto the MXU — instead
of scatter-adds, which serialize badly on TPU.

Conventions: ``pred``/``target`` are integer arrays of identical shape,
``ignore_label`` pixels participate in nothing (the reference folds them by
setting ``pred[target == ignore] = ignore`` first; we mask instead, which is
equivalent because ``ignore`` is never a valid class id).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Pixel-chunk length for the one-hot matmul accumulation. 128*512 keeps the
# one-hot intermediates ~tens of MB while staying MXU aligned.
_CHUNK = 65536


def _hist_matmul(pred: jnp.ndarray, target: jnp.ndarray, valid: jnp.ndarray,
                 num_classes: int) -> jnp.ndarray:
    """Confusion matrix hist[t, p] = #pixels via chunked one-hot matmuls."""
    p = pred.reshape(-1)
    t = target.reshape(-1)
    v = valid.reshape(-1)
    n = p.shape[0]
    pad = (-n) % _CHUNK
    if pad:
        p = jnp.pad(p, (0, pad))
        t = jnp.pad(t, (0, pad))
        v = jnp.pad(v, (0, pad), constant_values=False)
    p = p.reshape(-1, _CHUNK)
    t = t.reshape(-1, _CHUNK)
    v = v.reshape(-1, _CHUNK)

    def body(hist, args):
        pc, tc, vc = args
        # Invalid pixels get an all-zero row in the target one-hot.
        oh_t = (tc[:, None] == jnp.arange(num_classes)[None, :]) & vc[:, None]
        oh_p = pc[:, None] == jnp.arange(num_classes)[None, :]
        hist = hist + jnp.dot(oh_t.astype(jnp.float32).T,
                              oh_p.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        return hist, None

    hist0 = jnp.zeros((num_classes, num_classes), jnp.float32)
    hist, _ = jax.lax.scan(body, hist0, (p, t, v))
    return hist


def _use_pallas_kernels() -> bool:
    import os
    flag = os.environ.get("ROBSEG_PALLAS", "auto")
    if flag in ("0", "off", "false"):
        return False
    if flag in ("1", "on", "true"):
        return True
    # auto currently resolves to the XLA fallback; flip to backend sniffing
    # once the kernel is burn-tested on real hardware
    return False


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_label"))
def confusion_matrix(pred: jnp.ndarray, target: jnp.ndarray, *,
                     num_classes: int, ignore_label: int = -1) -> jnp.ndarray:
    """K x K confusion matrix ``hist[true, pred]`` (float32 counts).

    Parity: ``semseg/metrics.py:27-33`` (bincount-based ``Metrics.update``).
    On TPU the Pallas kernel (``robseg_tpu/kernels/confusion.py``) keeps
    the one-hot intermediates in VMEM; elsewhere the chunked XLA matmul
    fallback runs.
    """
    if _use_pallas_kernels():
        from robseg_tpu.kernels.confusion import confusion_matrix_pallas
        return confusion_matrix_pallas(pred, target,
                                       num_classes=num_classes,
                                       ignore_label=ignore_label)
    valid = target != ignore_label
    return _hist_matmul(pred, target, valid, num_classes)


def iou_from_hist(hist: jnp.ndarray):
    """(per-class IoU, mIoU) skipping classes with empty union.

    Parity: ``semseg/metrics.py:35-40`` — NaN classes are excluded from the
    mean.
    """
    inter = jnp.diagonal(hist)
    union = hist.sum(0) + hist.sum(1) - inter
    present = union > 0
    iou = jnp.where(present, inter / jnp.where(present, union, 1.0), jnp.nan)
    miou = jnp.where(present, iou, 0.0).sum() / jnp.maximum(present.sum(), 1)
    return iou, miou


def f1_from_hist(hist: jnp.ndarray):
    """(per-class F1, mean F1); parity: ``semseg/metrics.py:42-47``."""
    inter = jnp.diagonal(hist)
    denom = hist.sum(0) + hist.sum(1)
    present = denom > 0
    f1 = jnp.where(present, 2.0 * inter / jnp.where(present, denom, 1.0), jnp.nan)
    mf1 = jnp.where(present, f1, 0.0).sum() / jnp.maximum(present.sum(), 1)
    return f1, mf1


def pixel_acc_from_hist(hist: jnp.ndarray):
    """(per-class acc, mAcc, aAcc); parity: ``semseg/metrics.py:49-60``."""
    inter = jnp.diagonal(hist)
    per_cls = hist.sum(1)
    present = per_cls > 0
    acc = jnp.where(present, inter / jnp.where(present, per_cls, 1.0), jnp.nan)
    macc = jnp.where(present, acc, 0.0).sum() / jnp.maximum(present.sum(), 1)
    aacc = inter.sum() / jnp.maximum(hist.sum(), 1.0)
    return acc, macc, aacc


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_label"))
def iou_acc_summary(pred: jnp.ndarray, target: jnp.ndarray, *,
                    num_classes: int, ignore_label: int = -1):
    """(mAcc, aAcc, mIoU) — the triple printed by the reference attack loop.

    Parity: ``semseg/attacker.py:9-52`` (``compute_iou_acc``). There, union
    counts `(pred == cl)` only at non-ignored pixels because ``pred`` was
    overwritten with ``ignore`` at those pixels first; masking reproduces it.
    """
    hist = confusion_matrix(pred, target, num_classes=num_classes,
                            ignore_label=ignore_label)
    _, macc, aacc = pixel_acc_from_hist(hist)
    _, miou = iou_from_hist(hist)
    return macc, aacc, miou


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_label"))
def per_image_intersect_union(pred: jnp.ndarray, target: jnp.ndarray, *,
                              num_classes: int, ignore_label: int = -1):
    """Per-image (intersection[K], union[K]) pairs for SEA aggregation.

    Parity: ``tools/worse_only.py:49-66`` (``update_fn_indiv``): for class c,
    ``int[c] = #(pred==target & target==c)`` and
    ``union[c] = #(target==c) + #(pred==c) - int[c]``, with ignored pixels
    contributing to neither (their saved pred equals ``ignore``).

    pred/target: (B, H, W) -> returns ((B, K), (B, K)) float32.
    """
    valid = target != ignore_label
    b = pred.shape[0]
    hists = jax.vmap(
        lambda p, t, v: _hist_matmul(p, t, v, num_classes)
    )(pred.reshape(b, -1), target.reshape(b, -1), valid.reshape(b, -1))
    inter = jnp.diagonal(hists, axis1=1, axis2=2)
    # union[c] = #target==c + #pred==c - inter[c]; #pred==c excludes ignored
    # pixels (reference masks pred with ignore first) == column sum of hist
    # over valid pixels... column sums count pred==c only where valid? No:
    # _hist_matmul zeroes the *target* one-hot at invalid pixels, which drops
    # them from both row and column sums — matching the reference, where
    # pred is overwritten with `ignore` at invalid pixels.
    union = hists.sum(1) + hists.sum(2) - inter
    return inter, union


def per_image_pixel_acc(pred: jnp.ndarray, target: jnp.ndarray, *,
                        ignore_label: int = -1) -> jnp.ndarray:
    """Per-image aAcc over non-ignored pixels (float32, shape (B,)).

    Parity: ``tools/worse_only.py:372-399`` (the per-image aAcc matrix used by
    ``worse_case_eval``), where ignored pixels are excluded from both
    numerator and denominator.
    """
    valid = target != ignore_label
    correct = (pred == target) & valid
    b = pred.shape[0]
    num = correct.reshape(b, -1).sum(-1).astype(jnp.float32)
    den = valid.reshape(b, -1).sum(-1).astype(jnp.float32)
    return num / jnp.maximum(den, 1.0)
