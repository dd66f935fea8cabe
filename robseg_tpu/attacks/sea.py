"""SEA — Segmentation Ensemble Attack: orchestration + aggregation.

Behavioral parity target: the SEA evaluation flow of ``tools/infer.py``:
run ``apgd_largereps`` (n_iter per loss, Linf) for each of the three losses
[mask-ce-bal, mask-ce-avg, js-avg] (``infer.py:276-280,332-351``), collect
ignore-masked argmax predictions per attack (``infer.py:56-133``), then
aggregate: image-wise worst-case aAcc and the greedy worst-case mIoU search
(``tools/worse_only.py``).

TPU-native differences: predictions never round-trip through disk between
attacks (the reference saves .pt argmax dumps, ``infer.py:366-370``);
batches stream through a jit-compiled attack; aggregation inputs are
computed on device.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Dict, Iterable, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from robseg_tpu.attacks.apgd import apgd_largereps
from robseg_tpu.attacks.worst_case import (sea_intersect_union,
                                           worst_case_aacc, worst_case_miou)
from robseg_tpu.ops.metrics import (confusion_matrix, iou_from_hist,
                                    pixel_acc_from_hist)

SEA_LOSSES = ("mask-ce-bal", "mask-ce-avg", "js-avg")  # infer.py:276-280


def check_imgs(adv: np.ndarray, x: np.ndarray, norm: str) -> str:
    """Perturbation-validity invariants; parity ``tools/infer.py:39-53``."""
    delta = (adv - x).reshape(adv.shape[0], -1)
    if norm == "Linf":
        res = np.abs(delta).max(1)
    elif norm == "L2":
        res = np.sqrt((delta ** 2).sum(1))
    elif norm == "L1":
        res = np.abs(delta).sum(1)
    else:
        raise ValueError(norm)
    return (f"max {norm} pert: {res.max():.5f}, nan in imgs: "
            f"{np.isnan(adv).sum()}, max in imgs: {adv.max():.5f}, "
            f"min in imgs: {adv.min():.5f}")


@dataclasses.dataclass
class EvalStats:
    m_acc: float
    a_acc: float
    m_iou: float

    def as_dict(self) -> Dict[str, float]:
        return {"mAcc": self.m_acc, "aAcc": self.a_acc, "mIoU": self.m_iou}


def _pad_batch(x: np.ndarray, y: np.ndarray, bs: int):
    """Pad a trailing partial batch to the full (static) batch size.

    Padded rows get label = ignore everywhere, so they contribute nothing
    to metrics; callers slice predictions back to ``n_real``. Avoids a
    fresh XLA compile for the odd-sized last batch.
    """
    n_real = x.shape[0]
    if n_real == bs:
        return x, y, n_real
    reps = bs - n_real
    x = np.concatenate([x, np.repeat(x[-1:], reps, axis=0)])
    y = np.concatenate([y, np.full((reps,) + y.shape[1:], -1, y.dtype)])
    return x, y, n_real


@functools.partial(jax.jit, static_argnames=("logits_fn", "num_classes",
                                             "ignore_label"))
def _eval_step(logits_fn, x, y, h, *, num_classes, ignore_label):
    pred = jnp.argmax(logits_fn(x), axis=-1).astype(jnp.int32)
    pred = jnp.where(y == ignore_label, ignore_label, pred)
    h = h + confusion_matrix(pred, y, num_classes=num_classes,
                             ignore_label=ignore_label)
    return pred, h


def eval_performance(logits_fn: Callable, batches: Iterable, *,
                     num_classes: int, ignore_label: int = -1,
                     n_batches: int = -1, batch_size: Optional[int] = None):
    """Clean/adv evaluation returning stats + ignore-masked argmax preds.

    Parity: ``tools/infer.py:56-133`` (running confusion-matrix metrics;
    predictions at ignored pixels are overwritten with the ignore label
    before being stored). The jitted step is cached across calls (same
    ``logits_fn`` => one compile for the whole SEA run).
    """
    hist = jnp.zeros((num_classes, num_classes), jnp.float32)
    preds_out: List[np.ndarray] = []

    for i, (x, y) in enumerate(batches):
        x, y = np.asarray(x), np.asarray(y)
        if batch_size is None:
            batch_size = x.shape[0]
        x, y, n_real = _pad_batch(x, y, batch_size)
        pred, hist = _eval_step(logits_fn, jnp.asarray(x), jnp.asarray(y),
                                hist, num_classes=num_classes,
                                ignore_label=ignore_label)
        preds_out.append(np.asarray(pred[:n_real]))
        if i + 1 == n_batches:
            break
    _, macc, aacc = pixel_acc_from_hist(hist)
    _, miou = iou_from_hist(hist)
    stats = EvalStats(float(macc), float(aacc), float(miou))
    return stats, np.concatenate(preds_out) if preds_out else None


def run_attack_over_loader(logits_fn: Callable, batches: Iterable, *,
                           loss: str, eps: float, n_iter: int = 300,
                           norm: str = "Linf",
                           weights: Optional[np.ndarray] = None,
                           track_loss: str = "ce-avg",
                           early_stop: bool = True, use_rs: bool = True,
                           n_batches: int = -1, seed: int = 0,
                           verbose: bool = False, mesh=None):
    """Attack every batch; returns list of (x_adv, y) numpy pairs.

    Parity: ``tools/infer.py:136-155`` + the ``attack_fn`` partial
    (``infer.py:338-351``).
    """
    w = jnp.asarray(weights) if weights is not None else None
    rng = jax.random.PRNGKey(seed)
    out = []
    batch_size = None
    for i, (x, y) in enumerate(batches):
        x, y = np.asarray(x), np.asarray(y)
        if batch_size is None:
            batch_size = x.shape[0]
        x_p, y_p, n_real = _pad_batch(x, y, batch_size)
        if mesh is not None:
            # pod-scale SEA: shard the batch over the data mesh; APGD is
            # per-image independent, results identical (tested)
            from robseg_tpu.parallel import shard_batch
            x_p, y_p = shard_batch(mesh, (jnp.asarray(x_p),
                                          jnp.asarray(y_p)))
        rng, sub = jax.random.split(rng)
        x_adv, _, _ = apgd_largereps(
            logits_fn, jnp.asarray(x_p), jnp.asarray(y_p), weights=w,
            norm=norm, eps=eps, n_iter=n_iter, loss=loss,
            early_stop=early_stop, track_loss=track_loss, use_rs=use_rs,
            rng=sub)
        x_adv = np.asarray(x_adv)[:n_real]
        if verbose:
            print(f"batch {i}: {check_imgs(x_adv, x, norm)}")
        out.append((x_adv, y))
        if i + 1 == n_batches:
            break
    return out


def run_sea(logits_fn: Callable, make_loader: Callable[[], Iterable], *,
            num_classes: int, eps: float, n_iter: int = 300,
            weights: Optional[np.ndarray] = None, n_batches: int = -1,
            losses: Sequence[str] = SEA_LOSSES, seed: int = 225,
            verbose: bool = False,
            resume_dir: Optional[str] = None, cache_tag: str = "",
            mesh=None) -> Dict:
    """Full SEA evaluation; parity ``tools/infer.py:313-403``.

    ``make_loader`` returns a fresh iterable of (images, labels) batches.
    Returns the reference's summary dict plus per-loss stats.

    ``resume_dir``: persist per-attack argmax predictions (the analogue of
    the reference's ``argmax-logs`` .pt dumps, ``infer.py:366-370``) and
    skip attacks already completed for this (cache_tag, eps, n_iter) — a
    full-val SEA run takes hours, so a crashed run resumes per attack.
    ``cache_tag`` should identify the checkpoint (e.g. filename + mtime) so
    stale caches are never resumed for different weights.
    """
    import os

    clean_stats, _ = eval_performance(
        logits_fn, make_loader(), num_classes=num_classes,
        n_batches=n_batches)
    if verbose:
        print(f"Clean performance: {clean_stats.as_dict()}")

    per_loss_preds: List[np.ndarray] = []
    per_loss_stats: List[Dict] = []
    targets: List[np.ndarray] = []
    for li, loss in enumerate(losses):
        cache_path = None
        if resume_dir:
            os.makedirs(resume_dir, exist_ok=True)
            tag = f"{cache_tag}_" if cache_tag else ""
            cache_path = os.path.join(
                resume_dir, f"argmax_{tag}{loss}_{eps:.6f}_{n_iter}.npz")
        if cache_path and os.path.exists(cache_path):
            data = np.load(cache_path)
            per_loss_preds.append(data["preds"])
            per_loss_stats.append(
                {k: float(data[k]) for k in ("mAcc", "aAcc", "mIoU")})
            if li == 0:
                targets = data["targets"]
            if verbose:
                print(f"{loss}: resumed from {cache_path}")
            continue
        t0 = time.time()
        adv_batches = run_attack_over_loader(
            logits_fn, make_loader(), loss=loss, eps=eps, n_iter=n_iter,
            weights=weights, n_batches=n_batches, seed=seed + li,
            verbose=verbose, mesh=mesh)
        stats, preds = eval_performance(
            logits_fn, adv_batches, num_classes=num_classes,
            n_batches=n_batches)
        per_loss_preds.append(preds)
        per_loss_stats.append(stats.as_dict())
        loss_targets = np.concatenate([y for _, y in adv_batches])
        if li == 0:
            targets = loss_targets
        if cache_path:
            np.savez_compressed(cache_path, preds=preds,
                                targets=loss_targets,
                                **{k: np.float64(v)
                                   for k, v in stats.as_dict().items()})
        if verbose:
            print(f"{loss}: {stats.as_dict()} ({time.time() - t0:.1f}s)")

    worst_aacc, per_attack_aacc = worst_case_aacc(per_loss_preds, targets)
    ints, unis = sea_intersect_union(per_loss_preds, targets,
                                     num_classes=num_classes)
    final_miou = worst_case_miou(ints, unis, seed=seed)

    return {
        "seed": seed,
        "clean": clean_stats.as_dict(),
        "worst_Acc": worst_aacc,
        "worst_Acc_indiv": per_attack_aacc.tolist(),
        "final_miou": final_miou,
        "loss-wise_miou": [s["mIoU"] for s in per_loss_stats],
        "loss-wise_stats": per_loss_stats,
    }


def evaluate(logits_fn: Callable, batches: Iterable, *, num_classes: int,
             ignore_label: int = -1, n_batches: int = -1):
    """Reference-shaped eval API: returns (cla_acc, macc, aacc, f1, mf1,
    ious, miou) like ``semseg/val.py:14-32`` (accs/f1s as per-class lists).
    """
    hist = jnp.zeros((num_classes, num_classes), jnp.float32)
    for i, (x, y) in enumerate(batches):
        _, hist = _eval_step(logits_fn, jnp.asarray(x), jnp.asarray(y), hist,
                             num_classes=num_classes,
                             ignore_label=ignore_label)
        if i + 1 == n_batches:
            break
    from robseg_tpu.ops.metrics import f1_from_hist
    acc, macc, aacc = pixel_acc_from_hist(hist)
    f1, mf1 = f1_from_hist(hist)
    ious, miou = iou_from_hist(hist)
    return (np.asarray(acc), float(macc), float(aacc), np.asarray(f1),
            float(mf1), np.asarray(ious), float(miou))
