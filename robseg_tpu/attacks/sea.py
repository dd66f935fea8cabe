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
                                           worst_case_miou)
from robseg_tpu.ops.metrics import (confusion_matrix, iou_from_hist,
                                    per_image_intersect_union,
                                    per_image_pixel_acc, pixel_acc_from_hist)

# Argmax predictions are stored int16 on host/cache: class ids fit
# (<= 151 everywhere) and the ignore label is -1 — 2 bytes/pixel keeps a
# full ADE20K-sized SEA run (3 attacks x 2000 x 512^2) at ~1.5 GB host RSS
# instead of the >6 GB a float/int32 design would need.
PRED_DTYPE = np.int16

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


def _static_batch_size(first_batch_size: int, mesh) -> int:
    """Static per-call batch size: the first batch's size, rounded up to a
    mesh multiple when sharding (a batch that does not divide the data axis
    cannot be sharded — e.g. batch 4 on 8 devices pads to 8; padded rows
    carry all-ignore labels and are sliced off afterwards)."""
    if mesh is None:
        return first_batch_size
    n_dev = int(np.prod(list(mesh.shape.values())))
    return -(-first_batch_size // n_dev) * n_dev


def _make_attack_fn(logits_fn: Callable, mesh, *, eps: float, n_iter: int,
                    loss: str, norm: str = "Linf", early_stop: bool = True,
                    track_loss: str = "ce-avg", use_rs: bool = True,
                    weights=None, axis_name: str = "data") -> Callable:
    """(x, y, rng) -> x_adv for one SEA per-loss attack, single-chip or
    sharded.

    ``mesh`` not None: the attack runs per device under ``shard_map`` over
    the batch axis — Pallas kernels (``--fused``) execute locally per shard
    instead of hitting the jit auto-partitioner (which has no SPMD rules
    for custom calls), exactly like the trainer composes them
    (``train/trainer.py:make_train_step``). Per-image results are identical
    to the single-chip run: APGD is per-image independent, the random start
    is drawn OUTSIDE the shard_map with the single-chip key chain, and the
    batch-global early stop is restored with a ``psum`` over the mesh axis.
    """
    if mesh is None:
        def attack(x, y, rng):
            adv, _, _ = apgd_largereps(
                logits_fn, x, y, weights=weights, norm=norm, eps=eps,
                n_iter=n_iter, loss=loss, early_stop=early_stop,
                track_loss=track_loss, use_rs=use_rs, rng=rng)
            return adv
        return attack

    # Sharded: mirror apgd_largereps phase by phase — ONE jitted
    # shard_map'd APGD-core executable serves all three phases (runtime
    # scalars, exactly like the single-chip path), the inter-phase
    # projection runs eagerly like the single-chip path, and the phase-0
    # random start is drawn here with the single-chip key chain. With
    # matching per-device batch shapes the per-device program is the same
    # graph the single-chip path compiles.
    from robseg_tpu.attacks.apgd import make_sharded_apgd, _project_back
    n_iters = [int(0.3 * n_iter), int(0.3 * n_iter)]
    n_iters.append(n_iter - sum(n_iters))
    epss = [2.0 * eps, 1.5 * eps, 1.0 * eps]
    phase_fn = make_sharded_apgd(
        logits_fn, mesh, norm=norm, loss=loss, track_loss=track_loss,
        early_stop=early_stop, weights=weights, n_iter_buf=max(n_iters),
        axis_name=axis_name)

    def attack(x, y, rng):
        rng, sub = jax.random.split(rng)  # largereps' internal split
        if use_rs:
            # phase-0 random start at eps*2, bit-identical key chain to
            # _apgd_core's in-jit draw (elementwise, shards trivially)
            t = 2.0 * jax.random.uniform(sub, x.shape, x.dtype) - 1.0
            x0 = jnp.clip(x + jnp.float32(epss[0]) * t, 0.0, 1.0)
            use_init = True
        else:
            x0 = x
            use_init = False
        x_cur = x0
        first = True
        for it, ep in zip(n_iters, epss):
            if not first:
                x_cur = _project_back(x_cur, x, norm, ep)
            res = phase_fn(x, y, x_cur, use_init or not first, ep, it)
            x_cur = res.x_best_adv
            first = False
        return x_cur

    return attack


@functools.partial(jax.jit, static_argnames=("logits_fn", "num_classes",
                                             "ignore_label"))
def _eval_step(logits_fn, x, y, h, consts=(), *, num_classes, ignore_label):
    if consts:  # closure_to_args form: fn(x, *weights)
        _base_fn = logits_fn
        logits_fn = lambda z: _base_fn(z, *consts)  # noqa: E731
    pred = jnp.argmax(logits_fn(x), axis=-1).astype(jnp.int32)
    pred = jnp.where(y == ignore_label, ignore_label, pred)
    h = h + confusion_matrix(pred, y, num_classes=num_classes,
                             ignore_label=ignore_label)
    return pred, h


def _make_eval_step_fn(logits_fn: Callable, mesh, *, num_classes: int,
                       ignore_label: int = -1, axis_name: str = "data"
                       ) -> Callable:
    """(x, y, hist) -> (pred, hist'): single-chip jit, or — with a mesh —
    the same forward under ``shard_map`` over the batch axis so the clean
    eval and the adversarial re-forward scale with the attack under
    ``--shard`` (round-3 Weak #6: they previously stayed single-device).
    The per-shard confusion-matrix increments are ``psum``-ed, so the
    returned hist equals the unsharded one exactly.
    """
    if mesh is None:
        from robseg_tpu.attacks.apgd import closure_to_args

        def step(x, y, h):
            fn, consts = closure_to_args(logits_fn, x)  # cached per shape
            return _eval_step(fn, x, y, h, tuple(consts),
                              num_classes=num_classes,
                              ignore_label=ignore_label)
        return step
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def per_device(x, y, h):
        pred = jnp.argmax(logits_fn(x), axis=-1).astype(jnp.int32)
        pred = jnp.where(y == ignore_label, ignore_label, pred)
        inc = confusion_matrix(pred, y, num_classes=num_classes,
                               ignore_label=ignore_label)
        return pred, h + jax.lax.psum(inc, axis_name)

    sharded = shard_map(per_device, mesh=mesh,
                        in_specs=(P(axis_name), P(axis_name), P()),
                        out_specs=(P(axis_name), P()), check_vma=False)
    return jax.jit(sharded)


def eval_performance(logits_fn: Callable, batches: Iterable, *,
                     num_classes: int, ignore_label: int = -1,
                     n_batches: int = -1, batch_size: Optional[int] = None,
                     return_preds: bool = True, mesh=None, eval_step=None):
    """Clean/adv evaluation returning stats + ignore-masked argmax preds.

    Parity: ``tools/infer.py:56-133`` (running confusion-matrix metrics;
    predictions at ignored pixels are overwritten with the ignore label
    before being stored). The jitted step is cached across calls (same
    ``logits_fn`` => one compile for the whole SEA run).

    ``return_preds=False`` skips host-side pred accumulation (stats-only
    passes on full-val splits would otherwise hold ~1 GB of argmaxes).
    ``mesh``: shard the forward over the batch axis (results identical);
    ``eval_step``: reuse a step built by ``_make_eval_step_fn`` (avoids
    per-call shard_map re-jits inside ``run_sea``).
    """
    if eval_step is None:
        eval_step = _make_eval_step_fn(logits_fn, mesh,
                                       num_classes=num_classes,
                                       ignore_label=ignore_label)
    hist = jnp.zeros((num_classes, num_classes), jnp.float32)
    preds_out: List[np.ndarray] = []

    for i, (x, y) in enumerate(batches):
        x, y = np.asarray(x), np.asarray(y)
        if batch_size is None:
            batch_size = _static_batch_size(x.shape[0], mesh)
        x, y, n_real = _pad_batch(x, y, batch_size)
        pred, hist = eval_step(jnp.asarray(x), jnp.asarray(y), hist)
        if return_preds:
            preds_out.append(np.asarray(pred[:n_real]).astype(PRED_DTYPE))
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
    attack_fn = _make_attack_fn(
        logits_fn, mesh, eps=eps, n_iter=n_iter, loss=loss, norm=norm,
        early_stop=early_stop, track_loss=track_loss, use_rs=use_rs,
        weights=w)
    out = []
    batch_size = None
    for i, (x, y) in enumerate(batches):
        x, y = np.asarray(x), np.asarray(y)
        if batch_size is None:
            batch_size = _static_batch_size(x.shape[0], mesh)
        x_p, y_p, n_real = _pad_batch(x, y, batch_size)
        x_p, y_p = jnp.asarray(x_p), jnp.asarray(y_p)
        if mesh is not None:
            # pod-scale SEA: place the batch sharded over the data mesh
            from robseg_tpu.parallel import shard_batch
            x_p, y_p = shard_batch(mesh, (x_p, y_p))
        rng, sub = jax.random.split(rng)
        x_adv = attack_fn(x_p, y_p, sub)
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
            mesh=None, wc_engine: str = "auto", use_rs: bool = True,
            early_stop: bool = True, track_loss: str = "ce-avg",
            norm: str = "Linf") -> Dict:
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

    # one eval step reused for the clean pass and every per-loss
    # re-forward; under --shard it runs shard_map'd over the mesh
    # (round-3 Weak #6) with identical results
    eval_step = _make_eval_step_fn(logits_fn, mesh,
                                   num_classes=num_classes, ignore_label=-1)
    clean_stats, _ = eval_performance(
        logits_fn, make_loader(), num_classes=num_classes,
        n_batches=n_batches, return_preds=False, mesh=mesh,
        eval_step=eval_step)
    if verbose:
        print(f"Clean performance: {clean_stats.as_dict()}")

    w = jnp.asarray(weights) if weights is not None else None
    per_loss_stats: List[Dict] = []
    all_ints: List[np.ndarray] = []   # per loss: (N, K)
    all_unis: List[np.ndarray] = []
    all_accs: List[np.ndarray] = []   # per loss: (N,) per-image aAcc
    for li, loss in enumerate(losses):
        cache_path = None
        if resume_dir:
            os.makedirs(resume_dir, exist_ok=True)
            tag = f"{cache_tag}_" if cache_tag else ""
            cache_path = os.path.join(
                resume_dir, f"argmax_{tag}{loss}_{eps:.6f}_{n_iter}.npz")
        if cache_path and os.path.exists(cache_path):
            data = np.load(cache_path)
            per_loss_stats.append(
                {k: float(data[k]) for k in ("mAcc", "aAcc", "mIoU")})
            if all(k in data for k in ("ints", "unis", "accs")):
                all_ints.append(data["ints"])
                all_unis.append(data["unis"])
                all_accs.append(data["accs"])
            else:
                # pre-round-2 cache: recompute aggregation inputs from the
                # stored argmax predictions (one cheap device pass)
                p = data["preds"].astype(np.int32)
                t = data["targets"].astype(np.int32)
                i_, u_ = sea_intersect_union([p], t, num_classes=num_classes)
                all_ints.append(i_[0])
                all_unis.append(u_[0])
                all_accs.append(np.asarray(per_image_pixel_acc(
                    jnp.asarray(p.astype(np.int32)),
                    jnp.asarray(t.astype(np.int32)))))
            if verbose:
                print(f"{loss}: resumed from {cache_path}")
            continue

        # Streaming attack->eval: each batch is attacked, argmaxed and
        # reduced to (per-image int/union, per-image acc, confusion-matrix
        # increment) immediately — adversarial images are never accumulated
        # on host (the reference holds the full adv split as an in-memory
        # loader, ``infer.py:136-155``).
        t0 = time.time()
        rng = jax.random.PRNGKey(seed + li)
        attack_fn = _make_attack_fn(
            logits_fn, mesh, eps=eps, n_iter=n_iter, loss=loss,
            weights=w, use_rs=use_rs, early_stop=early_stop,
            track_loss=track_loss, norm=norm)
        hist = jnp.zeros((num_classes, num_classes), jnp.float32)
        preds_l: List[np.ndarray] = []
        tgts_l: List[np.ndarray] = []
        ints_l: List[np.ndarray] = []
        unis_l: List[np.ndarray] = []
        accs_l: List[np.ndarray] = []
        batch_size = None
        for bi, (x, y) in enumerate(make_loader()):
            x, y = np.asarray(x), np.asarray(y)
            if batch_size is None:
                batch_size = _static_batch_size(x.shape[0], mesh)
            x_p, y_p, n_real = _pad_batch(x, y, batch_size)
            x_p, y_p = jnp.asarray(x_p), jnp.asarray(y_p)
            if mesh is not None:
                from robseg_tpu.parallel import shard_batch
                x_p, y_p = shard_batch(mesh, (x_p, y_p))
            rng, sub = jax.random.split(rng)
            x_adv = attack_fn(x_p, y_p, sub)
            if verbose:
                adv_np = np.asarray(x_adv)[:n_real]
                print(f"batch {bi}: {check_imgs(adv_np, x, 'Linf')}")
            pred, hist = eval_step(x_adv, y_p, hist)
            i_, u_ = per_image_intersect_union(pred, y_p,
                                               num_classes=num_classes)
            a_ = per_image_pixel_acc(pred, y_p)
            preds_l.append(np.asarray(pred[:n_real]).astype(PRED_DTYPE))
            tgts_l.append(y.astype(PRED_DTYPE))
            ints_l.append(np.asarray(i_[:n_real]))
            unis_l.append(np.asarray(u_[:n_real]))
            accs_l.append(np.asarray(a_[:n_real]))
            if bi + 1 == n_batches:
                break
        _, macc, aacc = pixel_acc_from_hist(hist)
        _, miou = iou_from_hist(hist)
        stats = EvalStats(float(macc), float(aacc), float(miou))
        per_loss_stats.append(stats.as_dict())
        all_ints.append(np.concatenate(ints_l))
        all_unis.append(np.concatenate(unis_l))
        all_accs.append(np.concatenate(accs_l))
        if cache_path:
            np.savez_compressed(cache_path, preds=np.concatenate(preds_l),
                                targets=np.concatenate(tgts_l),
                                ints=all_ints[-1], unis=all_unis[-1],
                                accs=all_accs[-1],
                                **{k: np.float64(v)
                                   for k, v in stats.as_dict().items()})
        if verbose:
            print(f"{loss}: {stats.as_dict()} ({time.time() - t0:.1f}s)")

    acc_mat = np.stack(all_accs)               # (A, N)
    worst_aacc = float(acc_mat.min(0).mean())
    per_attack_aacc = acc_mat.mean(-1)
    ints = np.stack(all_ints).astype(np.float64)
    unis = np.stack(all_unis).astype(np.float64)
    final_miou = worst_case_miou(ints, unis, seed=seed, engine=wc_engine)

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
