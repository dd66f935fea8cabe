"""SEA worst-case aggregation across the attack ensemble.

Behavioral parity target: ``tools/worse_only.py`` (``evalSEA``):
  * ``worse_case_eval``: per-image aAcc per attack, min over attacks, mean
    over images (``worse_only.py:351-422``) — here a single on-device
    reduction instead of per-class host loops;
  * ``worst_case_miou``: greedy randomized coordinate descent over the
    per-image attack choice (``worse_only.py:181-349``): start from attack 0
    (Mask-CE-bal) for every image, then up to 1000 shuffled passes; for each
    image try every attack and accept when the resulting global mIoU drops;
    converge when a full round improves by <= 1e-6.

The per-image per-class intersection/union tensors are computed on device
(``per_image_intersect_union``); the greedy search itself is O(rounds *
images * attacks * classes) numpy — trivial on host, and kept there
deliberately (it is inherently sequential).
"""

from __future__ import annotations

import random
from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from robseg_tpu.ops.metrics import (per_image_intersect_union,
                                    per_image_pixel_acc)

SEED = 225  # parity: tools/worse_only.py:14


def worst_case_aacc(preds: Sequence[np.ndarray], targets: np.ndarray, *,
                    ignore_label: int = -1) -> Tuple[float, np.ndarray]:
    """(worst-case mean aAcc, per-attack mean aAcc).

    ``preds``: one (N, H, W) argmax array per attack (already
    ignore-masked); ``targets``: (N, H, W).
    """
    accs = np.stack([
        np.asarray(per_image_pixel_acc(jnp.asarray(p), jnp.asarray(targets),
                                       ignore_label=ignore_label))
        for p in preds])  # (A, N)
    worst = accs.min(0).mean()
    return float(worst), accs.mean(-1)


def _miou_from(inters: np.ndarray, unions: np.ndarray) -> float:
    """mean over classes with union > 0; parity ``worse_only.py:69-76``."""
    present = unions > 0
    return float((inters[present] / unions[present]).mean())


def sea_intersect_union(preds: Sequence[np.ndarray], targets: np.ndarray, *,
                        num_classes: int, ignore_label: int = -1,
                        batch: int = 16) -> Tuple[np.ndarray, np.ndarray]:
    """(A, N, K) per-attack per-image intersections and unions (on device)."""
    a = len(preds)
    n = targets.shape[0]
    ints = np.zeros((a, n, num_classes), np.float64)
    unis = np.zeros((a, n, num_classes), np.float64)
    for ai, p in enumerate(preds):
        for s in range(0, n, batch):
            e = min(s + batch, n)
            i_, u_ = per_image_intersect_union(
                jnp.asarray(p[s:e]), jnp.asarray(targets[s:e]),
                num_classes=num_classes, ignore_label=ignore_label)
            ints[ai, s:e] = np.asarray(i_)
            unis[ai, s:e] = np.asarray(u_)
    return ints, unis


def worst_case_miou(cons_ints: np.ndarray, cons_unions: np.ndarray, *,
                    n_rounds: int = 1000, tol: float = 1e-6,
                    seed: int = SEED,
                    return_selection: bool = False,
                    engine: str = "auto"):
    """Greedy randomized worst-case mIoU search.

    cons_ints/cons_unions: (A, N, K). Parity: ``worse_only.py:279-334``.

    ``engine``: "native" runs the C++ implementation
    (``robseg_tpu/native/worst_case.cpp`` — identical arithmetic, ~100x
    faster for ADE-sized inputs), "python" the reference-shaped loop,
    "auto" prefers native when the toolchain built it. Shuffle RNGs differ
    between engines (both deterministic per seed); minima agree.

    "reference" / "reference-python" replicate the published code's
    class-list-shrink quirk bit-for-bit (``worse_only.py:79-93``):
    ``_compute_miou_subtraction`` returns lists containing ONLY the classes
    whose *current* running union is nonzero, and an accepted swap replaces
    the running lists with those shrunk lists — from then on the K-length
    per-image update vectors zip against a shorter list, silently
    misaligning class indices. The published SEA numbers were produced by
    that code, so matching them can require this mode; the default engines
    keep full-length class vectors (the fix). Measured deltas are
    documented in PARITY.md.
    """
    if engine in ("reference", "reference-python"):
        if engine == "reference":
            res = _worst_case_miou_reference_native(
                cons_ints, cons_unions, n_rounds=n_rounds, tol=tol,
                seed=seed, return_selection=return_selection)
            if res is not None:
                return res
        return _worst_case_miou_reference_py(
            cons_ints, cons_unions, n_rounds=n_rounds, tol=tol, seed=seed,
            return_selection=return_selection)
    if engine in ("auto", "native"):
        res = _worst_case_miou_native(cons_ints, cons_unions,
                                      n_rounds=n_rounds, tol=tol, seed=seed,
                                      return_selection=return_selection)
        if res is not None:
            return res
        if engine == "native":
            raise RuntimeError("native worst-case engine unavailable")
    rng = random.Random(seed)
    n_attacks, n_imgs, _ = cons_ints.shape
    selected = np.zeros((n_imgs,), np.int64)  # start from attack 0
    running_int = cons_ints[0].sum(0)
    running_uni = cons_unions[0].sum(0)
    final_miou = _miou_from(running_int, running_uni)

    prev_best = 10.0
    for _ in range(n_rounds):
        order = list(range(n_imgs))
        rng.shuffle(order)
        for idx in order:
            for attack in range(n_attacks):
                upd_int = cons_ints[attack, idx] - cons_ints[selected[idx], idx]
                upd_uni = (cons_unions[attack, idx]
                           - cons_unions[selected[idx], idx])
                new_int = running_int + upd_int
                new_uni = running_uni + upd_uni
                # reference skips classes with *current* union == 0 when
                # scoring the candidate (worse_only.py:79-93)
                present = running_uni > 0
                est = float(np.mean(
                    (new_int[present]) / (new_uni[present] + 1e-8)))
                if est < final_miou:
                    selected[idx] = attack
                    running_int = new_int
                    running_uni = new_uni
            # reference recomputes the acceptance threshold after every
            # image (worse_only.py:323-326)
            final_miou = _miou_from(running_int, running_uni)
        if prev_best - final_miou <= tol:
            break
        prev_best = final_miou
        final_miou = _miou_from(running_int, running_uni)

    if return_selection:
        return final_miou, selected
    return final_miou


def _worst_case_miou_reference_py(cons_ints, cons_unions, *, n_rounds, tol,
                                  seed, return_selection):
    """Bug-compatible transcription of ``worse_only.py:181-349``.

    The running intersection/union are Python LISTS. The candidate scorer
    (``_compute_miou_subtraction``, ``worse_only.py:79-93``) zips the
    running lists against the K-length update vectors (truncating to the
    shorter), drops entries whose current union is zero, and returns the
    SHRUNK lists; acceptance installs them as the new running state.
    """
    rng = random.Random(seed)
    n_attacks, n_imgs, _ = cons_ints.shape
    selected = np.zeros((n_imgs,), np.int64)
    run_i = [float(v) for v in cons_ints[0].sum(0)]
    run_u = [float(v) for v in cons_unions[0].sum(0)]

    def _miou(ri, ru):
        vals = [a / b for a, b in zip(ri, ru) if b != 0]
        return sum(vals) / len(vals) if vals else 0.0

    final_miou = _miou(run_i, run_u)
    prev_best = 10.0
    for _ in range(n_rounds):
        order = list(range(n_imgs))
        rng.shuffle(order)
        for idx in order:
            for attack in range(n_attacks):
                upd_i = cons_ints[attack, idx] - cons_ints[selected[idx], idx]
                upd_u = (cons_unions[attack, idx]
                         - cons_unions[selected[idx], idx])
                new_i, new_u, mious = [], [], []
                # zip truncates to len(run_i) — the reference's shrink bug
                for a, b, c, d in zip(run_i, run_u, upd_i, upd_u):
                    if b == 0:  # skip classes absent from the CURRENT union
                        continue
                    new_i.append(a + float(c))
                    new_u.append(b + float(d))
                    mious.append(new_i[-1] / (new_u[-1] + 1e-8))
                est = sum(mious) / len(mious) if mious else 0.0
                if est < final_miou:
                    selected[idx] = attack
                    run_i, run_u = new_i, new_u
            final_miou = _miou(run_i, run_u)
        if prev_best - final_miou <= tol:
            break
        prev_best = final_miou
        final_miou = _miou(run_i, run_u)

    if return_selection:
        return final_miou, selected
    return final_miou


def _worst_case_miou_reference_native(cons_ints, cons_unions, *, n_rounds,
                                      tol, seed, return_selection):
    """Native reference-compat engine; trajectory-identical to the Python
    transcription (CPython-compatible MT19937 shuffle). None if not built."""
    return _native_call("worst_case_miou_reference", cons_ints, cons_unions,
                        n_rounds=n_rounds, tol=tol, seed=seed,
                        return_selection=return_selection)


def _worst_case_miou_native(cons_ints, cons_unions, *, n_rounds, tol, seed,
                            return_selection):
    """ctypes bridge to ``native/worst_case.cpp``; None if not built."""
    return _native_call("worst_case_miou", cons_ints, cons_unions,
                        n_rounds=n_rounds, tol=tol, seed=seed,
                        return_selection=return_selection)


def _native_call(symbol, cons_ints, cons_unions, *, n_rounds, tol, seed,
                 return_selection):
    import ctypes
    from robseg_tpu.native import load_library
    lib = load_library("worst_case")
    if lib is None:
        return None
    fn = getattr(lib, symbol)
    fn.restype = ctypes.c_double
    fn.argtypes = [ctypes.POINTER(ctypes.c_double),
                   ctypes.POINTER(ctypes.c_double),
                   ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                   ctypes.c_int64, ctypes.c_double, ctypes.c_uint64,
                   ctypes.POINTER(ctypes.c_int64)]
    a, n, k = cons_ints.shape
    ints = np.ascontiguousarray(cons_ints, np.float64)
    unis = np.ascontiguousarray(cons_unions, np.float64)
    selected = np.zeros((n,), np.int64)
    miou = fn(ints.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
              unis.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
              a, n, k, n_rounds, tol, seed,
              selected.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if return_selection:
        return float(miou), selected
    return float(miou)
