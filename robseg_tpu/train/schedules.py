"""LR schedules as pure step -> lr functions (jit-friendly).

Behavioral parity target: ``semseg/schedulers.py``:
  * ``WarmupPolyLR`` (``:119-139``) with linear or exp warmup (``:80-116``);
  * ``WarmupCosineLR`` (``:162-186``) — including the reference's quirk of
    using ``last_epoch`` (the raw step), not ``real_iter``, in the cosine
    numerator (``:184``);
  * ``PolyLR`` (``:63-77``) — whose modulo guard makes it effectively
    constant in the reference (``:73``); the useful behavior is poly decay,
    provided here, with the quirk documented;
  * timm-style ``PolynomialLR`` for the Segmenter (``:8-45``) and the raw
    ``poly_learning_rate`` helper (``train_rob_seg.py:38-41``);
  * factory ``get_scheduler`` (``:198-225``).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def _warmup_ratio_fn(step, warmup_iter, warmup_ratio, kind):
    alpha = step / jnp.maximum(warmup_iter, 1)
    if kind == "linear":
        return warmup_ratio + (1.0 - warmup_ratio) * alpha
    return warmup_ratio ** (1.0 - alpha)  # exp


def warmup_poly_lr(base_lr: float, power: float, max_iter: int,
                   warmup_iter: int = 500, warmup_ratio: float = 5e-4,
                   warmup: str = "linear") -> Callable:
    """Parity: ``WarmupPolyLR``; factory passes warmup='linear'
    (``schedulers.py:209-217``)."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        wr = _warmup_ratio_fn(step, warmup_iter, warmup_ratio, warmup)
        alpha = (step - warmup_iter) / max(max_iter - warmup_iter, 1)
        main = jnp.maximum(1.0 - alpha, 0.0) ** power
        return base_lr * jnp.where(step < warmup_iter, wr, main)
    return fn


def warmup_cosine_lr(base_lr: float, max_iter: int, eta_ratio: float = 0.0,
                     warmup_iter: int = 500, warmup_ratio: float = 5e-4,
                     warmup: str = "exp") -> Callable:
    """Parity: ``WarmupCosineLR`` incl. the last_epoch-in-numerator quirk."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        wr = _warmup_ratio_fn(step, warmup_iter, warmup_ratio, warmup)
        real_max = max(max_iter - warmup_iter, 1)
        main = eta_ratio + (1 - eta_ratio) * (
            1 + jnp.cos(math.pi * step / real_max)) / 2
        return base_lr * jnp.where(step < warmup_iter, wr, main)
    return fn


def poly_lr(base_lr: float, max_iter: int, power: float = 0.9) -> Callable:
    """Poly decay (the intent of ``PolyLR``; the reference class's modulo
    guard freezes it at base_lr — ``schedulers.py:73`` — which we do NOT
    replicate since it is a no-op scheduler)."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * jnp.maximum(1.0 - step / max_iter, 0.0) ** power
    return fn


def polynomial_lr_timm(base_lr: float, iter_max: int, power: float = 0.9,
                       iter_warmup: int = 0, min_lr: float = 1e-5
                       ) -> Callable:
    """Segmenter schedule; parity ``PolynomialLR`` (``schedulers.py:8-45``)
    + ``optim_args_segmenter`` defaults (``utils/utils.py:281-303``)."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        if iter_warmup > 0:
            coef_w = (step / iter_warmup) * (
                1 - iter_warmup / iter_max) ** power
        else:
            coef_w = jnp.zeros_like(step)
        coef = jnp.maximum(1.0 - step / iter_max, 0.0) ** power
        coef = jnp.where(step < iter_warmup, coef_w, coef)
        return (base_lr - min_lr) * coef + min_lr
    return fn


def poly_learning_rate(base_lr: float, curr_iter, max_iter: int,
                       power: float = 0.9):
    """Raw helper; parity ``train_rob_seg.py:38-41`` (PSPNet path)."""
    return base_lr * (1 - jnp.asarray(curr_iter, jnp.float32) / max_iter
                      ) ** power


def get_scheduler(name: str, base_lr: float, max_iter: int, power: float,
                  warmup_iter: int, warmup_ratio: float) -> Callable:
    """Factory; parity ``get_scheduler`` (``schedulers.py:198-225``)."""
    name = name.lower()
    if name == "warmuppolylr":
        return warmup_poly_lr(base_lr, power, max_iter, warmup_iter,
                              warmup_ratio, warmup="linear")
    if name == "warmupcosinelr":
        return warmup_cosine_lr(base_lr, max_iter, warmup_iter=warmup_iter,
                                warmup_ratio=warmup_ratio)
    if name in ("polylr", "warmupsteplr", "warmuplr"):
        return poly_lr(base_lr, max_iter)
    raise ValueError(f"Unavailable scheduler name >> {name}")
