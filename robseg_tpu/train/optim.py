"""Optimizer factories (optax) with decay/no-decay grouping + layer decay.

Behavioral parity targets:
  * ``semseg/optimizers.py:39-59`` (``group_weight``): params with ndim <= 1
    or "norm" in the name get weight_decay = 0;
  * ``semseg/optimizers.py:27-36``: AdamW(betas=(0.9, 0.999), eps=1e-8) or
    SGD(momentum=0.9);
  * ``semseg/layer_decay.py:42-122`` (``add_params`` — stage-wise LR decay
    groups for ConvNeXt, decay_rate 0.9, num_layers 6+2,
    scale = 0.9^(n - layer - 1)). NOTE: the reference imports but never
    calls ``add_params`` (UperNet trains with plain 2-group AdamW); layer
    decay is provided here as an opt-in;
  * PSPNet optimizer grouping (backbone lr vs new-modules lr x10,
    ``tools/train_rob_seg.py:185-204, 356-361``) via ``pspnet_lr_scales``.

In optax, "param groups" become per-leaf masks/scales on a single chained
transform, so the whole update stays one fused XLA program.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def decay_mask(params) -> Dict:
    """True where weight decay applies (ndim > 1 and no 'norm' in name)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: (leaf.ndim > 1) and ("norm" not in _path_str(p)),
        params)


def stagewise_layer_id(path: str, num_layers: int) -> int:
    """Parity: ``get_num_layer_stage_wise`` (``layer_decay.py`` /
    ``optimizers.py:123-136``) translated to this repo's param paths."""
    parts = path.split("/")
    if parts and parts[0] == "backbone":
        if len(parts) > 1:
            p1 = parts[1]
            if p1.startswith("stem") or p1.startswith("downsample"):
                return 0
            if p1.startswith("stage"):
                stage_id = int(p1[len("stage"):].split("_")[0])
                return stage_id + 1
        # per-stage norms ("backbone.norm{i}") fall through to the head
        # group in the reference name scheme — reproduced.
    if "cls_token" in path or "pos_embed" in path or "mask_token" in path:
        return 0
    return num_layers - 1


def layerwise_lr_scales(params, *, decay_rate: float = 0.9,
                        num_layers: int = 8):
    """Per-leaf lr multipliers: scale = decay_rate^(num_layers - id - 1)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: decay_rate ** (
            num_layers - stagewise_layer_id(_path_str(p), num_layers) - 1),
        params)


def freeze_mask(params, subtree: str = "backbone"):
    """True where the parameter is FROZEN (no update applied).

    Parity: ``freeze_some_layers(early=True)``
    (``tools/train_rob_seg.py:147-155``) sets ``requires_grad = False`` on
    every parameter under ``model.backbone`` — here the same subtree gets
    its optimizer updates masked to zero (params stay bit-identical; see
    ``make_optimizer(frozen_mask=...)``). Upstream parses ``TRAIN.FREEZE``
    but never calls the method; we wire it for real.
    """
    if subtree not in params:
        raise ValueError(
            f"TRAIN.FREEZE: model has no {subtree!r} param subtree "
            f"(top-level keys: {sorted(params)})")
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: _path_str(p).startswith(subtree), params)


def pspnet_lr_scales(params):
    """Backbone params x1, new modules (ppm/cls/aux) x10.

    Parity: ``tools/train_rob_seg.py:185-204, 356-361``.
    """
    def scale(path, leaf):
        return 1.0 if _path_str(path).startswith("backbone") else 10.0
    return jax.tree_util.tree_map_with_path(scale, params)


def scale_by_leaf(scales) -> optax.GradientTransformation:
    """Multiply each update leaf by a fixed per-leaf scalar."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(name: str, params, schedule: Callable, *,
                   weight_decay: float = 0.01, momentum: float = 0.9,
                   lr_scales=None,
                   frozen_mask=None) -> optax.GradientTransformation:
    """AdamW / SGD with decay masking and optional per-leaf lr scales.

    ``schedule``: step -> lr. torch semantics: update = lr_leaf *
    (adam_update + wd * param); the group lr multiplies the decay term too.
    ``frozen_mask``: True-leaves get a zero update (TRAIN.FREEZE — see
    :func:`freeze_mask`); applied last so weight decay cannot leak into
    frozen parameters either.
    """
    mask = decay_mask(params)
    parts = []
    if name.lower() == "adamw":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        parts.append(optax.add_decayed_weights(weight_decay, mask=mask))
    elif name.lower() == "sgd":
        # torch SGD: grad = grad + wd * p, then momentum buffer
        parts.append(optax.add_decayed_weights(weight_decay, mask=mask))
        parts.append(optax.trace(decay=momentum, nesterov=False))
    else:
        raise ValueError(f"Unknown optimizer {name!r}")
    if lr_scales is not None:
        parts.append(scale_by_leaf(lr_scales))
    parts.append(optax.scale_by_schedule(lambda step: -schedule(step)))
    if frozen_mask is not None:
        parts.append(optax.masked(optax.set_to_zero(), frozen_mask))
    return optax.chain(*parts)
