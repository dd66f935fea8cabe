"""Model wrappers: input normalization and logit-channel masking.

Parity targets: ``ImageNormalizer``/``normalize_model``
(``semseg/utils/utils.py:195-218``) and ``MaskClass``/``mask_logits``
(``tools/infer.py:195-216``). In this functional framework both are plain
function combinators over a ``logits_fn`` rather than nn.Sequential wrappers.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

IN_MEAN = (0.485, 0.456, 0.406)
IN_STD = (0.229, 0.224, 0.225)


def normalize_input(x: jnp.ndarray, mean: Sequence[float] = IN_MEAN,
                    std: Sequence[float] = IN_STD) -> jnp.ndarray:
    """(x - mean) / std over the channel (last) axis."""
    m = jnp.asarray(mean, x.dtype).reshape((1,) * (x.ndim - 1) + (-1,))
    s = jnp.asarray(std, x.dtype).reshape((1,) * (x.ndim - 1) + (-1,))
    return (x - m) / s


def normalize_model(logits_fn: Callable, mean: Sequence[float] = IN_MEAN,
                    std: Sequence[float] = IN_STD) -> Callable:
    """Prepend input normalization to a logits_fn."""
    return lambda x: logits_fn(normalize_input(x, mean, std))


def mask_class(logits: jnp.ndarray, ignore_index: int) -> jnp.ndarray:
    """Drop one class channel from channels-last logits."""
    if ignore_index == 0:
        return logits[..., 1:]
    return jnp.concatenate(
        [logits[..., :ignore_index], logits[..., ignore_index + 1:]], axis=-1)


def mask_logits(logits_fn: Callable, ignore_index: int) -> Callable:
    """Wrap a logits_fn so one class channel is removed from its output."""
    return lambda x: mask_class(logits_fn(x), ignore_index)
