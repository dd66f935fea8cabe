"""Shared Flax building blocks (NHWC, torch-init parity where it matters)."""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from robseg_tpu.ops.resize import resize_bilinear

Array = jnp.ndarray


def trunc_normal_init(std: float = 0.02):
    """timm-style truncated normal (+-2 std) initializer."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


class DropPath(nn.Module):
    """Stochastic depth per sample (timm ``DropPath`` semantics: the kept
    residual is scaled by 1/keep_prob)."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x * mask / keep


class ConvModule(nn.Module):
    """Conv2d (optionally bias-free) + BatchNorm + ReLU.

    Parity: ``semseg/models/uperforseg.py:119-146`` (``UperNetConvModule``)
    and the PSPNet conv/BN/ReLU stacks. BatchNorm keeps *per-replica* batch
    statistics when run under ``shard_map`` (matching the reference's plain
    ``nn.BatchNorm2d`` under DDP); pass ``bn_axis_name`` to opt into
    cross-replica statistics instead.
    """
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    padding: Union[int, str, Tuple[int, int]] = 0
    dilation: int = 1
    use_bias: bool = False
    bn_axis_name: Optional[str] = None
    bn_momentum: float = 0.9  # torch default momentum 0.1 -> EMA decay 0.9

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.features, ks, padding=pad,
                    kernel_dilation=self.dilation, use_bias=self.use_bias,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=1e-5,
                         axis_name=self.bn_axis_name, name="bn")(x)
        return nn.relu(x)


class TorchLayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis, eps matching the reference
    ConvNeXt LayerNorm (``convnext_orig.py:330-358``, eps=1e-6)."""
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(epsilon=self.epsilon)(x)


def max_pool_same(x: Array, window: int = 3, stride: int = 2,
                  padding: int = 1) -> Array:
    """torch ``MaxPool2d(kernel, stride, padding)`` for NHWC."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads)


def upsample_to(x: Array, ref_hw, align_corners: bool = False) -> Array:
    return resize_bilinear(x, ref_hw, align_corners=align_corners)


class Dropout2d(nn.Module):
    """Channel dropout (torch ``nn.Dropout2d``) for NHWC tensors."""
    rate: float

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(
            rng, keep, (x.shape[0], 1, 1, x.shape[-1])).astype(x.dtype)
        return x * mask / keep
