"""ResNet backbone (DDCAT flavor) for PSPNet/DeepLabV3, NHWC Flax.

Behavioral parity target: ``semseg/models/backbones/resnet_ddcat.py``:
bottleneck blocks with stride on conv2, optional deep-base 3-conv stem
(``clean=True``, ``resnet_ddcat.py:120-131``), and the segmentation nets'
dilation surgery on layers 3/4 (conv2 dilation 2/4, stride 1; downsample
stride 1 — ``ddcat_psp.py:428-437``), expressed here as constructor args
instead of post-hoc module mutation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from robseg_tpu.models.layers import max_pool_same

Array = jnp.ndarray


class _BN(nn.Module):
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, axis_name=self.axis_name,
                            name="bn")(x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride, dilation) -> 1x1 x4 with identity/projection.

    Parity: ``resnet_ddcat.py:70-107``.
    """
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    bn_axis_name: Optional[str] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bn = lambda name: _BN(self.bn_axis_name, name=name)  # noqa: E731
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(bn("bn1")(out, train))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      padding=self.dilation, kernel_dilation=self.dilation,
                      use_bias=False, name="conv2")(out)
        out = nn.relu(bn("bn2")(out, train))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = bn("bn3")(out, train)
        if self.downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual, train)
        return nn.relu(out + residual)


class ResNetStages(nn.Module):
    """Stem + 4 stages, returning (layer3_out, layer4_out) feature maps.

    ``dilations`` applies the segmentation dilation surgery: a stage with
    dilation > 1 uses stride 1 everywhere and dilated conv2.
    """
    layers: Sequence[int] = (3, 4, 6, 3)
    deep_base: bool = True
    strides: Sequence[int] = (1, 2, 1, 1)
    dilations: Sequence[int] = (1, 1, 2, 4)
    planes: Sequence[int] = (64, 128, 256, 512)
    stem_channels: Sequence[int] = (64, 64, 128)  # deep-base stem widths
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False
                 ) -> Tuple[Array, Array]:
        bn = lambda name: _BN(self.bn_axis_name, name=name)  # noqa: E731
        if self.deep_base:
            # clean=True stem: 3x conv3x3 (64, 64, 128); resnet_ddcat.py:120-131
            s1, s2, s3 = self.stem_channels
            x = nn.relu(bn("bn1")(nn.Conv(s1, (3, 3), strides=2, padding=1,
                                          use_bias=False, name="conv1")(x),
                                  train))
            x = nn.relu(bn("bn2")(nn.Conv(s2, (3, 3), padding=1,
                                          use_bias=False, name="conv2")(x),
                                  train))
            x = nn.relu(bn("bn3")(nn.Conv(s3, (3, 3), padding=1,
                                          use_bias=False, name="conv3")(x),
                                  train))
            inplanes = s3
        else:
            x = nn.relu(bn("bn1")(nn.Conv(64, (7, 7), strides=2, padding=3,
                                          use_bias=False, name="conv1")(x),
                                  train))
            inplanes = 64
        x = max_pool_same(x, 3, 2, 1)

        planes = self.planes
        feats = []
        for s in range(4):
            for b in range(self.layers[s]):
                stride = self.strides[s] if b == 0 else 1
                need_ds = b == 0 and (self.strides[s] != 1
                                      or inplanes != planes[s] * 4)
                x = Bottleneck(planes[s], stride=stride,
                               dilation=self.dilations[s],
                               downsample=need_ds,
                               bn_axis_name=self.bn_axis_name,
                               name=f"layer{s + 1}_block{b}")(x, train)
                inplanes = planes[s] * 4
            feats.append(x)
        return feats[2], feats[3]
