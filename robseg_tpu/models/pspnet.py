"""PSPNet / PSPNet-DDCAT / DeepLabV3(-DDCAT) heads over dilated ResNet-50.

Behavioral parity target: ``semseg/models/ddcat_psp.py``:
  * PPM at bins (1, 2, 3, 6), bilinear upsample with align_corners=True
    (``:8-30``);
  * PSPNet head 3x3 conv(512)+BN+ReLU+Dropout2d+1x1 classifier, aux head on
    layer3, loss = CE(main) + 0.4*CE(aux) handled by the trainer
    (``:372-484``, ``tools/train_rob_seg.py:338-340``);
  * zoom_factor semantics: output resized to (H-1)/8*zoom+1 with
    align_corners=True (``:459-474``);
  * DDCAT dual-branch variants: normal/adversarial classifier pair blended
    by an argmax over a 2-channel mask head (``:487-668``, ``:192-369``);
  * ASPP with atrous rates (6, 12, 18) + image-level pooling (``:33-81``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from robseg_tpu.models.layers import Dropout2d
from robseg_tpu.models.resnet import ResNetStages
from robseg_tpu.ops.resize import adaptive_avg_pool, resize_bilinear

Array = jnp.ndarray


class _ConvBnRelu(nn.Module):
    features: int
    kernel: int = 1
    dilation: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel // 2) * self.dilation
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding=pad,
                    kernel_dilation=self.dilation, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.bn_axis_name,
                         name="bn")(x)
        return nn.relu(x)


class PPM(nn.Module):
    """Pyramid pooling; parity ``ddcat_psp.py:8-30``."""
    reduction_dim: int
    bins: Sequence[int] = (1, 2, 3, 6)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        outs = [x]
        for i, b in enumerate(self.bins):
            p = adaptive_avg_pool(x, (b, b))
            p = _ConvBnRelu(self.reduction_dim, 1,
                            bn_axis_name=self.bn_axis_name,
                            name=f"bin{i}")(p, train)
            outs.append(resize_bilinear(p, x.shape[1:3], align_corners=True))
        return jnp.concatenate(outs, axis=-1)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling; parity ``ddcat_psp.py:33-81``."""
    out_channels: int = 256
    atrous_rates: Sequence[int] = (6, 12, 18)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        res = [_ConvBnRelu(self.out_channels, 1,
                           bn_axis_name=self.bn_axis_name,
                           name="conv0")(x, train)]
        for i, rate in enumerate(self.atrous_rates):
            res.append(_ConvBnRelu(self.out_channels, 3, dilation=rate,
                                   bn_axis_name=self.bn_axis_name,
                                   name=f"atrous{i}")(x, train))
        pooled = adaptive_avg_pool(x, (1, 1))
        pooled = _ConvBnRelu(self.out_channels, 1,
                             bn_axis_name=self.bn_axis_name,
                             name="image_pool")(pooled, train)
        res.append(resize_bilinear(pooled, x.shape[1:3], align_corners=True))
        return jnp.concatenate(res, axis=-1)


class _ClsHead(nn.Module):
    """conv(k)+BN+ReLU+Dropout2d+1x1 classifier (PSPNet/DDCAT/DeepLab)."""
    mid: int
    classes: int
    kernel: int = 3
    dropout: float = 0.1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBnRelu(self.mid, self.kernel,
                        bn_axis_name=self.bn_axis_name, name="conv")(x, train)
        x = Dropout2d(self.dropout, name="drop")(x, deterministic=not train)
        return nn.Conv(self.classes, (1, 1), name="classifier")(x)


def _zoom_hw(x: Array, zoom_factor: int) -> Tuple[int, int]:
    h = (x.shape[1] - 1) // 8 * zoom_factor + 1
    w = (x.shape[2] - 1) // 8 * zoom_factor + 1
    return h, w


class PSPNet(nn.Module):
    """PSPNet-ResNet50; parity ``ddcat_psp.py:372-484``.

    ``__call__(x, labels=None, train=False)``: with labels returns
    (main_loss, aux_loss, logits); without returns logits.
    Input H, W must satisfy (H-1) % 8 == 0 (e.g. 473).
    """
    classes: int = 21
    bins: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.1
    zoom_factor: int = 8
    use_ppm: bool = True
    deep_base: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, labels: Optional[Array] = None,
                 train: bool = False):
        assert (x.shape[1] - 1) % 8 == 0 and (x.shape[2] - 1) % 8 == 0
        out_hw = _zoom_hw(x, self.zoom_factor)
        x3, x4 = ResNetStages(deep_base=self.deep_base,
                              bn_axis_name=self.bn_axis_name,
                              name="backbone")(x, train)
        feat = x4
        if self.use_ppm:
            feat = PPM(2048 // len(self.bins), self.bins,
                       bn_axis_name=self.bn_axis_name, name="ppm")(feat, train)
        logits = _ClsHead(512, self.classes, 3, self.dropout,
                          self.bn_axis_name, name="cls")(feat, train)
        if self.zoom_factor != 1:
            logits = resize_bilinear(logits, out_hw, align_corners=True)
        if labels is None and not self.is_initializing():
            return logits
        aux = _ClsHead(256, self.classes, 3, self.dropout,
                       self.bn_axis_name, name="aux")(x3, train)
        if labels is None:
            return logits
        if self.zoom_factor != 1:
            aux = resize_bilinear(aux, out_hw, align_corners=True)
        from robseg_tpu.ops.losses import segmentation_cross_entropy
        main_loss = segmentation_cross_entropy(logits, labels, -1)
        aux_loss = segmentation_cross_entropy(aux, labels, -1)
        return main_loss, aux_loss, logits


class PSPNetDDCAT(nn.Module):
    """Dual-branch DDCAT PSPNet; parity ``ddcat_psp.py:487-668``.

    Eval returns the normal branch (``:666-668``); with ``indicate=1`` the
    blended result is selected by the 2-way mask head argmax.
    """
    classes: int = 21
    bins: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.1
    zoom_factor: int = 8
    bn_axis_name: Optional[str] = None
    # backbone geometry (defaults = ResNet-50; shrinkable for tiny parity
    # tests, mirroring ResNetStages' knobs)
    backbone_layers: Sequence[int] = (3, 4, 6, 3)
    backbone_planes: Sequence[int] = (64, 128, 256, 512)
    head_width: int = 512
    aux_width: int = 256

    @nn.compact
    def __call__(self, x: Array, train: bool = False, indicate: int = 0):
        assert (x.shape[1] - 1) % 8 == 0 and (x.shape[2] - 1) % 8 == 0
        out_hw = _zoom_hw(x, self.zoom_factor)
        x3, x4 = ResNetStages(layers=self.backbone_layers,
                              planes=self.backbone_planes,
                              deep_base=False,
                              bn_axis_name=self.bn_axis_name,
                              name="backbone")(x, train)
        feat = PPM(x4.shape[-1] // len(self.bins), self.bins,
                   bn_axis_name=self.bn_axis_name, name="ppm")(x4, train)
        normal = _ClsHead(self.head_width, self.classes, 3, self.dropout,
                          self.bn_axis_name, name="cls1")(feat, train)
        adver = _ClsHead(self.head_width, self.classes, 3, self.dropout,
                         self.bn_axis_name, name="cls2")(feat, train)
        mask = _ClsHead(self.head_width, 2, 3, self.dropout,
                        self.bn_axis_name, name="mask1")(feat, train)
        if self.zoom_factor != 1:
            normal = resize_bilinear(normal, out_hw, align_corners=True)
            adver = resize_bilinear(adver, out_hw, align_corners=True)
            mask = resize_bilinear(mask, out_hw, align_corners=True)
        if not (train or indicate == 1) and not self.is_initializing():
            return normal
        sel = jnp.argmax(mask, axis=-1)[..., None].astype(normal.dtype)
        final = sel * adver + (1.0 - sel) * normal
        aux = _ClsHead(self.aux_width, self.classes, 3, self.dropout,
                       self.bn_axis_name, name="aux_cls1")(x3, train)
        if not (train or indicate == 1):
            return normal
        if self.zoom_factor != 1:
            aux = resize_bilinear(aux, out_hw, align_corners=True)
        return final, aux, mask, normal


class DeepLabV3DDCAT(nn.Module):
    """Dual-branch DDCAT DeepLabV3; parity ``ddcat_psp.py:192-369``.

    Same normal/adversarial classifier pair + 2-way mask selector as
    PSPNetDDCAT, over ASPP features; eval returns the normal branch
    (``:367-369``); heads are 1x1 convs (``:256-288``).
    """
    classes: int = 21
    atrous_rates: Sequence[int] = (6, 12, 18)
    dropout: float = 0.1
    zoom_factor: int = 8
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False, indicate: int = 0):
        assert (x.shape[1] - 1) % 8 == 0 and (x.shape[2] - 1) % 8 == 0
        out_hw = _zoom_hw(x, self.zoom_factor)
        x3, x4 = ResNetStages(deep_base=False,
                              bn_axis_name=self.bn_axis_name,
                              name="backbone")(x, train)
        feat = ASPP(256, self.atrous_rates,
                    bn_axis_name=self.bn_axis_name, name="aspp")(x4, train)
        normal = _ClsHead(256, self.classes, 1, self.dropout,
                          self.bn_axis_name, name="cls1")(feat, train)
        adver = _ClsHead(256, self.classes, 1, self.dropout,
                         self.bn_axis_name, name="cls2")(feat, train)
        mask = _ClsHead(256, 2, 1, self.dropout,
                        self.bn_axis_name, name="mask1")(feat, train)
        if self.zoom_factor != 1:
            normal = resize_bilinear(normal, out_hw, align_corners=True)
            adver = resize_bilinear(adver, out_hw, align_corners=True)
            mask = resize_bilinear(mask, out_hw, align_corners=True)
        if not (train or indicate == 1) and not self.is_initializing():
            return normal
        sel = jnp.argmax(mask, axis=-1)[..., None].astype(normal.dtype)
        final = sel * adver + (1.0 - sel) * normal
        aux = _ClsHead(256, self.classes, 1, self.dropout,
                       self.bn_axis_name, name="aux_cls1")(x3, train)
        if not (train or indicate == 1):
            return normal
        if self.zoom_factor != 1:
            aux = resize_bilinear(aux, out_hw, align_corners=True)
        return final, aux, mask, normal


class DeepLabV3(nn.Module):
    """DeepLabV3-ResNet50 with ASPP; parity ``ddcat_psp.py:84-189``."""
    classes: int = 21
    atrous_rates: Sequence[int] = (6, 12, 18)
    dropout: float = 0.1
    zoom_factor: int = 8
    deep_base: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, labels: Optional[Array] = None,
                 train: bool = False):
        assert (x.shape[1] - 1) % 8 == 0 and (x.shape[2] - 1) % 8 == 0
        out_hw = _zoom_hw(x, self.zoom_factor)
        x3, x4 = ResNetStages(deep_base=self.deep_base,
                              bn_axis_name=self.bn_axis_name,
                              name="backbone")(x, train)
        feat = ASPP(256, self.atrous_rates,
                    bn_axis_name=self.bn_axis_name, name="aspp")(x4, train)
        logits = _ClsHead(256, self.classes, 1, self.dropout,
                          self.bn_axis_name, name="cls")(feat, train)
        if self.zoom_factor != 1:
            logits = resize_bilinear(logits, out_hw, align_corners=True)
        if labels is None and not self.is_initializing():
            return logits
        aux = _ClsHead(256, self.classes, 1, self.dropout,
                       self.bn_axis_name, name="aux")(x3, train)
        if labels is None:
            return logits
        if self.zoom_factor != 1:
            aux = resize_bilinear(aux, out_hw, align_corners=True)
        from robseg_tpu.ops.losses import segmentation_cross_entropy
        main_loss = segmentation_cross_entropy(logits, labels, -1)
        aux_loss = segmentation_cross_entropy(aux, labels, -1)
        return main_loss, aux_loss, logits
