"""UperNet (PSP + FPN head, FCN aux head) over a ConvNeXt backbone.

Behavioral parity target: ``semseg/models/uperforseg.py``:
  * PSP pyramid pooling at scales (1, 2, 3, 6) on the top feature
    (``:166-200``), bilinear upsampling with align_corners=False;
  * lateral 1x1 ConvModules, top-down additive FPN, per-level 3x3
    ConvModules, concat + 3x3 bottleneck + 1x1 classifier (``:260-307``);
  * FCN aux head on features[2] (``:310-379``);
  * training: loss = CE(main) + 0.4 * CE(aux), ignore_index=-1
    (``:406-439``), logits bilinearly upsampled to the input size.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from robseg_tpu.models.convnext import CONVNEXT_SETTINGS, ConvNeXt
from robseg_tpu.models.layers import ConvModule
from robseg_tpu.ops.losses import segmentation_cross_entropy
from robseg_tpu.ops.resize import adaptive_avg_pool, resize_bilinear

Array = jnp.ndarray


class UperNetHead(nn.Module):
    """PSP + FPN decode head; parity ``uperforseg.py:203-307``."""
    num_classes: int
    in_channels: Sequence[int] = (96, 192, 384, 768)
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    bn_axis_name: Optional[str] = None
    # fpn_bottleneck fusion (attack/eval only), avoiding the 2048-ch HBM
    # concat: "pallas" (True) = kernels/fpn_conv.py one-pass kernel;
    # "split" = pure-XLA sum of 4 convs on weight slices (same math,
    # XLA's own conv kernels); False = reference concat+ConvModule.
    fused_head: object = False

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False) -> Array:
        cm = lambda f, k, p, name: ConvModule(  # noqa: E731
            f, kernel_size=k, padding=p, bn_axis_name=self.bn_axis_name,
            name=name)

        # PSP on the top-level feature
        top = feats[-1]
        psp_outs = [top]
        for i, scale in enumerate(self.pool_scales):
            p = adaptive_avg_pool(top, (scale, scale))
            p = cm(self.channels, 1, 0, f"psp_block{i}")(p, train)
            psp_outs.append(resize_bilinear(p, top.shape[1:3],
                                            align_corners=False))
        psp = jnp.concatenate(psp_outs, axis=-1)
        psp = cm(self.channels, 3, 1, "bottleneck")(psp, train)

        # laterals + top-down pathway
        laterals = [cm(self.channels, 1, 0, f"lateral{i}")(feats[i], train)
                    for i in range(len(self.in_channels) - 1)]
        laterals.append(psp)
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_bilinear(
                laterals[i], laterals[i - 1].shape[1:3], align_corners=False)

        fpn_outs = [cm(self.channels, 3, 1, f"fpn{i}")(laterals[i], train)
                    for i in range(len(laterals) - 1)]
        fpn_outs.append(laterals[-1])
        for i in range(len(fpn_outs) - 1, 0, -1):
            fpn_outs[i] = resize_bilinear(fpn_outs[i], fpn_outs[0].shape[1:3],
                                          align_corners=False)
        bottleneck = cm(self.channels, 3, 1, "fpn_bottleneck")
        if (self.fused_head and not train and not self.is_initializing()):
            # materialize the identical param tree with a dummy eval (DCE'd
            # under jit), then run the raw params through the fused path
            nsrc = len(fpn_outs)
            dummy = jnp.zeros((1, 4, 4, nsrc * self.channels),
                              fpn_outs[0].dtype)
            bottleneck(dummy, False)
            p = bottleneck.variables["params"]
            bs = bottleneck.variables["batch_stats"]
            k = p["conv"]["kernel"]  # (3, 3, nsrc*C, C_out)
            f32 = lambda a: a.astype(jnp.float32)              # noqa: E731
            s = f32(p["bn"]["scale"]) * jax.lax.rsqrt(
                f32(bs["bn"]["var"]) + 1e-5)
            t = f32(p["bn"]["bias"]) - f32(bs["bn"]["mean"]) * s
            if self.fused_head == "split":
                # sum of per-source convs: the concat never materializes
                # and XLA fuses each conv input from its producer
                acc = None
                for i, f in enumerate(fpn_outs):
                    ki = jax.lax.slice_in_dim(
                        k, i * self.channels, (i + 1) * self.channels, axis=2)
                    o = jax.lax.conv_general_dilated(
                        f, ki.astype(f.dtype), (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=jax.lax.conv_dimension_numbers(
                            f.shape, ki.shape, ("NHWC", "HWIO", "NHWC")))
                    acc = o if acc is None else acc + o
                x = jnp.maximum(acc * s.astype(acc.dtype)
                                + t.astype(acc.dtype), 0)
            else:  # "pallas" / True: kernels/fpn_conv.py one-pass kernel
                from robseg_tpu.kernels.fpn_conv import (
                    fpn_concat_conv_shared)
                wk = k.reshape(3, 3, nsrc, self.channels,
                               k.shape[-1]).transpose(2, 0, 1, 3, 4)
                x = fpn_concat_conv_shared(tuple(fpn_outs), wk, (s, t),
                                           fpn_outs[0].dtype)
        else:
            x = jnp.concatenate(fpn_outs, axis=-1)
            x = bottleneck(x, train)
        return nn.Conv(self.num_classes, (1, 1), name="classifier")(x)


class UperNetFCNHead(nn.Module):
    """Aux FCN head on features[in_index]; parity ``uperforseg.py:310-379``."""
    num_classes: int
    in_index: int = 2
    channels: int = 256
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False) -> Array:
        x = feats[self.in_index]
        x = ConvModule(self.channels, kernel_size=3, padding=1,
                       bn_axis_name=self.bn_axis_name, name="conv0")(x, train)
        return nn.Conv(self.num_classes, (1, 1), name="classifier")(x)


class UperNetForSemanticSegmentation(nn.Module):
    """Full UperNet-ConvNeXt net; parity ``uperforseg.py:382-439``.

    ``__call__(x, labels=None, train=False)``:
      * labels given  -> returns (loss, logits) (reference train mode);
      * labels absent -> returns logits upsampled to input size.
    """
    backbone_variant: str = "T_CVST"
    num_classes: int = 21
    bn_axis_name: Optional[str] = None
    fused_mlp: bool = False  # Pallas ConvNeXt LN/MLP fusion (eval/attack)
    fused_mlp_mode: str = "residual"  # see ConvNeXtBlock.fused_mlp_mode
    fused_head: bool = False  # Pallas fpn_bottleneck fusion (eval/attack)

    @nn.compact
    def __call__(self, x: Array, labels: Optional[Array] = None,
                 train: bool = False):
        feats = ConvNeXt(self.backbone_variant, fused_mlp=self.fused_mlp,
                         fused_mlp_mode=self.fused_mlp_mode,
                         name="backbone")(x, deterministic=not train)
        dims = CONVNEXT_SETTINGS[self.backbone_variant][1]
        logits = UperNetHead(self.num_classes, in_channels=dims,
                             bn_axis_name=self.bn_axis_name,
                             fused_head=self.fused_head,
                             name="decode_head")(feats, train)
        logits = resize_bilinear(logits, x.shape[1:3], align_corners=False)
        if labels is None and not self.is_initializing():
            return logits
        # the aux head also runs during init so its params always exist
        aux = UperNetFCNHead(self.num_classes,
                             bn_axis_name=self.bn_axis_name,
                             name="auxiliary_head")(feats, train)
        if labels is None:
            return logits
        aux = resize_bilinear(aux, x.shape[1:3], align_corners=False)
        loss = (segmentation_cross_entropy(logits, labels, -1)
                + 0.4 * segmentation_cross_entropy(aux, labels, -1))
        return loss, logits
