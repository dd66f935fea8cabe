"""Segmenter: ViT encoder + MaskTransformer decoder.

Behavioral parity targets:
  * ``semseg/models/heads/segmenter_decoder.py:33-113`` (MaskTransformer):
    project patch tokens, append learned class embeddings, 2 transformer
    blocks, LayerNorm, split patches/classes, project both, L2-normalize,
    masks = patches @ classes^T, LayerNorm over classes, reshape to grid;
  * ``semseg/models/segmenter.py:193-231`` (SegMenter): pad input to a
    multiple of the patch size, encode (pre_neck), drop CLS/DIST tokens,
    decode, bilinear-upsample (align_corners=False), unpad.

Padding amounts are static under jit (fixed crops), so the whole network is
one fused XLA program.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from robseg_tpu.models.vit import Block, VisionTransformer
from robseg_tpu.models.layers import trunc_normal_init
from robseg_tpu.ops.resize import resize_bilinear

Array = jnp.ndarray


class DecoderLinear(nn.Module):
    """Linear decoder; parity ``segmenter_decoder.py:9-30``."""
    n_cls: int
    patch_size: int

    @nn.compact
    def __call__(self, x: Array, im_size, deterministic: bool = True) -> Array:
        h = im_size[0] // self.patch_size
        x = nn.Dense(self.n_cls, name="head")(x)
        b, n, c = x.shape
        return x.reshape(b, h, n // h, c)


class MaskTransformer(nn.Module):
    """Mask-transformer decoder; parity ``segmenter_decoder.py:33-113``."""
    n_cls: int
    patch_size: int
    d_encoder: int
    n_layers: int = 2
    d_model: int = 384
    n_heads: int = 6
    d_ff: int = 1536
    drop_path_rate: float = 0.0
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, im_size, deterministic: bool = True) -> Array:
        h = im_size[0] // self.patch_size
        scale = self.d_model ** -0.5

        x = nn.Dense(self.d_model, kernel_init=trunc_normal_init(0.02),
                     name="proj_dec")(x)
        cls_emb = self.param("cls_emb", trunc_normal_init(0.02),
                             (1, self.n_cls, self.d_model))
        x = jnp.concatenate(
            [x, jnp.broadcast_to(cls_emb, (x.shape[0],) + cls_emb.shape[1:])],
            axis=1)
        dpr = np.linspace(0.0, self.drop_path_rate, self.n_layers)
        for i in range(self.n_layers):
            x = Block(self.d_model, self.n_heads, self.d_ff, self.dropout,
                      float(dpr[i]), name=f"block{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")(x)

        patches, cls_feat = x[:, :-self.n_cls], x[:, -self.n_cls:]
        proj_patch = self.param("proj_patch", nn.initializers.normal(scale),
                                (self.d_model, self.d_model))
        proj_classes = self.param("proj_classes",
                                  nn.initializers.normal(scale),
                                  (self.d_model, self.d_model))
        patches = patches @ proj_patch
        cls_feat = cls_feat @ proj_classes
        patches = patches / jnp.linalg.norm(patches, axis=-1, keepdims=True)
        cls_feat = cls_feat / jnp.linalg.norm(cls_feat, axis=-1, keepdims=True)

        masks = jnp.einsum("bnd,bkd->bnk", patches, cls_feat)
        masks = nn.LayerNorm(epsilon=1e-5, name="mask_norm")(masks)
        b, n, k = masks.shape
        return masks.reshape(b, h, n // h, k)


class SegMenter(nn.Module):
    """Full Segmenter; parity ``semseg/models/segmenter.py:193-231``."""
    n_cls: int
    image_size: tuple = (512, 512)
    patch_size: int = 16
    n_layers: int = 12
    d_model: int = 384
    n_heads: int = 6
    dropout: float = 0.0
    drop_path_rate: float = 0.1
    distilled: bool = False
    decoder_name: str = "mask_transformer"
    decoder_n_layers: int = 2

    @nn.compact
    def __call__(self, im: Array, labels: Optional[Array] = None,
                 train: bool = False):
        h_ori, w_ori = im.shape[1], im.shape[2]
        ps = self.patch_size
        pad_h = (-h_ori) % ps
        pad_w = (-w_ori) % ps
        if pad_h or pad_w:
            im = jnp.pad(im, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        h, w = im.shape[1], im.shape[2]

        x = VisionTransformer(
            image_size=self.image_size, patch_size=ps,
            n_layers=self.n_layers, d_model=self.d_model,
            d_ff=4 * self.d_model, n_heads=self.n_heads,
            dropout=self.dropout, drop_path_rate=self.drop_path_rate,
            distilled=self.distilled, name="encoder")(
                im, deterministic=not train)
        num_extra = 1 + int(self.distilled)
        x = x[:, num_extra:]

        if self.decoder_name == "mask_transformer":
            masks = MaskTransformer(
                self.n_cls, ps, d_encoder=self.d_model,
                n_layers=self.decoder_n_layers, d_model=self.d_model,
                n_heads=self.d_model // 64, d_ff=4 * self.d_model,
                name="decoder")(x, (h, w), deterministic=not train)
        elif self.decoder_name == "linear":
            masks = DecoderLinear(self.n_cls, ps, name="decoder")(
                x, (h, w), deterministic=not train)
        else:
            raise ValueError(f"Unknown decoder: {self.decoder_name}")

        masks = resize_bilinear(masks, (h, w), align_corners=False)
        if pad_h:
            masks = masks[:, :h_ori]
        if pad_w:
            masks = masks[:, :, :w_ori]
        return masks
