"""Plain ViT encoder for the Segmenter family (NHWC in, token sequence out).

Behavioral parity target: ``semseg/models/backbones/vit_encoder.py``:
patch-embed conv (``:171-192``), cls (+optional dist) token, additive
pos-embed with on-the-fly bilinear resize for non-native grids (``:68-86``),
pre-norm transformer blocks (``:130-145``), final LayerNorm; ``pre_neck``
returns the token sequence (``:265-294``).

TPU-first notes: attention is explicit einsum QK^T/softmax/V — XLA fuses it
into flash-style kernels on TPU, and unlike ``jax.nn.dot_product_attention``
it honors the session matmul precision and the reference's scale-after-
matmul order (differential-tested, see tests/test_reference_diff.py).
Sequence length for 512^2/16 inputs is 1025 tokens + class embeddings,
which fits VMEM-tiled attention comfortably. All LayerNorms pin the torch
default epsilon=1e-5 (flax defaults to 1e-6 — a real parity bug the
differential harness caught).
"""

from __future__ import annotations

import math


import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from robseg_tpu.models.layers import DropPath, trunc_normal_init
from robseg_tpu.ops.resize import resize_bilinear

Array = jnp.ndarray


def resize_pos_embed(posemb: Array, grid_old, grid_new,
                     num_extra_tokens: int) -> Array:
    """Bilinearly resample the grid part of a (1, N, D) pos-embed.

    Parity: ``vit_encoder.py:68-86`` (``resize_pos_embed``).
    """
    tok = posemb[:, :num_extra_tokens]
    grid = posemb[0, num_extra_tokens:]
    if grid_old is None:
        g = int(math.sqrt(grid.shape[0]))
        grid_old = (g, g)
    gh, gw = grid_new
    grid = grid.reshape(grid_old[0], grid_old[1], -1)
    grid = resize_bilinear(grid, (gh, gw), align_corners=False)
    grid = grid.reshape(1, gh * gw, -1)
    return jnp.concatenate([tok, grid], axis=1)


class Attention(nn.Module):
    """Standard MHSA; parity ``vit_encoder.py:89-127``."""
    dim: int
    heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        b, n, c = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # explicit einsum attention, NOT jax.nn.dot_product_attention: the
        # latter scales q BEFORE the matmul and computes internally at
        # reduced precision (measured 7e-7 off in f64) — the reference
        # computes (q @ k^T) * head_dim**-0.5 then softmax
        # (vit_encoder.py:118-123); differential tests require that order
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (head_dim ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        y = y.reshape(b, n, c)
        y = nn.Dense(self.dim, name="proj")(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y


class FeedForward(nn.Module):
    """MLP; parity ``vit_encoder.py:148-168``."""
    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = nn.Dense(self.hidden_dim, kernel_init=trunc_normal_init(0.02),
                     name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, kernel_init=trunc_normal_init(0.02),
                     name="fc2")(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Block(nn.Module):
    """Pre-norm transformer block; parity ``vit_encoder.py:130-145``."""
    dim: int
    heads: int
    mlp_dim: int
    dropout: float = 0.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        y = Attention(self.dim, self.heads, self.dropout, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x), deterministic)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic)
        y = FeedForward(self.dim, self.mlp_dim, self.dropout, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)
        return x


class VisionTransformer(nn.Module):
    """ViT encoder returning the full token sequence (pre_neck mode).

    Parity: ``vit_encoder.py:195-304``. ``image_size`` fixes the native
    pos-embed grid; other (static) input sizes trigger pos-embed resampling
    at trace time — constant-folded by XLA, unlike the reference's per-call
    interpolation.
    """
    image_size: tuple = (512, 512)
    patch_size: int = 16
    n_layers: int = 12
    d_model: int = 384
    d_ff: int = 1536
    n_heads: int = 6
    dropout: float = 0.0
    drop_path_rate: float = 0.1
    distilled: bool = False

    @nn.compact
    def __call__(self, im: Array, deterministic: bool = True) -> Array:
        b, h, w, _ = im.shape
        ps = self.patch_size
        x = nn.Conv(self.d_model, (ps, ps), strides=ps, padding=0,
                    name="patch_embed")(im)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.d_model)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.d_model))
        toks = [jnp.broadcast_to(cls_token, (b, 1, self.d_model))]
        num_extra = 1
        if self.distilled:
            dist_token = self.param("dist_token", nn.initializers.zeros,
                                    (1, 1, self.d_model))
            toks.append(jnp.broadcast_to(dist_token, (b, 1, self.d_model)))
            num_extra = 2
        x = jnp.concatenate(toks + [x], axis=1)

        native_grid = (self.image_size[0] // ps, self.image_size[1] // ps)
        n_native = native_grid[0] * native_grid[1] + num_extra
        pos_embed = self.param("pos_embed", trunc_normal_init(0.02),
                               (1, n_native, self.d_model))
        if x.shape[1] != n_native:
            pos_embed = resize_pos_embed(pos_embed, native_grid, (gh, gw),
                                         num_extra)
        x = x + pos_embed
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        dpr = np.linspace(0.0, self.drop_path_rate, self.n_layers)
        for i in range(self.n_layers):
            x = Block(self.d_model, self.n_heads, self.d_ff, self.dropout,
                      float(dpr[i]), name=f"block{i}")(x, deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)
