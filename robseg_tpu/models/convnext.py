"""ConvNeXt backbone (+ CvSt convolutional stem variants), NHWC Flax.

Behavioral parity target: ``semseg/models/backbones/convnext_orig.py``.
Four stages; the stem is either the classic 4x4/4 patchify conv + LayerNorm
(``convnext_orig.py:140-147``) or, for ``*_CVST`` variants, two 3x3 stride-2
convs with LayerNorm+GELU after each (``ConvBlock1``,
``convnext_orig.py:17-38``). Each stage output is LayerNorm-ed and returned
as a pyramid feature (``forward_features``, ``convnext_orig.py:309-321``).

TPU-first notes: everything is channels-last so the ConvNeXt block is a
depthwise conv + LN + two Dense layers with *no* layout permutes (the
reference permutes NCHW<->NHWC around every block, ``convnext_orig.py:72-85``
— free here). GELU is exact (erf), matching ``nn.GELU()``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from robseg_tpu.models.layers import DropPath, trunc_normal_init

Array = jnp.ndarray

# [depths, dims, aux_head_channels, drop_path_rate]
# Parity: ``convnext_orig.py:88-100`` (CONVNEXT_SETTINGS).
CONVNEXT_SETTINGS = {
    "T": [[3, 3, 9, 3], [96, 192, 384, 768], 384, 0.4],
    "T_CVST": [[3, 3, 9, 3], [96, 192, 384, 768], 384, 0.4],
    "T_CVST_ROB": [[3, 3, 9, 3], [96, 192, 384, 768], 384, 0.4],
    "S_CVST_ROB": [[3, 3, 27, 3], [96, 192, 384, 768], 384, 0.3],
    "S_CVST": [[3, 3, 27, 3], [96, 192, 384, 768], 384, 0.3],
    "B": [[3, 3, 27, 3], [128, 256, 512, 1024], 512, 0.4],
}


class ConvNeXtBlock(nn.Module):
    """dwconv7x7 -> LN -> Dense 4x -> GELU -> Dense -> gamma -> droppath.

    ``fused_mlp=True`` routes the LN/MLP/gamma branch through the Pallas
    kernel (``kernels/convnext_mlp.py``): the 4x-width hidden never touches
    HBM. Same param tree either way; fused mode differentiates w.r.t.
    activations only (attack/eval use — not for weight training).
    """
    dim: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 1.0
    fused_mlp: bool = False
    # "residual": fwd also writes the pre-GELU hidden once so the bwd does
    # 2 matmuls (attack path); "recompute": h never touches HBM, bwd
    # recomputes it (inference/eval-only path)
    fused_mlp_mode: str = "residual"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        dwconv = nn.Conv(self.dim, (7, 7), padding=3,
                         feature_group_count=self.dim,
                         kernel_init=trunc_normal_init(0.02), name="dwconv")
        y = dwconv(x)
        norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        pw1 = nn.Dense(4 * self.dim, kernel_init=trunc_normal_init(0.02),
                       name="pwconv1")
        pw2 = nn.Dense(self.dim, kernel_init=trunc_normal_init(0.02),
                       name="pwconv2")
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.layer_scale_init_value),
            (self.dim,))
        # The kernels are deterministic-mode only (their VJP ignores
        # DropPath), so a train-mode apply falls through to the XLA path
        # rather than silently dropping stochastic depth. Per-kernel dim
        # gates live on the branches below (the MLP-tail kernels stop at
        # dim 384: the 768-dim weights blow their VMEM budget; the
        # whole-image block kernel holds bf16 panels and takes dim 768).
        use_fused = (self.fused_mlp and deterministic
                     and not self.is_initializing())
        # whole-block kernel for the large-spatial stages (dims <= 192).
        # Measured (BENCHMARKS.md): fusing stage2 (dim 384) as well is a
        # small net loss at every tile height tried (th=8: 55.8, th=16:
        # 58.0 vs 58.3 without) — its backward-band overcompute costs
        # more than its small 32^2 tensors save.
        if (use_fused and self.fused_mlp_mode == "block"
                and self.dim > 192
                and 8 <= x.shape[1] <= 48 and 8 <= x.shape[2] <= 48
                and not self.is_initializing()):
            # the kernel zero-pads H/W to sublane multiples internally
            # (exactly; pad tokens are inert) — profiled ~1.9x slower per
            # pixel when fed misaligned 30^2/15^2 spatials directly
            # small-spatial stages (dim 384 @32^2, dim 768 @16^2 at 512^2
            # input): the whole zero-padded image fits in VMEM, so the
            # halo-free whole-image kernel applies — zero backward
            # overcompute (the tax that made tiled stage-2 fusion lose).
            dummy = jnp.zeros((1, self.dim), y.dtype)
            norm(dummy)
            pw1(dummy)
            pw2(jnp.zeros((1, 4 * self.dim), y.dtype))
            from robseg_tpu.kernels.convnext_block import (
                convnext_block_fused_whole_shared)
            dwv = dwconv.variables["params"]
            np_ = norm.variables["params"]
            p1 = pw1.variables["params"]
            p2 = pw2.variables["params"]
            return convnext_block_fused_whole_shared(
                x, dwv["kernel"].reshape(7, 7, self.dim), dwv["bias"],
                np_["scale"], np_["bias"], p1["kernel"], p1["bias"],
                p2["kernel"], p2["bias"], gamma)
        if (use_fused and self.fused_mlp_mode == "block"
                and self.dim <= 192):
            # whole-block Pallas kernel: dwconv+LN+MLP+gamma+residual in
            # one pass (kernels/convnext_block.py). Evaluate the flax
            # modules on dummies so their params exist, then call the
            # kernel on the raw params. Deterministic mode only.
            dummy = jnp.zeros((1, self.dim), y.dtype)
            norm(dummy)
            pw1(dummy)
            pw2(jnp.zeros((1, 4 * self.dim), y.dtype))
            from robseg_tpu.kernels.convnext_block import (
                convnext_block_fused_shared)
            dwv = dwconv.variables["params"]
            np_ = norm.variables["params"]
            p1 = pw1.variables["params"]
            p2 = pw2.variables["params"]
            out = convnext_block_fused_shared(
                x, dwv["kernel"].reshape(7, 7, self.dim), dwv["bias"],
                np_["scale"], np_["bias"], p1["kernel"], p1["bias"],
                p2["kernel"], p2["bias"], gamma)
            return out
        if use_fused and self.fused_mlp_mode != "block" and self.dim <= 384:
            # MLP-tail kernels (in block mode, dim-384 blocks fall through
            # to the default XLA path below instead)
            # create the params with dummy calls (dead code after DCE),
            # then read them raw for the kernel
            dummy = jnp.zeros((1, self.dim), y.dtype)
            norm(dummy)
            pw1(dummy)
            pw2(jnp.zeros((1, 4 * self.dim), y.dtype))
            from robseg_tpu.kernels import convnext_mlp as _k
            convnext_mlp_fused = {
                "residual": _k.convnext_mlp_fused_rs_shared,
                "recompute": _k.convnext_mlp_fused_shared,
                "residual_bf16": _k.convnext_mlp_fused_rs_bf16_shared,
                "recompute_bf16": _k.convnext_mlp_fused_bf16_shared,
            }[self.fused_mlp_mode]
            np_ = norm.variables["params"]
            p1 = pw1.variables["params"]
            p2 = pw2.variables["params"]
            y = convnext_mlp_fused(y, np_["scale"], np_["bias"],
                                   p1["kernel"], p1["bias"],
                                   p2["kernel"], p2["bias"], gamma)
        else:
            y = norm(y)
            y = pw1(y)
            y = nn.gelu(y, approximate=False)
            y = pw2(y)
            y = gamma * y
        y = DropPath(self.drop_path, name="drop_path")(y, deterministic)
        return x + y


class CvStStem(nn.Module):
    """Two-conv stride-2 stem: 3->48->96 with LN+GELU after each conv.

    Parity: ``ConvBlock1`` (``convnext_orig.py:17-38``).
    """
    planes: int = 48

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.planes, (3, 3), strides=2, padding=1, name="conv0")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm0")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.planes * 2, (3, 3), strides=2, padding=1,
                    name="conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = nn.gelu(x, approximate=False)
        return x


class PatchifyStem(nn.Module):
    """4x4 stride-4 conv + LayerNorm (``convnext_orig.py:140-147``)."""
    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.dim, (4, 4), strides=4, padding=0,
                    kernel_init=trunc_normal_init(0.02), name="conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x


class ConvNeXt(nn.Module):
    """Four-stage ConvNeXt feature extractor returning 4 normed features.

    Input:  (B, H, W, 3) -> outputs at strides (4, 8, 16, 32), channels-last.
    """
    variant: str = "T"
    layer_scale_init_value: float = 1.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    fused_mlp: bool = False  # Pallas LN/MLP fusion (attack/eval only)
    fused_mlp_mode: str = "residual"  # see ConvNeXtBlock.fused_mlp_mode

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True
                 ) -> Tuple[Array, ...]:
        assert self.variant in CONVNEXT_SETTINGS, self.variant
        depths, dims, _, drop_path_rate = CONVNEXT_SETTINGS[self.variant]
        dp_rates = np.linspace(0.0, drop_path_rate, sum(depths))

        outs = []
        cur = 0
        for i in range(4):
            if i == 0:
                if "CVST" in self.variant:
                    x = CvStStem(name="stem_cvst")(x)
                else:
                    x = PatchifyStem(dims[0], name="stem")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, name=f"downsample_norm{i}")(x)
                x = nn.Conv(dims[i], (2, 2), strides=2, padding=0,
                            kernel_init=trunc_normal_init(0.02),
                            name=f"downsample_conv{i}")(x)
            for j in range(depths[i]):
                x = ConvNeXtBlock(
                    dims[i], drop_path=float(dp_rates[cur + j]),
                    layer_scale_init_value=self.layer_scale_init_value,
                    fused_mlp=self.fused_mlp,
                    fused_mlp_mode=self.fused_mlp_mode,
                    name=f"stage{i}_block{j}")(x, deterministic)
            cur += depths[i]
            if i in self.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-6, name=f"norm{i}")(x))
        return tuple(outs)
