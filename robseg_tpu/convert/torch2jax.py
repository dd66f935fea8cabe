"""PyTorch-checkpoint -> Flax-variables converters for all model families.

These replicate the reference's checkpoint loaders key-for-key so released
PyTorch weights evaluate identically here:
  * ConvNeXt robust-ImageNet backbones: ``load_carefully`` /
    ``load_carefully_cvst`` (``convnext_orig.py:218-307``) including the
    ``module.`` / ``base_model.`` prefix stripping;
  * full-model state_dicts saved by the trainer
    (``train_rob_seg.py:405-419``) for UperNet / PSPNet / Segmenter;
  * ViT backbone checkpoints with pos-embed resampling
    (``checkpoint_filter_fn``, ``segmenter.py:144-163``).

Tensor layout maps (torch -> flax/NHWC):
  conv (O, I, kh, kw) -> (kh, kw, I, O); depthwise (C, 1, k, k) ->
  (k, k, 1, C); linear (O, I) -> (I, O); LayerNorm/BN weight -> scale.
State dicts are plain ``{name: np.ndarray}`` — load with
``torch.load(..., map_location='cpu')`` and pass ``{k: v.numpy()}``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from robseg_tpu.models.convnext import CONVNEXT_SETTINGS

Tensors = Dict[str, np.ndarray]


def strip_prefixes(sd: Tensors) -> Tensors:
    """Parity: ``convnext_orig.py:261-262`` / ``segmenter.py:300-304``."""
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "").replace("base_model.", "")
        out[k] = np.asarray(v)
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dwconv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # (C,1,k,k) -> (k,k,1,C)


def _lin(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _conv_module(params: Dict, stats: Dict, dst: str, sd: Tensors,
                 src_conv: str, src_bn: str) -> None:
    """torch Conv2d+BatchNorm pair -> ConvModule {conv, bn} + batch_stats."""
    _set(params, f"{dst}/conv/kernel", _conv(sd[f"{src_conv}.weight"]))
    if f"{src_conv}.bias" in sd:
        _set(params, f"{dst}/conv/bias", sd[f"{src_conv}.bias"])
    _set(params, f"{dst}/bn/scale", sd[f"{src_bn}.weight"])
    _set(params, f"{dst}/bn/bias", sd[f"{src_bn}.bias"])
    _set(stats, f"{dst}/bn/mean", sd[f"{src_bn}.running_mean"])
    _set(stats, f"{dst}/bn/var", sd[f"{src_bn}.running_var"])


def _ln(params: Dict, dst: str, sd: Tensors, src: str) -> None:
    _set(params, f"{dst}/scale", sd[f"{src}.weight"])
    _set(params, f"{dst}/bias", sd[f"{src}.bias"])


# ---------------------------------------------------------------------------
# ConvNeXt backbone
# ---------------------------------------------------------------------------

def convert_convnext_backbone(sd: Tensors, variant: str,
                              src_prefix: str = "",
                              cvst_ckpt_layout: bool = False) -> Dict:
    """ConvNeXt params subtree.

    ``cvst_ckpt_layout=True`` reads the robust-pretraining layout
    (``stem.stem.{i}``, ``stages.{l}.downsample.{p}``,
    ``stages.{j}.blocks.{k}.conv_dw/mlp.fc1...`` —
    ``load_carefully_cvst``, ``convnext_orig.py:258-307``); otherwise the
    plain layout (``downsample_layers.{i}.{p}``, ``stages.{j}.{k}.dwconv``
    — ``load_carefully``, ``convnext_orig.py:218-256``).
    """
    depths = CONVNEXT_SETTINGS[variant][0]
    p = src_prefix
    params: Dict = {}

    if "CVST" in variant:
        if cvst_ckpt_layout:
            stem_keys = [f"{p}stem.stem.{i}" for i in (0, 1, 3, 4)]
        else:
            stem_keys = [f"{p}downsample_layers.0.stem.{i}"
                         for i in (0, 1, 3, 4)]
        _set(params, "stem_cvst/conv0/kernel", _conv(sd[stem_keys[0] + ".weight"]))
        _set(params, "stem_cvst/conv0/bias", sd[stem_keys[0] + ".bias"])
        _ln(params, "stem_cvst/norm0", sd, stem_keys[1])
        _set(params, "stem_cvst/conv1/kernel", _conv(sd[stem_keys[2] + ".weight"]))
        _set(params, "stem_cvst/conv1/bias", sd[stem_keys[2] + ".bias"])
        _ln(params, "stem_cvst/norm1", sd, stem_keys[3])
    else:
        _set(params, "stem/conv/kernel",
             _conv(sd[f"{p}downsample_layers.0.0.weight"]))
        _set(params, "stem/conv/bias", sd[f"{p}downsample_layers.0.0.bias"])
        _ln(params, "stem/norm", sd, f"{p}downsample_layers.0.1")

    for l in range(1, 4):
        if cvst_ckpt_layout:
            ds = f"{p}stages.{l}.downsample"
        else:
            ds = f"{p}downsample_layers.{l}"
        _ln(params, f"downsample_norm{l}", sd, f"{ds}.0")
        _set(params, f"downsample_conv{l}/kernel", _conv(sd[f"{ds}.1.weight"]))
        _set(params, f"downsample_conv{l}/bias", sd[f"{ds}.1.bias"])

    for j in range(4):
        for k in range(depths[j]):
            if cvst_ckpt_layout:
                b = f"{p}stages.{j}.blocks.{k}"
                dw, fc1, fc2 = "conv_dw", "mlp.fc1", "mlp.fc2"
            else:
                b = f"{p}stages.{j}.{k}"
                dw, fc1, fc2 = "dwconv", "pwconv1", "pwconv2"
            dst = f"stage{j}_block{k}"
            _set(params, f"{dst}/gamma", sd[f"{b}.gamma"])
            _set(params, f"{dst}/dwconv/kernel", _dwconv(sd[f"{b}.{dw}.weight"]))
            _set(params, f"{dst}/dwconv/bias", sd[f"{b}.{dw}.bias"])
            _ln(params, f"{dst}/norm", sd, f"{b}.norm")
            _set(params, f"{dst}/pwconv1/kernel", _lin(sd[f"{b}.{fc1}.weight"]))
            _set(params, f"{dst}/pwconv1/bias", sd[f"{b}.{fc1}.bias"])
            _set(params, f"{dst}/pwconv2/kernel", _lin(sd[f"{b}.{fc2}.weight"]))
            _set(params, f"{dst}/pwconv2/bias", sd[f"{b}.{fc2}.bias"])

    # per-stage norms (full-model ckpts; robust-imagenet backbones lack them)
    for i in range(4):
        if f"{p}norm{i}.weight" in sd:
            _ln(params, f"norm{i}", sd, f"{p}norm{i}")
    return params


# ---------------------------------------------------------------------------
# UperNet full model
# ---------------------------------------------------------------------------

def convert_upernet(sd: Tensors, variant: str) -> Tuple[Dict, Dict]:
    """Full UperNet state_dict -> (params, batch_stats).

    Source key layout from ``semseg/models/uperforseg.py`` module names.
    """
    sd = strip_prefixes(sd)
    params: Dict = {}
    stats: Dict = {}
    params["backbone"] = convert_convnext_backbone(sd, variant,
                                                   src_prefix="backbone.")

    dh = "decode_head"
    for i in range(4):  # psp blocks: psp_modules.{i}.1 is the ConvModule
        _conv_module(params, stats, f"{dh}/psp_block{i}", sd,
                     f"{dh}.psp_modules.{i}.1.conv",
                     f"{dh}.psp_modules.{i}.1.batch_norm")
    _conv_module(params, stats, f"{dh}/bottleneck", sd,
                 f"{dh}.bottleneck.conv", f"{dh}.bottleneck.batch_norm")
    for i in range(3):
        _conv_module(params, stats, f"{dh}/lateral{i}", sd,
                     f"{dh}.lateral_convs.{i}.conv",
                     f"{dh}.lateral_convs.{i}.batch_norm")
        _conv_module(params, stats, f"{dh}/fpn{i}", sd,
                     f"{dh}.fpn_convs.{i}.conv",
                     f"{dh}.fpn_convs.{i}.batch_norm")
    _conv_module(params, stats, f"{dh}/fpn_bottleneck", sd,
                 f"{dh}.fpn_bottleneck.conv",
                 f"{dh}.fpn_bottleneck.batch_norm")
    _set(params, f"{dh}/classifier/kernel",
         _conv(sd[f"{dh}.classifier.weight"]))
    _set(params, f"{dh}/classifier/bias", sd[f"{dh}.classifier.bias"])

    ah = "auxiliary_head"
    _conv_module(params, stats, f"{ah}/conv0", sd,
                 f"{ah}.convs.0.conv", f"{ah}.convs.0.batch_norm")
    _set(params, f"{ah}/classifier/kernel",
         _conv(sd[f"{ah}.classifier.weight"]))
    _set(params, f"{ah}/classifier/bias", sd[f"{ah}.classifier.bias"])
    return params, stats


# ---------------------------------------------------------------------------
# PSPNet full model
# ---------------------------------------------------------------------------

def _bn_pair(params, stats, dst, sd, src):
    _set(params, f"{dst}/scale", sd[f"{src}.weight"])
    _set(params, f"{dst}/bias", sd[f"{src}.bias"])
    _set(stats, f"{dst}/mean", sd[f"{src}.running_mean"])
    _set(stats, f"{dst}/var", sd[f"{src}.running_var"])


def convert_pspnet(sd: Tensors, deep_base: bool = True) -> Tuple[Dict, Dict]:
    """PSPNet state_dict -> (params, batch_stats).

    Source layout from ``ddcat_psp.py:372-457`` (layer0 Sequential of the
    deep-base stem convs/bns, layer1..4 bottlenecks, ppm.features, cls, aux).
    """
    sd = strip_prefixes(sd)
    params: Dict = {}
    stats: Dict = {}
    bb = "backbone"
    # layer0 deep-base: Sequential(conv1,bn1,relu,conv2,bn2,relu,conv3,bn3,
    # relu,maxpool) -> indices 0,1,3,4,6,7
    stem = [("conv1", "bn1", 0, 1), ("conv2", "bn2", 3, 4),
            ("conv3", "bn3", 6, 7)] if deep_base else [("conv1", "bn1", 0, 1)]
    for (cname, bname, ci, bi) in stem:
        _set(params, f"{bb}/{cname}/kernel",
             _conv(sd[f"layer0.{ci}.weight"]))
        _bn_pair(params, stats, f"{bb}/{bname}/bn", sd, f"layer0.{bi}")

    layer_blocks = (3, 4, 6, 3)
    for s in range(4):
        for b in range(layer_blocks[s]):
            src = f"layer{s + 1}.{b}"
            dst = f"{bb}/layer{s + 1}_block{b}"
            for c in (1, 2, 3):
                _set(params, f"{dst}/conv{c}/kernel",
                     _conv(sd[f"{src}.conv{c}.weight"]))
                _bn_pair(params, stats, f"{dst}/bn{c}/bn", sd, f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in sd:
                _set(params, f"{dst}/downsample_conv/kernel",
                     _conv(sd[f"{src}.downsample.0.weight"]))
                _bn_pair(params, stats, f"{dst}/downsample_bn/bn", sd,
                         f"{src}.downsample.1")

    for i in range(4):  # ppm.features.{i}: [pool, conv, bn, relu]
        _set(params, f"ppm/bin{i}/conv/kernel",
             _conv(sd[f"ppm.features.{i}.1.weight"]))
        _bn_pair(params, stats, f"ppm/bin{i}/bn", sd, f"ppm.features.{i}.2")

    # cls: Sequential(conv,bn,relu,dropout,conv)
    _set(params, "cls/conv/conv/kernel", _conv(sd["cls.0.weight"]))
    _bn_pair(params, stats, "cls/conv/bn", sd, "cls.1")
    _set(params, "cls/classifier/kernel", _conv(sd["cls.4.weight"]))
    _set(params, "cls/classifier/bias", sd["cls.4.bias"])
    if "aux.0.weight" in sd:
        _set(params, "aux/conv/conv/kernel", _conv(sd["aux.0.weight"]))
        _bn_pair(params, stats, "aux/conv/bn", sd, "aux.1")
        _set(params, "aux/classifier/kernel", _conv(sd["aux.4.weight"]))
        _set(params, "aux/classifier/bias", sd["aux.4.bias"])
    return params, stats


def convert_resnet_backbone(sd: Tensors, deep_base: bool = False
                            ) -> Tuple[Dict, Dict]:
    """Torchvision/DDCAT-style ResNet-50 state_dict -> (params, batch_stats)
    subtrees for the PSPNet ``backbone`` collection.

    This is the PIR initialization path for PSPNet: the reference loads a
    robust-ImageNet ResNet-50 checkpoint strictly into its ResNet module
    (``resnet_ddcat.py:213-240``; the classifier head is unused by PSPNet).
    ``deep_base``: the 3-conv stem layout (conv1..3/bn1..3) of the
    ``clean=True`` variant vs the standard 7x7 stem.
    """
    sd = strip_prefixes(sd)
    params: Dict = {}
    stats: Dict = {}
    stem = ([("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")]
            if deep_base else [("conv1", "bn1")])
    for cname, bname in stem:
        _set(params, f"{cname}/kernel", _conv(sd[f"{cname}.weight"]))
        _bn_pair(params, stats, f"{bname}/bn", sd, bname)
    layer_blocks = (3, 4, 6, 3)
    for s in range(4):
        for b in range(layer_blocks[s]):
            src = f"layer{s + 1}.{b}"
            dst = f"layer{s + 1}_block{b}"
            for c in (1, 2, 3):
                _set(params, f"{dst}/conv{c}/kernel",
                     _conv(sd[f"{src}.conv{c}.weight"]))
                _bn_pair(params, stats, f"{dst}/bn{c}/bn", sd, f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in sd:
                _set(params, f"{dst}/downsample_conv/kernel",
                     _conv(sd[f"{src}.downsample.0.weight"]))
                _bn_pair(params, stats, f"{dst}/downsample_bn/bn", sd,
                         f"{src}.downsample.1")
    return params, stats


# ---------------------------------------------------------------------------
# ViT / Segmenter
# ---------------------------------------------------------------------------

def resize_pos_embed_np(posemb: np.ndarray, grid_new, num_extra: int
                        ) -> np.ndarray:
    """Bilinear pos-embed resampling; parity ``vit_encoder.py:68-86``."""
    import jax.numpy as jnp
    from robseg_tpu.ops.resize import resize_bilinear
    tok = posemb[:, :num_extra]
    grid = posemb[0, num_extra:]
    g = int(np.sqrt(grid.shape[0]))
    grid = np.asarray(resize_bilinear(
        jnp.asarray(grid.reshape(g, g, -1)), grid_new,
        align_corners=False))
    return np.concatenate([tok, grid.reshape(1, -1, posemb.shape[-1])],
                          axis=1)


def _vit_block(params: Dict, dst: str, sd: Tensors, src: str) -> None:
    _ln(params, f"{dst}/norm1", sd, f"{src}.norm1")
    _ln(params, f"{dst}/norm2", sd, f"{src}.norm2")
    _set(params, f"{dst}/attn/qkv/kernel", _lin(sd[f"{src}.attn.qkv.weight"]))
    _set(params, f"{dst}/attn/qkv/bias", sd[f"{src}.attn.qkv.bias"])
    _set(params, f"{dst}/attn/proj/kernel",
         _lin(sd[f"{src}.attn.proj.weight"]))
    _set(params, f"{dst}/attn/proj/bias", sd[f"{src}.attn.proj.bias"])
    _set(params, f"{dst}/mlp/fc1/kernel", _lin(sd[f"{src}.mlp.fc1.weight"]))
    _set(params, f"{dst}/mlp/fc1/bias", sd[f"{src}.mlp.fc1.bias"])
    _set(params, f"{dst}/mlp/fc2/kernel", _lin(sd[f"{src}.mlp.fc2.weight"]))
    _set(params, f"{dst}/mlp/fc2/bias", sd[f"{src}.mlp.fc2.bias"])


def convert_vit_encoder(sd: Tensors, n_layers: int = 12,
                        src_prefix: str = "",
                        target_grid=None) -> Dict:
    """ViT encoder subtree; handles pos-embed grid resampling.

    Parity: ``create_vit`` + ``checkpoint_filter_fn``
    (``segmenter.py:268-317,144-163``).
    """
    p = src_prefix
    params: Dict = {}
    _set(params, "patch_embed/kernel",
         _conv(sd[f"{p}patch_embed.proj.weight"]))
    _set(params, "patch_embed/bias", sd[f"{p}patch_embed.proj.bias"])
    _set(params, "cls_token", sd[f"{p}cls_token"])
    pos = sd[f"{p}pos_embed"]
    num_extra = 1 + (f"{p}dist_token" in sd)
    if f"{p}dist_token" in sd:
        _set(params, "dist_token", sd[f"{p}dist_token"])
    if target_grid is not None:
        want = target_grid[0] * target_grid[1] + num_extra
        if pos.shape[1] != want:
            pos = resize_pos_embed_np(pos, target_grid, num_extra)
    _set(params, "pos_embed", pos)
    for i in range(n_layers):
        _vit_block(params, f"block{i}", sd, f"{p}blocks.{i}")
    _ln(params, "norm", sd, f"{p}norm")
    return params


def convert_segmenter(sd: Tensors, n_layers: int = 12,
                      decoder_layers: int = 2,
                      target_grid=(32, 32)) -> Tuple[Dict, Dict]:
    """Full Segmenter state_dict -> (params, {}) (no BN anywhere)."""
    sd = strip_prefixes(sd)
    params: Dict = {}
    params["encoder"] = convert_vit_encoder(
        sd, n_layers, src_prefix="encoder.", target_grid=target_grid)
    d = "decoder"
    dp: Dict = {}
    _set(dp, "proj_dec/kernel", _lin(sd[f"{d}.proj_dec.weight"]))
    _set(dp, "proj_dec/bias", sd[f"{d}.proj_dec.bias"])
    _set(dp, "cls_emb", sd[f"{d}.cls_emb"])
    _set(dp, "proj_patch", sd[f"{d}.proj_patch"])
    _set(dp, "proj_classes", sd[f"{d}.proj_classes"])
    for i in range(decoder_layers):
        _vit_block(dp, f"block{i}", sd, f"{d}.blocks.{i}")
    _ln(dp, "decoder_norm", sd, f"{d}.decoder_norm")
    _ln(dp, "mask_norm", sd, f"{d}.mask_norm")
    params["decoder"] = dp
    return params, {}
