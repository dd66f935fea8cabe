"""Model zoo and functional model bundles.

``build_model(cfg)`` maps the reference's YAML ``MODEL`` section to a Flax
module (parity: model selection in ``tools/infer.py:256-268`` and
``tools/train_rob_seg.py:85-106``). ``ModelBundle`` packages a module with
its variables and exposes ``logits_fn`` / train-mode apply closures that the
attack engine and trainers consume.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from robseg_tpu.models.convnext import ConvNeXt, CONVNEXT_SETTINGS  # noqa: F401
from robseg_tpu.models.upernet import (  # noqa: F401
    UperNetForSemanticSegmentation, UperNetHead, UperNetFCNHead)
from robseg_tpu.models.vit import VisionTransformer  # noqa: F401
from robseg_tpu.models.segmenter import (  # noqa: F401
    SegMenter, MaskTransformer, DecoderLinear)
from robseg_tpu.models.resnet import ResNetStages, Bottleneck  # noqa: F401
from robseg_tpu.models.pspnet import (  # noqa: F401
    PSPNet, PSPNetDDCAT, DeepLabV3, DeepLabV3DDCAT, PPM, ASPP)
from robseg_tpu.models.wrappers import (  # noqa: F401
    normalize_input, normalize_model, mask_class, mask_logits)

# Segmenter architecture zoo; parity: ``configs/segmenter.yml:1-115`` merged
# by ``load_config_segmenter`` (``semseg/utils/utils.py:258-278``) — im_size
# 512, mask_transformer with 2 layers.
SEGMENTER_VARIANTS = {
    "vit_tiny_patch16_384": dict(d_model=192, n_heads=3, n_layers=12),
    "vit_small_patch16_224": dict(d_model=384, n_heads=6, n_layers=12),
    "vit_small_patch16_384": dict(d_model=384, n_heads=6, n_layers=12),
    "vit_small_patch32_384": dict(d_model=384, n_heads=6, n_layers=12,
                                  patch_size=32),
    "vit_base_patch16_384": dict(d_model=768, n_heads=12, n_layers=12),
    "vit_base_patch8_384": dict(d_model=768, n_heads=12, n_layers=12,
                                patch_size=8),
    "vit_base_patch32_384": dict(d_model=768, n_heads=12, n_layers=12,
                                 patch_size=32),
    "vit_large_patch32_384": dict(d_model=1024, n_heads=16, n_layers=24,
                                  patch_size=32),
    "vit_base_patch16_SAM": dict(d_model=768, n_heads=12, n_layers=12),
    "vit_large_patch16_384": dict(d_model=1024, n_heads=16, n_layers=24),
    # DeiT distilled variants (``configs/segmenter.yml:1-33``): identical
    # geometry to the vit_* peers plus a distillation token; the reference's
    # ``load_config_segmenter`` overrides image_size to the dataset crop for
    # every zoo entry, so the 224 pretrain size never reaches the model.
    "deit_tiny_distilled_patch16_224": dict(d_model=192, n_heads=3,
                                            n_layers=12, distilled=True),
    "deit_small_distilled_patch16_224": dict(d_model=384, n_heads=6,
                                             n_layers=12, distilled=True),
    "deit_base_distilled_patch16_224": dict(d_model=768, n_heads=12,
                                            n_layers=12, distilled=True),
    "deit_base_distilled_patch16_384": dict(d_model=768, n_heads=12,
                                            n_layers=12, distilled=True),
}


def create_segmenter(backbone: str, n_cls: int, image_size=(512, 512)
                     ) -> SegMenter:
    """Parity: ``create_segmenter`` (``semseg/models/segmenter.py:344-353``)
    + the config merge in ``load_config_segmenter``."""
    v = dict(SEGMENTER_VARIANTS[backbone])
    patch_size = v.pop("patch_size", 16)
    return SegMenter(n_cls=n_cls, image_size=tuple(image_size),
                     patch_size=patch_size, dropout=0.0, drop_path_rate=0.1,
                     decoder_n_layers=2, **v)


def build_model(model_name: str, backbone: str, n_cls: int,
                image_size=(512, 512), bn_axis_name: Optional[str] = None,
                pspnet_clean: bool = True, fused: bool = False):
    """Build the Flax module for a (MODEL.NAME, BACKBONE, N_CLS) triple.

    ``pspnet_clean``: the reference's ``clean`` flag (deep-base 3-conv stem
    vs the robust-checkpoint 7x7 stem; ``tools/train_rob_seg.py:92-98``
    derives it from 'clean' in ADDENDUM).
    ``fused``: route ConvNeXt blocks through the whole-block Pallas kernel
    (attack/eval only; +~2.5% attack rate, -20% backbone fwd — see
    BENCHMARKS.md). Same parameter tree either way.
    """
    if fused and model_name != "UperNetForSemanticSegmentation":
        # only the ConvNeXt backbone has a fused-block kernel; silently
        # ignoring the flag would let --fused report unfused numbers
        raise ValueError(
            f"fused=True is only supported for UperNet (ConvNeXt backbone); "
            f"got MODEL.NAME={model_name!r}")
    if model_name == "SegMenter":
        return create_segmenter(backbone, n_cls, image_size)
    if model_name == "UperNetForSemanticSegmentation":
        variant = backbone.split("-")[1]
        return UperNetForSemanticSegmentation(
            backbone_variant=variant, num_classes=n_cls,
            bn_axis_name=bn_axis_name, fused_mlp=fused,
            fused_mlp_mode="block",
            # measured (tools/bench_fused.py): the pure-XLA split head
            # beats both the concat ConvModule and the Pallas fpn kernel
            fused_head="split" if fused else False)
    if model_name == "PSPNet":
        return PSPNet(classes=n_cls, deep_base=pspnet_clean,
                      bn_axis_name=bn_axis_name)
    if model_name == "PSPNet_DDCAT":
        return PSPNetDDCAT(classes=n_cls, bn_axis_name=bn_axis_name)
    if model_name == "DeepLabV3":
        return DeepLabV3(classes=n_cls, bn_axis_name=bn_axis_name)
    if model_name == "DeepLabV3_DDCAT":
        return DeepLabV3DDCAT(classes=n_cls, bn_axis_name=bn_axis_name)
    raise ValueError(f"Unknown model {model_name!r}")


@dataclasses.dataclass
class ModelBundle:
    """A module plus its variables, with eval/train apply closures.

    The attack engine only sees ``logits_fn`` — a pure
    ``x (B,H,W,3 in [0,1]) -> logits (B,H,W,C)`` function with BN in
    inference mode (the reference asserts ``not model.training`` before
    attacks, ``semseg/attacker.py:280``).
    """
    module: Any
    params: Dict
    batch_stats: Dict
    normalize: bool = False

    @classmethod
    def create(cls, module, rng, input_shape=(1, 512, 512, 3),
               normalize: bool = False) -> "ModelBundle":
        variables = module.init(rng, jnp.zeros(input_shape, jnp.float32))
        return cls(module=module, params=variables.get("params", {}),
                   batch_stats=variables.get("batch_stats", {}),
                   normalize=normalize)

    @property
    def variables(self) -> Dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def logits_fn(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.normalize:
            x = normalize_input(x)
        return self.module.apply(self.variables, x)

    def make_logits_fn(self, params=None, batch_stats=None) -> Callable:
        """logits_fn closed over explicit variables (for jit/grad purity)."""
        v = {"params": params if params is not None else self.params}
        bs = batch_stats if batch_stats is not None else self.batch_stats
        if bs:
            v["batch_stats"] = bs
        if self.normalize:
            return lambda x: self.module.apply(v, normalize_input(x))
        return lambda x: self.module.apply(v, x)
