"""PyTorch <-> JAX checkpoint conversion."""

from robseg_tpu.convert.torch2jax import (  # noqa: F401
    strip_prefixes, convert_convnext_backbone, convert_upernet,
    convert_pspnet, convert_resnet_backbone, convert_vit_encoder,
    convert_segmenter, resize_pos_embed_np)
