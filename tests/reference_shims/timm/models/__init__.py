from timm.models import layers, registry, vision_transformer  # noqa: F401
