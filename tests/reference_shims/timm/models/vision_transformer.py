"""Shim for the timm.models.vision_transformer symbols the reference
imports. None of them are exercised by the differential tests:
``default_cfgs`` lookups fall through to the reference's own else-branch,
``_create_vision_transformer`` is only reachable via the @register_model
zoo functions (never called), and ``_load_weights`` only via
``VisionTransformer.load_pretrained`` (never called)."""

default_cfgs = {}


def _create_vision_transformer(*args, **kwargs):
    raise NotImplementedError(
        "timm shim: _create_vision_transformer is not available; the "
        "differential tests construct the reference's own VisionTransformer")


def _load_weights(*args, **kwargs):
    raise NotImplementedError("timm shim: npz weight loading unavailable")
