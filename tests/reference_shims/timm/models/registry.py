"""Shim of timm.models.registry.register_model: records nothing, returns
the function unchanged (the reference only decorates zoo constructors)."""


def register_model(fn):
    return fn
