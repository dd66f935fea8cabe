"""Standalone PyTorch -> JAX checkpoint converter CLI.

Converts a reference .pth state_dict into this framework's portable .npz
params (+ .stats.npz for BatchNorm running statistics), so long evaluation
sweeps skip the torch dependency and conversion cost.

Usage:
    python -m tools.convert_ckpt --model upernet --variant T_CVST \
        --src model.pth --dst model.npz
    python -m tools.convert_ckpt --model convnext_backbone --variant S_CVST \
        --src robust_imagenet.pt --dst backbone.npz --cvst-ckpt-layout
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _save(dst, tree, suffix=""):
    import jax
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {"/".join(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
           for kp, v in flat}
    path = dst if not suffix else dst.replace(".npz", f".{suffix}.npz")
    np.savez(path, **out)
    print(f"wrote {path} ({len(out)} tensors)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        choices=["upernet", "pspnet", "segmenter",
                                 "convnext_backbone", "vit_encoder"])
    parser.add_argument("--src", required=True, help="torch .pth/.pt")
    parser.add_argument("--dst", required=True, help="output .npz")
    parser.add_argument("--variant", default="T_CVST",
                        help="ConvNeXt variant (upernet/convnext_backbone)")
    parser.add_argument("--cvst-ckpt-layout", action="store_true",
                        help="robust-ImageNet backbone layout "
                             "(stem.stem.* / stages.N.blocks.*)")
    parser.add_argument("--n-layers", type=int, default=12)
    parser.add_argument("--grid", type=int, default=32,
                        help="target pos-embed grid (segmenter/vit)")
    args = parser.parse_args()

    import torch
    from robseg_tpu.convert import (strip_prefixes, convert_upernet,
                                    convert_pspnet, convert_segmenter,
                                    convert_convnext_backbone,
                                    convert_vit_encoder)

    raw = torch.load(args.src, map_location="cpu")
    if isinstance(raw, dict) and "model" in raw and not any(
            hasattr(v, "numpy") for v in raw.values()):
        raw = raw["model"]
    sd = {k: v.numpy() for k, v in raw.items() if hasattr(v, "numpy")}

    stats = None
    if args.model == "upernet":
        params, stats = convert_upernet(sd, args.variant)
    elif args.model == "pspnet":
        params, stats = convert_pspnet(sd)
    elif args.model == "segmenter":
        params, _ = convert_segmenter(sd, n_layers=args.n_layers,
                                      target_grid=(args.grid, args.grid))
    elif args.model == "convnext_backbone":
        params = convert_convnext_backbone(
            strip_prefixes(sd), args.variant,
            cvst_ckpt_layout=args.cvst_ckpt_layout)
    else:  # vit_encoder
        params = convert_vit_encoder(strip_prefixes(sd),
                                     n_layers=args.n_layers,
                                     target_grid=(args.grid, args.grid))

    _save(args.dst, params)
    if stats:
        _save(args.dst, stats, suffix="stats")


if __name__ == "__main__":
    main()
