"""Create a synthetic PASCAL-VOC-layout dataset for on-chip rig runs.

Used by the sustained-training demonstration (BENCHMARKS.md) and the
verify recipe: real JPEG/PNG files through the real data pipeline
(``data/datasets.py::VOCSegmentation``), random but reproducible content.

Usage: python tools/make_fixture_dataset.py --root /tmp/rig_voc \
           [--n_train 48] [--n_val 8] [--hw 375 500]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def make_voc(root: str, n_train: int = 48, n_val: int = 8,
             hw=(375, 500), n_cls: int = 21, seed: int = 0) -> str:
    base = os.path.join(root, "VOCdevkit", "VOC2012")
    for d in ("JPEGImages", "SegmentationClass", "ImageSets/Segmentation"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    splits = {"train": n_train, "val": n_val}
    idx = 0
    for split, n in splits.items():
        names = []
        for _ in range(n):
            name = f"img{idx:04d}"
            rng = np.random.default_rng(seed + idx)
            # piecewise-constant-ish label field: more realistic gradients
            # than iid noise (attack/loss see spatially coherent classes)
            small = rng.integers(0, n_cls, (6, 8)).astype(np.uint8)
            m = np.kron(small, np.ones((hw[0] // 6 + 1, hw[1] // 8 + 1),
                                       np.uint8))[:hw[0], :hw[1]]
            m[0, 0] = 255  # a void pixel
            arr = (rng.random((hw[0], hw[1], 3)) * 128
                   + m[..., None] * 5).clip(0, 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(base, "JPEGImages", f"{name}.jpg"))
            Image.fromarray(m).save(
                os.path.join(base, "SegmentationClass", f"{name}.png"))
            names.append(name)
            idx += 1
        with open(os.path.join(base, "ImageSets/Segmentation",
                               f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    return root


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n_train", type=int, default=48)
    ap.add_argument("--n_val", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=[375, 500])
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    make_voc(a.root, a.n_train, a.n_val, tuple(a.hw), seed=a.seed)
    print(f"fixture VOC at {a.root}")
