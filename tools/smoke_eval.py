"""CPU-runnable smoke evaluation (BASELINE.json configs[0]).

PSPNet-ResNet50 clean eval + 10-step Mask-CE PGD at eps=4/255 on a small
VOC val subset. With no VOC on disk it falls back to synthetic data and a
small crop so the whole flow runs on CPU in minutes.

Usage:
    python -m tools.smoke_eval [--root ./data/voc] [--n_images 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", type=str, default="./data/voc")
    parser.add_argument("--n_images", type=int, default=32)
    parser.add_argument("--crop", type=int, default=None,
                        help="override crop (synthetic fallback uses 57)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from robseg_tpu import models
    from robseg_tpu.attacks import pgd_attack
    from robseg_tpu.attacks.sea import eval_performance
    from robseg_tpu.data import (VOCSegmentation, SyntheticSegmentation,
                                 simple_eval_loader)

    have_voc = os.path.isdir(os.path.join(args.root, "VOCdevkit"))
    if have_voc:
        crop = args.crop or 473
        ds = VOCSegmentation(args.root, split="val", mode="val",
                             base_size=512, crop_size=crop)
    else:
        crop = args.crop or 57  # (57-1) % 8 == 0
        print("no VOC at", args.root, "- using synthetic data, crop", crop)
        ds = SyntheticSegmentation(num_classes=21, length=args.n_images,
                                   image_hw=(crop + 16, crop + 32),
                                   mode="val", crop_size=crop)

    module = models.PSPNet(classes=21)
    x0 = jnp.zeros((1, crop, crop, 3), jnp.float32)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x0)
    logits_fn = lambda x: module.apply(variables, x)  # noqa: E731

    bs = 4
    n_batches = max(args.n_images // bs, 1)
    clean, _ = eval_performance(
        logits_fn, simple_eval_loader(ds, bs, n_batches), num_classes=21)
    print("clean:", json.dumps(clean.as_dict()))

    adv_batches = []
    for i, (x, y) in enumerate(simple_eval_loader(ds, bs, n_batches)):
        x_adv = pgd_attack(logits_fn, jnp.asarray(x), jnp.asarray(y),
                           eps=4 / 255, alpha=1e-2, num_iter=10,
                           loss="mask-ce-avg")
        adv_batches.append((np.asarray(x_adv), y))
    adv, _ = eval_performance(logits_fn, adv_batches, num_classes=21)
    print("mask-ce PGD-10 @ 4/255:", json.dumps(adv.as_dict()))


if __name__ == "__main__":
    main()
