"""APGD attack throughput for the non-flagship SEA families.

Companion to bench.py (UperNet flagship):
  * segmenter — Segmenter-ViT-S/16 @ 512^2 / ADE-151 (1025 tokens)
  * pspnet    — PSPNet-ResNet50 (dilated) @ 473^2 / VOC-21
Reference hot loop: ``semseg/attacker.py:385-569``.

Usage: python -m tools.bench_family --model segmenter|pspnet [--bf16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="segmenter",
                        choices=["segmenter", "pspnet"])
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--hw", type=int, default=0,
                        help="0 = family default (512 segmenter / 473 pspnet)")
    parser.add_argument("--n_iter", type=int, default=20)
    parser.add_argument("--bf16", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from robseg_tpu import models
    from robseg_tpu.attacks.apgd import apgd_attack

    if args.model == "segmenter":
        hw = args.hw or 512
        n_cls = 151
        module = models.create_segmenter("vit_small_patch16_384", n_cls,
                                         image_size=(hw, hw))
        label = f"Segmenter-ViT-S/16, {hw}^2, ADE-151"
    else:
        hw = args.hw or 473
        n_cls = 21
        module = models.PSPNet(classes=n_cls, deep_base=True)
        label = f"PSPNet-RN50, {hw}^2, VOC-21"
    batch = args.batch
    variables = jax.jit(module.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, hw, hw, 3), jnp.float32))
    if args.bf16:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables)
        fn = lambda xx: module.apply(                        # noqa: E731
            variables, xx.astype(jnp.bfloat16)).astype(jnp.float32)
    else:
        fn = lambda xx: module.apply(variables, xx)          # noqa: E731

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, hw, hw, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, n_cls, (batch, hw, hw)).astype(np.int32))

    def force(a):
        return float(np.asarray(a).ravel()[0])

    def run():
        res = apgd_attack(
            fn, x, y, norm="Linf", eps=8 / 255, n_iter=args.n_iter,
            use_rs=True, loss="mask-ce-avg", track_loss="ce-avg",
            rng=jax.random.PRNGKey(1))
        force(res.acc)
        return res

    t0 = time.perf_counter()
    run()
    print(f"compile+run {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    rate = args.n_iter * batch / dt
    print(json.dumps({
        "metric": f"{args.model}_apgd_step_imgs_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": f"APGD step*imgs/s/chip ({label}, Linf, mask-ce"
                f"{', bf16' if args.bf16 else ''})",
    }))


if __name__ == "__main__":
    main()
