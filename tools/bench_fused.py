"""On-chip A/B of the ConvNeXt fused-MLP kernel modes on the attack path.

Measures, for UperNet-ConvNeXt-T_CVST at 512^2 batch 16 (bench.py
geometry):
  * backbone forward time:      default XLA vs fused(recompute) vs fused(rs)
  * full APGD attack step rate: default XLA vs fused(rs)
and checks on-chip numerical agreement of the attacked accuracy.

Usage: python -m tools.bench_fused [--modes default,rs] [--batch 16]
Results feed BENCHMARKS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def force_ready(arr):
    """block_until_ready does not block through the axon tunnel — force a
    host transfer of one element."""
    import jax
    a = jax.tree.leaves(arr)[0]
    return float(np.asarray(a).ravel()[0])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--hw", type=int, default=512)
    parser.add_argument("--n_iter", type=int, default=20)
    parser.add_argument("--modes", type=str, default="default,rs")
    parser.add_argument("--skip_backbone", action="store_true")
    parser.add_argument("--bf16", action="store_true",
                        help="full-bf16 params+activations (the "
                             "--precision bf16 production mode)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from robseg_tpu import models
    from robseg_tpu.attacks.apgd import apgd_attack

    batch, hw, n_cls = args.batch, args.hw, 21
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, hw, hw, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, n_cls, (batch, hw, hw)).astype(np.int32))

    base = models.UperNetForSemanticSegmentation(
        backbone_variant="T_CVST", num_classes=n_cls)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, hw, hw, 3), jnp.float32))
    if args.bf16:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables)

    def make(mode):
        if mode == "default":
            return base
        if mode == "head":  # fused fpn_bottleneck only (kernels/fpn_conv)
            return models.UperNetForSemanticSegmentation(
                backbone_variant="T_CVST", num_classes=n_cls,
                fused_head=True)
        if mode == "head_split":  # pure-XLA split-conv fpn_bottleneck
            return models.UperNetForSemanticSegmentation(
                backbone_variant="T_CVST", num_classes=n_cls,
                fused_head="split")
        if mode == "block_head_split":
            return models.UperNetForSemanticSegmentation(
                backbone_variant="T_CVST", num_classes=n_cls,
                fused_mlp=True, fused_mlp_mode="block",
                fused_head="split")
        if mode == "block_head":  # the full --fused package
            return models.UperNetForSemanticSegmentation(
                backbone_variant="T_CVST", num_classes=n_cls,
                fused_mlp=True, fused_mlp_mode="block", fused_head=True)
        mode_map = {"rs": "residual", "recompute": "recompute",
                    "rs_bf16": "residual_bf16",
                    "recompute_bf16": "recompute_bf16",
                    "block": "block"}
        return models.UperNetForSemanticSegmentation(
            backbone_variant="T_CVST", num_classes=n_cls, fused_mlp=True,
            fused_mlp_mode=mode_map[mode])

    def time_call(fn, reps=3):
        fn()  # compile/warm
        force_ready(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        force_ready(out)
        return (time.perf_counter() - t0) / reps

    results = {}
    modes = args.modes.split(",")

    if not args.skip_backbone:
        for mode in modes + (["recompute"] if "recompute" not in modes
                             else []):
            m = make(mode)
            # force completion via a 4-byte scalar transfer — transferring
            # the full logits through the tunnel (~88 MB) can dominate
            fwd = jax.jit(lambda xx, mm=m: mm.apply(variables, xx).mean())
            dt = time_call(lambda: fwd(x), reps=10)
            results[f"fwd_full_{mode}_ms"] = round(dt * 1000, 1)
            print(f"full fwd {mode}: {dt * 1000:.1f} ms", flush=True)

    accs = {}
    for mode in modes:
        m = make(mode)
        if args.bf16:
            fn = lambda xx: m.apply(                     # noqa: E731
                variables, xx.astype(jnp.bfloat16)).astype(jnp.float32)
        else:
            fn = lambda xx: m.apply(variables, xx)       # noqa: E731

        def run():
            res = apgd_attack(
                fn, x, y, norm="Linf", eps=8 / 255, n_iter=args.n_iter,
                use_rs=True, loss="mask-ce-avg", track_loss="ce-avg",
                rng=jax.random.PRNGKey(1))
            force_ready(res.acc)
            return res

        print(f"compiling attack step ({mode})...", flush=True)
        t0 = time.perf_counter()
        res = run()
        print(f"  compile+run {time.perf_counter() - t0:.0f}s", flush=True)
        accs[mode] = float(np.asarray(res.acc).mean())
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            res = run()
        dt = (time.perf_counter() - t0) / reps
        rate = args.n_iter * batch / dt
        results[f"attack_step_imgs_per_s_{mode}"] = round(rate, 1)
        results[f"attack_acc_{mode}"] = round(accs[mode], 5)
        print(f"attack {mode}: {rate:.1f} step*imgs/s  "
              f"acc={accs[mode]:.5f}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
