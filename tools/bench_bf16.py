"""Quantify the bf16 / fused attack modes' metric deviation vs f32.

Runs the SEA per-loss attack (apgd_largereps, mask-ce-avg) on one fixed
batch at eps in {4, 8}/255 with the default path and the selected
alternates — full bf16 (params + activations, ``tools.infer --precision
bf16``) and/or the whole-block fused kernel (``--fused``) — and reports
robust pixel-acc and mIoU deltas. Metrics are always computed by the
default-f32 model on the resulting adversarial examples.

Results documented in BENCHMARKS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--modes", type=str, default="f32,bf16",
                        help="comma list from f32,bf16,fused,fused_bf16")
    parser.add_argument("--ckpt", type=str, default=None,
                        help=".npz params (e.g. a rig run's best_model.npz)"
                             " — probes TRAINED-weight attack dynamics "
                             "instead of random init (VERDICT r2 Weak #4)")
    parser.add_argument("--stats", type=str, default=None,
                        help=".npz batch_stats matching --ckpt")
    parser.add_argument("--data_root", type=str, default=None,
                        help="VOC-layout root; probe real val images "
                             "instead of random noise")
    parser.add_argument("--eps", type=str, default="4,8",
                        help="eps/255 sweep; use sub-saturating values "
                             "(e.g. 0.25,0.5) when the model is weak "
                             "enough that every attack mode floors")
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    from robseg_tpu import models
    from robseg_tpu.attacks.apgd import apgd_largereps
    from robseg_tpu.ops.metrics import (confusion_matrix, iou_from_hist,
                                        pixel_acc_from_hist)

    batch, hw, n_cls, n_iter = 8, 512, 21, 50
    rng = np.random.default_rng(0)
    if args.data_root:
        # real images through the real pipeline: random-noise inputs
        # saturate any trained model's attack floor at every eps, hiding
        # mode differences entirely
        from robseg_tpu.data import get_segmentation_dataset
        ds = get_segmentation_dataset("pascalvoc", root=args.data_root,
                                      split="val", mode="val",
                                      base_size=hw, crop_size=(hw, hw))
        xs, ys = zip(*[ds[i % len(ds)] for i in range(batch)])
        x = jnp.asarray(np.stack(xs))
        y = jnp.asarray(np.stack(ys))
    else:
        x = jnp.asarray(rng.random((batch, hw, hw, 3)).astype(np.float32))
        y = jnp.asarray(
            rng.integers(0, n_cls, (batch, hw, hw)).astype(np.int32))

    module = models.UperNetForSemanticSegmentation(
        backbone_variant="T_CVST", num_classes=n_cls)
    # the shipped --fused package (block + whole kernels + split head)
    fused_mod = models.build_model(
        "UperNetForSemanticSegmentation", "ConvNeXt-T_CVST", n_cls,
        image_size=(hw, hw), fused=True)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, hw, hw, 3), jnp.float32))
    if args.ckpt:
        from robseg_tpu.train.checkpoint import load_params_npz
        variables = dict(variables)
        variables["params"] = load_params_npz(args.ckpt,
                                              variables["params"])
        if args.stats:
            variables["batch_stats"] = load_params_npz(
                args.stats, variables["batch_stats"])
        variables = jax.tree.map(jnp.asarray, variables)
        print(f"loaded trained params from {args.ckpt}", flush=True)
    v16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, variables)

    def fn_f32(xx):
        return module.apply(variables, xx)

    def fn_bf16(xx):
        return module.apply(v16, xx.astype(jnp.bfloat16)).astype(jnp.float32)

    def fn_fused(xx):
        return fused_mod.apply(variables, xx)

    def fn_fused_bf16(xx):
        return fused_mod.apply(v16, xx.astype(jnp.bfloat16)
                               ).astype(jnp.float32)

    all_fns = {"f32": fn_f32, "bf16": fn_bf16, "fused": fn_fused,
               "fused_bf16": fn_fused_bf16}

    def metrics(fn, x_adv):
        pred = jnp.argmax(fn(x_adv), -1).astype(jnp.int32)
        h = confusion_matrix(pred, y, num_classes=n_cls, ignore_label=-1)
        _, _, aacc = pixel_acc_from_hist(h)
        _, miou = iou_from_hist(h)
        return float(aacc), float(miou)

    out = {}
    sel = args.modes.split(",")
    assert sel[0] == "f32", "f32 must come first (the deltas' baseline)"
    for eps in [float(e) for e in args.eps.split(",")]:
        for name in sel:
            fn = all_fns[name]
            t0 = time.perf_counter()
            adv, _, acc = apgd_largereps(
                fn, x, y, weights=None, norm="Linf", eps=eps / 255,
                n_iter=n_iter, loss="mask-ce-avg", early_stop=True,
                track_loss="ce-avg", use_rs=True,
                rng=jax.random.PRNGKey(1))
            # metrics ALWAYS via the f32 model (the protocol's eval pass)
            aacc, miou = metrics(fn_f32, adv)
            out[f"eps{eps:g}_{name}_rob_aAcc"] = round(aacc, 5)
            out[f"eps{eps:g}_{name}_rob_mIoU"] = round(miou, 5)
            out[f"eps{eps:g}_{name}_mean_acc"] = round(
                float(np.asarray(acc).mean()), 5)
            print(f"eps={eps} {name}: aAcc={aacc:.5f} mIoU={miou:.5f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        for name in sel[1:]:
            out[f"eps{eps:g}_{name}_delta_aAcc"] = round(
                out[f"eps{eps:g}_{name}_rob_aAcc"]
                - out[f"eps{eps:g}_f32_rob_aAcc"], 5)
            out[f"eps{eps:g}_{name}_delta_mIoU"] = round(
                out[f"eps{eps:g}_{name}_rob_mIoU"]
                - out[f"eps{eps:g}_f32_rob_mIoU"], 5)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
