"""SEA evaluation CLI.

Parity target: ``tools/infer.py`` of the reference — config-driven model
build + checkpoint load, clean eval, the 3-attack SEA at ``--n_iter`` APGD
iterations per loss, per-attack stats, and the worst-case aggregation
(aAcc + greedy mIoU search), all written to ``SAVE_DIR``.

Usage:
    python -m tools.infer --cfg configs/pascalvoc_convnext.yaml --eps 8
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

from robseg_tpu import models
from robseg_tpu.attacks.sea import run_sea
from robseg_tpu.config import (load_config, dataset_eval_geometry,
                               model_display_name)
from robseg_tpu.data import get_segmentation_dataset, simple_eval_loader
from robseg_tpu.train.checkpoint import load_params_npz
from robseg_tpu.utils import Logger, class_balance_weights, fix_seeds

SEED = 225  # parity: tools/infer.py:25


def build_eval_model(cfg, n_cls: int, crop_size, fused: bool = False):
    model_cfg = cfg["MODEL"]
    eval_cfg = cfg["EVAL"]
    backbone = eval_cfg.get("BACKBONE", model_cfg.get("BACKBONE"))
    module = models.build_model(model_cfg["NAME"], backbone, n_cls,
                                image_size=crop_size, fused=fused)
    return module


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--eps", type=str, default="8",
                        help="epsilon in /255 units; comma list for a "
                             "multi-eps sweep (e.g. '4,8')")
    parser.add_argument("--n_iter", type=int, default=300)
    parser.add_argument("--n_batches", type=int, default=-1)
    parser.add_argument("--adversarial", action="store_true", default=True)
    parser.add_argument("--no-adversarial", dest="adversarial",
                        action="store_false")
    parser.add_argument("--msf", action="store_true",
                        help="multi-scale + flip clean eval "
                             "(with --no-adversarial)")
    parser.add_argument("--shard", action="store_true",
                        help="shard attack batches over all devices "
                             "(pod-scale SEA; per-image results identical)")
    parser.add_argument("--ckpt", type=str, default=None,
                        help=".npz params checkpoint (overrides EVAL.MODEL_PATH)")
    parser.add_argument("--fused", action="store_true",
                        help="whole-block Pallas ConvNeXt kernel "
                             "(UperNet only; same numerics class as the "
                             "XLA default; composes with --shard; "
                             "see BENCHMARKS.md)")
    parser.add_argument("--precision", type=str, default="default",
                        choices=["default", "bf16", "f32"],
                        help="matmul/conv precision: bf16 = fastest (MXU "
                             "native), f32 = reference parity")
    parser.add_argument("--cleanup", action="store_true",
                        help="delete the argmax-logs resume cache after a "
                             "completed sweep (the reference's own "
                             "--cleanup is an int DEFAULTING TO 1, so it "
                             "deletes test_results/argmax-logs at exit "
                             "unless passed 0, infer.py:242,410-414; we "
                             "flip the default and KEEP the cache so "
                             "interrupted sweeps can resume)")
    parser.add_argument("--wc_engine", type=str, default="auto",
                        choices=["auto", "native", "python", "reference",
                                 "reference-python"],
                        help="worst-case-mIoU search engine; 'reference' "
                             "replicates the published code's class-list-"
                             "shrink quirk (worse_only.py:79-93)")
    args = parser.parse_args()

    if args.precision == "bf16":
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    elif args.precision == "f32":
        jax.config.update("jax_default_matmul_precision", "float32")
    if args.fused and args.precision == "f32":
        # the fused-block kernel truncates its matmul operands to bf16
        # unconditionally (XLA-DEFAULT numerics; kernels/convnext_block.py),
        # so a pinned-f32 parity run cannot use it
        parser.error("--fused forces bf16-MXU matmul numerics inside the "
                     "fused blocks and cannot honor --precision f32; use "
                     "--precision default (same numerics class) or drop "
                     "--fused for exact-f32 parity runs")
    # --fused composes with --shard: the SEA attack runs per device under
    # shard_map (robseg_tpu/attacks/sea.py::_make_attack_fn), so Pallas
    # kernels execute locally per shard — same pattern as the trainer.

    cfg = load_config(args.cfg)
    dataset_cfg, test_cfg = cfg["DATASET"], cfg["EVAL"]
    n_cls = test_cfg["N_CLS"]
    base_size, crop_size = dataset_eval_geometry(test_cfg["NAME"])

    fix_seeds(SEED)
    module = build_eval_model(cfg, n_cls, crop_size, fused=args.fused)

    dummy = jnp.zeros((1,) + tuple(crop_size) + (3,), jnp.float32)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), dummy)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    ckpt_path = args.ckpt or test_cfg.get("MODEL_PATH")
    if ckpt_path and os.path.exists(str(ckpt_path)):
        if str(ckpt_path).endswith(".npz"):
            params = load_params_npz(ckpt_path, params)
            stats_path = str(ckpt_path).replace(".npz", ".stats.npz")
            if batch_stats and os.path.exists(stats_path):
                batch_stats = load_params_npz(stats_path, batch_stats)
        else:
            import torch
            from robseg_tpu.convert import (convert_upernet, convert_pspnet,
                                            convert_segmenter)
            sd = {k: v.numpy() for k, v in
                  torch.load(ckpt_path, map_location="cpu").items()}
            name = cfg["MODEL"]["NAME"]
            if name == "UperNetForSemanticSegmentation":
                variant = test_cfg["BACKBONE"].split("-")[1]
                params, batch_stats = convert_upernet(sd, variant)
            elif name == "PSPNet":
                params, batch_stats = convert_pspnet(sd)
            else:
                params, batch_stats = convert_segmenter(sd)
    else:
        print(f"WARNING: no checkpoint at {ckpt_path!r}; "
              "evaluating random init")

    v = {"params": params}
    if batch_stats:
        v["batch_stats"] = batch_stats
    if args.precision == "bf16":
        # full-bf16 model: params + activations (measured +15% attack
        # throughput; robust-metric deviation vs f32 measured at ~1e-4
        # aAcc/mIoU at eps 4,8 — tools/bench_bf16.py, BENCHMARKS.md)
        v = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, v)
        logits_fn = lambda x: module.apply(  # noqa: E731
            v, x.astype(jnp.bfloat16)).astype(jnp.float32)
    else:
        logits_fn = lambda x: module.apply(v, x)  # noqa: E731

    ds = get_segmentation_dataset(
        test_cfg["NAME"], root=dataset_cfg["ROOT"], split="val", mode="val",
        base_size=base_size, crop_size=crop_size)
    bs = test_cfg.get("BATCH_SIZE", 4)
    make_loader = lambda: simple_eval_loader(ds, bs, args.n_batches)  # noqa

    weights = class_balance_weights(test_cfg["NAME"])
    save_dir = str(cfg.get("SAVE_DIR", "./outputs"))
    os.makedirs(save_dir, exist_ok=True)
    logger = Logger(os.path.join(save_dir, "sea_eval_log.txt"))

    def cleanup_cache():
        # drop the per-batch argmax resume cache (final JSON reports are
        # kept); parity: reference infer.py:242,410-414 (--cleanup int,
        # default 1: shutil.rmtree of the logit/argmax scratch dirs at the
        # end of a successful run). Also reachable from the clean-eval /
        # --msf paths so a stale cache from a prior adversarial run can be
        # cleared without re-running an attack (ADVICE r4).
        if not args.cleanup:
            return
        import shutil
        cache_dir = os.path.join(save_dir, "argmax-logs")
        if os.path.isdir(cache_dir):
            shutil.rmtree(cache_dir)
            logger.log(f"--cleanup: removed resume cache {cache_dir}")

    modelname = model_display_name(cfg["MODEL"]["NAME"],
                                   test_cfg.get("BACKBONE", ""))
    eps_list = [float(e) for e in str(args.eps).split(",")]
    logger.log(f"Model > {modelname}; Dataset > {test_cfg['NAME']}; "
               f"eps sweep = {eps_list} (/255), n_iter = {args.n_iter}")

    if not args.adversarial:
        from robseg_tpu.attacks.sea import eval_performance
        if args.msf:
            # multi-scale + flip clean eval; parity: semseg/val.py:329-374
            from robseg_tpu.utils.sliding_window import multi_scale_flip_logits
            scales = (0.5, 0.75, 1.0, 1.25, 1.5)
            msf_fn = lambda x: multi_scale_flip_logits(  # noqa: E731
                logits_fn, x, scales=scales, flip=True, num_classes=n_cls)
            stats, _ = eval_performance(msf_fn, make_loader(),
                                        num_classes=n_cls,
                                        n_batches=args.n_batches)
            logger.log(f"MSF clean performance: {stats.as_dict()}")
            cleanup_cache()
            return
        stats, _ = eval_performance(logits_fn, make_loader(),
                                    num_classes=n_cls,
                                    n_batches=args.n_batches)
        logger.log(f"Clean performance: {stats.as_dict()}")
        cleanup_cache()
        return

    stats_dir = os.path.join(save_dir, "sea-stats")
    os.makedirs(stats_dir, exist_ok=True)
    # resume caches are keyed to the checkpoint identity (stale-proof)
    if ckpt_path and os.path.exists(str(ckpt_path)):
        cache_tag = (os.path.basename(str(ckpt_path)).replace(".", "-")
                     + f"-{int(os.path.getmtime(str(ckpt_path)))}")
    else:
        cache_tag = "randominit"
    for eps in eps_list:
        mesh = None
        if args.shard:
            from robseg_tpu.parallel import make_data_mesh
            mesh = make_data_mesh()
        results = run_sea(logits_fn, make_loader, num_classes=n_cls,
                          eps=eps / 255.0, n_iter=args.n_iter,
                          weights=weights, n_batches=args.n_batches,
                          seed=SEED, verbose=True, mesh=mesh,
                          cache_tag=cache_tag, wc_engine=args.wc_engine,
                          resume_dir=os.path.join(save_dir, "argmax-logs"))
        logger.log(json.dumps(results, indent=2, default=float))
        # per-attack text reports; parity: writeIndivloss
        # (semseg/utils/utils.py:236-245)
        from robseg_tpu.attacks.sea import SEA_LOSSES
        for loss_name, st in zip(SEA_LOSSES, results["loss-wise_stats"]):
            with open(os.path.join(
                    stats_dir,
                    f"loss_wise_{modelname}_{loss_name}_N_{eps}.txt"),
                    "a+") as f:
                f.write(f"{modelname}\n")
                f.write(f"Clean stats: {results['clean']}\n")
                f.write(f"----- Linf radius: {eps} ------")
                f.write(f"Attack: {loss_name}\n")
                f.write(f"Adversarial results: {st}\n")
        out_path = os.path.join(
            save_dir,
            f"worse_SEA_{modelname}_{test_cfg['NAME']}_{eps}.json")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2, default=float)
        logger.log(f"SEA statistics at: {out_path}")

    # every eps in the sweep completed — safe to drop the resume cache
    cleanup_cache()


if __name__ == "__main__":
    main()
