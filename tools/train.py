"""PIR-AT training CLI (data-parallel over a JAX mesh).

Parity target: ``tools/train_rob_seg.py``: config-driven model/optimizer/
scheduler selection, iteration-based adversarial training, periodic eval +
checkpointing with best-mIoU tracking, final best-checkpoint eval.

Replaces ``torch.multiprocessing.spawn`` + NCCL DDP with one process
driving a ``shard_map`` train step over every visible device; multi-host
pods use ``jax.distributed.initialize`` (flag ``--multihost``).

Usage:
    python -m tools.train --cfg configs/pascalvoc_convnext.yaml
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from robseg_tpu import models
from robseg_tpu.config import TrainSettings, load_config
from robseg_tpu.data import get_segmentation_dataset, IterationBasedLoader, \
    simple_eval_loader
from robseg_tpu.parallel import make_data_mesh, replicate, shard_batch
from robseg_tpu.train import (AttackConfig, CheckpointManager, TrainState,
                              get_scheduler, make_eval_step, make_optimizer,
                              make_train_step, metrics_from_hist,
                              save_params_npz)
from robseg_tpu.train.optim import pspnet_lr_scales
from robseg_tpu.train.schedules import polynomial_lr_timm, poly_lr
from robseg_tpu.utils import Logger


def build_optimizer(cfg, model_name, params, max_iters, iters_per_epoch,
                    frozen_mask=None):
    """Per-model-family optimizer/scheduler selection.

    Parity: ``train_rob_seg.py:174-224`` — Segmenter: timm SGD + polynomial
    (``optim_args_segmenter``); PSPNet: SGD + raw poly with new-module lr
    x10; UperNet: AdamW/SGD + config scheduler. ``frozen_mask`` implements
    TRAIN.FREEZE (``freeze_some_layers(early=True)`` semantics).
    """
    opt_cfg, sched_cfg = cfg["OPTIMIZER"], cfg["SCHEDULER"]
    lr = float(opt_cfg["LR"])
    wd = float(opt_cfg.get("WEIGHT_DECAY", 0.01))
    if model_name == "SegMenter":
        sched = polynomial_lr_timm(1e-3, max_iters, power=0.9,
                                   iter_warmup=0, min_lr=1e-5)
        return make_optimizer("sgd", params, sched, weight_decay=1e-5,
                              frozen_mask=frozen_mask), sched
    if model_name == "PSPNet":
        sched = poly_lr(lr, max_iters, power=0.9)
        scales = pspnet_lr_scales(params)
        return make_optimizer("sgd", params, sched, weight_decay=wd,
                              lr_scales=scales,
                              frozen_mask=frozen_mask), sched
    sched = get_scheduler(
        sched_cfg["NAME"], lr, max_iters, sched_cfg.get("POWER", 0.9),
        iters_per_epoch * sched_cfg.get("WARMUP", 5),
        sched_cfg.get("WARMUP_RATIO", 1e-5))
    return make_optimizer(opt_cfg.get("NAME", "AdamW"), params, sched,
                          weight_decay=wd, frozen_mask=frozen_mask), sched


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--max_iters", type=int, default=None,
                        help="override EPOCHS-derived iteration count")
    parser.add_argument("--multihost", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--run_dir", type=str, default=None,
                        help="reuse this run directory (required for "
                             "--resume to find earlier checkpoints; "
                             "default is a fresh timestamped dir)")
    parser.add_argument("--precision", type=str, default="default",
                        choices=["default", "bf16", "f32"],
                        help="matmul/conv precision (the reference's AMP "
                             "flag analogue: bf16 = mixed precision)")
    parser.add_argument("--fused_attack", action="store_true",
                        help="generate the PIR-AT adversarial examples "
                             "through the whole-block Pallas kernel "
                             "(UperNet only; the attack phase needs only "
                             "input grads — the weight update keeps the "
                             "default differentiable path)")
    args = parser.parse_args()

    if args.precision == "bf16":
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    elif args.precision == "f32":
        jax.config.update("jax_default_matmul_precision", "float32")

    if args.multihost:
        jax.distributed.initialize()

    cfg = load_config(args.cfg)
    t = TrainSettings.from_cfg(cfg["TRAIN"])
    if t.amp and args.precision == "default":
        # TRAIN.AMP -> bf16 matmuls (reference GradScaler analogue;
        # train_rob_seg.py:224)
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    dataset_cfg, model_cfg = cfg["DATASET"], cfg["MODEL"]
    n_cls = dataset_cfg["N_CLS"]
    model_name = model_cfg["NAME"]

    mesh = make_data_mesh()
    n_dev = mesh.devices.size
    assert t.batch_size % n_dev == 0 or t.batch_size >= n_dev, (
        f"global batch {t.batch_size} vs {n_dev} devices")
    per_dev = max(t.batch_size // n_dev, 1)

    save_dir = str(cfg.get("SAVE_DIR", "./outputs"))
    if args.run_dir:
        save_path = args.run_dir
    else:
        stamp = str(datetime.datetime.now())[:-7].replace(" ", "-").replace(
            ":", "_")
        save_path = os.path.join(
            save_dir, str(dataset_cfg["NAME"]),
            f"{model_name}_{model_cfg.get('BACKBONE', '')}"
            f"_adv_{t.adversarial}_{stamp}_{t.attack}_{t.loss_fn}"
            f"{cfg.get('ADDENDUM', '')}")
    os.makedirs(save_path, exist_ok=True)
    logger = Logger(os.path.join(save_path, "train_log"))
    logger.log(str(cfg))

    module = models.build_model(
        model_name, model_cfg.get("BACKBONE", ""), n_cls,
        image_size=t.image_size,
        # parity: clean stem selection via ADDENDUM (train_rob_seg.py:92-98)
        pspnet_clean="clean" in str(cfg.get("ADDENDUM", "")))

    train_ds = get_segmentation_dataset(
        dataset_cfg["NAME"], root=dataset_cfg["ROOT"], split="train",
        mode="train", base_size=t.base_size, crop_size=t.image_size,
        seed=dataset_cfg.get("SEED", 0))
    eval_cfg = cfg["EVAL"]
    val_ds = get_segmentation_dataset(
        dataset_cfg["NAME"], root=dataset_cfg["ROOT"], split="val",
        mode="val", base_size=eval_cfg.get("BASE_SIZE", t.base_size),
        crop_size=eval_cfg.get("IMAGE_SIZE", t.image_size))

    iters_per_epoch = len(train_ds) // t.batch_size
    max_iters = args.max_iters or t.epochs * iters_per_epoch
    logger.log(f"devices={n_dev} per_dev_batch={per_dev} "
               f"iters/epoch={iters_per_epoch} max_iters={max_iters}")

    dummy_x = jnp.zeros((1,) + tuple(t.image_size) + (3,), jnp.float32)
    dummy_y = jnp.zeros((1,) + tuple(t.image_size), jnp.int32)
    variables = jax.jit(module.init)(jax.random.PRNGKey(dataset_cfg.get("SEED", 0)),
                            dummy_x, labels=dummy_y)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    pretrained = model_cfg.get("PRETRAINED")
    if pretrained and os.path.exists(str(pretrained)):
        # PIR init: robust-ImageNet backbone/encoder, per family —
        # UperNet: ConvNeXt key-map (``convnext_orig.py:258-307``);
        # SegMenter: ViT with pos-embed grid resampling
        # (``segmenter.py:144-163`` checkpoint_filter_fn);
        # PSPNet/DeepLab: robust ResNet-50 (``resnet_ddcat.py:213-240``).
        import torch
        from robseg_tpu.convert import (strip_prefixes,
                                        convert_convnext_backbone,
                                        convert_resnet_backbone,
                                        convert_vit_encoder)
        raw = torch.load(pretrained, map_location="cpu")
        for key in ("model", "state_dict"):  # deit/mmcv-style nesting
            if key in raw and isinstance(raw[key], dict):
                raw = raw[key]
        sd = strip_prefixes({k: v.numpy() for k, v in raw.items()})
        if model_name == "UperNetForSemanticSegmentation":
            variant = model_cfg["BACKBONE"].split("-")[1]
            bb = convert_convnext_backbone(sd, variant,
                                           cvst_ckpt_layout=True)
            params = {**params, "backbone": {**params["backbone"], **bb}}
        elif model_name == "SegMenter":
            # target grid from the initialized model's own pos-embed
            n_patches = params["encoder"]["pos_embed"].shape[1] - 1
            g = int(round(float(np.sqrt(n_patches))))
            variant = models.SEGMENTER_VARIANTS[model_cfg["BACKBONE"]]
            enc = convert_vit_encoder(sd, n_layers=variant["n_layers"],
                                      target_grid=(g, g))
            params = {**params, "encoder": {**params["encoder"], **enc}}
        elif model_name.startswith(("PSPNet", "DeepLabV3")):
            bbp, bbs = convert_resnet_backbone(
                sd, deep_base="clean" in str(cfg.get("ADDENDUM", "")))
            params = {**params, "backbone": {**params["backbone"], **bbp}}
            batch_stats = {**batch_stats,
                           "backbone": {**batch_stats.get("backbone", {}),
                                        **bbs}}
        else:
            raise ValueError(f"no PIR-init path for {model_name!r}")
        logger.log(f"PIR init ({model_name}): loaded robust weights "
                   f"from {pretrained}")

    frozen = None
    if t.freeze:
        # TRAIN.FREEZE: backbone frozen, head trains (freeze_some_layers
        # early=True, train_rob_seg.py:147-155 — parsed upstream but never
        # invoked; wired for real here). Models without a "backbone"
        # subtree (SegMenter) reject loudly inside freeze_mask.
        from robseg_tpu.train import freeze_mask
        frozen = freeze_mask(params)
        logger.log("TRAIN.FREEZE: backbone parameters frozen "
                   "(zero-masked optimizer updates)")
    if not t.ddp and n_dev > 1:
        logger.log(f"note: TRAIN.DDP=false is ignored — JAX always runs "
                   f"data-parallel over all {n_dev} visible devices")
    tx, sched = build_optimizer(cfg, model_name, params, max_iters,
                                iters_per_epoch, frozen_mask=frozen)
    state = TrainState(step=jnp.asarray(0), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params),
                       rng=jax.random.PRNGKey(dataset_cfg.get("SEED", 0)))

    ckpt_mgr = CheckpointManager(os.path.join(save_path, "ckpts"))
    if args.resume:
        restored = ckpt_mgr.restore(state)
        if restored is not None:
            state = restored
            logger.log(f"Resumed from step {int(state.step)}")

    attack = AttackConfig(
        enabled=t.adversarial, name=t.attack, loss_fn=t.loss_fn,
        eps=t.eps / 255.0, n_iters=t.n_iters)
    attack_module = None
    if args.fused_attack:
        if model_name != "UperNetForSemanticSegmentation":
            raise SystemExit("--fused_attack supports UperNet only")
        attack_module = models.build_model(
            model_name, model_cfg.get("BACKBONE", ""), n_cls,
            image_size=t.image_size, fused=True)
    train_step = make_train_step(module, model_name, tx, mesh, attack,
                                 attack_module=attack_module)
    eval_step = make_eval_step(module, n_cls, mesh)

    state = replicate(mesh, state)
    from robseg_tpu.data import prefetch
    if t.device_aug:
        # north-star path: host only loads+pads; flip/scale/crop/blur run
        # on device (robseg_tpu/data/device_transforms.py)
        from robseg_tpu.data.device_transforms import (augment_batch,
                                                       load_raw_batch)
        from robseg_tpu.data.sampler import ShardedEpochSampler

        buf = 2 * t.base_size
        aug_rng = jax.random.PRNGKey(dataset_cfg.get("SEED", 0) + 7)

        def raw_loader():
            sampler = ShardedEpochSampler(len(train_ds), n_dev,
                                          seed=dataset_cfg.get("SEED", 0),
                                          num_hosts=jax.process_count(),
                                          host_id=jax.process_index())
            it = int(jax.device_get(state.step))
            epoch = it // max(iters_per_epoch, 1)
            while it < max_iters:
                for idx in sampler.global_batch_indices(epoch, per_dev):
                    yield load_raw_batch(train_ds, idx, buffer_hw=(buf, buf),
                                         max_edge=buf)
                    it += 1
                    if it >= max_iters:
                        return
                epoch += 1

        def device_aug_batches():
            nonlocal aug_rng
            for imgs, msks, valid in prefetch(raw_loader(), depth=2):
                aug_rng, sub = jax.random.split(aug_rng)
                ai, am = augment_batch(
                    jnp.asarray(imgs), jnp.asarray(msks), jnp.asarray(valid),
                    sub, base_size=t.base_size,
                    crop_size=t.image_size[0])
                yield np.asarray(ai), np.asarray(am)

        loader = device_aug_batches()
    else:
        loader = prefetch(IterationBasedLoader(
            train_ds, num_shards=n_dev, batch_per_shard=per_dev,
            max_iters=max_iters, seed=dataset_cfg.get("SEED", 0),
            start_iter=int(jax.device_get(state.step)),
            num_hosts=jax.process_count(),
            host_id=jax.process_index()), depth=2)

    # k*n_dev images per eval dispatch (round-3 Weak #5: at 1 img/device
    # the endgame full-val eval was tunnel-dispatch-bound — ~20-25 ms
    # latency per batch-1 call dominates a 473^2 forward)
    eval_bs = per_dev * n_dev

    def run_eval(state, n_batches=None):
        if n_batches is None:
            n_batches = t.eval_batches
        hist = replicate(mesh, jnp.zeros((n_cls, n_cls), jnp.float32))
        for x, y in simple_eval_loader(val_ds, eval_bs, n_batches):
            if x.shape[0] != eval_bs:
                # pad the tail batch; padded rows get all-ignore labels so
                # they contribute nothing to the confusion matrix
                reps = eval_bs - x.shape[0]
                x = np.concatenate([x, np.repeat(x[-1:], reps, axis=0)])
                y = np.concatenate(
                    [y, np.full((reps,) + y.shape[1:], -1, y.dtype)])
            bx, by = shard_batch(mesh, (x, y))
            hist = eval_step(state.params, state.batch_stats, bx, by, hist)
        return metrics_from_hist(jax.device_get(hist))

    best_miou, best_aacc = 0.0, 0.0
    # best-so-far survives a kill+--resume (the TrainState checkpoint
    # restores step/params/opt/rng bit-exactly; this sidecar restores the
    # best-model tracking so a post-resume eval cannot silently demote
    # an earlier best_model.npz)
    best_json = os.path.join(save_path, "best.json")
    if args.resume and os.path.exists(best_json):
        with open(best_json) as f:
            _b = json.load(f)
        best_miou, best_aacc = _b["best_miou"], _b["best_aacc"]
        logger.log(f"Restored best-so-far: mIoU={best_miou:.4f} "
                   f"aAcc={best_aacc:.4f}")
    t0 = time.time()
    start_it = int(jax.device_get(state.step))
    train_loss, window = 0.0, 0
    log_every = max(iters_per_epoch // 2, 1)
    eval_freq = t.eval_freq  # parity default 20: train_rob_seg.py:387

    for it, (imgs, lbls) in enumerate(loader, start=start_it):
        bx, by = shard_batch(mesh, (imgs.astype(np.float32),
                                    lbls.astype(np.int32)))
        state, metrics = train_step(state, bx, by)
        train_loss += float(jax.device_get(metrics["loss"]))
        window += 1

        if (it + 1) % log_every == 0:
            done = it - start_it + 1
            eta = (time.time() - t0) / done * (max_iters - it - 1)
            logger.log(
                "Epoch: {:d}/{:d} | Iters: {:d}/{:d} || Lr: {:.6f} || "
                "Loss: {:.7f} || ETA: {}".format(
                    it // iters_per_epoch + 1, t.epochs, it, max_iters,
                    float(sched(it)), train_loss / max(window, 1),
                    str(datetime.timedelta(seconds=int(eta)))))
            train_loss, window = 0.0, 0

        if (it + 1) % (iters_per_epoch * eval_freq) == 0:
            m = run_eval(state)
            logger.log(f"Epoch [{it // iters_per_epoch + 1}] val "
                       f"mIoU={m['mIoU']:.4f} aAcc={m['aAcc']:.4f}")
            host_state = jax.device_get(state)
            ckpt_mgr.save(int(host_state.step), host_state,
                          metrics={"mIoU": m["mIoU"]})
            if m["mIoU"] > best_miou:
                best_miou = m["mIoU"]
                save_params_npz(os.path.join(save_path, "best_model.npz"),
                                host_state.params)
                if host_state.batch_stats:
                    save_params_npz(
                        os.path.join(save_path, "best_model.stats.npz"),
                        host_state.batch_stats)
            best_aacc = max(best_aacc, m["aAcc"])
            with open(best_json, "w") as f:
                json.dump({"best_miou": best_miou,
                           "best_aacc": best_aacc}, f)

    # ---- endgame; parity: train_rob_seg.py:426-454 ----
    from tabulate import tabulate
    from robseg_tpu.train.checkpoint import load_params_npz

    host_state = jax.device_get(state)
    ckpt_mgr.save(int(host_state.step), host_state)
    save_params_npz(os.path.join(save_path, "final_model.npz"),
                    host_state.params)
    elapsed = time.gmtime(time.time() - t0)
    table = [["Best mIoU", f"{best_miou:.2f}"],
             ["Best aAcc", f"{best_aacc:.2f}"],
             ["Total Training Time", time.strftime("%H:%M:%S", elapsed)]]
    logger.log(str(tabulate(table, numalign="right")))

    # reload the best checkpoint (params + BN stats) and run the FULL val
    # split (the reference re-prefixes "module." and loads into the DDP
    # wrapper; here the state is functional)
    best_path = os.path.join(save_path, "best_model.npz")
    if os.path.exists(best_path):
        best_params = load_params_npz(best_path, host_state.params)
        stats_path = os.path.join(save_path, "best_model.stats.npz")
        best_stats = (load_params_npz(stats_path, host_state.batch_stats)
                      if host_state.batch_stats and os.path.exists(stats_path)
                      else host_state.batch_stats)
        state = replicate(mesh, host_state.replace(params=best_params,
                                                   batch_stats=best_stats))
        logger.log("Reloaded best checkpoint for the final evaluation")
    m = run_eval(state, n_batches=-1)
    table = [["full mIoU", f"{m['mIoU']:.2f}"],
             ["full aAcc", f"{m['aAcc']:.2f}"]]
    logger.log(str(tabulate(table, numalign="right")))
    ckpt_mgr.close()


if __name__ == "__main__":
    main()
