"""PIR-AT train-step throughput: default vs fused-attack generation.

Measures the full adversarial train step (PGD-``n_iters`` attack gen in
eval mode + fwd/bwd weight update + optimizer) for UperNet-ConvNeXt-T_CVST
at the reference's VOC geometry (473^2), batch 16, on a 1-device mesh.
Reference loop: ``tools/train_rob_seg.py:318-351``.

Usage: python -m tools.bench_train [--modes default,fused] [--n_iters 5]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--modes", type=str, default="default,fused")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--hw", type=int, default=473)
    parser.add_argument("--n_iters", type=int, default=5)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from robseg_tpu import models
    from robseg_tpu.parallel import make_data_mesh, replicate, shard_batch
    from robseg_tpu.train import (AttackConfig, TrainState, make_optimizer,
                                  make_train_step)
    from robseg_tpu.train.schedules import warmup_poly_lr

    hw, bs, n_cls = args.hw, args.batch, 21
    mesh = make_data_mesh(1)
    module = models.UperNetForSemanticSegmentation(
        backbone_variant="T_CVST", num_classes=n_cls)
    x0 = jnp.zeros((1, hw, hw, 3), jnp.float32)
    y0 = jnp.zeros((1, hw, hw), jnp.int32)
    variables = jax.jit(functools.partial(module.init, labels=y0))(
        jax.random.PRNGKey(0), x0)
    sched = warmup_poly_lr(1e-4, 1.0, 1000, 5, 1e-5)
    tx = make_optimizer("AdamW", variables["params"], sched,
                        weight_decay=0.05)
    state0 = TrainState(step=jnp.asarray(0), params=variables["params"],
                        batch_stats=variables.get("batch_stats", {}),
                        opt_state=tx.init(variables["params"]),
                        rng=jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    bx, by = shard_batch(mesh, (
        jnp.asarray(rng.random((bs, hw, hw, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, n_cls, (bs, hw, hw)).astype(np.int32))))

    def force(a):
        return float(np.asarray(jax.tree.leaves(a)[0]).ravel()[0])

    res = {}
    for mode in args.modes.split(","):
        atk_mod = None
        if mode == "fused":
            atk_mod = models.UperNetForSemanticSegmentation(
                backbone_variant="T_CVST", num_classes=n_cls,
                fused_mlp=True, fused_mlp_mode="block")
        step = make_train_step(
            module, "UperNetForSemanticSegmentation", tx, mesh,
            AttackConfig(n_iters=args.n_iters), attack_module=atk_mod)
        # deep-copy: the step donates its state argument, and the same
        # state0 buffers must survive for the next mode
        state = replicate(mesh, jax.tree.map(jnp.array, state0))
        print(f"compiling train step ({mode})...", flush=True)
        t0 = time.perf_counter()
        state, m = step(state, bx, by)
        force(m["loss"])
        print(f"  compile+run {time.perf_counter() - t0:.0f}s "
              f"loss={force(m['loss']):.4f}", flush=True)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            state, m = step(state, bx, by)
        force(m["loss"])
        dt = (time.perf_counter() - t0) / reps
        res[f"train_step_s_{mode}"] = round(dt, 3)
        res[f"train_imgs_per_s_{mode}"] = round(bs / dt, 2)
        print(f"{mode}: {dt:.3f} s/step ({bs / dt:.2f} imgs/s)", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
