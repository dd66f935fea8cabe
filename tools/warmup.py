"""Pre-compile the standard SEA/eval executables into the persistent cache.

First compiles through a TPU tunnel cost minutes; run this once per
(model, dataset, batch) configuration and every later `tools/infer` run
starts hot. Uses tiny n_iter — executables are keyed by shapes + code, not
by the (runtime) iteration counts or epsilons.

Usage:
    python -m tools.warmup --cfg configs/pascalvoc_convnext.yaml
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--n_iter", type=int, default=300,
                        help="must match the production --n_iter: the APGD "
                             "history-buffer size is static per n_iter")
    parser.add_argument("--fused", action="store_true",
                        help="warm the whole-block-kernel executables "
                             "(tools/infer --fused)")
    parser.add_argument("--precision", type=str, default="default",
                        choices=["default", "bf16"],
                        help="warm the bf16 production-mode executables")
    args = parser.parse_args()

    from robseg_tpu import models
    from robseg_tpu.attacks.sea import (SEA_LOSSES, _eval_step,
                                        run_attack_over_loader)
    from robseg_tpu.config import load_config, dataset_eval_geometry
    from robseg_tpu.utils import class_balance_weights

    cfg = load_config(args.cfg)
    test_cfg = cfg["EVAL"]
    n_cls = test_cfg["N_CLS"]
    _, crop = dataset_eval_geometry(test_cfg["NAME"])
    bs = test_cfg.get("BATCH_SIZE", 4)

    module = models.build_model(cfg["MODEL"]["NAME"],
                                test_cfg.get("BACKBONE"), n_cls,
                                image_size=crop, fused=args.fused)
    t0 = time.time()
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1,) + tuple(crop) + (3,)))
    if args.precision == "bf16":
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables)
        logits_fn = lambda x: module.apply(                  # noqa: E731
            variables, x.astype(jnp.bfloat16)).astype(jnp.float32)
    else:
        logits_fn = lambda x: module.apply(variables, x)     # noqa: E731

    rng = np.random.default_rng(0)
    x = rng.random((bs,) + tuple(crop) + (3,)).astype(np.float32)
    y = rng.integers(0, n_cls, (bs,) + tuple(crop)).astype(np.int32)
    hist = jnp.zeros((n_cls, n_cls), jnp.float32)
    _eval_step(logits_fn, jnp.asarray(x), jnp.asarray(y), hist,
               num_classes=n_cls, ignore_label=-1)
    print(f"eval executable compiled ({time.time() - t0:.0f}s)", flush=True)

    w = class_balance_weights(test_cfg["NAME"])
    for loss in SEA_LOSSES:
        t0 = time.time()
        run_attack_over_loader(logits_fn, [(x, y)], loss=loss,
                               eps=8 / 255, n_iter=args.n_iter, weights=w,
                               n_batches=1)
        print(f"{loss} executable compiled ({time.time() - t0:.0f}s)",
              flush=True)
    print("warmup complete")


if __name__ == "__main__":
    main()
