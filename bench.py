"""Benchmark: SEA attack throughput on UperNet-ConvNeXt-T_CVST (one chip).

Metric: APGD attack step*images/sec/chip at 512x512, batch 8 — one fused
fwd + input-grad + step + projection per APGD iteration (the hot loop of
``semseg/attacker.py:385-569``; see SURVEY.md §3.2: the reference runs
~1800 model passes per image per SEA evaluation).

``vs_baseline`` divides by an estimated A100 PyTorch reference throughput
(BASELINE.md has no published throughput): UperNet-ConvNeXt-T fwd+bwd at
512^2 is ~0.7 TFLOP/step-image; an A100 at a measured-typical 35% fp32/TF32
utilization with the reference's per-iteration host-side per-class metric
loops (attacker.py:496-498, O(n_cls) sync'd GPU launches) lands around
30 step*img/s. Documented assumption, fixed constant.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_BASELINE_STEP_IMGS_PER_SEC = 30.0


def main():
    import jax
    import jax.numpy as jnp
    from robseg_tpu import models
    from robseg_tpu.attacks.apgd import apgd_attack

    # batch sweep on v5e-lite: 8 -> 40.6, 16 -> 55.0, 32 -> 50.1
    # step*imgs/s; 16 is the utilization sweet spot
    batch, hw, n_cls = 16, 512, 21
    n_iter = 20

    module = models.UperNetForSemanticSegmentation(
        backbone_variant="T_CVST", num_classes=n_cls)
    x0 = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x0)

    def logits_fn(x):
        return module.apply(variables, x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, hw, hw, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, n_cls, (batch, hw, hw)).astype(np.int32))

    def run():
        res = apgd_attack(
            logits_fn, x, y, norm="Linf", eps=8 / 255, n_iter=n_iter,
            use_rs=True, loss="mask-ce-avg", track_loss="ce-avg",
            rng=jax.random.PRNGKey(1))
        jax.block_until_ready(res.x_best_adv)
        return res

    run()  # compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps

    step_imgs_per_sec = n_iter * batch / dt
    print(json.dumps({
        "metric": "sea_apgd_step_imgs_per_sec_per_chip",
        "value": round(step_imgs_per_sec, 2),
        "unit": "APGD step*imgs/s/chip (UperNet-ConvNeXt-T_CVST, 512^2, "
                "Linf, mask-ce)",
        "vs_baseline": round(
            step_imgs_per_sec / A100_BASELINE_STEP_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
