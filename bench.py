"""Benchmark: SEA attack throughput on UperNet-ConvNeXt-T_CVST (one chip).

Metric: APGD attack step*images/sec/chip at 512x512, batch 16 — one fused
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

    # batch sweep on v5e-lite: 8 -> 40.6, 16 -> 55.0, 20 -> 48.3 (non-
    # multiple of the 8-sublane batch tile, +9% bytes/img), 32 -> 50.1
    # step*imgs/s; 16 is the utilization sweet spot (BENCHMARKS.md)
    batch, hw, n_cls = 16, 512, 21
    n_iter = 20

    # the full --fused package (models.build_model(fused=True)): whole-
    # block ConvNeXt kernels + split-conv FPN head — same numerics class
    # as the XLA default (kernels truncate MXU operands to bf16; the split
    # head is f32-reassociation exact); measured best attack config
    # (tools/bench_fused.py round-3 A/B)
    module = models.build_model(
        "UperNetForSemanticSegmentation", "ConvNeXt-T_CVST", n_cls,
        image_size=(hw, hw), fused=True)
    x0 = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x0)
    v16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, variables)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, hw, hw, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, n_cls, (batch, hw, hw)).astype(np.int32))

    def force(a):
        # block_until_ready does not block through the axon tunnel;
        # force a small host transfer (res.acc is (batch,))
        return float(np.asarray(a).ravel()[0])

    def measure(logits_fn):
        def run(it):
            # n_iter is a runtime scalar of ONE executable (n_iter_buf
            # pins the loss-history buffer shape), so both lengths below
            # share the compile
            res = apgd_attack(
                logits_fn, x, y, norm="Linf", eps=8 / 255, n_iter=it,
                use_rs=True, loss="mask-ce-avg", track_loss="ce-avg",
                rng=jax.random.PRNGKey(1), n_iter_buf=n_iter)
            force(res.acc)
            return res

        run(n_iter)  # compile
        run(4)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            run(4)
        t1 = time.perf_counter()
        for _ in range(reps):
            run(n_iter)
        t2 = time.perf_counter()
        dt = (t2 - t1) / reps
        # marginal per-iteration cost (differencing two runtime lengths of
        # the same executable): what a production 300-iter apgd_largereps
        # run amortizes to, free of per-dispatch tunnel/init overheads
        per_iter = ((t2 - t1) - (t1 - t0)) / reps / (n_iter - 4)
        return n_iter * batch / dt, batch / per_iter

    # primary: f32 activations (reference-parity numerics; the A100
    # baseline estimate is f32/TF32 too)
    f32_rate, f32_marginal = measure(lambda xx: module.apply(variables, xx))
    # secondary: full-bf16 production mode (--precision bf16; metric
    # deviation bounded at ~1e-4 aAcc/mIoU, BENCHMARKS.md)
    bf16_rate, bf16_marginal = measure(
        lambda xx: module.apply(v16, xx.astype(jnp.bfloat16)
                                ).astype(jnp.float32))

    print(json.dumps({
        "metric": "sea_apgd_step_imgs_per_sec_per_chip",
        "value": round(f32_rate, 2),
        "unit": "APGD step*imgs/s/chip (UperNet-ConvNeXt-T_CVST, 512^2, "
                "Linf, mask-ce)",
        "vs_baseline": round(f32_rate / A100_BASELINE_STEP_IMGS_PER_SEC, 3),
        "bf16_mode_value": round(bf16_rate, 2),
        "bf16_mode_vs_baseline": round(
            bf16_rate / A100_BASELINE_STEP_IMGS_PER_SEC, 3),
        # marginal = per-iteration rate with per-dispatch overhead
        # differenced out; the production 300-iter SEA protocol
        # (apgd_largereps phases of 90/90/120) runs at this rate
        "marginal_f32": round(f32_marginal, 2),
        "marginal_bf16": round(bf16_marginal, 2),
    }))


if __name__ == "__main__":
    main()
