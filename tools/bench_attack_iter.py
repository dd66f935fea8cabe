"""Exact per-iteration cost of the full APGD attack step, by precision.

Closes the VERDICT r3 Weak-#1 decomposition gap: ``bench_segments.py``
times the model fwd / fwd+input-grad in isolation, but the attack step
also carries the SEA loss (mask-ce-avg + ce-avg tracking), two argmaxes,
the momentum/projection update and the best-point bookkeeping
(``semseg/attacker.py:385-569``). This tool measures the WHOLE step:
``n_iter`` is a runtime scalar of ONE compiled ``_apgd_core`` executable
(see ``attacks/apgd.py``), so differencing two runtime iteration counts
inside the same while_loop gives the true marginal per-iteration cost
with zero dispatch/compile artifacts.

    attack_extras_ms = per_iter_ms - bench_segments.full_fwd_input_grad_ms

Run twice (--precision f32 / bf16) for the two-precision composite
roofline in BENCHMARKS.md.
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--n_lo", type=int, default=4)
    ap.add_argument("--n_hi", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fused", action="store_true", default=True)
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler trace of one n_hi run")
    ap.add_argument("--flat", action="store_true",
                    help="carry the APGD state as (B, H*W*C) — layout "
                         "experiment, see round-5 BENCHMARKS notes")
    ap.add_argument("--bf16_carry", action="store_true",
                    help="with --precision bf16: feed x as bf16 so every "
                         "APGD carry buffer (x_adv, x_best, grads, ...) is "
                         "bf16 too (experimental; quantizes the Linf ball "
                         "at ~2^-9 vs eps=8/255)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from robseg_tpu import models
    from robseg_tpu.attacks.apgd import apgd_attack

    batch, hw, n_cls = args.batch, args.hw, 21
    module = models.build_model(
        "UperNetForSemanticSegmentation", "ConvNeXt-T_CVST", n_cls,
        image_size=(hw, hw), fused=args.fused)
    x0 = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, hw, hw, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, n_cls, (batch, hw, hw)).astype(np.int32))

    if args.precision == "bf16":
        v16 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables)
        if args.bf16_carry:
            x = x.astype(jnp.bfloat16)
            logits_fn = lambda xx: module.apply(  # noqa: E731
                v16, xx).astype(jnp.float32)
        else:
            logits_fn = lambda xx: module.apply(  # noqa: E731
                v16, xx.astype(jnp.bfloat16)).astype(jnp.float32)
    else:
        logits_fn = lambda xx: module.apply(variables, xx)  # noqa: E731

    if args.flat:
        # EXPERIMENT: carry the APGD state flat (B, H*W*C). Every image-
        # shaped carry tensor at bs16 puts the batch in the 128-lane dim
        # (8x padding waste, round-5 trace); a flat carry tiles perfectly
        # and the only layout bridge is one reshape per fwd/bwd.
        inner = logits_fn
        logits_fn = lambda xf: inner(  # noqa: E731
            xf.reshape(batch, hw, hw, 3))
        x = x.reshape(batch, -1)

    def force(a):
        return float(np.asarray(a).ravel()[0])

    def run(n_iter):
        res = apgd_attack(
            logits_fn, x, y, norm="Linf", eps=8 / 255, n_iter=n_iter,
            use_rs=True, loss="mask-ce-avg", track_loss="ce-avg",
            rng=jax.random.PRNGKey(1), n_iter_buf=args.n_hi)
        force(res.acc)
        return res

    run(args.n_lo)
    run(args.n_hi)  # same executable: n_iter is a runtime scalar

    lo = hi = 0.0
    for _ in range(args.reps):
        t0 = time.perf_counter(); run(args.n_lo)
        t1 = time.perf_counter(); run(args.n_hi)
        t2 = time.perf_counter()
        lo += t1 - t0; hi += t2 - t1
    lo /= args.reps; hi /= args.reps
    per_iter_ms = (hi - lo) / (args.n_hi - args.n_lo) * 1000

    if args.trace:
        with jax.profiler.trace(args.trace):
            run(args.n_hi)

    out = {
        "precision": args.precision,
        "bf16_carry": bool(args.bf16_carry),
        "per_iter_ms": round(per_iter_ms, 1),
        "step_imgs_per_sec": round(batch / per_iter_ms * 1000, 2),
        "n_lo_s": round(lo, 3), "n_hi_s": round(hi, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
