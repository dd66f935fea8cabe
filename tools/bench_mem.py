"""HBM-pressure probe for the attack step (remat diagnosis).

CPU cost analysis of the APGD fwd+input-grad counts exactly 2.0x the
forward FLOPs (symbolic AD has no weight grads, no recompute), yet TPU
cost analysis of the same function counts ~3x — and batch scaling is
non-monotonic (16 -> 55, 20 -> 48 step*imgs/s).  Hypothesis: XLA:TPU
rematerializes forward activations under HBM pressure.  This probe prints,
per batch size, the compiled executable's cost analysis (flops) and memory
analysis (argument/output/temp/peak bytes) plus a measured wall time for
fwd and fwd+input-grad of the bench.py model (UperNet-ConvNeXt-T_CVST @
512^2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batches=(8, 16, 20, 24)):
    import jax
    import jax.numpy as jnp
    from robseg_tpu import models

    hw, n_cls = 512, 21
    full = models.UperNetForSemanticSegmentation(
        backbone_variant="T_CVST", num_classes=n_cls)
    vf = jax.jit(full.init)(jax.random.PRNGKey(0),
                            jnp.zeros((1, hw, hw, 3), jnp.float32))
    rng = np.random.default_rng(0)

    def force(a):
        return float(np.asarray(jax.tree.leaves(a)[0]).ravel()[0])

    def loss_of(logits, y):
        logp = jax.nn.log_softmax(logits)
        oh = jax.nn.one_hot(y, logits.shape[-1])
        return -(oh * logp).mean()

    for batch in batches:
        x = jnp.asarray(rng.random((batch, hw, hw, 3)).astype(np.float32))
        y = jnp.asarray(
            rng.integers(0, n_cls, (batch, hw, hw)).astype(np.int32))

        fwd = lambda xx: full.apply(vf, xx)           # noqa: E731
        grad = jax.grad(lambda xx: loss_of(full.apply(vf, xx), y))

        for name, fn, arg in (("fwd", fwd, x), ("fwd+grad", grad, x)):
            lowered = jax.jit(fn).lower(arg)
            t0 = time.perf_counter()
            compiled = lowered.compile()
            compile_s = time.perf_counter() - t0
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0] if ca else {}
            ma = compiled.memory_analysis()
            rec = {
                "batch": batch, "which": name,
                "compile_s": round(compile_s, 1),
                "tflops": round(float(ca.get("flops", 0)) / 1e12, 2),
                "hbm_bytes_GB": round(
                    float(ca.get("bytes accessed", 0)) / 2**30, 1),
            }
            if ma is not None:
                rec.update({
                    "temp_GB": round(ma.temp_size_in_bytes / 2**30, 2),
                    "arg_GB": round(ma.argument_size_in_bytes / 2**30, 2),
                    "peak_GB": round(
                        (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                         + ma.output_size_in_bytes) / 2**30, 2),
                })
            # measured wall time (forced transfer through the tunnel)
            f = jax.jit(fn)
            force(f(arg)); force(f(arg))
            t0 = time.perf_counter()
            for _ in range(3):
                out = f(arg)
            force(out)
            rec["ms"] = round((time.perf_counter() - t0) / 3 * 1000, 1)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    bs = tuple(int(a) for a in sys.argv[1:]) or (8, 16, 20, 24)
    main(bs)
