"""Per-segment timing of the APGD attack step (roofline attribution).

Times, at bench.py geometry (UperNet-ConvNeXt-T_CVST, 512^2, batch 16):
  backbone fwd / fwd+input-grad, head fwd / fwd+input-grad (given fixed
  features), full model fwd / fwd+input-grad, full APGD step — each as one
  jitted call with a forced host transfer (block_until_ready does not block
  through the axon tunnel).

Feeds the BENCHMARKS.md decomposition. Run on a quiet host: single-dispatch
timings are tunnel-latency sensitive.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from robseg_tpu import models
    from robseg_tpu.models.upernet import UperNetHead
    from robseg_tpu.models.convnext import ConvNeXt, CONVNEXT_SETTINGS

    batch, hw, n_cls = 16, 512, 21
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, hw, hw, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, n_cls, (batch, hw, hw)).astype(np.int32))

    bb = ConvNeXt("T_CVST")
    vb = jax.jit(bb.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, hw, hw, 3), jnp.float32))
    dims = CONVNEXT_SETTINGS["T_CVST"][1]
    head = UperNetHead(n_cls, in_channels=dims)
    feats0 = jax.jit(lambda xx: bb.apply(vb, xx))(x)
    vh = jax.jit(head.init)(jax.random.PRNGKey(1),
                            jax.tree.map(lambda a: a[:1], feats0))

    full = models.UperNetForSemanticSegmentation(
        backbone_variant="T_CVST", num_classes=n_cls)
    vf = jax.jit(full.init)(jax.random.PRNGKey(0),
                            jnp.zeros((1, hw, hw, 3), jnp.float32))

    def loss_of(logits):
        logp = jax.nn.log_softmax(logits)
        oh = jax.nn.one_hot(y[:, :128, :128] if logits.shape[1] == 128
                            else y, logits.shape[-1])
        return -(oh * logp).mean()

    bb_fwd = jax.jit(lambda xx: bb.apply(vb, xx)[-1])
    bb_grad = jax.jit(jax.grad(lambda xx: bb.apply(vb, xx)[-1].sum()))
    head_fwd = jax.jit(lambda ff: head.apply(vh, ff))
    head_grad = jax.jit(jax.grad(lambda ff: loss_of(head.apply(vh, ff)),
                                 argnums=0))
    full_fwd = jax.jit(lambda xx: full.apply(vf, xx))
    full_grad = jax.jit(jax.grad(
        lambda xx: loss_of(full.apply(vf, xx))))

    def force(a):
        return float(np.asarray(jax.tree.leaves(a)[0]).ravel()[0])

    def t(fn, arg, reps=5):
        force(fn(arg))
        force(fn(arg))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(arg)
        force(out)
        return (time.perf_counter() - t0) / reps * 1000

    res = {}
    res["backbone_fwd_ms"] = round(t(bb_fwd, x), 1)
    res["backbone_fwd_input_grad_ms"] = round(t(bb_grad, x), 1)
    res["head_fwd_ms"] = round(t(head_fwd, feats0), 1)
    res["head_fwd_input_grad_ms"] = round(t(head_grad, feats0), 1)
    res["full_fwd_ms"] = round(t(full_fwd, x), 1)
    res["full_fwd_input_grad_ms"] = round(t(full_grad, x), 1)
    for k, v in res.items():
        print(f"{k}: {v}", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
