"""Per-segment timing of the APGD attack step (roofline attribution).

Times, at bench.py geometry (UperNet-ConvNeXt-T_CVST, 512^2, batch 16):
backbone fwd / fwd+input-grad, head fwd / fwd+input-grad (given fixed
features), full model fwd / fwd+input-grad — per --modes config.

Timing methodology (round-3 revision): N serial dependent calls inside ONE
jit via lax.scan, differencing two chain lengths. Single-dispatch timing
through the axon tunnel is unreliable (queueing + transfer artifacts
produced the round-2 "87 TF/s head" mis-attribution); every output leaf is
consumed by a full reduction so XLA cannot dead-code sibling ops.

Feeds the BENCHMARKS.md decomposition.
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
    ap.add_argument("--modes", default="default,fused")
    ap.add_argument("--segments", default="backbone_fwd,"
                    "backbone_fwd_input_grad,head_fwd,head_fwd_input_grad,"
                    "full_fwd,full_fwd_input_grad")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--precision", default="f32", choices=["f32", "bf16"],
                    help="bf16 = full-bf16 params+activations (the "
                         "--precision bf16 production mode); run the tool "
                         "twice to build the two-precision composite "
                         "roofline (VERDICT r3 Weak #1)")
    ap.add_argument("--cost", action="store_true",
                    help="also print XLA cost_analysis bytes/flops per "
                         "segment + the max(bytes/819GB/s, flops/179TF/s) "
                         "per-segment ceiling")
    ap.add_argument("--no-timing", action="store_true",
                    help="skip the chained timing (each chain is a large "
                         "fresh compile through the tunnel); with --cost "
                         "this gives the bytes/flops/ceiling table from "
                         "three small single-call compiles only")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from robseg_tpu import models
    from robseg_tpu.models.upernet import UperNetHead
    from robseg_tpu.models.convnext import ConvNeXt, CONVNEXT_SETTINGS

    batch, hw, n_cls = args.batch, args.hw, 21
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, hw, hw, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, n_cls, (batch, hw, hw)).astype(np.int32))

    def force(a):
        return float(np.asarray(jax.tree.leaves(a)[0]).ravel()[0])

    def chain(fn, n):
        @jax.jit
        def g(a0, rest):
            def body(c, _):
                out = fn(jax.tree.map(lambda v: v + c.astype(v.dtype), a0),
                         rest)
                tot = sum(leaf.astype(jnp.float32).mean()
                          for leaf in jax.tree.leaves(out))
                return (tot * 1e-20).astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=n)
            return c
        return g

    def t(fn, a0, rest=None, reps=args.reps):
        g1, g2 = chain(fn, 2), chain(fn, 2 + reps)
        force(g1(a0, rest)); force(g2(a0, rest))
        t0 = time.perf_counter(); force(g1(a0, rest))
        t1 = time.perf_counter(); force(g2(a0, rest))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps * 1000

    def loss_of(logits):
        logp = jax.nn.log_softmax(logits)
        oh = jax.nn.one_hot(y[:, :logits.shape[1], :logits.shape[2]],
                            logits.shape[-1])
        return -(oh * logp).mean()

    def build(mode):
        if mode == "default":
            bb = ConvNeXt("T_CVST")
            head = UperNetHead(n_cls,
                               in_channels=CONVNEXT_SETTINGS["T_CVST"][1])
            full = models.UperNetForSemanticSegmentation(
                backbone_variant="T_CVST", num_classes=n_cls)
        else:  # fused: block backbone kernels + split head
            bb = ConvNeXt("T_CVST", fused_mlp=True, fused_mlp_mode="block")
            head = UperNetHead(n_cls,
                               in_channels=CONVNEXT_SETTINGS["T_CVST"][1],
                               fused_head="split")
            full = models.build_model(
                "UperNetForSemanticSegmentation", "ConvNeXt-T_CVST",
                n_cls, image_size=(hw, hw), fused=True)
        return bb, head, full

    bb0, head0, _ = build("default")
    vb = jax.jit(bb0.init)(jax.random.PRNGKey(0),
                           jnp.zeros((1, hw, hw, 3), jnp.float32))
    feats0 = jax.jit(lambda xx: bb0.apply(vb, xx))(x)
    vh = jax.jit(head0.init)(jax.random.PRNGKey(1),
                             jax.tree.map(lambda a: a[:1], feats0))
    vf = None

    if args.precision == "bf16":
        _b = lambda tree: jax.tree.map(  # noqa: E731
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)
        vb, vh = _b(vb), _b(vh)
        x = x.astype(jnp.bfloat16)
        feats0 = _b(feats0)

    res = {}
    for mode in args.modes.split(","):
        bb, head, full = build(mode)
        if vf is None:
            vf = jax.jit(full.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, hw, hw, 3), jnp.float32))
            if args.precision == "bf16":
                vf = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                    vf)
        bb_fwd = lambda xx, _: bb.apply(vb, xx)[-1]              # noqa: E731
        bb_grad = jax.grad(lambda xx, _: bb.apply(vb, xx)[-1].sum())
        head_fwd = lambda ff, _: head.apply(vh, ff)              # noqa: E731
        head_grad = jax.grad(
            lambda ff, _: loss_of(head.apply(vh, ff)))
        full_fwd = lambda xx, _: full.apply(vf, xx)              # noqa: E731
        full_grad = jax.grad(lambda xx, _: loss_of(full.apply(vf, xx)))

        sel = args.segments.split(",")
        for name, fn, a0 in (
                ("backbone_fwd", bb_fwd, x),
                ("backbone_fwd_input_grad", bb_grad, x),
                ("head_fwd", head_fwd, feats0),
                ("head_fwd_input_grad", head_grad, feats0),
                ("full_fwd", full_fwd, x),
                ("full_fwd_input_grad", full_grad, x)):
            if name not in sel:
                continue
            if args.no_timing:
                ms = float("nan")
                line = f"{mode:8s} {name}: (timing skipped)"
            else:
                ms = t(fn, a0)
                res[f"{mode}_{name}_ms"] = round(ms, 1)
                line = f"{mode:8s} {name}: {ms:.1f} ms"
            if args.cost:
                # XLA-counted bytes/flops of ONE segment invocation ->
                # per-segment composite ceiling max(bytes/BW, flops/peak)
                try:
                    ca = (jax.jit(fn).lower(a0, None).compile()
                          .cost_analysis())
                    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                    fl = float(ca.get("flops", 0.0))
                    by = float(ca.get("bytes accessed", 0.0))
                    ceil_ms = max(by / 819e9, fl / 179e12) * 1e3
                    res[f"{mode}_{name}_gflop"] = round(fl / 1e9, 1)
                    res[f"{mode}_{name}_gbytes"] = round(by / 1e9, 2)
                    res[f"{mode}_{name}_ceiling_ms"] = round(ceil_ms, 1)
                    line += (f" | {fl / 1e9:.0f} GF {by / 1e9:.2f} GB "
                             f"ceiling {ceil_ms:.1f} ms "
                             f"({ms / max(ceil_ms, 1e-9):.2f}x)")
                except Exception as e:  # cost_analysis absent on backend
                    line += f" | cost_analysis unavailable: {e}"
            print(line, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
