"""Microbench: XLA vs Pallas for the fused fpn_bottleneck head conv.

Production geometry (UperNet @512^2, batch 16): four (16,128,128,512) FPN
maps -> concat 2048ch -> 3x3 conv 512 -> BN(eval) -> ReLU.  The Pallas
kernel (kernels/fpn_conv.py) never materializes the concat and fuses the
BN/ReLU epilogue; its VJP emits all four input grads in one pass.

Usage: python tools/bench_fpn.py [--batch 16] [--hw 128] [--reps 10]
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--modes", default="xla,pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from robseg_tpu.kernels.fpn_conv import (fpn_concat_conv_shared,
                                             fpn_concat_conv_reference)

    B, H, C, CO, N = args.batch, args.hw, 512, 512, 4
    rng = np.random.default_rng(0)
    xs = tuple(jnp.asarray(
        rng.standard_normal((B, H, H, C)).astype(np.float32)) for _ in range(N))
    w = jnp.asarray(
        (rng.standard_normal((N, 3, 3, C, CO)) / 96).astype(np.float32))
    s = jnp.asarray((1 + 0.1 * rng.standard_normal(CO)).astype(np.float32))
    t = jnp.asarray((0.1 * rng.standard_normal(CO)).astype(np.float32))

    def force(a):
        return float(np.asarray(jax.tree_util.tree_leaves(a)[0]).ravel()[0])

    def chain(fn, n):
        """n serial dependent calls of fn inside ONE jit — the only
        reliable timing unit through the tunnel (per-dispatch queueing and
        transfer costs are amortized away by differencing two lengths)."""
        @jax.jit
        def g(x0, *rest):
            def body(c, _):
                out = fn(x0 + c, *rest)
                # consume EVERY output leaf with a full reduction — feeding
                # back a single element lets XLA dead-code entire sibling
                # ops (observed: grad chain "ran" at 358 TF/s)
                tot = sum(leaf.astype(jnp.float32).mean()
                          for leaf in jax.tree_util.tree_leaves(out))
                return (tot * 1e-20).astype(x0.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), None,
                                length=n)
            return c
        return g

    def timeit(fn, *a, reps=args.reps):
        n1, n2 = 2, 2 + reps
        g1, g2 = chain(fn, n1), chain(fn, n2)
        force(g1(*a)); force(g2(*a))
        t0 = time.perf_counter()
        force(g1(*a))
        t1 = time.perf_counter()
        force(g2(*a))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1000

    tflop = 2 * B * H * H * 9 * N * C * CO / 1e12

    def xla_fwd(*x):
        return fpn_concat_conv_reference(x, w, (s, t))

    def pallas_fwd(*x):
        return fpn_concat_conv_shared(x, w, (s, t))

    def grad_of(f):
        return jax.grad(lambda *x: f(*x).astype(jnp.float32).sum(),
                        argnums=tuple(range(N)))

    res = {}
    modes = args.modes.split(",")
    fns = {"xla": xla_fwd, "pallas": pallas_fwd}
    for name in modes:
        f = fns[name]
        g = grad_of(fns[name])
        ms_f = timeit(f, *xs)
        ms_g = timeit(g, *xs)
        res[name] = {"fwd_ms": round(ms_f, 2),
                     "fwd_TFs": round(tflop / ms_f * 1000, 1),
                     "fwdgrad_ms": round(ms_g, 2),
                     "fwdgrad_TFs": round(2 * tflop / ms_g * 1000, 1)}
        print(f"{name:7s} fwd {ms_f:7.2f} ms ({tflop / ms_f * 1000:6.1f} TF/s)"
              f"  fwd+grad {ms_g:7.2f} ms "
              f"({2 * tflop / ms_g * 1000:6.1f} TF/s)", flush=True)
    if len(res) == 2:
        a = jax.jit(xla_fwd)(*xs)
        b = jax.jit(pallas_fwd)(*xs)
        print("max |xla - pallas|:",
              float(jnp.abs(a - b).max()), "scale",
              float(jnp.abs(a).max()), flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
