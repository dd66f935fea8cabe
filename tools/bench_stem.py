"""Microbench: CvSt stem conv0 C_in=3 layout pathology vs space-to-depth.

Round-5 trace (bs16 f32 512^2): the whole CvSt stem costs ~21 ms per
attack iteration, dominated by conv0's INPUT-gradient — 9.8 ms at an
effective 89 GB/s — because the cotangent w.r.t. a (B,512,512,3) tensor
pads 3 channels to 128 lanes. A 3x3/s2 conv on C=3 is mathematically a
2x2/s1 conv on the 2x2 space-to-depth input (C=12) with kernel

    Ws[A,B,(a*2+b)*C+c,o] = W[2A+a-1, 2B+b-1, c, o]   (index -1 -> 0)

and top/left-only padding: output (i,j) reads rows {2i-1, 2i, 2i+1} =
blocks {i-1, i} at offsets {1, 0, 1}. This tool verifies exactness and
times fwd / fwd+input-grad for both forms, plus the APGD elementwise
clip on (B,512,512,3) vs flat layout (the `jit(clip)` fusion showed
13 GB/s in the same trace).

Reference geometry: ``convnext_orig.py:17-38`` (ConvBlock1) at the SEA
attack shapes (``semseg/attacker.py:385-569``).

Usage: python tools/bench_stem.py [--cpu] [--batch 16] [--hw 512]
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
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="exactness check only, on the CPU backend")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    B, H = args.batch, args.hw
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, H, 3)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 3, 48)) / 5)
                    .astype(np.float32))
    b = jnp.asarray((0.1 * rng.standard_normal(48)).astype(np.float32))
    dn = ("NHWC", "HWIO", "NHWC")

    def conv_base(y):
        return lax.conv_general_dilated(
            y, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn) + b

    def s2d(y):
        n, h, ww, c = y.shape
        y = y.reshape(n, h // 2, 2, ww // 2, 2, c)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, ww // 2,
                                                     4 * c)

    # kernel rearrangement: pad one zero row/col at top/left so slot k
    # holds tap di=k-1, then split k=2A+a.
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    ws = (wp.reshape(2, 2, 2, 2, 3, 48)
          .transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 12, 48))

    def conv_s2d(y):
        return lax.conv_general_dilated(
            s2d(y), ws, (1, 1), ((1, 0), (1, 0)), dimension_numbers=dn) + b

    # ---- exactness (any backend) ------------------------------------
    with jax.default_matmul_precision("highest"):
        ref = jax.jit(conv_base)(x)
        alt = jax.jit(conv_s2d)(x)
        gref = jax.jit(jax.grad(lambda y: conv_base(y).sum()))(x)
        galt = jax.jit(jax.grad(lambda y: conv_s2d(y).sum()))(x)
    err_f = float(jnp.abs(ref - alt).max() / jnp.abs(ref).max())
    err_g = float(jnp.abs(gref - galt).max() / jnp.abs(gref).max())
    print(json.dumps({"check": "s2d exactness", "fwd_rel": err_f,
                      "grad_rel": err_g}), flush=True)
    assert err_f < 1e-6 and err_g < 1e-6, (err_f, err_g)
    if args.cpu:
        return

    # ---- timing (TPU): scan-chain, difference two lengths ------------
    def force(a):
        return float(np.asarray(jax.tree_util.tree_leaves(a)[0]).ravel()[0])

    def chain(fn, n):
        @jax.jit
        def g(x0, *rest):
            def body(c, _):
                out = fn(x0 + c, *rest)
                tot = sum(leaf.astype(jnp.float32).mean()
                          for leaf in jax.tree_util.tree_leaves(out))
                return (tot * 1e-20).astype(x0.dtype), None
            c, _ = lax.scan(body, jnp.zeros((), x0.dtype), None, length=n)
            return c
        return g

    def timeit(fn, *a, reps=args.reps):
        n1, n2 = 2, 2 + reps
        g1, g2 = chain(fn, n1), chain(fn, n2)
        force(g1(*a)); force(g2(*a))
        t0 = time.perf_counter(); force(g1(*a))
        t1 = time.perf_counter(); force(g2(*a))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1000

    res = {}
    for name, f in [("base", conv_base), ("s2d", conv_s2d)]:
        gf = jax.grad(lambda y, f=f: f(y).astype(jnp.float32).sum())
        res[name] = {"fwd_ms": round(timeit(f, x), 3),
                     "fwdgrad_ms": round(timeit(gf, x), 3)}
        print(name, res[name], flush=True)

    # elementwise APGD clip probe: NHWC C=3 vs flat
    eps = 8.0 / 255
    lo, hi = x - eps, x + eps
    xf, lof, hif = (t.reshape(B, -1) for t in (x, lo, hi))

    def clip_nhwc(y, lo_, hi_):
        return jnp.clip(jnp.clip(y, lo_, hi_), 0.0, 1.0)

    res["clip_nhwc_ms"] = round(timeit(clip_nhwc, x, lo, hi), 3)
    res["clip_flat_ms"] = round(timeit(clip_nhwc, xf, lof, hif), 3)
    # s2d transform alone (fwd and its transpose via grad)
    res["s2d_ms"] = round(timeit(s2d, x), 3)
    res["s2d_grad_ms"] = round(
        timeit(jax.grad(lambda y: s2d(y).sum()), x), 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
