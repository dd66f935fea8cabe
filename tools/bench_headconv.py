"""Microbench: formulations of the UperNet fpn_bottleneck conv.

The dominant single op in the attack step is the 3x3 ConvModule over the
4-level FPN concat: (B,128,128,2048) -> (B,128,128,512), ~4.9 of the
7.6 TFLOP forward (BENCHMARKS.md).  XLA runs it at ~66% of the chip's
calibrated matmul rate.  Candidate formulations, all math-identical under
DEFAULT (bf16-MXU) precision:

  conv      — nn.Conv as-is (lax.conv_general_dilated, NHWC)
  split     — concat avoided: 4 separate 3x3 convs (512ch each), summed
  shift9    — 3x3 conv as 9 shifted 1x1 matmuls accumulated
  bf16in    — conv with inputs+weights pre-cast to bf16 (same MXU numerics,
              half the HBM read), f32 accumulate/output

Each is timed fwd and fwd+input-grad with amortized forced transfer.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B, H, C_IN, C_OUT = 16, 128, 2048, 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, H, C_IN)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, C_IN, C_OUT)) / 96).astype(np.float32))

    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(xx, ww):
        return jax.lax.conv_general_dilated(
            xx, ww, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

    def split(xx, ww):
        out = None
        for i in range(4):
            o = jax.lax.conv_general_dilated(
                xx[..., i * 512:(i + 1) * 512], ww[:, :, i * 512:(i + 1) * 512],
                (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
            out = o if out is None else out + o
        return out

    def shift9(xx, ww):
        xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx_ in range(3):
                patch = jax.lax.dynamic_slice(
                    xp, (0, dy, dx_, 0), (B, H, H, C_IN))
                o = jnp.einsum("bhwc,co->bhwo", patch, ww[dy, dx_])
                out = o if out is None else out + o
        return out

    def bf16in(xx, ww):
        return jax.lax.conv_general_dilated(
            xx.astype(jnp.bfloat16), ww.astype(jnp.bfloat16),
            (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    def force(a):
        return float(np.asarray(a).ravel()[0])

    def timeit(fn, reps=10):
        f = jax.jit(fn)
        force(f(x))
        force(f(x))
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = f(x)
        force(out)
        t1 = time.perf_counter()
        # second pass with 2x reps to subtract the fixed transfer cost
        t2 = time.perf_counter()
        for _ in range(2 * reps):
            out = f(x)
        force(out)
        t3 = time.perf_counter()
        return ((t3 - t2) - (t1 - t0)) / reps * 1000

    import os
    sel = os.environ.get("HEADCONV_FNS", "conv,split,shift9,bf16in").split(",")
    all_fns = {"conv": conv, "split": split, "shift9": shift9, "bf16in": bf16in}
    fns = {k: all_fns[k] for k in sel}
    tflop = 2 * B * H * H * 9 * C_IN * C_OUT / 1e12
    res = {}
    ref = None
    for name, fn in fns.items():
        fwd = functools.partial(fn, ww=w)
        g = jax.grad(lambda xx: fn(xx, w).astype(jnp.float32).sum())
        out = jax.jit(fwd)(x)
        if ref is None:
            ref = out
        err = float(jnp.abs(out.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        ms_f = timeit(fwd)
        ms_g = timeit(g)
        res[name] = {"fwd_ms": round(ms_f, 2),
                     "fwd_TFs": round(tflop / ms_f * 1000, 1),
                     "fwdgrad_ms": round(ms_g, 2),
                     "max_abs_err": err}
        print(f"{name:7s} fwd {ms_f:7.2f} ms ({tflop / ms_f * 1000:6.1f} TF/s)"
              f"  fwd+grad {ms_g:7.2f} ms   err {err:.2e}", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
