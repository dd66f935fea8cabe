"""Pallas TPU kernel: fused ConvNeXt token-MLP block tail.

Computes  m = gamma * (gelu(LN(y) @ W1 + b1) @ W2 + b2)  in a single VMEM
pass over token tiles (the caller adds the block residual; y is the
depthwise-conv output). XLA materializes the 4x-width hidden activation
``h`` to HBM between the two matmuls (the dominant traffic of the
bandwidth-bound ConvNeXt backbone — see BENCHMARKS.md); here ``h`` lives
only in VMEM scratch.

The custom VJP computes **input gradients only** (a second kernel
recomputes LN/h per tile and chains the backward); that is exactly what the
attack engine needs — model params are constants during attacks. For
parameter gradients (training) use the pure-XLA block (default).

Channels are zero-padded to the 128-lane boundary; the LayerNorm masks
padded channels out of its statistics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _tile_rows(hid: int) -> int:
    """Token rows per grid step, sized so tiles + double-buffered weights
    fit the ~16 MB VMEM budget (hid = 4*dim dominates)."""
    if hid <= 768:
        return 512
    if hid <= 1536:
        return 256
    return 128


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7 — below f32 noise);
    Pallas TPU has no erf/erfc primitive."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _round_up(x, m):
    return (x + m - 1) // m * m


def _dot(a, b, mxu_bf16: bool):
    """MXU matmul with f32 accumulate.

    ``mxu_bf16=True`` truncates both operands to bf16 first — the SAME
    numerics as XLA's DEFAULT matmul precision (one MXU pass). With f32
    operands Mosaic must emulate f32 multiplication in multiple bf16
    passes, which made the round-1 kernels' matmuls ~3x slower than the
    XLA default path they competed against (BENCHMARKS.md round-2).
    """
    if mxu_bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _ln_stats(x, mask, c_real):
    """Masked LayerNorm statistics over the (padded) channel axis."""
    mean = (x * mask).sum(-1, keepdims=True) / c_real
    d = (x - mean) * mask
    var = (d * d).sum(-1, keepdims=True) / c_real
    return mean, var, d


def _fwd_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g_ref, out_ref, *, c_real: int, mxu_bf16: bool = False):
    x = x_ref[:]
    cpad = x.shape[-1]
    mask = (jax.lax.broadcasted_iota(jnp.int32, (1, cpad), 1)
            < c_real).astype(x.dtype)
    mean, var, d = _ln_stats(x, mask, float(c_real))
    u = d * jax.lax.rsqrt(var + 1e-6) * ls_ref[:] + lb_ref[:] * mask
    h = _dot(u, w1_ref[:], mxu_bf16) + b1_ref[:]
    # exact-form (erf) GELU via the polynomial erf above
    a = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    m = _dot(a, w2_ref[:], mxu_bf16) + b2_ref[:]
    out_ref[:] = g_ref[:] * m * mask


def _bwd_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g_ref, gout_ref, dx_ref, *, c_real: int,
                mxu_bf16: bool = False):
    """dy for m = gamma*(gelu(LN(y)W1+b1)W2+b2); recomputes forward
    intermediates per tile."""
    x = x_ref[:]
    gout = gout_ref[:]
    cpad = x.shape[-1]
    c = float(c_real)
    mask = (jax.lax.broadcasted_iota(jnp.int32, (1, cpad), 1)
            < c_real).astype(x.dtype)
    mean, var, d = _ln_stats(x, mask, c)
    inv = jax.lax.rsqrt(var + 1e-6)
    xhat = d * inv
    u = xhat * ls_ref[:] + lb_ref[:] * mask
    h = _dot(u, w1_ref[:], mxu_bf16) + b1_ref[:]

    gm = gout * g_ref[:] * mask
    da = _dot(gm, w2_ref[:].T, mxu_bf16)
    # exact-form gelu' via the polynomial erf
    sq2 = 0.7071067811865476
    cdf = 0.5 * (1.0 + _erf(h * sq2))
    pdf = 0.3989422804014327 * jnp.exp(-0.5 * h * h)
    dh = da * (cdf + h * pdf)
    du = _dot(dh, w1_ref[:].T, mxu_bf16)
    dxhat = du * ls_ref[:] * mask
    # layernorm backward (masked channels contribute zero)
    s1 = dxhat.sum(-1, keepdims=True)
    s2 = (dxhat * xhat).sum(-1, keepdims=True)
    dln = inv * (dxhat - (s1 + xhat * s2) / c) * mask
    dx_ref[:] = dln


def _pack(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    c = x.shape[-1]
    cpad = _round_up(c, 128)
    hid = w1.shape[1]
    p = x.reshape(-1, c)
    n = p.shape[0]
    tile = _tile_rows(hid)
    npad = _round_up(n, tile)
    p = jnp.pad(p, ((0, npad - n), (0, cpad - c)))
    vecs = [jnp.pad(v.reshape(1, -1), ((0, 0), (0, cpad - c)))
            for v in (ln_scale, ln_bias, b2, gamma)]
    w1p = jnp.pad(w1, ((0, cpad - c), (0, 0)))
    w2p = jnp.pad(w2, ((0, 0), (0, cpad - c)))
    b1p = b1.reshape(1, -1)
    return p, vecs, w1p, b1p, w2p, n, cpad, hid, tile


def _call(kernel, x, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
          extra=None, mxu_bf16=False):
    c = x.shape[-1]
    p, (lsp, lbp, b2p, gp), w1p, b1p, w2p, n, cpad, hid, tile = _pack(
        x, ln_scale, ln_bias, w1, b1, w2, b2, gamma)
    if mxu_bf16:  # half the resident VMEM for the weight panels
        w1p, w2p = w1p.astype(jnp.bfloat16), w2p.astype(jnp.bfloat16)
    ins = [p, lsp, lbp, w1p, b1p, w2p, b2p, gp]
    if extra is not None:
        e = extra.reshape(-1, c)
        e = jnp.pad(e, ((0, p.shape[0] - e.shape[0]), (0, cpad - c)))
        ins.append(e)
    grid = (p.shape[0] // tile,)
    tile = pl.BlockSpec((tile, cpad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    full = lambda r, k: pl.BlockSpec((r, k), lambda i: (0, 0),  # noqa: E731
                                     memory_space=pltpu.VMEM)
    in_specs = [tile, full(1, cpad), full(1, cpad), full(cpad, hid),
                full(1, hid), full(hid, cpad), full(1, cpad), full(1, cpad)]
    if extra is not None:
        in_specs.append(tile)
    out = pl.pallas_call(
        functools.partial(kernel, c_real=c, mxu_bf16=mxu_bf16),
        grid=grid, in_specs=in_specs, out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(p.shape, jnp.float32),
    )(*ins)
    return out[:n, :c].reshape(x.shape)


@jax.custom_vjp
def convnext_mlp_fused(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    """Fused gamma*MLP(LN(x)) branch; differentiable w.r.t. x ONLY
    (attack use — model params are constants there)."""
    return _call(_fwd_kernel, x, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _fused_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    out = convnext_mlp_fused(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _fused_bwd(res, gout):
    x, ln_scale, ln_bias, w1, b1, w2, b2, gamma = res
    dx = _call(_bwd_kernel, x, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
               extra=gout)
    zero = lambda v: jnp.zeros_like(v)  # noqa: E731  (params are constants)
    return (dx, zero(ln_scale), zero(ln_bias), zero(w1), zero(b1),
            zero(w2), zero(b2), zero(gamma))


convnext_mlp_fused.defvjp(_fused_fwd, _fused_bwd)

# Nested-jit wrapper: same-shape call sites share ONE subcomputation in the
# emitted HLO instead of inlining a Mosaic kernel blob per block (the
# 18-block UperNet attack program otherwise reaches ~237 MB of IR and can
# overwhelm compile services).
convnext_mlp_fused_shared = jax.jit(convnext_mlp_fused)


# ---------------------------------------------------------------------------
# Residual-saving variant: the forward also writes the pre-GELU hidden ``h``
# to HBM once, so the backward does exactly TWO matmuls (gm@W2^T, dh@W1^T)
# like XLA's saved-residual autodiff — instead of the recompute variant's
# three. Trade-off: the forward loses the "h never touches HBM" win; this
# targets the ATTACK path where fwd+bwd run together every iteration.
# ---------------------------------------------------------------------------

def _fwd_save_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     g_ref, out_ref, h_ref, *, c_real: int,
                     mxu_bf16: bool = False):
    x = x_ref[:]
    cpad = x.shape[-1]
    mask = (jax.lax.broadcasted_iota(jnp.int32, (1, cpad), 1)
            < c_real).astype(x.dtype)
    mean, var, d = _ln_stats(x, mask, float(c_real))
    u = d * jax.lax.rsqrt(var + 1e-6) * ls_ref[:] + lb_ref[:] * mask
    h = _dot(u, w1_ref[:], mxu_bf16) + b1_ref[:]
    h_ref[:] = h
    a = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    m = _dot(a, w2_ref[:], mxu_bf16) + b2_ref[:]
    out_ref[:] = g_ref[:] * m * mask


def _bwd_resid_kernel(x_ref, h_ref, ls_ref, w1_ref, w2_ref, g_ref, gout_ref,
                      dx_ref, *, c_real: int, mxu_bf16: bool = False):
    """dx with ``h`` read back from HBM: 2 matmuls; LN stats recomputed from
    x in VMEM (vector ops only, no extra HBM traffic)."""
    x = x_ref[:]
    h = h_ref[:]
    gout = gout_ref[:]
    cpad = x.shape[-1]
    c = float(c_real)
    mask = (jax.lax.broadcasted_iota(jnp.int32, (1, cpad), 1)
            < c_real).astype(x.dtype)
    mean, var, d = _ln_stats(x, mask, c)
    inv = jax.lax.rsqrt(var + 1e-6)
    xhat = d * inv

    gm = gout * g_ref[:] * mask
    da = _dot(gm, w2_ref[:].T, mxu_bf16)
    sq2 = 0.7071067811865476
    cdf = 0.5 * (1.0 + _erf(h * sq2))
    pdf = 0.3989422804014327 * jnp.exp(-0.5 * h * h)
    dh = da * (cdf + h * pdf)
    du = _dot(dh, w1_ref[:].T, mxu_bf16)
    dxhat = du * ls_ref[:] * mask
    s1 = dxhat.sum(-1, keepdims=True)
    s2 = (dxhat * xhat).sum(-1, keepdims=True)
    dx_ref[:] = inv * (dxhat - (s1 + xhat * s2) / c) * mask


def _call_save(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
               mxu_bf16=False):
    """Forward returning (out, h_padded, n) — h stays in its padded
    (npad, hid) layout for the backward."""
    c = x.shape[-1]
    p, (lsp, lbp, b2p, gp), w1p, b1p, w2p, n, cpad, hid, tile = _pack(
        x, ln_scale, ln_bias, w1, b1, w2, b2, gamma)
    if mxu_bf16:
        w1p, w2p = w1p.astype(jnp.bfloat16), w2p.astype(jnp.bfloat16)
    grid = (p.shape[0] // tile,)
    tspec = pl.BlockSpec((tile, cpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((tile, hid), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    full = lambda r, k: pl.BlockSpec((r, k), lambda i: (0, 0),  # noqa: E731
                                     memory_space=pltpu.VMEM)
    out, h = pl.pallas_call(
        functools.partial(_fwd_save_kernel, c_real=c, mxu_bf16=mxu_bf16),
        grid=grid,
        in_specs=[tspec, full(1, cpad), full(1, cpad), full(cpad, hid),
                  full(1, hid), full(hid, cpad), full(1, cpad),
                  full(1, cpad)],
        out_specs=(tspec, hspec),
        out_shape=(jax.ShapeDtypeStruct(p.shape, jnp.float32),
                   jax.ShapeDtypeStruct((p.shape[0], hid), jnp.float32)),
    )(p, lsp, lbp, w1p, b1p, w2p, b2p, gp)
    return out[:n, :c].reshape(x.shape), h


def _call_resid_bwd(x, h_pad, ln_scale, w1, w2, gamma, gout,
                    mxu_bf16=False):
    c = x.shape[-1]
    cpad = _round_up(c, 128)
    hid = w1.shape[1]
    p = x.reshape(-1, c)
    n = p.shape[0]
    tile = _tile_rows(hid)
    npad = _round_up(n, tile)
    p = jnp.pad(p, ((0, npad - n), (0, cpad - c)))
    e = gout.reshape(-1, c)
    e = jnp.pad(e, ((0, npad - n), (0, cpad - c)))
    lsp = jnp.pad(ln_scale.reshape(1, -1), ((0, 0), (0, cpad - c)))
    gp = jnp.pad(gamma.reshape(1, -1), ((0, 0), (0, cpad - c)))
    w1p = jnp.pad(w1, ((0, cpad - c), (0, 0)))
    w2p = jnp.pad(w2, ((0, 0), (0, cpad - c)))
    if mxu_bf16:
        w1p, w2p = w1p.astype(jnp.bfloat16), w2p.astype(jnp.bfloat16)
    grid = (npad // tile,)
    tspec = pl.BlockSpec((tile, cpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((tile, hid), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    full = lambda r, k: pl.BlockSpec((r, k), lambda i: (0, 0),  # noqa: E731
                                     memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_bwd_resid_kernel, c_real=c, mxu_bf16=mxu_bf16),
        grid=grid,
        in_specs=[tspec, hspec, full(1, cpad), full(cpad, hid),
                  full(hid, cpad), full(1, cpad), tspec],
        out_specs=tspec,
        out_shape=jax.ShapeDtypeStruct((npad, cpad), jnp.float32),
    )(p, h_pad, lsp, w1p, w2p, gp, e)
    return dx[:n, :c].reshape(x.shape)


@jax.custom_vjp
def convnext_mlp_fused_rs(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    """Residual-saving fused gamma*MLP(LN(x)); differentiable w.r.t. x ONLY
    (attack use). Forward also materializes h once for the 2-matmul bwd."""
    out, _ = _call_save(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma)
    return out


def _rs_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    out, h = _call_save(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, h)


def _rs_bwd(res, gout):
    x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, h = res
    dx = _call_resid_bwd(x, h, ln_scale, w1, w2, gamma, gout)
    zero = lambda v: jnp.zeros_like(v)  # noqa: E731
    return (dx, zero(ln_scale), zero(ln_bias), zero(w1), zero(b1),
            zero(w2), zero(b2), zero(gamma))


convnext_mlp_fused_rs.defvjp(_rs_fwd, _rs_bwd)

convnext_mlp_fused_rs_shared = jax.jit(convnext_mlp_fused_rs)


def convnext_mlp_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    """Pure-JAX composition (the default path; also the parity oracle)."""
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    u = (x - mean) * jax.lax.rsqrt(var + 1e-6) * ln_scale + ln_bias
    h = u @ w1 + b1
    a = jax.nn.gelu(h, approximate=False)
    return gamma * (a @ w2 + b2)


# ---------------------------------------------------------------------------
# bf16-MXU variants: operands truncated to bf16 before each MXU pass — the
# same numerics as XLA's DEFAULT matmul precision on TPU (which is what the
# competing default path actually runs), at 1 MXU pass instead of Mosaic's
# multi-pass f32 emulation. f32 accumulate, f32 LN/GELU, f32 output.
# ---------------------------------------------------------------------------

@jax.custom_vjp
def convnext_mlp_fused_bf16(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    """Fused gamma*MLP(LN(x)), bf16 MXU passes (XLA-DEFAULT numerics);
    recompute backward; differentiable w.r.t. x ONLY."""
    return _call(_fwd_kernel, x, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                 mxu_bf16=True)


def _fused_bf16_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    out = convnext_mlp_fused_bf16(x, ln_scale, ln_bias, w1, b1, w2, b2,
                                  gamma)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _fused_bf16_bwd(res, gout):
    x, ln_scale, ln_bias, w1, b1, w2, b2, gamma = res
    dx = _call(_bwd_kernel, x, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
               extra=gout, mxu_bf16=True)
    zero = lambda v: jnp.zeros_like(v)  # noqa: E731
    return (dx, zero(ln_scale), zero(ln_bias), zero(w1), zero(b1),
            zero(w2), zero(b2), zero(gamma))


convnext_mlp_fused_bf16.defvjp(_fused_bf16_fwd, _fused_bf16_bwd)

convnext_mlp_fused_bf16_shared = jax.jit(convnext_mlp_fused_bf16)


@jax.custom_vjp
def convnext_mlp_fused_rs_bf16(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    """Residual-saving fused gamma*MLP(LN(x)), bf16 MXU passes; 2-matmul
    backward reading the saved pre-GELU hidden; differentiable w.r.t. x
    ONLY."""
    out, _ = _call_save(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                        mxu_bf16=True)
    return out


def _rs_bf16_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    out, h = _call_save(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                        mxu_bf16=True)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, h)


def _rs_bf16_bwd(res, gout):
    x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, h = res
    dx = _call_resid_bwd(x, h, ln_scale, w1, w2, gamma, gout, mxu_bf16=True)
    zero = lambda v: jnp.zeros_like(v)  # noqa: E731
    return (dx, zero(ln_scale), zero(ln_bias), zero(w1), zero(b1),
            zero(w2), zero(b2), zero(gamma))


convnext_mlp_fused_rs_bf16.defvjp(_rs_bf16_fwd, _rs_bf16_bwd)

convnext_mlp_fused_rs_bf16_shared = jax.jit(convnext_mlp_fused_rs_bf16)
