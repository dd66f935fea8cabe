"""Pallas TPU kernel: UperNet's fused FPN-concat 3x3 bottleneck conv.

The dominant single op of the attack step is the head's ``fpn_bottleneck``
ConvModule (``semseg/models/uperforseg.py:260-307`` in the reference; our
``models/upernet.py::UperNetHead``): a 3x3 conv over the channel-concat of
the four 128^2 FPN maps, (B,128,128,4*512) -> (B,128,128,512), followed by
eval-mode BatchNorm and ReLU.  It carries ~4.9 of the 7.6 forward TFLOP at
batch 16 (BENCHMARKS.md) and XLA runs it at ~2/3 of the chip's calibrated
matmul rate.

This kernel computes the SAME math as concat -> conv -> BN(eval) -> ReLU
without ever materializing the (B,128,128,2048) concat in HBM:

    out = relu( (sum_i conv3x3(x_i, w_i)) * s + t )

where ``w_i`` is the 512-channel input slice of the conv weight for source
``i`` and ``s, t`` fold the eval-mode BatchNorm affine
(``s = gamma/sqrt(var+eps)``, ``t = beta - mean*s``).  The 3x3 conv is 9
shifted (rows x 512) @ (512 x 512) matmuls per source, accumulated in f32
in VMEM; operands are truncated to bf16 exactly like the XLA DEFAULT conv.

TPU mapping (same playbook as ``kernels/convnext_block.py``):
  * grid = (batch, H/TH) row tiles; channels-last (C = lanes);
  * row halos via the 3-view trick: each source is passed three times with
    block index maps i-1 / i / i+1 (edge-clamped) and out-of-image rows
    are masked to zero in-kernel == the conv's zero padding;
  * column halos via a one-time XLA pre-pad of 1 zero column each side;
  * the backward reads the forward OUTPUT (ReLU mask) plus dy, forms
    g = dy * (out > 0) * s on the (TH+2)-row band, and closes the stencil
    with flipped-weight matmuls, emitting all four input gradients in one
    pass (the 2048-channel concat gradient never exists either).

Differentiable w.r.t. the four inputs ONLY (weights/BN are attack-time
constants, like every attack-path kernel in this repo).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 8  # row-tile height (VMEM-budgeted: 4 sources x 3 views + weights)
_VMEM = 100 * 1024 * 1024


def _bf(a):
    return a.astype(jnp.bfloat16)


def _assemble_bf16(prev, cur, nxt, i, th: int, h_real: int):
    """(3*th, Wp, C) bf16 band of global rows (i-1)*th .., zero outside."""
    buf = jnp.concatenate([prev[0], cur[0], nxt[0]], axis=0)
    g0 = (i - 1) * th
    rows = jax.lax.broadcasted_iota(jnp.int32, (buf.shape[0], 1, 1), 0) + g0
    valid = ((rows >= 0) & (rows < h_real)).astype(jnp.bfloat16)
    return _bf(buf) * valid


def _fwd_kernel(*refs, th: int, h_real: int, w_real: int, n_src: int):
    # refs: n_src*3 input views, w_ref (n_src,3,3,C,Co), s, t, out_ref
    views = refs[:n_src * 3]
    w_ref, s_ref, t_ref, out_ref = refs[n_src * 3:]
    i = pl.program_id(1)
    acc = None
    for src in range(n_src):
        xb = _assemble_bf16(views[3 * src], views[3 * src + 1],
                            views[3 * src + 2], i, th, h_real)
        for ky in range(3):
            rs = xb[th + ky - 1:th + ky - 1 + th]        # (th, Wp, C)
            for kx in range(3):
                sl = rs[:, kx:kx + w_real, :]            # (th, W, C)
                term = jax.lax.dot_general(
                    sl, _bf(w_ref[src, ky, kx]),
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = term if acc is None else acc + term
    y = acc * s_ref[0].astype(jnp.float32)[None, None, :] \
        + t_ref[0].astype(jnp.float32)[None, None, :]
    out_ref[0] = jnp.maximum(y, 0.0).astype(out_ref.dtype)


def _bwd_kernel(*refs, th: int, h_real: int, w_real: int, n_src: int):
    # refs: dy 3 views, out 3 views, w_ref, s_ref, then n_src dx out refs
    dyv = refs[:3]
    outv = refs[3:6]
    w_ref, s_ref = refs[6:8]
    dx_refs = refs[8:8 + n_src]
    i = pl.program_id(1)
    # g = dy * relu'(out) * s on the (th+2)-row band, bf16 for the matmuls
    dyb = _assemble_bf16(dyv[0], dyv[1], dyv[2], i, th, h_real)
    ob = jnp.concatenate([outv[0][0], outv[1][0], outv[2][0]], axis=0)
    # compare in f32: Mosaic rejects bf16 cmpf on this target
    mask = (ob.astype(jnp.float32) > 0).astype(jnp.bfloat16)
    g = dyb * mask * _bf(s_ref[0])[None, None, :]        # (3*th, W, C_out)
    # dx_i[r, c] = sum_{ky,kx} g[r - ky + 1, c - kx + 1] @ w_i[ky,kx].T
    gp = jnp.pad(g, ((0, 0), (1, 1), (0, 0)))            # col zero-halo
    for src in range(n_src):
        acc = None
        for ky in range(3):
            rs = gp[th + 1 - ky:th + 1 - ky + th]        # (th, W+2, C_out)
            for kx in range(3):
                sl = rs[:, 2 - kx:2 - kx + w_real, :]
                term = jax.lax.dot_general(
                    sl, _bf(w_ref[src, ky, kx]),
                    (((2,), (1,)), ((), ())),            # contract C_out
                    preferred_element_type=jnp.float32)
                acc = term if acc is None else acc + term
        dx_refs[src][0] = acc.astype(dx_refs[src].dtype)


def _specs_3view(nt, block):
    def mk(off):
        def imap(b, i):
            j = i + off
            j = jax.lax.max(0, jax.lax.min(j, nt - 1))
            return (b, j, 0, 0)
        return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)
    return [mk(-1), mk(0), mk(1)]


def _full(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, i: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _prep(x, th):
    """bf16-cast, pad H to a th multiple and W by the 1-column conv halo."""
    b, h, w, c = x.shape
    hp = (h + th - 1) // th * th
    return jnp.pad(_bf(x), ((0, 0), (0, hp - h), (1, 1), (0, 0))), hp


def _fpn_fwd_call(xs, w, s, t, out_dtype=jnp.float32):
    n_src = len(xs)
    b, h, wdt, c = xs[0].shape
    co = w.shape[-1]
    th = _TH
    hp = (h + th - 1) // th * th
    nt = hp // th
    xps = [_prep(x, th)[0] for x in xs]
    in_specs, args = [], []
    for xp in xps:
        in_specs += _specs_3view(nt, (1, th, wdt + 2, c))
        args += [xp, xp, xp]
    in_specs += [_full(w.shape), _full((1, co)), _full((1, co))]
    args += [_bf(w), s.reshape(1, -1), t.reshape(1, -1)]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, h_real=h, w_real=wdt,
                          n_src=n_src),
        grid=(b, nt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, wdt, co), lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wdt, co), out_dtype),
    )(*args)
    return out[:, :h]


def _fpn_bwd_call(dy, out, w, s, n_src, in_dtypes):
    b, h, wdt, co = dy.shape
    c = w.shape[-2]
    th = _TH
    hp = (h + th - 1) // th * th
    nt = hp // th
    dyp = jnp.pad(_bf(dy), ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    outp = jnp.pad(_bf(out), ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    in_specs = (_specs_3view(nt, (1, th, wdt, co)) * 2
                + [_full(w.shape), _full((1, co))])
    args = [dyp, dyp, dyp, outp, outp, outp, _bf(w), s.reshape(1, -1)]
    outsp = [pl.BlockSpec((1, th, wdt, c), lambda bb, i: (bb, i, 0, 0),
                          memory_space=pltpu.VMEM) for _ in range(n_src)]
    dxs = pl.pallas_call(
        functools.partial(_bwd_kernel, th=th, h_real=h, w_real=wdt,
                          n_src=n_src),
        grid=(b, nt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        in_specs=in_specs,
        out_specs=outsp,
        out_shape=[jax.ShapeDtypeStruct((b, hp, wdt, c), dt)
                   for dt in in_dtypes],
    )(*args)
    return tuple(dx[:, :h] for dx in dxs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fpn_concat_conv(xs, w, st, out_dtype=jnp.float32):
    """relu((sum_i conv3x3(xs[i], w[i])) * s + t) without the HBM concat.

    xs: tuple of n (B, H, W, C) maps (the already-upsampled FPN levels);
    w:  (n, 3, 3, C, C_out) per-source weight slices (conv weight
        ``(3,3,n*C,C_out)`` reshaped/transposed);
    st: (s, t) pair of (C_out,) eval-BN fold vectors.
    Differentiable w.r.t. xs only. Matmul numerics = XLA DEFAULT (bf16
    operands, f32 accumulate).
    """
    return _fpn_fwd_call(list(xs), w, st[0], st[1], out_dtype)


def _fcc_fwd(xs, w, st, out_dtype):
    out = _fpn_fwd_call(list(xs), w, st[0], st[1], out_dtype)
    return out, (xs, w, st[0], out)


def _fcc_bwd(out_dtype, res, dy):
    xs, w, s, out = res
    dxs = _fpn_bwd_call(dy, out, w, s, len(xs),
                        [x.dtype for x in xs])
    return dxs, jnp.zeros_like(w), (jnp.zeros_like(s), jnp.zeros_like(s))


fpn_concat_conv.defvjp(_fcc_fwd, _fcc_bwd)

# module-level jit so same-shape call sites share one HLO subcomputation
fpn_concat_conv_shared = jax.jit(fpn_concat_conv, static_argnums=(3,))


def fpn_concat_conv_reference(xs, w, st, out_dtype=jnp.float32):
    """Pure-JAX oracle: concat -> conv3x3 -> affine -> relu."""
    x = jnp.concatenate(xs, axis=-1)
    n, _, _, c, co = w.shape
    wfull = w.transpose(1, 2, 0, 3, 4).reshape(3, 3, n * c, co)
    dn = jax.lax.conv_dimension_numbers(x.shape, wfull.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, wfull, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=dn)
    y = y * st[0] + st[1]
    return jnp.maximum(y, 0.0).astype(out_dtype)
