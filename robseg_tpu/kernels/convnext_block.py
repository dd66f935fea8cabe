"""Pallas TPU kernel: the ENTIRE ConvNeXt block in one VMEM pass.

    out = x + gamma * MLP(LN(dwconv7x7(x)))          (deterministic mode)

Parity target: the reference block ``semseg/models/backbones/
convnext_orig.py:41-85`` (dwconv -> permute -> LN -> pwconv1 -> GELU ->
pwconv2 -> gamma -> permute -> droppath -> residual), with droppath an
identity (attack/eval use only — like the MLP-tail kernels, parameters are
constants and the custom VJP produces input gradients only).

Why a whole-block kernel: BENCHMARKS.md shows the MLP-tail-only fusion
loses the attack path to XLA *regardless of backward strategy or MXU
precision* because it cuts each block into three XLA/Mosaic regions whose
boundaries force dwconv-out / branch-out to materialize in HBM. Here the
only HBM traffic per block is: read x (+row halos), write out — nothing
else; the 4x hidden, the dwconv output and the LN statistics never leave
VMEM in either direction (the backward *recomputes* them from the x halo
band it already fetched, so no residual tensor is stored at all).

TPU mapping
  * grid = (batch, H/TH) row-tiles; channels-last (C = lanes, W =
    sublanes); the 7x7 depthwise conv runs on the VPU as 49 shifted
    fused multiply-adds entirely in VMEM.
  * Row halos WITHOUT manual DMA: x (and in the backward, dy) are passed
    three times with block index maps i-1 / i / i+1 (edge-clamped).
    Mosaic pipelines the fetches; rows whose *global* index falls outside
    [0, H) are masked to zero in-kernel, which reproduces the conv's zero
    padding exactly.
  * Column halos: a one-time XLA pre-pad of 3 zero columns each side
    (exactly the conv's W padding).
  * Matmuls truncate operands to bf16 = XLA DEFAULT precision numerics
    (f32 accumulate); LN/GELU/dwconv arithmetic is f32.
  * TH (row-tile height) is sized per channel width so tiles + both
    weight panels + the (TH+6)-row backward band fit the ~16 MB VMEM.

The backward recomputes dwconv+LN+h on the (TH+6)-row halo band (the
per-token chains of neighbour tiles' rows are needed to propagate through
the 7x7 stencil), a (TH+6)/TH matmul overcompute, then closes the stencil
with a 7x7 correlation against the flipped filters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robseg_tpu.kernels.convnext_mlp import _erf

# preferred row-tile height (VMEM-budgeted; backward band needs th >= 6
# because the 3-view span must cover the double halo)
_TH_PREF = 16


def _pick_th(h: int) -> int:
    """Tile height for an H-row feature map: the divisor of h in [6, 32]
    closest to the preferred 16 (zero pad waste — e.g. VOC geometry's
    119 rows -> th=17, 60 rows -> th=15), else 16 with masked padding.

    ``ROBSEG_BLOCK_TH`` (trace-time env var) overrides the choice for
    tile-height experiments (tools/bench_train.py --block_th). It is read
    at TRACE time and jit caches do NOT key on env vars — set it before
    the first trace of a given shape; changing it mid-process reuses the
    stale compiled kernel (bench tools spawn a fresh process per value)."""
    import os
    override = os.environ.get("ROBSEG_BLOCK_TH")
    if override:
        th = int(override)
        if not 6 <= th <= 32:
            raise ValueError(
                f"ROBSEG_BLOCK_TH={th} out of range [6, 32] (backward band "
                f"needs th >= 6; > 32 blows the VMEM budget)")
        return th
    best = None
    for th in range(6, 33):
        if h % th == 0:
            if best is None or abs(th - _TH_PREF) < abs(best - _TH_PREF):
                best = th
    return best if best is not None else _TH_PREF


def _bf(a):
    return a.astype(jnp.bfloat16)


def _assemble_rows(prev, cur, nxt, i, th: int, h_real: int):
    """Concat the three row views and zero rows outside the global image.

    Returns a (3*th, W, C) f32 buffer whose row k holds global row
    (i-1)*th + k, zeros where that row is outside [0, h_real).
    """
    buf = jnp.concatenate([prev[0], cur[0], nxt[0]], axis=0)
    g0 = (i - 1) * th
    # row-validity as a (rows, 1, 1) broadcast — a full-shape iota/where
    # materializes multi-MB temporaries on the VMEM stack
    rows = jax.lax.broadcasted_iota(jnp.int32, (buf.shape[0], 1, 1), 0) + g0
    valid = ((rows >= 0) & (rows < h_real)).astype(jnp.float32)
    return buf.astype(jnp.float32) * valid  # f32 internal math (bf16 I/O ok)


def _dwconv(xb, dw_ref, rows_out: int, w_out: int, r0: int):
    """7x7 depthwise conv on the VPU via 49 shifted FMAs.

    xb: (3*th, Wp, C) assembled rows (Wp = W + 6 zero-padded columns);
    output rows r0 .. r0+rows_out (buffer coordinates), cols 0..w_out.
    """
    acc = None
    for ky in range(7):
        for kx in range(7):
            sl = xb[r0 + ky - 3:r0 + ky - 3 + rows_out,
                    kx:kx + w_out, :]
            term = sl * dw_ref[ky, kx][None, None, :].astype(jnp.float32)
            acc = term if acc is None else acc + term
    return acc


def _fwd_kernel(xp_prev, xp_cur, xp_next, dw_ref, dwb_ref, ls_ref, lb_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, g_ref, out_ref, *,
                th: int, h_real: int, w_real: int):
    i = pl.program_id(1)
    xb = _assemble_rows(xp_prev, xp_cur, xp_next, i, th, h_real)
    f32 = lambda r: r[0].astype(jnp.float32)                    # noqa: E731
    y = _dwconv(xb, dw_ref, th, w_real, th) + f32(dwb_ref)[None, None, :]
    c = y.shape[-1]
    t = y.reshape(th * w_real, c)
    mean = t.mean(-1, keepdims=True)
    d = t - mean
    var = (d * d).mean(-1, keepdims=True)
    u = d * jax.lax.rsqrt(var + 1e-6) * f32(ls_ref) + f32(lb_ref)
    h = jnp.dot(_bf(u), _bf(w1_ref[:]),
                preferred_element_type=jnp.float32) + f32(b1_ref)
    a = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    m = jnp.dot(_bf(a), _bf(w2_ref[:]),
                preferred_element_type=jnp.float32) + f32(b2_ref)
    branch = (f32(g_ref) * m).reshape(th, w_real, c)
    out_ref[0] = (xb[th:2 * th, 3:3 + w_real, :]
                  + branch).astype(out_ref.dtype)


def _bwd_kernel(xp_prev, xp_cur, xp_next, dy_prev, dy_cur, dy_next,
                dw_ref, dwb_ref, ls_ref, lb_ref, w1_ref, b1_ref,
                w2_ref, g_ref, dx_ref, *,
                th: int, h_real: int, w_real: int):
    """Input gradient of the whole block.

    dx = dy + corr7x7(LNbwd(W1^T (gelu'(h) . (W2^T (gamma . dy)))), dw)
    computed on the (th+6)-row halo band so the stencil closes; h and the
    LN statistics are recomputed from the x band (no saved residuals).
    """
    i = pl.program_id(1)
    xb = _assemble_rows(xp_prev, xp_cur, xp_next, i, th, h_real)
    dyb = _assemble_rows(dy_prev, dy_cur, dy_next, i, th, h_real)

    f32 = lambda r: r[0].astype(jnp.float32)                    # noqa: E731
    band, r0 = th + 6, th - 3
    y = _dwconv(xb, dw_ref, band, w_real, r0) + f32(dwb_ref)[None, None, :]
    c = y.shape[-1]
    t = y.reshape(band * w_real, c)
    mean = t.mean(-1, keepdims=True)
    d = t - mean
    var = (d * d).mean(-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-6)
    xhat = d * inv
    u = xhat * f32(ls_ref) + f32(lb_ref)
    gm = (dyb[r0:r0 + band, :w_real, :] * f32(g_ref)[None, None, :]
          ).reshape(band * w_real, c)

    # hid-chunked chain: per chunk k, h_k / gelu'_k / da_k / dh_k are
    # computed and immediately reduced into du — caps the live
    # (tokens, hid) temporaries that otherwise blow the VMEM stack
    hid = w1_ref.shape[1]
    chunk = 128  # small live temps; (tokens,128) still a full MXU tile
    sq2 = 0.7071067811865476
    ub = _bf(u)
    gmb = _bf(gm)
    du = None
    for k in range(0, hid, chunk):
        w1k = w1_ref[:, k:k + chunk]
        h = (jnp.dot(ub, _bf(w1k), preferred_element_type=jnp.float32)
             + b1_ref[0, k:k + chunk].astype(jnp.float32))
        da = jnp.dot(gmb, _bf(w2_ref[k:k + chunk, :].T),
                     preferred_element_type=jnp.float32)
        cdf = 0.5 * (1.0 + _erf(h * sq2))
        pdf = 0.3989422804014327 * jnp.exp(-0.5 * h * h)
        dh = da * (cdf + h * pdf)
        dk = jnp.dot(_bf(dh), _bf(w1k.T),
                     preferred_element_type=jnp.float32)
        du = dk if du is None else du + dk
    dxhat = du * f32(ls_ref)[None, :]
    s1 = dxhat.mean(-1, keepdims=True)
    s2 = (dxhat * xhat).mean(-1, keepdims=True)
    dyconv = (inv * (dxhat - s1 - xhat * s2)).reshape(band, w_real, c)

    # grad rows outside the global image are zero (no tokens there)
    g0 = (i - 1) * th + r0
    rows = jax.lax.broadcasted_iota(jnp.int32, (dyconv.shape[0], 1, 1),
                                    0) + g0
    dyconv = dyconv * ((rows >= 0) & (rows < h_real)).astype(dyconv.dtype)

    # correlate with the flipped kernel: dx[r,w] = sum_k dyconv[r+3-ky,
    # w+3-kx] * dw[ky,kx]  — pad cols by 3 (zero grad outside the image)
    dpad = jnp.pad(dyconv, ((0, 0), (3, 3), (0, 0)))
    acc = None
    for ky in range(7):
        for kx in range(7):
            sl = dpad[6 - ky:6 - ky + th, 6 - kx:6 - kx + w_real, :]
            term = sl * dw_ref[ky, kx][None, None, :].astype(jnp.float32)
            acc = term if acc is None else acc + term
    dx_ref[0] = (dyb[th:2 * th, :w_real, :] + acc).astype(dx_ref.dtype)


def _fwd_kernel_whole(xp_ref, dw_ref, dwb_ref, ls_ref, lb_ref, w1_ref,
                      b1_ref, w2_ref, b2_ref, g_ref, out_ref, *,
                      h_real: int, w_real: int):
    """Whole-image variant (small-spatial stages): the full (H+6, W+6)
    zero-padded image sits in VMEM, so there are no halo views, no row
    masking, and the backward recomputes with ZERO overcompute — the
    (th+6)/th band tax that made tiled stage-2 fusion a net loss
    (BENCHMARKS.md round-2) does not exist here."""
    xb = xp_ref[0].astype(jnp.float32)              # (H+6, W+6, C)
    f32 = lambda r: r[0].astype(jnp.float32)                    # noqa: E731
    y = _dwconv(xb, dw_ref, h_real, w_real, 3) + f32(dwb_ref)[None, None, :]
    c = y.shape[-1]
    t = y.reshape(h_real * w_real, c)
    mean = t.mean(-1, keepdims=True)
    d = t - mean
    var = (d * d).mean(-1, keepdims=True)
    u = d * jax.lax.rsqrt(var + 1e-6) * f32(ls_ref) + f32(lb_ref)
    h = jnp.dot(_bf(u), _bf(w1_ref[:]),
                preferred_element_type=jnp.float32) + f32(b1_ref)
    a = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    m = jnp.dot(_bf(a), _bf(w2_ref[:]),
                preferred_element_type=jnp.float32) + f32(b2_ref)
    branch = (f32(g_ref) * m).reshape(h_real, w_real, c)
    out_ref[0] = (xb[3:3 + h_real, 3:3 + w_real, :]
                  + branch).astype(out_ref.dtype)


def _bwd_kernel_whole(xp_ref, dy_ref, dw_ref, dwb_ref, ls_ref, lb_ref,
                      w1_ref, b1_ref, w2_ref, g_ref, dx_ref, *,
                      h_real: int, w_real: int):
    """Input gradient, whole image in VMEM: recompute dwconv/LN/h on
    exactly the H x W tokens (no halo band), then close the 7x7 stencil
    with the flipped-filter correlation over a 3-row/3-col zero pad."""
    xb = xp_ref[0].astype(jnp.float32)
    dyb = dy_ref[0].astype(jnp.float32)             # (H, W, C)
    f32 = lambda r: r[0].astype(jnp.float32)                    # noqa: E731
    y = _dwconv(xb, dw_ref, h_real, w_real, 3) + f32(dwb_ref)[None, None, :]
    c = y.shape[-1]
    t = y.reshape(h_real * w_real, c)
    mean = t.mean(-1, keepdims=True)
    d = t - mean
    var = (d * d).mean(-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-6)
    xhat = d * inv
    u = xhat * f32(ls_ref) + f32(lb_ref)
    gm = (dyb * f32(g_ref)[None, None, :]).reshape(h_real * w_real, c)

    hid = w1_ref.shape[1]
    chunk = 128
    sq2 = 0.7071067811865476
    ub = _bf(u)
    gmb = _bf(gm)
    du = None
    for k in range(0, hid, chunk):
        w1k = w1_ref[:, k:k + chunk]
        h = (jnp.dot(ub, _bf(w1k), preferred_element_type=jnp.float32)
             + b1_ref[0, k:k + chunk].astype(jnp.float32))
        da = jnp.dot(gmb, _bf(w2_ref[k:k + chunk, :].T),
                     preferred_element_type=jnp.float32)
        cdf = 0.5 * (1.0 + _erf(h * sq2))
        pdf = 0.3989422804014327 * jnp.exp(-0.5 * h * h)
        dh = da * (cdf + h * pdf)
        dk = jnp.dot(_bf(dh), _bf(w1k.T),
                     preferred_element_type=jnp.float32)
        du = dk if du is None else du + dk
    dxhat = du * f32(ls_ref)[None, :]
    s1 = dxhat.mean(-1, keepdims=True)
    s2 = (dxhat * xhat).mean(-1, keepdims=True)
    dyconv = (inv * (dxhat - s1 - xhat * s2)).reshape(h_real, w_real, c)

    dpad = jnp.pad(dyconv, ((3, 3), (3, 3), (0, 0)))
    acc = None
    for ky in range(7):
        for kx in range(7):
            sl = dpad[6 - ky:6 - ky + h_real, 6 - kx:6 - kx + w_real, :]
            term = sl * dw_ref[ky, kx][None, None, :].astype(jnp.float32)
            acc = term if acc is None else acc + term
    dx_ref[0] = (dyb + acc).astype(dx_ref.dtype)


def _pad8(n: int) -> int:
    return (n + 7) // 8 * 8


def _block_whole_fwd_call(x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma):
    """Whole-image call; H/W are zero-padded up to sublane multiples (8).

    Exact: pad tokens are inert — the 7x7 dwconv's zero pad rows ARE the
    conv's own padding semantics for real tokens, and LN/MLP are
    token-local so garbage pad tokens never touch real ones (profiled:
    misaligned 30^2/15^2 spatials ran ~1.9x slower per pixel than padded
    32^2/16^2)."""
    b, h, w, c = x.shape
    hp, wp = _pad8(h), _pad8(w)
    xp = jnp.pad(x, ((0, 0), (3, 3 + hp - h), (3, 3 + wp - w), (0, 0)))
    hid = w1.shape[1]
    vb = lambda r: _full1((1, r))                               # noqa: E731
    w1, w2 = _bf(w1), _bf(w2)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_whole, h_real=hp, w_real=wp),
        grid=(b,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[pl.BlockSpec((1, hp + 6, wp + 6, c),
                               lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  _full1((7, 7, c)), vb(c), vb(c), vb(c),
                  _full1((c, hid)), vb(hid), _full1((hid, c)), vb(c), vb(c)],
        out_specs=pl.BlockSpec((1, hp, wp, c), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), x.dtype),
    )(xp, dw, *_vecs(dwb, ls, lb), w1, *_vecs(b1), w2, *_vecs(b2, gamma))
    return out[:, :h, :w]


def _block_whole_bwd_call(x, dy, dw, dwb, ls, lb, w1, b1, w2, gamma):
    b, h, w, c = x.shape
    hp, wp = _pad8(h), _pad8(w)
    xp = jnp.pad(x, ((0, 0), (3, 3 + hp - h), (3, 3 + wp - w), (0, 0)))
    # zero dy on pad tokens => their dyconv is zero => they contribute
    # nothing to the 7x7 correlation: exact
    dyp = jnp.pad(dy, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    hid = w1.shape[1]
    vb = lambda r: _full1((1, r))                               # noqa: E731
    w1, w2 = _bf(w1), _bf(w2)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel_whole, h_real=hp, w_real=wp),
        grid=(b,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[pl.BlockSpec((1, hp + 6, wp + 6, c),
                               lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, hp, wp, c), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  _full1((7, 7, c)), vb(c), vb(c), vb(c),
                  _full1((c, hid)), vb(hid), _full1((hid, c)), vb(c)],
        out_specs=pl.BlockSpec((1, hp, wp, c), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), x.dtype),
    )(xp, dyp, dw, *_vecs(dwb, ls, lb), w1, *_vecs(b1), w2, *_vecs(gamma))
    return dx[:, :h, :w]


@jax.custom_vjp
def convnext_block_fused_whole(x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma):
    """Whole-image ConvNeXt block kernel for small-spatial stages (the
    full zero-padded image per batch element lives in VMEM). Same
    contract as ``convnext_block_fused``; input gradients only."""
    return _block_whole_fwd_call(x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma)


def _cbfw_fwd(x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma):
    out = _block_whole_fwd_call(x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma)
    return out, (x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma)


def _cbfw_bwd(res, dy):
    x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma = res
    dx = _block_whole_bwd_call(x, dy, dw, dwb, ls, lb, w1, b1, w2, gamma)
    z = lambda v: jnp.zeros_like(v)                             # noqa: E731
    return (dx, z(dw), z(dwb), z(ls), z(lb), z(w1), z(b1), z(w2),
            z(b2), z(gamma))


convnext_block_fused_whole.defvjp(_cbfw_fwd, _cbfw_bwd)

convnext_block_fused_whole_shared = jax.jit(convnext_block_fused_whole)


def _full1(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _specs_3view(nt, block):
    """Three BlockSpecs selecting row-tiles i-1 / i / i+1 (edge-clamped)."""
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
    """Pad H to a th multiple and W by the 3-column conv halo."""
    b, h, w, c = x.shape
    hp = (h + th - 1) // th * th
    return jnp.pad(x, ((0, 0), (0, hp - h), (3, 3), (0, 0))), hp


def _vecs(*vs):
    return [v.reshape(1, -1) for v in vs]


def _block_fwd_call(x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma):
    b, h, w, c = x.shape
    th = _pick_th(h)
    xp, hp_ = _prep(x, th)
    nt = hp_ // th
    hid = w1.shape[1]
    vb = lambda r: _full((1, r))                                # noqa: E731
    w1, w2 = _bf(w1), _bf(w2)  # bf16 weight panels: half the VMEM, same
    out = pl.pallas_call(       # numerics (kernel dots truncate anyway)
        functools.partial(_fwd_kernel, th=th, h_real=h, w_real=w),
        grid=(b, nt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[*_specs_3view(nt, (1, th, w + 6, c)),
                  _full((7, 7, c)), vb(c), vb(c), vb(c),
                  _full((c, hid)), vb(hid), _full((hid, c)), vb(c), vb(c)],
        out_specs=pl.BlockSpec((1, th, w, c), lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp_, w, c), x.dtype),
    )(xp, xp, xp, dw, *_vecs(dwb, ls, lb), w1, *_vecs(b1), w2,
      *_vecs(b2, gamma))
    return out[:, :h]


def _block_bwd_call(x, dy, dw, dwb, ls, lb, w1, b1, w2, gamma):
    b, h, w, c = x.shape
    th = _pick_th(h)
    xp, hp_ = _prep(x, th)
    nt = hp_ // th
    hid = w1.shape[1]
    dyp = jnp.pad(dy, ((0, 0), (0, hp_ - h), (0, 0), (0, 0)))
    vb = lambda r: _full((1, r))                                # noqa: E731
    w1, w2 = _bf(w1), _bf(w2)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, th=th, h_real=h, w_real=w),
        grid=(b, nt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[*_specs_3view(nt, (1, th, w + 6, c)),
                  *_specs_3view(nt, (1, th, w, c)),
                  _full((7, 7, c)), vb(c), vb(c), vb(c),
                  _full((c, hid)), vb(hid), _full((hid, c)), vb(c)],
        out_specs=pl.BlockSpec((1, th, w, c), lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp_, w, c), x.dtype),
    )(xp, xp, xp, dyp, dyp, dyp, dw, *_vecs(dwb, ls, lb), w1,
      *_vecs(b1), w2, *_vecs(gamma))
    return dx[:, :h]


@jax.custom_vjp
def convnext_block_fused(x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma):
    """out = x + gamma*MLP(LN(dwconv7x7(x))) — one Pallas pass per row
    tile; differentiable w.r.t. x ONLY (params are attack-time constants).

    dw: (7, 7, C) depthwise filters (HWC layout, one filter per channel);
    dwb: (C,) conv bias; remaining args as in ``convnext_mlp_fused``.
    """
    return _block_fwd_call(x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma)


def _cbf_fwd(x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma):
    out = _block_fwd_call(x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma)
    return out, (x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma)


def _cbf_bwd(res, dy):
    x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma = res
    dx = _block_bwd_call(x, dy, dw, dwb, ls, lb, w1, b1, w2, gamma)
    z = lambda v: jnp.zeros_like(v)                             # noqa: E731
    # b2's cotangent uses b2's own shape/dtype (inputs and params may
    # legitimately differ in dtype, e.g. f32 images through bf16 params)
    return (dx, z(dw), z(dwb), z(ls), z(lb), z(w1), z(b1), z(w2),
            z(b2), z(gamma))


convnext_block_fused.defvjp(_cbf_fwd, _cbf_bwd)

# module-level jit so same-shape call sites share one HLO subcomputation
convnext_block_fused_shared = jax.jit(convnext_block_fused)


def convnext_block_reference(x, dw, dwb, ls, lb, w1, b1, w2, b2, gamma):
    """Pure-JAX whole block (parity oracle; XLA-DEFAULT matmul numerics
    when run on TPU, exact f32 under pinned-f32 test config)."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, dw.reshape(7, 7, 1, c), (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, (7, 7, 1, c), ("NHWC", "HWIO", "NHWC")),
        feature_group_count=c) + dwb
    mean = y.mean(-1, keepdims=True)
    var = ((y - mean) ** 2).mean(-1, keepdims=True)
    u = (y - mean) * jax.lax.rsqrt(var + 1e-6) * ls + lb
    h = u @ w1 + b1
    a = jax.nn.gelu(h, approximate=False)
    return x + gamma * (a @ w2 + b2)
