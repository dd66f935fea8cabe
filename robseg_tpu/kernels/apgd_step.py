"""Pallas TPU kernel: fused APGD-Linf update.

One pass over the image buffers computing the reference's two-stage
momentum step (``semseg/attacker.py:395-410``):

    z       = clip(clamp_ball(x_adv + step * sign(grad)))
    x_next  = clip(clamp_ball(x_adv + a*(z - x_adv) + (1-a)*(x_adv - x_old)))

Six (B, H, W, C) tensors stream HBM->VMEM->HBM exactly once; XLA usually
fuses this chain too, but the kernel guarantees a single fused pass (no
intermediate materialization) and halves peak memory traffic of the
elementwise portion of an attack step.

Tiles are (8, 128) over a flattened (B, F) view; per-image scalars
(step_size) ride along a second input indexed by the batch row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 512


def _apgd_linf_kernel(x_ref, xadv_ref, xold_ref, grad_ref, step_ref,
                      eps_ref, a_ref, out_ref):
    x = x_ref[:]
    xadv = xadv_ref[:]
    grad2 = xadv - xold_ref[:]
    eps = eps_ref[0]
    a = a_ref[0]
    step = step_ref[:]  # (rows, 1) per-image step size

    z = xadv + step * jnp.sign(grad_ref[:])
    z = jnp.clip(jnp.minimum(jnp.maximum(z, x - eps), x + eps), 0.0, 1.0)
    y = xadv + (z - xadv) * a + grad2 * (1.0 - a)
    y = jnp.clip(jnp.minimum(jnp.maximum(y, x - eps), x + eps), 0.0, 1.0)
    out_ref[:] = y


@functools.partial(jax.jit, static_argnames=())
def apgd_linf_step_pallas(x, x_adv, x_adv_old, grad, step_size, eps, a):
    """Fused Linf APGD update.

    x, x_adv, x_adv_old, grad: (B, ...) float32; step_size: (B, 1...);
    eps, a: scalars. Returns x_next with the same shape.
    """
    b = x.shape[0]
    f = int(x.size // b)
    pad = (-f) % _LANES
    def flat(t):
        t = t.reshape(b, f)
        if pad:
            t = jnp.pad(t, ((0, 0), (0, pad)))
        return t

    step_col = jnp.broadcast_to(step_size.reshape(b, 1), (b, 1))
    eps_arr = jnp.asarray([eps], jnp.float32).reshape(1)
    a_arr = jnp.asarray([a], jnp.float32).reshape(1)

    cols = f + pad
    grid = (cols // _LANES,)
    spec = pl.BlockSpec((b, _LANES), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _apgd_linf_kernel,
        grid=grid,
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((b, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, cols), jnp.float32),
    )(flat(x), flat(x_adv), flat(x_adv_old), flat(grad), step_col,
      eps_arr, a_arr)
    if pad:
        out = out[:, :f]
    return out.reshape(x.shape)
