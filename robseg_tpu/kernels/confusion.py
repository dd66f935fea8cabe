"""Pallas TPU kernel: confusion-matrix accumulation.

Replaces the XLA chunked one-hot matmul (``robseg_tpu/ops/metrics.py``)
with a single kernel that builds both one-hots *in VMEM* per pixel tile and
accumulates ``hist += onehot(t)^T @ onehot(p)`` on the MXU — the (P, K)
one-hot intermediates never touch HBM. The reference computes these
metrics with per-class Python loops on the host
(``semseg/attacker.py:9-52``).

Grid: 1-D over pixel tiles; the (K, K) accumulator lives in a VMEM scratch
that persists across grid steps and is flushed to the output on the last
step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 8192  # pixels per grid step (aligned: 64 sublanes x 128 lanes)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _conf_kernel(pred_ref, target_ref, valid_ref, out_ref, acc_ref, *,
                 num_classes: int, kpad: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = pred_ref[:]      # (TILE,) int32
    t = target_ref[:]
    v = valid_ref[:]

    cls = jax.lax.broadcasted_iota(jnp.int32, (_TILE, kpad), 1)
    oh_p = (p[:, None] == cls).astype(jnp.float32)
    oh_t = ((t[:, None] == cls) & (v[:, None] > 0)).astype(jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        oh_t, oh_p, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_label"))
def confusion_matrix_pallas(pred: jnp.ndarray, target: jnp.ndarray, *,
                            num_classes: int, ignore_label: int = -1
                            ) -> jnp.ndarray:
    """Drop-in for ``ops.metrics.confusion_matrix`` on TPU."""
    p = pred.reshape(-1).astype(jnp.int32)
    t = target.reshape(-1).astype(jnp.int32)
    v = (t != ignore_label).astype(jnp.int32)
    n = p.shape[0]
    pad = (-n) % _TILE
    if pad:
        p = jnp.pad(p, (0, pad))
        t = jnp.pad(t, (0, pad))
        v = jnp.pad(v, (0, pad))
    kpad = _round_up(num_classes, 128)
    grid = p.shape[0] // _TILE

    out = pl.pallas_call(
        functools.partial(_conf_kernel, num_classes=num_classes, kpad=kpad),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kpad, kpad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kpad, kpad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kpad, kpad), jnp.float32)],
    )(p, t, v)
    return out[:num_classes, :num_classes]
