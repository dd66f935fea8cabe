"""Norm-ball projections for adversarial attacks (vectorized, jittable).

Parity targets: the Linf/L2 projections inlined in the APGD step
(``semseg/attacker.py:396-436``) and the sorting-based L1-ball-with-box
projection ``L1_projection`` (``semseg/attacker.py:55-120``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

Array = jnp.ndarray


def project_linf(x_adv: Array, x: Array, eps) -> Array:
    """Clamp into the Linf eps-ball around x, then into [0, 1]."""
    return jnp.clip(jnp.minimum(jnp.maximum(x_adv, x - eps), x + eps), 0.0, 1.0)


def _l2_norm(d: Array) -> Array:
    """Per-image L2 norm, keepdims (matches autoattack L2_norm)."""
    b = d.shape[0]
    n = jnp.sqrt((d.reshape(b, -1) ** 2).sum(-1) + 0.0)
    return n.reshape((b,) + (1,) * (d.ndim - 1))


def project_l2(x_adv: Array, x: Array, eps) -> Array:
    """Scale into the L2 eps-ball around x, then clamp into [0, 1].

    Parity: ``semseg/attacker.py:414-424`` — clamp happens after rescaling
    (so the result may leave the ball slightly; the reference accepts this).
    """
    d = x_adv - x
    n = _l2_norm(d)
    scaled = x + d / (n + 1e-12) * jnp.minimum(eps, n)
    return jnp.clip(scaled, 0.0, 1.0)


def project_l1_ball_box(x: Array, y: Array, eps1) -> Array:
    """Delta such that ||y + delta||_1 = eps1 and 0 <= x + y + delta <= 1.

    A vectorized re-derivation of the reference's sorting + binary-search
    algorithm (``semseg/attacker.py:55-120``): per coordinate the allowed
    |increase| of |y_i| is bounded above by the box (u) and the allowed
    decrease by -|y_i| (l); the optimal projection moves every coordinate by
    ``clip(alpha, l, u)`` in magnitude where alpha is the dual step found by
    binary search over the sorted breakpoints of the piecewise-linear budget
    function.

    x: ball center (B, ...); y: current perturbation; returns delta with
    y + delta the projected perturbation. If ||y||_1 <= eps1 and y is box
    feasible, delta only fixes box violations (u < 0 coordinates).
    """
    b = x.shape[0]
    xf = x.reshape(b, -1).astype(jnp.float32)
    yf = y.reshape(b, -1).astype(jnp.float32)
    sigma = jnp.sign(yf)
    # u: headroom to *grow* |y_i| inside the box (<= 0 means box violated)
    u = jnp.minimum(1.0 - xf - yf, xf + yf)
    u = jnp.minimum(jnp.zeros_like(yf), u)
    l = -jnp.abs(yf)
    d = u

    bs = jnp.sort(-jnp.concatenate([u, l], axis=1), axis=1)
    indbs = jnp.argsort(-jnp.concatenate([u, l], axis=1), axis=1,
                        stable=True)
    bs2 = jnp.concatenate([bs[:, 1:], jnp.zeros((b, 1), bs.dtype)], axis=1)

    inu = 2.0 * (indbs < u.shape[1]).astype(jnp.float32) - 1.0
    size1 = jnp.cumsum(inu, axis=1)

    s1 = -u.sum(axis=1)
    c = eps1 - jnp.abs(yf).sum(axis=1)
    needs_proj = (s1 + c) < 0  # else current point already feasible enough

    s = s1[:, None] + jnp.cumsum((bs2 - bs) * size1, axis=1)

    # Vectorized binary search over breakpoint index (ceil(log2(2n)) steps).
    n2 = bs.shape[1]
    nitermax = max(1, math.ceil(math.log2(n2)))
    lb = jnp.zeros((b,), jnp.float32)
    ub = jnp.full((b,), float(n2 - 1), jnp.float32)
    for _ in range(nitermax):
        mid = jnp.floor((lb + ub) / 2.0)
        midi = mid.astype(jnp.int32)
        neg = jnp.take_along_axis(s, midi[:, None], axis=1)[:, 0] + c < 0
        lb = jnp.where(neg, mid, lb)
        ub = jnp.where(neg, ub, mid)

    lb2 = lb.astype(jnp.int32)
    s_lb = jnp.take_along_axis(s, lb2[:, None], axis=1)[:, 0]
    size_next = jnp.take_along_axis(
        size1, jnp.minimum(lb2 + 1, n2 - 1)[:, None], axis=1)[:, 0]
    bs2_lb = jnp.take_along_axis(bs2, lb2[:, None], axis=1)[:, 0]
    alpha = (-s_lb - c) / size_next + bs2_lb
    d_proj = -jnp.minimum(jnp.maximum(-u, alpha[:, None]), -l)
    d = jnp.where(needs_proj[:, None], d_proj, d)
    return (sigma * d).reshape(x.shape).astype(x.dtype)
