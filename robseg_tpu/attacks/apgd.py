"""APGD for semantic segmentation as a single fused XLA program.

Behavioral parity target: ``semseg/attacker.py:260-571`` (``apgd_train``),
``:574-659`` (``apgd_restarts``), ``:662-728`` (``apgd_largereps``). Every
step runs one fused forward + input-gradient + momentum sign-step +
projection; all the reference's data-dependent per-image bookkeeping
(best-point tracking, step-size halving on oscillation, plateau resets,
early stop) is recast as masked vectorized updates carried through a
``lax.while_loop`` — the host never sees an intermediate tensor.

Semantics notes (deliberate, verified against the reference):
  * the reference re-evaluates a tracking loss ("ce-avg" for SEA) per step
    and uses it — not the attack loss — for best-point/step-size logic
    (``attacker.py:357-361, 472-475``);
  * ignored pixels count as *correct* in the per-image accuracy used to pick
    ``x_best_adv`` (``attacker.py:489``) but not in the very first accuracy
    (``attacker.py:370-371``);
  * ``check_oscillation`` reads a window of the loss history with torch's
    negative-index wraparound at the first check (``attacker.py:243-248``) —
    reproduced via modular indexing;
  * early stop exits when no image has a correct pixel left
    (``attacker.py:568-569``); with best-point tracking this never changes
    the returned tensors, only the step count, so the while_loop exit is
    exact parity.
"""

from __future__ import annotations

import functools
import weakref
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from robseg_tpu.ops.losses import (ATTACK_CRITERIA, pixel_to_img_loss)
from robseg_tpu.ops.projections import (project_l1_ball_box, project_linf,
                                        project_l2, _l2_norm)

Array = jnp.ndarray


class APGDResult(NamedTuple):
    x_best: Array        # best-tracking-loss points
    acc: Array           # per-image pixel accuracy of best adv found
    loss_best: Array     # per-image best tracking loss
    x_best_adv: Array    # lowest-pixel-accuracy points (the SEA output)


class _State(NamedTuple):
    i: Array
    x_adv: Array
    x_adv_old: Array
    grad: Array
    x_best: Array
    grad_best: Array
    x_best_adv: Array
    pred_best: Array
    loss_best: Array
    loss_best_last_check: Array
    reduced_last_check: Array
    acc: Array
    step_size: Array
    counter3: Array
    k: Array
    loss_steps: Array
    topk: Array       # L1 only
    sp_old: Array     # L1 only


def _per_image_acc(logits: Array, y: Array, ignore_index: int,
                   count_ignored_correct: bool) -> Array:
    pred = jnp.argmax(logits, axis=-1) == y
    if count_ignored_correct:
        pred = pred | (y == ignore_index)
    b = pred.shape[0]
    return pred.reshape(b, -1).mean(-1, dtype=jnp.float32)


def _bimg(v: Array, ndims: int) -> Array:
    """(B,) -> (B, 1, 1, 1) broadcast helper."""
    return v.reshape(v.shape + (1,) * ndims)


def _apgd_ctrl(norm: str, n_iter: int):
    """Step-size-controller constants as runtime scalars (the reference's
    exact int()-of-float arithmetic, ``attacker.py:323-337``)."""
    if norm in ("Linf", "L2"):
        ctrl = dict(
            n_iter=n_iter,
            n_iter_2=max(int(0.22 * n_iter), 1),
            n_iter_min=max(int(0.06 * n_iter), 1),
            size_decr=max(int(0.03 * n_iter), 1),
        )
        ctrl["k0"] = ctrl["n_iter_2"]
    elif norm == "L1":
        ctrl = dict(n_iter=n_iter, n_iter_2=1, n_iter_min=1, size_decr=1,
                    k0=max(int(0.04 * n_iter), 1))
    else:
        raise ValueError(norm)
    return {k: jnp.asarray(v, jnp.int32) for k, v in ctrl.items()}


_CLOSURE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def closure_to_args(logits_fn: Callable, *example: Array):
    """Hoist ``logits_fn``'s closed-over arrays into explicit jit arguments.

    A model closure (``lambda x: module.apply(variables, x)``) embeds the
    checkpoint as CONSTANTS in every jit that takes ``logits_fn`` static:
    the compiled executable is checkpoint-specific (each new checkpoint
    recompiles from scratch — the persistent XLA cache can never hit
    because the weight bytes are part of the HLO), and XLA constant-folds
    the folded weights' layout transposes at compile time — pathological
    for the f64 CPU differential tests (>1h single-core, round-5).
    ``jax.closure_convert`` re-expresses the closure as ``fn(x, *consts)``
    with the weights as ordinary traced arguments: the HLO becomes
    checkpoint-independent (byte-identical across checkpoints of the same
    architecture, so the persistent compile cache hits) and nothing is
    folded.

    Returns ``(fn, consts)``. Falls back to ``(logits_fn, ())`` when the
    hoisted consts are tracers (the caller sits inside another trace, e.g.
    a ``shard_map``'d train step — caching would leak the tracers) or the
    callable cannot be weak-referenced. Cached per
    ``(logits_fn, input avals)`` so repeated per-batch calls reuse ONE
    converted function object, keeping the downstream jit cache warm.
    """
    avals = tuple((tuple(a.shape), str(a.dtype)) for a in example)
    try:
        per_fn = _CLOSURE_CACHE.setdefault(logits_fn, {})
    except TypeError:
        per_fn = None
    if per_fn is not None and avals in per_fn:
        return per_fn[avals]
    # NOTE: jax.closure_convert is NOT usable here — it only hoists consts
    # that "may be perturbed" (tracers), deliberately leaving concrete
    # arrays embedded (custom_vjp semantics). We want the opposite: every
    # checkpoint-derived byte OUT of the HLO. So trace to a jaxpr and
    # hoist every FLOAT const (all weight tensors, of any dtype/size —
    # a single embedded LN scale would already make the HLO
    # checkpoint-specific); int/bool consts (index maps, iotas) are
    # checkpoint-independent and stay embedded, where XLA can fold them.
    closed = jax.make_jaxpr(logits_fn)(*example)
    consts = closed.consts
    if any(isinstance(c, jax.core.Tracer) for c in consts):
        return logits_fn, ()
    is_hoisted = [hasattr(c, "dtype")
                  and jnp.issubdtype(c.dtype, jnp.floating)
                  for c in consts]
    hoisted = [c for c, h in zip(consts, is_hoisted) if h]
    embedded = [c for c, h in zip(consts, is_hoisted) if not h]
    jaxpr = closed.jaxpr
    n_ex = len(example)

    def fn(*args):
        ex, hoist = args[:n_ex], iter(args[n_ex:])
        emb = iter(embedded)
        full = [next(hoist) if h else next(emb) for h in is_hoisted]
        out = jax.core.eval_jaxpr(jaxpr, full, *ex)
        return out[0] if len(out) == 1 else tuple(out)

    result = (fn, tuple(hoisted))
    if per_fn is not None:
        per_fn[avals] = result
    return result


def make_sharded_apgd(logits_fn: Callable, mesh, *, norm: str = "Linf",
                      loss: str, track_loss: Optional[str] = None,
                      early_stop: bool = False, ignore_index: int = -1,
                      n_iter_buf: int, weights: Optional[Array] = None,
                      axis_name: str = "data") -> Callable:
    """One jitted ``shard_map`` APGD-core executable over the batch axis.

    Per-device the program is the SAME ``_apgd_core`` graph the single-chip
    path compiles (phase length / eps / warm-start remain runtime scalars,
    so one executable serves all ``apgd_largereps`` phases), plus a
    ``psum``-reduced early stop. Pallas kernels inside ``logits_fn``
    execute per device — the composition jit auto-partitioning cannot do.

    Returns ``phase(x, y, x_init, use_init, eps, n_iter) -> APGDResult``
    with x/y/x_init batch-sharded. Random start is NOT drawn here (no rng
    per shard — hoist it, see ``sea._make_attack_fn``).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    dummy_rng = jax.random.PRNGKey(0)  # use_rs=False: never consumed
    n_dev = mesh.shape[axis_name]

    def per_dev(x, y, x_init, use_init, eps, ctrl, fn_consts):
        return _apgd_core(
            per_dev.fn, x, y, x_init, use_init, eps, ctrl, weights,
            dummy_rng, None, fn_consts, norm=norm, use_rs=False, loss=loss,
            track_loss=track_loss, early_stop=early_stop, is_train=False,
            ignore_index=ignore_index, n_iter_buf=int(n_iter_buf),
            axis_name=axis_name if early_stop else None)

    b = P(axis_name)
    sharded = jax.jit(shard_map(
        per_dev, mesh=mesh,
        in_specs=(b, b, b, P(), P(), P(), P()),
        out_specs=APGDResult(b, b, b, b), check_vma=False))

    def phase(x, y, x_init, use_init: bool, eps: float, n_iter: int
              ) -> APGDResult:
        assert n_iter <= n_iter_buf
        # hoist the checkpoint out of the per-device graph too (replicated
        # traced args): the per-device program stays BYTE-identical to the
        # single-chip _apgd_core executable, and the sharded compile gets
        # the same checkpoint-independent persistent-cache behavior. The
        # conversion example uses the PER-DEVICE shapes shard_map hands to
        # per_dev.
        per_shape = (x.shape[0] // n_dev,) + tuple(x.shape[1:])
        fn, consts = closure_to_args(
            logits_fn, jax.ShapeDtypeStruct(per_shape, x.dtype))
        per_dev.fn = fn  # static: same object per (logits_fn, shape) cache
        return sharded(x, y, x_init, jnp.asarray(use_init),
                       jnp.asarray(eps, jnp.float32),
                       _apgd_ctrl(norm, n_iter), tuple(consts))

    return phase


def apgd_attack(logits_fn: Callable, x: Array, y: Array, *,
                norm: str = "Linf", eps: float, n_iter: int = 10,
                use_rs: bool = False, loss: str = "ce",
                track_loss: Optional[str] = None, early_stop: bool = False,
                is_train: bool = False, ignore_index: int = -1,
                weights: Optional[Array] = None, rng: Optional[Array] = None,
                x_init: Optional[Array] = None,
                y_target: Optional[Array] = None,
                n_iter_buf: Optional[int] = None,
                axis_name: Optional[str] = None) -> APGDResult:
    """One APGD run; parity ``apgd_train`` (``semseg/attacker.py:260-571``).

    ``n_iter`` is a *runtime* value: the step-size controller constants are
    computed here with the reference's exact Python float semantics
    (``attacker.py:323-337``) and fed to the compiled core as scalars, so
    different phase lengths (e.g. the 90/90/120 split of ``apgd_largereps``
    at n_iter=300) reuse ONE executable. ``n_iter_buf`` sizes the loss
    history buffer (defaults to n_iter; pass the max across phases).
    """
    assert ignore_index == -1, "Only ignore_index = -1 is supported."
    if n_iter_buf is None:
        n_iter_buf = n_iter
    assert n_iter <= n_iter_buf
    ctrl_arr = _apgd_ctrl(norm, n_iter)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    use_init = x_init is not None
    if x_init is None:
        x_init = x
    # checkpoint-independent executable: weights ride as traced args, not
    # HLO constants (see closure_to_args)
    logits_fn, consts = closure_to_args(logits_fn, x)
    return _apgd_core(
        logits_fn, x, y, x_init, jnp.asarray(use_init),
        jnp.asarray(eps, jnp.float32), ctrl_arr,
        weights if weights is not None else None, rng, y_target,
        tuple(consts),
        norm=norm, use_rs=use_rs, loss=loss,
        track_loss=track_loss, early_stop=early_stop, is_train=is_train,
        ignore_index=ignore_index, n_iter_buf=int(n_iter_buf),
        axis_name=axis_name)


@functools.partial(
    jax.jit,
    static_argnames=("logits_fn", "norm", "use_rs", "loss", "track_loss",
                     "early_stop", "is_train", "ignore_index", "n_iter_buf",
                     "axis_name"))
def _apgd_core(logits_fn: Callable, x: Array, y: Array, x_init: Array,
               use_init: Array, eps: Array, ctrl, weights, rng, y_target,
               consts=(), *,
               norm: str, use_rs: bool, loss: str,
               track_loss: Optional[str], early_stop: bool, is_train: bool,
               ignore_index: int, n_iter_buf: int,
               axis_name: Optional[str] = None) -> APGDResult:
    if consts:  # closure_to_args form: fn(x, *weights)
        _base_fn = logits_fn
        logits_fn = lambda z: _base_fn(z, *consts)  # noqa: E731
    bs = x.shape[0]
    ndims = x.ndim - 1
    n_fts = int(x.size // bs)
    criterion = ATTACK_CRITERIA[loss]
    track_fn = ATTACK_CRITERIA[track_loss or loss]
    n_iter = ctrl["n_iter"]

    mask_background = (y != ignore_index).astype(jnp.float32)

    # --- init point -------------------------------------------------------
    if use_rs:
        if norm != "Linf":
            raise NotImplementedError("random start only for Linf (parity)")
        t = 2.0 * jax.random.uniform(rng, x.shape, x.dtype) - 1.0
        x_start = jnp.clip(x + eps * t, 0.0, 1.0)
    else:
        x_start = x
    x_adv = jnp.where(use_init, x_init, x_start)
    x_adv = jnp.clip(x_adv, 0.0, 1.0)

    # --- hyper-parameters (attacker.py:322-339) ---------------------------
    if norm in ("Linf", "L2"):
        thr_decr = 0.75
        alpha = 2.0
        k_max = max(int(0.22 * n_iter_buf), 1)
    else:  # L1
        k_max = max(int(0.04 * n_iter_buf), 1)
        init_topk = 0.05 if is_train else 0.2
        adasp_redstep, adasp_minstep = 1.5, 10.0
        alpha = 1.0
    n_iter_min = ctrl["n_iter_min"]
    size_decr = ctrl["size_decr"]
    k0 = ctrl["k0"]

    y_loss = y_target if y_target is not None else y

    def loss_grad(xa):
        def f(z):
            logits = logits_fn(z)
            li = criterion(logits, y_loss, weights)
            return pixel_to_img_loss(li, mask_background).sum(), logits
        (_, logits), grad = jax.value_and_grad(f, has_aux=True)(xa)
        track_i = pixel_to_img_loss(track_fn(logits, y, None),
                                    mask_background)
        return logits, grad, track_i

    logits0, grad0, loss_indiv0 = loss_grad(x_adv)
    acc0 = _per_image_acc(logits0, y, ignore_index,
                          count_ignored_correct=False)
    pred_best0 = jnp.argmax(logits0, axis=-1)

    state = _State(
        i=jnp.asarray(0, jnp.int32),
        x_adv=x_adv, x_adv_old=x_adv, grad=grad0,
        x_best=x_adv, grad_best=grad0, x_best_adv=x_adv,
        pred_best=pred_best0,
        loss_best=loss_indiv0, loss_best_last_check=loss_indiv0,
        reduced_last_check=jnp.ones((bs,), jnp.float32),
        acc=acc0,
        step_size=jnp.full((bs,) + (1,) * ndims, alpha * eps, x.dtype),
        counter3=jnp.asarray(0, jnp.int32),
        k=jnp.asarray(k0, jnp.int32),
        loss_steps=jnp.zeros((n_iter_buf, bs), loss_indiv0.dtype),
        topk=(jnp.full((bs,), init_topk, jnp.float32) if norm == "L1"
              else jnp.zeros((bs,), jnp.float32)),
        sp_old=(jnp.full((bs,), float(n_fts), jnp.float32) if norm == "L1"
                else jnp.zeros((bs,), jnp.float32)),
    )

    def check_oscillation(loss_steps, j, k):
        """Parity ``attacker.py:243-248`` incl. torch's index-(-1) wrap."""
        offs = jnp.arange(k_max)
        idx1 = (j - offs) % n_iter
        idx2 = (j - offs - 1) % n_iter
        cmp = (loss_steps[idx1] > loss_steps[idx2]).astype(jnp.float32)
        mask = (offs < k).astype(jnp.float32)[:, None]
        t = (cmp * mask).sum(0)
        return (t <= k.astype(jnp.float32) * thr_decr).astype(jnp.float32)

    def step(s: _State) -> _State:
        i = s.i
        grad2 = s.x_adv - s.x_adv_old
        x_adv_old = s.x_adv
        a = jnp.where(i > 0, 0.75, 1.0).astype(x.dtype)

        if norm == "Linf":
            z = s.x_adv + s.step_size * jnp.sign(s.grad)
            z = project_linf(z, x, eps)
            x_adv_1 = project_linf(
                s.x_adv + (z - s.x_adv) * a + grad2 * (1.0 - a), x, eps)
        elif norm == "L2":
            z = s.x_adv + s.step_size * s.grad / (_l2_norm(s.grad) + 1e-12)
            z = project_l2(z, x, eps)
            x_adv_1 = s.x_adv + (z - s.x_adv) * a + grad2 * (1.0 - a)
            x_adv_1 = project_l2(x_adv_1, x, eps)
        elif norm == "L1":
            g_abs = jnp.abs(s.grad).reshape(bs, -1)
            g_sorted = jnp.sort(g_abs, axis=-1)
            topk_curr = jnp.clip(((1.0 - s.topk) * n_fts), 0, n_fts - 1
                                 ).astype(jnp.int32)
            thr = jnp.take_along_axis(g_sorted, topk_curr[:, None], axis=1)
            thr = thr.reshape((bs,) + (1,) * ndims)
            sparsegrad = s.grad * (jnp.abs(s.grad) >= thr).astype(x.dtype)
            sg_sign = jnp.sign(sparsegrad)
            denom = jnp.abs(sg_sign).reshape(bs, -1).sum(-1)
            x_adv_1 = s.x_adv + s.step_size * sg_sign / (
                _bimg(denom, ndims) + 1e-10)
            delta_u = x_adv_1 - x
            delta_p = project_l1_ball_box(x, delta_u, eps)
            x_adv_1 = x + delta_u + delta_p

        x_adv = x_adv_1
        logits, grad_new, y1 = loss_grad(x_adv)
        # (the reference skips the last backward — keeping it is a no-op)
        grad = grad_new

        avg_acc = _per_image_acc(logits, y, ignore_index,
                                 count_ignored_correct=True)
        improved = avg_acc <= s.acc
        acc = jnp.minimum(s.acc, avg_acc)
        imp_b = _bimg(improved.astype(x.dtype), ndims)
        x_best_adv = imp_b * x_adv + (1 - imp_b) * s.x_best_adv
        pred_best = jnp.where(improved.reshape((bs,) + (1,) * (y.ndim - 1)),
                              jnp.argmax(logits, axis=-1), s.pred_best)

        loss_steps = s.loss_steps.at[i].set(y1)
        better = y1 > s.loss_best
        bet_b = _bimg(better.astype(x.dtype), ndims)
        x_best = bet_b * x_adv + (1 - bet_b) * s.x_best
        grad_best = bet_b * grad + (1 - bet_b) * s.grad_best
        loss_best = jnp.where(better, y1, s.loss_best)

        counter3 = s.counter3 + 1
        do_check = counter3 == s.k

        if norm in ("Linf", "L2"):
            fl_osc = check_oscillation(loss_steps, i, s.k)
            fl_no_impr = (1.0 - s.reduced_last_check) * (
                s.loss_best_last_check >= loss_best).astype(jnp.float32)
            fl_osc = jnp.maximum(fl_osc, fl_no_impr)
            reduced_last_check = jnp.where(do_check, fl_osc,
                                           s.reduced_last_check)
            loss_best_last_check = jnp.where(do_check, loss_best,
                                             s.loss_best_last_check)
            halve = do_check & (fl_osc > 0)
            hv_b = _bimg(halve.astype(x.dtype), ndims)
            step_size = jnp.where(hv_b > 0, s.step_size / 2.0, s.step_size)
            x_adv = hv_b * x_best + (1 - hv_b) * x_adv
            grad = hv_b * grad_best + (1 - hv_b) * grad
            counter3 = jnp.where(do_check, 0, counter3)
            k = jnp.where(do_check,
                          jnp.maximum(s.k - size_decr, n_iter_min), s.k)
            topk, sp_old = s.topk, s.sp_old
        else:  # L1 sparsity adaptation (attacker.py:553-566)
            sp_curr = (jnp.abs(x_best - x).reshape(bs, -1) > 0).sum(-1
                      ).astype(jnp.float32)
            fl_redtopk = (sp_curr / s.sp_old) < 0.95
            topk_new = sp_curr / n_fts / 1.5
            red_b = _bimg(fl_redtopk.astype(x.dtype), ndims)
            step_new = red_b * (alpha * eps) + (1 - red_b) * (
                s.step_size / adasp_redstep)
            step_new = jnp.clip(step_new, alpha * eps / adasp_minstep,
                                alpha * eps)
            step_size = jnp.where(do_check, step_new, s.step_size)
            topk = jnp.where(do_check, topk_new, s.topk)
            sp_old = jnp.where(do_check, sp_curr, s.sp_old)
            x_adv = jnp.where(do_check, red_b * x_best + (1 - red_b) * x_adv,
                              x_adv)
            grad = jnp.where(do_check,
                             red_b * grad_best + (1 - red_b) * grad, grad)
            counter3 = jnp.where(do_check, 0, counter3)
            k = s.k
            reduced_last_check = s.reduced_last_check
            loss_best_last_check = s.loss_best_last_check

        return _State(i + 1, x_adv, x_adv_old, grad, x_best, grad_best,
                      x_best_adv, pred_best, loss_best, loss_best_last_check,
                      reduced_last_check, acc, step_size, counter3, k,
                      loss_steps, topk, sp_old)

    def cond(s: _State):
        running = s.i < n_iter
        if early_stop:
            acc_sum = s.acc.sum()
            if axis_name is not None:
                # inside shard_map the batch is split over the mesh; the
                # reference's early stop is batch-global (attacker.py:
                # 568-569), so reduce across shards to keep per-image
                # results identical to the single-chip run
                acc_sum = jax.lax.psum(acc_sum, axis_name)
            running = running & (acc_sum > 0)
        return running

    final = jax.lax.while_loop(cond, step, state)
    return APGDResult(final.x_best, final.acc, final.loss_best,
                      final.x_best_adv)


def _project_back(z: Array, x: Array, norm: str, eps: float) -> Array:
    """Parity ``apgd_largereps._project`` (``attacker.py:683-690``)."""
    if norm != "Linf":
        raise NotImplementedError(norm)
    return jnp.clip(x + jnp.clip(z - x, -eps, eps), 0.0, 1.0)


def apgd_largereps(logits_fn: Callable, x: Array, y: Array, *,
                   weights: Optional[Array] = None, norm: str = "Linf",
                   eps: float = 8.0 / 255.0, n_iter: int = 10,
                   loss: str = "ce", early_stop: bool = False,
                   track_loss: Optional[str] = None, use_rs: bool = False,
                   ignore_index: int = -1, rng: Optional[Array] = None,
                   x_init: Optional[Array] = None,
                   axis_name: Optional[str] = None):
    """SEA per-loss attack: 3 warm-started phases at eps * (2, 1.5, 1).

    Parity: ``semseg/attacker.py:662-728``. Returns (x_adv, None, acc).

    ``x_init``: phase-0 starting point (e.g. a random start drawn OUTSIDE a
    ``shard_map`` with the single-chip key chain — ``sea._sharded_attack``);
    since phase 0 projects the init back to its own ball∩box, passing an
    in-ball point here is exactly equivalent to drawing it inside.
    ``axis_name``: mesh axis for the batch-global early stop when running
    per-shard under ``shard_map``.
    """
    n_iters = [int(0.3 * n_iter), int(0.3 * n_iter)]
    n_iters.append(n_iter - sum(n_iters))
    epss = [2.0 * eps, 1.5 * eps, 1.0 * eps]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # one executable serves all three phases: phase length / eps / warm-start
    # flag are runtime scalars (see apgd_attack)
    n_buf = max(n_iters)
    acc = jnp.ones((x.shape[0],), jnp.float32)
    for phase, (it, ep) in enumerate(zip(n_iters, epss)):
        if x_init is not None:
            x_init = _project_back(x_init, x, norm, ep)
        rng, sub = jax.random.split(rng)
        res = apgd_attack(
            logits_fn, x, y, norm=norm, eps=ep, n_iter=it, use_rs=use_rs,
            loss=loss, track_loss=track_loss, early_stop=early_stop,
            ignore_index=ignore_index, weights=weights, rng=sub,
            x_init=x_init, n_iter_buf=n_buf, axis_name=axis_name)
        acc = res.acc
        x_init = res.x_best_adv
    return x_init, None, acc


def targeted_classes(clean_sorted: Array, y: Array, restart_i: int,
                     n_target_classes: int) -> Array:
    """Per-pixel target class for targeted restart ``restart_i``.

    Parity: ``attacker.py:607-620`` — restart i targets each pixel's
    (i % n_target_classes + 1)-th most probable clean class; where that
    collides with the true label, fall back to the next-lower-ranked class
    (the upstream branch is broken — its loss names are not in
    criterion_dict — so this is the working per-pixel analogue of its
    selection arithmetic).

    ``clean_sorted``: ascending argsort of the clean logits over the last
    axis (classes).
    """
    n_cls = clean_sorted.shape[-1]
    target_cls = restart_i % n_target_classes + 1
    y_target = clean_sorted[..., n_cls - target_cls]
    collide = y_target == y
    alt = clean_sorted[..., max(n_cls - target_cls - 1, 0)]
    return jnp.where(collide, alt, y_target)


def apgd_restarts(logits_fn: Callable, x: Array, y: Array, *,
                  norm: str = "Linf", eps: float = 8.0 / 255.0,
                  n_iter: int = 10, loss: str = "ce", n_restarts: int = 1,
                  early_stop: bool = False, track_loss: Optional[str] = None,
                  use_rs: bool = False, ignore_index: int = -1,
                  n_target_classes: int = 21,
                  rng: Optional[Array] = None):
    """APGD with restarts, keeping per-image best (lowest accuracy) points.

    Parity: ``semseg/attacker.py:574-659``. The reference re-attacks only
    still-robust images; per-image updates are independent so attacking the
    full (static-shape) batch and masking the merge is equivalent — except
    that batch-level early stopping may run more steps here (results
    identical, best-point tracking is monotone).

    ``loss`` containing "targeted" cycles target classes across restarts
    like ``attacker.py:607-620``: restart i targets each pixel's
    (i % n_target_classes + 1)-th most probable clean class (the upstream
    targeted branch is broken — its loss names are not in criterion_dict —
    so this is the working per-pixel analogue).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    acc = jnp.ones((x.shape[0],), jnp.float32)
    x_adv = x
    ndims = x.ndim - 1
    targeted = "targeted" in loss
    if targeted:
        clean_sorted = jnp.argsort(logits_fn(x), axis=-1)  # ascending
    for i in range(n_restarts):
        y_target = None
        if targeted:
            y_target = targeted_classes(clean_sorted, y, i, n_target_classes)
        rng, sub = jax.random.split(rng)
        res = apgd_attack(
            logits_fn, x, y, norm=norm, eps=eps, n_iter=n_iter,
            use_rs=use_rs, loss=loss, track_loss=track_loss,
            early_stop=early_stop, ignore_index=ignore_index, rng=sub,
            y_target=y_target)
        logits = logits_fn(res.x_best_adv)
        acc_curr = _per_image_acc(logits, y, ignore_index,
                                  count_ignored_correct=True)
        to_update = (acc_curr < acc) & (acc > 0)
        up = _bimg(to_update.astype(x.dtype), ndims)
        x_adv = up * res.x_best_adv + (1 - up) * x_adv
        acc = jnp.where(to_update, acc_curr, acc)
    return x_adv, None, acc
