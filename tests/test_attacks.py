"""Attack-engine tests: invariants + golden parity vs a torch transcription.

The golden test re-implements the reference APGD loop (semseg/attacker.py:
260-571) in torch on a tiny differentiable model and checks our lax.while_
loop version produces the same trajectory. This pins down the step-size
controller, best-point bookkeeping and momentum semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from robseg_tpu.attacks import apgd_attack, apgd_largereps, pgd_attack
from robseg_tpu.ops.losses import ATTACK_CRITERIA, pixel_to_img_loss

B, H, W, C = 3, 8, 8, 4
EPS = 8.0 / 255.0


def _make_linear_model(rng):
    """A tiny fixed conv 'model': logits = x @ W + b, shared weights."""
    wk = rng.normal(size=(3, C)).astype(np.float32) * 2.0
    bk = rng.normal(size=(C,)).astype(np.float32) * 0.1

    def jax_fn(x):
        return jnp.einsum("bhwc,cd->bhwd", x, jnp.asarray(wk)) + jnp.asarray(bk)

    tw = torch.from_numpy(wk).double()
    tb = torch.from_numpy(bk).double()

    def torch_fn(x_nchw):
        # x (B, 3, H, W) -> logits (B, C, H, W)
        return (torch.einsum("bchw,cd->bdhw", x_nchw, tw)
                + tb.view(1, C, 1, 1))

    return jax_fn, torch_fn


def _torch_apgd(torch_fn, x_np, y_np, n_iter, loss_name="ce-avg",
                track_name="ce-avg", eps=EPS, x_init=None):
    """Direct transcription of semseg/attacker.py:260-571 (Linf, no rs)."""
    x = torch.from_numpy(np.moveaxis(x_np, -1, 1).copy()).double()
    y = torch.from_numpy(y_np).long()
    bs = x.shape[0]

    def criterion(logits, yy):
        return F.cross_entropy(logits, yy, reduction="none", ignore_index=-1)

    mask_background = 1 - (y == -1).float()
    if x_init is not None:
        x_adv = torch.from_numpy(np.moveaxis(x_init, -1, 1).copy()).double().clamp(0., 1.)
    else:
        x_adv = x.clone().clamp(0., 1.)
    x_best = x_adv.clone()
    x_best_adv = x_adv.clone()
    loss_steps = torch.zeros([n_iter, bs], dtype=torch.float64)

    n_iter_2 = max(int(0.22 * n_iter), 1)
    n_iter_min = max(int(0.06 * n_iter), 1)
    size_decr = max(int(0.03 * n_iter), 1)
    k = n_iter_2
    thr_decr = .75
    step_size = 2. * eps * torch.ones([bs, 1, 1, 1], dtype=torch.float64)
    counter3 = 0

    def fwd_loss_grad(xa):
        xa = xa.clone().requires_grad_(True)
        logits = torch_fn(xa)
        li = criterion(logits, y)
        li = (mask_background * li).view(bs, -1).mean(-1)
        grad = torch.autograd.grad(li.sum(), [xa])[0]
        return logits.detach(), grad.detach(), li.detach()

    logits, grad, loss_indiv = fwd_loss_grad(x_adv)
    acc = (logits.max(1)[1] == y).float().view(bs, -1).mean(-1)
    loss_best = loss_indiv.clone()
    loss_best_last_check = loss_best.clone()
    reduced_last_check = torch.ones_like(loss_best)
    grad_best = grad.clone()
    x_adv_old = x_adv.clone()

    def check_oscillation(xx, j, kk, k3):
        t = torch.zeros(xx.shape[1])
        for c5 in range(kk):
            t += (xx[j - c5] > xx[j - c5 - 1]).float()
        return (t <= kk * k3 * torch.ones_like(t)).float()

    for i in range(n_iter):
        grad2 = x_adv - x_adv_old
        x_adv_old = x_adv.clone()
        a = 0.75 if i > 0 else 1.0
        x_adv_1 = x_adv + step_size * torch.sign(grad)
        x_adv_1 = torch.clamp(
            torch.min(torch.max(x_adv_1, x - eps), x + eps), 0., 1.)
        x_adv_1 = torch.clamp(torch.min(torch.max(
            x_adv + (x_adv_1 - x_adv) * a + grad2 * (1 - a), x - eps),
            x + eps), 0., 1.)
        x_adv = x_adv_1 + 0.

        logits, grad, y1 = fwd_loss_grad(x_adv)
        pred = logits.max(1)[1] == y
        pred[y == -1] = True
        avg_acc = pred.float().view(bs, -1).mean(-1)
        ind_pred = (avg_acc <= acc).nonzero().squeeze(-1)
        acc = torch.min(acc, avg_acc)
        x_best_adv[ind_pred] = x_adv[ind_pred] + 0.

        loss_steps[i] = y1 + 0
        ind = (y1 > loss_best).nonzero().squeeze(-1)
        x_best[ind] = x_adv[ind].clone()
        grad_best[ind] = grad[ind].clone()
        loss_best[ind] = y1[ind] + 0

        counter3 += 1
        if counter3 == k:
            fl_oscillation = check_oscillation(loss_steps, i, k, thr_decr)
            fl_reduce_no_impr = (1. - reduced_last_check) * (
                loss_best_last_check >= loss_best).float()
            fl_oscillation = torch.max(fl_oscillation, fl_reduce_no_impr)
            reduced_last_check = fl_oscillation.clone()
            loss_best_last_check = loss_best.clone()
            if fl_oscillation.sum() > 0:
                ind_fl = (fl_oscillation > 0).nonzero().squeeze(-1)
                step_size[ind_fl] /= 2.0
                x_adv[ind_fl] = x_best[ind_fl].clone()
                grad[ind_fl] = grad_best[ind_fl].clone()
            counter3 = 0
            k = max(k - size_decr, n_iter_min)

    return (np.moveaxis(x_best.numpy(), 1, -1),
            acc.numpy(),
            loss_best.numpy(),
            np.moveaxis(x_best_adv.numpy(), 1, -1))


class TestAPGDGoldenParity:
    @pytest.mark.parametrize("n_iter", [5, 25])
    def test_matches_torch_transcription(self, rng, n_iter):
        # float64 on both sides: sign() amplifies float32 noise chaotically,
        # so exact-semantics parity is only testable in double precision.
        jax_fn, torch_fn = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float64)
        y = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
        y[0, :2, :2] = -1  # some ignored pixels

        ref = _torch_apgd(torch_fn, x, y, n_iter)
        jax.config.update("jax_enable_x64", True)
        try:
            res = apgd_attack(
                jax_fn, jnp.asarray(x), jnp.asarray(y),
                norm="Linf", eps=EPS, n_iter=n_iter,
                use_rs=False, loss="ce-avg", track_loss="ce-avg")
            res = jax.tree.map(np.asarray, res)
        finally:
            jax.config.update("jax_enable_x64", False)
        np.testing.assert_allclose(np.asarray(res.loss_best), ref[2],
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(res.acc), ref[1], atol=1e-7)
        np.testing.assert_allclose(np.asarray(res.x_best_adv), ref[3],
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(res.x_best), ref[0], atol=1e-8)


class TestAPGDInvariants:
    def test_eps_ball_and_range(self, rng):
        jax_fn, _ = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float32)
        y = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
        res = apgd_attack(jax_fn, jnp.asarray(x), jnp.asarray(y),
                          norm="Linf", eps=EPS, n_iter=10, use_rs=True,
                          loss="mask-ce-avg", track_loss="ce-avg",
                          rng=jax.random.PRNGKey(1))
        for out in (res.x_best, res.x_best_adv):
            out = np.asarray(out)
            assert np.abs(out - x).max() <= EPS + 1e-6
            assert out.min() >= 0.0 and out.max() <= 1.0

    def test_l2_ball(self, rng):
        jax_fn, _ = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float32)
        y = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
        res = apgd_attack(jax_fn, jnp.asarray(x), jnp.asarray(y),
                          norm="L2", eps=1.0, n_iter=10, loss="ce-avg")
        out = np.asarray(res.x_best_adv)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_attack_reduces_accuracy(self, rng):
        jax_fn, _ = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float32)
        logits = np.asarray(jax_fn(jnp.asarray(x)))
        y = logits.argmax(-1).astype(np.int32)  # start 100% correct
        res = apgd_attack(jax_fn, jnp.asarray(x), jnp.asarray(y),
                          norm="Linf", eps=0.1, n_iter=20, loss="ce-avg")
        assert float(np.asarray(res.acc).mean()) < 1.0

    def test_largereps_ball_and_improvement(self, rng):
        jax_fn, _ = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float32)
        logits = np.asarray(jax_fn(jnp.asarray(x)))
        y = logits.argmax(-1).astype(np.int32)
        x_adv, _, acc = apgd_largereps(
            jax_fn, jnp.asarray(x), jnp.asarray(y), eps=EPS, n_iter=20,
            loss="mask-ce-avg", track_loss="ce-avg", use_rs=True,
            rng=jax.random.PRNGKey(0))
        out = np.asarray(x_adv)
        assert np.abs(out - x).max() <= EPS + 1e-6
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert float(np.asarray(acc).mean()) <= 1.0

    def test_l1_ball(self, rng):
        jax_fn, _ = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float32)
        y = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
        eps1 = 10.0
        res = apgd_attack(jax_fn, jnp.asarray(x), jnp.asarray(y),
                          norm="L1", eps=eps1, n_iter=10, loss="ce-avg")
        out = np.asarray(res.x_best_adv)
        l1 = np.abs((out - x).reshape(B, -1)).sum(-1)
        assert np.all(l1 <= eps1 + 1e-2)
        assert out.min() >= 0.0 and out.max() <= 1.0


class TestPGD:
    def test_ball_and_loss_increase(self, rng):
        jax_fn, _ = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float32)
        logits = np.asarray(jax_fn(jnp.asarray(x)))
        y = logits.argmax(-1).astype(np.int32)
        adv = pgd_attack(jax_fn, jnp.asarray(x), jnp.asarray(y),
                         eps=EPS, alpha=1e-2, num_iter=5, loss="pgd")
        adv = np.asarray(adv)
        assert np.abs(adv - x).max() <= EPS + 1e-6
        assert adv.min() >= 0.0 and adv.max() <= 1.0

        def mean_ce(xx):
            lg = np.asarray(jax_fn(jnp.asarray(xx)))
            lse = np.log(np.exp(lg).sum(-1))
            nll = lse - np.take_along_axis(lg, y[..., None], -1)[..., 0]
            return nll.mean()

        assert mean_ce(adv) > mean_ce(x)


class TestRestartsAndTargeted:
    def test_restarts_monotone_improvement(self, rng):
        jax_fn, _ = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float32)
        logits = np.asarray(jax_fn(jnp.asarray(x)))
        y = logits.argmax(-1).astype(np.int32)
        from robseg_tpu.attacks import apgd_restarts
        x1, _, acc1 = apgd_restarts(jax_fn, jnp.asarray(x), jnp.asarray(y),
                                    eps=0.05, n_iter=8, loss="ce-avg",
                                    n_restarts=1, use_rs=True,
                                    rng=jax.random.PRNGKey(0))
        x3, _, acc3 = apgd_restarts(jax_fn, jnp.asarray(x), jnp.asarray(y),
                                    eps=0.05, n_iter=8, loss="ce-avg",
                                    n_restarts=3, use_rs=True,
                                    rng=jax.random.PRNGKey(0))
        # more restarts can only help (per-image min over attempts)
        assert np.all(np.asarray(acc3) <= np.asarray(acc1) + 1e-7)
        out = np.asarray(x3)
        assert np.abs(out - x).max() <= 0.05 + 1e-6

    def test_targeted_cycling_runs_and_stays_in_ball(self, rng):
        jax_fn, _ = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float32)
        y = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
        from robseg_tpu.attacks import apgd_restarts
        x_adv, _, acc = apgd_restarts(
            jax_fn, jnp.asarray(x), jnp.asarray(y), eps=0.05, n_iter=6,
            loss="ce-targeted", track_loss="ce-avg", n_restarts=2,
            n_target_classes=3, rng=jax.random.PRNGKey(1))
        out = np.asarray(x_adv)
        assert np.abs(out - x).max() <= 0.05 + 1e-6
        assert np.all((np.asarray(acc) >= 0) & (np.asarray(acc) <= 1))


def _torch_apgd_l2(torch_fn, x_np, y_np, n_iter, eps):
    """Transcription of the L2 branch (semseg/attacker.py:412-436), f64."""
    x = torch.from_numpy(np.moveaxis(x_np, -1, 1).copy()).double()
    y = torch.from_numpy(y_np).long()
    bs = x.shape[0]

    def l2n(d):
        return d.reshape(bs, -1).norm(dim=1).view(bs, 1, 1, 1)

    def criterion(logits, yy):
        return F.cross_entropy(logits, yy, reduction="none", ignore_index=-1)

    mask_background = 1 - (y == -1).double()
    x_adv = x.clone().clamp(0., 1.)
    x_best = x_adv.clone()
    x_best_adv = x_adv.clone()
    loss_steps = torch.zeros([n_iter, bs], dtype=torch.float64)
    n_iter_2 = max(int(0.22 * n_iter), 1)
    n_iter_min = max(int(0.06 * n_iter), 1)
    size_decr = max(int(0.03 * n_iter), 1)
    k = n_iter_2
    step_size = 2. * eps * torch.ones([bs, 1, 1, 1], dtype=torch.float64)
    counter3 = 0

    def fwd_loss_grad(xa):
        xa = xa.clone().requires_grad_(True)
        logits = torch_fn(xa)
        li = (mask_background * criterion(logits, y)).view(bs, -1).mean(-1)
        grad = torch.autograd.grad(li.sum(), [xa])[0]
        return logits.detach(), grad.detach(), li.detach()

    logits, grad, loss_indiv = fwd_loss_grad(x_adv)
    acc = (logits.max(1)[1] == y).float().view(bs, -1).mean(-1)
    loss_best = loss_indiv.clone()
    loss_best_last_check = loss_best.clone()
    reduced_last_check = torch.ones_like(loss_best)
    grad_best = grad.clone()
    x_adv_old = x_adv.clone()

    def check_osc(xx, j, kk, k3):
        t = torch.zeros(xx.shape[1])
        for c5 in range(kk):
            t += (xx[j - c5] > xx[j - c5 - 1]).float()
        return (t <= kk * k3 * torch.ones_like(t)).float()

    for i in range(n_iter):
        grad2 = x_adv - x_adv_old
        x_adv_old = x_adv.clone()
        a = 0.75 if i > 0 else 1.0
        x_adv_1 = x_adv + step_size * grad / (l2n(grad) + 1e-12)
        x_adv_1 = torch.clamp(
            x + (x_adv_1 - x) / (l2n(x_adv_1 - x) + 1e-12)
            * torch.min(eps * torch.ones_like(x).double(),
                        l2n(x_adv_1 - x)), 0., 1.)
        x_adv_1 = x_adv + (x_adv_1 - x_adv) * a + grad2 * (1 - a)
        x_adv_1 = torch.clamp(
            x + (x_adv_1 - x) / (l2n(x_adv_1 - x) + 1e-12)
            * torch.min(eps * torch.ones_like(x).double(),
                        l2n(x_adv_1 - x)), 0., 1.)
        x_adv = x_adv_1 + 0.

        logits, grad, y1 = fwd_loss_grad(x_adv)
        pred = logits.max(1)[1] == y
        pred[y == -1] = True
        avg_acc = pred.float().view(bs, -1).mean(-1)
        ind_pred = (avg_acc <= acc).nonzero().squeeze(-1)
        acc = torch.min(acc, avg_acc)
        x_best_adv[ind_pred] = x_adv[ind_pred] + 0.

        loss_steps[i] = y1 + 0
        ind = (y1 > loss_best).nonzero().squeeze(-1)
        x_best[ind] = x_adv[ind].clone()
        grad_best[ind] = grad[ind].clone()
        loss_best[ind] = y1[ind] + 0

        counter3 += 1
        if counter3 == k:
            fl = check_osc(loss_steps, i, k, 0.75)
            fl_ni = (1. - reduced_last_check) * (
                loss_best_last_check >= loss_best).float()
            fl = torch.max(fl, fl_ni)
            reduced_last_check = fl.clone()
            loss_best_last_check = loss_best.clone()
            if fl.sum() > 0:
                idx = (fl > 0).nonzero().squeeze(-1)
                step_size[idx] /= 2.0
                x_adv[idx] = x_best[idx].clone()
                grad[idx] = grad_best[idx].clone()
            counter3 = 0
            k = max(k - size_decr, n_iter_min)

    return (np.moveaxis(x_best_adv.numpy(), 1, -1), loss_best.numpy())


class TestAPGDL2GoldenParity:
    def test_l2_matches_torch_transcription(self, rng):
        jax_fn, torch_fn = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float64)
        y = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
        eps = 0.5
        ref_adv, ref_loss = _torch_apgd_l2(torch_fn, x, y, 12, eps)
        jax.config.update("jax_enable_x64", True)
        try:
            res = apgd_attack(jax_fn, jnp.asarray(x), jnp.asarray(y),
                              norm="L2", eps=eps, n_iter=12,
                              loss="ce-avg", track_loss="ce-avg")
            res = jax.tree.map(np.asarray, res)
        finally:
            jax.config.update("jax_enable_x64", False)
        np.testing.assert_allclose(res.loss_best, ref_loss, atol=1e-8)
        np.testing.assert_allclose(res.x_best_adv, ref_adv, atol=1e-8)


class TestSegPGD:
    def test_segpgd_loss_weighting(self, rng):
        from robseg_tpu.attacks.pgd import segpgd_loss
        logits = rng.normal(size=(2, 4, 4, C)).astype(np.float32)
        y = rng.integers(0, C, (2, 4, 4)).astype(np.int32)
        # at t = T, lambda = 0.5 -> plain 0.5 * mean CE
        l_half = np.asarray(segpgd_loss(jnp.asarray(logits), jnp.asarray(y),
                                        jnp.asarray(10.0), 10))
        from robseg_tpu.ops.losses import cross_entropy_pixelwise
        ce = np.asarray(cross_entropy_pixelwise(jnp.asarray(logits),
                                                jnp.asarray(y)))
        np.testing.assert_allclose(l_half, 0.5 * ce.reshape(2, -1).mean(-1),
                                   rtol=1e-6)

    def test_segpgd_attack_runs(self, rng):
        jax_fn, _ = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float32)
        logits = np.asarray(jax_fn(jnp.asarray(x)))
        y = logits.argmax(-1).astype(np.int32)
        adv = pgd_attack(jax_fn, jnp.asarray(x), jnp.asarray(y),
                         eps=EPS, alpha=1e-2, num_iter=5, loss="segpgd-loss")
        adv = np.asarray(adv)
        assert np.abs(adv - x).max() <= EPS + 1e-6
        assert adv.min() >= 0.0 and adv.max() <= 1.0


class TestLargeEpsGoldenParity:
    def test_three_phase_schedule_matches_torch(self, rng):
        """Transcription of apgd_largereps (attacker.py:662-728) in f64."""
        jax_fn, torch_fn = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float64)
        y = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
        n_iter, eps = 20, EPS

        n_iters = [int(0.3 * n_iter), int(0.3 * n_iter)]
        n_iters.append(n_iter - sum(n_iters))
        epss = [2 * eps, 1.5 * eps, 1 * eps]
        x_init = None
        for it, ep in zip(n_iters, epss):
            if x_init is not None:
                # _project (attacker.py:683-690)
                z = np.moveaxis(x_init, -1, 1)
                xs = np.moveaxis(x, -1, 1)
                z = xs + np.clip(z - xs, -ep, ep)
                x_init = np.moveaxis(np.clip(z, 0., 1.), 1, -1)
            ref = _torch_apgd(torch_fn, x, y, it, eps=ep, x_init=x_init)
            x_init = ref[3]  # x_best_adv

        jax.config.update("jax_enable_x64", True)
        try:
            x_adv, _, acc = apgd_largereps(
                jax_fn, jnp.asarray(x), jnp.asarray(y), eps=eps,
                n_iter=n_iter, loss="ce-avg", track_loss="ce-avg",
                use_rs=False)
            x_adv = np.asarray(x_adv)
        finally:
            jax.config.update("jax_enable_x64", False)
        np.testing.assert_allclose(x_adv, x_init, atol=1e-8)


class TestConvModelIntegrationGolden:
    def test_apgd_on_converted_conv_bn_model(self, rng):
        """Converter + model + attack integration: a torch conv/BN(eval)/
        conv net and our Flax equivalent (converted weights) must produce
        the same APGD trajectory in f64."""
        cin, mid, ncls = 3, 6, C
        tconv1 = torch.nn.Conv2d(cin, mid, 3, padding=1, bias=False).double()
        tbn = torch.nn.BatchNorm2d(mid).double().eval()
        tconv2 = torch.nn.Conv2d(mid, ncls, 1).double()
        with torch.no_grad():
            tbn.weight.copy_(torch.rand(mid) + 0.5)
            tbn.bias.copy_(torch.rand(mid))
            tbn.running_mean.copy_(torch.randn(mid) * 0.1)
            tbn.running_var.copy_(torch.rand(mid) + 0.5)

        def torch_fn(x_nchw):
            return tconv2(torch.relu(tbn(tconv1(x_nchw))))

        from robseg_tpu.models.layers import ConvModule
        import flax.linen as nn

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = ConvModule(mid, kernel_size=3, padding=1, name="cm")(x)
                return nn.Conv(ncls, (1, 1), name="cls")(x)

        params = {
            "cm": {"conv": {"kernel": np.transpose(
                tconv1.weight.detach().numpy(), (2, 3, 1, 0))},
                "bn": {"scale": tbn.weight.detach().numpy(),
                       "bias": tbn.bias.detach().numpy()}},
            "cls": {"kernel": np.transpose(
                tconv2.weight.detach().numpy(), (2, 3, 1, 0)),
                "bias": tconv2.bias.detach().numpy()},
        }
        stats = {"cm": {"bn": {"mean": tbn.running_mean.numpy(),
                               "var": tbn.running_var.numpy()}}}
        net = Net()
        jax_fn = lambda x: net.apply(  # noqa: E731
            {"params": params, "batch_stats": stats}, x)

        x = rng.random((2, H, W, 3)).astype(np.float64)
        y = rng.integers(0, ncls, size=(2, H, W)).astype(np.int32)
        ref = _torch_apgd(torch_fn, x, y, 12)
        jax.config.update("jax_enable_x64", True)
        try:
            res = apgd_attack(jax_fn, jnp.asarray(x), jnp.asarray(y),
                              norm="Linf", eps=EPS, n_iter=12,
                              use_rs=False, loss="ce-avg",
                              track_loss="ce-avg")
            res = jax.tree.map(np.asarray, res)
        finally:
            jax.config.update("jax_enable_x64", False)
        np.testing.assert_allclose(res.loss_best, ref[2], atol=1e-7)
        np.testing.assert_allclose(res.x_best_adv, ref[3], atol=1e-7)


class TestShardedAttack:
    def test_apgd_matches_single_device_when_batch_sharded(self, rng):
        """Pod-scale SEA: APGD is per-image independent (the only cross-
        image term is the early-stop sum), so sharding the batch over a
        mesh must reproduce single-device results exactly."""
        from robseg_tpu.parallel import make_data_mesh, shard_batch
        jax_fn, _ = _make_linear_model(rng)
        x = rng.random((8, H, W, 3)).astype(np.float32)
        y = rng.integers(0, C, size=(8, H, W)).astype(np.int32)

        res1 = apgd_attack(jax_fn, jnp.asarray(x), jnp.asarray(y),
                           norm="Linf", eps=EPS, n_iter=10,
                           loss="ce-avg", track_loss="ce-avg")
        mesh = make_data_mesh(8)
        bx, by = shard_batch(mesh, (jnp.asarray(x), jnp.asarray(y)))
        res8 = apgd_attack(jax_fn, bx, by, norm="Linf", eps=EPS,
                           n_iter=10, loss="ce-avg", track_loss="ce-avg")
        np.testing.assert_allclose(np.asarray(res8.x_best_adv),
                                   np.asarray(res1.x_best_adv), atol=1e-6)
        np.testing.assert_allclose(np.asarray(res8.acc),
                                   np.asarray(res1.acc), atol=1e-6)


class TestTargetedSelection:
    def test_picks_ith_most_probable_with_collision_fallback(self, rng):
        """Parity with attacker.py:607-620 selection arithmetic."""
        from robseg_tpu.attacks.apgd import targeted_classes
        logits = rng.normal(size=(2, 4, 4, C)).astype(np.float32)
        y = rng.integers(0, C, size=(2, 4, 4)).astype(np.int32)
        srt = jnp.argsort(jnp.asarray(logits), axis=-1)
        for i in range(4):
            got = np.asarray(targeted_classes(srt, jnp.asarray(y), i,
                                              n_target_classes=3))
            target_cls = i % 3 + 1
            order = np.argsort(logits, axis=-1)
            want = order[..., C - target_cls]
            alt = order[..., max(C - target_cls - 1, 0)]
            want = np.where(want == y, alt, want)
            np.testing.assert_array_equal(got, want)
            assert np.all(got != y) or target_cls == C  # no collisions left


def _torch_pgd_filters(torch_fn, x_np, y_np, yimg_np, init_f, n_iter,
                       alpha, alpha_reg, n_cls):
    """Transcription of semseg/attacker.py:731-773 (f64)."""
    x = torch.from_numpy(np.moveaxis(x_np, -1, 1).copy()).double()
    y = torch.from_numpy(y_np).long()
    f = torch.from_numpy(init_f.copy()).double().reshape(n_cls, 1, 1, 3, 3)
    for _ in range(n_iter):
        f.requires_grad_(True)
        fs = torch.tile(f, (1, 3, 1, 1, 1))
        xf = x.clone()
        for c in range(x.shape[0]):
            xf[c] = F.conv2d(x[c:c + 1], fs[yimg_np[c]], groups=3,
                             padding="same")
        xf = xf / xf.view(xf.shape[0], -1).max(-1)[0].view(-1, 1, 1, 1)
        out = torch_fn(xf)
        loss = F.cross_entropy(out, y, reduction="none", ignore_index=-1)
        reg = f.abs().reshape(n_cls, -1).sum(-1).mean()
        grad = torch.autograd.grad(loss.mean() - alpha_reg * reg, f)[0]
        f = f.detach()
        gn = grad.reshape(n_cls, -1).norm(dim=1).view(-1, 1, 1, 1, 1)
        f = (f + alpha * grad / gn).clamp_(0.0, 1.0)
    return (xf.detach().numpy(),
            f.detach().numpy().reshape(n_cls, 3, 3))


class TestPgdFilters:
    def test_matches_torch_transcription(self, rng):
        from robseg_tpu.attacks.filters import pgd_filters
        jax_fn, torch_fn = _make_linear_model(rng)
        n_cls_f = 3
        x = rng.random((B, H, W, 3)).astype(np.float64)
        y = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
        y_img = rng.integers(0, n_cls_f, size=(B,)).astype(np.int32)
        f0 = rng.random((n_cls_f, 3, 3)).astype(np.float64)

        ref_xf, ref_f = _torch_pgd_filters(
            torch_fn, x, y, y_img, f0, n_iter=5, alpha=0.2, alpha_reg=0.1,
            n_cls=n_cls_f)
        jax.config.update("jax_enable_x64", True)
        try:
            got_xf, got_f = pgd_filters(
                jax_fn, jnp.asarray(x), jnp.asarray(y), jnp.asarray(y_img),
                n_iter=5, alpha=0.2, loss="ce", n_cls=n_cls_f,
                alpha_reg=0.1, init_f=jnp.asarray(f0))
            got_xf, got_f = np.asarray(got_xf), np.asarray(got_f)
        finally:
            jax.config.update("jax_enable_x64", False)
        np.testing.assert_allclose(got_f, ref_f, atol=1e-9)
        np.testing.assert_allclose(np.moveaxis(got_xf, -1, 1), ref_xf,
                                   atol=1e-9)

    def test_filters_stay_in_box_and_loss_ascends(self, rng):
        from robseg_tpu.attacks.filters import pgd_filters, _apply_filters
        from robseg_tpu.ops.losses import ATTACK_CRITERIA, pixel_to_img_loss
        jax_fn, _ = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float32)
        logits = np.asarray(jax_fn(jnp.asarray(x)))
        y = logits.argmax(-1).astype(np.int32)
        y_img = rng.integers(0, 3, size=(B,)).astype(np.int32)
        f0 = jnp.asarray(rng.random((3, 3, 3)).astype(np.float32))

        def mean_loss(f):
            xf = _apply_filters(jnp.asarray(x), f, jnp.asarray(y_img))
            li = ATTACK_CRITERIA["ce"](jax_fn(xf), jnp.asarray(y), None)
            return float(pixel_to_img_loss(li).mean())

        xf, f = pgd_filters(jax_fn, jnp.asarray(x), jnp.asarray(y),
                            jnp.asarray(y_img), n_iter=10, loss="ce",
                            n_cls=3, init_f=f0)
        f = np.asarray(f)
        assert f.min() >= 0.0 and f.max() <= 1.0
        assert mean_loss(jnp.asarray(f)) > mean_loss(f0)
        # output is max-normalized (reference divides by the per-image max)
        out = np.asarray(xf)
        np.testing.assert_allclose(
            np.abs(out).reshape(B, -1).max(-1), 1.0, rtol=1e-5)


class TestTrainAttackRegistry:
    """TRAIN_ATTACK_LOSSES vs direct torch transcriptions of the reference
    training-attack loss registry (``semseg/val.py:104-127``)."""

    def _logits_labels(self, rng):
        lg = rng.normal(size=(B, H, W, C)).astype(np.float32) * 2.0
        y = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
        lg_t = torch.from_numpy(np.moveaxis(lg, -1, 1).copy())
        y_t = torch.from_numpy(y).long()
        return lg, y, lg_t, y_t

    def test_pgd_scalar_ce(self, rng):
        from robseg_tpu.attacks.pgd import TRAIN_ATTACK_LOSSES
        lg, y, lg_t, y_t = self._logits_labels(rng)
        want = F.cross_entropy(lg_t, y_t).item()  # losses['pgd'], val.py:122
        got = float(TRAIN_ATTACK_LOSSES["pgd"](jnp.asarray(lg),
                                               jnp.asarray(y)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_mask_ce_avg(self, rng):
        from robseg_tpu.attacks.pgd import TRAIN_ATTACK_LOSSES
        lg, y, lg_t, y_t = self._logits_labels(rng)
        # masked_cross_entropy, val.py:112-118
        mask = (lg_t.max(1)[1] == y_t).float()
        li = F.cross_entropy(lg_t, y_t, reduction="none")
        want = (mask * li).view(B, -1).mean(-1).numpy()
        got = np.asarray(TRAIN_ATTACK_LOSSES["mask-ce-avg"](
            jnp.asarray(lg), jnp.asarray(y)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_js_avg(self, rng):
        from robseg_tpu.attacks.pgd import TRAIN_ATTACK_LOSSES
        lg, y, lg_t, y_t = self._logits_labels(rng)
        # js_loss -> js_div_fn (attacker.py:187-234) with red_dim=1
        p = F.softmax(lg_t, 1)
        q = F.one_hot(y_t.view(B, -1), C).permute(0, 2, 1).view(p.shape
                                                                ).float()
        m = (p + q) / 2
        loss = (F.kl_div(m.log(), p, reduction="none")
                + F.kl_div(m.log(), q, reduction="none")) / 2
        want = loss.sum(1).view(B, -1).mean(-1).numpy()
        got = np.asarray(TRAIN_ATTACK_LOSSES["js-avg"](
            jnp.asarray(lg), jnp.asarray(y)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_l2_loss(self, rng):
        from robseg_tpu.attacks.pgd import TRAIN_ATTACK_LOSSES
        lg, _, lg_t, _ = self._logits_labels(rng)
        tgt = rng.normal(size=lg.shape).astype(np.float32)
        want = ((lg_t - torch.from_numpy(np.moveaxis(tgt, -1, 1).copy()))
                ** 2).view(B, -1).sum(-1).numpy()
        got = np.asarray(TRAIN_ATTACK_LOSSES["l2-loss"](
            jnp.asarray(lg), jnp.asarray(tgt)))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_registry_keys_match_reference(self):
        from robseg_tpu.attacks.pgd import TRAIN_ATTACK_LOSSES
        # val.py:121-127 registry surface
        assert set(TRAIN_ATTACK_LOSSES) == {
            "pgd", "mask-ce-avg", "js-avg", "l2-loss"}


class TestPgdAttackRS:
    """pgd_attack_rs vs a torch transcription of ``Pgd_Attack_1.adv_attack``
    (``semseg/val.py:189-218``): shared initial delta, per-step equality."""

    def _torch_rs(self, torch_fn, x_np, y_np, delta0_np, eps, alpha, n_iter):
        x = torch.from_numpy(np.moveaxis(x_np, -1, 1).copy()).double()
        y = torch.from_numpy(y_np).long()
        delta = torch.from_numpy(np.moveaxis(delta0_np, -1, 1).copy()
                                 ).double().requires_grad_(True)
        for _ in range(n_iter):
            logits = torch_fn(x + delta)  # quirk: no clamp in the forward
            loss = F.cross_entropy(logits, y)
            loss.backward()
            g = delta.grad.detach()
            with torch.no_grad():
                delta.data = delta + alpha * torch.sign(g)
                delta.data = (x + delta.data).clamp(0.0, 1.0) - x
                delta.data = delta.data.clamp(-eps, eps)
            delta.grad.zero_()
        return np.moveaxis((x + delta).clamp(0.0, 1.0)
                           .detach().numpy(), 1, -1)

    def test_matches_torch_transcription(self, rng):
        from robseg_tpu.attacks.pgd import pgd_attack_rs
        jax_fn, torch_fn = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float32)
        y = np.asarray(jax_fn(jnp.asarray(x))).argmax(-1).astype(np.int32)
        delta0 = rng.uniform(-EPS, EPS, size=x.shape).astype(np.float32)
        want = self._torch_rs(torch_fn, x, y, delta0, EPS, 1e-2, 6)
        got = np.asarray(pgd_attack_rs(
            jax_fn, jnp.asarray(x), jnp.asarray(y), jax.random.PRNGKey(0),
            eps=EPS, alpha=1e-2, num_iter=6,
            delta_init=jnp.asarray(delta0)))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_random_start_ball_and_range(self, rng):
        from robseg_tpu.attacks.pgd import pgd_attack_rs
        jax_fn, _ = _make_linear_model(rng)
        x = rng.random((B, H, W, 3)).astype(np.float32)
        y = np.asarray(jax_fn(jnp.asarray(x))).argmax(-1).astype(np.int32)
        adv = np.asarray(pgd_attack_rs(
            jax_fn, jnp.asarray(x), jnp.asarray(y), jax.random.PRNGKey(7),
            eps=EPS, alpha=1e-2, num_iter=3))
        assert np.abs(adv - x).max() <= EPS + 1e-6
        assert adv.min() >= 0.0 and adv.max() <= 1.0
        # random start actually perturbs (not the zero-init variant)
        adv2 = np.asarray(pgd_attack_rs(
            jax_fn, jnp.asarray(x), jnp.asarray(y), jax.random.PRNGKey(8),
            eps=EPS, alpha=1e-2, num_iter=3))
        assert np.abs(adv - adv2).max() > 0
