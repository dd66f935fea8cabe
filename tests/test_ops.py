"""Unit tests for robseg_tpu.ops against torch functional semantics."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from robseg_tpu import ops

B, H, W, C = 2, 7, 5, 6
IGN = -1


def _rand_logits_labels(rng, ignore_frac=0.2):
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
    mask = rng.random(size=(B, H, W)) < ignore_frac
    labels = np.where(mask, IGN, labels)
    return logits, labels


def _torch_logits(logits):
    return torch.from_numpy(np.moveaxis(logits, -1, 1).copy())


class TestMetrics:
    def test_confusion_matrix_matches_bincount(self, rng):
        pred = rng.integers(0, C, size=(B, H, W))
        _, target = _rand_logits_labels(rng)
        hist = np.asarray(ops.confusion_matrix(
            jnp.asarray(pred), jnp.asarray(target), num_classes=C))
        # reference semantics: semseg/metrics.py:27-33
        keep = target != IGN
        expected = np.bincount(
            target[keep] * C + pred[keep], minlength=C * C).reshape(C, C)
        np.testing.assert_array_equal(hist, expected)

    def test_iou_acc_summary_matches_reference_loops(self, rng):
        pred = rng.integers(0, C, size=(B, H, W))
        _, target = _rand_logits_labels(rng)
        macc, aacc, miou = ops.iou_acc_summary(
            jnp.asarray(pred), jnp.asarray(target), num_classes=C)
        # direct transcription of semseg/attacker.py:9-52 semantics in numpy
        p = pred.copy()
        p[target == IGN] = IGN
        acc_cls = np.zeros(C)
        n_pxl = np.zeros(C)
        int_cls = np.zeros(C)
        uni_cls = np.zeros(C)
        correct = p == target
        for cl in range(C):
            ind = target == cl
            acc_cls[cl] = (correct & ind).sum()
            n_pxl[cl] = ind.sum()
            int_cls[cl] = (correct & ind).sum()
            uni_cls[cl] = ind.sum() + (p == cl).sum() - int_cls[cl]
        sel = n_pxl > 0
        assert np.isclose(float(macc), (acc_cls[sel] / n_pxl[sel]).mean())
        assert np.isclose(float(aacc), acc_cls.sum() / n_pxl.sum())
        sel = uni_cls > 0
        assert np.isclose(float(miou), (int_cls[sel] / uni_cls[sel]).mean(),
                          atol=1e-6)

    def test_per_image_intersect_union(self, rng):
        pred = rng.integers(0, C, size=(B, H, W))
        _, target = _rand_logits_labels(rng)
        inter, union = ops.per_image_intersect_union(
            jnp.asarray(pred), jnp.asarray(target), num_classes=C)
        for b in range(B):
            p = pred[b].copy()
            t = target[b]
            p[t == IGN] = IGN
            eq = p == t
            for cl in range(C):
                ind = t == cl
                i_ref = (eq & ind).sum()
                u_ref = ind.sum() + (p == cl).sum() - i_ref
                assert inter[b, cl] == i_ref
                assert union[b, cl] == u_ref


class TestLosses:
    def test_cross_entropy_matches_torch(self, rng):
        logits, labels = _rand_logits_labels(rng)
        ours = np.asarray(ops.cross_entropy_pixelwise(
            jnp.asarray(logits), jnp.asarray(labels)))
        ref = F.cross_entropy(_torch_logits(logits),
                              torch.from_numpy(labels).long(),
                              reduction="none", ignore_index=IGN).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_weighted_cross_entropy_matches_torch(self, rng):
        logits, labels = _rand_logits_labels(rng)
        w = rng.random(C).astype(np.float32) + 0.1
        ours = np.asarray(ops.cross_entropy_pixelwise(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w)))
        ref = F.cross_entropy(_torch_logits(logits),
                              torch.from_numpy(labels).long(),
                              reduction="none", ignore_index=IGN,
                              weight=torch.from_numpy(w)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_masked_ce_matches_reference_formula(self, rng):
        logits, labels = _rand_logits_labels(rng)
        tl = _torch_logits(logits)
        ty = torch.from_numpy(labels).long()
        # semseg/attacker.py:143-152 transcription
        mask = (tl.max(1)[1] == ty) & (ty != IGN)
        ref = (mask.float() * F.cross_entropy(
            tl, ty, reduction="none", ignore_index=IGN)).numpy()
        ours = np.asarray(ops.masked_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_js_loss_matches_torch_kldiv(self, rng):
        logits, labels = _rand_logits_labels(rng)
        tl = _torch_logits(logits)
        ty = torch.from_numpy(labels).long()
        # semseg/attacker.py:187-234 transcription
        p = F.softmax(tl, 1)
        mask_bg = (ty != IGN).long()
        q = F.one_hot((mask_bg * ty).view(ty.shape[0], -1), C)
        q = q.permute(0, 2, 1).view(p.shape).float()
        m = (p + q) / 2
        loss = (F.kl_div(m.log(), p, reduction="none")
                + F.kl_div(m.log(), q, reduction="none")) / 2
        loss = (mask_bg.unsqueeze(1) * loss).sum(1).numpy()
        ours = np.asarray(ops.js_loss(jnp.asarray(logits), jnp.asarray(labels)))
        np.testing.assert_allclose(ours, loss, atol=1e-4)

    def test_js_loss_nonnegative_and_zero_at_onehot(self):
        labels = np.zeros((1, 2, 2), np.int32)
        perfect = np.full((1, 2, 2, C), -50.0, np.float32)
        perfect[..., 0] = 50.0
        val = np.asarray(ops.js_loss(jnp.asarray(perfect), jnp.asarray(labels)))
        assert np.all(val >= -1e-7)
        assert np.allclose(val, 0.0, atol=1e-5)

    def test_pixel_to_img_loss_divides_by_all_pixels(self, rng):
        loss = rng.random((B, H, W)).astype(np.float32)
        mask = (rng.random((B, H, W)) > 0.3).astype(np.float32)
        out = np.asarray(ops.pixel_to_img_loss(jnp.asarray(loss),
                                               jnp.asarray(mask)))
        ref = (loss * mask).reshape(B, -1).mean(-1)
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_mean_ce_matches_torch(self, rng):
        logits, labels = _rand_logits_labels(rng)
        ours = float(ops.segmentation_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels)))
        ref = F.cross_entropy(_torch_logits(logits),
                              torch.from_numpy(labels).long(),
                              ignore_index=IGN).item()
        assert np.isclose(ours, ref, atol=1e-6)

    def test_ohem_matches_torch(self, rng):
        logits, labels = _rand_logits_labels(rng)
        ours = float(ops.ohem_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels)))
        # semseg/losses.py:46-55 transcription
        tl, ty = _torch_logits(logits), torch.from_numpy(labels).long()
        n_min = ty[ty != IGN].numel() // 16
        loss = F.cross_entropy(tl, ty, reduction="none",
                               ignore_index=IGN).view(-1)
        thresh = -torch.log(torch.tensor(0.7))
        loss_hard = loss[loss > thresh]
        if loss_hard.numel() < n_min:
            loss_hard, _ = loss.topk(n_min)
        assert np.isclose(ours, loss_hard.mean().item(), atol=1e-6)


class TestProjections:
    def test_linf(self, rng):
        x = rng.random((B, H, W, 3)).astype(np.float32)
        xa = x + rng.normal(size=x.shape).astype(np.float32) * 0.3
        out = np.asarray(ops.project_linf(jnp.asarray(xa), jnp.asarray(x),
                                          8 / 255))
        assert np.all(np.abs(out - x) <= 8 / 255 + 1e-7)
        assert out.min() >= 0 and out.max() <= 1

    def test_l2(self, rng):
        x = rng.random((B, H, W, 3)).astype(np.float32)
        xa = x + rng.normal(size=x.shape).astype(np.float32)
        out = np.asarray(ops.project_l2(jnp.asarray(xa), jnp.asarray(x), 1.0))
        assert out.min() >= 0 and out.max() <= 1

    def test_l1_projection_feasible(self, rng):
        x = rng.random((4, 6, 6, 3)).astype(np.float32)
        y = rng.normal(size=x.shape).astype(np.float32) * 0.5
        y = np.clip(x + y, 0, 1) - x  # box-feasible start
        eps1 = 5.0
        delta = np.asarray(ops.project_l1_ball_box(
            jnp.asarray(x), jnp.asarray(y), eps1))
        z = y + delta
        l1 = np.abs(z.reshape(4, -1)).sum(-1)
        assert np.all(l1 <= eps1 + 1e-3)
        assert np.all(x + z >= -1e-5) and np.all(x + z <= 1 + 1e-5)


class TestResize:
    @pytest.mark.parametrize("align", [False, True])
    @pytest.mark.parametrize("shape", [((5, 7), (15, 20)), ((16, 16), (7, 9)),
                                       ((1, 3), (4, 4))])
    def test_bilinear_matches_torch(self, rng, align, shape):
        (h, w), (oh, ow) = shape
        x = rng.random((B, h, w, 3)).astype(np.float32)
        ours = np.asarray(ops.resize_bilinear(jnp.asarray(x), (oh, ow),
                                              align_corners=align))
        ref = F.interpolate(torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
                            size=(oh, ow), mode="bilinear",
                            align_corners=align).numpy()
        np.testing.assert_allclose(ours, np.moveaxis(ref, 1, -1), atol=1e-5)

    @pytest.mark.parametrize("bins", [1, 2, 3, 6])
    def test_adaptive_pool_matches_torch(self, rng, bins):
        x = rng.random((B, 15, 17, 4)).astype(np.float32)
        ours = np.asarray(ops.adaptive_avg_pool(jnp.asarray(x), (bins, bins)))
        ref = F.adaptive_avg_pool2d(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy()), bins).numpy()
        np.testing.assert_allclose(ours, np.moveaxis(ref, 1, -1), atol=1e-5)


class TestLegacyAttackLosses:
    """Direct torch differentials for the shipped-but-untested losses
    (round-3 Weak #2): dlr/dlr_targeted/margin (``attacker.py:123-184``)."""

    def test_dlr_loss_matches_torch(self, rng):
        # classification-shaped (B, C): the reference's only usage shape
        x = rng.normal(size=(8, 6)).astype(np.float32)
        y = rng.integers(0, 6, size=(8,)).astype(np.int64)
        tx, ty = torch.from_numpy(x), torch.from_numpy(y)
        x_sorted, ind_sorted = tx.sort(dim=1)
        ind = (ind_sorted[:, -1] == ty).float()
        want = -(tx[torch.arange(8), ty] - x_sorted[:, -2] * ind
                 - x_sorted[:, -1] * (1.0 - ind)) / (
            x_sorted[:, -1] - x_sorted[:, -3] + 1e-12)
        got = ops.dlr_loss(jnp.asarray(x), jnp.asarray(y.astype(np.int32)))
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-5, atol=1e-6)

    def test_dlr_loss_targeted_matches_torch(self, rng):
        from robseg_tpu.ops.losses import dlr_loss_targeted
        x = rng.normal(size=(8, 6)).astype(np.float32)
        y = rng.integers(0, 6, size=(8,)).astype(np.int64)
        yt = (y + 1 + rng.integers(0, 5, size=(8,))) % 6
        tx, ty, tt = (torch.from_numpy(a) for a in (x, y, yt))
        x_sorted, _ = tx.sort(dim=1)
        u = torch.arange(8)
        want = -(tx[u, ty] - tx[u, tt]) / (
            x_sorted[:, -1] - 0.5 * (x_sorted[:, -3] + x_sorted[:, -4])
            + 1e-12)
        got = dlr_loss_targeted(jnp.asarray(x),
                                jnp.asarray(y.astype(np.int32)),
                                jnp.asarray(yt.astype(np.int32)))
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-5, atol=1e-6)

    def test_margin_loss_matches_torch(self, rng):
        # segmentation-shaped; no ignore pixels (the reference's F.one_hot
        # would reject negatives — train labels are all valid)
        logits, labels = _rand_logits_labels(rng, ignore_frac=0.0)
        pred = _torch_logits(logits)
        target = torch.from_numpy(labels.astype(np.int64))
        sh = target.shape
        n_cls = pred.shape[1]
        yh = F.one_hot(target.view(sh[0], -1), n_cls)
        yh = yh.permute(0, 2, 1).view(pred.shape).float()
        logits_target = (yh * pred).sum(1)
        logits_other = (pred - 1e10 * yh).max(1)[0]
        want = (logits_other - logits_target).numpy()
        got = ops.margin_loss(jnp.asarray(logits), jnp.asarray(labels))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-5)


class TestContrastive:
    """``ops/contrastive.py`` vs torch transcriptions of ``val.py:259-326``
    (dead upstream code, shipped here as research utilities)."""

    def _torch_nt_xent(self, ei, ej, temperature=1.0):
        # transcription of ContrastiveLoss.forward (val.py:269-297)
        b = ei.shape[0]
        z_i = F.normalize(ei.flatten(start_dim=1), dim=1)
        z_j = F.normalize(ej.flatten(start_dim=1), dim=1)
        reps = torch.cat([z_i, z_j], dim=0)
        sim = F.cosine_similarity(reps.unsqueeze(1), reps.unsqueeze(0), dim=2)
        positives = torch.cat([torch.diag(sim, b), torch.diag(sim, -b)])
        neg_mask = (~torch.eye(2 * b, 2 * b, dtype=bool)).float()
        nominator = torch.exp(positives / temperature)
        denominator = neg_mask * torch.exp(sim / temperature)
        return (-torch.log(nominator / denominator.sum(dim=1))).sum() / (2 * b)

    def test_nt_xent_matches_torch(self, rng):
        from robseg_tpu.ops.contrastive import nt_xent_loss
        ei = rng.normal(size=(4, 3, 5)).astype(np.float32)
        ej = rng.normal(size=(4, 3, 5)).astype(np.float32)
        want = self._torch_nt_xent(torch.from_numpy(ei),
                                   torch.from_numpy(ej), 0.7)
        got = nt_xent_loss(jnp.asarray(ei), jnp.asarray(ej), temperature=0.7)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def _torch_ce_unsup(self, out, targets, reduction="mean",
                        targeted=False, alpha=0.0):
        # transcription of ce_unsup (val.py:300-326)
        out = out.flatten(start_dim=1)
        targets = targets.flatten(start_dim=1)
        preds = out @ targets.T
        labels = torch.arange(out.shape[0])
        if targeted:
            if alpha == 0.0:
                labels = (labels + 1) % out.shape[0]
            else:
                labels = torch.argmax(
                    preds - 10 * torch.diag(preds.diag()), dim=1)
        loss = F.cross_entropy(preds, labels, reduction=reduction)
        return -loss if targeted else loss

    @pytest.mark.parametrize("targeted,alpha", [(False, 0.0), (True, 0.0),
                                                (True, 1.0)])
    @pytest.mark.parametrize("reduction", ["mean", "none"])
    def test_ce_unsup_matches_torch(self, rng, targeted, alpha, reduction):
        from robseg_tpu.ops.contrastive import ce_unsup
        out = rng.normal(size=(5, 7)).astype(np.float32)
        tgt = rng.normal(size=(5, 7)).astype(np.float32)
        want = self._torch_ce_unsup(torch.from_numpy(out),
                                    torch.from_numpy(tgt), reduction,
                                    targeted, alpha).numpy()
        got = ce_unsup(jnp.asarray(out), jnp.asarray(tgt),
                       reduction=reduction, targeted=targeted, alpha=alpha)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-6)
