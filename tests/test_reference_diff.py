"""Differential tests against the ACTUAL reference implementation.

Unlike the golden tests (hand-written torch transcriptions), these import
``/root/reference/semseg`` itself — via the tiny vendored shims in
``tests/reference_shims/`` for its two uninstallable deps (timm 0.6.5,
autoattack) — and check:

  1. full-model logits parity at production geometry for all three
     families, with weights exported from the reference's own randomly
     initialized modules through our converters;
  2. complete ``apgd_largereps`` trajectories (the SEA per-loss attack,
     3 warm-started phases) against ``semseg.attacker.apgd_largereps``
     running the reference's own Python loop — on a small conv net for the
     full 300 iterations in f64, and end-to-end on each real family at
     reduced geometry.

A transcription bug in the golden oracles would be invisible to the golden
tests; it cannot hide from these.
"""

import os
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from robseg_tpu import models
from robseg_tpu.attacks import apgd_largereps
from robseg_tpu.convert import (convert_pspnet, convert_segmenter,
                                convert_upernet)

_SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "reference_shims")
_REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """The reference package, imported once with shimmed deps."""
    if not os.path.isdir(os.path.join(_REF, "semseg")):
        pytest.skip("reference repo not present")
    for p in (_SHIMS, _REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    import semseg.attacker
    import semseg.models
    return semseg


def _randomize_bn_buffers(model, seed=0):
    """Reference modules init BN buffers to mean 0 / var 1 — randomize so
    the converted running stats are actually exercised."""
    g = torch.Generator().manual_seed(seed)
    for name, buf in model.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=g) * 0.2)
        elif name.endswith("running_var"):
            buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)



def _assert_logits_close(got, want, rel=1e-5):
    """f32 parity scaled to the logit magnitude: untrained nets produce
    activations in the hundreds, so absolute tolerances mislead. rel=1e-5
    is the VERDICT's f32 target; argmax must agree essentially everywhere."""
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, atol=rel * scale)
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.999


class TestReferenceLogitsParity:
    """Identical random weights -> full-model logit parity at production
    eval geometry (the protocol's crop sizes, ``tools/infer.py:158-192``)."""

    def test_upernet_convnext_t_cvst_473(self, ref, rng):
        torch.manual_seed(1)
        tm = ref.models.UperNetForSemanticSegmentation(
            "ConvNeXt-T_CVST", n_cls=21, pretrained=None).eval()
        _randomize_bn_buffers(tm)
        params, stats = convert_upernet(_np_sd(tm), "T_CVST")
        module = models.build_model("UperNetForSemanticSegmentation",
                                    "ConvNeXt-T_CVST", 21)
        x = rng.random((1, 473, 473, 3)).astype(np.float32)
        with torch.no_grad():
            want = _nhwc(tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())))
        got = np.asarray(module.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x)))
        assert got.shape == want.shape == (1, 473, 473, 21)
        _assert_logits_close(got, want)

    def test_pspnet_rn50_473(self, ref, rng):
        torch.manual_seed(2)
        tm = ref.models.PSPNet(layers=50, classes=21, zoom_factor=8,
                               pretrained=False, clean=True).eval()
        _randomize_bn_buffers(tm)
        params, stats = convert_pspnet(_np_sd(tm), deep_base=True)
        module = models.build_model("PSPNet", "", 21, pspnet_clean=True)
        x = rng.random((1, 473, 473, 3)).astype(np.float32)
        with torch.no_grad():
            want = _nhwc(tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())))
        got = np.asarray(module.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x)))
        assert got.shape == want.shape == (1, 473, 473, 21)
        _assert_logits_close(got, want)

    def test_segmenter_vit_s_512(self, ref, rng, tmp_path):
        torch.manual_seed(3)
        tm = _make_ref_segmenter(ref, tmp_path, n_cls=150).eval()
        params, _ = convert_segmenter(_np_sd(tm), n_layers=12,
                                      decoder_layers=2, target_grid=(32, 32))
        module = models.create_segmenter("vit_small_patch16_384", 150,
                                         image_size=(512, 512))
        x = rng.random((1, 512, 512, 3)).astype(np.float32)
        with torch.no_grad():
            want = _nhwc(tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())))
        got = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
        assert got.shape == want.shape == (1, 512, 512, 150)
        # softmax -> L2-normalize -> LN chain amplifies f32 noise slightly
        # more than the conv families (measured rel ~1.01e-5, argmax 100%)
        _assert_logits_close(got, want, rel=2e-5)

    def test_segmenter_deit_distilled_128(self, ref, rng, tmp_path):
        """dist-token path end-to-end: the reference's own distilled ViT
        (``vit_encoder.py:227-273`` + the 2-token drop in
        ``segmenter.py:220-224``) vs our ``deit_small_distilled`` zoo entry,
        weights through ``convert_segmenter`` (dist_token included)."""
        torch.manual_seed(7)
        tm = _make_ref_segmenter(ref, tmp_path, n_cls=21, im=128,
                                 distilled=True).eval()
        sd = _np_sd(tm)
        assert "encoder.dist_token" in sd  # the path actually exists
        params, _ = convert_segmenter(sd, n_layers=12, decoder_layers=2,
                                      target_grid=(8, 8))
        assert "dist_token" in params["encoder"]
        module = models.create_segmenter("deit_small_distilled_patch16_224",
                                         21, image_size=(128, 128))
        x = rng.random((1, 128, 128, 3)).astype(np.float32)
        with torch.no_grad():
            want = _nhwc(tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())))
        got = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
        assert got.shape == want.shape == (1, 128, 128, 21)
        _assert_logits_close(got, want, rel=2e-5)


def _make_ref_segmenter(ref, tmp_path, n_cls=150,
                        backbone="vit_small_patch16_384", im=512,
                        distilled=False):
    """Drive the reference's create_segmenter exactly like
    ``load_config_segmenter`` (``semseg/utils/utils.py:258-278``) would;
    the dummy .pth makes its strict load fail into the except->random-init
    branch (``segmenter.py:300-317``)."""
    dummy = os.path.join(str(tmp_path), "dummy.pth")
    torch.save({}, dummy)
    model_cfg = dict(backbone=backbone, image_size=(im, im), patch_size=16,
                     d_model=384, n_heads=6, n_layers=12,
                     normalization="vit", distilled=distilled, dropout=0.0,
                     drop_path_rate=0.1, n_cls=n_cls,
                     decoder=dict(name="mask_transformer",
                                  drop_path_rate=0.0, dropout=0.1,
                                  n_layers=2, n_cls=n_cls))
    return ref.models.create_segmenter(model_cfg, dummy, backbone)


class _TinyConvPair:
    """One tiny conv net in both frameworks with identical f64 weights."""

    def __init__(self, rng, c_out=4):
        self.w1 = rng.normal(size=(3, 3, 3, 8)).astype(np.float64) * 0.5
        self.b1 = rng.normal(size=(8,)).astype(np.float64) * 0.1
        self.w2 = rng.normal(size=(1, 1, 8, c_out)).astype(np.float64)
        self.b2 = rng.normal(size=(c_out,)).astype(np.float64) * 0.1

    def jax_fn(self, x):
        h = jax.lax.conv_general_dilated(
            x, jnp.asarray(self.w1), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(self.b1)
        h = jnp.tanh(h)
        return jax.lax.conv_general_dilated(
            h, jnp.asarray(self.w2), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(self.b2)

    def torch_module(self):
        import torch.nn as nn

        class Net(nn.Module):
            def __init__(self, pair):
                super().__init__()
                self.c1 = nn.Conv2d(3, 8, 3, padding=1).double()
                self.c2 = nn.Conv2d(8, pair.w2.shape[-1], 1).double()
                with torch.no_grad():
                    self.c1.weight.copy_(torch.from_numpy(
                        np.transpose(pair.w1, (3, 2, 0, 1))))
                    self.c1.bias.copy_(torch.from_numpy(pair.b1))
                    self.c2.weight.copy_(torch.from_numpy(
                        np.transpose(pair.w2, (3, 2, 0, 1))))
                    self.c2.bias.copy_(torch.from_numpy(pair.b2))

            def forward(self, x):
                return self.c2(torch.tanh(self.c1(x)))

        return Net(self).eval()


def _run_both_largereps(ref, jax_fn, torch_model, x, y, *, loss, n_iter,
                        eps=8.0 / 255.0, weights=None, atol=1e-9):
    """Run OUR apgd_largereps and the REFERENCE's on the same inputs (f64,
    no random start) and require matching adversarial outputs + accuracy."""
    tw = (torch.from_numpy(np.asarray(weights)).double()
          if weights is not None else None)
    tx = torch.from_numpy(np.moveaxis(x, -1, 1).copy()).double()
    ty = torch.from_numpy(y).long()
    ref_adv, _, ref_acc = ref.attacker.apgd_largereps(
        torch_model, tx, ty, tw, norm="Linf", eps=eps, n_iter=n_iter,
        loss=loss, verbose=False, early_stop=False, track_loss="ce-avg",
        use_rs=False, ignore_index=-1, num_classes=int(y.max()) + 1)

    jax.config.update("jax_enable_x64", True)
    try:
        w = jnp.asarray(weights) if weights is not None else None
        got_adv, _, got_acc = apgd_largereps(
            jax_fn, jnp.asarray(x.astype(np.float64)), jnp.asarray(y),
            weights=w, norm="Linf", eps=eps, n_iter=n_iter, loss=loss,
            early_stop=False, track_loss="ce-avg", use_rs=False)
        got_adv = np.asarray(got_adv)
        got_acc = np.asarray(got_acc)
    finally:
        jax.config.update("jax_enable_x64", False)

    np.testing.assert_allclose(got_adv, _nhwc(ref_adv), atol=atol)
    np.testing.assert_allclose(got_acc, ref_acc.numpy(), atol=1e-9)


def _run_both_single(ref, jax_fn, torch_model, x, y, *, norm, loss, n_iter,
                     eps, weights=None, atol=1e-7):
    """One ``apgd_train`` run (the L2/L1 branches are unreachable from
    ``apgd_largereps`` — its ``_project`` raises for non-Linf,
    ``attacker.py:683-690``) vs our ``apgd_attack``: f64, no random start,
    matching x_best / acc / loss_best / x_best_adv."""
    from robseg_tpu.attacks import apgd_attack
    tw = (torch.from_numpy(np.asarray(weights)).double()
          if weights is not None else None)
    tx = torch.from_numpy(np.moveaxis(x, -1, 1).copy()).double()
    ty = torch.from_numpy(y).long()
    rb, racc, rlb, rba = ref.attacker.apgd_train(
        torch_model, tx, ty, norm, eps, n_iter=n_iter, use_rs=False,
        loss=loss, verbose=False, early_stop=False, track_loss="ce-avg",
        ignore_index=-1, num_classes=int(y.max()) + 1, weights=tw,
        logger=ref.attacker.Logger(None))

    jax.config.update("jax_enable_x64", True)
    try:
        w = jnp.asarray(weights) if weights is not None else None
        res = apgd_attack(
            jax_fn, jnp.asarray(x.astype(np.float64)), jnp.asarray(y),
            norm=norm, eps=eps, n_iter=n_iter, use_rs=False, loss=loss,
            track_loss="ce-avg", early_stop=False, weights=w)
        got_b, got_acc = np.asarray(res.x_best), np.asarray(res.acc)
        got_lb, got_ba = np.asarray(res.loss_best), np.asarray(res.x_best_adv)
    finally:
        jax.config.update("jax_enable_x64", False)
    np.testing.assert_allclose(got_b, _nhwc(rb), atol=atol)
    np.testing.assert_allclose(got_ba, _nhwc(rba), atol=atol)
    np.testing.assert_allclose(got_acc, racc.numpy(), atol=1e-9)
    np.testing.assert_allclose(got_lb, rlb.numpy(), atol=1e-7)


class TestReferenceAPGDTrajectory:
    """Full apgd_largereps trajectories vs the reference's own loop."""

    @pytest.mark.parametrize("norm", ["L2", "L1"])
    def test_tiny_model_l2_l1_full_100_iters(self, ref, rng, norm):
        """The L2/L1 APGD branches (``attacker.py:394-458``: L2 norm-scaled
        step + projection; L1 sparse-gradient step + sparsity-adaptive
        step-size controller) against the reference's own loop."""
        pair = _TinyConvPair(rng)
        x = rng.random((2, 16, 16, 3)).astype(np.float64)
        logits = np.asarray(pair.jax_fn(jnp.asarray(x)))
        y = logits.argmax(-1).astype(np.int32)
        y[:, 0, :2] = -1
        eps = {"L2": 2.0, "L1": 40.0}[norm]
        # L1 atol 1e-6: the sort-based L1-ball projection's dual search
        # walks a few ulp apart over 100 chained f64 iterations (observed:
        # 1 of 1536 elements at 1.7e-7); semantic divergence (wrong sparse
        # set, different step-size adaptation) shows up at 1e-3+
        _run_both_single(ref, pair.jax_fn, pair.torch_module(), x, y,
                         norm=norm, loss="mask-ce-avg", n_iter=100,
                         eps=eps, atol=1e-6 if norm == "L1" else 1e-7)

    @pytest.mark.parametrize("loss", ["mask-ce-avg", "js-avg",
                                      "mask-ce-bal"])
    def test_tiny_model_full_300_iters(self, ref, rng, loss):
        pair = _TinyConvPair(rng)
        x = rng.random((2, 16, 16, 3)).astype(np.float64)
        logits = np.asarray(pair.jax_fn(jnp.asarray(x)))
        y = logits.argmax(-1).astype(np.int32)
        y[:, 0, :2] = -1  # exercise the ignore mask
        weights = (np.abs(rng.normal(size=(4,))) + 0.5
                   if loss == "mask-ce-bal" else None)
        # atol 1e-7: f64 round-off walks a few ulp apart over 300 chained
        # sign-step iterations (observed max ~2e-9); any semantic divergence
        # (a flipped sign, a different step-size halving) shows up at 1e-3+
        _run_both_largereps(ref, pair.jax_fn, pair.torch_module(), x, y,
                            loss=loss, n_iter=300, weights=weights,
                            atol=1e-7)

    def test_upernet_end_to_end(self, ref, rng):
        torch.manual_seed(4)
        tm = ref.models.UperNetForSemanticSegmentation(
            "ConvNeXt-T_CVST", n_cls=8, pretrained=None).double().eval()
        _randomize_bn_buffers(tm)
        params, stats = convert_upernet(_np_sd(tm), "T_CVST")
        module = models.build_model("UperNetForSemanticSegmentation",
                                    "ConvNeXt-T_CVST", 8)
        variables = {"params": params, "batch_stats": stats}
        jax_fn = lambda xx: module.apply(variables, xx)  # noqa: E731
        x = rng.random((1, 64, 64, 3)).astype(np.float64)
        with torch.no_grad():
            y = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()).double()
                   ).argmax(1).numpy().astype(np.int32)
        _run_both_largereps(ref, jax_fn, tm, x, y, loss="mask-ce-avg",
                            n_iter=8, atol=1e-7)

    def test_pspnet_end_to_end(self, ref, rng):
        torch.manual_seed(5)
        tm = ref.models.PSPNet(layers=50, classes=8, zoom_factor=8,
                               pretrained=False, clean=True).double().eval()
        _randomize_bn_buffers(tm)
        params, stats = convert_pspnet(_np_sd(tm), deep_base=True)
        module = models.build_model("PSPNet", "", 8, pspnet_clean=True)
        variables = {"params": params, "batch_stats": stats}
        jax_fn = lambda xx: module.apply(variables, xx)  # noqa: E731
        x = rng.random((1, 65, 65, 3)).astype(np.float64)
        with torch.no_grad():
            y = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()).double()
                   ).argmax(1).numpy().astype(np.int32)
        _run_both_largereps(ref, jax_fn, tm, x, y, loss="mask-ce-avg",
                            n_iter=8, atol=1e-7)

    def test_segmenter_end_to_end(self, ref, rng, tmp_path):
        torch.manual_seed(6)
        tm = _make_ref_segmenter(ref, tmp_path, n_cls=8,
                                 im=64).double().eval()
        params, _ = convert_segmenter(_np_sd(tm), n_layers=12,
                                      decoder_layers=2, target_grid=(4, 4))
        module = models.create_segmenter("vit_small_patch16_384", 8,
                                         image_size=(64, 64))
        variables = {"params": params}
        jax_fn = lambda xx: module.apply(variables, xx)  # noqa: E731
        x = rng.random((1, 64, 64, 3)).astype(np.float64)
        with torch.no_grad():
            y = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()).double()
                   ).argmax(1).numpy().astype(np.int32)
        _run_both_largereps(ref, jax_fn, tm, x, y, loss="js-avg",
                            n_iter=8, atol=1e-7)
