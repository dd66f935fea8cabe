"""Converter differential on torch-TRAINED weights (VERDICT round-3 Next #3).

Every prior conversion test used random init (with randomized BN buffers) or
our own JAX-trained weights. Here the REFERENCE's own models are trained for
a few dozen CPU steps with the reference trainer's exact loss composition
(``train_rob_seg.py:333-347``) and optimizer families, checkpointed through
``torch.save(model.state_dict())`` — the format the reference writes at
``train_rob_seg.py:405-419`` and the one our converters must load — then
converted and diffed:

  * full-model logits at f32 (realistic BN running stats + optimizer-shaped
    weights exercise the whole key map);
  * a short ``apgd_largereps`` SEA attack end-to-end in f64.
"""

import os
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from robseg_tpu import models
from robseg_tpu.convert import convert_pspnet, convert_upernet

_SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "reference_shims")
_REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    if not os.path.isdir(os.path.join(_REF, "semseg")):
        pytest.skip("reference repo not present")
    for p in (_SHIMS, _REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    import semseg.attacker
    import semseg.models
    return semseg


def _train_steps(model, family: str, rng, *, n_steps, hw, n_cls, opt):
    """The reference trainer's inner loop, minus DDP/AMP: train-mode
    forward with labels, family loss composition (``train_rob_seg.py:
    338-347``), backward, step. BN running stats update along the way."""
    model.train()
    for _ in range(n_steps):
        x = torch.from_numpy(rng.random((2, 3, hw, hw)).astype(np.float32))
        y = torch.from_numpy(
            rng.integers(0, n_cls, (2, hw, hw)).astype(np.int64))
        opt.zero_grad()
        if family == "PSPNet":
            main_loss, aux_loss, _ = model(x, y)
            loss = main_loss + 0.4 * aux_loss
        else:  # UperNet
            loss, _ = model(x, y)
        loss.backward()
        opt.step()
    model.eval()


def _roundtrip_sd(model, tmp_path):
    """torch.save/torch.load through a real .pth file — the exact artifact
    ``tools/infer.py:272-273`` consumes."""
    p = os.path.join(str(tmp_path), "model_ckpt_30.pth")
    torch.save(model.state_dict(), p)
    ckpt = torch.load(p, map_location="cpu")
    return {k: v.numpy() for k, v in ckpt.items()}


def _assert_logits_close(got, want, rel=1e-5):
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, atol=rel * scale)
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.999


def _short_attack_diff(ref, jax_fn, tm, x, y, *, loss, n_iter=6,
                       eps=8.0 / 255.0):
    """f64 apgd_largereps end-to-end on the trained weights (``tm`` and
    the params behind ``jax_fn`` must both already be f64)."""
    tx = torch.from_numpy(np.moveaxis(x, -1, 1).copy()).double()
    ty = torch.from_numpy(y).long()
    ref_adv, _, ref_acc = ref.attacker.apgd_largereps(
        tm, tx, ty, None, norm="Linf", eps=eps, n_iter=n_iter, loss=loss,
        verbose=False, early_stop=False, track_loss="ce-avg", use_rs=False,
        ignore_index=-1, num_classes=int(y.max()) + 1)
    from robseg_tpu.attacks import apgd_largereps
    jax.config.update("jax_enable_x64", True)
    try:
        got_adv, _, got_acc = apgd_largereps(
            jax_fn, jnp.asarray(x.astype(np.float64)), jnp.asarray(y),
            norm="Linf", eps=eps, n_iter=n_iter, loss=loss,
            early_stop=False, track_loss="ce-avg", use_rs=False)
        got_adv, got_acc = np.asarray(got_adv), np.asarray(got_acc)
    finally:
        jax.config.update("jax_enable_x64", False)
    np.testing.assert_allclose(
        got_adv, np.moveaxis(ref_adv.detach().numpy(), 1, -1), atol=1e-7)
    np.testing.assert_allclose(got_acc, ref_acc.numpy(), atol=1e-9)


class TestTrainedCheckpointConversion:
    def test_upernet_trained_ckpt_roundtrip(self, ref, rng, tmp_path):
        torch.manual_seed(21)
        tm = ref.models.UperNetForSemanticSegmentation(
            "ConvNeXt-T_CVST", n_cls=8, pretrained=None)
        _train_steps(tm, "UperNet", rng, n_steps=30, hw=64, n_cls=8,
                     opt=torch.optim.AdamW(tm.parameters(), lr=1e-3,
                                           weight_decay=0.05))
        sd = _roundtrip_sd(tm, tmp_path)
        params, stats = convert_upernet(sd, "T_CVST")
        module = models.build_model("UperNetForSemanticSegmentation",
                                    "ConvNeXt-T_CVST", 8)
        variables = {"params": params, "batch_stats": stats}
        x = rng.random((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = np.moveaxis(
                tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy(),
                1, -1)
        got = np.asarray(module.apply(variables, jnp.asarray(x)))
        _assert_logits_close(got, want)

        # short SEA attack end-to-end on the trained weights (f64 on
        # BOTH sides: re-convert from the doubled state dict)
        y = want.argmax(-1).astype(np.int32)
        y[:, 0, :2] = -1
        tm = tm.double()
        p64, s64 = convert_upernet(
            {k: v.numpy() for k, v in tm.state_dict().items()}, "T_CVST")
        v64 = {"params": p64, "batch_stats": s64}
        jax_fn = lambda xx: module.apply(v64, xx)  # noqa: E731
        _short_attack_diff(ref, jax_fn, tm, x.astype(np.float64), y,
                           loss="mask-ce-avg")

    def test_pspnet_trained_ckpt_roundtrip(self, ref, rng, tmp_path):
        """PSPNet for BN-stats coverage: ~110 BatchNorm layers of REAL
        running statistics through the converter key map."""
        torch.manual_seed(22)
        tm = ref.models.PSPNet(layers=50, classes=8, zoom_factor=8,
                               pretrained=False, clean=True)
        _train_steps(tm, "PSPNet", rng, n_steps=20, hw=33, n_cls=8,
                     opt=torch.optim.SGD(tm.parameters(), lr=1e-2,
                                         momentum=0.9, weight_decay=1e-4))
        sd = _roundtrip_sd(tm, tmp_path)
        # trained running stats really moved off init (mean 0 / var 1)
        rm = [v for k, v in sd.items() if k.endswith("running_mean")]
        assert max(float(np.abs(m).max()) for m in rm) > 1e-3
        params, stats = convert_pspnet(sd, deep_base=True)
        module = models.build_model("PSPNet", "", 8, pspnet_clean=True)
        variables = {"params": params, "batch_stats": stats}
        x = rng.random((2, 33, 33, 3)).astype(np.float32)
        with torch.no_grad():
            want = np.moveaxis(
                tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy(),
                1, -1)
        got = np.asarray(module.apply(variables, jnp.asarray(x)))
        _assert_logits_close(got, want)

        y = want.argmax(-1).astype(np.int32)
        tm = tm.double()
        p64, s64 = convert_pspnet(
            {k: v.numpy() for k, v in tm.state_dict().items()},
            deep_base=True)
        v64 = {"params": p64, "batch_stats": s64}
        jax_fn = lambda xx: module.apply(v64, xx)  # noqa: E731
        _short_attack_diff(ref, jax_fn, tm, x.astype(np.float64), y,
                           loss="js-avg")
