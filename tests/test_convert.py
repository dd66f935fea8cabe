"""Checkpoint-converter tests.

Two layers of verification:
  1. structural: synthesized torch-layout state dicts convert into trees
     whose structure+shapes exactly match `module.init` templates;
  2. numerical: torch implementations of the building blocks (conv+BN+ReLU,
     ConvNeXt block, ViT block) produce the same outputs as our Flax modules
     after weight conversion.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from robseg_tpu import models
from robseg_tpu.convert import (convert_convnext_backbone, convert_upernet,
                                convert_pspnet, convert_segmenter)
from robseg_tpu.models.convnext import ConvNeXtBlock
from robseg_tpu.models.layers import ConvModule
from robseg_tpu.models.vit import Block as VitBlock


def _tree_shapes(tree):
    return {"/".join(str(getattr(k, "key", k)) for k in kp): v.shape
            for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _assert_same_structure(expected, got, allow_missing=()):
    es, gs = _tree_shapes(expected), _tree_shapes(got)
    missing = set(es) - set(gs)
    missing = {m for m in missing
               if not any(m.startswith(a) for a in allow_missing)}
    extra = set(gs) - set(es)
    assert not missing, f"missing converted params: {sorted(missing)[:10]}"
    assert not extra, f"unexpected converted params: {sorted(extra)[:10]}"
    for k in gs:
        if k in es:
            assert es[k] == tuple(gs[k]), (k, es[k], gs[k])


class TestNumericalBlockParity:
    def test_conv_module_matches_torch(self, rng):
        cin, cout = 5, 7
        tconv = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        tbn = nn.BatchNorm2d(cout).eval()
        with torch.no_grad():
            tbn.weight.copy_(torch.rand(cout) + 0.5)
            tbn.bias.copy_(torch.rand(cout))
            tbn.running_mean.copy_(torch.randn(cout) * 0.1)
            tbn.running_var.copy_(torch.rand(cout) + 0.5)
        x = rng.random((2, 9, 9, cin)).astype(np.float32)
        ref = F.relu(tbn(tconv(torch.from_numpy(
            np.moveaxis(x, -1, 1).copy())))).detach().numpy()

        m = ConvModule(cout, kernel_size=3, padding=1)
        params = {
            "conv": {"kernel": np.transpose(
                tconv.weight.detach().numpy(), (2, 3, 1, 0))},
            "bn": {"scale": tbn.weight.detach().numpy(),
                   "bias": tbn.bias.detach().numpy()},
        }
        stats = {"bn": {"mean": tbn.running_mean.numpy(),
                        "var": tbn.running_var.numpy()}}
        out = m.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out),
                                   np.moveaxis(ref, 1, -1), atol=2e-5)

    def test_convnext_block_matches_torch(self, rng):
        dim = 8
        x = rng.random((1, 6, 6, dim)).astype(np.float32)
        dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        ln_w = torch.rand(dim) + 0.5
        ln_b = torch.randn(dim) * 0.1
        fc1 = nn.Linear(dim, 4 * dim)
        fc2 = nn.Linear(4 * dim, dim)
        gamma = torch.rand(dim)

        with torch.no_grad():
            tx = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
            y = dw(tx).permute(0, 2, 3, 1)
            y = F.layer_norm(y, (dim,), ln_w, ln_b, 1e-6)
            y = fc2(F.gelu(fc1(y)))
            y = gamma * y
            ref = (tx + y.permute(0, 3, 1, 2)).numpy()

        m = ConvNeXtBlock(dim)
        params = {
            "dwconv": {"kernel": np.transpose(
                dw.weight.detach().numpy(), (2, 3, 1, 0)),
                "bias": dw.bias.detach().numpy()},
            "norm": {"scale": ln_w.numpy(), "bias": ln_b.numpy()},
            "pwconv1": {"kernel": fc1.weight.detach().numpy().T,
                        "bias": fc1.bias.detach().numpy()},
            "pwconv2": {"kernel": fc2.weight.detach().numpy().T,
                        "bias": fc2.bias.detach().numpy()},
            "gamma": gamma.numpy(),
        }
        out = m.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out),
                                   np.moveaxis(ref, 1, -1), atol=2e-5)

    def test_vit_block_matches_torch(self, rng):
        dim, heads, n = 16, 4, 10
        x = rng.normal(size=(2, n, dim)).astype(np.float32)
        n1w, n1b = torch.rand(dim) + 0.5, torch.randn(dim) * 0.1
        n2w, n2b = torch.rand(dim) + 0.5, torch.randn(dim) * 0.1
        qkv = nn.Linear(dim, dim * 3)
        proj = nn.Linear(dim, dim)
        fc1 = nn.Linear(dim, dim * 4)
        fc2 = nn.Linear(dim * 4, dim)

        with torch.no_grad():
            tx = torch.from_numpy(x)
            h = F.layer_norm(tx, (dim,), n1w, n1b, 1e-5)
            qkv_o = qkv(h).reshape(2, n, 3, heads, dim // heads
                                   ).permute(2, 0, 3, 1, 4)
            q, k, v = qkv_o[0], qkv_o[1], qkv_o[2]
            att = (q @ k.transpose(-2, -1)) * (dim // heads) ** -0.5
            att = att.softmax(-1)
            h = (att @ v).transpose(1, 2).reshape(2, n, dim)
            tx = tx + proj(h)
            h = F.layer_norm(tx, (dim,), n2w, n2b, 1e-5)
            ref = (tx + fc2(F.gelu(fc1(h)))).numpy()

        m = VitBlock(dim, heads, dim * 4, dropout=0.0, drop_path=0.0)
        params = {
            "norm1": {"scale": n1w.numpy(), "bias": n1b.numpy()},
            "norm2": {"scale": n2w.numpy(), "bias": n2b.numpy()},
            "attn": {"qkv": {"kernel": qkv.weight.detach().numpy().T,
                             "bias": qkv.bias.detach().numpy()},
                     "proj": {"kernel": proj.weight.detach().numpy().T,
                              "bias": proj.bias.detach().numpy()}},
            "mlp": {"fc1": {"kernel": fc1.weight.detach().numpy().T,
                            "bias": fc1.bias.detach().numpy()},
                    "fc2": {"kernel": fc2.weight.detach().numpy().T,
                            "bias": fc2.bias.detach().numpy()}},
        }
        out = m.apply({"params": params}, jnp.asarray(x))
        # LayerNorm eps differs (flax default 1e-6 here); tolerance loose
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def _fake_convnext_sd(variant, cvst_layout, prefix=""):
    """Synthesize a torch-layout state dict with correct shapes."""
    from robseg_tpu.models.convnext import CONVNEXT_SETTINGS
    depths, dims, _, _ = CONVNEXT_SETTINGS[variant]
    rng = np.random.default_rng(0)
    sd = {}

    def add(k, shape):
        sd[prefix + k] = rng.normal(size=shape).astype(np.float32)

    if "CVST" in variant:
        base = "stem.stem" if cvst_layout else "downsample_layers.0.stem"
        add(f"{base}.0.weight", (48, 3, 3, 3))
        add(f"{base}.0.bias", (48,))
        add(f"{base}.1.weight", (48,))
        add(f"{base}.1.bias", (48,))
        add(f"{base}.3.weight", (96, 48, 3, 3))
        add(f"{base}.3.bias", (96,))
        add(f"{base}.4.weight", (96,))
        add(f"{base}.4.bias", (96,))
    else:
        add("downsample_layers.0.0.weight", (dims[0], 3, 4, 4))
        add("downsample_layers.0.0.bias", (dims[0],))
        add("downsample_layers.0.1.weight", (dims[0],))
        add("downsample_layers.0.1.bias", (dims[0],))
    for l in range(1, 4):
        ds = (f"stages.{l}.downsample" if cvst_layout
              else f"downsample_layers.{l}")
        add(f"{ds}.0.weight", (dims[l - 1],))
        add(f"{ds}.0.bias", (dims[l - 1],))
        add(f"{ds}.1.weight", (dims[l], dims[l - 1], 2, 2))
        add(f"{ds}.1.bias", (dims[l],))
    for j in range(4):
        for k in range(depths[j]):
            b = (f"stages.{j}.blocks.{k}" if cvst_layout
                 else f"stages.{j}.{k}")
            dw = "conv_dw" if cvst_layout else "dwconv"
            fc1 = "mlp.fc1" if cvst_layout else "pwconv1"
            fc2 = "mlp.fc2" if cvst_layout else "pwconv2"
            add(f"{b}.gamma", (dims[j],))
            add(f"{b}.{dw}.weight", (dims[j], 1, 7, 7))
            add(f"{b}.{dw}.bias", (dims[j],))
            add(f"{b}.norm.weight", (dims[j],))
            add(f"{b}.norm.bias", (dims[j],))
            add(f"{b}.{fc1}.weight", (4 * dims[j], dims[j]))
            add(f"{b}.{fc1}.bias", (4 * dims[j],))
            add(f"{b}.{fc2}.weight", (dims[j], 4 * dims[j]))
            add(f"{b}.{fc2}.bias", (dims[j],))
    return sd


class TestStructuralConversion:
    def test_convnext_cvst_backbone_structure(self):
        m = models.ConvNeXt("T_CVST")
        template = m.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)))["params"]
        sd = _fake_convnext_sd("T_CVST", cvst_layout=True)
        got = convert_convnext_backbone(sd, "T_CVST", cvst_ckpt_layout=True)
        # robust-ImageNet backbone ckpts lack the per-stage norms
        _assert_same_structure(template, got,
                               allow_missing=("norm0", "norm1", "norm2",
                                              "norm3"))

    def test_pspnet_structure(self):
        m = models.PSPNet(classes=21)
        x = jnp.zeros((1, 33, 33, 3))
        y = jnp.zeros((1, 33, 33), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), x, labels=y)
        template_p = variables["params"]
        template_s = variables["batch_stats"]

        rng = np.random.default_rng(0)
        sd = {}
        shapes = _tree_shapes(template_p)
        stat_shapes = _tree_shapes(template_s)

        # synthesize the torch layout by inverting the converter's key maps
        def t_conv(shape):
            kh, kw, ci, co = shape
            return rng.normal(size=(co, ci, kh, kw)).astype(np.float32)

        # layer0 stem
        for (ci, bi, cname, bname) in [(0, 1, "conv1", "bn1"),
                                       (3, 4, "conv2", "bn2"),
                                       (6, 7, "conv3", "bn3")]:
            sd[f"layer0.{ci}.weight"] = t_conv(
                shapes[f"backbone/{cname}/kernel"])
            n = shapes[f"backbone/{bname}/bn/scale"][0]
            sd[f"layer0.{bi}.weight"] = np.ones(n, np.float32)
            sd[f"layer0.{bi}.bias"] = np.zeros(n, np.float32)
            sd[f"layer0.{bi}.running_mean"] = np.zeros(n, np.float32)
            sd[f"layer0.{bi}.running_var"] = np.ones(n, np.float32)
        for s in range(4):
            for b in range((3, 4, 6, 3)[s]):
                src = f"layer{s + 1}.{b}"
                dst = f"backbone/layer{s + 1}_block{b}"
                for c in (1, 2, 3):
                    sd[f"{src}.conv{c}.weight"] = t_conv(
                        shapes[f"{dst}/conv{c}/kernel"])
                    n = shapes[f"{dst}/bn{c}/bn/scale"][0]
                    sd[f"{src}.bn{c}.weight"] = np.ones(n, np.float32)
                    sd[f"{src}.bn{c}.bias"] = np.zeros(n, np.float32)
                    sd[f"{src}.bn{c}.running_mean"] = np.zeros(n, np.float32)
                    sd[f"{src}.bn{c}.running_var"] = np.ones(n, np.float32)
                if f"{dst}/downsample_conv/kernel" in shapes:
                    sd[f"{src}.downsample.0.weight"] = t_conv(
                        shapes[f"{dst}/downsample_conv/kernel"])
                    n = shapes[f"{dst}/downsample_bn/bn/scale"][0]
                    sd[f"{src}.downsample.1.weight"] = np.ones(n, np.float32)
                    sd[f"{src}.downsample.1.bias"] = np.zeros(n, np.float32)
                    sd[f"{src}.downsample.1.running_mean"] = np.zeros(
                        n, np.float32)
                    sd[f"{src}.downsample.1.running_var"] = np.ones(
                        n, np.float32)
        for i in range(4):
            sd[f"ppm.features.{i}.1.weight"] = t_conv(
                shapes[f"ppm/bin{i}/conv/kernel"])
            n = shapes[f"ppm/bin{i}/bn/scale"][0]
            sd[f"ppm.features.{i}.2.weight"] = np.ones(n, np.float32)
            sd[f"ppm.features.{i}.2.bias"] = np.zeros(n, np.float32)
            sd[f"ppm.features.{i}.2.running_mean"] = np.zeros(n, np.float32)
            sd[f"ppm.features.{i}.2.running_var"] = np.ones(n, np.float32)
        for head, mid in (("cls", 512), ("aux", 256)):
            sd[f"{head}.0.weight"] = t_conv(
                shapes[f"{head}/conv/conv/kernel"])
            sd[f"{head}.1.weight"] = np.ones(mid, np.float32)
            sd[f"{head}.1.bias"] = np.zeros(mid, np.float32)
            sd[f"{head}.1.running_mean"] = np.zeros(mid, np.float32)
            sd[f"{head}.1.running_var"] = np.ones(mid, np.float32)
            sd[f"{head}.4.weight"] = t_conv(
                shapes[f"{head}/classifier/kernel"])
            sd[f"{head}.4.bias"] = np.zeros(21, np.float32)

        got_p, got_s = convert_pspnet(sd)
        _assert_same_structure(template_p, got_p)
        _assert_same_structure(template_s, got_s)

    def test_segmenter_structure(self):
        m = models.create_segmenter("vit_small_patch16_224", n_cls=21,
                                    image_size=(64, 64))
        template = m.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)))["params"]
        shapes = _tree_shapes(template)
        rng = np.random.default_rng(0)
        sd = {}

        def add_lin(src, dst):
            i, o = shapes[f"{dst}/kernel"]
            sd[f"{src}.weight"] = rng.normal(size=(o, i)).astype(np.float32)
            sd[f"{src}.bias"] = np.zeros(o, np.float32)

        def add_ln(src, dst):
            n = shapes[f"{dst}/scale"][0]
            sd[f"{src}.weight"] = np.ones(n, np.float32)
            sd[f"{src}.bias"] = np.zeros(n, np.float32)

        kh, kw, ci, co = shapes["encoder/patch_embed/kernel"]
        sd["encoder.patch_embed.proj.weight"] = rng.normal(
            size=(co, ci, kh, kw)).astype(np.float32)
        sd["encoder.patch_embed.proj.bias"] = np.zeros(co, np.float32)
        sd["encoder.cls_token"] = np.zeros(shapes["encoder/cls_token"],
                                           np.float32)
        sd["encoder.pos_embed"] = np.zeros(shapes["encoder/pos_embed"],
                                           np.float32)
        for i in range(12):
            b = f"encoder.blocks.{i}"
            d = f"encoder/block{i}"
            add_ln(f"{b}.norm1", f"{d}/norm1")
            add_ln(f"{b}.norm2", f"{d}/norm2")
            add_lin(f"{b}.attn.qkv", f"{d}/attn/qkv")
            add_lin(f"{b}.attn.proj", f"{d}/attn/proj")
            add_lin(f"{b}.mlp.fc1", f"{d}/mlp/fc1")
            add_lin(f"{b}.mlp.fc2", f"{d}/mlp/fc2")
        add_ln("encoder.norm", "encoder/norm")
        add_lin("decoder.proj_dec", "decoder/proj_dec")
        sd["decoder.cls_emb"] = np.zeros(shapes["decoder/cls_emb"],
                                         np.float32)
        sd["decoder.proj_patch"] = np.zeros(shapes["decoder/proj_patch"],
                                            np.float32)
        sd["decoder.proj_classes"] = np.zeros(
            shapes["decoder/proj_classes"], np.float32)
        for i in range(2):
            b = f"decoder.blocks.{i}"
            d = f"decoder/block{i}"
            add_ln(f"{b}.norm1", f"{d}/norm1")
            add_ln(f"{b}.norm2", f"{d}/norm2")
            add_lin(f"{b}.attn.qkv", f"{d}/attn/qkv")
            add_lin(f"{b}.attn.proj", f"{d}/attn/proj")
            add_lin(f"{b}.mlp.fc1", f"{d}/mlp/fc1")
            add_lin(f"{b}.mlp.fc2", f"{d}/mlp/fc2")
        add_ln("decoder.decoder_norm", "decoder/decoder_norm")
        add_ln("decoder.mask_norm", "decoder/mask_norm")

        got, _ = convert_segmenter(sd, target_grid=(4, 4))
        _assert_same_structure(template, got)


class TestUperNetFullConversion:
    def test_full_model_structure_and_forward(self, rng):
        """Synthesize a full torch-layout UperNet state dict, convert, and
        run a forward pass with the converted variables."""
        m = models.UperNetForSemanticSegmentation(
            backbone_variant="T_CVST", num_classes=7)
        x = jnp.zeros((1, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        shapes_p = _tree_shapes(variables["params"])
        shapes_s = _tree_shapes(variables["batch_stats"])
        sd = _fake_convnext_sd("T_CVST", cvst_layout=False,
                               prefix="backbone.")
        # per-stage norms present in full-model checkpoints
        for i, d in enumerate((96, 192, 384, 768)):
            sd[f"backbone.norm{i}.weight"] = np.ones(d, np.float32)
            sd[f"backbone.norm{i}.bias"] = np.zeros(d, np.float32)

        rng_np = np.random.default_rng(0)

        def t_conv(shape):
            kh, kw, ci, co = shape
            return rng_np.normal(size=(co, ci, kh, kw)).astype(np.float32)

        def add_cm(src, dst):
            sd[f"{src}.conv.weight"] = t_conv(shapes_p[f"{dst}/conv/kernel"])
            n = shapes_p[f"{dst}/bn/scale"][0]
            sd[f"{src}.batch_norm.weight"] = np.ones(n, np.float32)
            sd[f"{src}.batch_norm.bias"] = np.zeros(n, np.float32)
            sd[f"{src}.batch_norm.running_mean"] = np.zeros(n, np.float32)
            sd[f"{src}.batch_norm.running_var"] = np.ones(n, np.float32)

        for i in range(4):
            add_cm(f"decode_head.psp_modules.{i}.1",
                   f"decode_head/psp_block{i}")
        add_cm("decode_head.bottleneck", "decode_head/bottleneck")
        for i in range(3):
            add_cm(f"decode_head.lateral_convs.{i}", f"decode_head/lateral{i}")
            add_cm(f"decode_head.fpn_convs.{i}", f"decode_head/fpn{i}")
        add_cm("decode_head.fpn_bottleneck", "decode_head/fpn_bottleneck")
        sd["decode_head.classifier.weight"] = t_conv(
            shapes_p["decode_head/classifier/kernel"])
        sd["decode_head.classifier.bias"] = np.zeros(7, np.float32)
        add_cm("auxiliary_head.convs.0", "auxiliary_head/conv0")
        sd["auxiliary_head.classifier.weight"] = t_conv(
            shapes_p["auxiliary_head/classifier/kernel"])
        sd["auxiliary_head.classifier.bias"] = np.zeros(7, np.float32)

        params, stats = convert_upernet(sd, "T_CVST")
        _assert_same_structure(variables["params"], params)
        _assert_same_structure(variables["batch_stats"], stats)
        logits = m.apply({"params": params, "batch_stats": stats},
                         jnp.ones((1, 64, 64, 3)) * 0.5)
        assert logits.shape == (1, 64, 64, 7)
        assert np.all(np.isfinite(np.asarray(logits)))


class TestFullBackboneNumericalParity:
    def test_convnext_cvst_backbone_matches_torch(self, rng):
        """Full-backbone f64 parity: a torch transcription of the CvSt
        ConvNeXt forward (convnext_orig.py:103-358) vs our Flax backbone
        with converted weights — validates stem/downsample/stage/norm wiring
        end-to-end, not just individual blocks."""
        variant = "T_CVST"
        sd = _fake_convnext_sd(variant, cvst_layout=True)
        # add per-stage norms (full-model style)
        dims = (96, 192, 384, 768)
        rng_np = np.random.default_rng(5)
        for i, d in enumerate(dims):
            sd[f"norm{i}.weight"] = (rng_np.random(d).astype(np.float32)
                                     + 0.5)
            sd[f"norm{i}.bias"] = rng_np.normal(size=d).astype(np.float32)

        depths = (3, 3, 9, 3)

        def t(v):
            return torch.from_numpy(v).double()

        def ln_cf(x, w, b):  # channels-first LayerNorm, eps 1e-6
            u = x.mean(1, keepdim=True)
            s = (x - u).pow(2).mean(1, keepdim=True)
            x = (x - u) / torch.sqrt(s + 1e-6)
            return w[:, None, None] * x + b[:, None, None]

        def block(x, p):  # ConvNeXt block, channels-first in/out
            inp = x
            x = F.conv2d(x, t(sd[f"{p}.conv_dw.weight"]),
                         t(sd[f"{p}.conv_dw.bias"]), padding=3,
                         groups=x.shape[1])
            x = x.permute(0, 2, 3, 1)
            x = F.layer_norm(x, (x.shape[-1],), t(sd[f"{p}.norm.weight"]),
                             t(sd[f"{p}.norm.bias"]), 1e-6)
            x = F.linear(x, t(sd[f"{p}.mlp.fc1.weight"]),
                         t(sd[f"{p}.mlp.fc1.bias"]))
            x = F.gelu(x)
            x = F.linear(x, t(sd[f"{p}.mlp.fc2.weight"]),
                         t(sd[f"{p}.mlp.fc2.bias"]))
            x = t(sd[f"{p}.gamma"]) * x
            return inp + x.permute(0, 3, 1, 2)

        def torch_backbone(x_nchw):
            x = F.conv2d(x_nchw, t(sd["stem.stem.0.weight"]),
                         t(sd["stem.stem.0.bias"]), stride=2, padding=1)
            x = ln_cf(x, t(sd["stem.stem.1.weight"]),
                      t(sd["stem.stem.1.bias"]))
            x = F.gelu(x)
            x = F.conv2d(x, t(sd["stem.stem.3.weight"]),
                         t(sd["stem.stem.3.bias"]), stride=2, padding=1)
            x = ln_cf(x, t(sd["stem.stem.4.weight"]),
                      t(sd["stem.stem.4.bias"]))
            x = F.gelu(x)
            outs = []
            for s in range(4):
                if s > 0:
                    x = ln_cf(x, t(sd[f"stages.{s}.downsample.0.weight"]),
                              t(sd[f"stages.{s}.downsample.0.bias"]))
                    x = F.conv2d(x, t(sd[f"stages.{s}.downsample.1.weight"]),
                                 t(sd[f"stages.{s}.downsample.1.bias"]),
                                 stride=2)
                for b in range(depths[s]):
                    x = block(x, f"stages.{s}.blocks.{b}")
                outs.append(ln_cf(x, t(sd[f"norm{s}.weight"]),
                                  t(sd[f"norm{s}.bias"])))
            return outs

        x = rng.random((1, 32, 32, 3)).astype(np.float64)
        with torch.no_grad():
            ref = [o.numpy() for o in torch_backbone(
                torch.from_numpy(np.moveaxis(x, -1, 1).copy()).double())]

        params = convert_convnext_backbone(sd, variant,
                                           cvst_ckpt_layout=True)
        m = models.ConvNeXt(variant)
        jax.config.update("jax_enable_x64", True)
        try:
            feats = m.apply({"params": params}, jnp.asarray(x))
            feats = [np.asarray(f) for f in feats]
        finally:
            jax.config.update("jax_enable_x64", False)
        for f, r in zip(feats, ref):
            np.testing.assert_allclose(f, np.moveaxis(r, 1, -1), atol=1e-10)


class TestUperNetHeadNumericalParity:
    def test_head_matches_torch(self, rng):
        """f64 parity of the full PSP+FPN decode head + aux head against a
        torch transcription of uperforseg.py:203-379, with BN in eval mode
        and converted weights — completes end-to-end logit-parity coverage
        together with the backbone test above."""
        from robseg_tpu.models.upernet import UperNetHead, UperNetFCNHead
        dims = (8, 12, 16, 24)
        ch, ncls = 10, 5
        rng_np = np.random.default_rng(3)

        store = {}

        def cm_params(name, cin, cout, k):
            store[name] = dict(
                w=rng_np.normal(size=(cout, cin, k, k)).astype(np.float64)
                * 0.2,
                scale=(rng_np.random(cout) + 0.5),
                bias=rng_np.normal(size=cout) * 0.1,
                mean=rng_np.normal(size=cout) * 0.1,
                var=(rng_np.random(cout) + 0.5),
            )

        for i in range(4):
            cm_params(f"psp{i}", dims[-1], ch, 1)
        cm_params("bottleneck", dims[-1] + 4 * ch, ch, 3)
        for i in range(3):
            cm_params(f"lat{i}", dims[i], ch, 1)
            cm_params(f"fpn{i}", ch, ch, 3)
        cm_params("fpn_bottleneck", 4 * ch, ch, 3)
        clsW = rng_np.normal(size=(ncls, ch, 1, 1)).astype(np.float64) * 0.2
        clsB = rng_np.normal(size=ncls) * 0.1
        cm_params("aux0", dims[2], 6, 3)
        auxW = rng_np.normal(size=(ncls, 6, 1, 1)).astype(np.float64) * 0.2
        auxB = rng_np.normal(size=ncls) * 0.1

        def t(v):
            return torch.from_numpy(np.asarray(v)).double()

        def cm_t(x, name, pad):
            p = store[name]
            x = F.conv2d(x, t(p["w"]), None, padding=pad)
            x = F.batch_norm(x, t(p["mean"]), t(p["var"]), t(p["scale"]),
                             t(p["bias"]), training=False, eps=1e-5)
            return F.relu(x)

        def up(x, size, ac=False):
            return F.interpolate(x, size=size, mode="bilinear",
                                 align_corners=ac)

        feats_np = [rng_np.random((1, 16 // (2 ** i), 16 // (2 ** i),
                                   dims[i])).astype(np.float64)
                    for i in range(4)]
        tfeats = [torch.from_numpy(np.moveaxis(f, -1, 1).copy()).double()
                  for f in feats_np]

        with torch.no_grad():
            top = tfeats[-1]
            psp_outs = [top]
            for i, s in enumerate((1, 2, 3, 6)):
                p = F.adaptive_avg_pool2d(top, s)
                p = cm_t(p, f"psp{i}", 0)
                psp_outs.append(up(p, top.shape[2:]))
            psp = cm_t(torch.cat(psp_outs, 1), "bottleneck", 1)
            laterals = [cm_t(tfeats[i], f"lat{i}", 0) for i in range(3)]
            laterals.append(psp)
            for i in range(3, 0, -1):
                laterals[i - 1] = laterals[i - 1] + up(
                    laterals[i], laterals[i - 1].shape[2:])
            fpn_outs = [cm_t(laterals[i], f"fpn{i}", 1) for i in range(3)]
            fpn_outs.append(laterals[-1])
            for i in range(3, 0, -1):
                fpn_outs[i] = up(fpn_outs[i], fpn_outs[0].shape[2:])
            xcat = cm_t(torch.cat(fpn_outs, 1), "fpn_bottleneck", 1)
            ref = F.conv2d(xcat, t(clsW), t(clsB)).numpy()
            aux = cm_t(tfeats[2], "aux0", 1)
            ref_aux = F.conv2d(aux, t(auxW), t(auxB)).numpy()

        def cm_j(name):
            p = store[name]
            return ({"conv": {"kernel": np.transpose(p["w"], (2, 3, 1, 0))},
                     "bn": {"scale": p["scale"], "bias": p["bias"]}},
                    {"bn": {"mean": p["mean"], "var": p["var"]}})

        params, stats = {}, {}
        for src, dst in [("psp0", "psp_block0"), ("psp1", "psp_block1"),
                         ("psp2", "psp_block2"), ("psp3", "psp_block3"),
                         ("bottleneck", "bottleneck"),
                         ("lat0", "lateral0"), ("lat1", "lateral1"),
                         ("lat2", "lateral2"), ("fpn0", "fpn0"),
                         ("fpn1", "fpn1"), ("fpn2", "fpn2"),
                         ("fpn_bottleneck", "fpn_bottleneck")]:
            params[dst], stats[dst] = cm_j(src)
        params["classifier"] = {"kernel": np.transpose(clsW, (2, 3, 1, 0)),
                                "bias": clsB}
        aux_p, aux_s = cm_j("aux0")
        aux_params = {"conv0": aux_p,
                      "classifier": {"kernel": np.transpose(auxW,
                                                            (2, 3, 1, 0)),
                                     "bias": auxB}}
        aux_stats = {"conv0": aux_s}

        head = UperNetHead(ncls, in_channels=dims, channels=ch)
        aux_head = UperNetFCNHead(ncls, channels=6)
        jax.config.update("jax_enable_x64", True)
        try:
            got = head.apply({"params": params, "batch_stats": stats},
                             [jnp.asarray(f) for f in feats_np])
            got_aux = aux_head.apply(
                {"params": aux_params, "batch_stats": aux_stats},
                [jnp.asarray(f) for f in feats_np])
            got, got_aux = np.asarray(got), np.asarray(got_aux)
        finally:
            jax.config.update("jax_enable_x64", False)
        np.testing.assert_allclose(got, np.moveaxis(ref, 1, -1), atol=1e-10)
        np.testing.assert_allclose(got_aux, np.moveaxis(ref_aux, 1, -1),
                                   atol=1e-10)


class TestResNetDilationParity:
    def test_dilated_stages_match_torch(self, rng):
        """f64 parity of the deep-base ResNet with the PSPNet dilation
        surgery (layer3 dil 2 / layer4 dil 4, strides 1, downsample stride 1
        — ddcat_psp.py:428-437) against a torch transcription."""
        from robseg_tpu.models.resnet import ResNetStages
        layers = (1, 1, 1, 1)  # one bottleneck per stage keeps it fast
        planes = (4, 8, 16, 32)
        strides = (1, 2, 1, 1)
        dils = (1, 1, 2, 4)
        rng_np = np.random.default_rng(11)
        store = {}

        def bn_p(name, c):
            store[name] = dict(scale=rng_np.random(c) + 0.5,
                               bias=rng_np.normal(size=c) * 0.1,
                               mean=rng_np.normal(size=c) * 0.1,
                               var=rng_np.random(c) + 0.5)

        def conv_p(name, cin, cout, k):
            store[name] = rng_np.normal(size=(cout, cin, k, k)) * 0.2

        # deep-base stem
        conv_p("c1", 3, 4, 3); bn_p("b1", 4)
        conv_p("c2", 4, 4, 3); bn_p("b2", 4)
        conv_p("c3", 4, 8, 3); bn_p("b3", 8)
        inp = 8
        for s in range(4):
            p = planes[s]
            conv_p(f"l{s}.conv1", inp, p, 1); bn_p(f"l{s}.bn1", p)
            conv_p(f"l{s}.conv2", p, p, 3); bn_p(f"l{s}.bn2", p)
            conv_p(f"l{s}.conv3", p, p * 4, 1); bn_p(f"l{s}.bn3", p * 4)
            conv_p(f"l{s}.ds", inp, p * 4, 1); bn_p(f"l{s}.dsbn", p * 4)
            inp = p * 4

        def t(v):
            return torch.from_numpy(np.asarray(v)).double()

        def bn_t(x, name):
            p = store[name]
            return F.batch_norm(x, t(p["mean"]), t(p["var"]), t(p["scale"]),
                                t(p["bias"]), training=False, eps=1e-5)

        def torch_fwd(x):
            x = F.relu(bn_t(F.conv2d(x, t(store["c1"]), None, stride=2,
                                     padding=1), "b1"))
            x = F.relu(bn_t(F.conv2d(x, t(store["c2"]), None, padding=1),
                            "b2"))
            x = F.relu(bn_t(F.conv2d(x, t(store["c3"]), None, padding=1),
                            "b3"))
            x = F.max_pool2d(x, 3, 2, 1)
            outs = []
            for s in range(4):
                res = bn_t(F.conv2d(x, t(store[f"l{s}.ds"]), None,
                                    stride=strides[s]), f"l{s}.dsbn")
                y = F.relu(bn_t(F.conv2d(x, t(store[f"l{s}.conv1"]), None),
                                f"l{s}.bn1"))
                y = F.relu(bn_t(F.conv2d(y, t(store[f"l{s}.conv2"]), None,
                                         stride=strides[s],
                                         padding=dils[s],
                                         dilation=dils[s]), f"l{s}.bn2"))
                y = bn_t(F.conv2d(y, t(store[f"l{s}.conv3"]), None),
                         f"l{s}.bn3")
                x = F.relu(y + res)
                outs.append(x)
            return outs[2].numpy(), outs[3].numpy()

        x_np = rng.random((1, 33, 33, 3)).astype(np.float64)
        with torch.no_grad():
            r3, r4 = torch_fwd(torch.from_numpy(
                np.moveaxis(x_np, -1, 1).copy()).double())

        params, stats = {}, {}

        def put_bn(dst, name):
            p = store[name]
            params.setdefault(dst, {})["bn"] = {"scale": p["scale"],
                                                "bias": p["bias"]}
            stats.setdefault(dst, {})["bn"] = {"mean": p["mean"],
                                               "var": p["var"]}

        def put_conv(dst, name):
            params[dst] = {"kernel": np.transpose(store[name], (2, 3, 1, 0))}

        put_conv("conv1", "c1"); put_bn("bn1", "b1")
        put_conv("conv2", "c2"); put_bn("bn2", "b2")
        put_conv("conv3", "c3"); put_bn("bn3", "b3")
        for s in range(4):
            blk = {}
            bst = {}
            for c in (1, 2, 3):
                blk[f"conv{c}"] = {"kernel": np.transpose(
                    store[f"l{s}.conv{c}"], (2, 3, 1, 0))}
                p = store[f"l{s}.bn{c}"]
                blk[f"bn{c}"] = {"bn": {"scale": p["scale"],
                                        "bias": p["bias"]}}
                bst[f"bn{c}"] = {"bn": {"mean": p["mean"], "var": p["var"]}}
            blk["downsample_conv"] = {"kernel": np.transpose(
                store[f"l{s}.ds"], (2, 3, 1, 0))}
            p = store[f"l{s}.dsbn"]
            blk["downsample_bn"] = {"bn": {"scale": p["scale"],
                                           "bias": p["bias"]}}
            bst["downsample_bn"] = {"bn": {"mean": p["mean"],
                                           "var": p["var"]}}
            params[f"layer{s + 1}_block0"] = blk
            stats[f"layer{s + 1}_block0"] = bst

        m = ResNetStages(layers=layers, deep_base=True,
                         planes=planes, stem_channels=(4, 4, 8))
        jax.config.update("jax_enable_x64", True)
        try:
            f3, f4 = m.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x_np))
            f3, f4 = np.asarray(f3), np.asarray(f4)
        finally:
            jax.config.update("jax_enable_x64", False)
        np.testing.assert_allclose(f3, np.moveaxis(r3, 1, -1), atol=1e-10)
        np.testing.assert_allclose(f4, np.moveaxis(r4, 1, -1), atol=1e-10)


class TestSegmenterFullParity:
    def test_encoder_decoder_composition_matches_torch(self, rng):
        """f64 parity of the full Segmenter path (patch embed + cls token +
        pos embed + blocks + LN; decoder proj + class-embed concat + blocks
        + L2-normalized mask dot-product + mask LN + upsample/unpad) against
        a torch transcription of segmenter.py:212-231 /
        segmenter_decoder.py:76-99 / vit_encoder.py:265-294."""
        d, heads, ncls, ps = 64, 4, 3, 4
        hw = 12  # not divisible by ps=4? 12 is; use 10 to exercise padding
        hw = 10
        n_layers, dec_layers = 2, 1
        rng_np = np.random.default_rng(2)
        store = {}

        def lin(name, cin, cout):
            store[name] = (rng_np.normal(size=(cout, cin)) * 0.2,
                           rng_np.normal(size=cout) * 0.1)

        def ln(name, c):
            store[name] = (rng_np.random(c) + 0.5,
                           rng_np.normal(size=c) * 0.1)

        store["patch_w"] = rng_np.normal(size=(d, 3, ps, ps)) * 0.2
        store["patch_b"] = rng_np.normal(size=d) * 0.1
        grid = 12 // ps  # native grid from image_size=12
        store["cls_token"] = rng_np.normal(size=(1, 1, d)) * 0.02
        store["pos"] = rng_np.normal(size=(1, grid * grid + 1, d)) * 0.02
        for i in range(n_layers):
            ln(f"e{i}.n1", d); ln(f"e{i}.n2", d)
            lin(f"e{i}.qkv", d, 3 * d); lin(f"e{i}.proj", d, d)
            lin(f"e{i}.fc1", d, 4 * d); lin(f"e{i}.fc2", 4 * d, d)
        ln("enorm", d)
        lin("proj_dec", d, d)
        store["cls_emb"] = rng_np.normal(size=(1, ncls, d)) * 0.02
        for i in range(dec_layers):
            ln(f"d{i}.n1", d); ln(f"d{i}.n2", d)
            lin(f"d{i}.qkv", d, 3 * d); lin(f"d{i}.proj", d, d)
            lin(f"d{i}.fc1", d, 4 * d); lin(f"d{i}.fc2", 4 * d, d)
        ln("dnorm", d)
        store["proj_patch"] = rng_np.normal(size=(d, d)) * (d ** -0.5)
        store["proj_classes"] = rng_np.normal(size=(d, d)) * (d ** -0.5)
        ln("mask_norm", ncls)

        def t(v):
            return torch.from_numpy(np.asarray(v)).double()

        def blk_t(x, p, nh):
            h = F.layer_norm(x, (d,), t(store[f"{p}.n1"][0]),
                             t(store[f"{p}.n1"][1]), 1e-5)
            qkv = F.linear(h, t(store[f"{p}.qkv"][0]), t(store[f"{p}.qkv"][1]))
            b, n, _ = qkv.shape
            qkv = qkv.reshape(b, n, 3, nh, d // nh).permute(
                2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1)) * (d // nh) ** -0.5
            h = (att.softmax(-1) @ v).transpose(1, 2).reshape(b, n, d)
            x = x + F.linear(h, t(store[f"{p}.proj"][0]),
                             t(store[f"{p}.proj"][1]))
            h = F.layer_norm(x, (d,), t(store[f"{p}.n2"][0]),
                             t(store[f"{p}.n2"][1]), 1e-5)
            h = F.gelu(F.linear(h, t(store[f"{p}.fc1"][0]),
                                t(store[f"{p}.fc1"][1])))
            return x + F.linear(h, t(store[f"{p}.fc2"][0]),
                                t(store[f"{p}.fc2"][1]))

        def torch_fwd(x_np):
            im = torch.from_numpy(np.moveaxis(x_np, -1, 1).copy()).double()
            H0, W0 = im.shape[2], im.shape[3]
            pad_h, pad_w = (-H0) % ps, (-W0) % ps
            im = F.pad(im, (0, pad_w, 0, pad_h))
            Hp, Wp = im.shape[2], im.shape[3]
            x = F.conv2d(im, t(store["patch_w"]), t(store["patch_b"]),
                         stride=ps)
            gh, gw = x.shape[2], x.shape[3]
            x = x.flatten(2).transpose(1, 2)
            x = torch.cat([t(store["cls_token"]).expand(1, -1, -1), x], 1)
            pos = t(store["pos"])
            if x.shape[1] != pos.shape[1]:
                tok, gridp = pos[:, :1], pos[0, 1:]
                gridp = gridp.reshape(1, grid, grid, d).permute(0, 3, 1, 2)
                gridp = F.interpolate(gridp, size=(gh, gw), mode="bilinear")
                gridp = gridp.permute(0, 2, 3, 1).reshape(1, gh * gw, d)
                pos = torch.cat([tok, gridp], 1)
            x = x + pos
            for i in range(n_layers):
                x = blk_t(x, f"e{i}", heads)
            x = F.layer_norm(x, (d,), t(store["enorm"][0]),
                             t(store["enorm"][1]), 1e-5)
            x = x[:, 1:]
            x = F.linear(x, t(store["proj_dec"][0]), t(store["proj_dec"][1]))
            x = torch.cat([x, t(store["cls_emb"]).expand(1, -1, -1)], 1)
            for i in range(dec_layers):
                x = blk_t(x, f"d{i}", d // 64)
            x = F.layer_norm(x, (d,), t(store["dnorm"][0]),
                             t(store["dnorm"][1]), 1e-5)
            patches, clsf = x[:, :-ncls], x[:, -ncls:]
            patches = patches @ t(store["proj_patch"])
            clsf = clsf @ t(store["proj_classes"])
            patches = patches / patches.norm(dim=-1, keepdim=True)
            clsf = clsf / clsf.norm(dim=-1, keepdim=True)
            masks = patches @ clsf.transpose(1, 2)
            masks = F.layer_norm(masks, (ncls,), t(store["mask_norm"][0]),
                                 t(store["mask_norm"][1]), 1e-5)
            masks = masks.reshape(1, gh, gw, ncls).permute(0, 3, 1, 2)
            masks = F.interpolate(masks, size=(Hp, Wp), mode="bilinear",
                                  align_corners=False)
            return masks[:, :, :H0, :W0].numpy()

        # build the flax param tree
        def lin_j(name):
            w, b = store[name]
            return {"kernel": w.T, "bias": b}

        def ln_j(name):
            w, b = store[name]
            return {"scale": w, "bias": b}

        def blk_j(p):
            return {"norm1": ln_j(f"{p}.n1"), "norm2": ln_j(f"{p}.n2"),
                    "attn": {"qkv": lin_j(f"{p}.qkv"),
                             "proj": lin_j(f"{p}.proj")},
                    "mlp": {"fc1": lin_j(f"{p}.fc1"),
                            "fc2": lin_j(f"{p}.fc2")}}

        enc = {"patch_embed": {"kernel": np.transpose(store["patch_w"],
                                                      (2, 3, 1, 0)),
                               "bias": store["patch_b"]},
               "cls_token": store["cls_token"], "pos_embed": store["pos"],
               "norm": ln_j("enorm")}
        for i in range(n_layers):
            enc[f"block{i}"] = blk_j(f"e{i}")
        dec = {"proj_dec": lin_j("proj_dec"), "cls_emb": store["cls_emb"],
               "proj_patch": store["proj_patch"],
               "proj_classes": store["proj_classes"],
               "decoder_norm": ln_j("dnorm"), "mask_norm": ln_j("mask_norm")}
        for i in range(dec_layers):
            dec[f"block{i}"] = blk_j(f"d{i}")
        params = {"encoder": enc, "decoder": dec}

        m = models.SegMenter(n_cls=ncls, image_size=(12, 12), patch_size=ps,
                             n_layers=n_layers, d_model=d, n_heads=heads,
                             dropout=0.0, drop_path_rate=0.0,
                             decoder_n_layers=dec_layers)
        x_np = rng.random((1, hw, hw, 3)).astype(np.float64)
        ref = torch_fwd(x_np)
        jax.config.update("jax_enable_x64", True)
        try:
            got = np.asarray(m.apply({"params": params}, jnp.asarray(x_np)))
        finally:
            jax.config.update("jax_enable_x64", False)
        np.testing.assert_allclose(got, np.moveaxis(ref, 1, -1), atol=1e-9)


class TestPIRInit:
    """PIR initialization paths for the three families (VERDICT missing #3).

    UperNet's ConvNeXt path is covered by TestStructuralConversion /
    TestFullBackboneNumericalParity; these cover the two newly wired ones:
    robust ResNet-50 -> PSPNet backbone (``resnet_ddcat.py:213-240``) and
    robust ViT -> Segmenter encoder with pos-embed grid resampling
    (``segmenter.py:144-163``).
    """

    def test_resnet50_into_pspnet_backbone(self, rng):
        from robseg_tpu.convert import convert_resnet_backbone
        m = models.PSPNet(classes=21, deep_base=False)
        x = jnp.zeros((1, 33, 33, 3))
        y = jnp.zeros((1, 33, 33), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), x, labels=y)
        tpl_p = variables["params"]["backbone"]
        tpl_s = variables["batch_stats"]["backbone"]
        shapes = _tree_shapes(tpl_p)

        def t_conv(shape):
            kh, kw, ci, co = shape
            return rng.normal(size=(co, ci, kh, kw)).astype(np.float32)

        sd = {"conv1.weight": t_conv(shapes["conv1/kernel"]),
              "fc.weight": np.zeros((1000, 2048), np.float32),  # ignored
              "fc.bias": np.zeros(1000, np.float32)}
        n = shapes["bn1/bn/scale"][0]
        for k, v in (("weight", np.ones(n)), ("bias", np.zeros(n)),
                     ("running_mean", np.zeros(n)),
                     ("running_var", np.ones(n))):
            sd[f"bn1.{k}"] = v.astype(np.float32)
        for s in range(4):
            for b in range((3, 4, 6, 3)[s]):
                src = f"layer{s + 1}.{b}"
                dst = f"layer{s + 1}_block{b}"
                for c in (1, 2, 3):
                    sd[f"{src}.conv{c}.weight"] = t_conv(
                        shapes[f"{dst}/conv{c}/kernel"])
                    n = shapes[f"{dst}/bn{c}/bn/scale"][0]
                    for k, v in (("weight", np.ones(n)),
                                 ("bias", np.zeros(n)),
                                 ("running_mean", np.zeros(n)),
                                 ("running_var", np.ones(n))):
                        sd[f"{src}.bn{c}.{k}"] = v.astype(np.float32)
                if f"{dst}/downsample_conv/kernel" in shapes:
                    sd[f"{src}.downsample.0.weight"] = t_conv(
                        shapes[f"{dst}/downsample_conv/kernel"])
                    n = shapes[f"{dst}/downsample_bn/bn/scale"][0]
                    for k, v in (("weight", np.ones(n)),
                                 ("bias", np.zeros(n)),
                                 ("running_mean", np.zeros(n)),
                                 ("running_var", np.ones(n))):
                        sd[f"{src}.downsample.1.{k}"] = v.astype(np.float32)

        got_p, got_s = convert_resnet_backbone(sd, deep_base=False)
        _assert_same_structure(tpl_p, got_p)
        _assert_same_structure(tpl_s, got_s)
        # conv kernel layout: OIHW -> HWIO
        np.testing.assert_allclose(
            got_p["conv1"]["kernel"],
            np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
        # merged model still applies
        merged = {"params": {**variables["params"], "backbone": got_p},
                  "batch_stats": {**variables["batch_stats"],
                                  "backbone": got_s}}
        out = m.apply(merged, x)
        assert out.shape == (1, 33, 33, 21)

    def test_vit_into_segmenter_encoder_with_pos_resize(self, rng):
        """An ImageNet-384 ViT pos-embed (24x24+1 at patch16... scaled down
        here: 6x6+1) resamples onto the model's smaller grid (2x2+1)."""
        from robseg_tpu.convert import convert_vit_encoder
        m = models.create_segmenter("vit_tiny_patch16_384", n_cls=5,
                                    image_size=(32, 32))
        variables = m.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)))
        tpl_enc = variables["params"]["encoder"]
        shapes = _tree_shapes(tpl_enc)
        sd = {}

        def add_lin(src, dst):
            i, o = shapes[f"{dst}/kernel"]
            sd[f"{src}.weight"] = rng.normal(size=(o, i)).astype(np.float32)
            sd[f"{src}.bias"] = np.zeros(o, np.float32)

        def add_ln(src, dst):
            n = shapes[f"{dst}/scale"][0]
            sd[f"{src}.weight"] = np.ones(n, np.float32)
            sd[f"{src}.bias"] = np.zeros(n, np.float32)

        kh, kw, ci, co = shapes["patch_embed/kernel"]
        sd["patch_embed.proj.weight"] = rng.normal(
            size=(co, ci, kh, kw)).astype(np.float32)
        sd["patch_embed.proj.bias"] = np.zeros(co, np.float32)
        sd["cls_token"] = np.zeros(shapes["cls_token"], np.float32)
        # checkpoint carries a LARGER grid than the model: 6x6+1 tokens
        sd["pos_embed"] = rng.normal(size=(1, 37, co)).astype(np.float32)
        for i in range(12):
            b = f"blocks.{i}"
            d = f"block{i}"
            add_ln(f"{b}.norm1", f"{d}/norm1")
            add_ln(f"{b}.norm2", f"{d}/norm2")
            add_lin(f"{b}.attn.qkv", f"{d}/attn/qkv")
            add_lin(f"{b}.attn.proj", f"{d}/attn/proj")
            add_lin(f"{b}.mlp.fc1", f"{d}/mlp/fc1")
            add_lin(f"{b}.mlp.fc2", f"{d}/mlp/fc2")
        add_ln("norm", "norm")

        enc = convert_vit_encoder(sd, n_layers=12, target_grid=(2, 2))
        _assert_same_structure(tpl_enc, enc)
        assert enc["pos_embed"].shape == tpl_enc["pos_embed"].shape
        merged = {"params": {**variables["params"], "encoder": enc}}
        out = m.apply(merged, jnp.zeros((1, 32, 32, 3)))
        assert out.shape == (1, 32, 32, 5)


class TestDDCATNumericalParity:
    """f64 parity of the DDCAT dual-branch blending (VERDICT weak #3):
    normal/adversarial classifier pair + 2-way mask argmax selector + aux,
    vs a torch transcription of ``ddcat_psp.py:595-668`` sharing the same
    weights. Covers PPM + _ClsHead + blending wiring numerically."""

    def test_pspnet_ddcat_matches_torch(self, rng):
        from robseg_tpu.models.pspnet import PSPNetDDCAT

        m = PSPNetDDCAT(classes=5, bins=(1, 2), dropout=0.0,
                        backbone_layers=(1, 1, 1, 1),
                        backbone_planes=(4, 8, 16, 32),
                        head_width=16, aux_width=8)
        x_np = rng.random((2, 17, 17, 3)).astype(np.float64)
        variables = m.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 17, 17, 3), jnp.float32))
        # randomize every leaf so BN/conv paths are all exercised
        rngs = np.random.default_rng(5)
        params = jax.tree.map(
            lambda a: rngs.normal(size=a.shape).astype(np.float64) * 0.2,
            variables["params"])
        stats = jax.tree.map(
            lambda a: (rngs.random(a.shape) + 0.5).astype(np.float64),
            variables["batch_stats"])

        def g(tree, path):
            for p in path.split("/"):
                tree = tree[p]
            return tree

        def t(v):
            return torch.from_numpy(np.asarray(v)).double()

        def conv_t(x, tree, path, stride=1, pad=0, dil=1):
            k = t(np.transpose(g(tree, path + "/kernel"), (3, 2, 0, 1)))
            b = (t(g(tree, path + "/bias"))
                 if "bias" in g(tree, path) else None)
            return F.conv2d(x, k, b, stride=stride, padding=pad,
                            dilation=dil)

        def bn_t(x, path):
            return F.batch_norm(
                x, t(g(stats, path + "/bn/mean")),
                t(g(stats, path + "/bn/var")),
                t(g(params, path + "/bn/scale")),
                t(g(params, path + "/bn/bias")), training=False, eps=1e-5)

        def cbr(x, path, pad=1, dil=1):
            return F.relu(bn_t(conv_t(x, params, path + "/conv", pad=pad,
                                      dil=dil), path))

        def head(x, path):
            h = F.relu(bn_t(conv_t(x, params, f"{path}/conv/conv", pad=1),
                            f"{path}/conv"))
            return conv_t(h, params, f"{path}/classifier")

        def torch_fwd(xin):
            strides, dils = (1, 2, 1, 1), (1, 1, 2, 4)
            bb = "backbone"
            x = F.relu(bn_t(conv_t(xin, params, f"{bb}/conv1", stride=2,
                                   pad=3), f"{bb}/bn1"))
            x = F.max_pool2d(x, 3, 2, 1)
            feats = []
            for s in range(4):
                blk = f"{bb}/layer{s + 1}_block0"
                res = x
                if "downsample_conv" in g(params, bb)[f"layer{s + 1}_block0"]:
                    res = bn_t(conv_t(x, params, f"{blk}/downsample_conv",
                                      stride=strides[s]),
                               f"{blk}/downsample_bn")
                y = F.relu(bn_t(conv_t(x, params, f"{blk}/conv1"),
                                f"{blk}/bn1"))
                y = F.relu(bn_t(conv_t(y, params, f"{blk}/conv2",
                                       stride=strides[s], pad=dils[s],
                                       dil=dils[s]), f"{blk}/bn2"))
                y = bn_t(conv_t(y, params, f"{blk}/conv3"), f"{blk}/bn3")
                x = F.relu(y + res)
                feats.append(x)
            x3, x4 = feats[2], feats[3]
            outs = [x4]
            for i, b in enumerate((1, 2)):
                p = F.adaptive_avg_pool2d(x4, b)
                p = cbr(p, f"ppm/bin{i}", pad=0)
                outs.append(F.interpolate(p, size=x4.shape[-2:],
                                          mode="bilinear",
                                          align_corners=True))
            feat = torch.cat(outs, 1)
            hw = ((17 - 1) // 8 * 8 + 1,) * 2
            up = lambda z: F.interpolate(z, size=hw, mode="bilinear",  # noqa
                                         align_corners=True)
            normal = up(head(feat, "cls1"))
            adver = up(head(feat, "cls2"))
            mask = up(head(feat, "mask1"))
            sel = mask.max(1)[1].unsqueeze(1).expand_as(adver).double()
            final = sel * adver + (1 - sel) * normal
            aux = up(head(x3, "aux_cls1"))
            return final, aux, mask, normal

        with torch.no_grad():
            tf, ta, tm, tn = torch_fwd(
                torch.from_numpy(np.moveaxis(x_np, -1, 1).copy()).double())

        jax.config.update("jax_enable_x64", True)
        try:
            final, aux, mask, normal = m.apply(
                {"params": params, "batch_stats": stats},
                jnp.asarray(x_np), train=False, indicate=1)
            # eval path (indicate=0) returns the normal branch only
            ev = m.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(x_np))
        finally:
            jax.config.update("jax_enable_x64", False)
        for got, ref in ((final, tf), (aux, ta), (mask, tm), (normal, tn)):
            np.testing.assert_allclose(np.asarray(got),
                                       np.moveaxis(ref.numpy(), 1, -1),
                                       atol=5e-8)
        np.testing.assert_allclose(np.asarray(ev),
                                   np.moveaxis(tn.numpy(), 1, -1),
                                   atol=5e-8)
