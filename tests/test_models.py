"""Model shape/smoke tests (small inputs; CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robseg_tpu import models


def _init_and_apply(module, shape, **kwargs):
    x = jnp.zeros(shape, jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x, **kwargs)
    return module, variables, x


class TestConvNeXtUperNet:
    def test_backbone_pyramid_shapes(self):
        m = models.ConvNeXt("T_CVST")
        x = jnp.zeros((1, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        feats = m.apply(variables, x)
        assert [f.shape for f in feats] == [
            (1, 16, 16, 96), (1, 8, 8, 192), (1, 4, 4, 384), (1, 2, 2, 768)]

    def test_upernet_eval_and_train_mode(self):
        m = models.UperNetForSemanticSegmentation(
            backbone_variant="T_CVST", num_classes=21)
        x = jnp.zeros((2, 64, 64, 3))
        y = jnp.zeros((2, 64, 64), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), x)
        logits = m.apply(variables, x)
        assert logits.shape == (2, 64, 64, 21)
        (loss, logits2), _ = m.apply(
            variables, x, labels=y, train=True,
            mutable=["batch_stats"], rngs={"droppath": jax.random.PRNGKey(1)})
        assert logits2.shape == (2, 64, 64, 21)
        assert jnp.isfinite(loss)


class TestSegmenter:
    def test_forward_pads_and_unpads(self):
        m = models.create_segmenter("vit_small_patch16_224", n_cls=151,
                                    image_size=(64, 64))
        x = jnp.zeros((1, 60, 60, 3))  # not divisible by 16 -> pad to 64
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert out.shape == (1, 60, 60, 151)

    def test_pos_embed_resize_on_other_size(self):
        m = models.create_segmenter("vit_small_patch16_224", n_cls=10,
                                    image_size=(64, 64))
        x64 = jnp.zeros((1, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), x64)
        out = m.apply(variables, jnp.zeros((1, 96, 96, 3)))
        assert out.shape == (1, 96, 96, 10)


class TestPSPNet:
    def test_eval_shape_473_like(self):
        m = models.PSPNet(classes=21)
        x = jnp.zeros((1, 57, 57, 3))  # (57-1) % 8 == 0
        variables = m.init(jax.random.PRNGKey(0), x)
        logits = m.apply(variables, x)
        assert logits.shape == (1, 57, 57, 21)

    def test_train_returns_losses(self):
        m = models.PSPNet(classes=21)
        x = jnp.zeros((2, 57, 57, 3))
        y = jnp.zeros((2, 57, 57), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), x)
        (main, aux, logits), _ = m.apply(
            variables, x, labels=y, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
        assert jnp.isfinite(main) and jnp.isfinite(aux)
        assert logits.shape == (2, 57, 57, 21)

    def test_ddcat_eval_returns_normal_branch(self):
        m = models.PSPNetDDCAT(classes=5)
        x = jnp.zeros((1, 33, 33, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        logits = m.apply(variables, x)
        assert logits.shape == (1, 33, 33, 5)

    def test_deeplab_eval(self):
        m = models.DeepLabV3(classes=5)
        x = jnp.zeros((1, 33, 33, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        logits = m.apply(variables, x)
        assert logits.shape == (1, 33, 33, 5)


class TestWrappers:
    def test_normalize_input(self):
        x = jnp.ones((1, 2, 2, 3)) * 0.5
        out = models.normalize_input(x)
        ref = (0.5 - np.array(models.wrappers.IN_MEAN)) / np.array(
            models.wrappers.IN_STD)
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), ref, rtol=1e-6)

    def test_mask_class(self):
        logits = jnp.arange(2 * 2 * 4, dtype=jnp.float32).reshape(1, 2, 2, 4)
        out = models.mask_class(logits, 0)
        assert out.shape == (1, 2, 2, 3)
        np.testing.assert_array_equal(np.asarray(out[0, 0, 0]), [1, 2, 3])
        out = models.mask_class(logits, 2)
        np.testing.assert_array_equal(np.asarray(out[0, 0, 0]), [0, 1, 3])


class TestModelBundle:
    def test_bundle_logits_and_explicit_params(self):
        from robseg_tpu.models import ModelBundle, PSPNet
        m = PSPNet(classes=5)
        b = ModelBundle.create(m, jax.random.PRNGKey(0),
                               input_shape=(1, 33, 33, 3))
        out = b.logits_fn(jnp.zeros((1, 33, 33, 3)))
        assert out.shape == (1, 33, 33, 5)
        fn = b.make_logits_fn()
        out2 = fn(jnp.zeros((1, 33, 33, 3)))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_bundle_normalize_wrapper(self):
        from robseg_tpu.models import ModelBundle, PSPNet
        m = PSPNet(classes=5)
        b = ModelBundle.create(m, jax.random.PRNGKey(0),
                               input_shape=(1, 33, 33, 3), normalize=True)
        out = b.logits_fn(jnp.full((1, 33, 33, 3), 0.5))
        assert np.all(np.isfinite(np.asarray(out)))


class TestDeepLabDDCAT:
    def test_eval_and_indicate_branches(self):
        m = models.DeepLabV3DDCAT(classes=4)
        x = jnp.zeros((1, 33, 33, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        logits = m.apply(variables, x)
        assert logits.shape == (1, 33, 33, 4)
        final, aux, mask, normal = m.apply(variables, x, indicate=1)
        assert final.shape == (1, 33, 33, 4)
        assert mask.shape == (1, 33, 33, 2)


class TestFusedBuild:
    def test_build_model_fused_flag_same_param_tree(self):
        """--fused builds a kernel-routed UperNet with the IDENTICAL
        parameter tree (checkpoints are interchangeable)."""
        import jax
        import jax.numpy as jnp
        from robseg_tpu import models
        m0 = models.build_model("UperNetForSemanticSegmentation",
                                "ConvNeXt-T_CVST", 5)
        m1 = models.build_model("UperNetForSemanticSegmentation",
                                "ConvNeXt-T_CVST", 5, fused=True)
        assert m1.fused_mlp and m1.fused_mlp_mode == "block"
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        v0 = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
        v1 = jax.jit(m1.init)(jax.random.PRNGKey(0), x)
        t0 = jax.tree.structure(v0)
        t1 = jax.tree.structure(v1)
        assert t0 == t1


class TestSegmenterZoo:
    def test_zoo_covers_reference_yml(self):
        """All 14 ``configs/segmenter.yml:1-115`` model entries are
        buildable, incl. the 4 deit_*_distilled ones."""
        from robseg_tpu.models import SEGMENTER_VARIANTS, create_segmenter
        ref_entries = {
            "deit_tiny_distilled_patch16_224",
            "deit_small_distilled_patch16_224",
            "deit_base_distilled_patch16_224",
            "deit_base_distilled_patch16_384",
            "vit_base_patch16_SAM", "vit_tiny_patch16_384",
            "vit_small_patch32_384", "vit_small_patch16_384",
            "vit_small_patch16_224", "vit_base_patch8_384",
            "vit_base_patch16_384", "vit_base_patch32_384",
            "vit_large_patch16_384", "vit_large_patch32_384",
        }
        assert ref_entries <= set(SEGMENTER_VARIANTS)
        for name in ref_entries:
            m = create_segmenter(name, n_cls=5, image_size=(64, 64))
            assert m.distilled == name.startswith("deit_"), name

    def test_deit_tiny_distilled_forward(self, rng):
        from robseg_tpu.models import create_segmenter
        m = create_segmenter("deit_tiny_distilled_patch16_224", n_cls=5,
                             image_size=(64, 64))
        x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        assert "dist_token" in v["params"]["encoder"]
        # pos_embed sized for 2 extra tokens (4x4 grid + cls + dist)
        assert v["params"]["encoder"]["pos_embed"].shape[1] == 16 + 2
        out = m.apply(v, x)
        assert out.shape == (1, 64, 64, 5)
        assert bool(jnp.isfinite(out).all())
