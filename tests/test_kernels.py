"""Pallas kernels vs XLA fallbacks (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from robseg_tpu import ops


class TestConfusionKernel:
    def test_matches_xla_fallback(self, rng):
        from robseg_tpu.kernels.confusion import confusion_matrix_pallas
        pred = rng.integers(0, 21, (2, 64, 96)).astype(np.int32)
        target = rng.integers(-1, 21, (2, 64, 96)).astype(np.int32)
        with pltpu.force_tpu_interpret_mode():
            got = confusion_matrix_pallas(jnp.asarray(pred),
                                          jnp.asarray(target),
                                          num_classes=21)
        want = ops.confusion_matrix(jnp.asarray(pred), jnp.asarray(target),
                                    num_classes=21)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestApgdStepKernel:
    def test_matches_reference_formula(self, rng):
        from robseg_tpu.kernels.apgd_step import apgd_linf_step_pallas
        from robseg_tpu.ops.projections import project_linf
        b = 2
        x = rng.random((b, 8, 16, 3)).astype(np.float32)
        x_adv = np.clip(x + rng.normal(size=x.shape).astype(np.float32)
                        * 0.02, 0, 1)
        x_old = np.clip(x + rng.normal(size=x.shape).astype(np.float32)
                        * 0.02, 0, 1)
        grad = rng.normal(size=x.shape).astype(np.float32)
        step = np.full((b, 1, 1, 1), 0.06, np.float32)
        eps, a = 8 / 255, 0.75

        with pltpu.force_tpu_interpret_mode():
            got = apgd_linf_step_pallas(
                jnp.asarray(x), jnp.asarray(x_adv), jnp.asarray(x_old),
                jnp.asarray(grad), jnp.asarray(step), eps, a)

        z = project_linf(jnp.asarray(x_adv) + jnp.asarray(step)
                         * jnp.sign(jnp.asarray(grad)), jnp.asarray(x), eps)
        want = project_linf(
            jnp.asarray(x_adv) + (z - x_adv) * a
            + (jnp.asarray(x_adv) - x_old) * (1 - a), jnp.asarray(x), eps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


class TestConvNextMlpKernel:
    def _params(self, rng, c=96):
        return dict(
            ln_scale=jnp.asarray(rng.random(c).astype(np.float32) + 0.5),
            ln_bias=jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1),
            w1=jnp.asarray(rng.normal(size=(c, 4 * c)).astype(np.float32)
                           * 0.05),
            b1=jnp.asarray(rng.normal(size=4 * c).astype(np.float32) * 0.1),
            w2=jnp.asarray(rng.normal(size=(4 * c, c)).astype(np.float32)
                           * 0.05),
            b2=jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1),
            gamma=jnp.asarray(rng.random(c).astype(np.float32)),
        )

    def test_forward_matches_reference(self, rng):
        from robseg_tpu.kernels.convnext_mlp import (convnext_mlp_fused,
                                                     convnext_mlp_reference)
        from jax.experimental.pallas import tpu as pltpu
        c = 96  # non-128-aligned channel count exercises padding/masking
        p = self._params(rng, c)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, c)).astype(np.float32))
        want = convnext_mlp_reference(x, **p)
        with pltpu.force_tpu_interpret_mode():
            got = convnext_mlp_fused(x, *[p[k] for k in
                                          ("ln_scale", "ln_bias", "w1", "b1",
                                           "w2", "b2", "gamma")])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_input_gradient_matches_reference(self, rng):
        from robseg_tpu.kernels.convnext_mlp import (convnext_mlp_fused,
                                                     convnext_mlp_reference)
        from jax.experimental.pallas import tpu as pltpu
        c = 96
        p = self._params(rng, c)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, c)).astype(np.float32))
        args = [p[k] for k in ("ln_scale", "ln_bias", "w1", "b1", "w2",
                               "b2", "gamma")]

        def loss_ref(z):
            return (convnext_mlp_reference(z, **p) ** 2).sum()

        def loss_fused(z):
            return (convnext_mlp_fused(z, *args) ** 2).sum()

        want = jax.grad(loss_ref)(x)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_fused)(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=1e-3)

    def test_backbone_fused_matches_default(self, rng):
        """Fused-MLP backbone must match the default path bit-for-bit-ish."""
        from robseg_tpu import models
        from jax.experimental.pallas import tpu as pltpu
        x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        m0 = models.ConvNeXt("T_CVST")
        v = m0.init(jax.random.PRNGKey(0), x)
        want = m0.apply(v, x)
        m1 = models.ConvNeXt("T_CVST", fused_mlp=True)
        with pltpu.force_tpu_interpret_mode():
            got = m1.apply(v, x)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5)


class TestConvNextMlpResidualSaving:
    """Residual-saving variant (fwd writes h once; bwd = 2 matmuls)."""

    def test_forward_and_grad_match_reference(self, rng):
        from robseg_tpu.kernels.convnext_mlp import (convnext_mlp_fused_rs,
                                                     convnext_mlp_reference)
        from jax.experimental.pallas import tpu as pltpu
        c = 96
        p = TestConvNextMlpKernel._params(None, rng, c)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, c)).astype(np.float32))
        args = [p[k] for k in ("ln_scale", "ln_bias", "w1", "b1", "w2",
                               "b2", "gamma")]

        want = convnext_mlp_reference(x, **p)
        want_g = jax.grad(
            lambda z: (convnext_mlp_reference(z, **p) ** 2).sum())(x)
        with pltpu.force_tpu_interpret_mode():
            got = convnext_mlp_fused_rs(x, *args)
            got_g = jax.grad(
                lambda z: (convnext_mlp_fused_rs(z, *args) ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                                   atol=5e-4, rtol=1e-3)

    def test_backbone_residual_mode_matches_default(self, rng):
        from robseg_tpu import models
        from jax.experimental.pallas import tpu as pltpu
        x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        m0 = models.ConvNeXt("T_CVST")
        v = m0.init(jax.random.PRNGKey(0), x)
        want = m0.apply(v, x)
        m1 = models.ConvNeXt("T_CVST", fused_mlp=True,
                             fused_mlp_mode="residual")
        with pltpu.force_tpu_interpret_mode():
            got = m1.apply(v, x)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5)


class TestFusedMLPBf16:
    """bf16-MXU kernel variants: XLA-DEFAULT matmul numerics in Pallas."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(7)

    def _params(self, rng, c):
        return dict(
            ln_scale=jnp.asarray(rng.random(c).astype(np.float32) + 0.5),
            ln_bias=jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1),
            w1=jnp.asarray(rng.normal(size=(c, 4 * c)).astype(np.float32)
                           * 0.05),
            b1=jnp.asarray(rng.normal(size=4 * c).astype(np.float32) * 0.1),
            w2=jnp.asarray(rng.normal(size=(4 * c, c)).astype(np.float32)
                           * 0.05),
            b2=jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1),
            gamma=jnp.asarray(rng.random(c).astype(np.float32)),
        )

    @staticmethod
    def _reference_bf16(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
        """Oracle: pure-JAX block with operands truncated to bf16 at each
        matmul (== XLA DEFAULT precision on TPU, f32 accumulate)."""
        bf = lambda a: a.astype(jnp.bfloat16)  # noqa: E731
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        u = (x - mean) * jax.lax.rsqrt(var + 1e-6) * ln_scale + ln_bias
        h = jnp.dot(bf(u), bf(w1),
                    preferred_element_type=jnp.float32) + b1
        a = jax.nn.gelu(h, approximate=False)
        return gamma * (jnp.dot(bf(a), bf(w2),
                                preferred_element_type=jnp.float32) + b2)

    @pytest.mark.parametrize("which", ["recompute", "rs"])
    def test_forward_matches_bf16_oracle(self, rng, which):
        from robseg_tpu.kernels.convnext_mlp import (
            convnext_mlp_fused_bf16, convnext_mlp_fused_rs_bf16)
        from jax.experimental.pallas import tpu as pltpu
        fn = (convnext_mlp_fused_bf16 if which == "recompute"
              else convnext_mlp_fused_rs_bf16)
        c = 96
        p = self._params(rng, c)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, c)).astype(np.float32))
        want = self._reference_bf16(x, **p)
        with pltpu.force_tpu_interpret_mode():
            got = fn(x, *[p[k] for k in ("ln_scale", "ln_bias", "w1", "b1",
                                         "w2", "b2", "gamma")])
        # same matmul truncation; the erf-poly vs exact-erf difference can
        # flip the bf16 rounding of individual second-matmul operands, so
        # the bound is bf16-ulp-scale, not f32-scale
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3, rtol=1e-2)

    @pytest.mark.parametrize("which", ["recompute", "rs"])
    def test_input_grad_close_to_f32_reference(self, rng, which):
        from robseg_tpu.kernels.convnext_mlp import (
            convnext_mlp_fused_bf16, convnext_mlp_fused_rs_bf16,
            convnext_mlp_reference)
        from jax.experimental.pallas import tpu as pltpu
        fn = (convnext_mlp_fused_bf16 if which == "recompute"
              else convnext_mlp_fused_rs_bf16)
        c = 96
        p = self._params(rng, c)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, c)).astype(np.float32))
        args = [p[k] for k in ("ln_scale", "ln_bias", "w1", "b1", "w2",
                               "b2", "gamma")]
        want = jax.grad(lambda z: (convnext_mlp_reference(z, **p) ** 2)
                        .sum())(x)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(lambda z: (fn(z, *args) ** 2).sum())(x)
        # bf16 truncation noise only — grads must still be close in f32
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-2, rtol=5e-2)


class TestConvNeXtBlockKernel:
    """Whole-block Pallas kernel (kernels/convnext_block.py)."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(11)

    def _params(self, rng, c):
        return [jnp.asarray(a.astype(np.float32)) for a in (
            rng.normal(size=(7, 7, c)) * 0.1,        # dw
            rng.normal(size=c) * 0.1,                # dwb
            rng.random(c) + 0.5,                     # ls
            rng.normal(size=c) * 0.1,                # lb
            rng.normal(size=(c, 4 * c)) * 0.05,      # w1
            rng.normal(size=4 * c) * 0.1,            # b1
            rng.normal(size=(4 * c, c)) * 0.05,      # w2
            rng.normal(size=c) * 0.1,                # b2
            rng.random(c),                           # gamma
        )]

    def test_fwd_and_input_grad_exact_with_f32_dots(self, rng, monkeypatch):
        """With bf16 truncation disabled the kernel must match the pure-JAX
        block to f32 noise — validates halos, masking, LN bwd, and the
        7x7 correlation in the VJP."""
        from robseg_tpu.kernels import convnext_block as cb
        monkeypatch.setattr(cb, "_bf", lambda a: a)
        c = 96
        args = self._params(rng, c)
        # H=37 (prime) has no divisor in [6,32], so _pick_th falls back to
        # TH=16 and the masked pad-to-tile path (3 tiles, 11 padded rows)
        # really executes; W=20 exercises the column pre-pad
        assert cb._pick_th(37) == 16 and 37 % 16 != 0
        x = jnp.asarray(rng.normal(size=(2, 37, 20, c)).astype(np.float32))
        want = cb.convnext_block_reference(x, *args)
        with pltpu.force_tpu_interpret_mode():
            got = cb.convnext_block_fused(x, *args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-6, rtol=1e-5)
        gw = jax.grad(
            lambda z: (cb.convnext_block_reference(z, *args) ** 2).sum())(x)
        with pltpu.force_tpu_interpret_mode():
            gg = jax.grad(
                lambda z: (cb.convnext_block_fused(z, *args) ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   atol=1e-5, rtol=1e-4)

    def test_default_bf16_dots_close(self, rng):
        """Default kernel (bf16 MXU passes) stays within bf16 noise."""
        from robseg_tpu.kernels import convnext_block as cb
        c = 96
        args = self._params(rng, c)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, c)).astype(np.float32))
        want = cb.convnext_block_reference(x, *args)
        with pltpu.force_tpu_interpret_mode():
            got = cb.convnext_block_fused(x, *args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2, rtol=2e-2)

    def test_backbone_block_mode_matches_default(self, rng):
        """ConvNeXt(fused_mlp_mode='block') ~= default backbone, fwd+grad."""
        from robseg_tpu import models
        x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        m0 = models.ConvNeXt("T_CVST")
        m1 = models.ConvNeXt("T_CVST", fused_mlp=True,
                             fused_mlp_mode="block")
        v = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
        want = m0.apply(v, x)
        with pltpu.force_tpu_interpret_mode():
            got = m1.apply(v, x)
        for a, b in zip(want, got):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=5e-2, rtol=5e-2)
        # input grad through stage 0 (3 fused blocks + stem) — kernel-level
        # VJP exactness is covered above; this checks the model wiring.
        # Interpret-mode cost of all 15 blocks' backward is prohibitive.
        gw = jax.grad(lambda z: (m0.apply(v, z)[0] ** 2).sum())(x)
        with pltpu.force_tpu_interpret_mode():
            gg = jax.grad(lambda z: (m1.apply(v, z)[0] ** 2).sum())(x)
        scale = float(jnp.abs(gw).max())
        assert float(jnp.abs(gg - gw).max()) < 0.15 * scale

    def test_bf16_io(self, rng):
        """bf16 inputs/params (the --precision bf16 production mode) run
        through the kernel with f32 internal math."""
        from robseg_tpu.kernels import convnext_block as cb
        c = 96
        args = [a.astype(jnp.bfloat16) for a in self._params(rng, c)]
        x32 = jnp.asarray(rng.normal(size=(1, 16, 16, c)).astype(np.float32))
        x = x32.astype(jnp.bfloat16)
        want = cb.convnext_block_reference(
            *[a.astype(jnp.float32) for a in (x,) + tuple(args)])
        with pltpu.force_tpu_interpret_mode():
            got = cb.convnext_block_fused(x, *args)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=5e-2, rtol=5e-2)
        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(lambda z: (cb.convnext_block_fused(z, *args)
                                    .astype(jnp.float32) ** 2).sum())(x)
        assert g.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


class TestFpnConcatConvKernel:
    """Fused fpn_bottleneck concat-conv kernel (kernels/fpn_conv.py)."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(13)

    def _args(self, rng, n, c, co):
        w = jnp.asarray(
            (rng.standard_normal((n, 3, 3, c, co)) / 30).astype(np.float32))
        s = jnp.asarray(
            (1 + 0.1 * rng.standard_normal(co)).astype(np.float32))
        t = jnp.asarray(
            (0.1 * rng.standard_normal(co)).astype(np.float32))
        return w, (s, t)

    def test_fwd_and_input_grads_exact_with_f32_dots(self, rng, monkeypatch):
        """f32 dots => exact vs concat->conv->BN-affine->relu: validates
        row halos/masking, the column pre-pad, the BN fold and the
        flipped-weight stencil closure of the 4-way backward."""
        from robseg_tpu.kernels import fpn_conv as fc
        monkeypatch.setattr(fc, "_bf", lambda a: a)
        n, c, co = 4, 128, 128
        # H=19 is not a multiple of _TH=8 -> masked pad-to-tile rows run
        xs = tuple(jnp.asarray(
            rng.standard_normal((2, 19, 16, c)).astype(np.float32))
            for _ in range(n))
        w, st = self._args(rng, n, c, co)
        want, vjp_r = jax.vjp(
            lambda *x: fc.fpn_concat_conv_reference(x, w, st), *xs)
        dy = jnp.asarray(
            rng.standard_normal(want.shape).astype(np.float32))
        want_dxs = vjp_r(dy)
        with pltpu.force_tpu_interpret_mode():
            got, vjp = jax.vjp(lambda *x: fc.fpn_concat_conv(x, w, st), *xs)
            got_dxs = vjp(dy)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
        for a, b in zip(got_dxs, want_dxs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    def test_default_bf16_dots_close(self, rng):
        from robseg_tpu.kernels import fpn_conv as fc
        n, c, co = 2, 128, 128
        xs = tuple(jnp.asarray(
            rng.standard_normal((1, 8, 16, c)).astype(np.float32))
            for _ in range(n))
        w, st = self._args(rng, n, c, co)
        want = fc.fpn_concat_conv_reference(xs, w, st)
        with pltpu.force_tpu_interpret_mode():
            got = fc.fpn_concat_conv(xs, w, st)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-2, rtol=5e-2)

    def test_bf16_io(self, rng):
        from robseg_tpu.kernels import fpn_conv as fc
        n, c, co = 2, 128, 128
        xs = tuple(jnp.asarray(
            rng.standard_normal((1, 8, 16, c)).astype(np.float32)
        ).astype(jnp.bfloat16) for _ in range(n))
        w, st = self._args(rng, n, c, co)
        with pltpu.force_tpu_interpret_mode():
            got, vjp = jax.vjp(
                lambda *x: fc.fpn_concat_conv(x, w.astype(jnp.bfloat16), st,
                                              jnp.bfloat16), *xs)
            dxs = vjp(jnp.ones_like(got))
        assert got.dtype == jnp.bfloat16
        want = fc.fpn_concat_conv_reference(
            tuple(x.astype(jnp.float32) for x in xs), w, st)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=5e-2, rtol=5e-2)
        for dx in dxs:
            assert dx.dtype == jnp.bfloat16
            assert bool(jnp.isfinite(dx.astype(jnp.float32)).all())

    def test_upernet_fused_head_wiring(self, rng):
        """UperNet(fused_head=True) ~= default model, logits + input grad
        (the deviation class is bf16 truncation + relu-boundary mask flips;
        kernel-level exactness is covered above)."""
        from robseg_tpu import models
        x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        m0 = models.UperNetForSemanticSegmentation(
            backbone_variant="T_CVST", num_classes=21)
        m1 = models.UperNetForSemanticSegmentation(
            backbone_variant="T_CVST", num_classes=21, fused_head=True)
        v = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
        want, vjp0 = jax.vjp(lambda z: m0.apply(v, z), x)
        with pltpu.force_tpu_interpret_mode():
            got, vjp1 = jax.vjp(lambda z: m1.apply(v, z), x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-2, rtol=3e-2)
        gw = vjp0(jnp.ones_like(want))[0]
        with pltpu.force_tpu_interpret_mode():
            gg = vjp1(jnp.ones_like(got))[0]
        scale = float(jnp.abs(gw).max())
        assert float(jnp.abs(gg - gw).max()) < 0.05 * scale

    def test_upernet_split_head_near_exact(self, rng):
        """fused_head='split' (pure-XLA sum of per-source convs) differs
        from the reference concat-conv only by f32 reassociation."""
        from robseg_tpu import models
        x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        m0 = models.UperNetForSemanticSegmentation(
            backbone_variant="T_CVST", num_classes=21)
        ms = models.UperNetForSemanticSegmentation(
            backbone_variant="T_CVST", num_classes=21, fused_head="split")
        v = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
        want, vjp0 = jax.vjp(lambda z: m0.apply(v, z), x)
        got, vjp1 = jax.vjp(lambda z: ms.apply(v, z), x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
        gw = vjp0(jnp.ones_like(want))[0]
        gg = vjp1(jnp.ones_like(got))[0]
        scale = float(jnp.abs(gw).max())
        assert float(jnp.abs(gg - gw).max()) < 1e-4 * scale


class TestConvNeXtBlockWholeKernel:
    """Whole-image (halo-free) block kernel for small-spatial stages."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(17)

    def _params(self, rng, c):
        return [jnp.asarray(a.astype(np.float32)) for a in (
            rng.normal(size=(7, 7, c)) * 0.1, rng.normal(size=c) * 0.1,
            rng.random(c) + 0.5, rng.normal(size=c) * 0.1,
            rng.normal(size=(c, 4 * c)) * 0.05, rng.normal(size=4 * c) * 0.1,
            rng.normal(size=(4 * c, c)) * 0.05, rng.normal(size=c) * 0.1,
            rng.random(c))]

    # (384, 15) exercises the internal pad-to-sublane path (VOC geometry's
    # stage-3 15x15; pad tokens must be exactly inert fwd AND bwd)
    @pytest.mark.parametrize("c,hw", [(384, 12), (768, 8), (384, 15)])
    def test_fwd_and_input_grad_exact_with_f32_dots(self, rng, monkeypatch,
                                                    c, hw):
        from robseg_tpu.kernels import convnext_block as cb
        monkeypatch.setattr(cb, "_bf", lambda a: a)
        args = self._params(rng, c)
        x = jnp.asarray(rng.normal(size=(2, hw, hw, c)).astype(np.float32))
        want, vjp0 = jax.vjp(
            lambda z: cb.convnext_block_reference(z, *args), x)
        with pltpu.force_tpu_interpret_mode():
            got, vjp1 = jax.vjp(
                lambda z: cb.convnext_block_fused_whole(z, *args), x)
            gg = vjp1(jnp.ones_like(got))[0]
        gw = vjp0(jnp.ones_like(want))[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   atol=5e-5, rtol=1e-4)

    def test_backbone_block_mode_uses_whole_kernel_small_stages(
            self, rng, monkeypatch):
        """In block mode stages 2-3 (dims 384/768 at 8<=spatial<=48) route
        through the whole-image kernel; outputs stay in the bf16 deviation
        class of the default backbone.

        Non-vacuous by construction (round-3 advisor finding): a 256^2
        input puts stage 2 at 16^2 and stage 3 at 8^2 — both inside the
        gate in models/convnext.py — and the kernel entry points are
        REPLACED by counted exact-reference implementations, so the
        production routing, gating AND raw-param unpacking are asserted
        (a 256^2 interpret-mode Pallas run of the full backbone takes
        >10 min on this host; the kernels' own numerics at exactly these
        dims/spatials are covered by the interpret-mode tests above).
        """
        from robseg_tpu import models
        from robseg_tpu.kernels import convnext_block as cb
        calls = {"whole": 0, "tiled": 0}

        def counted_whole(x, *a, **k):
            calls["whole"] += 1
            assert 8 <= x.shape[1] <= 48 and x.shape[-1] > 192, x.shape
            return cb.convnext_block_reference(x, *a, **k)

        def counted_tiled(x, *a, **k):
            calls["tiled"] += 1
            assert x.shape[-1] <= 192, x.shape
            return cb.convnext_block_reference(x, *a, **k)

        monkeypatch.setattr(cb, "convnext_block_fused_whole_shared",
                            counted_whole)
        monkeypatch.setattr(cb, "convnext_block_fused_shared", counted_tiled)
        x = jnp.asarray(rng.random((1, 256, 256, 3)).astype(np.float32))
        m0 = models.ConvNeXt("T_CVST")
        m1 = models.ConvNeXt("T_CVST", fused_mlp=True,
                             fused_mlp_mode="block")
        v = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
        want = jax.jit(m0.apply)(v, x)
        got = jax.jit(m1.apply)(v, x)
        # ConvNeXt-T depths (3,3,9,3): 9 blocks in stage 2 (dim 384 @16^2)
        # + 3 in stage 3 (dim 768 @8^2) route to the whole-image kernel;
        # 3+3 blocks in stages 0-1 (dims 96/192) route to the tiled kernel
        assert calls["whole"] == 12, calls
        assert calls["tiled"] == 6, calls
        # reference impl is exact modulo the fused paths' op ordering
        for a, b in zip(want, got):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-4, rtol=1e-4)
