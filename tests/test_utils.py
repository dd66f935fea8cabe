"""Utility tests: sliding window, multi-scale eval, palettes, prefetch."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from robseg_tpu.utils.sliding_window import (sliding_window_logits,
                                             multi_scale_flip_logits)
from robseg_tpu.utils.visualize import (voc_palette, generate_palette,
                                        colorize_mask, overlay)
from robseg_tpu.data import prefetch
from robseg_tpu.utils.misc import model_param_count


def _linear_fn(rng, c=5):
    wk = jnp.asarray(rng.normal(size=(3, c)).astype(np.float32))
    return lambda x: jnp.einsum("...c,cd->...d", x, wk)


class TestSlidingWindow:
    def test_covers_image_and_matches_direct_for_single_window(self, rng):
        fn = _linear_fn(rng)
        img = jnp.asarray(rng.random((30, 40, 3)).astype(np.float32))
        out = sliding_window_logits(lambda b: fn(b), img, window=32,
                                    stride=32, num_classes=5)
        assert out.shape == (30, 40, 5)
        # pointwise model => sliding-window average == direct application
        direct = np.asarray(fn(img))
        np.testing.assert_allclose(np.asarray(out), direct, atol=1e-5)

    def test_msf_averages_probabilities(self, rng):
        fn = _linear_fn(rng)
        imgs = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
        acc = multi_scale_flip_logits(lambda b: fn(b), imgs,
                                      scales=(1.0,), flip=True,
                                      num_classes=5, align=8)
        assert acc.shape == (2, 16, 16, 5)
        s = np.asarray(acc).sum(-1)
        np.testing.assert_allclose(s, 2.0, atol=1e-4)  # two prob simplexes


class TestVisualize:
    def test_voc_palette_canonical_values(self):
        pal = voc_palette()
        np.testing.assert_array_equal(pal[0], [0, 0, 0])
        np.testing.assert_array_equal(pal[1], [128, 0, 0])
        np.testing.assert_array_equal(pal[2], [0, 128, 0])
        np.testing.assert_array_equal(pal[15], [192, 128, 128])

    def test_colorize_and_overlay(self, rng):
        mask = rng.integers(-1, 5, (8, 8)).astype(np.int32)
        rgb = colorize_mask(mask, num_classes=5)
        assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8
        assert np.all(rgb[mask == -1] == 0)
        img = rng.random((8, 8, 3)).astype(np.float32)
        out = overlay(img, rgb, alpha=0.5)
        assert out.dtype == np.uint8

    def test_generate_palette_deterministic(self):
        np.testing.assert_array_equal(generate_palette(30), generate_palette(30))

    def _reference_tables(self):
        """Extract colors_ade/colors_voc literals straight from the
        reference source (ast — avoids importing its torch/dataset deps)."""
        import ast
        src = open("/root/reference/semseg/utils/visualize.py").read()
        out = {}
        for node in ast.parse(src).body:
            if (isinstance(node, ast.Assign)
                    and isinstance(node.targets[0], ast.Name)
                    and node.targets[0].id in ("colors_ade", "colors_voc")):
                out[node.targets[0].id] = np.array(
                    ast.literal_eval(node.value), np.uint8)
        return out

    def test_palettes_match_reference_tables(self):
        """ADE renders must be byte-identical to the reference's
        (``visualize.py:43-218``); VOC's literal table equals the
        bit-reversal construction."""
        from robseg_tpu.utils.visualize import ADE_PALETTE
        ref = self._reference_tables()
        np.testing.assert_array_equal(ADE_PALETTE, ref["colors_ade"])
        np.testing.assert_array_equal(voc_palette(21), ref["colors_voc"])
        np.testing.assert_array_equal(generate_palette(150),
                                      ref["colors_ade"])
        # background=True: black + first n-1 colors (visualize.py:224-228)
        pb = generate_palette(150, background=True)
        np.testing.assert_array_equal(pb[0], [0, 0, 0])
        np.testing.assert_array_equal(pb[1:], ref["colors_ade"][:149])

    def test_draw_text_annotates_segments(self, rng):
        """Parity ``visualize.py:233-256``: white label boxes appear at
        segment medians (default-font fallback; Helvetica ttf is absent
        upstream too)."""
        from robseg_tpu.utils.visualize import draw_text
        img = np.zeros((48, 48, 3), np.uint8)
        seg = np.zeros((48, 48), np.int64)
        seg[24:, 24:] = 2
        out = np.asarray(draw_text(img, seg, [f"class{i}" for i in range(5)]))
        assert out.shape == (48, 48, 3)
        assert (out == 255).any()  # label background rectangles drawn


class TestPrefetch:
    def test_order_preserved(self):
        items = list(range(20))
        assert list(prefetch(iter(items), depth=3)) == items

    def test_exception_propagates(self):
        def gen():
            yield 1
            raise ValueError("boom")
        it = prefetch(gen(), depth=2)
        got = []
        try:
            for v in it:
                got.append(v)
            assert False, "expected ValueError"
        except ValueError:
            pass
        assert got == [1]


class TestMisc:
    def test_param_count(self):
        params = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros((5,))}}
        assert model_param_count(params) == 17


class TestProfiling:
    def test_step_timer(self):
        from robseg_tpu.utils.profiling import StepTimer
        import jax.numpy as jnp
        t = StepTimer()
        for _ in range(3):
            t.start()
            a = jnp.ones(8).sum()
            t.stop(a)
        assert len(t.times) == 3
        assert "steps=3" in t.summary()

    def test_flops_cost_analysis(self):
        from robseg_tpu.utils.flops import cost_analysis
        import jax.numpy as jnp
        ca = cost_analysis(lambda a, b: a @ b,
                           jnp.ones((64, 64)), jnp.ones((64, 64)))
        assert ca.get("flops", 0) >= 2 * 64 ** 3 * 0.9


class TestSlidingWindowNaiveEquivalence:
    """Numerical equivalence of the batched window sweep / MSF accumulation
    to straightforward per-window / per-scale loops (VERDICT missing #6)."""

    @staticmethod
    def _conv_model(rng, c_out=5):
        # non-pointwise model so windowing actually matters: 3x3 blur then
        # channel mix
        w = jnp.asarray(rng.normal(size=(3, c_out)).astype(np.float32))

        def fn(b):
            k = jnp.ones((3, 3, 1, 1), jnp.float32) / 9.0
            blurred = jnp.concatenate([
                jax.lax.conv_general_dilated(
                    b[..., i:i + 1], k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                for i in range(3)], -1)
            return jnp.einsum("bhwc,cd->bhwd", blurred, w)
        return fn

    def test_overlapping_windows_match_naive_loop(self, rng):
        fn = self._conv_model(rng)
        img = jnp.asarray(rng.random((48, 40, 3)).astype(np.float32))
        got = np.asarray(sliding_window_logits(fn, img, window=32,
                                               stride=16, num_classes=5))

        # naive loop (reference-shaped: segmenter_eval.py:51-123)
        h, w = 48, 40
        padded = np.zeros((48, 40, 3), np.float32)
        padded[:h, :w] = np.asarray(img)
        hs = [0, 16]
        ws = [0, 8]  # 40-32=8: grid 0 then the 8 edge-anchored window
        out = np.zeros((48, 40, 5), np.float32)
        cnt = np.zeros((48, 40, 1), np.float32)
        for i in hs:
            for j in ws:
                crop = padded[i:i + 32, j:j + 32]
                lg = np.asarray(fn(jnp.asarray(crop[None])))[0]
                out[i:i + 32, j:j + 32] += lg
                cnt[i:i + 32, j:j + 32] += 1
        np.testing.assert_allclose(got, out / cnt, atol=1e-5)

    def test_msf_matches_naive_loop(self, rng):
        from robseg_tpu.ops.resize import resize_bilinear
        fn = self._conv_model(rng)
        imgs = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        scales = (0.5, 1.0, 1.25)
        got = np.asarray(multi_scale_flip_logits(
            fn, imgs, scales=scales, flip=True, num_classes=5))

        acc = np.zeros((2, 32, 32, 5), np.float32)
        for s in scales:
            nh = -(-int(s * 32) // 32) * 32
            scaled = resize_bilinear(imgs, (nh, nh), align_corners=True)
            for flipped in (False, True):
                inp = scaled[:, :, ::-1] if flipped else scaled
                lg = fn(inp)
                if flipped:
                    lg = lg[:, :, ::-1]
                lg = resize_bilinear(lg, (32, 32), align_corners=True)
                acc += np.asarray(jax.nn.softmax(lg, axis=-1))
        np.testing.assert_allclose(got, acc, atol=1e-5)
