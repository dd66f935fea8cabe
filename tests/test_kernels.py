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
