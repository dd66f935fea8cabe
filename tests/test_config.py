"""Config system tests (YAML schema plumbing, geometry, display names)."""

import numpy as np
import pytest

from robseg_tpu.config import (load_config, dataset_eval_geometry,
                               model_display_name, TrainSettings)


CFG_YAML = """
DEVICE: tpu
SAVE_DIR: './out'
MODEL:
  NAME: UperNetForSemanticSegmentation
  BACKBONE: ConvNeXt-T_CVST
  PRETRAINED: ''
DATASET:
  NAME: pascalaug
  ROOT: ./data
  IGNORE_LABEL: -1
  N_CLS: 21
TRAIN:
  BASE_SIZE: 512
  IMAGE_SIZE: [473, 473]
  BATCH_SIZE: 32
  EPOCHS: 50
  ADVERSARIAL: true
  ATTACK: pgd
  LOSS_FN: pgd
  EPS: 4
  N_ITERS: 5
"""


class TestConfig:
    def test_load_and_train_settings(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text(CFG_YAML)
        cfg = load_config(str(p))
        assert cfg["MODEL"]["NAME"] == "UperNetForSemanticSegmentation"
        t = TrainSettings.from_cfg(cfg["TRAIN"])
        assert t.image_size == (473, 473)
        assert t.eps == 4.0 and t.n_iters == 5 and t.adversarial

    def test_eval_geometry_parity(self):
        # parity: tools/infer.py:158-192
        assert dataset_eval_geometry("pascalvoc") == (512, (473, 473))
        assert dataset_eval_geometry("pascalaug") == (512, (473, 473))
        assert dataset_eval_geometry("ade20k") == (520, (512, 512))
        with pytest.raises(ValueError):
            dataset_eval_geometry("cityscapes")

    def test_model_display_name(self):
        # parity: semseg/utils/utils.py:248-255
        assert model_display_name("SegMenter", "vit_small_patch16_224") == \
            "SegMent_vit_small_patch16_224"
        assert model_display_name("UperNetForSemanticSegmentation",
                                  "ConvNeXt-T_CVST") == \
            "UperNet_ConvNeXt-T_CVST"
        assert model_display_name("PSPNet", "ResNet-50") == "PSPNet_RN50"


class TestColorJitter:
    def test_ranges_and_determinism(self, rng):
        import jax
        import jax.numpy as jnp
        from robseg_tpu.data.device_transforms import color_jitter
        img = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
        a = color_jitter(img, jax.random.PRNGKey(0))
        b = color_jitter(img, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out = np.asarray(a)
        assert out.min() >= 0.0 and out.max() <= 1.0
