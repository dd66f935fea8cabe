"""Data pipeline tests: transforms vs reference semantics, samplers, datasets."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from robseg_tpu.data import (SyntheticSegmentation, VOCSegmentation,
                             IterationBasedLoader, ShardedEpochSampler,
                             simple_eval_loader, get_segmentation_dataset)
from robseg_tpu.data.transforms import val_sync_transform, train_sync_transform


class TestTransforms:
    def test_val_transform_shapes_and_determinism(self):
        img = Image.fromarray(
            (np.random.default_rng(0).random((100, 150, 3)) * 255
             ).astype(np.uint8))
        mask = Image.fromarray(
            np.random.default_rng(1).integers(0, 20, (100, 150)
                                              ).astype(np.uint8))
        i1, m1 = val_sync_transform(img, mask, 73)
        i2, m2 = val_sync_transform(img, mask, 73)
        assert i1.shape == (73, 73, 3) and m1.shape == (73, 73)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(m1, m2)

    def test_train_transform_crop_and_seeded(self):
        img = Image.fromarray(
            (np.random.default_rng(0).random((90, 120, 3)) * 255
             ).astype(np.uint8))
        mask = Image.fromarray(
            np.random.default_rng(1).integers(0, 20, (90, 120)
                                              ).astype(np.uint8))
        r1 = random.Random(7)
        i1, m1 = train_sync_transform(img, mask, base_size=100, crop_size=64,
                                      rng=r1)
        r2 = random.Random(7)
        i2, m2 = train_sync_transform(img, mask, base_size=100, crop_size=64,
                                      rng=r2)
        assert i1.shape == (64, 64, 3) and m1.shape == (64, 64)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(m1, m2)


class TestVOC(object):
    def _make_fake_voc(self, tmp_path):
        root = tmp_path / "voc"
        base = root / "VOCdevkit/VOC2012"
        (base / "JPEGImages").mkdir(parents=True)
        (base / "SegmentationClass").mkdir(parents=True)
        (base / "ImageSets/Segmentation").mkdir(parents=True)
        names = []
        for i in range(3):
            name = f"img{i:04d}"
            arr = (np.random.default_rng(i).random((80, 100, 3)) * 255
                   ).astype(np.uint8)
            Image.fromarray(arr).save(base / "JPEGImages" / f"{name}.jpg")
            m = np.random.default_rng(100 + i).integers(
                0, 21, (80, 100)).astype(np.uint8)
            m[0, 0] = 255  # void pixel
            Image.fromarray(m).save(
                base / "SegmentationClass" / f"{name}.png")
            names.append(name)
        with open(base / "ImageSets/Segmentation/val.txt", "w") as f:
            f.write("\n".join(names) + "\n")
        return str(root)

    def test_voc_val_loads_and_folds_255(self, tmp_path):
        root = self._make_fake_voc(tmp_path)
        ds = VOCSegmentation(root, split="val", mode="val",
                             base_size=512, crop_size=64)
        img, mask = ds[0]
        assert img.shape == (64, 64, 3) and img.dtype == np.float32
        assert img.min() >= 0 and img.max() <= 1
        assert mask.dtype == np.int32
        assert mask.max() < 21 and mask.min() >= 0  # 255 folded to 0

    def test_registry(self, tmp_path):
        root = self._make_fake_voc(tmp_path)
        ds = get_segmentation_dataset("pascalvoc", root=root, split="val",
                                      mode="val", crop_size=64)
        assert len(ds) == 3


class TestSampler:
    def test_shards_partition_and_pad(self):
        s = ShardedEpochSampler(10, 4, shuffle=True, seed=0)
        shards = [s.shard_indices(epoch=0, shard=i) for i in range(4)]
        assert all(len(sh) == 3 for sh in shards)  # ceil(10/4)
        allv = np.concatenate(shards)
        assert len(allv) == 12
        assert set(allv.tolist()) == set(range(10))  # wrap-padded

    def test_epoch_changes_order(self):
        s = ShardedEpochSampler(16, 2, shuffle=True, seed=0)
        a = s.shard_indices(0, 0)
        b = s.shard_indices(1, 0)
        assert not np.array_equal(a, b)

    def test_iteration_loader_counts(self):
        ds = SyntheticSegmentation(num_classes=5, length=6,
                                   image_hw=(32, 32), mode="val",
                                   crop_size=32)
        loader = IterationBasedLoader(ds, num_shards=2, batch_per_shard=1,
                                      max_iters=7)
        batches = list(loader)
        assert len(batches) == 7
        imgs, masks = batches[0]
        assert imgs.shape == (2, 32, 32, 3)
        assert masks.shape == (2, 32, 32)

    def test_eval_loader(self):
        ds = SyntheticSegmentation(num_classes=5, length=5,
                                   image_hw=(32, 32), mode="val",
                                   crop_size=32)
        batches = list(simple_eval_loader(ds, 2))
        assert [b[0].shape[0] for b in batches] == [2, 2, 1]


class TestDeviceTransforms:
    def test_augment_batch_shapes_and_ranges(self, rng):
        import jax
        import jax.numpy as jnp
        from robseg_tpu.data.device_transforms import augment_batch
        b, hs, ws, crop = 3, 48, 56, 32
        imgs = rng.random((b, hs, ws, 3)).astype(np.float32)
        masks = rng.integers(0, 5, (b, hs, ws)).astype(np.int32)
        valid = np.tile(np.array([[48, 56]], np.int32), (b, 1))
        out_i, out_m = augment_batch(
            jnp.asarray(imgs), jnp.asarray(masks), jnp.asarray(valid),
            jax.random.PRNGKey(0), base_size=40, crop_size=crop)
        assert out_i.shape == (b, crop, crop, 3)
        assert out_m.shape == (b, crop, crop)
        oi = np.asarray(out_i)
        assert oi.min() >= -1e-6 and oi.max() <= 1 + 1e-6
        om = np.asarray(out_m)
        assert om.min() >= 0 and om.max() < 5

    def test_augment_deterministic_per_key(self, rng):
        import jax
        import jax.numpy as jnp
        from robseg_tpu.data.device_transforms import augment_batch
        imgs = rng.random((2, 40, 40, 3)).astype(np.float32)
        masks = rng.integers(0, 5, (2, 40, 40)).astype(np.int32)
        valid = np.tile(np.array([[40, 40]], np.int32), (2, 1))
        a = augment_batch(jnp.asarray(imgs), jnp.asarray(masks),
                          jnp.asarray(valid), jax.random.PRNGKey(7),
                          base_size=40, crop_size=32)
        b = augment_batch(jnp.asarray(imgs), jnp.asarray(masks),
                          jnp.asarray(valid), jax.random.PRNGKey(7),
                          base_size=40, crop_size=32)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        c = augment_batch(jnp.asarray(imgs), jnp.asarray(masks),
                          jnp.asarray(valid), jax.random.PRNGKey(8),
                          base_size=40, crop_size=32)
        assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))

    def test_identity_when_scale_one_no_blur_possible(self, rng):
        # scale range pinned to exactly crop/short and no random margin:
        # sampling grid hits integer source coords -> bilinear == identity
        import jax
        import jax.numpy as jnp
        from robseg_tpu.data.device_transforms import _sample_bilinear
        img = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
        ys = jnp.broadcast_to(jnp.arange(16.0)[:, None], (16, 16))
        xs = jnp.broadcast_to(jnp.arange(16.0)[None, :], (16, 16))
        out = _sample_bilinear(img, ys, xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-6)

    def test_load_raw_batch_and_full_device_pipeline(self, rng):
        import jax
        import jax.numpy as jnp
        from robseg_tpu.data.device_transforms import (load_raw_batch,
                                                       augment_batch)
        ds = SyntheticSegmentation(num_classes=5, length=4,
                                   image_hw=(70, 90), mode="train",
                                   base_size=48, crop_size=32)
        imgs, masks, valid = load_raw_batch(ds, [0, 1, 2],
                                            buffer_hw=(96, 96), max_edge=96)
        assert imgs.shape == (3, 96, 96, 3) and masks.shape == (3, 96, 96)
        np.testing.assert_array_equal(valid, [[70, 90]] * 3)
        out_i, out_m = augment_batch(
            jnp.asarray(imgs), jnp.asarray(masks), jnp.asarray(valid),
            jax.random.PRNGKey(0), base_size=48, crop_size=32)
        assert out_i.shape == (3, 32, 32, 3)
        assert np.asarray(out_m).max() < 5


class TestVOCAug:
    def test_mat_mask_loading(self, tmp_path):
        import scipy.io as sio
        root = tmp_path / "voc"
        base = root / "VOCaug/dataset"
        (base / "img").mkdir(parents=True)
        (base / "cls").mkdir(parents=True)
        names = []
        for i in range(2):
            name = f"2008_{i:06d}"
            arr = (np.random.default_rng(i).random((60, 80, 3)) * 255
                   ).astype(np.uint8)
            Image.fromarray(arr).save(base / "img" / f"{name}.jpg")
            seg = np.random.default_rng(10 + i).integers(
                0, 21, (60, 80)).astype(np.uint8)
            sio.savemat(str(base / "cls" / f"{name}.mat"),
                        {"GTcls": {"Segmentation": seg}})
            names.append(name)
        (base / "trainval.txt").write_text("\n".join(names) + "\n")
        (base / "val.txt").write_text(names[0] + "\n")

        from robseg_tpu.data import VOCAugSegmentation
        ds = VOCAugSegmentation(str(root), split="train", mode="train",
                                base_size=64, crop_size=48)
        img, mask = ds[0]
        assert img.shape == (48, 48, 3)
        assert mask.shape == (48, 48) and mask.dtype == np.int32
        assert 0 <= mask.min() and mask.max() < 21


class TestADE20K:
    def test_fake_tree_loading(self, tmp_path):
        root = tmp_path / "ade"
        base = root / "ADEChallengeData2016"
        (base / "images/validation").mkdir(parents=True)
        (base / "annotations/validation").mkdir(parents=True)
        for i in range(2):
            n = f"ADE_val_{i:08d}"
            arr = (np.random.default_rng(i).random((70, 90, 3)) * 255
                   ).astype(np.uint8)
            Image.fromarray(arr).save(
                base / "images/validation" / f"{n}.jpg")
            m = np.random.default_rng(9 + i).integers(
                0, 151, (70, 90)).astype(np.uint8)
            Image.fromarray(m).save(
                base / "annotations/validation" / f"{n}.png")
        from robseg_tpu.data import ADE20KSegmentation
        ds = ADE20KSegmentation(str(root), split="val", mode="val",
                                base_size=80, crop_size=64)
        assert len(ds) == 2
        img, mask = ds[0]
        assert img.shape == (64, 64, 3)
        assert mask.dtype == np.int32
        assert 0 <= mask.min() and mask.max() < 151  # offset 0 (parity)


class TestMultiHostSampler:
    """num_hosts > 1: per-host index streams are disjoint and their union
    is exactly the single-host global batch (VERDICT weak #7)."""

    def test_hosts_partition_global_batches(self):
        from robseg_tpu.data.sampler import ShardedEpochSampler
        n, shards, per_shard = 37, 8, 2
        full = ShardedEpochSampler(n, shards, seed=3)
        hosts = [ShardedEpochSampler(n, shards, seed=3, num_hosts=4,
                                     host_id=h) for h in range(4)]
        for epoch in (0, 1):
            ref_batches = list(full.global_batch_indices(epoch, per_shard))
            host_batches = [list(h.global_batch_indices(epoch, per_shard))
                            for h in hosts]
            assert all(len(hb) == len(ref_batches) for hb in host_batches)
            for bi, ref in enumerate(ref_batches):
                parts = [hb[bi] for hb in host_batches]
                # disjoint positions: concatenation in host order == global
                np.testing.assert_array_equal(np.concatenate(parts), ref)
                assert all(len(p) == len(ref) // 4 for p in parts)

    def test_iteration_loader_multihost_coverage(self):
        from robseg_tpu.data.sampler import IterationBasedLoader
        from robseg_tpu.data.datasets import SyntheticSegmentation
        ds = SyntheticSegmentation(num_classes=5, length=12,
                                   image_hw=(32, 32), mode="val",
                                   crop_size=32)
        full = [b[0] for b in IterationBasedLoader(
            ds, num_shards=4, batch_per_shard=1, max_iters=3, seed=0)]
        halves = []
        for h in range(2):
            halves.append([b[0] for b in IterationBasedLoader(
                ds, num_shards=4, batch_per_shard=1, max_iters=3, seed=0,
                num_hosts=2, host_id=h)])
        for it in range(3):
            np.testing.assert_allclose(
                np.concatenate([halves[0][it], halves[1][it]]), full[it])
