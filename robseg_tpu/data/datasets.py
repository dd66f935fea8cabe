"""Dataset catalog: PASCAL-VOC, VOCAug (SBD), ADE20K, synthetic.

Behavioral parity targets:
  * ``semseg/datasets/pascal_voc.py`` — VOC2012 SegmentationClass; label 255
    (void boundary) is folded into background class 0 (``:114-117``);
  * ``semseg/datasets/pascal_aug.py`` — SBD trainval with masks stored in
    MATLAB ``.mat`` files (``:100-105``);
  * ``semseg/datasets/ade.py`` — ADEChallengeData2016 with 151 classes
    including class-0 background, offset 0 (``:61-63``);
  * registry ``get_segmentation_dataset`` (``datasets/__init__.py:24-33``).

Items are numpy: image float32 (H, W, 3) in [0, 1], mask int32 (H, W).
A ``SyntheticSegmentation`` dataset provides deterministic fake data so the
whole pipeline (and CI) runs without the real corpora on disk.
"""

from __future__ import annotations

import os
import random
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

from robseg_tpu.data.transforms import (to_float_chw_last,
                                        train_sync_transform,
                                        val_sync_transform)


class SegmentationDatasetBase:
    """Shared train/val transform plumbing (``dataset_wrappers.py:11-108``)."""

    NUM_CLASS: int = 0

    def __init__(self, split: str = "train", mode: Optional[str] = None,
                 base_size: int = 520, crop_size=480, seed: int = 0):
        self.split = split
        self.mode = mode if mode is not None else split
        self.base_size = base_size
        self.crop_size = crop_size[0] if isinstance(
            crop_size, (tuple, list)) else crop_size
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _load(self, index: int) -> Tuple[Image.Image, Image.Image]:
        raise NotImplementedError

    def _mask_transform(self, mask: np.ndarray) -> np.ndarray:
        return mask.astype(np.int32)

    def __getitem__(self, index: int):
        img, mask = self._load(index)
        if self.mode == "train":
            # tuple-of-ints hash is deterministic across processes
            rng = random.Random(hash((self.seed, self.epoch, index)))
            img_a, mask_a = train_sync_transform(
                img, mask, base_size=self.base_size,
                crop_size=self.crop_size, rng=rng)
        elif self.mode == "val":
            img_a, mask_a = val_sync_transform(img, mask, self.crop_size)
        else:  # testval
            img_a, mask_a = np.array(img), np.array(mask).astype("int32")
        return to_float_chw_last(img_a), self._mask_transform(mask_a)


class VOCSegmentation(SegmentationDatasetBase):
    """Parity: ``semseg/datasets/pascal_voc.py:12-144``."""

    BASE_DIR = "VOCdevkit/VOC2012"
    NUM_CLASS = 21

    def __init__(self, root: str, split: str = "train", **kw):
        super().__init__(split=split, **kw)
        voc_root = os.path.join(root, self.BASE_DIR)
        mask_dir = os.path.join(voc_root, "SegmentationClass")
        image_dir = os.path.join(voc_root, "JPEGImages")
        split_f = os.path.join(voc_root, "ImageSets/Segmentation",
                               f"{split}.txt")
        self.images: List[str] = []
        self.masks: List[str] = []
        self.fnames: List[str] = []
        with open(split_f) as lines:
            for line in lines:
                name = line.rstrip("\n")
                self.images.append(os.path.join(image_dir, name + ".jpg"))
                self.masks.append(os.path.join(mask_dir, name + ".png"))
                self.fnames.append(name + ".jpg")

    def __len__(self):
        return len(self.images)

    def _load(self, index):
        img = Image.open(self.images[index]).convert("RGB")
        mask = Image.open(self.masks[index])
        return img, mask

    def _mask_transform(self, mask):
        target = mask.astype(np.int32)
        target[target == 255] = 0  # fold void into background (parity)
        return target


class VOCAugSegmentation(SegmentationDatasetBase):
    """SBD trainval; parity: ``semseg/datasets/pascal_aug.py:13-135``."""

    BASE_DIR = "VOCaug/dataset"
    NUM_CLASS = 21

    def __init__(self, root: str, split: str = "train", **kw):
        super().__init__(split=split, **kw)
        voc_root = os.path.join(root, self.BASE_DIR)
        mask_dir = os.path.join(voc_root, "cls")
        image_dir = os.path.join(voc_root, "img")
        if split == "train":
            split_f = os.path.join(voc_root, "trainval.txt")
        elif split == "val":
            split_f = os.path.join(voc_root, "val.txt")
        else:
            raise RuntimeError("Unknown dataset split.")
        self.images, self.masks, self.fnames = [], [], []
        with open(split_f) as lines:
            for line in lines:
                name = line.rstrip("\n")
                self.images.append(os.path.join(image_dir, name + ".jpg"))
                self.masks.append(os.path.join(mask_dir, name + ".mat"))
                self.fnames.append(name + ".jpg")

    def __len__(self):
        return len(self.images)

    def _load(self, index):
        img = Image.open(self.images[index]).convert("RGB")
        mask = self._load_mat(self.masks[index])
        return img, mask

    @staticmethod
    def _load_mat(filename):
        import scipy.io as sio
        mat = sio.loadmat(filename, mat_dtype=True, squeeze_me=True,
                          struct_as_record=False)
        return Image.fromarray(mat["GTcls"].Segmentation)


class ADE20KSegmentation(SegmentationDatasetBase):
    """ADEChallengeData2016; parity: ``semseg/datasets/ade.py:12-286``
    (151 classes incl. background, label offset 0)."""

    BASE_DIR = "ADEChallengeData2016"
    NUM_CLASS = 151

    def __init__(self, root: str, split: str = "val", n_cls: int = 151, **kw):
        super().__init__(split=split, **kw)
        ade_root = os.path.join(root, self.BASE_DIR)
        if split == "train":
            img_dir = os.path.join(ade_root, "images/training")
            msk_dir = os.path.join(ade_root, "annotations/training")
        else:
            img_dir = os.path.join(ade_root, "images/validation")
            msk_dir = os.path.join(ade_root, "annotations/validation")
        self.n_classes = n_cls
        if self.n_classes not in (150, 151):
            raise ValueError(f"Invalid number of classes: {n_cls}.")
        self.offset = 0  # parity: ade.py:63
        self.images, self.masks, self.fnames = [], [], []
        for fn in sorted(os.listdir(img_dir)):
            if not fn.endswith(".jpg"):
                continue
            mask_fn = fn[:-4] + ".png"
            mpath = os.path.join(msk_dir, mask_fn)
            if os.path.isfile(mpath):
                self.images.append(os.path.join(img_dir, fn))
                self.masks.append(mpath)
                self.fnames.append(fn)

    def __len__(self):
        return len(self.images)

    def _load(self, index):
        img = Image.open(self.images[index]).convert("RGB")
        mask = Image.open(self.masks[index])
        return img, mask

    def _mask_transform(self, mask):
        return mask.astype(np.int32) - self.offset


class SyntheticSegmentation(SegmentationDatasetBase):
    """Deterministic fake dataset for tests/benchmarks (no disk corpora)."""

    def __init__(self, num_classes: int = 21, length: int = 8,
                 image_hw=(96, 128), **kw):
        kw.setdefault("split", "val")
        super().__init__(**kw)
        self.NUM_CLASS = num_classes
        self.length = length
        self.image_hw = image_hw

    def __len__(self):
        return self.length

    def _load(self, index):
        rng = np.random.default_rng(1234 + index)
        h, w = self.image_hw
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        # blocky piecewise-constant labels look segmentation-like
        blocks = rng.integers(0, self.NUM_CLASS, size=(h // 16 + 1,
                                                       w // 16 + 1))
        mask = np.kron(blocks, np.ones((16, 16), np.int64))[:h, :w]
        return (Image.fromarray(img),
                Image.fromarray(mask.astype(np.uint8)))


DATASETS = {
    "pascalvoc": VOCSegmentation,
    "pascalaug": VOCAugSegmentation,
    "ade20k": ADE20KSegmentation,
    "synthetic": SyntheticSegmentation,
}


def get_segmentation_dataset(name: str, **kwargs):
    """Registry; parity: ``semseg/datasets/__init__.py:29-33``."""
    return DATASETS[name.lower()](**kwargs)
