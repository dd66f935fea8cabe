"""Minimal torchvision surface so ``/root/reference/tools/infer.py`` can be
imported for differential testing (only ``transforms.ToTensor`` is
referenced, and only inside ``get_data`` which the tests never call)."""
import numpy as np
import torch


class _ToTensor:
    def __call__(self, pic):
        arr = np.asarray(pic, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[None]
        else:
            arr = np.moveaxis(arr, -1, 0)
        return torch.from_numpy(arr.copy())


class transforms:  # noqa: N801 - module-like namespace
    ToTensor = _ToTensor
