"""YAML experiment configs with the reference's section schema.

Parity: the configs in ``/root/reference/configs/*.yaml`` — sections
``MODEL / DATASET / TRAIN / LOSS / OPTIMIZER / SCHEDULER / EVAL`` plus
top-level ``DEVICE / SAVE_DIR / ADDENDUM`` (e.g.
``configs/pascalvoc_convnext.yaml:1-54``). Loading is plain
``yaml.safe_load``; helpers give defaulted access so configs stay sparse.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def dataset_eval_geometry(name: str):
    """(base_size, crop_size) for eval; parity ``tools/infer.py:158-192``."""
    if name.lower() in ("pascalvoc", "pascalaug"):
        return 512, (473, 473)
    if name.lower() == "ade20k":
        return 520, (512, 512)
    raise ValueError(f"Unknown dataset {name!r}")


def model_display_name(model_name: str, backbone: str) -> str:
    """Parity: ``getModelName`` (``semseg/utils/utils.py:248-255``)."""
    if model_name == "SegMenter":
        return "SegMent_" + backbone
    if model_name == "UperNetForSemanticSegmentation":
        return "UperNet_" + backbone
    return "PSPNet_RN50"


@dataclasses.dataclass
class TrainSettings:
    """Typed view over the TRAIN section with the reference's defaults.

    Field consumption notes (no silent no-ops):
      * ``freeze`` — wired (backbone update-masking, ``train/optim.py::
        freeze_mask``); upstream parses it but never calls
        ``freeze_some_layers``.
      * ``ddp`` — informational only: JAX always runs data-parallel over
        the mesh (``tools/train.py`` logs a note if set false with >1
        device). Upstream gates torch DDP wrapping on it.
      * ``eval_interval`` — dead in the reference too (present in every
        config, read nowhere); kept for config-schema parity. Periodic
        eval is governed by ``eval_freq``/``eval_batches``.
    """
    base_size: int = 512
    image_size: tuple = (473, 473)
    batch_size: int = 16
    epochs: int = 50
    adversarial: bool = True
    attack: str = "pgd"
    loss_fn: str = "pgd"
    eps: float = 4.0
    n_iters: int = 5
    amp: bool = False
    ddp: bool = True
    eval_interval: int = 32
    freeze: bool = False
    device_aug: bool = False  # on-device augmentation pipeline (north star)
    # periodic eval: every EVAL_FREQ epochs on EVAL_BATCHES val batches
    # (reference hardcodes 20/20, ``train_rob_seg.py:387-395``; -1 = full)
    eval_freq: int = 20
    eval_batches: int = 20

    @classmethod
    def from_cfg(cls, t: Dict[str, Any]) -> "TrainSettings":
        return cls(
            base_size=t.get("BASE_SIZE", 512),
            image_size=tuple(t.get("IMAGE_SIZE", (473, 473))),
            batch_size=t.get("BATCH_SIZE", 16),
            epochs=t.get("EPOCHS", 50),
            adversarial=t.get("ADVERSARIAL", True),
            attack=t.get("ATTACK", "pgd"),
            loss_fn=t.get("LOSS_FN", "pgd"),
            eps=float(t.get("EPS", 4)),
            n_iters=t.get("N_ITERS", 5),
            amp=t.get("AMP", False),
            ddp=t.get("DDP", True),
            eval_interval=t.get("EVAL_INTERVAL", 32),
            freeze=t.get("FREEZE", False),
            device_aug=t.get("DEVICE_AUG", False),
            eval_freq=t.get("EVAL_FREQ", 20),
            eval_batches=t.get("EVAL_BATCHES", 20),
        )
