"""Orbax checkpointing with full resume (params + opt state + step + rng).

The reference only saves ``model.state_dict()`` (``train_rob_seg.py:
405-419``) and has NO optimizer/scheduler resume path (SURVEY.md §5) —
restart means re-init. Here a checkpoint is the complete ``TrainState``, so
training resumes bit-exactly, and a ``best`` alias tracks the top val-mIoU
step (parity with ``best_model_ckpt.pth``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                best_fn=None))

    def save(self, step: int, state, metrics: Optional[dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def close(self):
        self._mgr.close()


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export of a param tree (portable model-only checkpoint,
    the analogue of ``torch.save(state_dict)``)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for kp, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        out[key] = np.asarray(leaf)
    np.savez(path, **out)


def load_params_npz(path: str, params_template: Any) -> Any:
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    for kp, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        arr = data[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params_template), leaves)
