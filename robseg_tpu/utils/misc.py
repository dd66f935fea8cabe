"""Seeds, parameter counting, small helpers.

Parity targets: ``fix_seeds`` (``semseg/utils/utils.py:323-334``) — in JAX,
determinism comes from explicit PRNG keys, so this only pins the host-side
(numpy / random) streams used by data augmentation and the worst-case
search; model/attack randomness is keyed.
"""

from __future__ import annotations

import random

import numpy as np
import jax


def fix_seeds(seed: int = 123):
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def model_param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def model_size_mb(params) -> float:
    return sum(int(np.prod(p.shape)) * p.dtype.itemsize
               for p in jax.tree.leaves(params)) / 1024 ** 2
