"""Mesh construction + data sharding helpers.

Replaces the reference's process-per-GPU NCCL DDP stack
(``tools/train_rob_seg.py:164-169``, ``semseg/datasets/
distributed_sampler.py``) with a named JAX mesh:

  * a 1-D ``data`` axis over all devices (ICI within a slice, DCN across
    slices via ``jax.distributed.initialize`` on multi-host);
  * global batches placed with ``NamedSharding(P("data"))`` so XLA moves
    each shard straight to its device;
  * gradients / metrics reduced in-program with ``psum`` inside
    ``shard_map`` — no implicit DDP hooks.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(num_devices: Optional[int] = None,
                   axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place host arrays with their leading axis split over the mesh.

    On a multi-host pod each process passes only ITS slice of the global
    batch (the sampler's ``num_hosts``/``host_id`` enumeration) and the
    global array is assembled across processes; single-host keeps the
    plain ``device_put`` fast path.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        import numpy as _np
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                sharding, _np.asarray(a)), batch)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def host_local_shard_count(mesh: Mesh) -> int:
    """Shards this host feeds (== local device count on the data axis)."""
    return len([d for d in mesh.devices.flat
                if d.process_index == jax.process_index()])
