"""Sharded, iteration-based data sampling (the DistributedSampler analogue).

Behavioral parity target: ``semseg/datasets/distributed_sampler.py``:
  * epoch-seeded global shuffle (``torch.randperm(g.manual_seed(epoch))`` →
    here ``np.random.default_rng(seed + epoch)``);
  * pad indices to a multiple of world size by wrapping (``:49-53``);
  * rank-strided subsampling (``indices[rank:total:num_replicas]``);
  * ``IterationBasedBatchSampler``: re-iterate epochs (advancing the seed)
    until ``num_iterations`` batches have been produced (``:72-98``),
    dropping the last partial batch.

Instead of one process per device, a single host iterator yields *global*
batches laid out as (num_shards, per_shard_batch, ...) ready for
``jax.device_put`` onto a mesh — per-host sharding for multi-host pods uses
``shard_offset/num_hosts``.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np


class ShardedEpochSampler:
    """Deterministic epoch-seeded shuffling with pad-to-divisible shards.

    ``num_hosts``/``host_id`` restrict batch enumeration to the shards this
    host feeds (its local devices on the data axis): every host computes the
    same epoch permutation (same seed), then materializes only its
    contiguous block of shards — index sets are disjoint across hosts and
    their union is exactly the single-host global batch (tested).
    """

    def __init__(self, dataset_len: int, num_shards: int, *,
                 shuffle: bool = True, seed: int = 0,
                 num_hosts: int = 1, host_id: int = 0):
        assert num_shards % num_hosts == 0, (num_shards, num_hosts)
        assert 0 <= host_id < num_hosts
        self.dataset_len = dataset_len
        self.num_shards = num_shards
        self.shuffle = shuffle
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.num_samples = int(
            math.ceil(dataset_len * 1.0 / num_shards))
        self.total_size = self.num_samples * num_shards

    def shard_indices(self, epoch: int, shard: int) -> np.ndarray:
        if self.shuffle:
            g = np.random.default_rng(self.seed + epoch)
            indices = g.permutation(self.dataset_len)
        else:
            indices = np.arange(self.dataset_len)
        # wrap-pad so every shard sees the same count (parity :49-53)
        pad = self.total_size - len(indices)
        if pad:
            indices = np.concatenate([indices, indices[:pad]])
        return indices[shard:self.total_size:self.num_shards]

    @property
    def local_shards(self) -> range:
        """The contiguous block of shard ids this host feeds."""
        per_host = self.num_shards // self.num_hosts
        return range(self.host_id * per_host, (self.host_id + 1) * per_host)

    def global_batch_indices(self, epoch: int, batch_per_shard: int
                             ) -> Iterator[np.ndarray]:
        """Yield this host's slice of each global batch — with one host
        that is the full (num_shards * batch_per_shard,) index array, the
        first ``batch_per_shard`` belonging to shard 0, etc. Drops the last
        partial batch (torch BatchSampler(drop_last=True) parity)."""
        per_shard = [self.shard_indices(epoch, s) for s in self.local_shards]
        n_batches = self.num_samples // batch_per_shard
        for b in range(n_batches):
            sl = slice(b * batch_per_shard, (b + 1) * batch_per_shard)
            yield np.concatenate([p[sl] for p in per_shard])


class IterationBasedLoader:
    """Iterate a dataset for exactly ``max_iters`` global batches.

    Parity: ``IterationBasedBatchSampler`` (``distributed_sampler.py:72-98``)
    — epochs advance the shuffle seed; iteration count, not epochs, bounds
    training (the reference trainer loops over iterations,
    ``tools/train_rob_seg.py:318``).
    """

    def __init__(self, dataset, *, num_shards: int, batch_per_shard: int,
                 max_iters: Optional[int] = None, shuffle: bool = True,
                 seed: int = 0, start_iter: int = 0,
                 num_hosts: int = 1, host_id: int = 0):
        self.dataset = dataset
        self.sampler = ShardedEpochSampler(len(dataset), num_shards,
                                           shuffle=shuffle, seed=seed,
                                           num_hosts=num_hosts,
                                           host_id=host_id)
        self.batch_per_shard = batch_per_shard
        self.max_iters = max_iters
        self.start_iter = start_iter
        self.iters_per_epoch = self.sampler.num_samples // batch_per_shard

    def _fetch(self, idx: np.ndarray):
        imgs, masks = [], []
        for i in idx:
            img, mask = self.dataset[int(i)]
            imgs.append(img)
            masks.append(mask)
        return np.stack(imgs), np.stack(masks)

    def __iter__(self):
        it = self.start_iter
        epoch = it // max(self.iters_per_epoch, 1)
        while self.max_iters is None or it < self.max_iters:
            if hasattr(self.dataset, "set_epoch"):
                self.dataset.set_epoch(epoch)
            batches = self.sampler.global_batch_indices(
                epoch, self.batch_per_shard)
            skip = it - epoch * self.iters_per_epoch
            for bi, idx in enumerate(batches):
                if bi < skip:
                    continue
                yield self._fetch(idx)
                it += 1
                if self.max_iters is not None and it >= self.max_iters:
                    return
            epoch += 1
            if self.max_iters is None:
                return  # single epoch when no iteration bound


def simple_eval_loader(dataset, batch_size: int, n_batches: int = -1):
    """Sequential, unshuffled eval batches; pads nothing, drops nothing
    except an optional batch cap (parity: eval DataLoader shuffle=False)."""
    n = len(dataset)
    out = 0
    for s in range(0, n, batch_size):
        idx = list(range(s, min(s + batch_size, n)))
        imgs, masks = [], []
        for i in idx:
            img, mask = dataset[i]
            imgs.append(img)
            masks.append(mask)
        yield np.stack(imgs), np.stack(masks)
        out += 1
        if out == n_batches:
            return
