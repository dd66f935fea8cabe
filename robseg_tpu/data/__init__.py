"""Datasets, transforms and sharded loading."""

from robseg_tpu.data.datasets import (  # noqa: F401
    DATASETS, get_segmentation_dataset, VOCSegmentation, VOCAugSegmentation,
    ADE20KSegmentation, SyntheticSegmentation)
from robseg_tpu.data.sampler import (  # noqa: F401
    ShardedEpochSampler, IterationBasedLoader, simple_eval_loader)
from robseg_tpu.data.prefetch import prefetch, PrefetchIterator  # noqa: F401
from robseg_tpu.data.transforms import (  # noqa: F401
    train_sync_transform, val_sync_transform, to_float_chw_last)
from robseg_tpu.data.device_transforms import (  # noqa: F401
    augment_batch, color_jitter, load_raw_batch)
