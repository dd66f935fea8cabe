"""Device-mesh utilities and collectives (the NCCL/DDP replacement)."""

from robseg_tpu.parallel.mesh import (  # noqa: F401
    make_data_mesh, shard_batch, replicate, host_local_shard_count)
