"""Device mesh and sharding utilities."""
from dro_sfm_tpu.parallel.mesh import (
    batch_sharding,
    is_rank0,
    make_mesh,
    replicated,
    shard_batch,
)
