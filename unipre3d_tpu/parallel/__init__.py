from unipre3d_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
    replicate,
    tp_matched_paths,
)
from unipre3d_tpu.parallel.distributed import (
    all_reduce_mean,
    maybe_initialize,
    shard_host_batch,
)
