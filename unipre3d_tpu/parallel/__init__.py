from unipre3d_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
    replicate,
    tp_matched_paths,
)
