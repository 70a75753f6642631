from unipre3d_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
)
