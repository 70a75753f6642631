from unipre3d_tpu.ops.point_ops import (
    furthest_point_sample,
    knn,
    ball_query,
    index_points,
    group_points,
    three_nn,
    three_interpolate,
    square_distance,
    subsample_group,
)
from unipre3d_tpu.ops.losses3d import (chamfer_distance, chamfer_loss,
                                       emd_approx)
from unipre3d_tpu.ops.scan import (causal_conv1d, selective_scan,
                                   selective_scan_ref)
from unipre3d_tpu.ops.serialization import (encode, hilbert_decode,
                                            hilbert_encode, z_order_decode,
                                            z_order_encode)
