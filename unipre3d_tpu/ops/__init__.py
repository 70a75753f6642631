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
