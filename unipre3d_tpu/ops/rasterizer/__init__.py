from unipre3d_tpu.ops.rasterizer.preprocess import preprocess_gaussians
from unipre3d_tpu.ops.rasterizer.render import (
    rasterize,
    rasterize_reference,
    render_predicted,
)
