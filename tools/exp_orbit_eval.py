"""Measure the batched 400-view orbit evaluation on the TPU.

Round-3 complaint: a per-view host loop costs one tunnel RTT per metric
per view (~30 s at 400 views); eval.py's Metricator batches all views
of an example into one jitted call per <=100-view chunk. This tool
proves the claim with a measured wall-clock: renders a 400-view orbit
of one synthetic object (one vmapped rasterizer call per 100-view
chunk) and computes PSNR/SSIM/black for all views via
Metricator.compute_metrics_batched. Run ALONE on the TPU host.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np


def main():
    from eval import Metricator
    from unipre3d_tpu.utils import camera as cam_util
    from unipre3d_tpu.ops.rasterizer.preprocess import preprocess_gaussians
    from unipre3d_tpu.ops.rasterizer.pallas_splat_dense import \
        rasterize_dense_batched
    import math

    V, res, N = 400, 128, 128
    rng = np.random.default_rng(0)
    fov = math.radians(49.134)

    # orbit cameras
    cams = []
    for i in range(V):
        a = 2 * math.pi * i / V
        R = np.array([[math.cos(a), 0, -math.sin(a)],
                      [0, 1, 0],
                      [math.sin(a), 0, math.cos(a)]], np.float32)
        t = np.array([0, 0, 1.6], np.float32)
        cams.append(cam_util.build_camera_tensors(R, t, fov, fov, 0.5, 3.0))
    wv = jnp.asarray(np.stack([c["world_view_transform"] for c in cams]))
    fp = jnp.asarray(np.stack([c["full_proj_transform"] for c in cams]))
    cc = jnp.asarray(np.stack([c["camera_center"] for c in cams]))

    means = jnp.asarray(rng.uniform(-.4, .4, (N, 3)).astype(np.float32))
    opa = jnp.asarray(rng.uniform(.3, 1, N).astype(np.float32))
    scales = jnp.full((N, 3), 0.02)
    rots = jnp.zeros((N, 4)).at[:, 0].set(1.0)
    shs = jnp.asarray(rng.normal(size=(N, 4, 3)).astype(np.float32) * .3)
    gt = jnp.asarray(rng.uniform(0, 1, (V, 3, res, res))
                     .astype(np.float32))

    @jax.jit
    def render_chunk(wv_c, fp_c, cc_c):
        def prep(w, f, c):
            return preprocess_gaussians(
                means, opa, scales, rots, shs, w, f, c, res, res,
                math.tan(fov / 2), math.tan(fov / 2), 1)
        pg = jax.vmap(prep)(wv_c, fp_c, cc_c)
        return rasterize_dense_batched(
            pg.mean2d, pg.conic, pg.color, pg.opacity, pg.depth,
            pg.valid, np.zeros(3, np.float32), res, res)

    met = Metricator()

    def run_orbit():
        imgs = []
        for s in range(0, V, 100):
            imgs.append(render_chunk(wv[s:s+100], fp[s:s+100],
                                     cc[s:s+100]))
        rendered = jnp.concatenate(imgs)
        out = met.compute_metrics_batched(rendered, gt)
        return float(np.mean(out["psnr"])), float(np.mean(out["ssim"]))

    t0 = time.perf_counter()
    psnr, ssim = run_orbit()
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    psnr, ssim = run_orbit()
    t_warm = time.perf_counter() - t0
    print(f"orbit 400 views @ {res}x{res}: cold {t_cold:.1f}s "
          f"(compile) warm {t_warm:.2f}s  psnr={psnr:.2f} ssim={ssim:.3f}")


if __name__ == "__main__":
    main()
