"""Binned-vs-XLA splat attribution at the ROUTED shapes (round-4 VERDICT
item 3): the driver metric regime (1 view, 100k gaussians, 128x128) and
the scene training regime (160x120, ~98k padded gaussians, capacity*4).

For each regime and impl prints fwd-only and fwd+bwd slope times, plus
the binned path's XLA-side prep alone, so kernel-vs-prep cost is
attributable. Run alone on the TPU host:

  python tools/splat_breakdown.py [n_gauss]
"""

from __future__ import annotations

import math
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


def time_slope(run_n, lo=5, hi=20, repeats=2):
    lo_t = min(run_n(lo) for _ in range(repeats))
    hi_t = min(run_n(hi) for _ in range(repeats))
    return max((hi_t - lo_t) / (hi - lo), 1e-9)


def bench_scalar_fn(jitted, args, lo=5, hi=20):
    v = jitted(*args)
    float(v)

    def run_n(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = jitted(*args)
        float(out)
        return time.perf_counter() - t0

    return time_slope(run_n, lo, hi) * 1e3


def make_inputs(n, res_h, res_w, seed=0, scale=0.01):
    rng = np.random.default_rng(seed)
    fov = math.radians(49.134)
    from unipre3d_tpu.utils import camera as cam_util
    cams = cam_util.build_camera_tensors(
        np.eye(3), np.array([0, 0, 1.5]), fov, fov, 0.5, 2.0)
    means = jnp.asarray(rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32))
    opa = jnp.asarray(rng.uniform(0.3, 1, n).astype(np.float32))
    scales = jnp.full((n, 3), scale)
    rots = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    shs = jnp.asarray(rng.normal(size=(n, 4, 3)).astype(np.float32) * 0.3)
    return dict(means=means, opa=opa, scales=scales, rots=rots, shs=shs,
                wv=jnp.asarray(cams["world_view_transform"]),
                fp=jnp.asarray(cams["full_proj_transform"]),
                cc=jnp.asarray(cams["camera_center"]),
                tanfov=math.tan(fov / 2), res_h=res_h, res_w=res_w)


def regime(name, inp, capacity=1024):
    from unipre3d_tpu.ops.rasterizer import rasterize
    from unipre3d_tpu.ops.rasterizer.preprocess import preprocess_gaussians
    from unipre3d_tpu.ops.rasterizer import pallas_splat_binned as psb
    from unipre3d_tpu.ops.rasterizer.render import auto_tile

    res_h, res_w = inp["res_h"], inp["res_w"]
    tile_h, tile_w = auto_tile(res_h, res_w)
    print(f"\n=== {name}: N={inp['means'].shape[0]} {res_h}x{res_w} "
          f"auto tile {tile_h}x{tile_w} cap {capacity} ===", flush=True)

    def fwd(impl, th, tw, m, o, s, r, sh):
        out = rasterize(m, o, s, r, sh, inp["wv"], inp["fp"], inp["cc"],
                        img_h=res_h, img_w=res_w, tanfovx=inp["tanfov"],
                        tanfovy=inp["tanfov"], bg_color=jnp.zeros(3),
                        sh_degree=1, capacity=capacity, impl=impl,
                        tile_h=th, tile_w=tw)
        return jnp.sum(out["render"])

    args = (inp["means"], inp["opa"], inp["scales"], inp["rots"], inp["shs"])
    rows = {}
    # binned kernel VMEM-OOMs past ~512 px/tile (alpha is [P, 1024] f32
    # per intermediate); measure each impl at every feasible tile
    variants = [("xla", tile_h, tile_w), ("xla", 16, 16),
                ("pallas_binned", min(tile_h, 16), min(tile_w, 16))]
    if (tile_h, tile_w) != (min(tile_h, 16), min(tile_w, 16)):
        variants.append(("pallas_binned",
                         min(tile_h, 16), min(tile_w, 32)))
    for impl, th, tw in variants:
        tag = f"{impl}@{th}x{tw}"
        try:
            f = jax.jit(lambda *a, impl=impl, th=th, tw=tw:
                        fwd(impl, th, tw, *a))
            rows[f"{tag}_fwd"] = bench_scalar_fn(f, args)
            print(f"{tag:24s} fwd     : {rows[f'{tag}_fwd']:8.3f} ms",
                  flush=True)
            g = jax.jit(lambda *a, impl=impl, th=th, tw=tw: sum(
                jnp.sum(x) for x in jax.grad(
                    lambda *b: fwd(impl, th, tw, *b),
                    argnums=(0, 1, 2, 3, 4))(*a)))
            rows[f"{tag}_fwdbwd"] = bench_scalar_fn(g, args)
            print(f"{tag:24s} fwd+bwd : {rows[f'{tag}_fwdbwd']:8.3f} ms",
                  flush=True)
        except Exception as e:
            print(f"{tag:24s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    # binned prep alone (duplicate emit + sort + relayout, XLA side)
    def prep_only(m, o, s, r, sh):
        pg = preprocess_gaussians(
            m, o, s, r, sh, inp["wv"], inp["fp"], inp["cc"], res_h, res_w,
            inp["tanfov"], inp["tanfov"], 1)
        n_tiles = (res_h // tile_h) * (res_w // tile_w)
        data_dup, dup_idx, d_ids, seg = psb._prep_duplicates(
            pg.mean2d, pg.conic, pg.color,
            jnp.where(pg.valid, pg.opacity, 0.0),
            jax.lax.stop_gradient(pg.depth), pg.radius, pg.valid,
            res_h, res_w, tile_h, tile_w,
            psb.default_dup_budget(m.shape[0], n_tiles))
        return jnp.sum(data_dup) + jnp.sum(seg)

    rows["prep"] = bench_scalar_fn(jax.jit(prep_only), args)
    print(f"{'binned prep':14s} fwd     : {rows['prep']:8.3f} ms",
          flush=True)

    # preprocess alone (shared by all impls)
    def pre_only(m, o, s, r, sh):
        pg = preprocess_gaussians(
            m, o, s, r, sh, inp["wv"], inp["fp"], inp["cc"], res_h, res_w,
            inp["tanfov"], inp["tanfov"], 1)
        return jnp.sum(pg.mean2d) + jnp.sum(pg.color)

    rows["preprocess"] = bench_scalar_fn(jax.jit(pre_only), args)
    print(f"{'preprocess':14s} fwd     : {rows['preprocess']:8.3f} ms",
          flush=True)
    return rows


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    print(f"platform={jax.devices()[0].platform}", flush=True)
    regime("driver_metric", make_inputs(n, 128, 128), capacity=1024)
    regime("scene", make_inputs(98304, 120, 160, scale=0.02),
           capacity=1024)


if __name__ == "__main__":
    main()
