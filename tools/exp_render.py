"""Experiment: attribute the scene-regime XLA tiled render cost.

One view at the scene shape (86k gaussians, 160x120, auto_tile 8x32,
capacity 1024): full fwd, fwd+bwd, then the pieces — depth sort,
overlap + per-tile compaction argsort, compact gather, composite scan —
and an approx_min_k-based compaction candidate. Run ALONE on the TPU
host: python tools/exp_render.py
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

from unipre3d_tpu.ops.rasterizer import render as R
from unipre3d_tpu.ops.rasterizer.preprocess import preprocess_gaussians
from unipre3d_tpu.utils import camera as cam_util


def time_slope(run_n, lo=2, hi=10, repeats=2):
    lo_t = min(run_n(lo) for _ in range(repeats))
    hi_t = min(run_n(hi) for _ in range(repeats))
    return max((hi_t - lo_t) / (hi - lo), 1e-9)


def bench(name, jitted, *args, lo=2, hi=10):
    out = jitted(*args)
    scalar = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), o, jnp.float32(0)))
    float(scalar(out))

    def run_n(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = jitted(*args)
        float(scalar(o))
        return time.perf_counter() - t0

    ms = time_slope(run_n, lo, hi) * 1e3
    print(f"{name:46s}: {ms:9.3f} ms", flush=True)
    return ms


def main():
    N = 86016
    H, W = 120, 160
    rng = np.random.default_rng(0)
    fov = math.radians(57.95)
    cams = cam_util.build_camera_tensors(
        np.eye(3), np.array([0, 0, 2.5]), fov, fov, 0.5, 8.0)

    means = jnp.asarray(rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32))
    opa = jnp.asarray(rng.uniform(0.3, 1, N).astype(np.float32))
    scales = jnp.full((N, 3), 0.015)
    rots = jnp.zeros((N, 4)).at[:, 0].set(1.0)
    shs = jnp.asarray(rng.normal(size=(N, 4, 3)).astype(np.float32) * 0.3)
    wv = jnp.asarray(cams["world_view_transform"])
    fp = jnp.asarray(cams["full_proj_transform"])
    cc = jnp.asarray(cams["camera_center"])
    bg = np.zeros(3, np.float32)
    tanf = math.tan(fov / 2)

    pg = jax.jit(lambda m, o, s, r, sh: preprocess_gaussians(
        m, o, s, r, sh, wv, fp, cc, H, W, tanf, tanf, 1))(
        means, opa, scales, rots, shs)
    pg = jax.tree_util.tree_map(jnp.asarray, pg)

    TH, TW, CAP = 8, 32, 1024

    bench("full render fwd (8x32, cap1024)", jax.jit(
        lambda p: R.rasterize_projected(p, bg, H, W, TH, TW, CAP)), pg)

    def loss(m, o, s, r, sh):
        p = preprocess_gaussians(m, o, s, r, sh, wv, fp, cc, H, W,
                                 tanf, tanf, 1)
        return jnp.sum(R.rasterize_projected(p, bg, H, W, TH, TW, CAP))

    bench("full render fwd+bwd", jax.jit(
        lambda m, o, s, r, sh: jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            m, o, s, r, sh)), means, opa, scales, rots, shs)

    bench("sorted_by_depth", jax.jit(R._sorted_by_depth), pg)
    pgs = jax.jit(R._sorted_by_depth)(pg)
    pgs = jax.tree_util.tree_map(jnp.asarray, pgs)

    ty, tx = H // TH, W // TW
    n_tiles = ty * tx
    tile_ids = np.arange(n_tiles, dtype=np.int32)
    tile_x0 = jnp.asarray((tile_ids % tx) * TW)
    tile_y0 = jnp.asarray((tile_ids // tx) * TH)

    def overlap_of(p):
        r_ = p.radius.astype(jnp.float32)
        gx, gy = p.mean2d[:, 0], p.mean2d[:, 1]
        ov_x = ((gx + r_)[None, :] >= tile_x0[:, None]) & \
               ((gx - r_)[None, :] <= (tile_x0 + TW - 1)[:, None])
        ov_y = ((gy + r_)[None, :] >= tile_y0[:, None]) & \
               ((gy - r_)[None, :] <= (tile_y0 + TH - 1)[:, None])
        return ov_x & ov_y & p.valid[None, :]

    def compact_argsort(p):
        overlap = overlap_of(p)
        iota = jax.lax.broadcasted_iota(jnp.int32, overlap.shape, 1)
        key = jnp.where(overlap, iota, N + iota)
        cand = jnp.argsort(key, axis=1)[:, :CAP].astype(jnp.int32)
        count = jnp.sum(overlap, axis=1).astype(jnp.int32)
        return cand, count

    bench("overlap + compaction argsort [75,86k]",
          jax.jit(compact_argsort), pgs)

    def compact_approx(p):
        overlap = overlap_of(p)
        iota = jax.lax.broadcasted_iota(jnp.int32, overlap.shape, 1)
        key = jnp.where(overlap, iota, N + iota).astype(jnp.float32)
        _, cand = jax.lax.approx_min_k(key, CAP, recall_target=0.99)
        count = jnp.sum(overlap, axis=1).astype(jnp.int32)
        return cand.astype(jnp.int32), count

    bench("overlap + approx_min_k compaction",
          jax.jit(compact_approx), pgs)

    cand, count = jax.jit(compact_argsort)(pgs)
    cand = jnp.asarray(cand)
    slot_ok = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1) < \
        jnp.minimum(count, CAP)[:, None]

    fields = jnp.concatenate(
        [pgs.mean2d, pgs.conic, pgs.color, pgs.opacity[:, None]], axis=1)
    bench("compact gather (75x1024 rows)", jax.jit(
        lambda f, c, s: R._compact_gather(f, c, s)), fields, cand, slot_ok)

    g = jax.jit(lambda f, c, s: R._compact_gather(f, c, s))(
        fields, cand, slot_ok)
    g = jnp.asarray(g)

    def composite(gg):
        g_mean2d = gg[..., 0:2]
        g_conic = gg[..., 2:5]
        g_color = gg[..., 5:8]
        g_opa = gg[..., 8]
        p = TH * TW
        pix_iota = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, p), 1)
        pix_x = (tile_x0[:, None] + pix_iota % TW).astype(jnp.float32)
        pix_y = (tile_y0[:, None] + pix_iota // TW).astype(jnp.float32)
        bgj = jnp.asarray(bg)

        K_CHUNK = 256
        n_k = CAP // K_CHUNK

        def tile_fn(mean2d, conic, color, opav, px, py):
            def chunks(x):
                return x.reshape(n_k, K_CHUNK, *x.shape[1:])

            @jax.checkpoint
            def step(carry, xs):
                rgb, logT = carry
                m_c, c_c, col_c, o_c = xs
                a = R._alpha(m_c, c_c, o_c, px, py)
                log_1ma = jnp.log1p(-a)
                cum = jnp.cumsum(log_1ma, axis=1) + logT[:, None]
                contrib = jnp.exp(cum) >= R.T_EPS
                w = jnp.where(contrib, a * jnp.exp(cum - log_1ma), 0.0)
                rgb = rgb + jnp.dot(w, col_c,
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
                logT = logT + jnp.sum(jnp.where(contrib, log_1ma, 0.0),
                                      axis=1)
                return (rgb, logT), None

            init = (jnp.zeros((px.shape[0], 3), jnp.float32),
                    jnp.zeros((px.shape[0],), jnp.float32))
            (rgb, logT), _ = jax.lax.scan(
                step, init, (chunks(mean2d), chunks(conic), chunks(color),
                             chunks(opav)))
            return rgb + jnp.exp(logT)[:, None] * bgj[None, :]

        return jax.vmap(tile_fn)(g_mean2d, g_conic, g_color, g_opa,
                                 pix_x, pix_y)

    bench("composite scan fwd", jax.jit(composite), g)
    bench("composite scan fwd+bwd", jax.jit(
        lambda gg: jax.grad(lambda x: jnp.sum(composite(x)))(gg)), g)

    # full render with approx compaction (fwd+bwd)
    def render_approx(p):
        p = R._sorted_by_depth(p)
        cand_, count_ = compact_approx(p)
        slot_ = jax.lax.broadcasted_iota(jnp.int32, cand_.shape, 1) < \
            jnp.minimum(count_, CAP)[:, None]
        f = jnp.concatenate(
            [p.mean2d, p.conic, p.color, p.opacity[:, None]], axis=1)
        gg = R._compact_gather(f, cand_, slot_)
        tiles = composite(gg)
        img = tiles.reshape(ty, tx, TH, TW, 3)
        return img.transpose(4, 0, 2, 1, 3).reshape(3, H, W)

    def loss_a(m, o, s, r, sh):
        p = preprocess_gaussians(m, o, s, r, sh, wv, fp, cc, H, W,
                                 tanf, tanf, 1)
        return jnp.sum(render_approx(p))

    bench("full render approx fwd+bwd", jax.jit(
        lambda m, o, s, r, sh: jax.grad(loss_a, argnums=(0, 1, 2, 3, 4))(
            m, o, s, r, sh)), means, opa, scales, rots, shs)

    # image diff exact vs approx
    img_e = jax.jit(lambda p: R.rasterize_projected(
        p, bg, H, W, TH, TW, CAP))(pg)
    img_a = jax.jit(render_approx)(pg)
    d = np.abs(np.asarray(img_e) - np.asarray(img_a))
    print(f"approx-vs-exact image: max {d.max():.4f} mean {d.mean():.6f}")


if __name__ == "__main__":
    main()
