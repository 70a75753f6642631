"""Attribute the XLA tiled renderer's time at the SCENE shape.

scene_breakdown round-4: render fwd ~84 ms / fwd+bwd ~230 ms for 8
views at 98k gaussians, 120x160, cap 1024 — ~30% of the scene step.
This tool slope-times the stages of ops/rasterizer/render.py:
rasterize_projected (depth sort, overlap + compaction argsort, compact
gather, compositing scan) one view at a time. Run ALONE on the TPU
host: `python tools/exp_render_scene.py [N H W cap]`.
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


def bench_fn(fn, args, grad_idx=None):
    if grad_idx is not None:
        def loss(*a):
            out = fn(*a)
            return jax.tree_util.tree_reduce(
                lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), out,
                jnp.float32(0))

        def run(*a):
            g = jax.grad(loss, argnums=grad_idx)(*a)
            return sum(jnp.sum(x) for x in
                       jax.tree_util.tree_leaves(g))
        j = jax.jit(run)
    else:
        def run(*a):
            out = fn(*a)
            return jax.tree_util.tree_reduce(
                lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), out,
                jnp.float32(0))
        j = jax.jit(run)
    float(j(*args))

    def run_n(n):
        t0 = time.perf_counter()
        v = None
        for _ in range(n):
            v = j(*args)
        float(v)
        return time.perf_counter() - t0

    return time_slope(run_n) * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 160
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 1024

    from unipre3d_tpu.ops.rasterizer.render import (
        _compact_gather, _sorted_by_depth, auto_tile, rasterize_projected)
    from unipre3d_tpu.ops.rasterizer.preprocess import ProjectedGaussians

    tile_h, tile_w = auto_tile(H, W)
    print(f"N={N} {H}x{W} tiles {tile_h}x{tile_w} cap {cap}")
    rng = np.random.default_rng(0)
    pg = ProjectedGaussians(
        mean2d=jnp.asarray(rng.uniform(0, (W, H), (N, 2))
                           .astype(np.float32)),
        conic=jnp.asarray(np.tile([0.05, 0.01, 0.05], (N, 1))
                          .astype(np.float32)),
        color=jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
        opacity=jnp.asarray(rng.uniform(0.3, 1, N).astype(np.float32)),
        depth=jnp.asarray(rng.uniform(0.5, 3, N).astype(np.float32)),
        radius=jnp.asarray(rng.integers(1, 6, N).astype(np.int32)),
        valid=jnp.ones((N,), bool))
    bg = jnp.zeros(3)

    ms = bench_fn(lambda p: rasterize_projected(
        p, bg, H, W, tile_h, tile_w, cap), (pg,))
    print(f"full render fwd           : {ms:8.2f} ms", flush=True)

    def render_floats(fl):
        p = pg._replace(**fl)
        return rasterize_projected(p, bg, H, W, tile_h, tile_w, cap)

    floats = {k: getattr(pg, k)
              for k in ("mean2d", "conic", "color", "opacity", "depth")}
    ms = bench_fn(render_floats, (floats,), grad_idx=0)
    print(f"full render fwd+bwd       : {ms:8.2f} ms", flush=True)

    ms = bench_fn(_sorted_by_depth, (pg,))
    print(f"depth sort                : {ms:8.2f} ms", flush=True)

    # overlap + compaction argsort (the [tiles, N] candidate selection)
    pgs = _sorted_by_depth(pg)
    ty, tx = H // tile_h, W // tile_w
    n_tiles = ty * tx
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_x0 = (tile_ids % tx) * tile_w
    tile_y0 = (tile_ids // tx) * tile_h
    K = min(cap, N)

    def compact(p):
        r = p.radius.astype(jnp.float32)
        gx, gy = p.mean2d[:, 0], p.mean2d[:, 1]
        ov_x = ((gx + r)[None, :] >= tile_x0[:, None]) & \
               ((gx - r)[None, :] <= (tile_x0 + tile_w - 1)[:, None])
        ov_y = ((gy + r)[None, :] >= tile_y0[:, None]) & \
               ((gy - r)[None, :] <= (tile_y0 + tile_h - 1)[:, None])
        overlap = ov_x & ov_y & p.valid[None, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, overlap.shape, 1)
        key = jnp.where(overlap, iota, N + iota)
        cand = jnp.argsort(key, axis=1)[:, :K].astype(jnp.int32)
        return cand, jnp.sum(overlap, axis=1)

    ms = bench_fn(compact, (pgs,))
    print(f"overlap+compaction argsort: {ms:8.2f} ms", flush=True)

    def compact_topk(p):
        r = p.radius.astype(jnp.float32)
        gx, gy = p.mean2d[:, 0], p.mean2d[:, 1]
        ov_x = ((gx + r)[None, :] >= tile_x0[:, None]) & \
               ((gx - r)[None, :] <= (tile_x0 + tile_w - 1)[:, None])
        ov_y = ((gy + r)[None, :] >= tile_y0[:, None]) & \
               ((gy - r)[None, :] <= (tile_y0 + tile_h - 1)[:, None])
        overlap = ov_x & ov_y & p.valid[None, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, overlap.shape, 1)
        key = jnp.where(overlap, iota, N + iota)
        _, cand = jax.lax.top_k(-key, K)
        return cand.astype(jnp.int32), jnp.sum(overlap, axis=1)

    ms = bench_fn(compact_topk, (pgs,))
    print(f"overlap+compaction top_k  : {ms:8.2f} ms", flush=True)

    def compact_cumsum_scatter(p):
        """first-K set bits per tile via chunk-level cumsum + per-
        gaussian duplicate scatter (rank gathered at <=D tile dups)."""
        r = p.radius.astype(jnp.float32)
        gx, gy = p.mean2d[:, 0], p.mean2d[:, 1]
        ov_x = ((gx + r)[None, :] >= tile_x0[:, None]) & \
               ((gx - r)[None, :] <= (tile_x0 + tile_w - 1)[:, None])
        ov_y = ((gy + r)[None, :] >= tile_y0[:, None]) & \
               ((gy - r)[None, :] <= (tile_y0 + tile_h - 1)[:, None])
        overlap = ov_x & ov_y & p.valid[None, :]        # [T, N]
        rank = jnp.cumsum(overlap.astype(jnp.int32), axis=1) - 1
        # per-gaussian tile rectangle, capped at D duplicate slots
        D = 8
        tx0g = jnp.clip(((gx - r) // tile_w).astype(jnp.int32), 0, tx - 1)
        tx1g = jnp.clip(((gx + r) // tile_w).astype(jnp.int32), 0, tx - 1)
        ty0g = jnp.clip(((gy - r) // tile_h).astype(jnp.int32), 0, ty - 1)
        ty1g = jnp.clip(((gy + r) // tile_h).astype(jnp.int32), 0, ty - 1)
        wspan = tx1g - tx0g + 1
        iota_n = jnp.arange(N, dtype=jnp.int32)
        cands, slots = [], []
        for d in range(D):
            ddy, ddx = d // 4, d % 4
            tyd = ty0g + ddy
            txd = tx0g + ddx
            t = tyd * tx + txd
            okd = (ddx < wspan) & (tyd <= ty1g) & p.valid
            tc = jnp.clip(t, 0, n_tiles - 1)
            rk = rank[tc, iota_n]
            ok2 = okd & (rk < K) & overlap[tc, iota_n]
            slots.append(jnp.where(ok2, tc * K + rk, n_tiles * K))
            cands.append(iota_n)
        slot = jnp.concatenate(slots)
        val = jnp.concatenate(cands)
        cand = jnp.full((n_tiles * K,), N, jnp.int32).at[slot].min(
            val, mode="drop")
        return cand.reshape(n_tiles, K), jnp.sum(overlap, axis=1)

    ms = bench_fn(compact_cumsum_scatter, (pgs,))
    print(f"overlap+cumsum+scatter    : {ms:8.2f} ms", flush=True)
    # verify equality on the first tiles
    c1, n1 = jax.jit(compact)(pgs)
    c2, _ = jax.jit(compact_topk)(pgs)
    c3, _ = jax.jit(compact_cumsum_scatter)(pgs)
    c1n, c3n = np.asarray(c1), np.asarray(c3)
    okmask = c1n < N
    c3c = np.where(np.asarray(n1)[:, None] > np.arange(K)[None, :],
                   c3n, c1n)
    print("topk == argsort:", bool((np.asarray(c2) == c1n).all()),
          " scatter == argsort:",
          bool((np.where(okmask, c3c, c1n) == c1n).all()))

    cand, count = jax.jit(compact)(pgs)
    slot_ok = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1) < \
        jnp.minimum(count, K)[:, None]
    fields = jnp.concatenate(
        [pgs.mean2d, pgs.conic, pgs.color, pgs.opacity[:, None]], axis=1)

    ms = bench_fn(lambda f: _compact_gather(f, cand, slot_ok), (fields,))
    print(f"compact gather fwd        : {ms:8.2f} ms", flush=True)
    ms = bench_fn(lambda f: _compact_gather(f, cand, slot_ok), (fields,),
                  grad_idx=0)
    print(f"compact gather fwd+bwd    : {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
