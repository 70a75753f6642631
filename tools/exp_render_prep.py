"""Attribute the object render path OUTSIDE the dense kernel.

tpu_breakdown round-5: render fwd+bwd 21.2 ms vs the dense kernel's
14.3 ms alone — ~7 ms hides in preprocess/sort/pack/loss. This tool
slope-times (kernel alone) vs (render_supervision_views) vs (+loss),
all fwd+bwd, on the object shapes. Run ALONE on the TPU host.
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


def time_slope(run_n, lo=5, hi=40, repeats=2):
    lo_t = min(run_n(lo) for _ in range(repeats))
    hi_t = min(run_n(hi) for _ in range(repeats))
    return max((hi_t - lo_t) / (hi - lo), 1e-9)


def bench_grad(fn, args):
    def loss(*a):
        return jnp.sum(fn(*a))

    def gradsum(*a):
        g = jax.grad(loss, argnums=tuple(range(len(a))))(*a)
        return sum(jnp.sum(x) for x in g)

    j = jax.jit(gradsum)
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
    from unipre3d_tpu.training.config import load_config
    from unipre3d_tpu.training.trainer import (render_supervision_views,
                                               compute_loss)
    from __graft_entry__ import _synthetic_batch

    cfg = load_config("transformer_pretraining",
                      overrides=["data.dataset_root=synthetic"]
                      + sys.argv[1:])
    B, n_pts, n_views = int(cfg.opt.batch_size), 1024, 5
    batch = _synthetic_batch(cfg, batch=B, n_points=n_pts, n_views=n_views)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    n_in = int(cfg.data.input_images)
    G = 128  # transformer token count
    rng = np.random.default_rng(0)
    bg = np.zeros(3, np.float32)

    gaussians = {
        "xyz": jnp.asarray(rng.uniform(-0.4, 0.4, (B, G, 3))
                           .astype(np.float32)),
        "opacity": jnp.asarray(rng.uniform(0.2, 0.9, (B, G, 1))
                               .astype(np.float32)),
        "scaling": jnp.asarray(np.full((B, G, 3), 0.02, np.float32)),
        "rotation": jnp.asarray(np.tile([1, 0, 0, 0], (B, G, 1))
                                .astype(np.float32)),
        "features_dc": jnp.asarray(rng.normal(size=(B, G, 1, 3))
                                   .astype(np.float32) * 0.3),
        "features_rest": jnp.asarray(rng.normal(size=(B, G, 3, 3))
                                     .astype(np.float32) * 0.1),
    }

    # 1. render only (prep + sort + pack + kernel)
    def render(xyz, opa, scal, rot, dc, rest):
        g = dict(gaussians)
        g.update(xyz=xyz, opacity=opa, scaling=scal, rotation=rot,
                 features_dc=dc, features_rest=rest)
        return render_supervision_views(g, batch, cfg, bg)

    args = tuple(gaussians[k] for k in ("xyz", "opacity", "scaling",
                                        "rotation", "features_dc",
                                        "features_rest"))
    ms_render = bench_grad(render, args)
    print(f"render fwd+bwd            : {ms_render:7.2f} ms", flush=True)

    # 2. render + photometric loss
    def render_loss(*a):
        r = render(*a)
        return compute_loss(r, batch["gt_images"][:, n_in:], cfg, bg)[0]

    ms_loss = bench_grad(render_loss, args)
    print(f"render+loss fwd+bwd       : {ms_loss:7.2f} ms", flush=True)

    # 3. kernel alone at the same shapes (R = B * V_sup)
    from unipre3d_tpu.ops.rasterizer.pallas_splat_dense import \
        rasterize_dense_batched
    R = B * (n_views - n_in)
    res = int(cfg.data.training_resolution)
    m2 = jnp.asarray(rng.uniform(0, res, (R, G, 2)).astype(np.float32))
    con = jnp.asarray(np.stack([np.full((R, G), .05), np.full((R, G), .01),
                                np.full((R, G), .05)], -1)
                      .astype(np.float32))
    col = jnp.asarray(rng.uniform(0, 1, (R, G, 3)).astype(np.float32))
    op = jnp.asarray(rng.uniform(0.3, 1, (R, G)).astype(np.float32))
    dep = jnp.asarray(rng.uniform(.5, 2, (R, G)).astype(np.float32))
    va = jnp.ones((R, G), bool)

    def kern(m, c, cc, o):
        return rasterize_dense_batched(m, c, cc, o, dep, va, bg, res, res)

    ms_kern = bench_grad(kern, (m2, con, col, op))
    print(f"kernel alone fwd+bwd      : {ms_kern:7.2f} ms", flush=True)
    print(f"prep+sort+pack share      : {ms_render - ms_kern:7.2f} ms")
    print(f"loss share                : {ms_loss - ms_render:7.2f} ms")


if __name__ == "__main__":
    main()
