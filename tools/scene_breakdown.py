"""Wall-clock attribution of the scene train step on the real TPU.

Slope-times sub-programs of the SparseUNet (or PTv3) scene step at the
full reference config (80k pts, 8 cond + 8 sup views, 160x120) so the
2.3%-MFU gap can be attributed (round-4 VERDICT item 2). Run alone on
the TPU host:

  python tools/scene_breakdown.py [sparseunet_pretraining|ptv3_pretraining]
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


def time_slope(run_n, lo=1, hi=4, repeats=2):
    lo_t = min(run_n(lo) for _ in range(repeats))
    hi_t = min(run_n(hi) for _ in range(repeats))
    return max((hi_t - lo_t) / (hi - lo), 1e-9)


def bench_fn(jitted, args, lo=1, hi=4):
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

    return time_slope(run_n, lo, hi)


def main():
    config_name = sys.argv[1] if len(sys.argv) > 1 \
        else "sparseunet_pretraining"
    from unipre3d_tpu.training.config import load_config
    from unipre3d_tpu.training.trainer import (create_train_state,
                                               make_train_step,
                                               render_supervision_views,
                                               compute_loss, model_inputs)
    from unipre3d_tpu.data.dataset_factory import get_dataset
    from unipre3d_tpu.data.loader import Loader

    cfg = load_config(config_name, overrides=[
        "opt.batch_size=1", "data.pts_dataset_root=synthetic",
        "opt.ema.update_after_step=1"] + sys.argv[2:])
    ds = get_dataset(cfg, "train")
    batch = next(iter(Loader(ds, 1, shuffle=False).epoch(0)))
    rng = jax.random.PRNGKey(0)
    model, tx, state = create_train_state(cfg, rng, batch,
                                          dtype=jnp.bfloat16)
    n_in = int(cfg.data.input_images)
    batch_dev = jax.tree_util.tree_map(jnp.asarray, batch)
    bg = np.zeros(3, np.float32)

    rows = []

    def report(name, sec):
        rows.append((name, sec * 1e3))
        print(f"{name:26s}: {sec*1e3:9.2f} ms", flush=True)

    # 1. full train step
    step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))

    def run_step_n(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, batch_dev)
        float(m["loss"])
        return time.perf_counter() - t0

    state2, m = step(state, batch_dev)
    state = state2
    float(m["loss"])
    report("full step (live VAE)", time_slope(run_step_n))

    # 2. full step with cached VAE features
    from unipre3d_tpu.training.feature_cache import (DeviceVAECache,
                                                     make_feature_fn)
    ch = int(cfg.data.training_height)
    cw = int(cfg.data.training_width)
    cache = DeviceVAECache(make_feature_fn(model), capacity=n_in,
                           img_h=ch, img_w=cw)
    cached = dict(batch_dev)
    cached["vae_features"] = cache.attach(batch, state.params, n_in)

    def run_cached_n(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, cached)
        float(m["loss"])
        return time.perf_counter() - t0

    state2, m = step(state, cached)
    state = state2
    float(m["loss"])
    report("full step (cached VAE)", time_slope(run_cached_n))

    # 2b. precomputed batch geometry (models/scene_geometry.py): build
    # cost, and the step with geometry off the critical path
    from unipre3d_tpu.training.trainer import make_geometry_fn
    geom_fn = make_geometry_fn(cfg, model)
    if geom_fn is not None:
        jgm = jax.jit(geom_fn)
        report("geometry build", bench_fn(jgm, (cached,)))
        cached["geometry"] = jax.tree_util.tree_map(
            jnp.asarray, jgm(cached))

        def run_geom_n(n):
            nonlocal state
            t0 = time.perf_counter()
            m = None
            for _ in range(n):
                state, m = step(state, cached)
            float(m["loss"])
            return time.perf_counter() - t0

        state2, m = step(state, cached)
        state = state2
        float(m["loss"])
        report("full step (cached+geom)", time_slope(run_geom_n))

    # 3. model fwd only (cached features [+ geometry])
    def fwd(params, batch_stats, b):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, *model_inputs(b, n_in, "scene"),
                           train=False, vae_features=b["vae_features"],
                           geometry=b.get("geometry"))

    jf = jax.jit(fwd)
    report("model fwd (cached)",
           bench_fn(jf, (state.params, state.batch_stats, cached)))

    gaussians = jax.tree_util.tree_map(
        jnp.asarray, jf(state.params, state.batch_stats, cached))

    # 4. render fwd / fwd+bwd (8 supervision views)
    jr = jax.jit(lambda g, b: render_supervision_views(g, b, cfg, bg))
    report("render fwd", bench_fn(jr, (gaussians, batch_dev)))

    def render_loss(g, b):
        r = render_supervision_views(g, b, cfg, bg)
        return compute_loss(r, b["gt_images"][:, n_in:], cfg, bg)[0]

    # differentiate only the float leaves (the gaussian dict carries a
    # bool validity mask); numpy closure constant, not a jax array
    g_float = {k: v for k, v in gaussians.items()
               if jnp.issubdtype(v.dtype, jnp.inexact)}
    g_rest = {k: np.asarray(v) for k, v in gaussians.items()
              if not jnp.issubdtype(v.dtype, jnp.inexact)}
    jrb = jax.jit(lambda gf, b: jax.grad(
        lambda gf2, b2: render_loss({**gf2, **g_rest}, b2))(gf, b))
    report("render fwd+bwd", bench_fn(jrb, (g_float, batch_dev)))

    # 5. model fwd+bwd + render fwd+bwd (no optimizer)
    def full_loss(params, batch_stats, b):
        return render_loss(fwd(params, batch_stats, b), b)

    jg = jax.jit(lambda p, bs, b: jax.grad(full_loss)(p, bs, b))
    report("loss fwd+bwd (cached)",
           bench_fn(jg, (state.params, state.batch_stats, cached)))

    # 6. neighbor-table build at the fine level (the merge-sort lookup)
    from unipre3d_tpu.ops import sparse as sp
    sv, _ = jax.vmap(sp.canonicalize)(
        batch_dev["point_cloud"]["grid_coord"],
        batch_dev["point_cloud"]["feat"].astype(jnp.bfloat16),
        batch_dev["point_cloud"]["mask"])
    offs3 = sp.kernel_offsets(3)
    offs5 = sp.kernel_offsets(5)
    jn3 = jax.jit(lambda s: jax.vmap(
        sp.find_neighbors, in_axes=(0, None))(s, offs3))
    report("find_neighbors 3^3 fine", bench_fn(jn3, (sv,), lo=2, hi=8))
    jn5 = jax.jit(lambda s: jax.vmap(
        sp.find_neighbors, in_axes=(0, None))(s, offs5))
    report("find_neighbors 5^3 fine", bench_fn(jn5, (sv,), lo=2, hi=8))

    print()
    step_ms = rows[0][1]
    for name, ms in rows[1:]:
        print(f"{name:26s}: {ms/step_ms*100:5.1f}% of live step")


if __name__ == "__main__":
    main()
