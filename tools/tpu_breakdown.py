"""Wall-clock attribution of the object train step on the real TPU.

Slope-times jitted sub-programs of the cached-VAE object step (the
bench headline) so the 12%-MFU gap can be attributed (round-4 VERDICT
item 4a). Run alone on the TPU host: `python tools/tpu_breakdown.py`.
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


def bench_fn(jitted, args, lo=5, hi=40):
    """Iterate a jitted fn feeding its (donated or not) output back is
    not generally possible; just re-run on the same inputs and force a
    scalar fetch of a reduced output."""
    out = jitted(*args)
    scalar = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), o, jnp.float32(0)))

    def run_n(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = jitted(*args)
        float(scalar(o))
        return time.perf_counter() - t0

    float(scalar(out))
    return time_slope(run_n, lo, hi)


def main():
    from __graft_entry__ import _synthetic_batch
    from unipre3d_tpu.training.config import load_config
    from unipre3d_tpu.training.trainer import (create_train_state,
                                               make_train_step,
                                               render_supervision_views,
                                               compute_loss, model_inputs)
    from unipre3d_tpu.training.feature_cache import (DeviceVAECache,
                                                     make_feature_fn)
    from unipre3d_tpu.ops import subsample_group

    cfg = load_config("transformer_pretraining",
                      overrides=["data.dataset_root=synthetic"])
    B, n_points, n_views = int(cfg.opt.batch_size), 1024, 5
    batch = _synthetic_batch(cfg, batch=B, n_points=n_points,
                             n_views=n_views)
    rng = jax.random.PRNGKey(0)
    model, tx, state = create_train_state(cfg, rng, batch,
                                          dtype=jnp.bfloat16)
    n_in = int(cfg.data.input_images)
    res = int(cfg.data.training_resolution)
    cache = DeviceVAECache(make_feature_fn(model), capacity=B * n_in,
                           img_h=res, img_w=res)
    batch = dict(batch)
    batch["vae_features"] = np.asarray(
        cache.attach(batch, state.params, n_in))
    bg = np.zeros(3, np.float32)
    batch_dev = jax.tree_util.tree_map(jnp.asarray, batch)

    rows = []

    def report(name, sec):
        rows.append((name, sec * 1e3))
        print(f"{name:26s}: {sec*1e3:8.2f} ms", flush=True)

    # 1. full train step (state donation, like bench)
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
    report("full step", time_slope(run_step_n))

    # 2. model fwd only (cached VAE)
    def fwd(params, batch_stats, b):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, *model_inputs(b, n_in, "object"),
                           train=False, vae_features=b["vae_features"])

    jf = jax.jit(fwd)
    report("model fwd (cached)",
           bench_fn(jf, (state.params, state.batch_stats, batch_dev)))

    gaussians = jf(state.params, state.batch_stats, batch_dev)
    gaussians = jax.tree_util.tree_map(jnp.asarray, gaussians)

    # 3. render fwd only
    jr = jax.jit(lambda g, b: render_supervision_views(g, b, cfg, bg))
    report("render fwd", bench_fn(jr, (gaussians, batch_dev)))

    # 4. render fwd+bwd
    def render_loss(g, b):
        r = render_supervision_views(g, b, cfg, bg)
        return compute_loss(r, b["gt_images"][:, n_in:], cfg, bg)[0]

    jrb = jax.jit(lambda g, b: jax.grad(render_loss)(g, b))
    report("render fwd+bwd", bench_fn(jrb, (gaussians, batch_dev)))

    # 5. model fwd+bwd + render fwd+bwd (loss grad, no optimizer)
    def full_loss(params, batch_stats, b):
        g = fwd(params, batch_stats, b)
        return render_loss(g, b)

    jg = jax.jit(lambda p, bs, b: jax.grad(full_loss)(p, bs, b))
    report("loss fwd+bwd",
           bench_fn(jg, (state.params, state.batch_stats, batch_dev)))

    # 6. subsample_group alone (FPS + ball query + gather)
    pts = batch_dev["point_cloud"][:, :, :3]
    js = jax.jit(lambda p: subsample_group(p, 128, 32, radius=0.1))
    report("subsample_group", bench_fn(js, (pts,)))

    # 7. optimizer only
    grads = jg(state.params, state.batch_stats, batch_dev)
    grads = jax.tree_util.tree_map(jnp.asarray, grads)

    def opt_only(g, opt_state, params):
        import optax
        from unipre3d_tpu.training.trainer import split_frozen
        g_t, _ = split_frozen(g)
        p_t, _ = split_frozen(params)
        updates, new_os = tx.update(g_t, opt_state, p_t)
        return optax.apply_updates(p_t, updates), new_os

    jo = jax.jit(opt_only)
    report("optimizer+apply",
           bench_fn(jo, (grads, state.opt_state, state.params)))

    # 8. live-VAE fwd for the anchor's reference-FLOPs accounting
    def fwd_live(params, batch_stats, b):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, *model_inputs(b, n_in, "object"),
                           train=False)

    jl = jax.jit(fwd_live)
    report("model fwd (live VAE)",
           bench_fn(jl, (state.params, state.batch_stats, batch_dev)))

    print()
    step_ms = rows[0][1]
    for name, ms in rows[1:]:
        print(f"{name:26s}: {ms/step_ms*100:5.1f}% of step")


if __name__ == "__main__":
    main()
