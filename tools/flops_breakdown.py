"""FLOP attribution for the object train step (round-4 VERDICT weak #1).

Compiles pieces of the cached-VAE object step separately and prints each
piece's XLA cost-analysis FLOPs, so the 41.5 GF/sample headline can be
attributed. Run on CPU (HLO flops are platform-independent):

  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/flops_breakdown.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def flops_of(fn, *args):
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception as e:  # pragma: no cover
        print(f"  cost analysis failed: {e}", file=sys.stderr)
        return float("nan")


def main():
    from __graft_entry__ import _synthetic_batch
    from unipre3d_tpu.training.config import load_config
    from unipre3d_tpu.training.trainer import (create_train_state,
                                               make_train_step,
                                               render_supervision_views,
                                               compute_loss, model_inputs)
    from unipre3d_tpu.training.feature_cache import (DeviceVAECache,
                                                     make_feature_fn)

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

    step = make_train_step(cfg, model, tx)
    total = flops_of(step, state, batch)
    print(f"total step          : {total/1e9:9.1f} GF  "
          f"({total/B/1e9:6.2f} GF/sample)")

    def fwd(params, batch):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(variables, *model_inputs(batch, n_in, "object"),
                          train=False,
                          vae_features=jnp.asarray(batch["vae_features"]))
        return out

    f = flops_of(lambda p, b: jax.tree_util.tree_map(jnp.sum, fwd(p, b)),
                 state.params, batch)
    print(f"model fwd (cached)  : {f/1e9:9.1f} GF")

    gaussians = jax.jit(fwd)(state.params, batch)

    f = flops_of(
        lambda g, b: jnp.sum(render_supervision_views(g, b, cfg, bg)),
        gaussians, batch)
    print(f"render fwd          : {f/1e9:9.1f} GF")

    def render_loss(g, b):
        r = render_supervision_views(g, b, cfg, bg)
        loss, _ = compute_loss(r, b["gt_images"][:, n_in:], cfg, bg)
        return loss

    f = flops_of(lambda g, b: jax.grad(render_loss)(g, b), gaussians, batch)
    print(f"render fwd+bwd      : {f/1e9:9.1f} GF")

    def full_loss(params, b):
        g = fwd(params, b)
        return render_loss(g, b)

    f = flops_of(lambda p, b: jax.grad(full_loss)(p, b)["point_network"]
                 ["encoder"]["block0"]["attn"]["qkv"]["kernel"].sum(),
                 state.params, batch)
    print(f"loss fwd+bwd        : {f/1e9:9.1f} GF")

    # isolate image_conv: 1x1 conv 128->384 over B*n_in 128x128 maps
    vf = jnp.asarray(batch["vae_features"]).reshape(
        B * n_in, 128, res, res)

    def imgconv(params, vf):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        # vae_features given -> the frozen VAE is skipped; image unused
        return jnp.sum(model.apply(
            variables, None, vf,
            method=lambda m, img, feats: m._image_features(img, feats)))

    f = flops_of(imgconv, state.params, vf)
    print(f"image_conv fwd      : {f/1e9:9.1f} GF")

    f = flops_of(lambda p, v: jax.grad(imgconv)(p, v)
                 ["image_conv"]["layers_1"]["kernel"].sum(),
                 state.params, vf)
    print(f"image_conv fwd+bwd  : {f/1e9:9.1f} GF")

    # optimizer-only flops
    def opt_only(state, grads):
        updates, _ = tx.update(grads, state.opt_state, state.params)
        import optax
        return optax.apply_updates(state.params, updates)

    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    f = flops_of(lambda s, g: jax.tree_util.tree_map(
        jnp.sum, opt_only(s, g)), state, zero_grads)
    print(f"optimizer+apply     : {f/1e9:9.1f} GF")


if __name__ == "__main__":
    main()
