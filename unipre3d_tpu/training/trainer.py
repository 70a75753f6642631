"""Training orchestration: functional train step + iteration loop.

TPU-native rewrite of reference train_network.py:305-556 (Trainer /
ModelManager / ValidationManager):

* one jitted, state-donating ``train_step`` that runs backbone forward,
  renders ALL supervision views of the whole batch in a single vmapped
  rasterizer call (vs. the reference's Python double loop at
  train_network.py:417-443), computes the photometric loss, and applies
  AdamW(eps=1e-15) + StepLR + grad-clip(1.0) + NaN-skip + EMA;
* frozen VAE parameters get zero updates (reference freezes them by
  giving AdamW lr only to point_network/fusion_mlps/image_conv,
  train_network.py:166-178);
* data parallelism = batch-axis sharding over the ``data`` mesh axis
  (gradient pmean inserted by XLA, SyncBN for free).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from unipre3d_tpu.models.gaussian_predictor import build_predictor
from unipre3d_tpu.ops.rasterizer import rasterize
from unipre3d_tpu.utils import losses as loss_lib


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    rng: jnp.ndarray


def _is_frozen(path: Tuple) -> bool:
    """VAE (image_network) params are frozen."""
    return any(getattr(k, "key", None) == "image_network" for k in path)


def split_frozen(params):
    """Split a param tree into (trainable, frozen) at the top level.

    The frozen SD-VAE subtree (``image_network``, ~80M params) is
    excluded from autodiff and the optimizer entirely — the reference
    freezes it by building AdamW only over the other param groups
    (train_network.py:166-178). Round-4 measurement: threading the
    frozen tree through grad/clip/apply_if_finite/apply_updates as
    zeros cost ~9 ms of a 51 ms object step."""
    if isinstance(params, dict) and "image_network" in params:
        p = dict(params)
        frozen = {"image_network": p.pop("image_network")}
        return p, frozen
    return params, {}


def merge_frozen(train_params, frozen_params):
    return {**train_params, **frozen_params} if frozen_params \
        else train_params


def make_optimizer(cfg):
    """AdamW(eps=1e-15, betas cfg) + StepLR(step_lr, lr_gamma) +
    clip(1.0), NaN-guarded. Operates on the TRAINABLE subtree only
    (see :func:`split_frozen`)."""
    base_lr = float(cfg.opt.base_lr)
    schedule = optax.exponential_decay(
        init_value=base_lr,
        transition_steps=int(cfg.opt.step_lr),
        decay_rate=float(cfg.opt.lr_gamma),
        staircase=True)
    betas = cfg.opt.get("betas", [0.9, 0.999])
    inner = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, b1=float(betas[0]), b2=float(betas[1]),
                    eps=1e-15, weight_decay=0.01),
    )
    tx = optax.apply_if_finite(inner, max_consecutive_errors=10 ** 8)
    return tx, schedule


def render_supervision_views(gaussians: Dict[str, jnp.ndarray],
                             batch: Dict[str, jnp.ndarray],
                             cfg, bg_color,
                             start_view: Optional[int] = None) -> jnp.ndarray:
    """Render views [start_view:] (default: the supervision views
    [input_images:]) for every batch element in one vmapped call ->
    images [B, V_sup, 3, H, W]."""
    n_in = int(cfg.data.input_images) if start_view is None else start_view
    res = int(cfg.data.training_resolution) if \
        "training_resolution" in cfg.data else None
    if res is not None:
        img_h = img_w = res
    else:
        img_h, img_w = int(cfg.data.training_height), int(cfg.data.training_width)
    tanfov = math.tan(float(cfg.data.fov) * math.pi / 360)
    cap = int(cfg.tpu.get("raster_tile_capacity", 1024)) \
        if "tpu" in cfg else 1024

    from unipre3d_tpu.ops.rasterizer.render import auto_tile
    tile_h, tile_w = auto_tile(img_h, img_w)

    mask = gaussians.get("mask")

    shs = jnp.concatenate([gaussians["features_dc"],
                           gaussians["features_rest"]], axis=2)
    if mask is None:
        mask_b = jnp.ones(gaussians["xyz"].shape[:2], dtype=bool)
    else:
        mask_b = mask
    wvs = batch["world_view_transforms"][:, n_in:]
    fps = batch["full_proj_transforms"][:, n_in:]
    ccs = batch["camera_centers"][:, n_in:]

    N = gaussians["xyz"].shape[1]
    impl_train = str(cfg.tpu.get("raster_impl_train", "auto")) \
        if "tpu" in cfg else "auto"
    use_dense = impl_train == "pallas_dense" or \
        (impl_train == "auto" and N <= 4096)
    if use_dense:
        # ONE Pallas launch for all B*V renders (dense small-N path;
        # the reference runs a Python double loop of CUDA launches,
        # train_network.py:417-443); custom analytic VJP keeps only the
        # packed [R,16,N] table as residual — no jax.checkpoint needed
        from unipre3d_tpu.ops.rasterizer.pallas_splat_dense import \
            rasterize_dense_batched
        from unipre3d_tpu.ops.rasterizer.preprocess import \
            preprocess_gaussians

        def prep_one(xyz, opa, scale, rot, sh, m, wv, fp, cc):
            return preprocess_gaussians(
                xyz, opa, scale, rot, sh, wv, fp, cc, img_h, img_w,
                tanfov, tanfov, int(cfg.model.max_sh_degree),
                gaussian_mask=m)

        per_view = jax.vmap(prep_one,
                            in_axes=(None,) * 6 + (0, 0, 0))
        per_batch = jax.vmap(per_view, in_axes=(0,) * 9)
        pg = per_batch(gaussians["xyz"], gaussians["opacity"][..., 0],
                       gaussians["scaling"], gaussians["rotation"], shs,
                       mask_b, wvs, fps, ccs)
        B, Vs = pg.opacity.shape[:2]
        flat = jax.tree_util.tree_map(
            lambda a: a.reshape(B * Vs, *a.shape[2:]), pg)
        imgs = rasterize_dense_batched(
            flat.mean2d, flat.conic, flat.color, flat.opacity,
            flat.depth, flat.valid, bg_color, img_h, img_w)
        return imgs.reshape(B, Vs, 3, img_h, img_w)

    # Large-N routing: measured on the v5e at both routed regimes
    # (tools/splat_breakdown.py, round 4), the XLA tiled renderer with
    # auto_tile beats the binned Pallas kernel everywhere it is routed —
    # 6.3 ms vs 29.7 ms fwd+bwd at 100k/128^2 (32x32 tiles; the binned
    # kernel VMEM-OOMs past ~256 px/tile so it can't even use them) and
    # 17.9 ms vs 30.4 ms at the scene 120x160/98k shape (8x32 tiles).
    # The binned kernel's duplicate-sort prep alone costs 17 ms. So
    # ``auto`` routes large N to the XLA path; ``pallas_binned`` stays
    # available explicitly (tpu.raster_impl_train=pallas_binned).
    use_binned = impl_train == "pallas_binned"
    if use_binned:
        # full-span duplicate-sort Pallas kernel (CUDA-parity
        # structure), one view at a time under lax.map (sequential
        # kernel launches, single compiled instance).
        from unipre3d_tpu.ops.rasterizer import pallas_splat_binned as psb
        from unipre3d_tpu.ops.rasterizer.preprocess import \
            preprocess_gaussians

        def prep_one(xyz, opa, scale, rot, sh, m, wv, fp, cc):
            return preprocess_gaussians(
                xyz, opa, scale, rot, sh, wv, fp, cc, img_h, img_w,
                tanfov, tanfov, int(cfg.model.max_sh_degree),
                gaussian_mask=m)

        per_view = jax.vmap(prep_one, in_axes=(None,) * 6 + (0, 0, 0))
        per_batch = jax.vmap(per_view, in_axes=(0,) * 9)
        pg = per_batch(gaussians["xyz"], gaussians["opacity"][..., 0],
                       gaussians["scaling"], gaussians["rotation"], shs,
                       mask_b, wvs, fps, ccs)
        B, Vs = pg.opacity.shape[:2]
        flat = jax.tree_util.tree_map(
            lambda a: a.reshape(B * Vs, *a.shape[2:]), pg)

        # clamp to <=256 px/tile: the kernel's [P, CHUNK] intermediates
        # exceed scoped VMEM past that (measured OOM at 32x32)
        b_th, b_tw = tile_h, tile_w
        while b_th * b_tw > 256:
            b_th, b_tw = ((b_th // 2, b_tw) if b_th >= b_tw
                          else (b_th, b_tw // 2))

        def one(p):
            return psb.rasterize_projected_pallas_binned(
                p, bg_color, img_h, img_w, tile_h=b_th, tile_w=b_tw,
                max_per_tile=cap * 4)

        imgs = jax.lax.map(one, flat)
        return imgs.reshape(B, Vs, 3, img_h, img_w)

    def render_one(g_xyz, g_opa, g_scale, g_rot, g_sh, g_mask, wv, fp, cc):
        out = rasterize(
            g_xyz, g_opa, g_scale, g_rot, g_sh, wv, fp, cc,
            img_h=img_h, img_w=img_w, tanfovx=tanfov, tanfovy=tanfov,
            bg_color=bg_color, sh_degree=int(cfg.model.max_sh_degree),
            gaussian_mask=g_mask, tile_h=tile_h, tile_w=tile_w,
            capacity=cap)
        return out["render"]

    # remat trades ~35% extra render time for the [tiles, cap, P] alpha
    # residuals (~0.3 GB/view at 160x120/cap-1024). Keep it only when
    # the residual footprint is actually large.
    remat_mode = str(cfg.tpu.get("raster_remat", "auto")) \
        if "tpu" in cfg else "auto"
    n_tiles = (img_h // tile_h) * (img_w // tile_w)
    n_sup = batch["gt_images"].shape[1] - n_in
    resid_gb = (batch["gt_images"].shape[0] * n_sup * n_tiles * cap
                * tile_h * tile_w * 4) / 2 ** 30
    use_remat = remat_mode == "on" or (remat_mode == "auto"
                                       and resid_gb > 4.0)
    if use_remat:
        render_one = jax.checkpoint(render_one)

    # vmap over supervision views (gaussians broadcast), then over batch
    per_view = jax.vmap(render_one,
                        in_axes=(None, None, None, None, None, None, 0, 0, 0))
    per_batch = jax.vmap(per_view,
                         in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0))
    return per_batch(
        gaussians["xyz"], gaussians["opacity"][..., 0],
        gaussians["scaling"], gaussians["rotation"], shs, mask_b,
        wvs, fps, ccs)


def compute_loss(rendered: jnp.ndarray, gt: jnp.ndarray, cfg,
                 bg_color) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Photometric loss (reference ValidationManager.calculate_losses,
    train_network.py:260-302). rendered/gt: [B, V, 3, H, W]."""
    B, V = rendered.shape[:2]
    r = rendered.reshape(B * V, *rendered.shape[2:])
    g = gt.reshape(B * V, *gt.shape[2:])
    kind = cfg.opt.loss
    if kind == "focal_l2":
        main = loss_lib.focal_l2_loss(
            r, g, bg_color, float(cfg.opt.non_bg_color_loss_rate),
            float(cfg.opt.bg_color_loss_rate))
    elif kind == "l1":
        main = loss_lib.l1_loss(r, g)
    else:
        main = loss_lib.l2_loss(r, g)
    psnr = loss_lib.psnr(r, g)
    return main, {"loss": main, "psnr": psnr}


def model_inputs(batch, n_in: int, level: str):
    """Positional model args for one batch (object vs scene schema)."""
    to_arr = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    if level == "scene":
        return (to_arr(batch["point_cloud"]),
                jnp.asarray(batch["gt_images"][:, :n_in]),
                None,
                jnp.asarray(batch["unprojected_coords"]))
    return (jnp.asarray(batch["point_cloud"]),
            jnp.asarray(batch["gt_images"][:, :n_in]),
            jnp.asarray(batch["view_to_world_transforms"][:, :n_in]))


def make_geometry_fn(cfg, model=None):
    """Batch -> precomputed scene geometry (models/scene_geometry.py),
    or None when the config has no precomputable geometry (object
    level / non-sparseunet backbones).

    The returned function is jittable and a pure function of the batch;
    in production it runs in the input pipeline overlapped with the
    device step, taking the ~200 ms of argsorts/rank lookups off the
    step's critical path (round-4 attribution, docs/PERF_NOTES.md)."""
    if cfg.opt.level != "scene" or cfg.model.backbone_type != "sparseunet":
        return None
    from unipre3d_tpu.models.scene_geometry import build_spunet_geometry
    from unipre3d_tpu.models.sparseunet import SpUNet
    if model is not None and getattr(model, "backbone_overrides", None):
        overrides = {k: v for k, v in model.backbone_overrides}
    else:
        overrides = dict(cfg.model.get("backbone_overrides") or {})
    enc = SpUNet(in_channels=6, num_classes=64, **overrides)
    n_stages = len(enc.layers) // 2
    use_fusion = bool(cfg.opt.use_fusion)

    def geom_fn(batch):
        return build_spunet_geometry(
            jax.tree_util.tree_map(jnp.asarray, batch["point_cloud"]),
            jnp.asarray(batch["unprojected_coords"]) if use_fusion
            else None,
            grid_size=enc.grid_size, pixel_capacity=enc.pixel_capacity,
            level_divs=tuple(enc.level_capacity_div), n_stages=n_stages,
            use_fusion=use_fusion, conv_impl=enc.conv_impl,
            block_size=enc.block_size, block_div=enc.block_div)

    return geom_fn


def create_train_state(cfg, rng, sample_batch, dtype=jnp.float32):
    """Initialize model params/batch_stats/optimizer/EMA."""
    model = build_predictor(cfg, dtype=dtype)
    init_rng, state_rng = jax.random.split(rng)
    n_in = int(cfg.data.input_images)
    # jit the init: eager init compiles every primitive separately
    init_fn = jax.jit(functools.partial(model.init, train=False))
    variables = init_fn(
        {"params": init_rng, "droppath": init_rng},
        *model_inputs(sample_batch, n_in, cfg.opt.level))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx, schedule = make_optimizer(cfg)
    opt_state = tx.init(split_frozen(params)[0])
    return model, tx, TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=batch_stats, opt_state=opt_state,
        ema_params=jax.tree_util.tree_map(jnp.copy, params), rng=state_rng)


def make_train_step(cfg, model, tx):
    # np, not jnp: jax-array closure constants are lifted to hidden
    # executable parameters and break the dispatch fastpath (jax 0.9)
    bg_color = np.asarray(
        [1.0, 1.0, 1.0] if cfg.data.white_background else [0.0, 0.0, 0.0],
        dtype=np.float32)
    n_in = int(cfg.data.input_images)
    ema_cfg = cfg.opt.ema
    ema_beta = float(ema_cfg.beta)
    ema_every = int(ema_cfg.update_every)
    ema_after = int(ema_cfg.update_after_step)
    use_ema = bool(ema_cfg.use)

    level = cfg.opt.level
    lambda_lpips = float(cfg.opt.get("lambda_lpips", 0.01))
    start_lpips_after = int(cfg.opt.get("start_lpips_after", 0))

    def loss_fn(train_params, frozen_params, batch_stats, batch, rng,
                step, lpips_params):
        params = merge_frozen(train_params, frozen_params)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(
            variables,
            *model_inputs(batch, n_in, level),
            train=True,
            vae_features=batch.get("vae_features"),
            geometry=batch.get("geometry"),
            rngs={"droppath": rng},
            mutable=["batch_stats"] if batch_stats else [])
        if batch_stats:
            gaussians, new_vars = out
            new_stats = new_vars["batch_stats"]
        else:
            gaussians, new_stats = out, batch_stats
        rendered = render_supervision_views(gaussians, batch, cfg, bg_color)
        gt = batch["gt_images"][:, n_in:]
        loss, metrics = compute_loss(rendered, gt, cfg, bg_color)
        if lpips_params is not None and lambda_lpips != 0.0:
            # reference gates LPIPS on iteration > start_lpips_after
            # (train_network.py:288-296); lax.cond skips the VGG when off
            from unipre3d_tpu.utils.lpips import lpips_fn
            B, V = rendered.shape[:2]
            r = rendered.reshape(B * V, *rendered.shape[2:])
            g = gt.reshape(B * V, *gt.shape[2:])
            lp = jax.lax.cond(
                step > start_lpips_after,
                lambda a, b: jnp.mean(lpips_fn(lpips_params,
                                               a * 2 - 1, b * 2 - 1)),
                lambda a, b: jnp.float32(0.0), r, g)
            loss = loss + lambda_lpips * lp
            metrics = dict(metrics)
            metrics["lpips"] = lp
            metrics["loss"] = loss
        return loss, (metrics, new_stats)

    def train_step(state: TrainState, batch, lpips_params=None):
        rng, step_rng = jax.random.split(state.rng)
        train_p, frozen_p = split_frozen(state.params)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_stats)), grads = grad_fn(
            train_p, frozen_p, state.batch_stats, batch, step_rng,
            state.step, lpips_params)
        updates, new_opt_state = tx.update(grads, state.opt_state, train_p)
        new_params = merge_frozen(optax.apply_updates(train_p, updates),
                                  frozen_p)
        step = state.step + 1
        if use_ema:
            def ema_update(path, e, p):
                if _is_frozen(path):
                    # frozen VAE subtree never changes: skipping the
                    # where-chain saves ~2 GB/step of HBM traffic
                    return e
                copy_phase = step <= ema_after
                do_update = jnp.logical_and(step > ema_after,
                                            step % ema_every == 0)
                decayed = e * ema_beta + p * (1.0 - ema_beta)
                return jnp.where(copy_phase, p,
                                 jnp.where(do_update, decayed, e))
            new_ema = jax.tree_util.tree_map_with_path(
                ema_update, state.ema_params, new_params)
        else:
            new_ema = state.ema_params
        new_state = TrainState(step=step, params=new_params,
                               batch_stats=new_stats,
                               opt_state=new_opt_state, ema_params=new_ema,
                               rng=rng)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(cfg, model, use_ema: bool = True):
    """Render every view of a batch with the (EMA) params and return
    per-view PSNR/SSIM split cond vs novel (reference eval.py:35-178)."""
    bg_color = np.asarray(
        [1.0, 1.0, 1.0] if cfg.data.white_background else [0.0, 0.0, 0.0],
        dtype=np.float32)
    n_in = int(cfg.data.input_images)

    def eval_step(state: TrainState, batch):
        params = state.ema_params if use_ema else state.params
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        gaussians = model.apply(
            variables, *model_inputs(batch, n_in, cfg.opt.level),
            train=False)
        rendered = render_supervision_views(gaussians, batch, cfg, bg_color,
                                            start_view=0)
        gt = batch["gt_images"]
        mse = jnp.mean((rendered - gt) ** 2, axis=(2, 3, 4))  # [B, V]
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
        # SSIM logged at every val like the reference (eval.py:169-176);
        # checkpoint selection stays on PSNR_novel (train_network.py:491)
        B, V = rendered.shape[:2]
        flat_r = rendered.reshape(B * V, *rendered.shape[2:])
        flat_g = gt.reshape(B * V, *gt.shape[2:])
        ssim_bv = loss_lib.ssim(flat_r, flat_g,
                                size_average=False).reshape(B, V)
        return {
            "psnr_cond": psnr[:, :n_in].mean(),
            "psnr_novel": psnr[:, n_in:].mean(),
            "ssim_cond": ssim_bv[:, :n_in].mean(),
            "ssim_novel": ssim_bv[:, n_in:].mean(),
            "rendered": rendered,
        }

    return eval_step
