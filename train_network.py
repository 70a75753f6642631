#!/usr/bin/env python
"""UniPre3D-TPU pretraining entry point.

Public-surface parity with reference train_network.py:559-589:

    python train_network.py --config-name transformer_pretraining \
        [key.subkey=value ...]

composes the same-named YAML config tree, then runs the iteration-based
pretraining loop (forward -> render supervision views -> photometric
loss -> AdamW/EMA) on the local TPU/CPU devices with batch-axis data
parallelism. ``data.dataset_root=synthetic`` runs on the procedural
dataset (no data mount needed).
"""

from __future__ import annotations

import argparse
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from unipre3d_tpu.data import get_dataset, Loader
from unipre3d_tpu.parallel import (make_mesh, maybe_initialize, replicate,
                                   shard_host_batch)
from unipre3d_tpu.training import checkpoint as ckpt_lib
from unipre3d_tpu.training.config import load_config, save_config
from unipre3d_tpu.training.logger import Logger
from unipre3d_tpu.training.trainer import (create_train_state,
                                           make_eval_step, make_train_step)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-name", default="default_config")
    p.add_argument("--config-dir", default=None)
    p.add_argument("--output-dir", default=None)
    p.add_argument("overrides", nargs="*", help="key.subkey=value overrides")
    return p.parse_args()


def main():
    args = parse_args()
    # multi-host pod: form the global runtime BEFORE any device query
    # (reference forms its NCCL world in launch(),
    # pointcept/engines/launch.py:89-102; here jax.distributed + GSPMD)
    if maybe_initialize():
        print(f"[train] distributed runtime: process "
              f"{jax.process_index()}/{jax.process_count()}, "
              f"{jax.device_count()} global devices")
    cfg = load_config(args.config_name, config_dir=args.config_dir,
                      overrides=args.overrides)
    out_dir = args.output_dir or os.path.join(
        "experiments_out", time.strftime("%Y-%m-%d/%H-%M-%S"))
    os.makedirs(out_dir, exist_ok=True)
    save_config(cfg, os.path.join(out_dir, ".hydra", "config.yaml"))

    seed = int(cfg.general.random_seed)
    np.random.seed(seed)
    rng = jax.random.PRNGKey(seed)

    compute_dtype = jnp.bfloat16 if cfg.get("tpu", {}).get(
        "compute_dtype", "bfloat16") == "bfloat16" else jnp.float32

    mesh = make_mesh()   # global mesh: jax.devices() spans all hosts
    n_dev = mesh.devices.size
    n_proc = jax.process_count()
    batch_size = int(cfg.opt.batch_size)   # GLOBAL batch (reference
    # semantics: opt.batch_size split over devices, train_network.py:67-71).
    # n_proc divides n_dev (equal local devices per host), so rounding to
    # a multiple of n_dev also makes the per-host share integral.
    if batch_size % n_dev != 0:
        batch_size = max(n_dev, batch_size - batch_size % n_dev)
        print(f"[train] batch_size adjusted to {batch_size} "
              f"for {n_dev} devices / {n_proc} hosts")
    local_bs = batch_size // n_proc   # per-host share of the global batch

    train_ds = get_dataset(cfg, "train")
    val_ds = get_dataset(cfg, "val")
    # Mix3d scene mixing (reference point_collate_fn mix_prob,
    # pointcept/datasets/utils.py:61-72; off in reference pretrain cfgs)
    mix_prob = float(cfg.data.get("mix_prob", 0.0))
    collate_hook = None
    if mix_prob > 0.0:
        # Mix3d merges only the point-cloud keys: with rendering
        # supervision the mixed cloud would train against scene A's
        # unmixed cameras/GT images. The reference uses mix_prob only
        # for segmentation fine-tuning (no render target), so the
        # rendering-pretraining CLI rejects it; the fine-tune engine
        # (unipre3d_tpu/training/hooks.py FinetuneTrainer) is the
        # supported consumer.
        raise ValueError(
            "data.mix_prob > 0 is unsupported for rendering pretraining "
            "(half-mixed clouds vs unmixed render targets); use the "
            "segmentation fine-tune engine for Mix3d.")
    train_loader = Loader(train_ds, local_bs, shuffle=True, seed=seed,
                          shard_id=jax.process_index(),
                          num_shards=n_proc,
                          collate_hook=collate_hook)
    # val is sharded too; Loader pads shards to equal length so every
    # host enters the same number of (global, SPMD) eval_step calls.
    # The per-host val batch is rounded up to the local device count so
    # the global val batch tiles the data axis exactly (tail batches are
    # padded by repetition below — the reference's DistributedSampler
    # double-counts padded examples the same way).
    local_devs = max(1, n_dev // n_proc)
    val_local_bs = max(1, min(local_bs, -(-max(1, len(val_ds)) // n_proc)))
    val_local_bs = -(-val_local_bs // local_devs) * local_devs
    val_loader = Loader(val_ds, val_local_bs, shuffle=False,
                        shard_id=jax.process_index(), num_shards=n_proc)

    def pad_to(batch, size):
        """Repeat-pad a host batch's leading axis up to ``size``."""
        def pad(x):
            n = x.shape[0]
            if n == size:
                return x
            reps = -(-size // n)
            return np.concatenate([x] * reps, axis=0)[:size]
        return jax.tree_util.tree_map(pad, batch)

    sample = next(iter(train_loader.epoch(0)))
    model, tx, state = create_train_state(cfg, rng, sample,
                                          dtype=compute_dtype)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"[train] devices={n_dev} params={n_params/1e6:.2f}M "
          f"backbone={cfg.model.backbone_type}")

    # warm start from a torch backbone checkpoint (reference
    # opt.pretrained_ckpt, model/point_predictor.py:44-53, strict=False)
    pretrained = str(cfg.opt.get("pretrained_ckpt") or "")
    if pretrained and os.path.exists(pretrained) and \
            cfg.model.backbone_type == "transformer":
        import torch
        from unipre3d_tpu.export import import_transformer_backbone
        sd = torch.load(pretrained, map_location="cpu", weights_only=False)
        sd = sd.get("model_state_dict", sd)
        sd = {k: np.asarray(v) for k, v in sd.items()}
        params = jax.tree_util.tree_map(np.asarray, state.params)
        stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
        import_transformer_backbone(
            sd, params["point_network"]["encoder"],
            stats["point_network"]["encoder"],
            prefix="point_network.encoder")
        state = state._replace(
            params=jax.device_put(params),
            ema_params=jax.device_put(params),
            batch_stats=jax.device_put(stats))
        print(f"[train] warm-started backbone from {pretrained}")

    # resume
    latest = os.path.join(out_dir, "model_latest.ckpt")
    best_psnr = 0.0
    if os.path.exists(latest):
        state, best_psnr = ckpt_lib.load_checkpoint(latest, state)
        print(f"[train] resumed from step {int(state.step)}")

    # commit the state to the global mesh (replicated): on a pod every
    # host computed the same init / loaded the same checkpoint, so the
    # host-local copies agree and device_put to the replicated sharding
    # is valid (covers fresh init, warm start, and resume)
    state = replicate(state, mesh)

    train_step = make_train_step(cfg, model, tx)
    eval_step = make_eval_step(cfg, model)
    donate = bool(cfg.get("tpu", {}).get("donate_state", True))
    train_step = jax.jit(train_step, donate_argnums=(0,) if donate else ())
    eval_step = jax.jit(eval_step)

    # optional LPIPS perceptual-loss weights (reference lpips VGG,
    # train_network.py:224-231); converted params via utils/lpips.py
    lpips_params = None
    lpips_path = cfg.opt.get("lpips_weights", "")
    if lpips_path and os.path.exists(str(lpips_path)):
        from unipre3d_tpu.utils.lpips import load_lpips_params
        lpips_params = jax.device_put(load_lpips_params(str(lpips_path)))
        print(f"[train] LPIPS weights loaded from {lpips_path}")

    # device-resident cache of frozen-VAE conditioning features: skips
    # ~85% of object-step FLOPs once warm (see training/feature_cache.py)
    n_in = int(cfg.data.input_images)
    cache_entries = int(cfg.get("tpu", {}).get("vae_cache_entries", 0))
    vae_cache = None
    if cache_entries > 0 and bool(cfg.opt.use_fusion):
        from unipre3d_tpu.training.feature_cache import (DeviceVAECache,
                                                         make_feature_fn)
        if "training_resolution" in cfg.data:
            ch, cw = [int(cfg.data.training_resolution)] * 2
        else:
            ch, cw = int(cfg.data.training_height), int(cfg.data.training_width)
        # decoder_block_3 channel count = first VAE block width (128 for
        # the SD-VAE; smaller under model.vae_overrides compile budgets)
        vo = dict(cfg.model.get("vae_overrides") or {})
        feat_ch = int(list(vo.get("block_out_channels", [128]))[0])
        vae_cache = DeviceVAECache(make_feature_fn(model), cache_entries,
                                   ch, cw, channels=feat_ch)
        print(f"[train] VAE feature cache: {cache_entries} slots "
              f"({cache_entries * feat_ch * ch * cw * 2 / 2**30:.2f} "
              "GiB HBM)")

    # precomputed scene geometry (models/scene_geometry.py): every index
    # structure of the sparse forward is a pure function of the batch,
    # built outside the train step. Here it runs as a separate jit just
    # before the step (single-host pipeline); production input pipelines
    # overlap it with the device step like any other data work.
    geom_jit = None
    if bool(cfg.get("tpu", {}).get("precompute_geometry", True)):
        from unipre3d_tpu.training.trainer import make_geometry_fn
        geom_fn = make_geometry_fn(cfg, model)
        if geom_fn is not None:
            geom_jit = jax.jit(geom_fn)
            print("[train] precomputing scene geometry per batch")

    logger = Logger(cfg, out_dir)
    iterations = int(cfg.opt.iterations)
    loss_log = int(cfg.logging.loss_log)
    val_log = int(cfg.logging.val_log)
    loop_log = int(cfg.logging.get("loop_log", 2000))
    test_loader = Loader(get_dataset(cfg, "test"), 1, shuffle=False)

    it = int(state.step)
    t_last = time.time()
    imgs_since = 0
    data_iter = train_loader.iter_from(int(state.step))
    for it in range(int(state.step) + 1, iterations + 1):
        host_batch = next(data_iter)   # per-host shard of the global batch
        batch = shard_host_batch(host_batch, mesh)
        if vae_cache is not None:
            batch["vae_features"] = shard_host_batch(
                vae_cache.attach(host_batch, state.params, n_in), mesh)
        if geom_jit is not None:
            batch["geometry"] = geom_jit(batch)
        state, metrics = train_step(state, batch, lpips_params)
        imgs_since += batch_size
        if it % loss_log == 0:
            jax.block_until_ready(metrics["loss"])
            dt = time.time() - t_last
            metrics = {k: float(v) for k, v in metrics.items()}
            metrics["samples_per_sec"] = imgs_since / dt
            if vae_cache is not None:
                metrics["vae_cache_hit_rate"] = round(vae_cache.hit_rate, 4)
            logger.log(it, metrics)
            t_last = time.time()
            imgs_since = 0
        if it % val_log == 0 or it == iterations:
            # cross-host PSNR reduction (reference dist.all_reduce,
            # train_network.py:253-257): eval_step is a global SPMD
            # computation over the data-sharded global val batch, so
            # its batch means ARE the cross-host means (XLA collective
            # over ICI/DCN); every host sees identical replicated
            # scalars and the same number of val batches (Loader pads
            # shards to equal length).
            psnrs, ssims = [], []
            for vb in val_loader.epoch(0):
                res = eval_step(state,
                                shard_host_batch(pad_to(vb, val_local_bs),
                                                 mesh))
                psnrs.append(float(res["psnr_novel"]))
                ssims.append(float(res["ssim_novel"]))
            psnr_novel = float(np.mean(psnrs)) if psnrs else 0.0
            logger.log(it, {"psnr_novel": psnr_novel,
                            "ssim_novel": float(np.mean(ssims))
                            if ssims else 0.0}, prefix="val")
            if jax.process_index() == 0:
                ckpt_lib.save_checkpoint(latest, state, best_psnr)
                if psnr_novel > best_psnr:
                    best_psnr = psnr_novel
                    ckpt_lib.save_checkpoint(
                        os.path.join(out_dir, "model_best.ckpt"), state,
                        best_psnr)
        if it % loop_log == 0 and jax.process_index() == 0:
            # rotating-view test videos (reference
            # generate_test_examples, train_network.py:497-556).
            # On a pod the train state lives on the GLOBAL mesh; a
            # process-0-only render on it would deadlock, so fetch the
            # replicated values to host first (every host holds a full
            # copy) and render on local devices — the analog of the
            # reference rendering on rank 0's local DDP replica.
            from unipre3d_tpu.training.video import generate_test_examples
            try:
                vid_state = state
                if n_proc > 1:
                    vid_state = jax.tree_util.tree_map(
                        lambda x: np.asarray(x), state)
                paths = generate_test_examples(
                    model, vid_state, cfg, test_loader, out_dir, it,
                    int(cfg.opt.get("test_generation_num", 1)))
                logger.log_videos(it, paths)
            except Exception as e:
                print(f"[train] video generation failed: {e}")
    logger.close()
    print(f"[train] done at iteration {it}; best PSNR_novel={best_psnr:.3f}")


if __name__ == "__main__":
    main()
