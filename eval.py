#!/usr/bin/env python
"""Standalone evaluation entry point (reference eval.py:20-228 parity,
with its ``out_folder`` crash fixed).

    python eval.py <experiment_path> [--split test] [--save-vis N]

reloads the run's composed config from ``<experiment_path>/.hydra/
config.yaml``, rebuilds the model, loads ``model_latest.ckpt``, and
evaluates PSNR/SSIM (+LPIPS when ``opt.lpips_weights`` points at
converted weights) split into conditioning vs novel views. Writes
per-example lines to ``scores.txt`` and the aggregate to
``test_scores.json``; ``--save-vis N`` saves rendered/GT image pairs
for the first N examples (reference save_vis).

All-black ground-truth views are excluded from the metrics
(reference eval.py:122).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from unipre3d_tpu.data import get_dataset, Loader
from unipre3d_tpu.training import checkpoint as ckpt_lib
from unipre3d_tpu.training.config import ConfigNode
from unipre3d_tpu.training.trainer import create_train_state, make_eval_step
from unipre3d_tpu.utils import losses as loss_lib


class Metricator:
    """PSNR/SSIM(+LPIPS) for ALL views of one example in a single jitted
    call (reference eval.py:20-33 computes these per view; a per-view
    host loop costs one ~30-50 ms tunnel round-trip per metric per view
    — ~30 s of pure RTT on a 400-view orbit — so the TPU build batches
    the whole [V,3,H,W] stack and fetches three [V] vectors once)."""

    #: views per jitted call; larger V is padded+masked into chunks so
    #: the 400-view orbit reuses one compiled executable (VGG/LPIPS on
    #: 400 images at once would also be HBM-heavy)
    CHUNK = 100

    def __init__(self, lpips_params=None):
        self.lpips_params = lpips_params
        use_lpips = lpips_params is not None

        def per_view(r, g):   # [V,3,H,W] -> dict of [V]
            mse = jnp.mean((r - g) ** 2, axis=(1, 2, 3))
            out = {
                "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12)),
                "ssim": loss_lib.ssim(r, g, size_average=False),
                # reference eval.py:122 skips all-black GT views
                "black": jnp.all(g == 0, axis=(1, 2, 3)),
            }
            if use_lpips:
                from unipre3d_tpu.utils.lpips import lpips_fn
                out["lpips"] = lpips_fn(lpips_params,
                                        r * 2 - 1, g * 2 - 1)
            return out

        self._per_view = jax.jit(per_view)

    def compute_metrics_batched(self, rendered, gt):
        """rendered/gt: [V,3,H,W] device (or host) arrays -> dict of
        numpy [V] vectors: psnr, ssim, black(+lpips). One jitted call
        and one host fetch per ≤CHUNK views."""
        V = rendered.shape[0]
        chunks = []
        for s in range(0, V, self.CHUNK):
            r, g = rendered[s:s + self.CHUNK], gt[s:s + self.CHUNK]
            pad = 0
            if V > self.CHUNK and r.shape[0] < self.CHUNK:
                pad = self.CHUNK - r.shape[0]
                padw = [(0, pad)] + [(0, 0)] * (r.ndim - 1)
                r, g = jnp.pad(r, padw), jnp.pad(g, padw)
            out = self._per_view(r, g)
            out = {k: np.asarray(v) for k, v in out.items()}
            if pad:
                out = {k: v[:-pad] for k, v in out.items()}
            chunks.append(out)
        return {k: np.concatenate([c[k] for c in chunks])
                for k in chunks[0]}


def _global_mean(vals):
    """Mean of per-example metric values across ALL processes.

    On a multi-process launch each process evaluates its own (possibly
    uneven, unpadded) example shard; the weighted
    ``parallel.all_reduce_mean`` combines the per-host means exactly
    (reference ``dist.all_reduce(psnr)/world_size``,
    train_network.py:253-257, which assumes equal shards — the weighted
    form doesn't)."""
    m = float(np.mean(vals)) if vals else 0.0
    if jax.process_count() == 1:
        return m if vals else None
    from unipre3d_tpu.parallel import all_reduce_mean
    gm = all_reduce_mean(m, weight=float(len(vals)))
    any_vals = all_reduce_mean(1.0 if vals else 0.0)
    return gm if any_vals > 0 else None


def evaluate_dataset(model, eval_step, state, loader, cfg, out_folder,
                     save_vis: int = 0, lpips_params=None):
    n_in = int(cfg.data.input_images)
    metricator = Metricator(lpips_params)
    agg = {k: [] for k in ("PSNR_cond", "SSIM_cond", "LPIPS_cond",
                           "PSNR_novel", "SSIM_novel", "LPIPS_novel")}
    pid = jax.process_index()
    scores_path = os.path.join(
        out_folder, "scores.txt" if pid == 0 else f"scores_rank{pid}.txt")
    open(scores_path, "w").close()

    for d_idx, batch in enumerate(loader.epoch(0)):
        jb = jax.tree_util.tree_map(jnp.asarray, batch)
        res = eval_step(state, jb)
        # metrics stay on device: one batched call + [V]-vector fetches
        m = metricator.compute_metrics_batched(res["rendered"][0],
                                               jb["gt_images"][0])
        per = {k: [] for k in ("pc", "sc", "lc", "pn", "sn", "ln")}
        if d_idx < save_vis:
            rendered = np.asarray(res["rendered"][0])  # [V, 3, H, W]
            gt = np.asarray(jb["gt_images"][0])
            ex_dir = os.path.join(out_folder, f"vis_{d_idx:04d}")
            os.makedirs(ex_dir, exist_ok=True)
            from PIL import Image
            for r in range(rendered.shape[0]):
                for tag, img in (("render", rendered[r]), ("gt", gt[r])):
                    arr = (np.clip(img, 0, 1).transpose(1, 2, 0)
                           * 255).astype(np.uint8)
                    Image.fromarray(arr).save(
                        os.path.join(ex_dir, f"{r:05d}_{tag}.png"))
        for r in range(m["psnr"].shape[0]):
            if m["black"][r]:   # reference: skip all-black GT
                continue
            lp = float(m["lpips"][r]) if "lpips" in m else None
            if r < n_in:
                per["pc"].append(float(m["psnr"][r]))
                per["sc"].append(float(m["ssim"][r]))
                per["lc"].append(lp)
            else:
                per["pn"].append(float(m["psnr"][r]))
                per["sn"].append(float(m["ssim"][r]))
                per["ln"].append(lp)

        def mean(v):
            v = [x for x in v if x is not None]
            return float(np.mean(v)) if v else None

        for key, src in (("PSNR_cond", "pc"), ("SSIM_cond", "sc"),
                         ("LPIPS_cond", "lc"), ("PSNR_novel", "pn"),
                         ("SSIM_novel", "sn"), ("LPIPS_novel", "ln")):
            m = mean(per[src])
            if m is not None:
                agg[key].append(m)
        with open(scores_path, "a") as f:
            f.write(f"{d_idx}_example {mean(per['pn'])} {mean(per['sn'])} "
                    f"{mean(per['ln'])}\n")

    return {k: _global_mean(v) for k, v in agg.items()}


def main():
    # form the multi-process runtime (no-op single host) BEFORE any
    # device query; each process then evaluates its own example shard
    from unipre3d_tpu.parallel import maybe_initialize
    maybe_initialize()

    p = argparse.ArgumentParser()
    p.add_argument("experiment_path")
    p.add_argument("--split", default="test")
    p.add_argument("--save-vis", type=int, default=0)
    p.add_argument("--ckpt", default="model_latest.ckpt")
    args = p.parse_args()

    cfg_path = os.path.join(args.experiment_path, ".hydra", "config.yaml")
    with open(cfg_path) as f:
        cfg = ConfigNode.from_obj(yaml.safe_load(f))

    ds = get_dataset(cfg, args.split)
    # unpadded shards: no example is scored twice; the aggregate uses
    # the weighted all_reduce_mean (see _global_mean)
    loader = Loader(ds, batch_size=1, shuffle=False,
                    shard_id=jax.process_index(),
                    num_shards=jax.process_count(),
                    pad_shards=False, drop_last=False)
    sample = next(iter(loader.epoch(0)))
    rng = jax.random.PRNGKey(int(cfg.general.random_seed))
    model, tx, state = create_train_state(cfg, rng, sample)
    ckpt = os.path.join(args.experiment_path, args.ckpt)
    state, _ = ckpt_lib.load_checkpoint(ckpt, state)
    print(f"[eval] loaded {ckpt} at step {int(state.step)}")

    lpips_params = None
    lpips_path = str(cfg.opt.get("lpips_weights", "") or "")
    if lpips_path and os.path.exists(lpips_path):
        from unipre3d_tpu.utils.lpips import load_lpips_params
        lpips_params = jax.device_put(load_lpips_params(lpips_path))
        print(f"[eval] LPIPS weights loaded from {lpips_path}")

    eval_step = jax.jit(make_eval_step(cfg, model))
    scores = evaluate_dataset(model, eval_step, state, loader, cfg,
                              args.experiment_path, args.save_vis,
                              lpips_params)
    print(json.dumps(scores, indent=2))
    if jax.process_index() == 0:
        out = os.path.join(args.experiment_path, "test_scores.json")
        with open(out, "w") as f:
            json.dump(scores, f, indent=2)
        print(f"[eval] wrote {out}")


if __name__ == "__main__":
    main()
