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
    """PSNR/SSIM(+LPIPS) per view (reference eval.py:20-33)."""

    def __init__(self, lpips_params=None):
        self.lpips_params = lpips_params
        if lpips_params is not None:
            from unipre3d_tpu.utils.lpips import lpips_fn
            self._lpips = jax.jit(lambda p, a, b: lpips_fn(
                p, a[None] * 2 - 1, b[None] * 2 - 1)[0])
        self._ssim = jax.jit(lambda a, b: loss_lib.ssim(a[None], b[None]))

    def compute_metrics(self, image, target):
        mse = float(jnp.mean((image - target) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        ssim = float(self._ssim(image, target))
        lp = (float(self._lpips(self.lpips_params, image, target))
              if self.lpips_params is not None else None)
        return psnr, ssim, lp


def evaluate_dataset(model, eval_step, state, loader, cfg, out_folder,
                     save_vis: int = 0, lpips_params=None):
    n_in = int(cfg.data.input_images)
    metricator = Metricator(lpips_params)
    agg = {k: [] for k in ("PSNR_cond", "SSIM_cond", "LPIPS_cond",
                           "PSNR_novel", "SSIM_novel", "LPIPS_novel")}
    scores_path = os.path.join(out_folder, "scores.txt")
    open(scores_path, "w").close()

    for d_idx, batch in enumerate(loader.epoch(0)):
        jb = jax.tree_util.tree_map(jnp.asarray, batch)
        res = eval_step(state, jb)
        rendered = np.asarray(res["rendered"][0])      # [V, 3, H, W]
        gt = np.asarray(jb["gt_images"][0])
        per = {k: [] for k in ("pc", "sc", "lc", "pn", "sn", "ln")}
        if d_idx < save_vis:
            ex_dir = os.path.join(out_folder, f"vis_{d_idx:04d}")
            os.makedirs(ex_dir, exist_ok=True)
            from PIL import Image
            for r in range(rendered.shape[0]):
                for tag, img in (("render", rendered[r]), ("gt", gt[r])):
                    arr = (np.clip(img, 0, 1).transpose(1, 2, 0)
                           * 255).astype(np.uint8)
                    Image.fromarray(arr).save(
                        os.path.join(ex_dir, f"{r:05d}_{tag}.png"))
        for r in range(rendered.shape[0]):
            if np.all(gt[r] == 0):   # reference: skip all-black GT
                continue
            psnr, ssim, lp = metricator.compute_metrics(
                jnp.asarray(rendered[r]), jnp.asarray(gt[r]))
            if r < n_in:
                per["pc"].append(psnr)
                per["sc"].append(ssim)
                per["lc"].append(lp)
            else:
                per["pn"].append(psnr)
                per["sn"].append(ssim)
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

    return {k: (float(np.mean(v)) if v else None) for k, v in agg.items()}


def main():
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
    loader = Loader(ds, batch_size=1, shuffle=False)
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
    out = os.path.join(args.experiment_path, "test_scores.json")
    with open(out, "w") as f:
        json.dump(scores, f, indent=2)
    print(f"[eval] wrote {out}")


if __name__ == "__main__":
    main()
