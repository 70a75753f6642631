#!/usr/bin/env python
"""Standalone evaluation entry point (reference eval.py:181-228 parity,
with its ``out_folder`` crash fixed).

    python eval.py <experiment_path> [--split test]

reloads the run's composed config from ``<experiment_path>/.hydra/
config.yaml``, rebuilds the model, loads ``model_latest.ckpt``, and
evaluates PSNR/SSIM split into conditioning vs novel views, writing
``test_scores.json``.
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


def evaluate_dataset(model, eval_step, state, loader, cfg):
    n_in = int(cfg.data.input_images)
    scores = {"PSNR_cond": [], "PSNR_novel": [], "SSIM_cond": [],
              "SSIM_novel": []}
    for batch in loader.epoch(0):
        jb = jax.tree_util.tree_map(jnp.asarray, batch)
        res = eval_step(state, jb)
        rendered = res["rendered"]
        gt = jb["gt_images"]
        scores["PSNR_cond"].append(float(res["psnr_cond"]))
        scores["PSNR_novel"].append(float(res["psnr_novel"]))
        B, V = gt.shape[:2]
        ssim_all = loss_lib.ssim(
            rendered.reshape(B * V, *gt.shape[2:]),
            gt.reshape(B * V, *gt.shape[2:]), size_average=False)
        ssim_all = np.asarray(ssim_all).reshape(B, V)
        scores["SSIM_cond"].append(float(ssim_all[:, :n_in].mean()))
        scores["SSIM_novel"].append(float(ssim_all[:, n_in:].mean()))
    return {k: float(np.mean(v)) if v else 0.0 for k, v in scores.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("experiment_path")
    p.add_argument("--split", default="test")
    args = p.parse_args()

    cfg_path = os.path.join(args.experiment_path, ".hydra", "config.yaml")
    with open(cfg_path) as f:
        cfg = ConfigNode.from_obj(yaml.safe_load(f))

    ds = get_dataset(cfg, args.split)
    loader = Loader(ds, batch_size=1, shuffle=False)
    sample = next(iter(loader.epoch(0)))
    rng = jax.random.PRNGKey(int(cfg.general.random_seed))
    model, tx, state = create_train_state(cfg, rng, sample)
    ckpt = os.path.join(args.experiment_path, "model_latest.ckpt")
    state, _ = ckpt_lib.load_checkpoint(ckpt, state)
    print(f"[eval] loaded {ckpt} at step {int(state.step)}")

    eval_step = jax.jit(make_eval_step(cfg, model))
    scores = evaluate_dataset(model, eval_step, state, loader, cfg)
    print(json.dumps(scores, indent=2))
    out = os.path.join(args.experiment_path, "test_scores.json")
    with open(out, "w") as f:
        json.dump(scores, f, indent=2)
    print(f"[eval] wrote {out}")


if __name__ == "__main__":
    main()
