#!/usr/bin/env python
"""Export a pretraining checkpoint to a PyTorch ``.pth`` for the
downstream fine-tune repos (reference north star: pretrained backbones
are consumed by torch fine-tuning flows via ``opt.pretrained_ckpt``,
model/point_predictor.py:44-53).

    python export_checkpoint.py <experiment_path> [--out backbone.pth]
                                [--ema/--no-ema] [--full]

``--full`` exports the generic flattened state dict for non-transformer
backbones; the default emits name-exact reference naming for the
standard Transformer.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np
import yaml

from unipre3d_tpu.data import Loader, get_dataset
from unipre3d_tpu.export import (export_scene_predictor,
                                 export_state_dict,
                                 export_transformer_predictor,
                                 save_torch_checkpoint)
from unipre3d_tpu.training import checkpoint as ckpt_lib
from unipre3d_tpu.training.config import ConfigNode
from unipre3d_tpu.training.trainer import create_train_state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("experiment_path")
    p.add_argument("--out", default=None)
    p.add_argument("--ckpt", default="model_latest.ckpt")
    p.add_argument("--no-ema", action="store_true",
                   help="export raw params instead of the EMA weights")
    p.add_argument("--full", action="store_true",
                   help="generic flattened export (any backbone)")
    args = p.parse_args()

    cfg_path = os.path.join(args.experiment_path, ".hydra", "config.yaml")
    with open(cfg_path) as f:
        cfg = ConfigNode.from_obj(yaml.safe_load(f))

    loader = Loader(get_dataset(cfg, "val"), batch_size=1, shuffle=False)
    sample = next(iter(loader.epoch(0)))
    model, tx, state = create_train_state(
        cfg, jax.random.PRNGKey(int(cfg.general.random_seed)), sample)
    state, _ = ckpt_lib.load_checkpoint(
        os.path.join(args.experiment_path, args.ckpt), state)
    params = state.params if args.no_ema else state.ema_params
    params = jax.tree_util.tree_map(np.asarray, params)
    stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)

    backbone = cfg.model.backbone_type
    if args.full:
        sd = export_state_dict(params, stats)
    elif backbone == "transformer":
        sd = export_transformer_predictor(params, stats)
    elif backbone in ("sparseunet", "ptv3"):
        sd = export_scene_predictor(params, stats, backbone)
    elif backbone in ("pointmlp", "mamba3d", "pcm"):
        from unipre3d_tpu.export.object_backbones import EXPORTERS
        pn = params["point_network"]
        pn_bs = stats.get("point_network", {})
        sd = EXPORTERS[backbone](pn["encoder"], pn_bs.get("encoder", {}),
                                 prefix="point_network.encoder")
    else:
        sd = export_state_dict(params, stats)
    out = args.out or os.path.join(args.experiment_path,
                                   "model_torch_export.pth")
    save_torch_checkpoint(out, sd, extra={"iteration": int(state.step),
                                          "backbone": cfg.model.backbone_type})
    print(f"[export] wrote {out} ({len(sd)} tensors, "
          f"step {int(state.step)}, ema={not args.no_ema})")


if __name__ == "__main__":
    main()
