"""Training logger: console always, wandb when importable+configured
(reference logger.py:11-273 with its offline fallback). Rank-0 gating is
process-index 0 under multi-host jax."""

from __future__ import annotations

import json
import math
import os
import time
from typing import Dict, Optional

import jax


class Logger:
    def __init__(self, cfg, out_dir: str):
        self.cfg = cfg
        self.out_dir = out_dir
        self.is_main = jax.process_index() == 0
        self.wandb = None
        self._t0 = time.time()
        if self.is_main:
            os.makedirs(out_dir, exist_ok=True)
            self.jsonl = open(os.path.join(out_dir, "metrics.jsonl"), "a")
            entity = cfg.get("wandb", {}).get("entity")
            if entity:
                try:
                    import wandb
                    # resume the previous run of this output dir if one
                    # exists (reference logger.py:56-69 scans
                    # wandb/latest-run for the run id)
                    run_id = self._find_previous_run_id(out_dir)
                    wandb.init(project=cfg.wandb.project, entity=entity,
                               config=cfg.to_plain(), dir=out_dir,
                               id=run_id,
                               resume="must" if run_id else None)
                    self.wandb = wandb
                except Exception as e:  # offline fallback
                    print(f"[logger] wandb unavailable ({e}); console only")

    @staticmethod
    def _find_previous_run_id(out_dir: str) -> Optional[str]:
        latest = os.path.join(out_dir, "wandb", "latest-run")
        try:
            target = os.path.basename(os.path.realpath(latest))
            # run dirs are named run-<timestamp>-<id>
            if target.startswith("run-"):
                return target.split("-")[-1]
        except OSError:
            pass
        return None

    def log(self, step: int, metrics: Dict, prefix: str = "train"):
        if not self.is_main:
            return
        flat = {f"{prefix}/{k}": (float(v) if hasattr(v, "__float__") else v)
                for k, v in metrics.items()}
        # log10-scaled loss scalars alongside raw values (reference
        # logger.py:113-159 logs log10(loss + 1e-8) for every loss term)
        for k, v in list(flat.items()):
            base = k.split("/")[-1]
            if isinstance(v, float) and (base == "loss" or
                                         base.endswith("_loss") or
                                         base == "lpips"):
                flat[f"{k}_log10"] = math.log10(max(v, 0.0) + 1e-8)
        flat["step"] = int(step)
        flat["wall_s"] = round(time.time() - self._t0, 1)
        self.jsonl.write(json.dumps(flat) + "\n")
        self.jsonl.flush()
        msg = " ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                       for k, v in flat.items())
        print(f"[{prefix}] {msg}", flush=True)
        if self.wandb:
            self.wandb.log(flat, step=int(step))

    def log_videos(self, step: int, paths, fps: int = 14):
        """Upload rendered test videos to wandb when online (reference
        logger.py:161-267 wandb.Video path); local mp4 paths are always
        logged to the jsonl either way."""
        if not self.is_main:
            return
        self.log(step, {"videos": ";".join(paths)}, prefix="video")
        if self.wandb:
            try:
                self.wandb.log(
                    {f"test_video_{i}": self.wandb.Video(p, fps=fps,
                                                         format="mp4")
                     for i, p in enumerate(paths)}, step=int(step))
            except Exception as e:
                print(f"[logger] wandb video upload failed: {e}")

    def close(self):
        if self.is_main:
            self.jsonl.close()
            if self.wandb:
                self.wandb.finish()
