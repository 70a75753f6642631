#!/usr/bin/env python
"""End-to-end convergence + resume-equivalence smoke (VERDICT r02 #9).

Per-kernel tests cannot show that pretraining *learns*; this drives the
real CLI (train_network.py) on the synthetic datasets and records the
PSNR_novel trajectory, mirroring the reference's checkpoint-selection
signal (reference train_network.py:491-495):

1. object: 2k iterations of transformer_pretraining (synthetic ShapeNet
   schema), val every 200 -> requires a rising PSNR_novel curve;
2. scene: 2k iterations of sparseunet_pretraining (synthetic ScanNet
   schema, reduced 8k/2-view so the smoke fits a TPU budget), val every
   400 -> same check;
3. resume equivalence: run A trains straight to 1.2k; run B trains to
   1k, restarts from its checkpoint, continues to 1.2k. The deterministic
   loader (Loader.iter_from) replays the same batches, so every val
   metric at 1.2k must match bitwise.
4. (--compare-cache) cached-vs-live VAE features: identical runs except
   tpu.vae_cache_entries; the PSNR_novel trajectories must agree within
   1 dB at every val step (the cache differs only by bf16 feature
   quantization, training/feature_cache.py).

Artifacts (curves + summary.json) land in experiments_out/convergence/.

Usage:  python tools/convergence_smoke.py [--iters 2000] [--object-only]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OBJECT_OVERRIDES = [
    "data.dataset_root=synthetic",
    "logging.loss_log=100", "logging.val_log=200",
    "logging.loop_log=1000000",    # no videos in the smoke
    "opt.ema.update_after_step=1",
]
SCENE_OVERRIDES = [
    "data.pts_dataset_root=synthetic",
    "data.input_images=2", "data.max_points=8192",
    "opt.batch_size=1",
    "logging.loss_log=100", "logging.val_log=400",
    "logging.loop_log=1000000",
    "opt.ema.update_after_step=1",
]


def run_cli(config: str, out_dir: str, iters: int, extra=()):
    cmd = [sys.executable, os.path.join(REPO, "train_network.py"),
           "--config-name", config, "--output-dir", out_dir,
           f"opt.iterations={iters}"] + \
        (OBJECT_OVERRIDES if "transformer" in config else SCENE_OVERRIDES) \
        + list(extra)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=7200)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:])
        raise RuntimeError(f"{config} run failed rc={r.returncode}")
    return time.time() - t0


def read_curve(out_dir: str, key: str = "val/psnr_novel"):
    curve = []
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                curve.append((rec["step"], rec[key]))
    # resumes append; keep the LAST record per step
    return sorted({s: v for s, v in curve}.items())


def val_records_at(out_dir: str, step: int):
    out = {}
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("step") == step:
                for k, v in rec.items():
                    if k.startswith("val/"):
                        out[k] = v
    return out


def check_rising(curve, name):
    assert len(curve) >= 3, f"{name}: too few val points: {curve}"
    first, last = curve[0][1], curve[-1][1]
    best = max(v for _, v in curve)
    print(f"[smoke] {name}: PSNR_novel {first:.3f} -> {last:.3f} "
          f"(best {best:.3f})")
    assert last > first + 0.5, \
        f"{name}: PSNR_novel did not improve: {curve}"
    return {"first": first, "last": last, "best": best,
            "curve": [[int(s), float(v)] for s, v in curve]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--object-only", action="store_true")
    ap.add_argument("--skip-resume", action="store_true")
    ap.add_argument("--compare-cache", action="store_true",
                    help="also run live-vs-cached VAE-feature "
                         "equivalence (round-4 VERDICT #9)")
    ap.add_argument("--cache-only", action="store_true",
                    help="skip the convergence curves (implies "
                         "--compare-cache --skip-resume)")
    args = ap.parse_args()
    if args.cache_only:
        args.compare_cache = True
        args.skip_resume = True
        args.object_only = True

    base = os.path.join(REPO, "experiments_out", "convergence")
    os.makedirs(base, exist_ok=True)
    summary = {"iters": args.iters, "ts": time.strftime("%F %T")}

    if not args.cache_only:
        d_obj = os.path.join(base, "object")
        dt = run_cli("transformer_pretraining", d_obj, args.iters)
        summary["object"] = check_rising(read_curve(d_obj), "object")
        summary["object"]["wall_s"] = round(dt, 1)

    if not args.object_only:
        d_sc = os.path.join(base, "scene")
        dt = run_cli("sparseunet_pretraining", d_sc, args.iters)
        summary["scene"] = check_rising(read_curve(d_sc), "scene")
        summary["scene"]["wall_s"] = round(dt, 1)

    if args.compare_cache:
        # cached-vs-live VAE-feature equivalence (round-4 VERDICT #9):
        # same seed + deterministic loader => the two runs differ only
        # by the cache's bf16 feature quantization, so the PSNR_novel
        # trajectories must track within tolerance at every val step.
        n = args.iters
        vl = 200 if n > 400 else 100
        d_live = os.path.join(base, "object_live")
        d_cach = os.path.join(base, "object_cached")
        run_cli("transformer_pretraining", d_live, n,
                extra=["tpu.vae_cache_entries=0",
                       f"logging.val_log={vl}"])
        run_cli("transformer_pretraining", d_cach, n,
                extra=["tpu.vae_cache_entries=512",
                       f"logging.val_log={vl}"])
        cl = dict(read_curve(d_live))
        cc = dict(read_curve(d_cach))
        steps = sorted(set(cl) & set(cc))
        assert steps, "no overlapping val steps"
        deltas = {s: abs(cl[s] - cc[s]) for s in steps}
        worst = max(deltas.values())
        print(f"[smoke] cached-vs-live PSNR_novel deltas: "
              f"{ {s: round(d, 3) for s, d in deltas.items()} } "
              f"(worst {worst:.3f} dB)")
        assert worst < 1.0, \
            f"cached-path trajectory diverged from live: {deltas}"
        summary["cache_equivalence"] = {
            "steps": steps, "worst_delta_db": round(float(worst), 4),
            "live": [[s, cl[s]] for s in steps],
            "cached": [[s, cc[s]] for s in steps]}

    if not args.skip_resume:
        # A: straight to 1200. B: to 1000, then resume (model_latest.ckpt
        # in the same output dir) to 1200.
        d_a = os.path.join(base, "resume_a")
        d_b = os.path.join(base, "resume_b")
        run_cli("transformer_pretraining", d_a, 1200)
        run_cli("transformer_pretraining", d_b, 1000)
        run_cli("transformer_pretraining", d_b, 1200)
        va = val_records_at(d_a, 1200)
        vb = val_records_at(d_b, 1200)
        print(f"[smoke] resume A@1200={va}  B(1k+resume)@1200={vb}")
        assert va and va == vb, \
            f"resume not bit-exact: A={va} B={vb}"
        summary["resume_equivalence"] = {"step": 1200, "metrics": va,
                                         "bitwise_equal": True}

    with open(os.path.join(base, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("[smoke] PASS:", json.dumps(summary)[:400])


if __name__ == "__main__":
    main()
