"""Rotating-view test videos (reference generate_test_examples +
Logger video path, train_network.py:497-556 / logger.py:161-267).

Renders an orbit of camera poses around a predicted Gaussian cloud and
writes an animated file. Uses mp4 when an ffmpeg backend is importable,
falling back to GIF (imageio/Pillow) — the reference falls back from
wandb to imageio/libx264 the same way.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unipre3d_tpu.ops.rasterizer import render_predicted

CAMERA_DISTANCE = 1.75  # reference dataset/shapenet.py:36


def orbit_pose(roll_deg: float, pitch_deg: float,
               distance_ratio: float = 1.0) -> np.ndarray:
    """c2w 4x4 for the reference orbit parameterization
    (dataset/shapenet.py:671-745; consumed as camera-to-world and
    inverted by readCamerasFromTxt, dataset_readers.py:76-81)."""
    az = math.radians(-roll_deg)
    el = math.radians(pitch_deg - 90)
    R = np.array([
        [math.cos(az), math.cos(el) * math.sin(az),
         math.sin(el) * math.sin(az)],
        [-math.sin(az), math.cos(el) * math.cos(az),
         math.sin(el) * math.cos(az)],
        [0.0, -math.sin(el), math.cos(el)],
    ])
    t = np.array([
        -CAMERA_DISTANCE * math.sin(el) * math.sin(az) * distance_ratio,
        -CAMERA_DISTANCE * math.sin(el) * math.cos(az) * distance_ratio,
        -CAMERA_DISTANCE * math.cos(el) * distance_ratio,
    ])
    tf = np.eye(4)
    tf[:3, :3] = R
    tf[:3, 3] = t
    return tf


def continuous_orbit_poses(num: int = 160) -> List[np.ndarray]:
    """The reference's two-phase orbit: a full spin rising 0->20 deg,
    then 20->90 deg (dataset/shapenet.py:747-764). Returns 2*num c2w."""
    rolls = np.linspace(-180, 180, num)
    p1 = np.linspace(0, 20, num)
    p2 = np.linspace(20, 90, num)
    return [orbit_pose(r, p) for r, p in
            list(zip(rolls, p1)) + list(zip(rolls, p2))]


def orbit_camera_tensors(cfg, num: int = 80) -> Dict[str, np.ndarray]:
    """Camera tensor stacks for an orbit (ShapeNet intrinsics)."""
    from unipre3d_tpu.utils import camera as cam_util
    fov = math.radians(float(cfg.data.fov))
    proj = cam_util.get_projection_matrix(
        float(cfg.data.znear), float(cfg.data.zfar), fov, fov).T
    wv, fp, cc = [], [], []
    for c2w in continuous_orbit_poses(num // 2):
        w2c = np.linalg.inv(c2w)
        R = w2c[:3, :3].T
        t = w2c[:3, 3]
        wvt = cam_util.get_world2view(R, t).T
        wv.append(wvt)
        fp.append((wvt @ proj).astype(np.float32))
        cc.append(np.linalg.inv(wvt.astype(np.float64))[3, :3]
                  .astype(np.float32))
    return {"world_view_transforms": np.stack(wv).astype(np.float32),
            "full_proj_transforms": np.stack(fp),
            "camera_centers": np.stack(cc)}


def render_orbit(gaussians: Dict[str, jnp.ndarray], cfg,
                 num_frames: int = 80,
                 gaussian_mask: Optional[jnp.ndarray] = None) -> np.ndarray:
    """Render an orbit around ONE example's gaussian dict (leading batch
    axis removed) -> frames [F, H, W, 3] uint8."""
    cams = orbit_camera_tensors(cfg, num_frames)
    bg = np.asarray([1.0, 1.0, 1.0] if cfg.data.white_background
                    else [0.0, 0.0, 0.0], dtype=np.float32)

    def one(wv, fp, cc):
        out = render_predicted(gaussians, wv, fp, cc, bg, cfg,
                               gaussian_mask=gaussian_mask)
        return out["render"]

    frames = []
    fn = jax.jit(one)
    for i in range(len(cams["world_view_transforms"])):
        img = fn(jnp.asarray(cams["world_view_transforms"][i]),
                 jnp.asarray(cams["full_proj_transforms"][i]),
                 jnp.asarray(cams["camera_centers"][i]))
        frames.append(np.asarray(img))
    arr = np.stack(frames)  # [F, 3, H, W]
    arr = np.clip(arr.transpose(0, 2, 3, 1), 0, 1)
    return (arr * 255).astype(np.uint8)


def write_video(frames: np.ndarray, path_base: str, fps: int = 20) -> str:
    """Write frames [F, H, W, 3] uint8; mp4 if ffmpeg is available,
    else GIF. Returns the written path."""
    import imageio
    try:
        import imageio_ffmpeg  # noqa: F401
        path = path_base + ".mp4"
        imageio.mimwrite(path, frames, fps=fps, codec="libx264")
        return path
    except Exception:
        path = path_base + ".gif"
        imageio.mimwrite(path, frames, duration=1000 / fps, loop=0)
        return path


def generate_test_examples(model, state, cfg, test_loader, out_dir: str,
                           iteration: int, num_examples: int = 1,
                           use_ema: bool = True,
                           orbit_frames: int = 80) -> List[str]:
    """Reference Trainer.generate_test_examples (train_network.py:497-556):
    render every view of a test example next to its ground truth; object
    level additionally gets a rotating-orbit video."""
    from unipre3d_tpu.training.trainer import model_inputs
    paths = []
    n_in = int(cfg.data.input_images)
    params = state.ema_params if use_ema else state.params
    variables = {"params": params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    apply = jax.jit(lambda *a: model.apply(variables, *a, train=False))
    bg = np.asarray([1.0, 1.0, 1.0] if cfg.data.white_background
                    else [0.0, 0.0, 0.0], dtype=np.float32)
    for i, batch in enumerate(test_loader.epoch(0)):
        if i >= num_examples:
            break
        gaussians = apply(*model_inputs(batch, n_in, cfg.opt.level))
        one = {k: v[0] for k, v in gaussians.items()}
        mask = one.pop("mask", None)

        # render | GT side-by-side over the example's own views
        render_one = jax.jit(lambda wv, fp, cc: render_predicted(
            one, wv, fp, cc, bg, cfg, gaussian_mask=mask)["render"])
        frames = []
        V = batch["gt_images"].shape[1]
        for r in range(V):
            img = np.asarray(render_one(
                jnp.asarray(batch["world_view_transforms"][0, r]),
                jnp.asarray(batch["full_proj_transforms"][0, r]),
                jnp.asarray(batch["camera_centers"][0, r])))
            gt = np.asarray(batch["gt_images"][0, r])
            pair = np.concatenate([np.clip(img, 0, 1),
                                   np.clip(gt, 0, 1)], axis=2)
            frames.append((pair.transpose(1, 2, 0) * 255).astype(np.uint8))
        base = os.path.join(out_dir, f"test_views_{iteration}_{i}")
        paths.append(write_video(np.stack(frames), base, fps=4))

        if cfg.opt.level == "object":
            orbit = render_orbit(one, cfg, num_frames=orbit_frames,
                                 gaussian_mask=mask)
            base = os.path.join(out_dir, f"test_orbit_{iteration}_{i}")
            paths.append(write_video(orbit, base))
    return paths
