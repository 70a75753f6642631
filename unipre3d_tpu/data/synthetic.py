"""Synthetic object-level dataset with a *learnable* objective.

Procedurally generates colored point-cloud shapes and renders ground-truth
multi-view images with this framework's own differentiable splatter
(isotropic Gaussians at the surface points). Batches use exactly the
reference ShapeNet batch schema (reference dataset/shapenet.py:640-661):
``gt_images [V,3,H,W]``, ``world_view_transforms`` /
``view_to_world_transforms`` / ``full_proj_transforms`` ``[V,4,4]``,
``camera_centers [V,3]``, ``point_cloud [N,3(+1)]``.

Used for CI, smoke training, and throughput benchmarks when no ShapeNet
tree is mounted (``data.dataset_root=synthetic``).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from unipre3d_tpu.utils import camera as cam_util
from unipre3d_tpu.utils.sh import rgb2sh


def _shape_points(rng: np.random.Generator, kind: int, n: int) -> np.ndarray:
    """Sample n surface points of a unit-ish shape, centered."""
    if kind == 0:  # sphere
        v = rng.normal(size=(n, 3))
        pts = v / np.linalg.norm(v, axis=1, keepdims=True) * 0.35
    elif kind == 1:  # torus
        u, t = rng.uniform(0, 2 * np.pi, (2, n))
        R, r = 0.3, 0.12
        pts = np.stack([(R + r * np.cos(t)) * np.cos(u),
                        (R + r * np.cos(t)) * np.sin(u),
                        r * np.sin(t)], axis=1)
    else:  # cube surface
        face = rng.integers(0, 6, n)
        uv = rng.uniform(-0.3, 0.3, (n, 2))
        pts = np.zeros((n, 3))
        ax = face % 3
        sign = np.where(face < 3, 0.3, -0.3)
        for i in range(n):
            others = [a for a in range(3) if a != ax[i]]
            pts[i, ax[i]] = sign[i]
            pts[i, others[0]] = uv[i, 0]
            pts[i, others[1]] = uv[i, 1]
    return pts.astype(np.float32)


def _orbit_camera(azimuth: float, elevation: float, distance: float):
    """c2w rotation/translation for a camera orbiting the origin."""
    ca, sa = math.cos(azimuth), math.sin(azimuth)
    ce, se = math.cos(elevation), math.sin(elevation)
    # camera position
    pos = np.array([distance * ce * sa, distance * se, distance * ce * ca])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    # camera-to-world rotation with +z forward (projection looks down +z)
    R = np.stack([right, -up2, fwd], axis=1)  # columns
    t = -R.T @ pos  # w2c translation
    return R.astype(np.float32), t.astype(np.float32)


class SyntheticDataset:
    """Object-level synthetic dataset (ShapeNet schema)."""

    def __init__(self, cfg, split: str = "train", num_objects: int = 8,
                 num_views: int = 8, points_per_object: int = 1024,
                 render_points: int = 256, seed: int = 0):
        self.cfg = cfg
        self.split = split
        res = int(cfg.data.training_resolution)
        self.res = res
        self.imgs_per_obj = int(cfg.opt.get("imgs_per_obj", 4))
        self.input_images = int(cfg.data.input_images)
        self.num_views = num_views
        fov = math.radians(float(cfg.data.fov))
        znear, zfar = float(cfg.data.znear), float(cfg.data.zfar)
        base_seed = seed + {"train": 0, "val": 10_000, "test": 20_000}[split]
        rng = np.random.default_rng(base_seed)

        from unipre3d_tpu.ops.rasterizer import rasterize

        bg = np.ones(3, np.float32) if cfg.data.white_background \
            else np.zeros(3, np.float32)

        self.examples = []
        render_fn = jax.jit(lambda m, o, s, r, sh, wv, fp, cc: rasterize(
            m, o, s, r, sh, wv, fp, cc, img_h=res, img_w=res,
            tanfovx=math.tan(fov / 2), tanfovy=math.tan(fov / 2),
            bg_color=jnp.asarray(bg), sh_degree=1, capacity=256)["render"])

        for i in range(num_objects):
            pts = _shape_points(rng, i % 3, points_per_object)
            colors = (pts / 0.7 + 0.5).clip(0, 1).astype(np.float32)
            # cameras on an orbit
            cams = []
            for v in range(num_views):
                az = 2 * np.pi * v / num_views + rng.uniform(0, 0.3)
                el = rng.uniform(-0.5, 0.5)
                R, t = _orbit_camera(az, el, 1.5)
                cams.append(cam_util.build_camera_tensors(
                    R, t, fov, fov, znear, zfar))
            # GT renders from a subsample of the points
            sel = rng.choice(points_per_object, render_points, replace=False)
            m = jnp.asarray(pts[sel])
            o = jnp.full((render_points,), 0.9)
            s = jnp.full((render_points, 3), 0.025)
            q = jnp.zeros((render_points, 4)).at[:, 0].set(1.0)
            sh = jnp.zeros((render_points, 4, 3)).at[:, 0].set(
                rgb2sh(jnp.asarray(colors[sel])))
            gt = []
            for c in cams:
                img = render_fn(m, o, s, q, sh,
                                jnp.asarray(c["world_view_transform"]),
                                jnp.asarray(c["full_proj_transform"]),
                                jnp.asarray(c["camera_center"]))
                gt.append(np.asarray(img))
            self.examples.append({
                "point_cloud": pts,
                "colors": colors,
                "gt_images": np.stack(gt),
                "world_view_transforms": np.stack(
                    [c["world_view_transform"] for c in cams]),
                "view_to_world_transforms": np.stack(
                    [c["view_to_world"] for c in cams]),
                "full_proj_transforms": np.stack(
                    [c["full_proj_transform"] for c in cams]),
                "camera_centers": np.stack(
                    [c["camera_center"] for c in cams]),
            })

    def __len__(self):
        # virtual length: keeps epochs non-empty at any batch size
        # (__getitem__ indexes modulo the real example count)
        return max(len(self.examples), 128)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        ex = self.examples[index % len(self.examples)]
        V = self.num_views
        if self.split == "train":
            rng = np.random.default_rng()
            sel = rng.permutation(V)[:self.imgs_per_obj]
            idx = np.concatenate([sel[:self.input_images], sel])
        else:
            idx = np.arange(V)
        pc = ex["point_cloud"]
        if int(self.cfg.model.in_channels) == 4:
            # gravity channel (reference dataset/shapenet.py:414-429)
            grav = pc[:, 1:2] - pc[:, 1].min()
            pc = np.concatenate([pc, grav], axis=1)
        return {
            "gt_images": ex["gt_images"][idx],
            "world_view_transforms": ex["world_view_transforms"][idx],
            "view_to_world_transforms": ex["view_to_world_transforms"][idx],
            "full_proj_transforms": ex["full_proj_transforms"][idx],
            "camera_centers": ex["camera_centers"][idx],
            "point_cloud": pc,
        }
