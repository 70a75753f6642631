"""Synthetic scene-level dataset (ScanNet schema) with learnable GT.

Procedurally builds a colored "room" point cloud (floor + walls +
boxes), voxel-dedups it at ``grid_size`` like the reference GridSample
transform (reference pointcept/datasets/
transform_with_extrinsic.py:1179-1327), renders ground-truth views with
this framework's splatter, and synthesizes per-pixel depth-unprojection
maps by z-buffering the scene points into each conditioning view
(standing in for the reference's sensor depth unprojection,
dataset/scannet.py:639-671).

Example schema mirrors the reference scene batch after
``prepare_model_inputs`` (utils/general_utils.py:251-358), but padded to
a fixed point capacity:

* ``point_cloud``: dict with ``coord`` [M,3] world, ``grid_coord``
  [M,3], ``feat`` [M,6] (normalized color ‖ normal), ``mask`` [M],
  ``min_coord`` [3]
* ``gt_images`` [V,3,H,W] — first ``input_images`` are conditioning
* camera tensors per view; ``unprojected_coords``
  [input_images, H, W, 4] (xyz + validity)
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from unipre3d_tpu.utils import camera as cam_util
from unipre3d_tpu.utils.sh import rgb2sh

GRID_SIZE = 0.02


def _room_points(rng: np.random.Generator, n: int, half: float = 0.6):
    """Floor + two walls + colored boxes; returns (coord, color, normal)."""
    n_floor = n // 3
    n_wall = n // 4
    n_box = n - n_floor - 2 * n_wall
    pts, nrm, col = [], [], []
    # floor at y = -half
    xy = rng.uniform(-half, half, (n_floor, 2))
    pts.append(np.stack([xy[:, 0], np.full(n_floor, -half), xy[:, 1]], 1))
    nrm.append(np.tile([0, 1, 0], (n_floor, 1)))
    col.append(np.tile(rng.uniform(0.3, 0.9, 3), (n_floor, 1)))
    # walls at z = -half and x = -half
    xy = rng.uniform(-half, half, (n_wall, 2))
    pts.append(np.stack([xy[:, 0], xy[:, 1], np.full(n_wall, -half)], 1))
    nrm.append(np.tile([0, 0, 1], (n_wall, 1)))
    col.append(np.tile(rng.uniform(0.3, 0.9, 3), (n_wall, 1)))
    xy = rng.uniform(-half, half, (n_wall, 2))
    pts.append(np.stack([np.full(n_wall, -half), xy[:, 0], xy[:, 1]], 1))
    nrm.append(np.tile([1, 0, 0], (n_wall, 1)))
    col.append(np.tile(rng.uniform(0.3, 0.9, 3), (n_wall, 1)))
    # boxes on the floor
    for _ in range(3):
        c = rng.uniform(-half * 0.6, half * 0.6, 2)
        s = rng.uniform(0.05, 0.15)
        k = n_box // 3
        face = rng.integers(0, 5, k)  # no bottom face
        uv = rng.uniform(-s, s, (k, 2))
        p = np.zeros((k, 3))
        nv = np.zeros((k, 3))
        for i in range(k):
            if face[i] == 0:  # top
                p[i] = [c[0] + uv[i, 0], -half + 2 * s, c[1] + uv[i, 1]]
                nv[i] = [0, 1, 0]
            else:
                ax = (face[i] - 1) % 2
                sgn = 1 if face[i] < 3 else -1
                if ax == 0:
                    p[i] = [c[0] + sgn * s, -half + s + uv[i, 0],
                            c[1] + uv[i, 1]]
                    nv[i] = [sgn, 0, 0]
                else:
                    p[i] = [c[0] + uv[i, 0], -half + s + uv[i, 1],
                            c[1] + sgn * s]
                    nv[i] = [0, 0, sgn]
        pts.append(p)
        nrm.append(nv)
        col.append(np.tile(rng.uniform(0.2, 1.0, 3), (k, 1)))
    coord = np.concatenate(pts).astype(np.float32)
    normal = np.concatenate(nrm).astype(np.float32)
    color = np.concatenate(col).astype(np.float32)
    return coord, color, normal


def grid_sample_dedup(coord, arrays, grid_size=GRID_SIZE):
    """Keep the first point per occupied voxel (reference GridSample
    train mode). Returns (kept indices, grid_coord, min_coord)."""
    min_coord = coord.min(axis=0)
    grid = np.floor((coord - min_coord) / grid_size).astype(np.int32)
    key = (grid[:, 0].astype(np.int64) << 40) | \
          (grid[:, 1].astype(np.int64) << 20) | grid[:, 2].astype(np.int64)
    _, keep = np.unique(key, return_index=True)
    keep.sort()
    return keep, grid[keep], min_coord


def _look_at(pos: np.ndarray, target: np.ndarray):
    """c2w rotation + w2c translation for a camera at pos looking at
    target (projection looks down +z)."""
    fwd = target - pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right = right / np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    R = np.stack([right, -up2, fwd], axis=1)
    t = -R.T @ pos
    return R.astype(np.float32), t.astype(np.float32)


def unproject_zbuffer(coord: np.ndarray, world_view: np.ndarray,
                      full_proj: np.ndarray, H: int, W: int) -> np.ndarray:
    """Per-pixel world coordinate of the nearest scene point (synthetic
    stand-in for sensor-depth unprojection) -> [H, W, 4] (xyz, valid)."""
    n = coord.shape[0]
    hom = np.concatenate([coord, np.ones((n, 1), np.float32)], axis=1)
    p_view = hom @ world_view
    p_clip = hom @ full_proj
    ndc = p_clip[:, :3] / (p_clip[:, 3:4] + 1e-8)
    px = ((ndc[:, 0] + 1) * W - 1) / 2
    py = ((ndc[:, 1] + 1) * H - 1) / 2
    z = p_view[:, 2]
    xi = np.round(px).astype(np.int64)
    yi = np.round(py).astype(np.int64)
    ok = (z > 0.05) & (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    out = np.zeros((H, W, 4), np.float32)
    zbuf = np.full((H, W), np.inf, np.float32)
    idx = np.where(ok)[0]
    order = idx[np.argsort(-z[idx])]  # far to near; near written last
    zbuf[yi[order], xi[order]] = z[order]
    out[yi[order], xi[order], :3] = coord[order]
    out[yi[order], xi[order], 3] = 1.0
    return out


class SyntheticSceneDataset:
    """Scene-level synthetic dataset (ScanNet schema)."""

    def __init__(self, cfg, split: str = "train", num_scenes: int = 4,
                 num_points: int = 4096, capacity: int = None, seed: int = 0):
        self.cfg = cfg
        self.split = split
        H = int(cfg.data.training_height)
        W = int(cfg.data.training_width)
        self.hw = (H, W)
        self.input_images = int(cfg.data.input_images)
        n_views = 2 * self.input_images
        fovx = math.radians(float(cfg.data.fov))
        fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
        znear, zfar = float(cfg.data.znear), float(cfg.data.zfar)
        capacity = capacity or int(cfg.data.get("max_points", num_points))
        base_seed = seed + {"train": 0, "val": 10_000, "test": 20_000}[split]
        rng = np.random.default_rng(base_seed)

        from unipre3d_tpu.ops.rasterizer import rasterize
        bg = np.ones(3, np.float32) if cfg.data.white_background \
            else np.zeros(3, np.float32)
        from unipre3d_tpu.ops.rasterizer.render import auto_tile
        th, tw = auto_tile(H, W)
        render_fn = jax.jit(lambda m, o, s, r, sh, wv, fp, cc: rasterize(
            m, o, s, r, sh, wv, fp, cc, img_h=H, img_w=W,
            tanfovx=math.tan(fovx / 2), tanfovy=math.tan(fovy / 2),
            bg_color=jnp.asarray(bg), sh_degree=1, tile_h=th, tile_w=tw,
            capacity=min(512, num_points))["render"])

        self.examples = []
        for _ in range(num_scenes):
            coord, color, normal = _room_points(rng, num_points)
            keep, grid_coord, min_coord = grid_sample_dedup(coord, None)
            coord_k = coord[keep]
            color_k = color[keep]
            normal_k = normal[keep]
            M = len(keep)
            if M > capacity:
                sel = rng.choice(M, capacity, replace=False)
                sel.sort()
                coord_k, color_k = coord_k[sel], color_k[sel]
                normal_k, grid_coord = normal_k[sel], grid_coord[sel]
                M = capacity

            pad = capacity - M
            pad3 = lambda a: np.concatenate(
                [a, np.zeros((pad, a.shape[1]), a.dtype)])
            mask = np.concatenate([np.ones(M, bool), np.zeros(pad, bool)])
            # feat order (normal, color) matches the reference Collect
            # feat_keys (dataset/scannet.py:118)
            feat = np.concatenate([normal_k, color_k * 2.0 - 1.0], axis=1)

            cams = []
            for v in range(n_views):
                az = 2 * np.pi * v / n_views + rng.uniform(0, 0.2)
                pos = np.array([0.9 * math.cos(az),
                                rng.uniform(0.1, 0.4),
                                0.9 * math.sin(az)])
                R, t = _look_at(pos, np.array([0.0, -0.3, 0.0]))
                cams.append(cam_util.build_camera_tensors(
                    R, t, fovx, fovy, znear, zfar))

            o = jnp.full((M,), 0.95)
            s = jnp.full((M, 3), 1.5 * GRID_SIZE)
            q = jnp.zeros((M, 4)).at[:, 0].set(1.0)
            sh = jnp.zeros((M, 4, 3)).at[:, 0].set(
                rgb2sh(jnp.asarray(color_k)))
            gt, unproj = [], []
            for vi, c in enumerate(cams):
                img = render_fn(jnp.asarray(coord_k), o, s, q, sh,
                                jnp.asarray(c["world_view_transform"]),
                                jnp.asarray(c["full_proj_transform"]),
                                jnp.asarray(c["camera_center"]))
                gt.append(np.asarray(img))
                if vi < self.input_images:
                    unproj.append(unproject_zbuffer(
                        coord_k, c["world_view_transform"],
                        c["full_proj_transform"], H, W))

            self.examples.append({
                "point_cloud": {
                    "coord": pad3(coord_k),
                    "grid_coord": pad3(grid_coord).astype(np.int32),
                    "feat": pad3(feat.astype(np.float32)),
                    "mask": mask,
                    "min_coord": min_coord.astype(np.float32),
                },
                "gt_images": np.stack(gt),
                "unprojected_coords": np.stack(unproj),
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
        return max(len(self.examples), 16)

    def __getitem__(self, index: int) -> Dict:
        return self.examples[index % len(self.examples)]
