"""ShapeNet multi-view dataset loader (reference-format compatible).

Reads the same on-disk layout as reference dataset/shapenet.py:27-764:
``<root>/<class>/<object>/easy/NNN.png`` renders with matching
``NNN.txt`` 4x4 c2w poses and ``<object>/pts/*.npy`` point clouds.
Behavior parity:

* deterministic shuffled 75/20/5 train/val/test split with
  ``random_seed + 1`` (reference :93-111)
* per-object: center cloud, FPS to ``num_points`` (1024), axis remap
  ``(2, 0, 1)`` with sign flips on the new x/z axes (reference :398-412)
* images resized to ``training_resolution``, values clamped [0, 1]
* train sampling: randperm pick ``imgs_per_obj`` views, the first
  repeated as the conditioning view (reference :601-612)
* optional train-time rotation augmentation (x/y jitter ±0.01π, z spin
  ±2π in random order) that re-derives every camera matrix from the
  rotated w2c extrinsics (reference :537-599)
* gravity 4th channel for 4-channel backbones (reference :414-429)

The FPS subsample runs once per object through the framework's own
device FPS op and is cached in RAM (the reference runs CUDA FPS inside
``__getitem__``; here it is amortized, SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

import glob
import math
import os
import random
from typing import Dict, List

import numpy as np

from unipre3d_tpu.utils import camera as cam_util

FILE_TITLE = "easy"
TRAIN_SPLIT_RATIO = 0.75
VAL_SPLIT_RATIO = 0.2
CAMERA_DISTANCE = 1.75  # reference dataset/shapenet.py:36


def generate_continuous_pose(num: int = 200) -> np.ndarray:
    """Continuous orbit c2w poses for the test split: two pitch sweeps
    (0->20 deg and 20->90 deg) each zipped with a full -180..180 roll —
    2*num matrices (reference dataset/shapenet.py:747-764,
    _calculate_transformation_matrix :674-744)."""
    rolls = np.linspace(-180.0, 180.0, num)
    pitches = np.concatenate([np.linspace(0.0, 20.0, num),
                              np.linspace(20.0, 90.0, num)])
    rolls = np.concatenate([rolls, rolls])
    out = []
    for roll, pitch in zip(rolls, pitches):
        az = math.radians(roll)
        el = math.radians(pitch - 90.0)
        sa, ca = math.sin(az), math.cos(az)
        se, ce = math.sin(el), math.cos(el)
        # in-plane rotation is 0 (reference :691)
        R = np.array([[ca, ce * sa, se * sa],
                      [-sa, ce * ca, se * ca],
                      [0.0, -se, ce]])
        t = np.array([-CAMERA_DISTANCE * se * sa,
                      -CAMERA_DISTANCE * se * ca,
                      -CAMERA_DISTANCE * ce])
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = t
        out.append(m)
    return np.asarray(out, dtype=np.float64)


def _rotation_matrix(axis_ind: int, theta: float) -> np.ndarray:
    axis = np.zeros(3)
    axis[axis_ind] = 1.0
    K = np.cross(np.eye(3), axis * theta)
    # expm of a cross-product matrix == Rodrigues rotation
    from scipy.linalg import expm
    return expm(K)


class ShapeNetDataset:
    def __init__(self, cfg, split: str = "train"):
        self.cfg = cfg
        self.split = split
        self.res = int(cfg.data.training_resolution)
        self.num_points = int(cfg.data.get("num_points", 1024))
        self.imgs_per_obj = int(cfg.opt.imgs_per_obj)
        self.input_images = int(cfg.data.input_images)
        # V>1 conditioning routes through the model's multi-view union
        # (reference gaussian_predictor.py:413-420); the reference LOADER
        # only supports 1 (shapenet.py:122-127) — this one lifts that.
        self.fov = float(cfg.data.fov)
        self.znear, self.zfar = float(cfg.data.znear), float(cfg.data.zfar)
        self.aug = bool(cfg.model.aug) and split == "train"
        self.in_channels = int(cfg.model.in_channels)

        root = cfg.data.dataset_root
        metadata: List[str] = []
        for lvl1 in sorted(f.path for f in os.scandir(root) if f.is_dir()):
            metadata.extend(sorted(
                f.path for f in os.scandir(lvl1) if f.is_dir()))
        metadata = sorted(metadata)
        rng = random.Random(int(cfg.general.random_seed) + 1)
        rng.shuffle(metadata)
        n_train = int(len(metadata) * TRAIN_SPLIT_RATIO)
        n_val = int(len(metadata) * VAL_SPLIT_RATIO)
        if split == "train":
            self.metadata = metadata[:n_train]
        elif split == "val":
            self.metadata = metadata[n_train:n_train + n_val]
        else:
            self.metadata = metadata[n_train + n_val:]

        self._cache: Dict[str, dict] = {}
        fov_r = math.radians(self.fov)
        self._proj = cam_util.get_projection_matrix(
            self.znear, self.zfar, fov_r, fov_r).T
        # test split renders 400 continuous orbit poses (reference
        # dataset/shapenet.py:59,618-628)
        self._orbit_w2cs = None
        if split == "test":
            c2ws = generate_continuous_pose(200)
            self._orbit_w2cs = np.stack(
                [np.linalg.inv(m) for m in c2ws]).astype(np.float32)

    def __len__(self):
        return len(self.metadata)

    # ---------- per-object loading ----------

    def _load_object(self, obj_dir: str) -> dict:
        if obj_dir in self._cache:
            return self._cache[obj_dir]
        from PIL import Image

        rgb_paths = sorted(glob.glob(os.path.join(obj_dir, FILE_TITLE, "*.png")))
        pose_paths = sorted(glob.glob(os.path.join(obj_dir, FILE_TITLE,
                                                   "[0-9]*.txt")))
        pts_paths = sorted(glob.glob(os.path.join(obj_dir, "pts", "*")))
        assert rgb_paths and len(rgb_paths) == len(pose_paths), obj_dir

        images, w2cs = [], []
        for rp, pp in zip(rgb_paths, pose_paths):
            img = Image.open(rp).resize((self.res, self.res))
            arr = np.asarray(img, dtype=np.float32) / 255.0
            images.append(np.clip(arr[..., :3], 0, 1).transpose(2, 0, 1))
            c2w = np.loadtxt(pp).reshape(4, 4)
            w2cs.append(np.linalg.inv(c2w).astype(np.float32))

        pts = self._load_points(pts_paths[0])
        obj = {"images": np.stack(images), "w2cs": np.stack(w2cs),
               "points": pts}
        self._cache[obj_dir] = obj
        return obj

    def _load_points(self, path: str) -> np.ndarray:
        if path.endswith(".npy"):
            data = np.load(path)
        elif path.endswith(".txt"):
            data = np.loadtxt(path, delimiter=",")
        else:
            raise ValueError(f"unsupported point file: {path}")
        data = data[:, :3].astype(np.float32)
        data -= data.mean(axis=0, keepdims=True)
        # FPS to num_points on device (amortized, cached)
        import jax.numpy as jnp
        from unipre3d_tpu.ops import furthest_point_sample
        idx = np.asarray(furthest_point_sample(
            jnp.asarray(data[None]), self.num_points))[0]
        data = data[idx]
        # axis remap (2,0,1) with sign flips (reference :398-412)
        data = data[:, (2, 0, 1)].copy()
        data[:, 0] *= -1
        data[:, 2] *= -1
        return data

    # ---------- camera derivation ----------

    def _camera_tensors(self, w2cs: np.ndarray) -> dict:
        wv, vw, fp, cc = [], [], [], []
        for w2c in w2cs:
            R = w2c[:3, :3].T  # stored transposed, reference convention
            T = w2c[:3, 3]
            wvt = cam_util.get_world2view(R, T).T
            wv.append(wvt)
            vw.append(np.linalg.inv(wvt.astype(np.float64)).astype(np.float32))
            fp.append(wvt @ self._proj)
            cc.append(np.linalg.inv(
                wvt.astype(np.float64))[3, :3].astype(np.float32))
        return {"world_view_transforms": np.stack(wv).astype(np.float32),
                "view_to_world_transforms": np.stack(vw),
                "full_proj_transforms": np.stack(fp).astype(np.float32),
                "camera_centers": np.stack(cc)}

    # ---------- getitem ----------

    def __getitem__(self, index: int, _retries: int = 0
                    ) -> Dict[str, np.ndarray]:
        try:
            obj = self._load_object(self.metadata[index % len(self.metadata)])
        except (AssertionError, OSError, ValueError) as e:
            # missing/corrupt frames: resample a random other object
            # (reference dataset/shapenet.py:512-514)
            if _retries >= 8:
                raise
            print(f"Warning: {self.metadata[index % len(self.metadata)]}: "
                  f"{e}; resampling")
            return self.__getitem__(
                int(np.random.randint(len(self.metadata))), _retries + 1)

        if self.split == "test" and self._orbit_w2cs is not None:
            # 400 continuous orbit poses; real renders tiled as (unused)
            # GT placeholders (reference :250-258,618-628)
            n_total = len(self._orbit_w2cs)
            rate = -(-n_total // obj["images"].shape[0])
            images = np.tile(obj["images"], (rate, 1, 1, 1))[:n_total]
            w2cs_all = self._orbit_w2cs
        else:
            images = obj["images"]
            w2cs_all = obj["w2cs"]
        V = images.shape[0]

        if self.split == "train":
            sel = np.random.permutation(V)[:self.imgs_per_obj]
            idx = np.concatenate([sel[:self.input_images], sel])
        else:
            cond = list(range(self.input_images))
            rest = [i for i in range(V) if i not in cond]
            idx = np.asarray(cond + rest)

        pts = obj["points"].copy()
        w2cs = w2cs_all[idx].copy()

        if self.aug:
            angles = np.array([0.01, 0.01, 2.0]) * np.pi
            mats = [_rotation_matrix(i, np.random.uniform(-a, a))
                    for i, a in enumerate(angles)]
            np.random.shuffle(mats)
            rot = (mats[0] @ mats[1] @ mats[2]).astype(np.float32)
            pts = pts @ rot.T
            S = np.eye(4, dtype=np.float32)
            S[:3, :3] = rot
            S_inv = np.linalg.inv(S)
            w2cs = np.asarray([w @ S_inv for w in w2cs], dtype=np.float32)

        cams = self._camera_tensors(w2cs)
        if self.in_channels == 4:
            grav = pts[:, 1:2] - pts[:, 1].min()
            pts = np.concatenate([pts, grav], axis=1)

        out = {"gt_images": images[idx], "point_cloud": pts}
        out.update(cams)
        return out
