"""Tests for the host transform library, native ops and ScanNet loader."""

import math
import os

import numpy as np
import pytest

from unipre3d_tpu.data import transforms as T
from unipre3d_tpu.native import host_fps, host_grid_subsample, host_knn


class TestTransforms:
    def test_grid_sample_dedups_and_emits_grid(self):
        rng = np.random.default_rng(0)
        d = {"coord": rng.uniform(0, 1, (500, 3)),
             "color": rng.uniform(0, 255, (500, 3)),
             "normal": rng.normal(size=(500, 3)),
             "segment": np.zeros(500, np.int64)}
        out = T.GridSample(grid_size=0.2, return_grid_coord=True,
                           return_inverse=True)(d)
        g = out["grid_coord"]
        key = (g[:, 0] << 20) | (g[:, 1] << 10) | g[:, 2]
        assert len(np.unique(key)) == len(key)
        assert len(out["coord"]) == len(g)
        assert out["min_coord"].shape == (3,)

    def test_random_rotate_keeps_camera_consistent(self):
        """Rotating the cloud + extrinsic leaves camera-space points
        invariant: w2c' @ (S p) == w2c @ p."""
        rng = np.random.default_rng(1)
        coord = rng.uniform(-1, 1, (100, 3))
        w2c = np.eye(4)
        w2c[:3, 3] = [0.3, -0.2, 2.0]
        d = {"coord": coord.copy(), "extrinsic": [w2c.copy()]}
        before = (w2c @ np.concatenate(
            [coord, np.ones((100, 1))], 1).T).T
        out = T.RandomRotate(angle=[-1, 1], axis="z", always_apply=True,
                             keys=["extrinsic"])(d)
        after_pts = np.concatenate([out["coord"], np.ones((100, 1))], 1)
        after = (out["extrinsic"][0] @ after_pts.T).T
        np.testing.assert_allclose(after, before, atol=1e-6)

    def test_center_shift_consistency(self):
        rng = np.random.default_rng(2)
        coord = rng.uniform(0, 5, (50, 3))
        w2c = np.eye(4)
        w2c[:3, 3] = [1.0, 2.0, 3.0]
        d = {"coord": coord.copy(), "extrinsic": [w2c.copy()]}
        before = (w2c @ np.concatenate([coord, np.ones((50, 1))], 1).T).T
        out = T.CenterShift(apply_z=True, keys=["extrinsic"])(d)
        after = (out["extrinsic"][0] @ np.concatenate(
            [out["coord"], np.ones((50, 1))], 1).T).T
        np.testing.assert_allclose(after, before, atol=1e-6)

    def test_normalize_color(self):
        d = {"color": np.array([[0.0, 127.5, 255.0]])}
        out = T.NormalizeColor()(d)
        np.testing.assert_allclose(out["color"], [[-1, 0, 1]])

    def test_collect_feat_order(self):
        d = {"coord": np.zeros((4, 3)), "normal": np.ones((4, 3)),
             "color": np.full((4, 3), 2.0)}
        out = T.Collect(keys=("coord",), feat_keys=("normal", "color"))(d)
        assert out["feat"].shape == (4, 6)
        np.testing.assert_allclose(out["feat"][:, :3], 1.0)
        np.testing.assert_allclose(out["feat"][:, 3:], 2.0)

    def test_fps_transform_caps(self):
        rng = np.random.default_rng(3)
        d = {"coord": rng.uniform(-1, 1, (300, 3)).astype(np.float32),
             "feat": rng.normal(size=(300, 6))}
        out = T.FPS(max_points=100)(d)
        assert len(out["coord"]) == 100
        assert len(out["feat"]) == 100


class TestNativeOps:
    def test_fps_unique_and_spread(self):
        rng = np.random.default_rng(0)
        xyz = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
        idx = host_fps(xyz, 128)
        assert len(np.unique(idx)) == 128
        assert idx[0] == 0

    def test_knn_matches_bruteforce(self):
        rng = np.random.default_rng(1)
        q = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
        s = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
        idx, d2 = host_knn(q, s, 5)
        ref = np.sort(((q[:, None] - s[None]) ** 2).sum(-1), axis=1)[:, :5]
        np.testing.assert_allclose(np.sort(d2, 1), ref, atol=1e-5)

    def test_grid_subsample_first_per_voxel(self):
        xyz = np.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02],
                        [0.30, 0.01, 0.01]], np.float32)
        keep, grid = host_grid_subsample(xyz, 0.1)
        assert list(keep) == [0, 2]


@pytest.fixture
def mini_scannet(tmp_path):
    """Fabricate a 1-scene ScanNet tree."""
    from PIL import Image
    rng = np.random.default_rng(0)
    pts_root = tmp_path / "pts"
    rgb_root = tmp_path / "rgb"
    scene = "scene0000_00"
    sdir = pts_root / "train" / scene
    sdir.mkdir(parents=True)
    n = 2000
    coord = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    np.save(sdir / "coord.npy", coord)
    np.save(sdir / "color.npy",
            rng.uniform(0, 255, (n, 3)).astype(np.float32))
    np.save(sdir / "normal.npy", rng.normal(size=(n, 3)).astype(np.float32))
    np.save(sdir / "segment20.npy", rng.integers(0, 20, n))
    np.save(sdir / "instance.npy", rng.integers(0, 5, n))
    for sub in ("color", "pose", "depth"):
        (rgb_root / sub / scene).mkdir(parents=True)
    for i in range(8):
        img = Image.fromarray(
            rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
        img.save(rgb_root / "color" / scene / f"{i}.jpg")
        c2w = np.eye(4)
        c2w[:3, 3] = [1.0, 1.0, 3.0 + 0.1 * i]
        np.savetxt(rgb_root / "pose" / scene / f"{i}.txt", c2w)
        depth = (rng.uniform(500, 3000, (120, 160))).astype(np.uint16)
        Image.fromarray(depth).save(rgb_root / "depth" / scene / f"{i}.png")
    return str(pts_root), str(rgb_root)


class TestScanNetLoader:
    def test_loads_and_pads(self, mini_scannet):
        pts_root, rgb_root = mini_scannet
        from unipre3d_tpu.data.scannet import ScanNetDataset
        from unipre3d_tpu.training.config import load_config
        cfg = load_config("sparseunet_pretraining", overrides=[
            f"data.pts_dataset_root={pts_root}",
            f"data.rgb_dataset_root={rgb_root}",
            "data.max_points=4096", "data.input_images=2"])
        ds = ScanNetDataset(cfg, "train")
        assert len(ds) == 1
        ex = ds[0]
        pc = ex["point_cloud"]
        assert pc["coord"].shape == (4096, 3)
        assert pc["feat"].shape == (4096, 6)
        assert pc["mask"].sum() > 0
        assert ex["gt_images"].shape[0] == 4  # 2 ref + 2 gt
        assert ex["unprojected_coords"].shape == (2, 120, 160, 4)
        # cloud is grid-deduped
        g = pc["grid_coord"][pc["mask"]]
        key = (g[:, 0].astype(np.int64) << 40) | \
              (g[:, 1].astype(np.int64) << 20) | g[:, 2].astype(np.int64)
        assert len(np.unique(key)) == len(key)

    def test_unprojection_geometry(self, mini_scannet):
        """Unprojected world coords reproject onto their own pixels."""
        pts_root, rgb_root = mini_scannet
        from unipre3d_tpu.data.scannet import ScanNetDataset, LinkCreator
        from unipre3d_tpu.training.config import load_config
        cfg = load_config("sparseunet_pretraining", overrides=[
            f"data.pts_dataset_root={pts_root}",
            f"data.rgb_dataset_root={rgb_root}",
            "data.max_points=4096", "data.input_images=2"])
        ds = ScanNetDataset(cfg, "train")
        ex = ds[0]
        up = ex["unprojected_coords"][0]
        wv = ex["world_view_transforms"][0]
        K = ds.link_creator.intrinsic
        valid = up[..., 3] > 0
        ys, xs = np.where(valid)
        sel = slice(0, 50)
        pts = up[ys[sel], xs[sel], :3]
        hom = np.concatenate([pts, np.ones((len(pts), 1))], 1)
        cam = hom @ wv  # row-vector convention
        px = cam[:, 0] * K[0, 0] / cam[:, 2] + K[0, 2]
        py = cam[:, 1] * K[1, 1] / cam[:, 2] + K[1, 2]
        np.testing.assert_allclose(px, xs[sel], atol=0.5)
        np.testing.assert_allclose(py, ys[sel], atol=0.5)


class TestScanNetAugCameras:
    def test_cameras_from_extrinsics_identity(self, mini_scannet):
        """Deriving camera tensors from the UNTRANSFORMED w2c must
        reproduce the loader's own camera tensors — combined with the
        transform-level invariance test (w2c' @ S p == w2c @ p) this
        covers the augmented-camera path end to end."""
        pts_root, rgb_root = mini_scannet
        from unipre3d_tpu.data.scannet import ScanNetDataset
        from unipre3d_tpu.training.config import load_config
        cfg = load_config("sparseunet_pretraining", overrides=[
            f"data.pts_dataset_root={pts_root}",
            f"data.rgb_dataset_root={rgb_root}",
            "data.max_points=4096", "data.input_images=2"])
        ds = ScanNetDataset(cfg, "train")
        ex = ds._load_scene(ds.metadata[0])
        cams = ds._cameras_from_extrinsics(ex["w2c"][:3])
        np.testing.assert_allclose(cams["world_view_transforms"],
                                   ex["world_view_transforms"][:3],
                                   atol=1e-4)
        np.testing.assert_allclose(cams["full_proj_transforms"],
                                   ex["full_proj_transforms"][:3],
                                   atol=1e-4)
        np.testing.assert_allclose(cams["camera_centers"],
                                   ex["camera_centers"][:3], atol=1e-4)

    def test_aug_getitem_runs(self, mini_scannet):
        pts_root, rgb_root = mini_scannet
        from unipre3d_tpu.data.scannet import ScanNetDataset
        from unipre3d_tpu.training.config import load_config
        cfg = load_config("sparseunet_pretraining", overrides=[
            f"data.pts_dataset_root={pts_root}",
            f"data.rgb_dataset_root={rgb_root}",
            "data.max_points=4096", "data.input_images=2",
            "model.aug=true"])
        ds = ScanNetDataset(cfg, "train")
        ex = ds[0]
        assert np.isfinite(ex["world_view_transforms"]).all()
        assert np.isfinite(ex["unprojected_coords"]).all()
