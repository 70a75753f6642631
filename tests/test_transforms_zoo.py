"""Tests for the full reference transform zoo (reference
pointcept/datasets/transform_with_extrinsic.py) — the 13 transforms added
in round 2: Copy/Add/PointClip/PointRangeFilter/ProjectOnImage/RaySample/
RandomColorJitter/HueSaturationTranslation/RandomColorDrop/ShufflePoint/
CropBoundary/ContrastiveViewsGenerator/InstanceParser."""

import colorsys

import numpy as np
import pytest

from unipre3d_tpu.data import transforms as T


def _scene(n=200, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "coord": rng.uniform(-2, 2, (n, 3)),
        "color": rng.uniform(0, 255, (n, 3)),
        "normal": rng.normal(size=(n, 3)),
        "segment": rng.integers(0, 5, n),
        "instance": rng.integers(-1, 4, n),
    }


class TestSimpleTransforms:
    def test_copy_snapshots(self):
        d = _scene()
        out = T.Copy()(d)
        assert np.array_equal(out["origin_coord"], out["coord"])
        out["coord"] += 1.0
        assert not np.array_equal(out["origin_coord"], out["coord"])

    def test_add_injects(self):
        out = T.Add({"condition": "ScanNet"})(_scene())
        assert out["condition"] == "ScanNet"

    def test_point_clip(self):
        out = T.PointClip((-1, -1, -1, 1, 1, 1))(_scene())
        assert out["coord"].min() >= -1 and out["coord"].max() <= 1

    def test_point_range_filter(self):
        d = _scene()
        n_in = np.sum(np.all(np.abs(d["coord"]) < 1, axis=1))
        out = T.PointRangeFilter((-1, -1, -1, 1, 1, 1))(d)
        assert len(out["coord"]) == n_in
        assert len(out["segment"]) == n_in
        assert np.all(np.abs(out["coord"]) < 1)

    def test_point_range_filter_keeps_sampled_index(self):
        d = _scene()
        d["coord"][:5] = 50.0  # out of range but labeled
        d["sampled_index"] = np.arange(5)
        out = T.PointRangeFilter((-1, -1, -1, 1, 1, 1))(d)
        # labeled points survive and re-index to their new positions
        assert len(out["sampled_index"]) == 5
        assert np.all(out["coord"][out["sampled_index"]] == 50.0)

    def test_shuffle_point_permutes_consistently(self):
        d = _scene()
        coord0, seg0 = d["coord"].copy(), d["segment"].copy()
        np.random.seed(3)
        out = T.ShufflePoint()(d)
        assert not np.array_equal(out["coord"], coord0)
        # pairing preserved
        order = np.lexsort(out["coord"].T)
        order0 = np.lexsort(coord0.T)
        assert np.array_equal(out["segment"][order], seg0[order0])

    def test_crop_boundary(self):
        d = _scene()
        out = T.CropBoundary()(d)
        assert np.all(out["segment"] > 1) or np.all(out["segment"] != 0)
        assert len(out["coord"]) == len(out["segment"])

    def test_random_color_drop(self):
        d = _scene()
        out = T.RandomColorDrop(p=1.0, color_augment=0.0)(d)
        assert np.all(out["color"] == 0)


class TestColorJitter:
    def test_hsv_roundtrip_matches_colorsys(self):
        rng = np.random.default_rng(0)
        rgb = rng.uniform(0, 1, (64, 3))
        hsv = T._rgb2hsv(rgb)
        for i in range(8):
            h, s, v = colorsys.rgb_to_hsv(*rgb[i])
            assert np.allclose(hsv[i], [h, s, v], atol=1e-6)
        back = T._hsv2rgb(hsv)
        assert np.allclose(back, rgb, atol=1e-6)

    def test_brightness_only(self):
        d = _scene(seed=1)
        np.random.seed(0)
        out = T.RandomColorJitter(brightness=(2.0, 2.0), p=1.0)(d)
        # brightness blends toward zero with factor f: c' = clip(f*c)
        assert out["color"].max() <= 255.0
        assert out["color"].mean() > 100  # brightened

    def test_hue_saturation_translation_range(self):
        d = _scene(seed=2)
        np.random.seed(1)
        out = T.HueSaturationTranslation()(d)
        assert out["color"].min() >= 0 and out["color"].max() <= 255
        # hue shift preserves value channel (max of rgb)
        # (saturation changes chroma but v = max stays)

    def test_jitter_applies_to_rgb_key_too(self):
        d = _scene(seed=3)
        d["rgb"] = np.random.uniform(0, 255, (4, 8, 3))
        np.random.seed(2)
        out = T.HueSaturationTranslation(hue_max=0.3)(d)
        assert out["rgb"].shape == (4, 8, 3)
        assert out["rgb"].min() >= 0 and out["rgb"].max() <= 255


class TestProjection:
    def _cam_setup(self, n=100):
        rng = np.random.default_rng(5)
        coord = rng.uniform(-1, 1, (n, 3))
        coord[:, 2] += 3.0  # in front of camera
        h, w = 32, 40
        K = np.array([[30.0, 0, w / 2, 0],
                      [0, 30.0, h / 2, 0],
                      [0, 0, 1, 0],
                      [0, 0, 0, 1]])
        lidar2cam = np.eye(4)
        lidar2img = K @ lidar2cam
        img = rng.uniform(0, 255, (h, w, 3))
        return {
            "coord": coord,
            "segment": rng.integers(0, 5, n),
            "img": [img],
            "lidar2img": [lidar2img],
            "lidar2cam": [lidar2cam],
        }

    def test_project_on_image_masks_in_bounds(self):
        d = self._cam_setup()
        out = T.ProjectOnImage(filter_overlap=False)(d)
        m = out["img_proj_mask"][0]
        pc = out["img_coord"][0]
        assert m.any()
        assert np.all(pc[m, 0] > 0) and np.all(pc[m, 0] < 40)
        assert np.all(pc[m, 1] > 0) and np.all(pc[m, 1] < 32)

    def test_project_overlap_filter_keeps_closest(self):
        # two points on the same ray: only the nearer survives
        d = self._cam_setup(n=2)
        # same ray => same pixel; keep xy nonzero (the close_radius
        # check drops ||xy|| == 0 points, reference :304)
        d["coord"] = np.array([[0.02, 0.02, 2.0], [0.04, 0.04, 4.0]])
        out = T.ProjectOnImage(filter_overlap=True)(d)
        m = out["img_proj_mask"][0]
        assert m[0] and not m[1]

    def test_ray_sample(self):
        d = self._cam_setup()
        d = T.ProjectOnImage()(d)
        np.random.seed(0)
        out = T.RaySample(point_nsample=10)(d)
        assert out["ray_start"].shape == (10, 3)
        assert out["ray_end"].shape == (10, 3)
        assert out["ray_color"].shape == (10, 3)
        assert out["ray_segment"].shape == (10,)
        assert np.all(out["ray_color"] <= 1.0)
        # rays start at the camera origin (identity lidar2cam -> origin)
        assert np.allclose(out["ray_start"], 0.0)


class TestStructured:
    def test_contrastive_views(self):
        d = _scene()
        d = T.Copy()(d)
        out = T.ContrastiveViewsGenerator(
            view_keys=("coord", "color"),
            view_trans=[("RandomScale", {"scale": [0.5, 0.5]})])(d)
        assert "view1_coord" in out and "view2_coord" in out
        assert np.allclose(out["view1_coord"], 0.5 * out["coord"])
        assert out["view1_color"].shape == out["color"].shape

    def test_instance_parser(self):
        n = 60
        d = {
            "coord": np.random.default_rng(1).uniform(-1, 1, (n, 3)),
            "segment": np.concatenate(
                [np.zeros(20, np.int64), np.full(20, 3), np.full(20, 4)]),
            "instance": np.concatenate(
                [np.full(20, -1), np.full(20, 7), np.full(20, 9)]),
        }
        out = T.InstanceParser(segment_ignore_index=(-1, 0, 1))(d)
        # ignored segment -> ignored instance; others re-indexed 0..k
        assert np.all(out["instance"][:20] == -1)
        assert set(out["instance"][20:]) == {0, 1}
        assert out["bbox"].shape == (2, 8)
        # class ids shifted down to fill vacated 0/1
        assert out["bbox"][0, 7] == 3 - 2
        assert out["bbox"][1, 7] == 4 - 2
        # centroid attached per point for valid instances
        m = out["instance"] == 0
        assert np.allclose(out["instance_centroid"][m][0],
                           d["coord"][m].mean(0))
