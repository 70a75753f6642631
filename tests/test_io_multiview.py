"""Tests for the point-file IO loaders and multi-view union."""

import numpy as np
import pytest

from unipre3d_tpu.data.io import load_points, save_ply


class TestIO:
    def test_npy(self, tmp_path):
        pts = np.random.default_rng(0).normal(
            size=(100, 6)).astype(np.float32)
        p = tmp_path / "a.npy"
        np.save(p, pts)
        np.testing.assert_allclose(load_points(str(p)), pts)

    def test_txt_comma_and_space(self, tmp_path):
        pts = np.random.default_rng(1).normal(size=(20, 3))
        p1 = tmp_path / "a.txt"
        np.savetxt(p1, pts, delimiter=",")
        np.testing.assert_allclose(load_points(str(p1)), pts, atol=1e-5)
        p2 = tmp_path / "b.txt"
        np.savetxt(p2, pts)
        np.testing.assert_allclose(load_points(str(p2)), pts, atol=1e-5)

    def test_pth(self, tmp_path):
        import torch
        pts = np.random.default_rng(2).normal(size=(30, 3)).astype(
            np.float32)
        p = tmp_path / "a.pth"
        torch.save({"points": torch.from_numpy(pts)}, p)
        np.testing.assert_allclose(load_points(str(p)), pts)

    def test_ply_roundtrip(self, tmp_path):
        pts = np.random.default_rng(3).uniform(
            size=(25, 6)).astype(np.float32)
        p = tmp_path / "a.ply"
        save_ply(str(p), pts)
        back = load_points(str(p))
        np.testing.assert_allclose(back, pts, atol=1e-5)


def test_multi_view_union():
    """Object forward with V=2 conditioning views returns V*N gaussians
    (reference _multi_view_union, gaussian_predictor.py:413-420)."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_cfg, _synthetic_batch
    from unipre3d_tpu.models.gaussian_predictor import build_predictor
    cfg = _tiny_cfg()
    cfg.data.input_images = 2
    batch = _synthetic_batch(cfg, batch=2, n_points=64, n_views=4)
    model = build_predictor(cfg)
    rng = jax.random.PRNGKey(0)
    args = (jnp.asarray(batch["point_cloud"]),
            jnp.asarray(batch["gt_images"][:, :2]),
            jnp.asarray(batch["view_to_world_transforms"][:, :2]))
    variables = jax.jit(lambda: model.init(
        {"params": rng, "droppath": rng}, *args))()
    out = jax.jit(lambda v: model.apply(v, *args))(variables)
    # transformer produces 128 tokens per view -> 256 unioned gaussians
    assert out["xyz"].shape == (2, 256, 3)
    assert np.isfinite(np.asarray(out["xyz"])).all()
