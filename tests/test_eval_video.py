"""Regression tests for the eval + test-video surfaces (previously only
exercised via the verify-skill CLI runs).

Covers the reference paths `eval.py:35-178` (evaluate_dataset: per-view
metrics, cond/novel split, scores.txt, save-vis) and
`train_network.py:497-556` (generate_test_examples: per-view render||GT
video, object orbit video) on tiny CPU configs, scene AND object level.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unipre3d_tpu.data.dataset_factory import get_dataset
from unipre3d_tpu.data.loader import Loader
from unipre3d_tpu.training.config import load_config
from unipre3d_tpu.training.trainer import create_train_state, make_eval_step

SCENE_OVERRIDES = [
    "data.training_width=32", "data.training_height=32",
    "data.input_images=2", "data.max_points=1024",
    "opt.batch_size=1", "data.pts_dataset_root=synthetic",
    "tpu.raster_tile_capacity=128", "opt.ema.update_after_step=1",
]


def _setup(level):
    if level == "scene":
        cfg = load_config("sparseunet_pretraining", overrides=SCENE_OVERRIDES)
    else:
        cfg = load_config("transformer_pretraining", overrides=[
            "data.training_resolution=32", "opt.batch_size=1",
            "data.dataset_root=synthetic", "tpu.raster_tile_capacity=128",
            "opt.ema.update_after_step=1"])
    ds = get_dataset(cfg, "test")
    loader = Loader(ds, batch_size=1, shuffle=False)
    batch = next(iter(loader.epoch(0)))
    model, _, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    return cfg, model, state, loader


class TestEvaluateDataset:
    @pytest.mark.parametrize("level", ["scene", "object"])
    def test_scores_and_vis(self, level, tmp_path):
        from eval import evaluate_dataset
        cfg, model, state, loader = _setup(level)
        # one-example loader so the test stays CPU-fast
        one = _FirstN(loader, 1)
        eval_step = jax.jit(make_eval_step(cfg, model))
        scores = evaluate_dataset(model, eval_step, state, one, cfg,
                                  str(tmp_path), save_vis=1)
        assert scores["PSNR_novel"] is not None
        assert np.isfinite(scores["PSNR_novel"])
        assert scores["SSIM_novel"] is not None
        assert scores["LPIPS_novel"] is None  # no weights configured
        # per-example scores file written (reference eval.py:156-167)
        lines = open(tmp_path / "scores.txt").read().strip().splitlines()
        assert len(lines) == 1
        # save-vis wrote render/gt pairs for every view
        vis = sorted(os.listdir(tmp_path / "vis_0000"))
        n_views = 2 * len([f for f in vis if f.endswith("_render.png")])
        assert n_views == len(vis) and n_views > 0


class _FirstN:
    def __init__(self, loader, n):
        self._loader, self._n = loader, n

    def epoch(self, i):
        for j, b in enumerate(self._loader.epoch(i)):
            if j >= self._n:
                break
            yield b


class TestGenerateTestExamples:
    @pytest.mark.parametrize("level", ["scene", "object"])
    def test_video_written(self, level, tmp_path):
        from unipre3d_tpu.training.video import generate_test_examples
        cfg, model, state, loader = _setup(level)
        paths = generate_test_examples(
            model, state, cfg, _FirstN(loader, 1), str(tmp_path),
            iteration=7, num_examples=1, orbit_frames=4)
        assert len(paths) == (2 if level == "object" else 1)
        for p in paths:
            assert os.path.exists(p)
            assert os.path.getsize(p) > 0
            assert p.endswith((".mp4", ".gif"))

    def test_orbit_frames(self):
        """Orbit poses are valid rigid transforms and the orbit render
        produces finite frames (reference dataset/shapenet.py:747-764)."""
        from unipre3d_tpu.training.video import (continuous_orbit_poses,
                                                 render_orbit)
        poses = continuous_orbit_poses(4)
        assert len(poses) == 8
        for w2c in poses:
            R = w2c[:3, :3]
            assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
            assert np.isclose(np.linalg.det(R), 1.0, atol=1e-6)
        cfg, model, state, loader = _setup("object")
        n = 64
        gaussians = {
            "xyz": jnp.asarray(np.random.default_rng(0)
                               .uniform(-0.3, 0.3, (n, 3))
                               .astype(np.float32)),
            "opacity": jnp.full((n, 1), 0.8),
            "scaling": jnp.full((n, 3), 0.05),
            "rotation": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
            "features_dc": jnp.ones((n, 1, 3)) * 0.5,
            "features_rest": jnp.zeros((n, 3, 3)),
        }
        frames = render_orbit(gaussians, cfg, num_frames=4)
        assert frames.shape[0] == 4 and frames.shape[3] == 3
        assert frames.max() > 0  # something actually rendered
