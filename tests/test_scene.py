"""End-to-end scene-level tests (SparseUNet + PointFusion + splatter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unipre3d_tpu.data.dataset_factory import get_dataset
from unipre3d_tpu.data.loader import Loader
from unipre3d_tpu.training.config import load_config
from unipre3d_tpu.training.trainer import (create_train_state,
                                           make_train_step)

SCENE_OVERRIDES = [
    "data.training_width=32", "data.training_height=32",
    "data.input_images=2", "data.max_points=1024",
    "opt.batch_size=1", "data.pts_dataset_root=synthetic",
    "tpu.raster_tile_capacity=128", "opt.ema.update_after_step=1",
]


def scene_setup(backbone="sparseunet"):
    cfg = load_config(f"{backbone}_pretraining", overrides=SCENE_OVERRIDES)
    ds = get_dataset(cfg, "train")
    batch = next(iter(Loader(ds, batch_size=1, shuffle=False).epoch(0)))
    return cfg, batch


class TestSceneDataset:
    def test_schema(self):
        cfg, batch = scene_setup()
        pc = batch["point_cloud"]
        assert pc["coord"].shape == (1, 1024, 3)
        assert pc["grid_coord"].shape == (1, 1024, 3)
        assert pc["feat"].shape == (1, 1024, 6)
        assert pc["mask"].dtype == bool
        assert batch["gt_images"].shape == (1, 4, 3, 32, 32)
        assert batch["unprojected_coords"].shape == (1, 2, 32, 32, 4)
        # voxel dedup: valid grid coords are unique
        g = pc["grid_coord"][0][pc["mask"][0]]
        key = (g[:, 0].astype(np.int64) << 40) | \
              (g[:, 1].astype(np.int64) << 20) | g[:, 2].astype(np.int64)
        assert len(np.unique(key)) == len(key)

    def test_unprojection_validity(self):
        cfg, batch = scene_setup()
        up = batch["unprojected_coords"][0, 0]
        valid = up[..., 3] > 0
        assert valid.any()
        # valid unprojections land inside the scene bbox
        pc = batch["point_cloud"]
        coords = pc["coord"][0][pc["mask"][0]]
        pts = up[valid][:, :3]
        assert (pts.min(0) >= coords.min(0) - 1e-4).all()
        assert (pts.max(0) <= coords.max(0) + 1e-4).all()


class TestSceneTraining:
    @pytest.mark.parametrize("backbone", ["sparseunet", "ptv3"])
    def test_two_train_steps_improve_nothing_nan(self, backbone):
        cfg, batch = scene_setup(backbone)
        model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                              batch)
        step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))
        b = jax.tree_util.tree_map(jnp.asarray, batch)
        state, m1 = step(state, b)
        state, m2 = step(state, b)
        assert np.isfinite(float(m1["loss"]))
        assert np.isfinite(float(m2["loss"]))
        assert float(m2["grad_norm"]) > 0

    def test_scene_gaussians_masked(self):
        cfg, batch = scene_setup()
        from unipre3d_tpu.models.gaussian_predictor import build_predictor
        model = build_predictor(cfg)
        rng = jax.random.PRNGKey(0)
        from unipre3d_tpu.training.trainer import model_inputs
        args = model_inputs(batch, int(cfg.data.input_images), "scene")
        variables = jax.jit(lambda: model.init(
            {"params": rng, "droppath": rng}, *args))()
        out = jax.jit(lambda v: model.apply(v, *args))(variables)
        assert "mask" in out
        M = out["xyz"].shape[1]
        # capacity: input points + pixel-voxel slots
        assert M == 1024 + 4096
        mask = np.asarray(out["mask"][0])
        assert mask.sum() > 0
        # all finite where valid
        for k in ["xyz", "opacity", "scaling", "rotation"]:
            arr = np.asarray(out[k][0])
            assert np.isfinite(arr[mask]).all(), k
