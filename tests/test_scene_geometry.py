"""Precomputed scene geometry == inline geometry (models/scene_geometry.py).

The SpUNet feature pass consumes only index structures; building them
outside the step (production input pipeline) must be bit-identical to
the inline build. Also covers the structure/apply split of the stride-2
downsample (ops/sparse.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_scene import scene_setup
from unipre3d_tpu.ops import sparse as sp
from unipre3d_tpu.training.trainer import (create_train_state,
                                           make_geometry_fn,
                                           make_train_step, model_inputs)


def random_voxels(rng, n_valid, cap, extent=12, C=4):
    coords = rng.integers(0, extent, size=(cap, 3)).astype(np.int32)
    # dedup by code to satisfy the canonical-unique contract
    key = (coords[:, 0].astype(np.int64) << 40) | \
        (coords[:, 1].astype(np.int64) << 20) | coords[:, 2].astype(np.int64)
    _, first = np.unique(key, return_index=True)
    mask = np.zeros((cap,), bool)
    mask[first[:n_valid]] = True
    feats = rng.normal(size=(cap, C)).astype(np.float32)
    sv, _ = sp.canonicalize(jnp.asarray(coords), jnp.asarray(feats),
                            jnp.asarray(mask))
    return sv


class TestDownsampleSplit:
    def test_structure_apply_equals_downsample(self):
        rng = np.random.default_rng(11)
        sv = random_voxels(rng, 50, 64)
        W = jnp.asarray(rng.normal(size=(8, 4, 6)).astype(np.float32))
        full = sp.downsample(sv, W, capacity_out=48)
        ds = sp.downsample_structure(sv.coords, sv.mask, 48)
        feats = sp.downsample_apply(ds, sv.feats, W)
        np.testing.assert_array_equal(np.asarray(ds.coords),
                                      np.asarray(full.sv.coords))
        np.testing.assert_array_equal(np.asarray(ds.mask),
                                      np.asarray(full.sv.mask))
        np.testing.assert_array_equal(np.asarray(ds.parent_idx),
                                      np.asarray(full.parent_idx))
        np.testing.assert_allclose(np.asarray(feats),
                                   np.asarray(full.sv.feats), atol=1e-6)


class TestGeometryPath:
    def test_precomputed_matches_inline(self):
        cfg, batch = scene_setup()
        rng = jax.random.PRNGKey(0)
        model, tx, state = create_train_state(cfg, rng, batch)
        geom_fn = make_geometry_fn(cfg, model)
        assert geom_fn is not None
        geometry = jax.jit(geom_fn)(batch)

        n_in = int(cfg.data.input_images)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        def fwd(geom):
            return model.apply(variables,
                               *model_inputs(batch, n_in, "scene"),
                               train=False, geometry=geom)

        out_inline = jax.jit(lambda: fwd(None))()
        out_geom = jax.jit(fwd)(geometry)
        for k in out_inline:
            np.testing.assert_allclose(
                np.asarray(out_inline[k]), np.asarray(out_geom[k]),
                atol=1e-6, err_msg=k)

    def test_train_step_accepts_geometry(self):
        cfg, batch = scene_setup()
        rng = jax.random.PRNGKey(1)
        model, tx, state = create_train_state(cfg, rng, batch)
        geom_fn = make_geometry_fn(cfg, model)
        b = dict(batch)
        b["geometry"] = jax.jit(geom_fn)(batch)
        step = jax.jit(make_train_step(cfg, model, tx))
        state2, m = step(state, b)
        assert np.isfinite(float(m["loss"]))

    def test_object_level_has_no_geometry_fn(self):
        from unipre3d_tpu.training.config import load_config
        cfg = load_config("transformer_pretraining")
        assert make_geometry_fn(cfg) is None
