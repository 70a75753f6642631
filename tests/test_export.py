"""Tests for the PyTorch checkpoint interop bridge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def transformer_state():
    from __graft_entry__ import _tiny_cfg, _synthetic_batch
    from unipre3d_tpu.training.trainer import create_train_state
    cfg = _tiny_cfg()
    batch = _synthetic_batch(cfg, batch=1)
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    return cfg, model, state


def test_export_transformer_names(transformer_state):
    from unipre3d_tpu.export import export_transformer_predictor
    cfg, model, state = transformer_state
    sd = export_transformer_predictor(state.params, state.batch_stats)
    # reference naming spot checks
    assert "point_network.encoder.encoder.first_conv.0.weight" in sd
    assert sd["point_network.encoder.encoder.first_conv.0.weight"].shape \
        == (128, 3, 1)
    assert "point_network.encoder.blocks.blocks.0.attn.qkv.weight" in sd
    assert sd["point_network.encoder.blocks.blocks.15.mlp.fc2.bias"].shape \
        == (384,)
    assert "point_network.encoder.cls_token" in sd
    assert "point_network.final.0.weight" in sd
    assert "image_conv.1.weight" in sd
    assert sd["point_network.encoder.encoder.first_conv.1.running_mean"]\
        .shape == (128,)


def test_roundtrip_import(transformer_state):
    """export -> import into fresh params reproduces the original."""
    from unipre3d_tpu.export import export_transformer_predictor
    from unipre3d_tpu.export.torch_export import (
        export_transformer_backbone, import_transformer_backbone)
    cfg, model, state = transformer_state
    enc_p = jax.tree_util.tree_map(
        np.asarray, state.params["point_network"]["encoder"])
    enc_s = jax.tree_util.tree_map(
        np.asarray, state.batch_stats["point_network"]["encoder"])
    sd = export_transformer_backbone(enc_p, enc_s)

    # perturbed copy, then import back
    other_p = jax.tree_util.tree_map(lambda a: a * 0 + 1.0, enc_p)
    other_s = jax.tree_util.tree_map(lambda a: a * 0 + 1.0, enc_s)
    import_transformer_backbone(sd, other_p, other_s)
    flat_a = jax.tree_util.tree_leaves_with_path(enc_p)
    flat_b = {jax.tree_util.keystr(p): a for p, a
              in jax.tree_util.tree_leaves_with_path(other_p)}
    for p, a in flat_a:
        np.testing.assert_allclose(a, flat_b[jax.tree_util.keystr(p)],
                                   atol=1e-6, err_msg=jax.tree_util.keystr(p))
    flat_sa = jax.tree_util.tree_leaves_with_path(enc_s)
    flat_sb = {jax.tree_util.keystr(p): a for p, a
               in jax.tree_util.tree_leaves_with_path(other_s)}
    for p, a in flat_sa:
        np.testing.assert_allclose(a, flat_sb[jax.tree_util.keystr(p)],
                                   atol=1e-6)


def test_generic_export_covers_all_leaves(transformer_state):
    from unipre3d_tpu.export import export_state_dict
    cfg, model, state = transformer_state
    n_leaves = len(jax.tree_util.tree_leaves(state.params))
    sd = export_state_dict(jax.tree_util.tree_map(np.asarray, state.params))
    assert len(sd) == n_leaves
    assert all(isinstance(v, np.ndarray) for v in sd.values())


def test_torch_checkpoint_roundtrip(transformer_state, tmp_path):
    import torch
    from unipre3d_tpu.export import (export_transformer_predictor,
                                     save_torch_checkpoint)
    cfg, model, state = transformer_state
    sd = export_transformer_predictor(state.params, state.batch_stats)
    path = str(tmp_path / "ckpt.pth")
    save_torch_checkpoint(path, sd, extra={"iteration": 7})
    loaded = torch.load(path, weights_only=False)
    assert loaded["iteration"] == 7
    back = loaded["model_state_dict"]
    key = "point_network.encoder.reduce_dim.weight"
    np.testing.assert_allclose(back[key].numpy(), sd[key])
