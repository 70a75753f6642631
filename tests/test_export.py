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


# ---------------------------------------------------------------------------
# scene backbones: name-exact Pointcept export (round-3 VERDICT #3)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def scene_states():
    from tests.test_scene import scene_setup
    from unipre3d_tpu.training.trainer import create_train_state
    out = {}
    for backbone in ("sparseunet", "ptv3"):
        cfg, batch = scene_setup(backbone)
        model, tx, state = create_train_state(
            cfg, jax.random.PRNGKey(0), batch)
        out[backbone] = (cfg, state)
    return out


def _roundtrip(enc_p, enc_s, export_fn, import_fn):
    sd = export_fn(enc_p, enc_s)
    other_p = jax.tree_util.tree_map(lambda a: a * 0 + 1.0, enc_p)
    other_s = jax.tree_util.tree_map(lambda a: a * 0 + 1.0, enc_s)
    import_fn(sd, other_p, other_s)
    flat_b = {jax.tree_util.keystr(p): a for p, a
              in jax.tree_util.tree_leaves_with_path(other_p)}
    for p, a in jax.tree_util.tree_leaves_with_path(enc_p):
        np.testing.assert_allclose(
            a, flat_b[jax.tree_util.keystr(p)], atol=1e-6,
            err_msg=jax.tree_util.keystr(p))
    flat_sb = {jax.tree_util.keystr(p): a for p, a
               in jax.tree_util.tree_leaves_with_path(other_s)}
    for p, a in jax.tree_util.tree_leaves_with_path(enc_s):
        np.testing.assert_allclose(
            a, flat_sb[jax.tree_util.keystr(p)], atol=1e-6,
            err_msg=jax.tree_util.keystr(p))
    return sd


def test_sparseunet_export_names_and_roundtrip(scene_states):
    from unipre3d_tpu.export import (export_sparseunet_backbone,
                                     import_sparseunet_backbone)
    cfg, state = scene_states["sparseunet"]
    enc_p = jax.tree_util.tree_map(
        np.asarray, state.params["point_network"]["encoder"])
    enc_s = jax.tree_util.tree_map(
        np.asarray, state.batch_stats["point_network"]["encoder"])
    sd = _roundtrip(enc_p, enc_s, export_sparseunet_backbone,
                    import_sparseunet_backbone)

    # name-exact vs reference spconv_unet_v1m1_base.py module tree
    assert sd["conv_input.0.weight"].shape == (32, 5, 5, 5, 6)
    assert sd["down.0.0.weight"].shape == (32, 2, 2, 2, 32)
    assert sd["enc.0.block0.conv1.weight"].shape == (32, 3, 3, 3, 32)
    assert "enc.0.block0.bn1.running_mean" in sd
    assert "enc.0.block0.proj.0.weight" not in sd  # in==out -> Identity
    assert sd["up.3.0.weight"].shape[0] == 256     # ref_dec[3]
    # dec block0 consumes the skip concat -> projection exists
    assert sd["dec.0.block0.proj.0.weight"].shape[1:4] == (1, 1, 1)
    assert sd["final.weight"].shape == (64, 1, 1, 1, 96)
    assert sd["final.bias"].shape == (64,)
    # no silently-dropped parameters: every leaf appears in the sd
    n_leaves = len(jax.tree_util.tree_leaves(enc_p)) + \
        len(jax.tree_util.tree_leaves(enc_s))
    assert len(sd) == n_leaves


def test_ptv3_export_names_and_roundtrip(scene_states):
    from unipre3d_tpu.export import (export_ptv3_backbone,
                                     import_ptv3_backbone)
    cfg, state = scene_states["ptv3"]
    enc_p = jax.tree_util.tree_map(
        np.asarray, state.params["point_network"]["encoder"])
    enc_s = jax.tree_util.tree_map(
        np.asarray, state.batch_stats["point_network"]["encoder"])
    sd = _roundtrip(enc_p, enc_s, export_ptv3_backbone,
                    import_ptv3_backbone)

    # name-exact vs reference point_transformer_v3m1_base.py:521-534
    assert sd["embedding.stem.conv.weight"].shape == (32, 5, 5, 5, 6)
    assert "embedding.stem.norm.running_var" in sd
    assert sd["enc.enc0.block0.cpe.0.weight"].shape == (32, 3, 3, 3, 32)
    assert sd["enc.enc0.block0.attn.qkv.weight"].shape == (96, 32)
    assert sd["enc.enc1.down.proj.weight"].shape == (64, 32)
    assert "enc.enc1.down.norm.0.running_mean" in sd
    assert sd["enc.enc4.block1.mlp.0.fc1.weight"].shape == (2048, 512)
    assert sd["dec.dec0.up.proj.0.weight"].shape == (64, 64)
    assert "dec.dec0.up.proj_skip.1.running_var" in sd
    n_leaves = len(jax.tree_util.tree_leaves(enc_p)) + \
        len(jax.tree_util.tree_leaves(enc_s))
    assert len(sd) == n_leaves


def test_scene_predictor_export(scene_states):
    from unipre3d_tpu.export import export_scene_predictor
    cfg, state = scene_states["sparseunet"]
    params = jax.tree_util.tree_map(np.asarray, state.params)
    stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    sd = export_scene_predictor(params, stats, "sparseunet")
    assert "point_network.encoder.conv_input.0.weight" in sd
    assert "point_network.final.0.weight" in sd
    assert sd["fusion_mlps.0.weight"].shape[1:4] == (3, 3, 3)
    assert "fusion_mlps.1.running_mean" in sd
    assert "image_conv.1.weight" in sd
