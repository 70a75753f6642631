"""Mamba3D backbone: forward shape/quirk and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np


def test_mamba3d_forward_and_cls_pos_quirk():
    from unipre3d_tpu.models.mamba3d import Mamba3DEncoder
    enc = Mamba3DEncoder(trans_dim=64, depth=2, num_group=16, group_size=8)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (2, 128, 3), minval=-0.5, maxval=0.5)
    variables = jax.jit(lambda: enc.init(
        {"params": rng, "droppath": rng}, pts))()
    out = jax.jit(lambda v, p: enc.apply(v, p, mutable=["batch_stats"]))(
        variables, pts)
    (tokens, cls_pos), _ = out
    assert tokens.shape == (2, 16, 64)
    # reference quirk: the "center" is the learned CLS positional
    # embedding broadcast to [B, 1, C] (Mamba3D.py:612-646)
    assert cls_pos.shape == (2, 1, 64)
    np.testing.assert_allclose(np.asarray(cls_pos[0]),
                               np.asarray(cls_pos[1]))


def test_mamba3d_gradients_flow():
    from __graft_entry__ import _tiny_cfg, _synthetic_batch
    from unipre3d_tpu.models.gaussian_predictor import build_predictor
    cfg = _tiny_cfg(backbone="mamba3d")
    batch = _synthetic_batch(cfg, batch=1, n_points=128, n_views=2)
    model = build_predictor(cfg)
    rng = jax.random.PRNGKey(0)
    args = (jnp.asarray(batch["point_cloud"]),
            jnp.asarray(batch["gt_images"][:, :1]),
            jnp.asarray(batch["view_to_world_transforms"][:, :1]))
    variables = jax.jit(lambda: model.init(
        {"params": rng, "droppath": rng}, *args))()

    def loss(params):
        v = dict(variables)
        v["params"] = params
        out = model.apply(v, *args)
        return sum(jnp.sum(x ** 2) for x in
                   (out["xyz"], out["opacity"], out["features_dc"]))

    g = jax.jit(jax.grad(loss))(variables["params"])
    leaves = jax.tree_util.tree_leaves(
        g["point_network"]["encoder"])
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    total = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert total > 0
