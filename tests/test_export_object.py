"""Name-exact torch export round-trips for pointmlp / pcm / mamba3d.

Mirrors tests/test_export.py's transformer round-trip: export to the
reference torch naming, import into a ones-filled clone, and require
every leaf to be restored — an unmapped leaf stays at 1.0 and fails, so
the spec provably covers the whole backbone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _roundtrip(params, stats, export_fn, import_fn):
    p = jax.tree_util.tree_map(np.asarray, params)
    s = jax.tree_util.tree_map(np.asarray, stats)
    sd = export_fn(p, s)
    assert all(isinstance(v, np.ndarray) for v in sd.values())

    clone_p = jax.tree_util.tree_map(lambda a: np.ones_like(a), p)
    clone_s = jax.tree_util.tree_map(lambda a: np.ones_like(a), s)
    import_fn(sd, clone_p, clone_s)

    got_p = {jax.tree_util.keystr(k): a for k, a
             in jax.tree_util.tree_leaves_with_path(clone_p)}
    for k, a in jax.tree_util.tree_leaves_with_path(p):
        np.testing.assert_allclose(
            a, got_p[jax.tree_util.keystr(k)], atol=1e-6,
            err_msg=f"param not round-tripped: {jax.tree_util.keystr(k)}")
    got_s = {jax.tree_util.keystr(k): a for k, a
             in jax.tree_util.tree_leaves_with_path(clone_s)}
    for k, a in jax.tree_util.tree_leaves_with_path(s):
        np.testing.assert_allclose(
            a, got_s[jax.tree_util.keystr(k)], atol=1e-6,
            err_msg=f"stat not round-tripped: {jax.tree_util.keystr(k)}")
    return sd


def test_pointmlp_export_roundtrip():
    from unipre3d_tpu.export import (export_pointmlp_backbone,
                                     import_pointmlp_backbone)
    from unipre3d_tpu.models.pointmlp import PointMLPEncoder
    enc = PointMLPEncoder(in_channels=4, embed_dim=8,
                          de_dims=(16, 16, 8, 8),
                          k_neighbors=(4, 4, 4, 4))
    pts = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 4),
                             minval=-0.5, maxval=0.5)
    variables = enc.init(jax.random.PRNGKey(1), pts)
    sd = _roundtrip(variables["params"], variables["batch_stats"],
                    export_pointmlp_backbone, import_pointmlp_backbone)
    # reference pointmlp.py naming spot checks
    assert "embedding.net.0.weight" in sd
    assert sd["embedding.net.0.weight"].shape == (8, 4, 1)
    assert "local_grouper_list.0.affine_alpha" in sd
    assert "pre_blocks_list.0.transfer.net.0.weight" in sd
    assert "pre_blocks_list.3.operation.1.net2.1.running_var" in sd
    assert "pos_blocks_list.2.operation.0.net1.0.weight" in sd
    assert "decode_list.3.fuse.net.0.weight" in sd
    assert "decode_list.0.extraction.operation.1.net2.0.weight" in sd
    # bias=False everywhere (reference pointMLP factory bias=False)
    assert "embedding.net.0.bias" not in sd


def test_mamba3d_export_roundtrip():
    from unipre3d_tpu.export import (export_mamba3d_backbone,
                                     import_mamba3d_backbone)
    from unipre3d_tpu.models.mamba3d import Mamba3DEncoder
    enc = Mamba3DEncoder(trans_dim=32, depth=2, num_group=16, group_size=8)
    pts = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 3),
                             minval=-0.5, maxval=0.5)
    variables = enc.init(jax.random.PRNGKey(1), pts)
    sd = _roundtrip(variables["params"], variables["batch_stats"],
                    export_mamba3d_backbone, import_mamba3d_backbone)
    # reference Mamba3D.py:497-552 naming spot checks
    assert "encoder.first_conv.0.weight" in sd
    assert sd["encoder.first_conv.0.weight"].shape == (128, 3, 1)
    assert "cls_pos" in sd and "cls_token" in sd
    assert "pos_embed.0.weight" in sd and "pos_embed.2.weight" in sd
    assert "blocks.blocks.0.lfa.lga.affine_alpha_feat" in sd
    assert "blocks.blocks.1.lfa.mlp.share_mlp.weight" in sd
    assert "blocks.blocks.0.mixer.in_proj.weight" in sd
    # bimamba v4 reverse-direction parameter set
    assert "blocks.blocks.0.mixer.A_b_log" in sd
    assert "blocks.blocks.0.mixer.conv1d_b.weight" in sd
    assert "blocks.blocks.0.mixer.dt_proj_b.bias" in sd
    assert "norm.weight" in sd
    # conv1d depthwise layout [D, 1, K]
    w = sd["blocks.blocks.0.mixer.conv1d.weight"]
    assert w.ndim == 3 and w.shape[1] == 1


def test_pcm_export_roundtrip():
    from unipre3d_tpu.export import (export_pcm_backbone,
                                     import_pcm_backbone)
    from unipre3d_tpu.models.pcm import PointMambaSeg
    seg = PointMambaSeg(in_channels=4)
    pts = jax.random.uniform(jax.random.PRNGKey(0), (1, 128, 4),
                             minval=-0.5, maxval=0.5)
    variables = seg.init({"params": jax.random.PRNGKey(1),
                          "droppath": jax.random.PRNGKey(2)}, pts)
    sd = _roundtrip(variables["params"], variables["batch_stats"],
                    export_pcm_backbone, import_pcm_backbone)
    # reference BaseSeg + PCM.py naming spot checks
    assert "encoder.embedding.net.0.weight" in sd
    assert "encoder.order_prompt.weight" in sd
    assert sd["encoder.order_prompt.weight"].shape == (54, 384)
    assert "encoder.local_grouper_list.0.affine_alpha" in sd
    assert "encoder.pos_proj.0.weight" in sd
    assert "encoder.order_prompt_proj.3.weight" in sd
    # dim_expansion (1,1,2,1): only stage 2 has a residual projection
    assert "encoder.residual_proj_blocks_list.2.weight" in sd
    assert "encoder.residual_proj_blocks_list.0.weight" not in sd
    # mamba_blocks (1,2,2,4): global layer 3 = stage 2, block 1
    assert "encoder.mamba_blocks_list.2.1.norm.weight" in sd
    assert "encoder.mamba_blocks_list.3.3.mixer.out_proj.weight" in sd
    assert "encoder.mamba_blocks_list.0.0.mixer.A_log" in sd
    assert "decoder.decode_list.0.fuse.net.0.weight" in sd
    assert "decoder.decode_list.0.fuse.net.0.bias" in sd  # decoder bias=True
    assert "head.head.0.0.weight" in sd
    assert "head.head.0.0.bias" not in sd   # conv before BN: bias dropped
    assert "head.head.2.0.weight" in sd and "head.head.2.0.bias" in sd


def test_causal_conv_tap_order():
    """torch Conv1d(groups=D, padding=K-1) equivalence: tap j of the
    torch kernel multiplies x[t-(K-1)+j] — oldest->newest, the same
    order as ops/scan.py causal_conv1d's weight rows."""
    import torch
    from unipre3d_tpu.ops.scan import causal_conv1d
    rng = np.random.default_rng(0)
    B, L, D, K = 2, 10, 4, 4
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    w = rng.normal(size=(K, D)).astype(np.float32)
    b = rng.normal(size=(D,)).astype(np.float32)
    ours = np.asarray(causal_conv1d(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b)))
    conv = torch.nn.Conv1d(D, D, K, groups=D, padding=K - 1, bias=True)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.T[:, None, :]))
        conv.bias.copy_(torch.from_numpy(b))
        theirs = conv(torch.from_numpy(x).transpose(1, 2))[..., :L]
    np.testing.assert_allclose(ours, theirs.transpose(1, 2).numpy(),
                               rtol=1e-5, atol=1e-5)
