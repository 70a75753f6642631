"""Block-dense submanifold conv == gather submanifold conv.

ops/sparse.py:block_structure/block_conv_apply re-executes the same
masked neighbor sum as subm_gather_matmul through one batched dense
conv (the TPU fast path — gathers are row-count-bound); these tests pin
forward and gradient equality on random sparse sets, for k3 and the k5
stem, plus the end-to-end SpUNet forward under conv_impl="block".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_scene_geometry import random_voxels
from unipre3d_tpu.ops import sparse as sp


def _paths(sv, k, cin, cout, nb_cap, seed=0):
    rng = np.random.default_rng(seed)
    W = jnp.asarray(rng.normal(size=(k ** 3, cin, cout))
                    .astype(np.float32) * 0.2)
    nbr = sp.find_neighbors(sv, sp.kernel_offsets(k))
    bst = sp.block_structure(sv.coords, sv.mask, nb_cap, bs=4,
                             halo=k // 2)
    ref = sp.subm_gather_matmul(sv.feats, nbr, W)
    out = sp.block_conv_apply(sv.feats, bst, W, bs=4)
    return ref, out, W, nbr, bst


@pytest.mark.parametrize("k", [3, 5])
def test_block_conv_matches_gather(k):
    rng = np.random.default_rng(3)
    sv = random_voxels(rng, 180, 256, extent=20, C=8)
    ref, out, *_ = _paths(sv, k, 8, 12, nb_cap=256)
    # masked rows must be exactly zero in both
    np.testing.assert_array_equal(
        np.asarray(out)[~np.asarray(sv.mask)], 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_block_conv_gradients_match():
    rng = np.random.default_rng(4)
    sv = random_voxels(rng, 120, 192, extent=16, C=6)
    W = jnp.asarray(rng.normal(size=(27, 6, 5)).astype(np.float32) * 0.2)
    nbr = sp.find_neighbors(sv, sp.kernel_offsets(3))
    bst = sp.block_structure(sv.coords, sv.mask, 192, bs=4, halo=1)
    cot = jnp.asarray(rng.normal(size=(192, 5)).astype(np.float32))

    def loss_gather(f, w):
        return jnp.sum(sp.subm_gather_matmul(f, nbr, w) * cot)

    def loss_block(f, w):
        return jnp.sum(sp.block_conv_apply(f, bst, w, bs=4) * cot)

    gf_r, gw_r = jax.grad(loss_gather, argnums=(0, 1))(sv.feats, W)
    gf_b, gw_b = jax.grad(loss_block, argnums=(0, 1))(sv.feats, W)
    np.testing.assert_allclose(np.asarray(gf_b), np.asarray(gf_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)


def test_block_conv_bf16_grad():
    """bf16 features (the TPU training dtype) must trace through the
    dense-conv backward — regression for the f32 preferred_element_type
    output colliding with bf16 cotangents inside conv autodiff."""
    rng = np.random.default_rng(6)
    sv = random_voxels(rng, 80, 128, extent=12, C=4)
    W = jnp.asarray(rng.normal(size=(27, 4, 4)).astype(np.float32))
    bst = sp.block_structure(sv.coords, sv.mask, 128, bs=4, halo=1)
    f16 = sv.feats.astype(jnp.bfloat16)

    def loss(f, w):
        return jnp.sum(sp.block_conv_apply(
            f, bst, w.astype(jnp.bfloat16), bs=4).astype(jnp.float32))

    gf, gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(f16, W)
    assert gf.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(gw)).all()


def test_block_capacity_drop_is_masked():
    """Blocks beyond nb_cap drop deterministically: affected voxels get
    zero output, everything else matches the gather path wherever its
    own neighborhood survived intact."""
    rng = np.random.default_rng(5)
    sv = random_voxels(rng, 150, 192, extent=24, C=4)
    W = jnp.asarray(rng.normal(size=(27, 4, 4)).astype(np.float32))
    bst = sp.block_structure(sv.coords, sv.mask, 8, bs=4, halo=1)
    out = sp.block_conv_apply(sv.feats, bst, W, bs=4)
    dropped = np.asarray(bst.out_idx) < 0
    assert dropped.any()
    np.testing.assert_array_equal(np.asarray(out)[dropped], 0.0)


@pytest.mark.parametrize("k", [3, 5])
def test_find_neighbors_with_duplicates(k):
    """Duplicate coords (PointFusion merged sets carry up to 2 rows per
    cell) must resolve every neighbor to the LAST duplicate row, never
    to a garbage rank (round-5 regression: the cubic window's one-hot
    match summed two lane ranks)."""
    rng = np.random.default_rng(11)
    cap = 256
    coords = rng.integers(0, 20, size=(170, 3)).astype(np.int32)
    coords = np.concatenate([coords, coords[:40]], axis=0)
    mask = np.concatenate([np.ones(210, bool), np.zeros(cap - 210, bool)])
    coords = np.concatenate([coords, np.zeros((cap - 210, 3), np.int32)])
    feats = rng.normal(size=(cap, 4)).astype(np.float32)
    sv, _ = sp.canonicalize(jnp.asarray(coords), jnp.asarray(feats),
                            jnp.asarray(mask))
    offs = sp.kernel_offsets(k)
    nbr = np.asarray(sp.find_neighbors(sv, offs))
    c = np.asarray(sv.coords)
    m = np.asarray(sv.mask)
    last = {}
    for v in range(cap):
        if m[v]:
            last[tuple(c[v])] = v      # ascending → keeps last duplicate
    for i in range(cap):
        if not m[i]:
            continue
        for kk, off in enumerate(np.asarray(offs)):
            want = last.get(tuple(c[i] + off), -1)
            assert nbr[i, kk] == want, (i, kk, off, nbr[i, kk], want)


def test_spunet_block_impl_matches_gather():
    """End-to-end SpUNet forward: conv_impl='block' geometry produces
    the same features as the gather geometry (same params)."""
    from tests.test_scene import scene_setup
    from unipre3d_tpu.training.trainer import (create_train_state,
                                               make_geometry_fn,
                                               model_inputs)

    cfg, batch = scene_setup()
    rng = jax.random.PRNGKey(0)
    model, tx, state = create_train_state(cfg, rng, batch)
    n_in = int(cfg.data.input_images)

    def fwd(geometry):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *model_inputs(batch, n_in, "scene"), train=False,
            geometry=geometry)

    g_gather = jax.jit(make_geometry_fn(cfg, model))(batch)

    import copy
    cfg2 = copy.deepcopy(cfg)
    cfg2.tpu.sparse_conv_impl = "block"
    # block_div=1 (block capacity == voxel capacity) cannot drop, so the
    # two executors must agree to fp tolerance; production uses the
    # occupancy-informed default (blocks ~64x fewer than voxels)
    cfg2.model.backbone_overrides = {"block_div": 1}
    model2, _, state2 = create_train_state(cfg2, rng, batch)
    g_block = jax.jit(make_geometry_fn(cfg2, model2))(batch)

    out_g = fwd(g_gather)
    out_b = model2.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        *model_inputs(batch, n_in, "scene"), train=False,
        geometry=g_block)
    for k in out_g:
        np.testing.assert_allclose(
            np.asarray(out_b[k]).astype(np.float32),
            np.asarray(out_g[k]).astype(np.float32),
            rtol=2e-3, atol=2e-3, err_msg=k)
