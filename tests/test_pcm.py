"""Tests for the PCM (Point Cloud Mamba) backbone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unipre3d_tpu.models.pcm import (MambaBlock, PointMambaEncoder,
                                     PointMambaSeg, serialize_reorder)


def test_serialize_reorder_is_permutation():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 64, 3)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 64, 8)).astype(np.float32))
    p_s, (x_s, none) = serialize_reorder(p, [x, None], "hilbert")
    assert none is None
    # same multiset of rows per batch
    for b in range(2):
        a = np.sort(np.asarray(p[b]), axis=0)
        c = np.sort(np.asarray(p_s[b]), axis=0)
        np.testing.assert_allclose(a, c)
    # the (p, x) pairing is preserved
    orig = {tuple(np.round(np.asarray(p[0, i]), 5)): np.asarray(x[0, i])
            for i in range(64)}
    for i in range(64):
        key = tuple(np.round(np.asarray(p_s[0, i]), 5))
        np.testing.assert_allclose(np.asarray(x_s[0, i]), orig[key])


def test_serialize_reorder_orders_differ():
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 128, 3)).astype(np.float32))
    x = jnp.asarray(np.arange(128, dtype=np.float32).reshape(1, 128, 1))
    _, (xz, _) = serialize_reorder(p, [x, None], "z")
    _, (xh, _) = serialize_reorder(p, [x, None], "hilbert")
    assert not np.array_equal(np.asarray(xz), np.asarray(xh))


def test_mamba_block_residual_semantics():
    """residual_out = residual_in + x; output = mixer(norm(residual))."""
    block = MambaBlock(dim=16, drop_path=0.0)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 10, 16))
    res = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 16))
    params = block.init(rng, x, res)
    out, new_res = block.apply(params, x, res)
    np.testing.assert_allclose(np.asarray(new_res),
                               np.asarray(res + x), rtol=1e-5)
    assert new_res.dtype == jnp.float32
    # first call (residual None): residual_out == x
    out0, res0 = block.apply(params, x, None)
    np.testing.assert_allclose(np.asarray(res0), np.asarray(x), rtol=1e-6)


@pytest.fixture(scope="module")
def pcm_apply():
    model = PointMambaSeg(in_channels=4)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (2, 128, 4), minval=-0.5, maxval=0.5)
    variables = jax.jit(lambda: model.init(
        {"params": rng, "droppath": rng}, pts))()
    return model, variables, pts


def test_pcm_forward_shapes(pcm_apply):
    model, variables, pts = pcm_apply
    (tokens, center), _ = jax.jit(
        lambda v, p: model.apply(v, p, mutable=["batch_stats"]))(
        variables, pts)
    assert tokens.shape == (2, 128, 128)
    # center is the original cloud (first 3 channels)
    np.testing.assert_allclose(np.asarray(center),
                               np.asarray(pts[..., :3]), atol=1e-6)
    assert np.isfinite(np.asarray(tokens)).all()


def test_pcm_encoder_stage_shapes():
    enc = PointMambaEncoder(in_channels=4)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (1, 64, 4), minval=-0.5, maxval=0.5)
    variables = jax.jit(lambda: enc.init(
        {"params": rng, "droppath": rng}, pts))()
    (p_list, x_list), _ = jax.jit(
        lambda v, p: enc.apply(v, p, mutable=["batch_stats"]))(
        variables, pts)
    # resolutions halve per stage: 64, 32, 16, 8, 4
    assert [p.shape[1] for p in p_list] == [64, 32, 16, 8, 4]
    # channels follow dim_expansion (1, 1, 2, 1) from 384
    assert [x.shape[-1] for x in x_list] == [384, 384, 384, 768, 768]
