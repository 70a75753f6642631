"""Device-resident frozen-VAE feature cache: exactness vs the live path.

The cache must be a pure optimization — identical gaussians and an
identical loss trajectory (reference recomputes the frozen VAE every
step, model/image_predictor.py:56-81; here hits skip it entirely).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _synthetic_batch, _tiny_cfg
from unipre3d_tpu.training.feature_cache import (DeviceVAECache,
                                                 make_feature_fn)
from unipre3d_tpu.training.trainer import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg(res=32, batch=2)
    batch = _synthetic_batch(cfg, batch=2, n_points=64, n_views=3)
    rng = jax.random.PRNGKey(0)
    model, tx, state = create_train_state(cfg, rng, batch)
    return cfg, batch, model, tx, state


def test_cached_features_match_live_forward(setup):
    cfg, batch, model, _, state = setup
    n_in = int(cfg.data.input_images)
    res = int(cfg.data.training_resolution)
    cache = DeviceVAECache(make_feature_fn(model), capacity=8,
                           img_h=res, img_w=res, dtype=jnp.float32)

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    args = (jnp.asarray(batch["point_cloud"]),
            jnp.asarray(batch["gt_images"][:, :n_in]),
            jnp.asarray(batch["view_to_world_transforms"][:, :n_in]))

    live = model.apply(variables, *args, train=False)
    feats = cache.attach(batch, state.params, n_in)
    assert cache.misses == 2 * n_in and cache.hits == 0
    cached = model.apply(variables, *args, train=False, vae_features=feats)
    for k in live:
        np.testing.assert_allclose(np.asarray(live[k]),
                                   np.asarray(cached[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)

    # second attach of the same batch: pure hits, same features
    feats2 = cache.attach(batch, state.params, n_in)
    assert cache.hits == 2 * n_in
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(feats2))


def test_cached_step_matches_live_loss(setup):
    cfg, batch, model, tx, state = setup
    n_in = int(cfg.data.input_images)
    res = int(cfg.data.training_resolution)
    step = jax.jit(make_train_step(cfg, model, tx))

    b = jax.tree_util.tree_map(jnp.asarray, batch)
    _, m_live = step(state, b)

    cache = DeviceVAECache(make_feature_fn(model), capacity=8,
                           img_h=res, img_w=res, dtype=jnp.float32)
    b_cached = dict(b)
    b_cached["vae_features"] = cache.attach(batch, state.params, n_in)
    _, m_cached = step(state, b_cached)
    np.testing.assert_allclose(float(m_live["loss"]),
                               float(m_cached["loss"]), rtol=1e-5)


def test_miss_batches_are_bucketed():
    """The extractor must only ever see power-of-two batch shapes so the
    tunneled TPU compiles once per bucket, not per distinct miss count."""
    shapes = []

    def fake_fn(params, images):
        shapes.append(images.shape[0])
        return jnp.broadcast_to(
            jnp.mean(images, axis=(1, 2, 3))[:, None, None, None],
            (images.shape[0], 128, 4, 4))

    cache = DeviceVAECache(fake_fn, capacity=64, img_h=4, img_w=4,
                           dtype=jnp.float32)

    def batch_of(seed, b, v):
        r = np.random.default_rng(seed)
        return {"gt_images": r.uniform(0, 1, (b, v, 3, 4, 4))
                .astype(np.float32)}

    cache.attach(batch_of(1, 3, 1), None, 1)   # 3 misses -> bucket 4
    cache.attach(batch_of(2, 5, 1), None, 1)   # 5 misses -> bucket 8
    cache.attach(batch_of(3, 1, 1), None, 1)   # 1 miss  -> bucket 1
    assert shapes == [4, 8, 1]
    # gathered features still match the un-padded extractor outputs
    b = batch_of(1, 3, 1)
    out = np.asarray(cache.attach(b, None, 1))
    exp = b["gt_images"][:, 0].mean(axis=(1, 2, 3))
    np.testing.assert_allclose(out[:, 0, 0, 0, 0], exp, rtol=1e-6)


def test_host_spill_tier():
    """L1-evicted entries spill to host RAM and re-promote as L2 hits
    (bit-identical features, no extra extractor calls)."""
    calls = []

    def fake_fn(params, images):
        calls.append(images.shape[0])
        return jnp.broadcast_to(
            jnp.mean(images, axis=(1, 2, 3))[:, None, None, None],
            (images.shape[0], 128, 4, 4))

    cache = DeviceVAECache(fake_fn, capacity=2, img_h=4, img_w=4,
                           dtype=jnp.float32, host_capacity=8)

    def batch_of(seed):
        r = np.random.default_rng(seed)
        return {"gt_images": r.uniform(0, 1, (1, 1, 3, 4, 4))
                .astype(np.float32)}

    f1 = np.asarray(cache.attach(batch_of(1), None, 1))  # miss
    cache.attach(batch_of(2), None, 1)                   # miss (L1 full)
    cache.attach(batch_of(3), None, 1)                   # miss, spills 1
    assert len(cache.host) == 1
    n_calls = len(calls)
    f1b = np.asarray(cache.attach(batch_of(1), None, 1))  # L2 hit
    assert cache.l2_hits == 1 and len(calls) == n_calls
    np.testing.assert_array_equal(f1, f1b)
    # the re-promotion itself spilled another entry; hit-rate counts L2
    assert cache.hit_rate == pytest.approx(1 / 4)


def test_bf16_buffer_tolerance(setup):
    """Default bf16 buffer: features match the live float32 path to
    bf16 quantization tolerance (the exactness claim is fp32-only)."""
    cfg, batch, model, _, state = setup
    n_in = int(cfg.data.input_images)
    res = int(cfg.data.training_resolution)
    cache = DeviceVAECache(make_feature_fn(model), capacity=8,
                           img_h=res, img_w=res)  # default bf16
    feats = np.asarray(cache.attach(batch, state.params, n_in),
                       dtype=np.float32)
    live = np.asarray(make_feature_fn(model)(
        state.params, jnp.asarray(
            batch["gt_images"][:, :n_in].reshape(-1, 3, res, res))))
    live = live.reshape(feats.shape)
    denom = np.abs(live).max() + 1e-8
    assert np.abs(feats - live).max() / denom < 1e-2


def test_lru_eviction():
    fn_calls = []

    def fake_fn(params, images):
        fn_calls.append(images.shape[0])
        return jnp.ones((images.shape[0], 128, 4, 4))

    cache = DeviceVAECache(fake_fn, capacity=2, img_h=4, img_w=4)
    rng = np.random.default_rng(0)

    def batch_of(seed):
        r = np.random.default_rng(seed)
        return {"gt_images": r.uniform(0, 1, (1, 1, 3, 4, 4))
                .astype(np.float32)}

    cache.attach(batch_of(1), None, 1)   # miss -> slot
    cache.attach(batch_of(2), None, 1)   # miss -> slot (full)
    cache.attach(batch_of(1), None, 1)   # hit, refreshes LRU order
    cache.attach(batch_of(3), None, 1)   # miss -> evicts 2
    cache.attach(batch_of(1), None, 1)   # still a hit
    cache.attach(batch_of(2), None, 1)   # was evicted -> miss
    assert cache.misses == 4 and cache.hits == 2
    assert len(cache.slots) == 2
