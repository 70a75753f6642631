"""Multi-chip numerics parity on the virtual 8-device CPU mesh.

The reference guarantees gradient-allreduce correctness by construction
via DDP (reference pointcept/engines/launch.py:89-151); the GSPMD
equivalent here (batch sharded over ``data``, optional Megatron TP over
``model``) must be asserted, not assumed: an 8-device sharded train
step must reproduce the single-device step, TP must change nothing but
the layout, TP_RULES must actually match parameter paths, and the
loader's shard partition must be disjoint and exhaustive
(≙ DistributedSampler, reference train_network.py:55-64).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _synthetic_batch, _tiny_cfg
from unipre3d_tpu.parallel import (make_mesh, replicate, shard_batch,
                                   tp_matched_paths)
from unipre3d_tpu.training.trainer import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provision 8 devices"
    cfg = _tiny_cfg(res=32, batch=8)
    batch = _synthetic_batch(cfg, batch=8, n_points=64, n_views=2)
    rng = jax.random.PRNGKey(0)
    model, tx, state = create_train_state(cfg, rng, batch)
    step = jax.jit(make_train_step(cfg, model, tx))
    return cfg, batch, state, step


def _run(step, state, batch, mesh=None, model_parallel=1):
    if mesh is not None:
        state = replicate(state, mesh,
                          require_tp_match=model_parallel > 1)
        b = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    else:
        b = {k: jnp.asarray(v) for k, v in batch.items()}
    new_state, metrics = step(state, b)
    return (float(metrics["loss"]), float(metrics["grad_norm"]),
            new_state)


def test_dp_matches_single_device(setup):
    """(a) 8-way DP loss + grad-norm == single-device within 1e-5."""
    cfg, batch, state, step = setup
    loss_1, gn_1, st_1 = _run(step, state, batch)
    mesh = make_mesh(8)
    loss_dp, gn_dp, st_dp = _run(step, state, batch, mesh)
    assert abs(loss_dp - loss_1) / (abs(loss_1) + 1e-12) < 1e-5
    assert abs(gn_dp - gn_1) / (abs(gn_1) + 1e-12) < 1e-4
    # updated params agree too (the allreduce feeds the optimizer).
    # AdamW(eps=1e-15) makes the first-step update ±lr elementwise, so
    # near-zero grads can sign-flip under reduction reordering; a
    # MISSING allreduce would shift a large share of entries by ~lr,
    # so assert the mean divergence is a small fraction of lr instead
    # of elementwise equality.
    lr = float(cfg.opt.base_lr)
    p1 = jax.tree_util.tree_leaves(st_1.params)
    pdp = jax.tree_util.tree_leaves(st_dp.params)
    num = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(p1, pdp))
    den = sum(a.size for a in p1)
    assert num / den < 0.02 * lr, (num / den, lr)


def test_dp_tp_matches_dp(setup):
    """(b) DP×TP (4×2) == pure DP within 1e-4."""
    cfg, batch, state, step = setup
    loss_dp, gn_dp, _ = _run(step, state, batch, make_mesh(8))
    mesh2 = make_mesh(8, model_parallel=2)
    loss_tp, gn_tp, _ = _run(step, state, batch, mesh2, model_parallel=2)
    assert abs(loss_tp - loss_dp) / (abs(loss_dp) + 1e-12) < 1e-4
    assert abs(gn_tp - gn_dp) / (abs(gn_dp) + 1e-12) < 1e-3


def test_tp_rules_match_real_params(setup):
    """(c) TP_RULES must match the actual transformer parameter paths —
    a module rename that silently replicates everything is an error."""
    cfg, batch, state, step = setup
    hits = tp_matched_paths(state.params)
    assert len(hits) >= 8, hits  # qkv/proj/fc1/fc2 across 16 blocks
    assert any("qkv" in h for h in hits)
    assert any("fc2" in h for h in hits)


def test_replicate_raises_without_tp_match():
    mesh = make_mesh(8, model_parallel=2)
    fake_params = {"renamed_module": {"kernel": jnp.ones((4, 4))}}
    with pytest.raises(ValueError, match="TP_RULES"):
        replicate(fake_params, mesh, require_tp_match=True)


def test_loader_shard_partition():
    """(d) shard_id/num_shards partition: disjoint per epoch, exhaustive
    over the dataset, equal batch counts per shard."""
    from unipre3d_tpu.data.loader import Loader

    class Ds:
        def __len__(self):
            return 37

        def __getitem__(self, i):
            return {"x": np.asarray([i], np.int64)}

    n_shards = 4
    seen = []
    for sid in range(n_shards):
        ld = Loader(Ds(), batch_size=2, shuffle=True, seed=3,
                    shard_id=sid, num_shards=n_shards, drop_last=False,
                    num_workers=1)
        idx = ld._epoch_indices(epoch=5)
        seen.append(set(int(i) for i in idx))
    # same-length shards (padded like DistributedSampler)
    per = -(-37 // n_shards)
    for s in range(n_shards):
        assert len(Loader(Ds(), 2, True, 3, s, n_shards,
                          num_workers=1)._epoch_indices(5)) == per
    # exhaustive: union covers every example
    union = set().union(*seen)
    assert union == set(range(37))
    # disjoint up to the DistributedSampler-style pad: 37 examples in
    # 40 slots resamples exactly 3, so at most 3 examples may appear in
    # more than one shard
    d = _dup_count(seen)
    assert sum(len(s) for s in seen) == 37 + d
    assert d <= per * n_shards - 37


def _dup_count(shard_sets):
    from collections import Counter
    c = Counter()
    for s in shard_sets:
        c.update(s)
    return sum(v - 1 for v in c.values())
