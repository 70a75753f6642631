"""Tests for the downstream loss zoo and optimizer factories."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unipre3d_tpu.utils import losses_seg as L


class TestSegLosses:
    def setup_method(self, m):
        rng = np.random.default_rng(0)
        self.logits = jnp.asarray(rng.normal(size=(64, 5)).astype(np.float32))
        self.labels = jnp.asarray(rng.integers(0, 5, 64))

    def test_ce_matches_manual(self):
        ce = float(L.cross_entropy(self.logits, self.labels))
        logp = np.asarray(jax.nn.log_softmax(self.logits))
        ref = -np.mean(logp[np.arange(64), np.asarray(self.labels)])
        assert abs(ce - ref) < 1e-5

    def test_ce_ignore_index(self):
        labels = self.labels.at[:32].set(-1)
        ce = float(L.cross_entropy(self.logits, labels))
        ce_half = float(L.cross_entropy(self.logits[32:], labels[32:]))
        assert abs(ce - ce_half) < 1e-5

    def test_smoothing_reduces_confident_gradient(self):
        onehot_logits = jax.nn.one_hot(self.labels, 5) * 20.0
        plain = float(L.cross_entropy(onehot_logits, self.labels))
        smooth = float(L.cross_entropy(onehot_logits, self.labels,
                                       label_smoothing=0.2))
        assert smooth > plain

    def test_focal_and_dice_finite_and_positive(self):
        for fn in (L.focal_loss, L.dice_loss):
            v = float(fn(self.logits, self.labels))
            assert np.isfinite(v) and v > 0

    def test_lovasz_perfect_prediction_near_zero(self):
        logits = jax.nn.one_hot(self.labels, 5) * 30.0
        v = float(L.lovasz_softmax(logits, self.labels))
        assert v < 1e-3
        bad = float(L.lovasz_softmax(-logits, self.labels))
        assert bad > v + 0.1

    def test_all_differentiable(self):
        for fn in (L.cross_entropy, L.focal_loss, L.dice_loss,
                   L.lovasz_softmax):
            g = jax.grad(lambda x: fn(x, self.labels))(self.logits)
            assert np.isfinite(np.asarray(g)).all(), fn.__name__


class TestOptimFactory:
    def test_all_optimizers_step(self):
        from unipre3d_tpu.training.optim_factory import (_OPTIMIZERS,
                                                         build_optimizer,
                                                         make_schedule)
        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        for name in _OPTIMIZERS:
            sched = make_schedule("cosine", 1e-3, total_steps=100,
                                  warmup_steps=10)
            tx = build_optimizer(name, sched, grad_clip=1.0, params=params)
            st = tx.init(params)
            up, st = tx.update(g, st, params)
            new = jax.tree_util.tree_map(lambda p, u: p + u, params, up)
            for x in jax.tree_util.tree_leaves(new):
                assert np.isfinite(np.asarray(x)).all(), name

    @pytest.mark.parametrize("name", ["cosine", "step", "multistep",
                                      "poly", "linear", "constant", "tanh"])
    def test_schedules(self, name):
        from unipre3d_tpu.training.optim_factory import make_schedule
        f = make_schedule(name, 1e-3, total_steps=100, milestones=[50],
                          warmup_steps=5)
        vals = [float(f(i)) for i in (0, 5, 50, 99)]
        assert all(np.isfinite(v) for v in vals)
        assert vals[1] == pytest.approx(1e-3, rel=1e-5)
