"""Tests for Chamfer/EMD and the ragged (offset-based) point ops."""

import jax
import jax.numpy as jnp
import numpy as np

from unipre3d_tpu.ops.losses3d import chamfer_distance, chamfer_loss, emd_approx
from unipre3d_tpu.ops import pointops_ragged as po


class TestChamferEMD:
    def test_chamfer_zero_for_identical(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 3)).astype(np.float32))
        d1, d2 = chamfer_distance(x, x)
        np.testing.assert_allclose(np.asarray(d1), 0, atol=1e-5)
        assert float(chamfer_loss(x, x)) < 1e-5

    def test_chamfer_matches_bruteforce(self):
        rng = np.random.default_rng(1)
        a = rng.uniform(-1, 1, (1, 32, 3)).astype(np.float32)
        b = rng.uniform(-1, 1, (1, 48, 3)).astype(np.float32)
        d1, d2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
        ref1 = np.min(((a[0][:, None] - b[0][None]) ** 2).sum(-1), axis=1)
        np.testing.assert_allclose(np.asarray(d1[0]), ref1, rtol=1e-4,
                                   atol=1e-5)

    def test_chamfer_gradient(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.uniform(-1, 1, (1, 16, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, (1, 16, 3)).astype(np.float32))
        g = jax.grad(lambda x: chamfer_loss(x, b))(a)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_emd_identity_near_zero_and_permutation_invariant(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(-1, 1, (1, 32, 3)).astype(np.float32)
        e_self = float(emd_approx(jnp.asarray(x), jnp.asarray(x))[0])
        perm = rng.permutation(32)
        e_perm = float(emd_approx(jnp.asarray(x),
                                  jnp.asarray(x[:, perm]))[0])
        y = rng.uniform(-1, 1, (1, 32, 3)).astype(np.float32)
        e_other = float(emd_approx(jnp.asarray(x), jnp.asarray(y))[0])
        assert e_self < 0.05
        assert abs(e_perm - e_self) < 0.02
        assert e_other > e_self + 0.05


class TestRaggedOps:
    def setup_method(self, m):
        rng = np.random.default_rng(0)
        # two scenes: 40 + 60 points
        self.a = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
        self.b = rng.uniform(5, 7, (60, 3)).astype(np.float32)
        self.pts = jnp.asarray(np.concatenate([self.a, self.b]))
        self.offset = jnp.asarray([40, 100], dtype=jnp.int32)

    def test_offset2batch(self):
        batch = np.asarray(po.offset2batch(self.offset, 100))
        assert (batch[:40] == 0).all() and (batch[40:] == 1).all()

    def test_knn_never_crosses_scenes(self):
        idx, dist = po.knn_query(4, self.pts, self.offset, self.pts,
                                 self.offset)
        idx = np.asarray(idx)
        assert (idx[:40] < 40).all()
        assert (idx[40:] >= 40).all()
        # self is the nearest neighbor
        np.testing.assert_array_equal(idx[:, 0], np.arange(100))

    def test_ball_query_radius(self):
        idx = np.asarray(po.ball_query(0.5, 8, self.pts, self.offset,
                                       self.pts, self.offset))
        pts = np.asarray(self.pts)
        for i in [0, 10, 50, 99]:
            d = np.sqrt(((pts[idx[i]] - pts[i]) ** 2).sum(-1))
            assert (d < 0.5 + 1e-5).all()

    def test_interpolation_constant_field(self):
        feats = jnp.ones((100, 5))
        out = po.interpolation(self.pts, self.offset, self.pts, self.offset,
                               feats)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)

    def test_ragged_fps(self):
        new_offset = jnp.asarray([16, 32], dtype=jnp.int32)
        idx = np.asarray(po.farthest_point_sampling(
            self.pts, self.offset, new_offset, 16))
        assert idx.shape == (2, 16)
        assert (idx[0] < 40).all()
        assert (idx[1] >= 40).all() and (idx[1] < 100).all()
        assert len(np.unique(idx[0])) == 16
