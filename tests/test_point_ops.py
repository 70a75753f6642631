"""Tests for point ops against pure-numpy references (the reference repo's
CUDA-vs-ref test pattern, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from unipre3d_tpu.ops import point_ops as po


def np_fps(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """Sequential reference FPS, seeded at index 0 like the CUDA kernel."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        dist = np.full(N, 1e10)
        last = 0
        for i in range(1, npoint):
            d = np.sum((xyz[b] - xyz[b, last]) ** 2, axis=-1)
            dist = np.minimum(dist, d)
            last = int(np.argmax(dist))
            out[b, i] = last
    return out


def np_ball_query(radius, nsample, support, query):
    B, N, _ = support.shape
    M = query.shape[1]
    idx = np.zeros((B, M, nsample), dtype=np.int32)
    for b in range(B):
        for m in range(M):
            cnt = 0
            for k in range(N):
                d2 = np.sum((support[b, k] - query[b, m]) ** 2)
                if d2 < radius * radius:
                    if cnt == 0:
                        idx[b, m, :] = k
                    idx[b, m, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


class TestFPS:
    def test_matches_sequential_reference(self):
        rng = np.random.default_rng(0)
        xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
        ours = np.asarray(po.furthest_point_sample(jnp.asarray(xyz), 16))
        ref = np_fps(xyz, 16)
        np.testing.assert_array_equal(ours, ref)

    def test_first_index_zero_and_unique(self):
        rng = np.random.default_rng(1)
        xyz = rng.uniform(size=(3, 128, 3)).astype(np.float32)
        idx = np.asarray(po.furthest_point_sample(jnp.asarray(xyz), 32))
        assert (idx[:, 0] == 0).all()
        for b in range(3):
            assert len(set(idx[b].tolist())) == 32

    def test_spreads_points(self):
        # FPS of a two-cluster cloud must pick from both clusters early
        rng = np.random.default_rng(2)
        a = rng.normal(size=(1, 50, 3)) * 0.01
        b = rng.normal(size=(1, 50, 3)) * 0.01 + 10.0
        xyz = np.concatenate([a, b], axis=1).astype(np.float32)
        idx = np.asarray(po.furthest_point_sample(jnp.asarray(xyz), 2))[0]
        assert (idx[0] < 50) != (idx[1] < 50)


class TestBallQuery:
    def test_matches_cuda_semantics(self):
        rng = np.random.default_rng(0)
        support = rng.uniform(size=(2, 40, 3)).astype(np.float32)
        query = support[:, ::5]
        # pick a radius not adjacent to any pairwise distance so float
        # formula differences (expanded vs direct) cannot flip membership
        d2_all = ((query[:, :, None] - support[:, None]) ** 2).sum(-1)
        r2 = 0.09
        gap = np.abs(d2_all - r2)
        r2_safe = r2 if gap.min() > 1e-4 else (r2 + 2e-4)
        radius = float(np.sqrt(r2_safe))
        ours = np.asarray(po.ball_query(radius, 8, jnp.asarray(support),
                                        jnp.asarray(query)))
        ref = np_ball_query(radius, 8, support, query)
        np.testing.assert_array_equal(ours, ref)

    def test_empty_ball_gives_zero(self):
        support = np.ones((1, 10, 3), dtype=np.float32) * 100
        query = np.zeros((1, 1, 3), dtype=np.float32)
        idx = np.asarray(po.ball_query(0.5, 4, jnp.asarray(support),
                                       jnp.asarray(query)))
        np.testing.assert_array_equal(idx, 0)


class TestKNNGroupInterp:
    def test_knn_sorted_and_correct(self):
        rng = np.random.default_rng(0)
        support = rng.normal(size=(2, 30, 3)).astype(np.float32)
        query = rng.normal(size=(2, 7, 3)).astype(np.float32)
        d, idx = po.knn(jnp.asarray(query), jnp.asarray(support), 5)
        d, idx = np.asarray(d), np.asarray(idx)
        full = ((query[:, :, None] - support[:, None]) ** 2).sum(-1)
        ref_idx = np.argsort(full, axis=-1)[..., :5]
        # distances must match the 5 smallest (order may tie-break differently)
        np.testing.assert_allclose(np.sort(d, -1),
                                   np.sort(np.take_along_axis(full, ref_idx, -1), -1),
                                   rtol=1e-4, atol=1e-5)
        assert (np.diff(d, axis=-1) >= -1e-6).all()

    def test_index_points_gather(self):
        pts = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
        idx = jnp.asarray([[4, 0], [1, 1]])
        out = np.asarray(po.index_points(pts, idx))
        np.testing.assert_allclose(out[0, 0], np.arange(12, 15))
        np.testing.assert_allclose(out[1, 1], np.arange(18, 21))

    def test_three_interpolate_exact_on_support(self):
        # query exactly at a support point -> weight collapses to that point
        rng = np.random.default_rng(0)
        support = rng.normal(size=(1, 20, 3)).astype(np.float32)
        feats = rng.normal(size=(1, 20, 8)).astype(np.float32)
        query = support[:, 3:4]
        d, idx = po.three_nn(jnp.asarray(query), jnp.asarray(support))
        out = np.asarray(po.three_interpolate(jnp.asarray(feats), idx, d))
        np.testing.assert_allclose(out[0, 0], feats[0, 3], rtol=1e-4, atol=1e-4)

    def test_subsample_group_shapes_and_relative(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(size=(2, 256, 3)).astype(np.float32)
        nbr, centers = po.subsample_group(jnp.asarray(pts), 32, 16, radius=0.2)
        assert nbr.shape == (2, 32, 16, 3)
        assert centers.shape == (2, 32, 3)
        # each group's first member is within radius of center (if any found)
        assert float(jnp.abs(nbr).max()) < 2.0


class TestGradients:
    def test_grouping_gradient_flows(self):
        import jax
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(1, 10, 4)).astype(np.float32))
        idx = jnp.asarray([[[0, 1], [2, 2]]])

        def f(p):
            return po.group_points(p, idx).sum()

        g = jax.grad(f)(pts)
        # index 2 appears twice -> grad 2, indices 0,1 once, others 0
        np.testing.assert_allclose(np.asarray(g)[0, 2], 2.0)
        np.testing.assert_allclose(np.asarray(g)[0, 0], 1.0)
        np.testing.assert_allclose(np.asarray(g)[0, 5], 0.0)
