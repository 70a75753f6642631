"""Tests for the static-shape sparse voxel ops (spconv equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unipre3d_tpu.ops import sparse as sp


def random_voxels(rng, n_valid, capacity, n_feat=4, extent=12):
    """Unique random voxels, canonicalized."""
    coords = set()
    while len(coords) < n_valid:
        coords.add(tuple(rng.integers(0, extent, 3)))
    coords = np.asarray(sorted(coords), dtype=np.int32)[:n_valid]
    rng.shuffle(coords)
    pad = capacity - n_valid
    coords_p = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    feats = rng.normal(size=(capacity, n_feat)).astype(np.float32)
    mask = np.concatenate([np.ones(n_valid, bool), np.zeros(pad, bool)])
    feats[~mask] = 0.0
    sv, _ = sp.canonicalize(jnp.asarray(coords_p), jnp.asarray(feats),
                            jnp.asarray(mask))
    return sv


class TestNeighborsAndSubMConv:
    def test_find_neighbors_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        sv = random_voxels(rng, 40, 64)
        offs = sp.kernel_offsets(3)
        nbr = np.asarray(sp.find_neighbors(sv, offs))
        coords = np.asarray(sv.coords)
        mask = np.asarray(sv.mask)
        lut = {tuple(coords[i]): i for i in range(64) if mask[i]}
        for i in range(64):
            for k, d in enumerate(offs):
                if not mask[i]:
                    assert nbr[i, k] == -1
                    continue
                tgt = tuple(coords[i] + d)
                expect = lut.get(tgt, -1)
                assert nbr[i, k] == expect, (i, k, tgt)

    def test_subm_conv_matches_dense_conv(self):
        """Submanifold conv == dense 3D conv evaluated at occupied sites
        (masked to occupied inputs)."""
        rng = np.random.default_rng(1)
        sv = random_voxels(rng, 30, 48, n_feat=5, extent=8)
        offs = sp.kernel_offsets(3)
        W = rng.normal(size=(27, 5, 7)).astype(np.float32) * 0.1
        nbr = sp.find_neighbors(sv, offs)
        out = np.asarray(sp.subm_gather_matmul(sv.feats, nbr, jnp.asarray(W)))

        coords = np.asarray(sv.coords)
        mask = np.asarray(sv.mask)
        dense = np.zeros((8, 8, 8, 5), np.float32)
        for i in range(48):
            if mask[i]:
                dense[tuple(coords[i])] = np.asarray(sv.feats)[i]
        for i in range(48):
            if not mask[i]:
                continue
            acc = np.zeros(7, np.float32)
            for k, d in enumerate(offs):
                t = coords[i] + d
                if (t >= 0).all() and (t < 8).all():
                    acc += dense[tuple(t)] @ W[k]
            np.testing.assert_allclose(out[i], acc, atol=1e-4)


class TestDownUp:
    def test_downsample_unique_parents(self):
        rng = np.random.default_rng(2)
        sv = random_voxels(rng, 50, 64, extent=10)
        W = jnp.asarray(np.tile(np.eye(4, dtype=np.float32)[None], (8, 1, 1)))
        down = sp.downsample(sv, W, capacity_out=64)
        coords = np.asarray(sv.coords)
        mask = np.asarray(sv.mask)
        parents = {tuple(coords[i] >> 1) for i in range(64) if mask[i]}
        out_c = np.asarray(down.sv.coords)
        out_m = np.asarray(down.sv.mask)
        got = {tuple(out_c[i]) for i in range(64) if out_m[i]}
        assert got == parents
        # identity weights -> parent feature = sum of child features
        sums = {}
        for i in range(64):
            if mask[i]:
                p = tuple(coords[i] >> 1)
                sums[p] = sums.get(p, 0) + np.asarray(sv.feats)[i]
        for i in range(64):
            if out_m[i]:
                np.testing.assert_allclose(np.asarray(down.sv.feats)[i],
                                           sums[tuple(out_c[i])], atol=1e-5)

    def test_parent_idx_roundtrip(self):
        rng = np.random.default_rng(3)
        sv = random_voxels(rng, 40, 48, extent=10)
        W = jnp.asarray(np.tile(np.eye(4, dtype=np.float32)[None], (8, 1, 1)))
        down = sp.downsample(sv, W, capacity_out=48)
        pi = np.asarray(down.parent_idx)
        coords = np.asarray(sv.coords)
        mask = np.asarray(sv.mask)
        out_c = np.asarray(down.sv.coords)
        for i in range(48):
            if mask[i]:
                assert pi[i] >= 0
                np.testing.assert_array_equal(out_c[pi[i]], coords[i] >> 1)
            else:
                assert pi[i] == -1

    def test_inverse_conv_gathers_parent(self):
        rng = np.random.default_rng(4)
        sv = random_voxels(rng, 40, 48, extent=10)
        Wd = jnp.asarray(np.tile(np.eye(4, dtype=np.float32)[None],
                                 (8, 1, 1)))
        down = sp.downsample(sv, Wd, capacity_out=48)
        # per-slot weight = slot index * I -> output = slot * parent_feat
        Wu = np.stack([k * np.eye(4, dtype=np.float32) for k in range(8)])
        up = np.asarray(sp.inverse_conv(down.parent_idx, down.child_offset,
                                        down.sv.feats, sv.mask,
                                        jnp.asarray(Wu)))
        pf = np.asarray(down.sv.feats)
        pi = np.asarray(down.parent_idx)
        slot = np.asarray(down.child_offset)
        mask = np.asarray(sv.mask)
        for i in range(48):
            if mask[i]:
                np.testing.assert_allclose(up[i], slot[i] * pf[pi[i]],
                                           atol=1e-5)
            else:
                np.testing.assert_allclose(up[i], 0.0)


class TestVoxelize:
    def test_voxelize_dedups(self):
        rng = np.random.default_rng(5)
        pts = rng.uniform(0, 1.0, (100, 3)).astype(np.float32)
        feats = rng.normal(size=(100, 6)).astype(np.float32)
        mask = np.ones(100, bool)
        mask[90:] = False
        min_c = jnp.zeros(3)
        sv, rep, world = sp.voxelize(jnp.asarray(pts), jnp.asarray(feats),
                                     jnp.asarray(mask), 0.25, min_c, 128)
        expect = {tuple((pts[i] / 0.25).astype(int))
                  for i in range(90)}
        out_c = np.asarray(sv.coords)
        out_m = np.asarray(sv.mask)
        got = {tuple(out_c[i]) for i in range(128) if out_m[i]}
        assert got == expect
        # representative feature comes from a point inside that voxel
        rep = np.asarray(rep)
        for i in range(128):
            if out_m[i]:
                j = rep[i]
                assert 0 <= j < 90
                np.testing.assert_array_equal(
                    (pts[j] / 0.25).astype(int), out_c[i])
                np.testing.assert_allclose(np.asarray(sv.feats)[i], feats[j])
                np.testing.assert_allclose(np.asarray(world)[i], pts[j])

    def test_voxelize_capacity_overflow_keeps_mask_consistent(self):
        rng = np.random.default_rng(6)
        pts = rng.uniform(0, 4.0, (200, 3)).astype(np.float32)
        feats = rng.normal(size=(200, 2)).astype(np.float32)
        mask = np.ones(200, bool)
        sv, rep, _ = sp.voxelize(jnp.asarray(pts), jnp.asarray(feats),
                                 jnp.asarray(mask), 0.25, jnp.zeros(3), 16)
        assert int(np.asarray(sv.mask).sum()) == 16


def test_merge_voxel_sets_sorted_with_duplicates():
    rng = np.random.default_rng(7)
    a = random_voxels(rng, 20, 32)
    b = random_voxels(rng, 10, 16)
    merged, _ = sp.merge_voxel_sets(a.coords, a.feats, a.mask,
                                    b.coords, b.feats, b.mask)
    codes = np.asarray(sp.pack_code(merged.coords, merged.mask),
                       dtype=np.uint32)
    assert (np.diff(codes.astype(np.int64)) >= 0).all()
    assert int(np.asarray(merged.mask).sum()) == 30
