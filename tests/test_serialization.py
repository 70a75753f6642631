"""Tests for space-filling-curve serialization codes."""

import numpy as np
import jax.numpy as jnp
import pytest

from unipre3d_tpu.ops import serialization as ser


class TestZOrder:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        g = rng.integers(0, 1 << 10, size=(100, 3)).astype(np.int32)
        code = ser.z_order_encode(jnp.asarray(g), depth=10)
        back = np.asarray(ser.z_order_decode(code, depth=10))
        np.testing.assert_array_equal(back, g)

    def test_known_values(self):
        # x=1,y=0,z=0 -> bit at position 2 (x most significant of triple)
        g = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]])
        code = np.asarray(ser.z_order_encode(g, depth=4))
        np.testing.assert_array_equal(code, [4, 2, 1, 7])

    def test_locality(self):
        # adjacent voxels differ less in code than far ones, on average
        g = np.stack(np.meshgrid(*[np.arange(8)] * 3, indexing="ij"),
                     axis=-1).reshape(-1, 3)
        code = np.asarray(ser.z_order_encode(jnp.asarray(g), depth=3))
        assert len(np.unique(code)) == 512  # bijective on the cube

    def test_trans_swaps_xy(self):
        g = jnp.asarray([[3, 1, 0]])
        a = np.asarray(ser.encode(g, "z", depth=4))
        b = np.asarray(ser.encode(jnp.asarray([[1, 3, 0]]), "z-trans", depth=4))
        np.testing.assert_array_equal(a, b)


class TestHilbert:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        g = rng.integers(0, 1 << 8, size=(200, 3)).astype(np.int32)
        code = ser.hilbert_encode(jnp.asarray(g), depth=8)
        back = np.asarray(ser.hilbert_decode(code, depth=8))
        np.testing.assert_array_equal(back, g)

    def test_bijective_on_cube(self):
        g = np.stack(np.meshgrid(*[np.arange(8)] * 3, indexing="ij"),
                     axis=-1).reshape(-1, 3)
        code = np.asarray(ser.hilbert_encode(jnp.asarray(g), depth=3))
        assert len(np.unique(code)) == 512
        assert code.max() == 511

    def test_continuity(self):
        """Consecutive Hilbert indices are adjacent voxels (the defining
        property; z-order does NOT have it)."""
        g = np.stack(np.meshgrid(*[np.arange(8)] * 3, indexing="ij"),
                     axis=-1).reshape(-1, 3)
        code = np.asarray(ser.hilbert_encode(jnp.asarray(g), depth=3))
        order = np.argsort(code)
        sorted_coords = g[order]
        steps = np.abs(np.diff(sorted_coords.astype(int), axis=0)).sum(axis=1)
        assert (steps == 1).all()


class TestOrders:
    @pytest.mark.parametrize("order", ser.ORDERS)
    def test_all_orders_bijective(self, order):
        g = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing="ij"),
                     axis=-1).reshape(-1, 3)
        code = np.asarray(ser.encode(jnp.asarray(g), order, depth=4))
        assert len(np.unique(code)) == 64

    def test_axis_order_lexicographic(self):
        g = jnp.asarray([[0, 0, 1], [0, 1, 0], [1, 0, 0]])
        xyz = np.asarray(ser.encode(g, "xyz", depth=4))
        assert xyz[0] < xyz[1] < xyz[2]
        zyx = np.asarray(ser.encode(g, "zyx", depth=4))
        assert zyx[2] < zyx[1] < zyx[0]

    def test_grid_coord_from_points(self):
        pts = jnp.asarray([[[0.0, 0.0, 0.0], [0.05, 0.0, 0.0],
                            [0.0, 0.11, 0.0]]])
        g = np.asarray(ser.grid_coord_from_points(pts, 0.1, depth=4))
        np.testing.assert_array_equal(g[0, 0], [0, 0, 0])
        np.testing.assert_array_equal(g[0, 1], [0, 0, 0])
        np.testing.assert_array_equal(g[0, 2], [0, 1, 0])
