"""Pallas splat kernels vs the XLA reference (interpret mode on CPU).

Both kernels (streaming v1 and binned duplicate-sort v2) must reproduce
the uncapped brute-force renderer bit-near in forward AND in analytic
backward (the `*_ref` tolerance pattern of SURVEY.md §4).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unipre3d_tpu.ops.rasterizer.pallas_splat import \
    rasterize_projected_pallas
from unipre3d_tpu.ops.rasterizer.pallas_splat_binned import \
    rasterize_projected_pallas_binned
from unipre3d_tpu.ops.rasterizer.preprocess import preprocess_gaussians
from unipre3d_tpu.ops.rasterizer.render import rasterize_projected_reference
from unipre3d_tpu.utils import camera as cam
from unipre3d_tpu.utils.sh import rgb2sh

FOV = math.radians(49.13)
RES = 32


def setup(n=200, seed=1, scale=0.015):
    rng = np.random.default_rng(seed)
    c = cam.build_camera_tensors(np.eye(3), np.array([0.0, 0.0, 1.5]),
                                 FOV, FOV, 0.5, 2.0)
    wv = jnp.asarray(c["world_view_transform"])
    fp = jnp.asarray(c["full_proj_transform"])
    cc = jnp.asarray(c["camera_center"])
    means = jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32))
    opa = jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32))
    scales = jnp.asarray(
        rng.uniform(0.5, 1.5, (n, 3)).astype(np.float32) * scale)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    shs = jnp.zeros((n, 4, 3)).at[:, 0].set(
        rgb2sh(jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))))
    return (means, opa, scales, jnp.asarray(q), shs), (wv, fp, cc)


def prep(params, cams):
    return preprocess_gaussians(*params, *cams, RES, RES,
                                math.tan(FOV / 2), math.tan(FOV / 2), 1)


BG = jnp.asarray([0.1, 0.2, 0.3])

KERNELS = {
    "v1_stream": lambda pg: rasterize_projected_pallas(
        pg, BG, RES, RES, tile_h=8, tile_w=8),
    "v2_binned": lambda pg: rasterize_projected_pallas_binned(
        pg, BG, RES, RES, tile_h=8, tile_w=8),
}


@pytest.mark.parametrize("name", list(KERNELS))
def test_forward_matches_reference(name):
    params, cams = setup()
    pg = prep(params, cams)
    ref = rasterize_projected_reference(pg, BG, RES, RES)
    out = KERNELS[name](pg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("name", list(KERNELS))
def test_backward_matches_autodiff(name):
    params, cams = setup(n=128)
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(0, 1, (3, RES, RES)).astype(np.float32))

    def loss(render_fn, *p):
        return jnp.sum((render_fn(prep(p, cams)) - tgt) ** 2)

    g_ref = jax.grad(
        lambda *p: loss(lambda pg: rasterize_projected_reference(
            pg, BG, RES, RES), *p), argnums=tuple(range(5)))(*params)
    g_pal = jax.grad(lambda *p: loss(KERNELS[name], *p),
                     argnums=tuple(range(5)))(*params)
    for i, nm in enumerate(["means", "opa", "scales", "rots", "shs"]):
        a, b = np.asarray(g_ref[i]), np.asarray(g_pal[i])
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / denom < 1e-4, (name, nm)


def test_binned_handles_masked_and_empty_tiles():
    params, cams = setup(n=64, scale=0.01)
    means, opa, scales, rots, shs = params
    # push half the gaussians off into a corner, mask a quarter
    means = means.at[:32, :2].add(0.25)
    pg = prep((means, opa, scales, rots, shs), cams)
    mask = jnp.arange(64) % 4 != 0
    pg = pg._replace(valid=pg.valid & mask,
                     opacity=jnp.where(mask, pg.opacity, 0.0))
    ref = rasterize_projected_reference(pg, BG, RES, RES)
    out = rasterize_projected_pallas_binned(pg, BG, RES, RES,
                                            tile_h=8, tile_w=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_binned_large_radius_span():
    """Gaussians spanning many tiles must match the reference at the
    DEFAULT settings — full-span duplication within the static budget
    (round-2 VERDICT #5; CUDA duplicates across the full span,
    forward.cu duplicateWithKeys)."""
    # radius >> 8px tiles => spans 3-4 tiles in each direction
    params, cams = setup(n=48, scale=0.12)
    pg = prep(params, cams)
    assert int(np.asarray(pg.radius).max()) > 12  # bbox spans >2 tiles of 8px
    ref = rasterize_projected_reference(pg, BG, RES, RES)
    out = rasterize_projected_pallas_binned(pg, BG, RES, RES,
                                            tile_h=8, tile_w=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4)


def test_binned_budget_overflow_is_bounded():
    """A too-small duplicate budget drops overflow duplicates but must
    never alias real tiles (out-of-span rank guard): the image stays a
    partial composite, bounded by the reference + background."""
    params, cams = setup(n=64, scale=0.12)
    pg = prep(params, cams)
    out = rasterize_projected_pallas_binned(pg, BG, RES, RES,
                                            tile_h=8, tile_w=8,
                                            dup_budget=64)
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    assert arr.min() >= 0.0 and arr.max() <= 1.5


def test_binned_large_radius_grads():
    params, cams = setup(n=32, scale=0.12)
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(0, 1, (3, RES, RES)).astype(np.float32))

    def loss(render_fn, *p):
        return jnp.sum((render_fn(prep(p, cams)) - tgt) ** 2)

    g_ref = jax.grad(
        lambda *p: loss(lambda pg: rasterize_projected_reference(
            pg, BG, RES, RES), *p), argnums=tuple(range(5)))(*params)
    g_pal = jax.grad(
        lambda *p: loss(lambda pg: rasterize_projected_pallas_binned(
            pg, BG, RES, RES, tile_h=8, tile_w=8), *p),
        argnums=tuple(range(5)))(*params)
    for i, nm in enumerate(["means", "opa", "scales", "rots", "shs"]):
        a, b = np.asarray(g_ref[i]), np.asarray(g_pal[i])
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / denom < 1e-3, nm
