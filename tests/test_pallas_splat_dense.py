"""Batched dense Pallas splat vs the brute-force reference.

The dense kernel composites every valid gaussian for every pixel (no
tile-bbox cull), which is exactly the brute-force reference renderer's
semantics — forward and analytic backward must match it bit-near, per
render, across a batch of renders with different gaussians/cameras.

Forward atol is 1e-4: the kernel accumulates transmittance in log
space (exp of a prefix sum of log(1-alpha)), which carries the same
O(N*eps) f32 rounding as the CUDA reference's sequential ``T *= 1 -
alpha`` but rounds differently from the XLA reference's cumprod —
observed worst-case deviation is ~2e-5 on unit-range pixels, orders
below the 0.1 dB PSNR parity bar.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unipre3d_tpu.ops.rasterizer.pallas_splat_dense import \
    rasterize_dense_batched
from unipre3d_tpu.ops.rasterizer.preprocess import preprocess_gaussians
from unipre3d_tpu.ops.rasterizer.render import rasterize_projected_reference
from unipre3d_tpu.utils import camera as cam
from unipre3d_tpu.utils.sh import rgb2sh

FOV = math.radians(49.13)
RES = 32
BG = jnp.asarray([0.1, 0.2, 0.3])


def setup_batch(R=3, n=150, seed=1, scale=0.015):
    rng = np.random.default_rng(seed)
    cams = []
    for r in range(R):
        az = 2 * np.pi * r / max(R, 1)
        Rm = np.array([[math.cos(az), 0, -math.sin(az)], [0, 1, 0],
                       [math.sin(az), 0, math.cos(az)]])
        cams.append(cam.build_camera_tensors(
            Rm, np.array([0.0, 0.0, 1.5]), FOV, FOV, 0.5, 2.0))
    wv = jnp.asarray(np.stack([c["world_view_transform"] for c in cams]))
    fp = jnp.asarray(np.stack([c["full_proj_transform"] for c in cams]))
    cc = jnp.asarray(np.stack([c["camera_center"] for c in cams]))
    means = jnp.asarray(rng.uniform(-0.3, 0.3, (R, n, 3)).astype(np.float32))
    opa = jnp.asarray(rng.uniform(0.3, 0.9, (R, n)).astype(np.float32))
    scales = jnp.asarray(
        rng.uniform(0.5, 1.5, (R, n, 3)).astype(np.float32) * scale)
    q = rng.normal(size=(R, n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    shs = jnp.zeros((R, n, 4, 3)).at[:, :, 0].set(rgb2sh(jnp.asarray(
        rng.uniform(0, 1, (R, n, 3)).astype(np.float32))))
    return (means, opa, scales, jnp.asarray(q), shs), (wv, fp, cc)


def prep_batch(params, cams):
    f = lambda *a: preprocess_gaussians(
        *a, RES, RES, math.tan(FOV / 2), math.tan(FOV / 2), 1)
    return jax.vmap(f)(*params, *cams)


def dense(pg):
    return rasterize_dense_batched(pg.mean2d, pg.conic, pg.color,
                                   pg.opacity, pg.depth, pg.valid,
                                   BG, RES, RES)


def test_forward_matches_reference_per_render():
    params, cams = setup_batch()
    pg = prep_batch(params, cams)
    out = dense(pg)
    ref = jax.vmap(lambda p: rasterize_projected_reference(
        p, BG, RES, RES))(pg)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref).reshape(out.shape), atol=1e-4)


def test_forward_non_multiple_of_128():
    params, cams = setup_batch(R=2, n=97)
    pg = prep_batch(params, cams)
    out = dense(pg)
    ref = jax.vmap(lambda p: rasterize_projected_reference(
        p, BG, RES, RES))(pg)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref).reshape(out.shape), atol=1e-4)


@pytest.mark.parametrize("n", [600, 1024])
def test_multi_chunk_counts(n):
    """Counts whose 128-padding is not a multiple of chunk_n=512 (e.g.
    600 -> 640) must not drop trailing gaussians (round-2 advisor bug:
    n_chunks floored, silently truncating both fwd and bwd)."""
    params, cams = setup_batch(R=2, n=n, seed=4)
    pg = prep_batch(params, cams)
    out = dense(pg)
    ref = jax.vmap(lambda p: rasterize_projected_reference(
        p, BG, RES, RES))(pg)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref).reshape(out.shape), atol=1e-4)


def test_multi_chunk_backward():
    params, cams = setup_batch(R=1, n=600, seed=5)
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(0, 1, (1, 3, RES, RES)).astype(np.float32))

    def loss_dense(*p):
        return jnp.sum((dense(prep_batch(p, cams)) - tgt) ** 2)

    def loss_ref(*p):
        pg = prep_batch(p, cams)
        img = jax.vmap(lambda q: rasterize_projected_reference(
            q, BG, RES, RES))(pg)
        return jnp.sum((img - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(*params)
    g_dense = jax.grad(loss_dense, argnums=tuple(range(5)))(*params)
    for i, nm in enumerate(["means", "opa", "scales", "rots", "shs"]):
        a, b = np.asarray(g_ref[i]), np.asarray(g_dense[i])
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / denom < 1e-4, nm


def test_plan_layout_constraints():
    """_plan must return p_blk that divides n_pix and is lane-aligned
    (multiple of 128 or the whole image) for every (n_pad, n_pix) the
    caller can produce — the chunk_n=384 case used to emit p_blk=8."""
    from unipre3d_tpu.ops.rasterizer.pallas_splat_dense import _plan
    for n_pad in [128, 256, 384, 512, 1024, 1536, 4096]:
        for n_pix in [32 * 32, 128 * 128, 160 * 120, 64 * 48]:
            chunk_n, p_blk = _plan(n_pad, n_pix)
            assert n_pad % chunk_n == 0
            assert n_pix % p_blk == 0
            assert p_blk % 128 == 0 or p_blk == n_pix


def test_large_radius_gaussians():
    """Gaussians spanning the whole image (the failure mode the binned
    kernel's CAP_SPAN truncates) are exact in the dense kernel."""
    params, cams = setup_batch(R=2, n=64, scale=0.25)
    pg = prep_batch(params, cams)
    out = dense(pg)
    ref = jax.vmap(lambda p: rasterize_projected_reference(
        p, BG, RES, RES))(pg)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref).reshape(out.shape), atol=1e-4)


def test_backward_matches_autodiff():
    params, cams = setup_batch(R=2, n=128)
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(0, 1, (2, 3, RES, RES)).astype(np.float32))

    def loss_dense(*p):
        return jnp.sum((dense(prep_batch(p, cams)) - tgt) ** 2)

    def loss_ref(*p):
        pg = prep_batch(p, cams)
        img = jax.vmap(lambda q: rasterize_projected_reference(
            q, BG, RES, RES))(pg)
        return jnp.sum((img - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(*params)
    g_dense = jax.grad(loss_dense, argnums=tuple(range(5)))(*params)
    for i, nm in enumerate(["means", "opa", "scales", "rots", "shs"]):
        a, b = np.asarray(g_ref[i]), np.asarray(g_dense[i])
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / denom < 1e-4, nm


def test_masked_gaussians():
    params, cams = setup_batch(R=2, n=96)
    pg = prep_batch(params, cams)
    mask = jnp.arange(96)[None, :] % 3 != 0
    pg = pg._replace(valid=pg.valid & mask,
                     opacity=jnp.where(mask, pg.opacity, 0.0))
    out = dense(pg)
    ref = jax.vmap(lambda p: rasterize_projected_reference(
        p, BG, RES, RES))(pg)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref).reshape(out.shape), atol=1e-4)
