"""Tile-based differentiable Gaussian rasterization (TPU-native).

Replaces the reference's external CUDA ``diff_gaussian_rasterization``
package (consumed at reference gaussian_renderer/__init__.py:61-97) with a
static-shape formulation XLA maps onto the MXU/VPU:

1. **Preprocess** all N Gaussians in one vectorized pass (preprocess.py).
2. **Global depth sort** once per view (XLA sort) — per-tile compositing
   order is inherited from the global order, so no per-tile sort is needed.
3. **Tile binning with fixed capacity**: each image tile selects the first
   (nearest) ``capacity`` depth-ordered Gaussians whose screen bbox
   intersects it, via a stable compaction argsort. Overflow beyond
   capacity drops the *farthest* Gaussians (mostly occluded anyway).
4. **Compositing as prefix products**: with per-(pixel, gaussian) alpha,
   front-to-back blending ``C = sum_i alpha_i T_i c_i`` is computed via
   ``T_i = exp(cumsum(log1p(-alpha)))`` and one ``(P, K) @ (K, 3)``
   matmul per tile — MXU work instead of a sequential loop, and exactly
   autodifferentiable (no custom VJP needed; gradients match the CUDA
   analytic backward because the math is identical).

CUDA-parity details preserved: alpha cap 0.99, skip when ``power > 0`` or
``alpha < 1/255`` (skips do not advance T), stop once transmittance would
drop below 1e-4 (later Gaussians masked, background blended with the
frozen T), near cull at z=0.2, 0.3px low-pass + antialiasing opacity
compensation.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from unipre3d_tpu.ops.rasterizer.preprocess import (ProjectedGaussians,
                                                    preprocess_gaussians)

T_EPS = 1e-4        # transmittance early-stop threshold (CUDA parity)
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def _alpha(mean2d, conic, opacity, pix_x, pix_y):
    """Per-(pixel, gaussian) alpha with CUDA skip semantics.

    mean2d [K,2], conic [K,3], opacity [K]; pix_x/pix_y [P] ->
    alpha [P, K].
    """
    dx = mean2d[None, :, 0] - pix_x[:, None]
    dy = mean2d[None, :, 1] - pix_y[:, None]
    power = (-0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy)
             - conic[None, :, 1] * dx * dy)
    a = jnp.minimum(ALPHA_MAX, opacity[None, :] * jnp.exp(power))
    return jnp.where((power > 0.0) | (a < ALPHA_MIN), 0.0, a)


def _composite(alpha, colors, bg_color):
    """Front-to-back blend. alpha [P, K] (depth-ordered), colors [K, 3],
    bg_color [3] -> (rgb [P, 3], final_T [P])."""
    log_1ma = jnp.log1p(-alpha)
    cum = jnp.cumsum(log_1ma, axis=1)
    T_after = jnp.exp(cum)
    T_before = jnp.exp(cum - log_1ma)
    contrib = T_after >= T_EPS
    w = jnp.where(contrib, alpha * T_before, 0.0)
    rgb = jnp.dot(w, colors, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    # CUDA freezes T at the stop point: only contributing gaussians update it
    log_T_final = jnp.sum(jnp.where(contrib, log_1ma, 0.0), axis=1)
    final_T = jnp.exp(log_T_final)
    return rgb + final_T[:, None] * bg_color[None, :], final_T


@jax.custom_vjp
def _compact_gather(fields: jnp.ndarray, cand: jnp.ndarray,
                    slot_ok: jnp.ndarray) -> jnp.ndarray:
    """Per-tile candidate gather: fields [N, F], cand [T, K],
    slot_ok [T, K] -> [T, K, F] (0 on dead slots).

    One stacked gather instead of one per field (TPU gather cost is
    per-ROW, so 4 narrow gathers cost ~4x one wide gather), and a
    custom VJP: the gather's transpose is a scatter-add (~25 ms per
    field array at 307k indices); a (key, grads...) sort + run-boundary
    cumsum differences + two unique-index scatters does the same
    segment sum in ~5 ms total."""
    g = jnp.take(fields, cand, axis=0)
    return jnp.where(slot_ok[..., None], g, 0.0)


def _compact_gather_fwd(fields, cand, slot_ok):
    return _compact_gather(fields, cand, slot_ok), \
        (fields.shape[0], cand, slot_ok)


def _compact_gather_bwd(res, dg):
    n, cand, slot_ok = res
    T, K, F = dg.shape
    tk = T * K
    keys = jnp.where(slot_ok, cand, n).reshape(tk)
    ops = (keys,) + tuple(dg[..., f].reshape(tk).astype(jnp.float32)
                          for f in range(F))
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    k_s = sorted_ops[0]
    cum = jnp.cumsum(jnp.stack(sorted_ops[1:], axis=-1), axis=0)  # [tk, F]
    g_s = jnp.stack(sorted_ops[1:], axis=-1)
    nxt = jnp.concatenate([k_s[1:], jnp.full((1,), -1, k_s.dtype)])
    prv = jnp.concatenate([jnp.full((1,), -1, k_s.dtype), k_s[:-1]])
    is_end = k_s != nxt
    is_start = k_s != prv
    idx_end = jnp.where(is_end, k_s, n)
    idx_start = jnp.where(is_start, k_s, n)
    y_end = jnp.zeros((n, F), jnp.float32).at[idx_end].set(
        cum, mode="drop", unique_indices=True)
    y_start = jnp.zeros((n, F), jnp.float32).at[idx_start].set(
        cum - g_s, mode="drop", unique_indices=True)
    import numpy as _np
    return (y_end - y_start,
            _np.zeros(cand.shape, dtype=jax.dtypes.float0),
            _np.zeros(slot_ok.shape, dtype=jax.dtypes.float0))


_compact_gather.defvjp(_compact_gather_fwd, _compact_gather_bwd)


def auto_tile(img_h: int, img_w: int) -> tuple:
    """Largest tile dims from {32, 16, 8, 4} dividing each image dim."""
    def pick(s):
        for t in (32, 16, 8, 4):
            if s % t == 0:
                return t
        return 1
    return pick(img_h), pick(img_w)


def _sorted_by_depth(pg: ProjectedGaussians) -> ProjectedGaussians:
    # invalid gaussians sort to the back. ONE stacked 11-wide row gather
    # instead of 7 narrow ones (gather cost is per-row on TPU).
    key = jnp.where(pg.valid, pg.depth, jnp.inf)
    order = jnp.argsort(key)
    stacked = jnp.concatenate(
        [pg.mean2d, pg.conic, pg.color,
         pg.opacity[:, None], pg.depth[:, None],
         pg.radius.astype(jnp.float32)[:, None],
         pg.valid.astype(jnp.float32)[:, None]], axis=1)
    s = jnp.take(stacked, order, axis=0)
    return ProjectedGaussians(
        mean2d=s[:, 0:2], conic=s[:, 2:5], color=s[:, 5:8],
        opacity=s[:, 8], depth=s[:, 9],
        radius=s[:, 10].astype(pg.radius.dtype), valid=s[:, 11] > 0.5)


@functools.partial(jax.jit, static_argnames=(
    "img_h", "img_w", "tile_h", "tile_w", "capacity"))
def rasterize_projected(pg: ProjectedGaussians, bg_color: jnp.ndarray,
                        img_h: int, img_w: int,
                        tile_h: int = 16, tile_w: int = 16,
                        capacity: int = 1024) -> jnp.ndarray:
    """Rasterize preprocessed Gaussians -> image [3, H, W]."""
    assert img_h % tile_h == 0 and img_w % tile_w == 0
    pg = _sorted_by_depth(pg)
    N = pg.mean2d.shape[0]
    K = min(capacity, N)
    ty, tx = img_h // tile_h, img_w // tile_w
    n_tiles = ty * tx

    # tile pixel bounds [n_tiles]
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_x0 = (tile_ids % tx) * tile_w
    tile_y0 = (tile_ids // tx) * tile_h

    r = pg.radius.astype(jnp.float32)
    gx, gy = pg.mean2d[:, 0], pg.mean2d[:, 1]
    # [n_tiles, N] bbox-overlap (valid gaussians have radius > 0)
    ov_x = ((gx + r)[None, :] >= tile_x0[:, None]) & \
           ((gx - r)[None, :] <= (tile_x0 + tile_w - 1)[:, None])
    ov_y = ((gy + r)[None, :] >= tile_y0[:, None]) & \
           ((gy - r)[None, :] <= (tile_y0 + tile_h - 1)[:, None])
    overlap = ov_x & ov_y & pg.valid[None, :]

    # stable compaction: depth-ordered overlapping indices first
    iota = jax.lax.broadcasted_iota(jnp.int32, overlap.shape, 1)
    key = jnp.where(overlap, iota, N + iota)
    cand = jnp.argsort(key, axis=1)[:, :K].astype(jnp.int32)  # [n_tiles, K]
    count = jnp.sum(overlap, axis=1).astype(jnp.int32)
    slot_ok = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1) < \
        jnp.minimum(count, K)[:, None]

    # gather per-tile gaussian params — one stacked 9-wide gather with a
    # sort-based segment-sum VJP (see _compact_gather). Dead slots are
    # zeroed across all fields: their opacity 0 makes alpha (and all its
    # gradients) exactly 0, so the forward image is unchanged.
    fields = jnp.concatenate(
        [pg.mean2d, pg.conic, pg.color, pg.opacity[:, None]], axis=1)
    g = _compact_gather(fields, cand, slot_ok)      # [T, K, 9]
    g_mean2d = g[..., 0:2]
    g_conic = g[..., 2:5]
    g_color = g[..., 5:8]
    g_opa = g[..., 8]

    # per-tile pixel coordinates [n_tiles, P]
    p = tile_h * tile_w
    pix_iota = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, p), 1)
    pix_x = (tile_x0[:, None] + pix_iota % tile_w).astype(jnp.float32)
    pix_y = (tile_y0[:, None] + pix_iota // tile_w).astype(jnp.float32)

    bg = jnp.asarray(bg_color, dtype=jnp.float32)

    # compositing streamed over K-chunks with a rematerialized scan:
    # materializing the full [pixels, K] alpha matrix costs
    # B*V*H*W*K floats (8 GB at the reference train config); chunking
    # keeps the math identical (prefix products carried via logT) at
    # O(pixels * chunk) memory.
    K_CHUNK = min(256, K)
    n_k = -(-K // K_CHUNK)
    pad_k = n_k * K_CHUNK - K

    def tile_fn(mean2d, conic, color, opa, px, py):
        if pad_k:
            mean2d = jnp.pad(mean2d, ((0, pad_k), (0, 0)))
            conic = jnp.pad(conic, ((0, pad_k), (0, 0)))
            color = jnp.pad(color, ((0, pad_k), (0, 0)))
            opa = jnp.pad(opa, (0, pad_k))

        def chunks(x):
            return x.reshape(n_k, K_CHUNK, *x.shape[1:])

        @jax.checkpoint
        def step(carry, xs):
            rgb, logT = carry
            m_c, c_c, col_c, o_c = xs
            a = _alpha(m_c, c_c, o_c, px, py)        # [P, c]
            log_1ma = jnp.log1p(-a)
            cum = jnp.cumsum(log_1ma, axis=1) + logT[:, None]
            contrib = jnp.exp(cum) >= T_EPS
            w = jnp.where(contrib, a * jnp.exp(cum - log_1ma), 0.0)
            rgb = rgb + jnp.dot(w, col_c,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
            logT = logT + jnp.sum(jnp.where(contrib, log_1ma, 0.0),
                                  axis=1)
            return (rgb, logT), None

        P_ = px.shape[0]
        init = (jnp.zeros((P_, 3), jnp.float32),
                jnp.zeros((P_,), jnp.float32))
        (rgb, logT), _ = jax.lax.scan(
            step, init, (chunks(mean2d), chunks(conic), chunks(color),
                         chunks(opa)))
        return rgb + jnp.exp(logT)[:, None] * bg[None, :]  # [P, 3]

    tiles = jax.vmap(tile_fn)(g_mean2d, g_conic, g_color, g_opa, pix_x, pix_y)
    # [n_tiles, P, 3] -> [3, H, W]
    img = tiles.reshape(ty, tx, tile_h, tile_w, 3)
    img = img.transpose(4, 0, 2, 1, 3).reshape(3, img_h, img_w)
    return img


@functools.partial(jax.jit, static_argnames=("img_h", "img_w"))
def rasterize_projected_reference(pg: ProjectedGaussians,
                                  bg_color: jnp.ndarray,
                                  img_h: int, img_w: int) -> jnp.ndarray:
    """Brute-force O(N*P) per-pixel reference renderer (no tiling, no
    capacity cap) — the `*_ref` ground truth for kernel tests."""
    pg = _sorted_by_depth(pg)
    ys, xs = jnp.meshgrid(jnp.arange(img_h, dtype=jnp.float32),
                          jnp.arange(img_w, dtype=jnp.float32), indexing="ij")
    pix_x = xs.reshape(-1)
    pix_y = ys.reshape(-1)
    a = _alpha(pg.mean2d, pg.conic, pg.opacity, pix_x, pix_y)
    # radius-based tile culling does not apply here; gaussians outside the
    # image were already invalidated (opacity 0) in preprocess
    rgb, _ = _composite(a, pg.color, jnp.asarray(bg_color, jnp.float32))
    return rgb.reshape(img_h, img_w, 3).transpose(2, 0, 1)


def rasterize(means3d, opacities, scales, rotations, shs,
              world_view, full_proj, cam_center,
              *, img_h: int, img_w: int, tanfovx: float, tanfovy: float,
              bg_color, sh_degree: int, scale_modifier: float = 1.0,
              antialiasing: bool = True, gaussian_mask=None,
              tile_h: int = 16, tile_w: int = 16,
              capacity: int = 1024,
              impl: str = "xla",
              dup_budget: int = None) -> Dict[str, jnp.ndarray]:
    """Full forward: preprocess + tiled rasterization of one view.

    ``impl``: "xla" (vmapped gather/compositing — best at small N),
    "pallas_binned" (duplicate-sort-stream Pallas kernel with analytic
    VJP — fastest at 100k+ gaussians), or "pallas" (streaming kernel
    with chunk-skip bitmap, no binning).

    Returns {"render" [3,H,W], "radii" [N], "visibility_filter" [N]}
    mirroring reference gaussian_renderer/__init__.py:101-104.
    """
    pg = preprocess_gaussians(
        means3d, opacities, scales, rotations, shs, world_view, full_proj,
        cam_center, img_h, img_w, tanfovx, tanfovy, sh_degree,
        scale_modifier, antialiasing, gaussian_mask)
    if impl == "pallas_binned":
        from unipre3d_tpu.ops.rasterizer import pallas_splat_binned as psb
        img = psb.rasterize_projected_pallas_binned(
            pg, bg_color, img_h, img_w, tile_h, tile_w,
            max_per_tile=capacity * 4, dup_budget=dup_budget)
    elif impl == "pallas":
        from unipre3d_tpu.ops.rasterizer.pallas_splat import \
            rasterize_projected_pallas
        img = rasterize_projected_pallas(pg, bg_color, img_h, img_w,
                                         tile_h, tile_w)
    else:
        img = rasterize_projected(pg, bg_color, img_h, img_w, tile_h,
                                  tile_w, capacity)
    return {"render": img, "radii": pg.radius, "visibility_filter": pg.radius > 0}


def rasterize_reference(means3d, opacities, scales, rotations, shs,
                        world_view, full_proj, cam_center,
                        *, img_h: int, img_w: int, tanfovx: float,
                        tanfovy: float, bg_color, sh_degree: int,
                        scale_modifier: float = 1.0,
                        antialiasing: bool = True,
                        gaussian_mask=None) -> Dict[str, jnp.ndarray]:
    """Brute-force counterpart of :func:`rasterize` (same signature minus
    tiling knobs)."""
    pg = preprocess_gaussians(
        means3d, opacities, scales, rotations, shs, world_view, full_proj,
        cam_center, img_h, img_w, tanfovx, tanfovy, sh_degree,
        scale_modifier, antialiasing, gaussian_mask)
    img = rasterize_projected_reference(pg, bg_color, img_h, img_w)
    return {"render": img, "radii": pg.radius, "visibility_filter": pg.radius > 0}


def render_predicted(pc: Dict[str, jnp.ndarray], world_view_transform,
                     full_proj_transform, camera_center, bg_color,
                     cfg: Any, scaling_modifier: float = 1.0,
                     focals_pixels=None, gaussian_mask=None,
                     use_reference: bool = False) -> Dict[str, jnp.ndarray]:
    """API-parity wrapper over the predicted-Gaussian dict (reference
    gaussian_renderer/__init__.py:13-104): consumes ``{"xyz", "opacity",
    "scaling", "rotation", "features_dc"[, "features_rest"]}`` for a single
    view and the composed config."""
    if focals_pixels is None:
        tanfovx = math.tan(cfg.data.fov * math.pi / 360)
        tanfovy = math.tan(cfg.data.fov * math.pi / 360)
    else:
        from unipre3d_tpu.utils.camera import focal2fov
        res = cfg.data.training_resolution
        tanfovx = math.tan(focal2fov(float(focals_pixels[0]), res) / 2)
        tanfovy = math.tan(focal2fov(float(focals_pixels[1]), res) / 2)

    if hasattr(cfg.data, "training_resolution"):
        img_h = img_w = int(cfg.data.training_resolution)
    else:
        img_h, img_w = int(cfg.data.training_height), int(cfg.data.training_width)

    if "features_rest" in pc:
        shs = jnp.concatenate([pc["features_dc"], pc["features_rest"]], axis=1)
    else:
        shs = pc["features_dc"]

    kwargs = dict(
        img_h=img_h, img_w=img_w, tanfovx=tanfovx, tanfovy=tanfovy,
        bg_color=bg_color, sh_degree=int(cfg.model.max_sh_degree),
        scale_modifier=scaling_modifier, gaussian_mask=gaussian_mask)
    fn = rasterize_reference if use_reference else rasterize
    if not use_reference:
        cap = 1024
        tpu_cfg = cfg.get("tpu") if hasattr(cfg, "get") else None
        if tpu_cfg and "raster_tile_capacity" in tpu_cfg:
            cap = int(tpu_cfg.raster_tile_capacity)
        kwargs["capacity"] = cap
        kwargs["tile_h"], kwargs["tile_w"] = auto_tile(img_h, img_w)
        if tpu_cfg and "raster_impl" in tpu_cfg:
            kwargs["impl"] = str(tpu_cfg.raster_impl)
    return fn(pc["xyz"], pc["opacity"], pc["scaling"], pc["rotation"], shs,
              world_view_transform, full_proj_transform, camera_center,
              **kwargs)
