"""Pallas TPU kernel for tile-based Gaussian splatting (fwd + analytic bwd).

The speed-of-light path for the differentiable splatter (SURVEY.md §7
hard part 1). Design vs the XLA fallback in render.py:

* NO per-tile binning sort: gaussians stay in one global depth order,
  and every (tile, chunk-of-C-gaussians) pair is either processed
  (streamed through VMEM, alpha on the VPU, color matmul on the MXU) or
  skipped via a precomputed chunk-overlap bitmap + per-pixel
  transmittance early-exit — the TPU analog of the CUDA kernel's
  tile ranges.
* Gaussian data is packed transposed as ``[16, N]`` so the lane
  dimension is N (128-aligned); per-chunk slices are ``[16, C]``.
* The TPU grid is sequential, so the backward kernel accumulates
  per-gaussian gradients across tiles into a single ``[16, N]`` output
  block (revisited by every program).
* The backward recomputes per-chunk entry transmittances in a cheap
  forward sweep (no O(n_chunks * P) residuals), then walks chunks
  back-to-front exactly like the reference CUDA backward
  (diff_gaussian_rasterization BACKWARD::render).

Compositing math (identical to render.py:_composite, hence to the CUDA
semantics): alpha capped at 0.99, contributions skipped when power > 0
or alpha < 1/255, per-pixel stop (frozen T) once transmittance falls
below 1e-4.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_EPS = 1e-4
LOG_T_EPS = math.log(T_EPS)
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
CHUNK = 512
ROWS = 16  # packed rows: mx my ca cb cc opa r g b (9 used)


def _pack(mean2d, conic, color, opacity, n_pad: int) -> jnp.ndarray:
    """[N,...] gaussian arrays -> [16, n_pad] packed f32 (padding rows
    have opacity 0 == no-op)."""
    N = mean2d.shape[0]
    data = jnp.zeros((ROWS, n_pad), jnp.float32)
    data = data.at[0, :N].set(mean2d[:, 0])
    data = data.at[1, :N].set(mean2d[:, 1])
    data = data.at[2, :N].set(conic[:, 0])
    data = data.at[3, :N].set(conic[:, 1])
    data = data.at[4, :N].set(conic[:, 2])
    data = data.at[5, :N].set(opacity)
    data = data.at[6, :N].set(color[:, 0])
    data = data.at[7, :N].set(color[:, 1])
    data = data.at[8, :N].set(color[:, 2])
    return data


def _cumsum_lanes(x):
    """Inclusive cumulative sum along the lane (last) axis via log-depth
    rolls — Mosaic has no native cumsum primitive."""
    C = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    sh = 1
    while sh < C:
        shifted = pltpu.roll(x, sh, axis=x.ndim - 1)
        x = x + jnp.where(col >= sh, shifted, 0.0)
        sh *= 2
    return x


def _tile_pixels(pid, tx, tile_h, tile_w):
    """Pixel coords of tile `pid` -> (px, py) each [P, 1] f32."""
    P = tile_h * tile_w
    tile_x0 = (pid % tx) * tile_w
    tile_y0 = (pid // tx) * tile_h
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tile_x0 + pix % tile_w).astype(jnp.float32)
    py = (tile_y0 + pix // tile_w).astype(jnp.float32)
    return px, py


def _chunk_alpha(g, px, py):
    """g [16, C] packed chunk; px/py [P, 1] -> (alpha [P, C],
    log1m [P, C], cg residual pieces)."""
    dx = g[0, :][None, :] - px          # [P, C]
    dy = g[1, :][None, :] - py
    power = (-0.5 * (g[2, :][None, :] * dx * dx
                     + g[4, :][None, :] * dy * dy)
             - g[3, :][None, :] * dx * dy)
    a = jnp.minimum(ALPHA_MAX, g[5, :][None, :] * jnp.exp(power))
    skip = (power > 0.0) | (a < ALPHA_MIN)
    alpha = jnp.where(skip, 0.0, a)
    return alpha, jnp.log1p(-alpha), dx, dy, power, skip


def _fwd_kernel(skip_ref, data_ref, bg_ref, out_ref, logt_ref,
                *, n_chunks, tx, tile_h, tile_w):
    pid = pl.program_id(0)
    P = tile_h * tile_w
    px, py = _tile_pixels(pid, tx, tile_h, tile_w)

    def body(c, carry):
        rgb, logT = carry  # [3, P], [1, P]

        def run(_):
            g = data_ref[:, pl.ds(c * CHUNK, CHUNK)]       # [16, C]
            alpha, log1m, *_ = _chunk_alpha(g, px, py)
            cum = _cumsum_lanes(log1m) + jnp.transpose(logT)  # [P, C]
            contrib = cum >= LOG_T_EPS
            t_before = jnp.exp(cum - log1m)
            w = jnp.where(contrib, alpha * t_before, 0.0)   # [P, C]
            add = jax.lax.dot_general(
                g[6:9, :], w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [3, P]
            new_logT = logT + jnp.sum(
                jnp.where(contrib, log1m, 0.0), axis=1)[None, :]
            return rgb + add, new_logT

        do = (skip_ref[pid, c] > 0) & (jnp.max(logT) >= LOG_T_EPS)
        return jax.lax.cond(do, run, lambda _: (rgb, logT), None)

    rgb0 = jnp.zeros((3, P), jnp.float32)
    logT0 = jnp.zeros((1, P), jnp.float32)
    rgb, logT = jax.lax.fori_loop(0, n_chunks, body, (rgb0, logT0))
    T_fin = jnp.exp(logT)                                   # [1, P]
    out_ref[0] = rgb + bg_ref[:, :] * T_fin
    logt_ref[0] = logT


def _bwd_kernel(skip_ref, data_ref, bg_ref, logt_ref, gout_ref,
                dgrad_ref, *, n_chunks, tx, tile_h, tile_w):
    pid = pl.program_id(0)
    P = tile_h * tile_w
    px, py = _tile_pixels(pid, tx, tile_h, tile_w)

    @pl.when(pid == 0)
    def _():
        dgrad_ref[:] = jnp.zeros_like(dgrad_ref)

    def run_bwd(chunk_logT_ref):
        g_pix = gout_ref[0]                 # [3, P] output cotangent
        logT_fin = logt_ref[0]              # [1, P]
        # tb[p] = T_fin * (bg . g_p)
        bgdotg = jnp.sum(bg_ref[:, :] * g_pix, axis=0)  # [P]
        tb = jnp.exp(logT_fin[0, :]) * bgdotg                     # [P]

        def body(ci, s_carry):
            c = n_chunks - 1 - ci
            s = s_carry  # [P] suffix of w_j * (c_j . g_p) over j > chunk

            def run(s):
                g = data_ref[:, pl.ds(c * CHUNK, CHUNK)]
                alpha, log1m, dx, dy, power, skip = _chunk_alpha(g, px, py)
                logT_in = chunk_logT_ref[pl.ds(c, 1), :]  # [1, P]
                cum = _cumsum_lanes(log1m) + jnp.transpose(logT_in)
                contrib = cum >= LOG_T_EPS
                t_before = jnp.exp(cum - log1m)
                w = jnp.where(contrib, alpha * t_before, 0.0)     # [P, C]

                # cg[p, i] = c_i . g_p
                cg = jax.lax.dot_general(
                    g_pix, g[6:9, :], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)           # [P, C]
                u = w * cg                                        # [P, C]
                # suffix within chunk (exclusive) + carry from later chunks
                suf = (jnp.sum(u, axis=1, keepdims=True)
                       - _cumsum_lanes(u))                   # [P, C]
                s_i = suf + s[:, None]

                one_m = jnp.maximum(1.0 - alpha, 1e-6)
                dalpha = jnp.where(
                    contrib,
                    cg * t_before - (s_i + tb[:, None]) / one_m,
                    0.0)                                          # [P, C]

                # dcolor[3, C] = g_pix @ w
                dcol = jax.lax.dot_general(
                    g_pix, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)           # [3, C]

                # alpha = min(0.99, opa * exp(power)); skip -> 0
                live = jnp.logical_not(skip) & (alpha < ALPHA_MAX)
                da_dopa = jnp.where(live, jnp.exp(power), 0.0)
                da_dpow = jnp.where(live, alpha, 0.0)
                dpow = dalpha * da_dpow
                d_ca = jnp.sum(dpow * (-0.5 * dx * dx), axis=0)
                d_cb = jnp.sum(dpow * (-dx * dy), axis=0)
                d_cc = jnp.sum(dpow * (-0.5 * dy * dy), axis=0)
                ddx = dpow * (-(g[2, :][None, :] * dx
                                + g[3, :][None, :] * dy))
                ddy = dpow * (-(g[4, :][None, :] * dy
                                + g[3, :][None, :] * dx))
                d_mx = jnp.sum(ddx, axis=0)
                d_my = jnp.sum(ddy, axis=0)
                d_opa = jnp.sum(dalpha * da_dopa, axis=0)

                sl = pl.ds(c * CHUNK, CHUNK)
                dgrad_ref[0, sl] += d_mx
                dgrad_ref[1, sl] += d_my
                dgrad_ref[2, sl] += d_ca
                dgrad_ref[3, sl] += d_cb
                dgrad_ref[4, sl] += d_cc
                dgrad_ref[5, sl] += d_opa
                dgrad_ref[6, sl] += dcol[0]
                dgrad_ref[7, sl] += dcol[1]
                dgrad_ref[8, sl] += dcol[2]
                return s + jnp.sum(u, axis=1)

            do = skip_ref[pid, c] > 0
            return jax.lax.cond(do, run, lambda s: s, s)

        jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((P,), jnp.float32))

    def fwd_sweep(scratch):
        # recompute per-chunk entry logT into scratch [n_chunks, P]
        def body(c, logT):
            scratch[pl.ds(c, 1), :] = logT

            def run(_):
                g = data_ref[:, pl.ds(c * CHUNK, CHUNK)]
                alpha, log1m, *_ = _chunk_alpha(g, px, py)
                cum = _cumsum_lanes(log1m) + jnp.transpose(logT)
                contrib = cum >= LOG_T_EPS
                return logT + jnp.sum(
                    jnp.where(contrib, log1m, 0.0), axis=1)[None, :]

            do = (skip_ref[pid, c] > 0) & (jnp.max(logT) >= LOG_T_EPS)
            return jax.lax.cond(do, run, lambda _: logT, None)

        jax.lax.fori_loop(0, n_chunks, body,
                          jnp.zeros((1, P), jnp.float32))
        run_bwd(scratch)

    pl.run_scoped(fwd_sweep,
                  pltpu.VMEM((n_chunks, P), jnp.float32))


def _chunk_flags(overlap: jnp.ndarray, n_chunks: int) -> jnp.ndarray:
    """[T, N_pad] bool overlap -> [T, n_chunks] int32 chunk bitmap."""
    T = overlap.shape[0]
    return jnp.any(overlap.reshape(T, n_chunks, CHUNK),
                   axis=2).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _splat(data, skip, bg, img_h, img_w, tile_h, tile_w):
    out, _ = _splat_fwd_impl(data, skip, bg, img_h, img_w, tile_h, tile_w)
    return out


def _splat_fwd_impl(data, skip, bg, img_h, img_w, tile_h, tile_w):
    ty, tx = img_h // tile_h, img_w // tile_w
    n_tiles = ty * tx
    P = tile_h * tile_w
    n_chunks = data.shape[1] // CHUNK
    kern = functools.partial(_fwd_kernel, n_chunks=n_chunks, tx=tx,
                             tile_h=tile_h, tile_w=tile_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,   # skip flags land in SMEM
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((ROWS, data.shape[1]), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out, logt = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(skip, data, bg)
    return out, logt


def _splat_vjp_fwd(data, skip, bg, img_h, img_w, tile_h, tile_w):
    out, logt = _splat_fwd_impl(data, skip, bg, img_h, img_w, tile_h,
                                tile_w)
    return out, (data, skip, bg, logt)


def _splat_vjp_bwd(img_h, img_w, tile_h, tile_w, res, g_out):
    data, skip, bg, logt = res
    ty, tx = img_h // tile_h, img_w // tile_w
    n_tiles = ty * tx
    P = tile_h * tile_w
    n_chunks = data.shape[1] // CHUNK
    kern = functools.partial(_bwd_kernel, n_chunks=n_chunks, tx=tx,
                             tile_h=tile_h, tile_w=tile_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((ROWS, data.shape[1]), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, data.shape[1]), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    dgrad = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, data.shape[1]), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(skip, data, bg, logt, g_out)
    # bg cotangent: dL/dbg = sum_pix T_fin * g
    T_fin = jnp.exp(logt[:, 0, :])                      # [n_tiles, P]
    dbg = jnp.einsum("tp,tcp->c", T_fin, g_out)[:, None]
    return dgrad, jnp.zeros_like(skip), dbg


_splat.defvjp(_splat_vjp_fwd, _splat_vjp_bwd)


def rasterize_projected_pallas(pg, bg_color, img_h: int, img_w: int,
                               tile_h: int = 16, tile_w: int = 16
                               ) -> jnp.ndarray:
    """Drop-in Pallas counterpart of render.rasterize_projected (no
    capacity cap: every depth-ordered gaussian is composited; overflow
    semantics therefore match the uncapped reference renderer)."""
    from unipre3d_tpu.ops.rasterizer.render import _sorted_by_depth
    assert img_h % tile_h == 0 and img_w % tile_w == 0
    pg = _sorted_by_depth(pg)
    N = pg.mean2d.shape[0]
    n_pad = -(-N // CHUNK) * CHUNK
    data = _pack(pg.mean2d, pg.conic, pg.color,
                 jnp.where(pg.valid, pg.opacity, 0.0), n_pad)

    ty, tx = img_h // tile_h, img_w // tile_w
    tile_ids = jnp.arange(ty * tx, dtype=jnp.int32)
    tile_x0 = ((tile_ids % tx) * tile_w).astype(jnp.float32)
    tile_y0 = ((tile_ids // tx) * tile_h).astype(jnp.float32)
    r = pg.radius.astype(jnp.float32)
    gx, gy = pg.mean2d[:, 0], pg.mean2d[:, 1]
    ov = (((gx + r)[None, :] >= tile_x0[:, None])
          & ((gx - r)[None, :] <= (tile_x0 + tile_w - 1)[:, None])
          & ((gy + r)[None, :] >= tile_y0[:, None])
          & ((gy - r)[None, :] <= (tile_y0 + tile_h - 1)[:, None])
          & pg.valid[None, :])
    ov = jnp.pad(ov, ((0, 0), (0, n_pad - N)))
    skip = _chunk_flags(ov, n_pad // CHUNK)

    bg = jnp.asarray(bg_color, jnp.float32).reshape(3, 1)
    tiles = _splat(data, skip, bg, img_h, img_w, tile_h, tile_w)
    img = tiles.reshape(ty, tx, 3, tile_h, tile_w)
    return img.transpose(2, 0, 3, 1, 4).reshape(3, img_h, img_w)
