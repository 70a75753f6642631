"""Binned Pallas TPU splat kernel — the CUDA-parity fast path.

Mirrors the reference CUDA rasterizer's structure
(diff_gaussian_rasterization: duplicateWithKeys -> radix sort by
(tile, depth) -> per-tile ranges -> per-tile front-to-back render):

1. XLA prep: depth-sort all gaussians once (so a gaussian's id IS its
   depth rank); emit one duplicate per overlapped tile within a static
   ``dup_budget``; ONE flat payload-free sort of u32
   ``tile << RANK_BITS | depth_rank`` keys; per-tile segment offsets
   via a counting compare-sum; gather the packed [16, M] gaussian
   table in duplicate order (HBM-resident).
2. Forward kernel: grid (n_tiles, MAXC). The scalar-prefetched segment
   offsets drive the data BlockSpec index map, so each tile streams
   exactly its own chunk blocks from HBM (Mosaic double-buffers the
   DMAs). Per-pixel transmittance carried in VMEM scratch across the
   chunk axis; early-exit once every pixel saturates.
3. Backward kernel: grid (n_tiles, 2*MAXC) — phase A re-walks the tile
   forward accumulating per-block entry transmittances and the total
   color-dot-cotangent mass; phase B re-walks forward again emitting
   analytic gradients (suffix = total - inclusive prefix), accumulated
   into an input-output-aliased [16, M] table, then scatter-added back
   to per-gaussian gradients in XLA.

Work is O(total duplicates) instead of v1's O(tiles x N): the same
asymptotics as the CUDA kernel. Truncation beyond MAXC chunks per tile
drops the FARTHEST duplicates (depth-sorted segments), mirroring the
XLA path's capacity semantics.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unipre3d_tpu.ops.rasterizer.pallas_splat import (
    ALPHA_MAX, ALPHA_MIN, LOG_T_EPS, ROWS, _cumsum_lanes, _pack,
    _tile_pixels)

CHUNK = 1024
DUP_FACTOR = 6               # default duplicate budget = 6 slots/gaussian
RANK_BITS = 20               # up to 2^20 gaussians
INVALID_KEY = np.uint32(0xFFFFFFFF)


def _alpha_masked(g, px, py, in_seg):
    dx = g[0, :][None, :] - px
    dy = g[1, :][None, :] - py
    power = (-0.5 * (g[2, :][None, :] * dx * dx
                     + g[4, :][None, :] * dy * dy)
             - g[3, :][None, :] * dx * dy)
    a = jnp.minimum(ALPHA_MAX, g[5, :][None, :] * jnp.exp(power))
    skip = (power > 0.0) | (a < ALPHA_MIN) | jnp.logical_not(in_seg)
    alpha = jnp.where(skip, 0.0, a)
    return alpha, jnp.log1p(-alpha), dx, dy, power, skip


def _blk_index(i, j, seg_ref, n_blocks_total):
    start = seg_ref[i]
    end = seg_ref[i + 1]
    first_blk = start // CHUNK
    last_blk = jnp.maximum(first_blk, (jnp.maximum(end, 1) - 1) // CHUNK)
    return jnp.minimum(jnp.minimum(first_blk + j, last_blk),
                       n_blocks_total - 1)


def _fwd_kernel(seg_ref, data_ref, bg_ref, out_ref, logt_ref,
                rgb_s, logt_s, *, maxc, tx, tile_h, tile_w,
                n_blocks_total):
    i = pl.program_id(0)
    j = pl.program_id(1)
    P = tile_h * tile_w
    px, py = _tile_pixels(i, tx, tile_h, tile_w)

    @pl.when(j == 0)
    def _():
        rgb_s[:] = jnp.zeros_like(rgb_s)
        logt_s[:] = jnp.zeros_like(logt_s)

    start = seg_ref[i]
    end = seg_ref[i + 1]
    blk = _blk_index(i, j, seg_ref, n_blocks_total)
    in_range = (start // CHUNK + j) * CHUNK < end
    live = jnp.max(logt_s[:]) >= LOG_T_EPS

    @pl.when(in_range & live)
    def _():
        g = data_ref[:, :]                              # [16, C]
        col = blk * CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, (1, CHUNK), 1)
        in_seg = (col >= start) & (col < end)           # [1, C]
        alpha, log1m, *_ = _alpha_masked(g, px, py, in_seg)
        logT = logt_s[:]                                # [1, P]
        cum = _cumsum_lanes(log1m) + jnp.transpose(logT)
        contrib = cum >= LOG_T_EPS
        t_before = jnp.exp(cum - log1m)
        w = jnp.where(contrib, alpha * t_before, 0.0)
        rgb_s[:] += jax.lax.dot_general(
            g[6:9, :], w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        logt_s[:] = logT + jnp.sum(
            jnp.where(contrib, log1m, 0.0), axis=1)[None, :]

    @pl.when(j == maxc - 1)
    def _():
        out_ref[0] = rgb_s[:] + bg_ref[:, :] * jnp.exp(logt_s[:])
        logt_ref[0] = logt_s[:]


def _bwd_kernel(seg_ref, data_ref, bg_ref, logt_ref, tot_ref, gout_ref,
                dgrad_ref, logt_s, pref_s,
                *, maxc, tx, tile_h, tile_w, n_blocks_total):
    """Single-phase backward: the total color-grad inner product ``tot``
    (phase A of the two-pass formulation) is supplied precomputed from
    the forward residuals — tot = sum_c g_out[c] * (out[c] - bg[c]*T_fin)
    — and the block-entry logT prefix is accumulated on the fly."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    P = tile_h * tile_w
    px, py = _tile_pixels(i, tx, tile_h, tile_w)

    @pl.when(j == 0)
    def _():
        logt_s[:] = jnp.zeros_like(logt_s)
        pref_s[:] = jnp.zeros_like(pref_s)

    start = seg_ref[i]
    end = seg_ref[i + 1]
    blk = _blk_index(i, j, seg_ref, n_blocks_total)
    in_range = (start // CHUNK + j) * CHUNK < end
    live = jnp.max(logt_s[:]) >= LOG_T_EPS
    g_pix = gout_ref[0]                                 # [3, P]

    # every real grad block is written exactly once (by its in-range
    # program; segments are CHUNK-aligned so blocks are never shared
    # between tiles); all other programs are routed to the dump block
    # and write zeros so no garbage is flushed.
    dgrad_ref[:, :] = jnp.zeros_like(dgrad_ref)

    @pl.when(in_range & live)
    def _():
        g = data_ref[:, :]
        col = blk * CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, (1, CHUNK), 1)
        in_seg = (col >= start) & (col < end)
        alpha, log1m, dx, dy, power, skip = _alpha_masked(
            g, px, py, in_seg)
        logT = logt_s[:]                                # [1, P]
        cum = _cumsum_lanes(log1m) + jnp.transpose(logT)
        contrib = cum >= LOG_T_EPS
        t_before = jnp.exp(cum - log1m)
        w = jnp.where(contrib, alpha * t_before, 0.0)
        cg = jax.lax.dot_general(
            g_pix, g[6:9, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        u = w * cg
        logt_s[:] = logT + jnp.sum(
            jnp.where(contrib, log1m, 0.0), axis=1)[None, :]

        prefix_in = pref_s[:]                           # [1, P]
        incl = _cumsum_lanes(u) + jnp.transpose(prefix_in)  # [P, C]
        pref_s[:] = prefix_in + jnp.sum(u, axis=1)[None, :]

        # s_i = total - inclusive prefix; tb = T_final * (bg . g)
        s_i = jnp.transpose(tot_ref[0]) - incl          # [P, C]
        bgdotg = jnp.sum(bg_ref[:, :] * g_pix, axis=0)[None, :]  # [1, P]
        tb = jnp.exp(logt_ref[0]) * bgdotg              # [1, P]

        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        dalpha = jnp.where(
            contrib,
            cg * t_before - (s_i + jnp.transpose(tb)) / one_m, 0.0)
        dcol = jax.lax.dot_general(
            g_pix, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [3, C]
        live_g = jnp.logical_not(skip) & (alpha < ALPHA_MAX)
        da_dopa = jnp.where(live_g, jnp.exp(power), 0.0)
        dpow = dalpha * jnp.where(live_g, alpha, 0.0)
        d_mx = jnp.sum(
            dpow * (-(g[2, :][None, :] * dx + g[3, :][None, :] * dy)),
            axis=0)
        d_my = jnp.sum(
            dpow * (-(g[4, :][None, :] * dy + g[3, :][None, :] * dx)),
            axis=0)
        d_ca = jnp.sum(dpow * (-0.5 * dx * dx), axis=0)
        d_cb = jnp.sum(dpow * (-dx * dy), axis=0)
        d_cc = jnp.sum(dpow * (-0.5 * dy * dy), axis=0)
        d_opa = jnp.sum(dalpha * da_dopa, axis=0)
        zrow = jnp.zeros((CHUNK,), jnp.float32)
        dgrad_ref[:, :] = jnp.stack(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_opa,
             dcol[0], dcol[1], dcol[2]] + [zrow] * (ROWS - 9), axis=0)


def _prep_duplicates(mean2d, conic, color, opacity, depth, radius, valid,
                     img_h, img_w, tile_h, tile_w, dup_budget):
    """Duplicate-and-sort (XLA side), with every tile segment padded to
    a CHUNK boundary so no data/gradient block is shared between tiles.

    FULL-SPAN duplication with a static budget (the CUDA reference's
    duplicateWithKeys semantics, diff_gaussian_rasterization
    forward.cu): each gaussian emits one duplicate per overlapped tile
    of its clamped screen bbox — variable counts realized inside a
    fixed ``dup_budget`` of slots via exclusive-cumsum offsets and a
    scatter+cumsum segment-id fill (no per-gaussian span cap; round-2's
    ``cap_span=2`` truncated large splats and cost 22-34 dB at scene
    shapes). Duplicates past the budget are dropped (highest gaussian
    indices first); size the budget at ~2x the expected span sum.

    ONE multi-key sort by (tile, view depth) orders the duplicates —
    no global depth argsort of the gaussian arrays is needed.

    Returns (data_dup [16, M_pad], dup_idx [M_pad] DEPTH-RANK id per
    layout slot (-1 dead), d_ids [N] original gaussian id per depth
    rank, seg [n_tiles+1] CHUNK-aligned offsets)."""
    N = mean2d.shape[0]
    ty, tx = img_h // tile_h, img_w // tile_w
    n_tiles = ty * tx
    assert N <= (1 << RANK_BITS) and n_tiles < (1 << (32 - RANK_BITS)) - 1

    # Depth-sort the gaussians ONCE so a duplicate's owner id IS its
    # depth rank: a single u32 key ``tile << RANK_BITS | rank`` then
    # orders duplicates exactly like the CUDA rasterizer's packed
    # (tile, depth) radix keys (diff_gaussian_rasterization
    # duplicateWithKeys) — round 3 sorted THREE [M] arrays with TWO
    # keys (tile u32 + depth f32), 3x the sort payload of this.
    _, d_ids = jax.lax.sort(
        (depth.astype(jnp.float32), jnp.arange(N, dtype=jnp.int32)))
    mean2d = jnp.take(mean2d, d_ids, axis=0)
    conic = jnp.take(conic, d_ids, axis=0)
    color = jnp.take(color, d_ids, axis=0)
    opacity = jnp.take(opacity, d_ids, axis=0)
    radius = jnp.take(radius, d_ids, axis=0)
    valid = jnp.take(valid, d_ids, axis=0)
    r = radius.astype(jnp.float32)
    gx, gy = mean2d[:, 0], mean2d[:, 1]
    tx0 = jnp.clip(jnp.floor((gx - r) / tile_w).astype(jnp.int32), 0, tx - 1)
    tx1 = jnp.clip(jnp.floor((gx + r) / tile_w).astype(jnp.int32), 0, tx - 1)
    ty0 = jnp.clip(jnp.floor((gy - r) / tile_h).astype(jnp.int32), 0, ty - 1)
    ty1 = jnp.clip(jnp.floor((gy + r) / tile_h).astype(jnp.int32), 0, ty - 1)
    sx = tx1 - tx0 + 1
    sy = ty1 - ty0 + 1
    c = jnp.where(valid, sx * sy, 0)                    # [N] span sizes
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(c)])             # [N+1] exclusive
    total = offs[-1]

    M = dup_budget
    # gaussian id per duplicate slot: every gaussian scatters +1 at its
    # start offset (empty ones pile onto the next start, so
    # cumsum(ind)-1 = index of the last gaussian with offs <= slot —
    # exactly the slot's owner, empties skipped for free)
    ind = jnp.zeros((M,), jnp.int32).at[offs[:-1]].add(1, mode="drop")
    ids = jnp.clip(jnp.cumsum(ind) - 1, 0, N - 1)

    # one 5-wide row gather for all per-duplicate fields
    table = jnp.stack([offs[:-1].astype(jnp.float32),
                       tx0.astype(jnp.float32), ty0.astype(jnp.float32),
                       sx.astype(jnp.float32),
                       c.astype(jnp.float32)])          # [5, N]
    t = jnp.take(table, ids, axis=1)                    # [5, M]
    m_iota = jnp.arange(M, dtype=jnp.int32)
    rank = m_iota - t[0].astype(jnp.int32)
    sx_i = jnp.maximum(t[3].astype(jnp.int32), 1)
    t_x = t[1].astype(jnp.int32) + rank % sx_i
    t_y = t[2].astype(jnp.int32) + rank // sx_i
    # rank < span guards budget overflow: past-the-end slots inherit the
    # last scattered gaussian with an out-of-span rank that could alias
    # a real tile below its bbox
    ok = (m_iota < total) & (rank < t[4].astype(jnp.int32))
    # ids are depth ranks, so ONE u32 key orders by (tile, depth); the
    # owner id rides in the low bits — sort carries NO payload arrays
    keys = jnp.where(
        ok, ((t_y * tx + t_x).astype(jnp.uint32) << RANK_BITS)
        | ids.astype(jnp.uint32), INVALID_KEY)
    keys_s = jax.lax.sort(keys)
    dup_ok = keys_s != INVALID_KEY
    tkeys_s = keys_s >> RANK_BITS          # invalid -> 2^12-1 >= n_tiles
    slots_s = jnp.where(
        dup_ok, (keys_s & ((1 << RANK_BITS) - 1)).astype(jnp.int32), -1)

    # raw per-tile offsets, then re-layout with CHUNK-aligned segments
    # (counting compare-sum: XLA's searchsorted lowers to a slow
    # gather loop on TPU)
    seg_raw = jnp.sum(
        tkeys_s[:, None] < jnp.arange(n_tiles + 1,
                                      dtype=jnp.uint32)[None, :],
        axis=0, dtype=jnp.int32)
    counts = seg_raw[1:] - seg_raw[:-1]
    aligned = -(-counts // CHUNK) * CHUNK
    seg = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(aligned)])
    M_pad = M + n_tiles * CHUNK  # static upper bound for the re-layout

    slot_tile = jnp.clip(tkeys_s.astype(jnp.int32), 0, n_tiles - 1)

    def tiny_lookup(table, idx):
        # element gathers are serialized on TPU (~2.7 ms at 400k); a
        # fused compare-sum against the 64-entry table is ~free
        tids = jnp.arange(n_tiles, dtype=jnp.int32)
        return jnp.sum(jnp.where(idx[:, None] == tids[None, :],
                                 table[None, :n_tiles], 0), axis=1)

    del dup_ok, slot_tile  # validity is carried by the -1 sentinel below

    # dup_idx = CHUNK-aligned re-layout of the sorted gauss ids. TPU
    # scatters are ~2.4 ms at 400k; instead copy each tile's contiguous
    # run to its aligned offset with 64 oversized dynamic-update-slices
    # (ascending order: the last writer of a position is its own tile).
    # dynamic_(update_)slice clamps out-of-range starts, so source and
    # destination are padded by the static slice length M.
    gauss_s = slots_s  # sorted gaussian ids (-1 on invalid slots)
    src = jnp.concatenate([gauss_s, jnp.full((M,), -1, jnp.int32)])

    def relayout_body(t, y):
        run = jax.lax.dynamic_slice(src, (seg_raw[t],), (M,))
        return jax.lax.dynamic_update_slice(y, run, (seg[t],))

    dup_idx = jax.lax.fori_loop(
        0, n_tiles, relayout_body,
        jnp.full((M_pad + M,), -1, jnp.int32))[:M_pad]
    # mask the within-segment alignment padding (holds run overhang)
    p = jnp.arange(M_pad, dtype=jnp.int32)
    t_p = jnp.sum(p[:, None] >= seg[None, 1:], axis=1, dtype=jnp.int32)
    limit = seg[:-1] + counts  # segment data end (before padding)
    lim_p = tiny_lookup(limit, t_p)
    dup_idx = jnp.where(p < lim_p, dup_idx, -1)

    # gather only the 9 live rows (gather cost scales with rows), then
    # zero-pad to the kernel's ROWS block height. The table is in depth
    # order (inputs were permuted above) so the depth-rank dup_idx
    # gathers directly; d_ids maps ranks back to original gaussians for
    # the backward scatter.
    data = _pack(mean2d, conic, color,
                 jnp.where(valid, opacity, 0.0), N)[:9]
    safe = jnp.clip(dup_idx, 0, N - 1)
    data_dup = jnp.take(data, safe, axis=1)
    data_dup = jnp.where((dup_idx >= 0)[None, :], data_dup, 0.0)
    data_dup = jnp.pad(data_dup, ((0, ROWS - 9), (0, 0)))
    return data_dup, dup_idx, d_ids, seg


def _splat2_fwd_impl(data_dup, seg, bg, img_h, img_w, tile_h, tile_w,
                     maxc):
    ty, tx = img_h // tile_h, img_w // tile_w
    n_tiles = ty * tx
    P = tile_h * tile_w
    n_blocks_total = data_dup.shape[1] // CHUNK
    kern = functools.partial(_fwd_kernel, maxc=maxc, tx=tx, tile_h=tile_h,
                             tile_w=tile_w, n_blocks_total=n_blocks_total)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, maxc),
        in_specs=[
            pl.BlockSpec(
                (ROWS, CHUNK),
                lambda i, j, seg_ref: (
                    0, _blk_index(i, j, seg_ref, n_blocks_total)),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, P), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
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
    )(seg, data_dup, bg)
    return out, logt


def _run_bwd_kernel(data_dup, seg, bg, logt, tot, g_out, img_h, img_w,
                    tile_h, tile_w, maxc):
    """Run the backward kernel -> dgrad_dup [16, M_pad]."""
    ty, tx = img_h // tile_h, img_w // tile_w
    n_tiles = ty * tx
    P = tile_h * tile_w
    n_blocks_total = data_dup.shape[1] // CHUNK
    kern = functools.partial(_bwd_kernel, maxc=maxc, tx=tx, tile_h=tile_h,
                             tile_w=tile_w, n_blocks_total=n_blocks_total)

    def blk_map(i, j, seg_ref):
        return (0, _blk_index(i, j, seg_ref, n_blocks_total))

    def out_blk_map(i, j, seg_ref):
        # real block only for the in-range program; clamped tails and
        # empty tiles -> dump block (extra trailing block of the output)
        start = seg_ref[i]
        end = seg_ref[i + 1]
        in_range = (start // CHUNK + j) * CHUNK < end
        blk = _blk_index(i, j, seg_ref, n_blocks_total)
        return (0, jnp.where(in_range, blk, n_blocks_total))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, maxc),
        in_specs=[
            pl.BlockSpec((ROWS, CHUNK), blk_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, P), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, CHUNK), out_blk_map,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),      # running entry logT
            pltpu.VMEM((1, P), jnp.float32),      # running u prefix
        ],
    )
    dgrad_dup = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (ROWS, data_dup.shape[1] + CHUNK), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(seg, data_dup, bg, logt, tot, g_out)[:, :data_dup.shape[1]]

    return dgrad_dup




@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _binned(mean2d, conic, color, opacity, depth, radius, valid, bg,
            img_h, img_w, tile_h, tile_w, maxc, dup_budget):
    return _binned_fwd(mean2d, conic, color, opacity, depth, radius,
                       valid, bg, img_h, img_w, tile_h, tile_w, maxc,
                       dup_budget)[0]


def _binned_fwd(mean2d, conic, color, opacity, depth, radius, valid, bg,
                img_h, img_w, tile_h, tile_w, maxc, dup_budget):
    data_dup, dup_idx, d_ids, seg = _prep_duplicates(
        mean2d, conic, color, opacity, depth, radius, valid,
        img_h, img_w, tile_h, tile_w, dup_budget)
    tiles, logt = _splat2_fwd_impl(data_dup, seg, bg, img_h, img_w,
                                   tile_h, tile_w, maxc)
    return tiles, (data_dup, dup_idx, d_ids, seg, bg, logt, tiles,
                   mean2d.shape[0])


def _binned_bwd(img_h, img_w, tile_h, tile_w, maxc, dup_budget, res,
                g_tiles):
    data_dup, dup_idx, d_ids, seg, bg, logt, tiles, N = res
    # total color-grad inner product per pixel (replaces the two-pass
    # kernel's phase A): tot = sum_c g_out[c] * (out[c] - bg[c]*T_fin)
    rgb_fg = tiles - bg[None, :, :] * jnp.exp(logt)     # [T, 3, P]
    tot = jnp.sum(g_tiles * rgb_fg, axis=1, keepdims=True)
    dd = _run_bwd_kernel(data_dup, seg, bg, logt, tot, g_tiles,
                         img_h, img_w, tile_h, tile_w, maxc)
    # per-gaussian grads: one segment scatter-add over the layout->rank
    # map (dead slots land in the dump row N), then ONE [N] scatter
    # unpermutes depth rank -> original gaussian id. TPU scatter-add is
    # fast (~1.6 ms at 400k rows).
    tgt = jnp.where(dup_idx >= 0, dup_idx, N)
    dG_rank = jnp.zeros((N + 1, 9), jnp.float32).at[tgt].add(
        dd[:9].T)[:N]                                   # [N, 9] depth order
    dG = jnp.zeros((N, 9), jnp.float32).at[d_ids].set(dG_rank).T  # [9, N]
    d_mean = jnp.stack([dG[0], dG[1]], axis=1)
    d_conic = jnp.stack([dG[2], dG[3], dG[4]], axis=1)
    d_color = jnp.stack([dG[6], dG[7], dG[8]], axis=1)
    d_opa = dG[5]
    T_fin = jnp.exp(logt[:, 0, :])
    dbg = jnp.einsum("tp,tcp->c", T_fin, g_tiles).reshape(3, 1)
    return d_mean, d_conic, d_color, d_opa, None, None, None, dbg


_binned.defvjp(_binned_fwd, _binned_bwd)


def default_dup_budget(n: int, n_tiles: int) -> int:
    """Static duplicate budget: DUP_FACTOR slots per gaussian (span sums
    are ~1-4 per gaussian for well-scaled splats), capped at the
    theoretical maximum n*n_tiles, rounded up to a CHUNK multiple."""
    return -(-min(DUP_FACTOR * n, n * n_tiles) // CHUNK) * CHUNK


def rasterize_projected_pallas_binned(pg, bg_color, img_h: int,
                                      img_w: int, tile_h: int = 16,
                                      tile_w: int = 16,
                                      max_per_tile: int = 16384,
                                      dup_budget: int = None
                                      ) -> jnp.ndarray:
    """Binned Pallas rasterizer (duplicate-sort-stream). ``max_per_tile``
    caps the composited duplicates per tile (farthest dropped).

    Duplication covers each gaussian's FULL clamped tile span (the CUDA
    reference's duplicateWithKeys, forward.cu) within a static
    ``dup_budget`` of duplicate slots (default ``default_dup_budget``:
    6 per gaussian). If the span sum exceeds the budget the overflow
    duplicates (highest gaussian indices) are dropped — raise the
    budget when rendering many very large splats."""
    assert img_h % tile_h == 0 and img_w % tile_w == 0
    maxc = -(-max_per_tile // CHUNK)
    n_tiles = (img_h // tile_h) * (img_w // tile_w)
    if dup_budget is None:
        dup_budget = default_dup_budget(pg.mean2d.shape[0], n_tiles)
    dup_budget = -(-int(dup_budget) // CHUNK) * CHUNK
    bg = jnp.asarray(bg_color, jnp.float32).reshape(3, 1)
    tiles = _binned(pg.mean2d, pg.conic, pg.color,
                    jnp.where(pg.valid, pg.opacity, 0.0),
                    jax.lax.stop_gradient(pg.depth), pg.radius, pg.valid,
                    bg, img_h, img_w, tile_h, tile_w, maxc,
                    int(dup_budget))
    ty, tx = img_h // tile_h, img_w // tile_w
    img = tiles.reshape(ty, tx, 3, tile_h, tile_w)
    return img.transpose(2, 0, 3, 1, 4).reshape(3, img_h, img_w)
