"""Precomputed batch geometry for the scene backbones.

Every index structure the SparseUNet step needs — the canonical voxel
order, the PointFusion pixel-voxel merge, the per-level stride-2 parent
maps and the submanifold neighbor tables — is a pure function of the
batch GEOMETRY (grid coords, validity masks, unprojected pixel rays),
independent of features and parameters. Building it inside the jitted
train step re-runs ~200 ms of argsorts and rank lookups per step that
the autodiff pass never touches (round-4 attribution:
docs/PERF_NOTES.md, "host-side geometry" conclusion).

This module computes all of it once per batch as a standalone jittable
function. In production the builder runs in the input pipeline
(multi-core host or a spare device stream) overlapped with the device
step — exactly like data loading and GT-view rendering, it is off the
step's critical path. ``bench.py`` reports both the pipelined step rate
and the serial geometry+step rate.

Replaces the implicit geometry pass of reference
pointcept/models/sparse_unet/spconv_unet_v1m1_base.py:153-276 (spconv
builds the equivalent hash tables inside every conv call) and
fusion/point_fusion.py:36-195 (the pixel-voxel merge).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unipre3d_tpu.ops import sparse as sp


class SpUNetGeometry(NamedTuple):
    """All index structures of one SpUNet forward, batched [B, ...].

    order0:      [B, M] canonical (code-sorted) permutation of input rows
    mask0:       [B, M] validity in canonical order (pre-merge)
    nbr5:        [B, M, 125] stem k5 neighbor table (pre-merge set)
    pix_rep:     [B, P] flattened conditioning-pixel row feeding each
                 fused 2D voxel, -1 = empty slot (None when fusion off)
    merge_order: [B, M+P] permutation of the concatenated (3D, 2D) rows
                 producing the canonical merged set (None when fusion off)
    world:       [B, Mf, 3] world coords of the final (merged) set
    fine_mask:   [B, Mf] validity of the final set
    nbr3_fine:   [B, Mf, 27] k3 table at the fine level
    downs:       per-stage stride-2 :class:`~unipre3d_tpu.ops.sparse.
                 DownStructure` (coarse coords/mask + parent maps)
    nbrs:        per-stage [B, Mc, 27] k3 tables at the coarse levels
    """
    order0: jnp.ndarray
    mask0: jnp.ndarray
    nbr5: jnp.ndarray
    pix_rep: Optional[jnp.ndarray]
    merge_order: Optional[jnp.ndarray]
    world: jnp.ndarray
    fine_mask: jnp.ndarray
    nbr3_fine: jnp.ndarray
    downs: Tuple[sp.DownStructure, ...]
    nbrs: Tuple[jnp.ndarray, ...]


def _geometry_one(grid_coord, mask, coord, min_coord, unproj, *,
                  grid_size: float, pixel_capacity: int,
                  level_caps: Sequence[int], use_fusion: bool,
                  conv_impl: str = "gather", block_size: int = 4,
                  block_div: int = 8):
    """Geometry of ONE scene (vmap for batch).

    ``conv_impl="block"`` replaces every submanifold neighbor table
    with the block-dense :class:`~unipre3d_tpu.ops.sparse.
    BlockStructure` (same field slots of the geometry tuple; the model's
    SubMConv dispatches on the type)."""
    M = grid_coord.shape[0]
    offs3 = sp.kernel_offsets(3)
    offs5 = sp.kernel_offsets(5)
    nofeat = jnp.zeros((M, 0), jnp.float32)
    use_block = conv_impl == "block"

    def k3_struct(sv, cap):
        if use_block:
            return sp.block_structure(sv.coords, sv.mask,
                                      max(cap // block_div, 16),
                                      bs=block_size, halo=1)
        return sp.find_neighbors(sv, offs3)

    code = sp.pack_code(grid_coord, mask)
    order0 = jnp.argsort(code).astype(jnp.int32)
    coords_c = jnp.take(grid_coord, order0, axis=0)
    mask0 = jnp.take(mask, order0, axis=0)
    world_c = jnp.take(coord, order0, axis=0)
    sv_c = sp.SparseVoxels(coords=coords_c, feats=nofeat, mask=mask0)
    if use_block:
        nbr5 = sp.block_structure(coords_c, mask0,
                                  max(M // block_div, 16),
                                  bs=block_size, halo=2)
    else:
        nbr5 = sp.find_neighbors(sv_c, offs5)

    pix_rep = merge_order = None
    if use_fusion:
        # PointFusion geometry (reference fusion/point_fusion.py:36-195):
        # bbox-filter the unprojected pixels to the 3D cloud extent,
        # voxelize at the shared min_coord, concat with the 3D set.
        pix_world = unproj[..., :3].reshape(-1, 3)
        pix_valid = unproj[..., 3].reshape(-1) > 0
        big = jnp.float32(1e9)
        w3 = jnp.where(mask0[:, None], world_c, big)
        lo = jnp.min(w3, axis=0)
        w3 = jnp.where(mask0[:, None], world_c, -big)
        hi = jnp.max(w3, axis=0)
        pix_valid = pix_valid & jnp.all(
            (pix_world >= lo) & (pix_world <= hi), axis=-1)
        sv2d, pix_rep, world2d = sp.voxelize(
            pix_world, jnp.zeros((pix_world.shape[0], 0), jnp.float32),
            pix_valid, grid_size, min_coord, pixel_capacity)
        mcode = sp.pack_code(
            jnp.concatenate([coords_c, sv2d.coords], axis=0),
            jnp.concatenate([mask0, sv2d.mask], axis=0))
        merge_order = jnp.argsort(mcode).astype(jnp.int32)
        fine_coords = jnp.take(
            jnp.concatenate([coords_c, sv2d.coords], axis=0),
            merge_order, axis=0)
        fine_mask = jnp.take(mcode, merge_order) != sp.INVALID_CODE
        world = jnp.take(jnp.concatenate([world_c, world2d], axis=0),
                         merge_order, axis=0)
    else:
        fine_coords, fine_mask, world = coords_c, mask0, world_c

    sv_f = sp.SparseVoxels(coords=fine_coords,
                           feats=jnp.zeros((fine_coords.shape[0], 0),
                                           jnp.float32),
                           mask=fine_mask)
    nbr3_fine = k3_struct(sv_f, fine_coords.shape[0])

    downs, nbrs = [], []
    cur_coords, cur_mask = fine_coords, fine_mask
    for cap in level_caps:
        ds = sp.downsample_structure(cur_coords, cur_mask, cap)
        sv_l = sp.SparseVoxels(coords=ds.coords,
                               feats=jnp.zeros((cap, 0), jnp.float32),
                               mask=ds.mask)
        nbrs.append(k3_struct(sv_l, cap))
        downs.append(ds)
        cur_coords, cur_mask = ds.coords, ds.mask
    return SpUNetGeometry(
        order0=order0, mask0=mask0, nbr5=nbr5, pix_rep=pix_rep,
        merge_order=merge_order, world=world, fine_mask=fine_mask,
        nbr3_fine=nbr3_fine, downs=tuple(downs), nbrs=tuple(nbrs))


def build_spunet_geometry(data, unprojected, *, grid_size: float,
                          pixel_capacity: int,
                          level_divs: Sequence[int], n_stages: int,
                          use_fusion: bool, conv_impl: str = "gather",
                          block_size: int = 4,
                          block_div: int = 8) -> SpUNetGeometry:
    """Batched SpUNet geometry.

    data: dict with ``grid_coord`` [B, M, 3], ``mask`` [B, M],
    ``coord`` [B, M, 3] world, ``min_coord`` [B, 3];
    unprojected: [B, V, H, W, 4] (ignored when ``use_fusion`` False).

    Per-level capacities mirror ``SpUNet.forward_point_fusion``:
    ``max(M // level_divs[s], 64)``.
    """
    M = data["mask"].shape[1]
    level_caps = tuple(max(M // int(level_divs[s]), 64)
                       for s in range(n_stages))

    def one(grid_coord, mask, coord, min_coord, unproj):
        return _geometry_one(
            grid_coord, mask, coord, min_coord, unproj,
            grid_size=grid_size, pixel_capacity=pixel_capacity,
            level_caps=level_caps, use_fusion=use_fusion,
            conv_impl=conv_impl, block_size=block_size,
            block_div=block_div)

    if use_fusion:
        return jax.vmap(one)(data["grid_coord"], data["mask"],
                             data["coord"], data["min_coord"],
                             unprojected)
    return jax.vmap(lambda g, m, c: one(g, m, c, None, None))(
        data["grid_coord"], data["mask"], data["coord"])
