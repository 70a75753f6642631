"""Static-shape sparse voxel ops for TPU (spconv equivalent).

TPU-native replacement for the external ``spconv`` package the reference
depends on (SparseUNet / PTv3 / scene PointFusion; see SURVEY.md §2.7):
instead of dynamic hash tables + gather-scatter CUDA kernels, a voxel
set is a fixed-capacity array with a validity mask, kept **sorted by a
packed 30-bit grid code**, and every conv becomes

    neighbor-table lookup (vectorized binary search over the sorted
    codes)  ->  flat gather  ->  one [M, K*Cin] @ [K*Cin, Cout] matmul

which maps straight onto the MXU with static shapes. Downsampling /
inverse ("transpose") convolutions reuse the parent-child relation of
stride-2 voxel trees: each fine voxel belongs to exactly one parent, so
a stride-2 SparseConv3d is 8 masked matmuls + one segment-sum, and a
SparseInverseConv3d is a gather from the parent + 8 masked matmuls —
no index structures to persist beyond a per-level ``parent_idx``.

All functions operate on ONE scene (no batch axis); batch via
``jax.vmap``. Mirrors spconv semantics used at reference
pointcept/models/sparse_unet/spconv_unet_v1m1_base.py:153-276 and
fusion/point_fusion.py:159-171.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CODE_BITS = 10          # per-axis bits; grid coords must be < 1024
# np scalar, NOT a jax array: jax-array closure constants get
# lifted to hidden executable parameters (jax 0.9) and the C++
# dispatch fastpath fails to resupply them on cache hits.
INVALID_CODE = np.uint32(0xFFFFFFFF)


class SparseVoxels(NamedTuple):
    """One scene's voxel set, sorted by packed code, padded to capacity.

    coords: [M, 3] int32 grid coords (0 where invalid)
    feats:  [M, C] float
    mask:   [M] bool
    """
    coords: jnp.ndarray
    feats: jnp.ndarray
    mask: jnp.ndarray


def pack_code(coords: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """coords [M, 3] (>=0, < 2^10), mask [M] -> uint32 code; invalid rows
    get INVALID_CODE so they sort to the end."""
    c = jnp.clip(coords, 0, (1 << CODE_BITS) - 1).astype(jnp.uint32)
    code = (c[:, 0] << (2 * CODE_BITS)) | (c[:, 1] << CODE_BITS) | c[:, 2]
    return jnp.where(mask, code, INVALID_CODE)


def canonicalize(coords, feats, mask) -> Tuple[SparseVoxels, jnp.ndarray]:
    """Sort voxels by packed code (invalid at the end). Returns the
    sorted SparseVoxels and the permutation used."""
    code = pack_code(coords, mask)
    order = jnp.argsort(code).astype(jnp.int32)
    return SparseVoxels(coords=jnp.take(coords, order, axis=0),
                        feats=jnp.take(feats, order, axis=0),
                        mask=jnp.take(mask, order, axis=0)), order


def kernel_offsets(kernel_size: int) -> np.ndarray:
    """All 3D offsets of a cubic kernel, center-anchored (odd sizes).
    [K, 3] int32, ordered x-major to match a fixed weight layout."""
    assert kernel_size % 2 == 1
    r = kernel_size // 2
    offs = [(dx, dy, dz)
            for dx in range(-r, r + 1)
            for dy in range(-r, r + 1)
            for dz in range(-r, r + 1)]
    return np.asarray(offs, dtype=np.int32)


def take_elements(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` for a 1-D table — as an 8-wide row gather plus a
    lane compare-sum. TPU element gathers cost ~6.7 ns/element; row
    gathers pay per ROW, so fetching 8-element rows and selecting the
    lane is ~2.4x faster (13.3 -> 5.5 ms at 2M indices)."""
    n = table.shape[0]
    n_pad = -(-n // 8) * 8
    if n_pad != n:
        table = jnp.concatenate(
            [table, jnp.zeros((n_pad - n,), table.dtype)])
    rows = table.reshape(-1, 8)
    shape = idx.shape
    flat = idx.reshape(-1)
    g = jnp.take(rows, flat // 8, axis=0)                 # [N, 8]
    lane = (flat % 8)[:, None] == jnp.arange(8)[None, :]
    return jnp.sum(jnp.where(lane, g, 0), axis=1).astype(
        table.dtype).reshape(shape)


#: hierarchical-search fanouts: 512-code blocks of 16 sub-blocks of 32
_L1, _L2 = 512, 32


def _merge_lookup(codes: jnp.ndarray, tgt: jnp.ndarray,
                  k_chunk: int = 32, return_floor: bool = False):
    """Exact-match lookup of tgt [M, K] in sorted codes [M]. Returns row
    index or -1 (and optionally the floor rank: last code <= target).

    Sort-free hierarchical rank (round 4): rank_right(t) = #codes <= t
    is computed in three levels — a block-max compare-sum (VPU), one
    sub-max row gather + compare, one leaf row gather + compare. Row
    gathers cost ~3 ns/row on TPU, so the whole lookup is
    O(needles) x ~2 row gathers: measured 5x faster than the previous
    batched-merge-sort formulation (113 -> ~20 ms for the 5^3 stem
    table at 102k voxels; XLA's own ``searchsorted`` lowers to a
    serialized gather loop, 24 ms per 433k needles). ``k_chunk`` is
    retained for signature compatibility (unused)."""
    M, K = tgt.shape
    T = codes.shape[0]          # table length (may differ from needles M)
    Mp = -(-T // _L1) * _L1
    cp = codes if Mp == T else jnp.concatenate(
        [codes, jnp.full((Mp - T,), INVALID_CODE, codes.dtype)])
    nb = Mp // _L1
    ns = _L1 // _L2
    blocks = cp.reshape(nb, ns, _L2)
    block_max = blocks[:, -1, -1]                        # [nb]
    sub_max = blocks[:, :, -1]                           # [nb, ns]
    # column 0 = previous block's max, so the floor element at a
    # sub-block boundary is already in the gathered row (no [Q, nb]
    # broadcast, no extra gather)
    prev_last = jnp.concatenate(
        [jnp.full((1,), INVALID_CODE, cp.dtype), block_max[:-1]])
    sub_ext = jnp.concatenate([prev_last[:, None], sub_max], axis=1)
    leaf = cp.reshape(nb * ns, _L2)                      # [nb*ns, L2]

    t = tgt.reshape(-1)                                  # [Q]
    # level 1: containing block = #blocks whose max <= t (sorted codes:
    # later blocks are entirely greater)
    j = jnp.sum(block_max[None, :] <= t[:, None], axis=1,
                dtype=jnp.int32)
    jc = jnp.clip(j, 0, nb - 1)
    # level 2: sub-block within block j
    row2 = jnp.take(sub_ext, jc, axis=0)                 # [Q, ns+1]
    k = jnp.sum(row2[:, 1:] <= t[:, None], axis=1, dtype=jnp.int32)
    kc = jnp.clip(k, 0, ns - 1)
    # level 3: exact count within the leaf
    row3 = jnp.take(leaf, jc * ns + kc, axis=0)          # [Q, L2]
    cnt = jnp.sum(row3 <= t[:, None], axis=1, dtype=jnp.int32)
    rank = j * _L1 + k * _L2 + cnt                       # = #codes <= t
    cand = rank - 1                                      # floor rank

    # code at the floor rank, from values already on hand: the last
    # element counted in the leaf, else the previous sub-block's (or
    # block's) max = row2[:, k]
    def pick(row, i):
        hot = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1) == \
            i[:, None]
        return jnp.sum(jnp.where(hot, row, 0), axis=1).astype(row.dtype)

    floor_val = jnp.where(cnt > 0, pick(row3, cnt - 1), pick(row2, k))
    found = (cand >= 0) & (floor_val == t)
    cand_c = jnp.clip(cand, 0, T - 1)
    res = jnp.where(found, cand_c, -1).reshape(M, K)
    if return_floor:
        # floor may legitimately exceed T-1 only for INVALID targets
        # matching the padding (masked by callers)
        return res, jnp.clip(cand, -1, T - 1).reshape(M, K)
    return res


def find_neighbors(sv: SparseVoxels, offsets: np.ndarray) -> jnp.ndarray:
    """Submanifold neighbor table.

    sv must be canonical (code-sorted, codes unique among valid rows).
    offsets [K, 3] -> idx [M, K] int32 row index of the voxel at
    coords+offset, or -1.

    For centered cubic kernels (the :func:`kernel_offsets` layout) only
    the s^2 dz=0 columns go through the rank lookup; the dz != 0
    columns are resolved from ONE 16-lane code window around the floor
    rank — z is the packed code's low bits, so the codes of all present
    (x+dx, y+dy, z+dz) with abs(dz) <= r occupy ranks
    [floor-r, floor+r], which a two-row aligned gather covers for
    r <= 4. This cuts lookup needles 3x (k3) / 5x (k5) and replaces the
    former 2r take_elements verification passes (7.2 ms each at 84k/25
    groups) with one gather + lane matching."""
    M = sv.coords.shape[0]
    codes = pack_code(sv.coords, sv.mask)  # sorted, invalid at end
    offs = np.asarray(offsets)             # [K, 3] (np: embeds as HLO const)
    K = offs.shape[0]
    s = round(K ** (1.0 / 3.0))
    if s ** 3 == K and np.array_equal(offs, kernel_offsets(s)):
        return _find_neighbors_cubic(sv, codes, s)
    tgt_coords = sv.coords[:, None, :] + offs[None, :, :]      # [M, K, 3]
    in_range = jnp.all(
        (tgt_coords >= 0) & (tgt_coords < (1 << CODE_BITS)), axis=-1)
    tgt_mask = sv.mask[:, None] & in_range
    tgt = pack_code(tgt_coords.reshape(-1, 3),
                    tgt_mask.reshape(-1)).reshape(M, -1)        # [M, K]
    found = _merge_lookup(codes, tgt)
    return jnp.where(tgt == INVALID_CODE, -1, found)


def _find_neighbors_cubic(sv: SparseVoxels, codes: jnp.ndarray,
                          s: int) -> jnp.ndarray:
    """Cubic-kernel fast path of :func:`find_neighbors` (see there)."""
    r = s // 2
    assert r <= 4, "16-lane window covers |dz| <= 4 only"
    M = sv.coords.shape[0]
    lim = 1 << CODE_BITS
    dxdy = np.asarray([(dx, dy)
                       for dx in range(-r, r + 1)
                       for dy in range(-r, r + 1)], np.int32)   # [G, 2]
    txy = sv.coords[:, None, :2] + dxdy[None, :, :]             # [M, G, 2]
    z = sv.coords[:, 2].astype(jnp.int32)
    xy_ok = jnp.all((txy >= 0) & (txy < lim), axis=-1) & sv.mask[:, None]
    tgt0 = jnp.where(
        xy_ok,
        (txy[..., 0].astype(jnp.uint32) << (2 * CODE_BITS))
        | (txy[..., 1].astype(jnp.uint32) << CODE_BITS)
        | z[:, None].astype(jnp.uint32),
        INVALID_CODE)                                           # [M, G]
    found0, floor0 = _merge_lookup(codes, tgt0, return_floor=True)
    # guard: an INVALID target would exact-match the INVALID padding
    # codes at the end of the sorted table
    grp_ok = tgt0 != INVALID_CODE

    # Aligned code window around the floor rank. With unique codes the
    # rank of a present (x+dx, y+dy, z+dz) differs from floor0 by at
    # most |dz| (at most |dz| codes fit strictly between); duplicate
    # codes are LEGAL in the PointFusion merged set with multiplicity
    # <= 2 (3D voxel + pixel voxel, models/sparseunet.py:
    # point_fusion_merge), which doubles the possible gap — candidates
    # live in [floor0 - r_eff, floor0 + r_eff] with r_eff = 2r + 1.
    # The window takes enough aligned 8-rows to cover that span.
    r_eff = 2 * r + 1
    n_rows = -(-(2 * r_eff + 8) // 8)
    n_pad = (-(-M // 8) + n_rows - 1) * 8
    cp = jnp.concatenate(
        [codes, jnp.full((n_pad - M,), INVALID_CODE, codes.dtype)])
    rows8 = cp.reshape(-1, 8)
    base = jnp.clip((floor0 - r_eff) // 8, 0,
                    rows8.shape[0] - n_rows)                    # [M, G]
    win = jnp.concatenate([jnp.take(rows8, base + j, axis=0)
                           for j in range(n_rows)],
                          axis=-1)                         # [M, G, 8*n]
    lane_rank = base[..., None] * 8 + jnp.arange(8 * n_rows,
                                                 dtype=jnp.int32)

    cols = []
    for dz in range(-r, r + 1):
        if dz == 0:
            cols.append(jnp.where(grp_ok, found0, -1))
            continue
        zdz = z[:, None] + dz
        zok = (zdz >= 0) & (zdz < lim)
        t = tgt0 + np.uint32(dz) if dz > 0 else tgt0 - np.uint32(-dz)
        match = win == t[..., None]
        pres = grp_ok & zok & jnp.any(match, axis=-1)
        # max (not sum) of matched lanes: duplicate codes are legal in
        # the PointFusion merged set, and two matches must resolve to
        # the LAST duplicate (the representative _merge_lookup's
        # rank-1 picks), not the sum of both ranks
        cand = jnp.max(jnp.where(match, lane_rank, -1), axis=-1)
        cols.append(jnp.where(pres, cand, -1))
    # x-major layout: column of offset (dx, dy, dz) = group*s + (dz+r)
    return jnp.stack(cols, axis=2).reshape(M, -1)


def _gather_rows(table: jnp.ndarray, idx_col: jnp.ndarray) -> jnp.ndarray:
    """table [M, C], idx_col [M] (-1 = missing) -> [M, C], 0 on miss."""
    safe = jnp.clip(idx_col, 0, table.shape[0] - 1)
    g = jnp.take(table, safe, axis=0)
    return jnp.where((idx_col >= 0)[:, None], g, 0)


def _gather_all(table: jnp.ndarray, nbr_idx: jnp.ndarray) -> jnp.ndarray:
    """Per-column gathers ([M,K] from [M,C] -> [M,K,C]) — measured ~1.6x
    faster than one flat 2.3M-row gather on TPU, and 3x faster than the
    rolled-window formulation at k=3^3/96ch (6.1 vs 18.6 ms at 86k
    voxels, tools/exp_conv_gather.py round 4)."""
    return jnp.stack([_gather_rows(table, nbr_idx[:, k])
                      for k in range(nbr_idx.shape[1])], axis=1)


def _window_gather(table: jnp.ndarray, nbr_idx: jnp.ndarray,
                   s: int) -> jnp.ndarray:
    """Cubic-kernel gather with s-fold fewer rows.

    For an x-major cubic neighbor table, each (dx, dy) group's s
    z-columns point at CONSECUTIVE ranks in the code-sorted voxel array
    (z is the packed code's low bits and codes are unique), so one
    gather of an s-row feature window per group replaces s per-column
    gathers — and TPU gather cost is per-row. The window table is built
    with rolls (no gather); each column selects its sub-block by the
    in-window offset. Exactly equivalent to :func:`_gather_all`."""
    M, C = table.shape
    K = nbr_idx.shape[1]
    G = K // s
    win = jnp.concatenate([jnp.roll(table, -p, axis=0)
                           for p in range(s)], axis=1)   # [M, s*C]
    cols = nbr_idx.reshape(M, G, s)
    a = jnp.min(jnp.where(cols >= 0, cols, M + s), axis=2)  # [M, G]
    wg = jnp.take(win, jnp.clip(a, 0, M - 1), axis=0)    # [M, G, s*C]
    wg = wg.reshape(M, G, s, C)
    o = cols - a[..., None]                              # [M, G, s]
    g = jnp.zeros((M, G, s, C), table.dtype)
    for p in range(s):
        g = g + jnp.where((o == p)[..., None], wg[:, :, p][:, :, None, :],
                          0)
    g = jnp.where((cols >= 0)[..., None], g, 0)
    return g.reshape(M, K, C)


@jax.custom_vjp
def subm_gather_matmul(feats: jnp.ndarray, nbr_idx: jnp.ndarray,
                       weight: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features and contract with the kernel.

    feats [M, Cin], nbr_idx [M, K] (-1 = missing), weight [K, Cin, Cout]
    -> [M, Cout]. Missing neighbors contribute zero (spconv submanifold
    semantics).

    REQUIRES ``nbr_idx`` built by :func:`find_neighbors` from a
    centered cubic :func:`kernel_offsets` table: the custom backward
    exploits the mirror symmetry nbr[i, k] = j <=> nbr[j, K-1-k] = i
    (offset negation reverses the x-major enumeration) to replace the
    gather's scatter-add transpose — ~30 ms per conv at 84k voxels —
    with one flipped gather (~4x faster conv fwd+bwd)."""
    return _subm_conv_apply(feats, nbr_idx, weight)


def _conv_gather(table, nbr_idx):
    """Gather strategy by kernel size (measured, tools/exp_conv_gather.py):
    k=3^3 -> per-column gathers (6.1 ms vs 18.6 window at 86k/96ch: the
    window's s-fold row saving is outweighed by its select-remap
    traffic); k=5^3 -> z-window gather (125 per-column gathers would be
    ~4x the rows of the 25-group window)."""
    K = nbr_idx.shape[1]
    s = round(K ** (1.0 / 3.0))
    if s ** 3 == K and s >= 5:
        return _window_gather(table, nbr_idx, s)
    return _gather_all(table, nbr_idx)


def _subm_conv_apply(feats, nbr_idx, weight):
    M, Cin = feats.shape
    K = nbr_idx.shape[1]
    g = _conv_gather(feats, nbr_idx)                      # [M, K, Cin]
    return jax.lax.dot_general(
        g.reshape(M, K * Cin), weight.reshape(K * Cin, -1),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(feats.dtype)


def _subm_conv_fwd(feats, nbr_idx, weight):
    return _subm_conv_apply(feats, nbr_idx, weight), (feats, nbr_idx,
                                                      weight)


def _subm_conv_bwd(res, dy):
    feats, nbr_idx, weight = res
    M, Cin = feats.shape
    K = nbr_idx.shape[1]
    Cout = dy.shape[-1]
    dy = dy.astype(feats.dtype)
    # G[j, k, :] = dy[i] where nbr[i, k] = j, i.e. a gather through the
    # mirrored offset column (see docstring); 0 where no such i exists.
    # Full column reversal keeps the x-major cubic layout (it is the
    # x-major order of the negated offsets), so the window fast path
    # applies to the flipped table too.
    G = _conv_gather(dy, nbr_idx[:, ::-1])                # [M, K, Cout]
    w_t = jnp.transpose(weight, (0, 2, 1)).reshape(K * Cout, Cin)
    dfeats = jax.lax.dot_general(
        G.reshape(M, K * Cout), w_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(feats.dtype)
    # dW[k, ci, co] = sum_j feats[j, ci] G[j, k, co]
    dw = jax.lax.dot_general(
        G.reshape(M, K * Cout), feats, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [K*Cout, Cin]
    dw = jnp.transpose(dw.reshape(K, Cout, Cin),
                       (0, 2, 1)).astype(weight.dtype)
    d_nbr = np.zeros(nbr_idx.shape, dtype=jax.dtypes.float0)
    return dfeats, d_nbr, dw


subm_gather_matmul.defvjp(_subm_conv_fwd, _subm_conv_bwd)


class BlockStructure(NamedTuple):
    """Block-dense layout of one voxel set (one scene; vmap for batch).

    TPU-native submanifold conv executor (round 5): gathers are
    row-count-bound on TPU (~3 ns/row regardless of width), so the
    gather formulation moves M*K rows per conv (2.27M at the scene fine
    level). Instead, scatter every voxel's features into the HALO
    tensor of the <=8 blocks whose halo contains it (unique targets,
    M*<=8 rows), run ONE batched dense ``conv_general_dilated`` over
    [NB, hs, hs, hs, C] (pure MXU), and gather the M interior outputs
    back. Missing neighbors are zeros in the halo tensor, so the result
    equals spconv submanifold semantics exactly (tests pin it against
    :func:`subm_gather_matmul`).

    scat_idx:    [M, 8] flat target into [NB*hs^3] (== NB*hs^3: dropped)
    out_idx:     [M] flat index into [NB*bs^3] of the voxel's interior
                 cell, -1 for invalid/dropped voxels
    block_valid: [NB] bool (shape carries the static block capacity)
    """
    scat_idx: jnp.ndarray
    out_idx: jnp.ndarray
    block_valid: jnp.ndarray


def block_structure(coords: jnp.ndarray, mask: jnp.ndarray,
                    nb_cap: int, bs: int = 4,
                    halo: int = 1) -> BlockStructure:
    """Block membership + halo scatter targets of a voxel set.

    ``bs`` power-of-two block side; ``halo`` = kernel radius (1 for k3,
    2 for k5), halo <= bs/2. Blocks beyond ``nb_cap`` drop
    deterministically (code order), like every other capacity in this
    module.

    ``coords`` must be code-sorted (canonical). Duplicate coords are
    allowed (the PointFusion merge keeps 3D and pixel voxels at the
    same cell, models/sparseunet.py:point_fusion_merge): only the LAST
    row of a duplicate run scatters its features — the same
    representative the gather path's rank lookup resolves to — while
    every duplicate row still reads the shared interior output."""
    assert bs & (bs - 1) == 0 and halo * 2 <= bs
    shift = bs.bit_length() - 1
    hs = bs + 2 * halo
    M = coords.shape[0]
    vcode = pack_code(coords, mask)
    writer = jnp.concatenate(
        [vcode[:-1] != vcode[1:], np.array([True])]) & mask
    bc = coords >> shift
    bcode = pack_code(bc, mask)

    # dedup blocks (sorted by block code), rank per voxel
    order = jnp.argsort(bcode).astype(jnp.int32)
    bcode_s = jnp.take(bcode, order)
    mask_s = bcode_s != INVALID_CODE
    first = jnp.concatenate(
        [np.array([True]), bcode_s[1:] != bcode_s[:-1]]) & mask_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    ok = mask_s & (seg < nb_cap)
    # sorted table of distinct block codes (INVALID beyond count/cap)
    rep = jnp.where(first & ok, seg, nb_cap)
    btab = jnp.full((nb_cap + 1,), INVALID_CODE, jnp.uint32).at[rep].set(
        bcode_s)[:nb_cap]
    block_valid = btab != INVALID_CODE
    # own block rank per voxel, original order
    own = jnp.zeros((M,), jnp.int32).at[order].set(
        jnp.where(ok, seg, -1))
    own = jnp.where(mask, own, -1)

    local = coords - (bc << shift)                       # [M, 3]
    # halo membership direction per axis: a voxel sits in the halo of
    # the -1 neighbor iff local < halo, of +1 iff local >= bs - halo
    # (exclusive for halo <= bs/2)
    d = jnp.where(local < halo, -1,
                  jnp.where(local >= bs - halo, 1, 0))   # [M, 3]

    cols, drop = [], nb_cap * hs ** 3
    for sx in (0, 1):
        for sy in (0, 1):
            for sz in (0, 1):
                s = np.array([sx, sy, sz], np.int32)
                off = d * s[None, :]
                slot_ok = writer & (own >= 0)
                if (sx, sy, sz) != (0, 0, 0):
                    # a selected axis must actually have a neighbor
                    live = jnp.ones((M,), bool)
                    for a, sa in enumerate((sx, sy, sz)):
                        if sa:
                            live = live & (d[:, a] != 0)
                    slot_ok = slot_ok & live
                tb = bc + off
                in_range = jnp.all(
                    (tb >= 0) & (tb < (1 << CODE_BITS)), axis=-1)
                slot_ok = slot_ok & in_range
                tcode = pack_code(tb, slot_ok)
                if (sx, sy, sz) == (0, 0, 0):
                    rank = own
                else:
                    rank = _merge_lookup(btab, tcode[:, None])[:, 0]
                pos = coords - (tb << shift) + halo      # in [0, hs)
                flat = (rank * hs ** 3 + pos[:, 0] * hs * hs
                        + pos[:, 1] * hs + pos[:, 2])
                cols.append(jnp.where(slot_ok & (rank >= 0), flat, drop))
    out_idx = jnp.where(
        (own >= 0) & mask,
        own * bs ** 3 + local[:, 0] * bs * bs + local[:, 1] * bs
        + local[:, 2], -1)
    return BlockStructure(scat_idx=jnp.stack(cols, axis=1),
                          out_idx=out_idx, block_valid=block_valid)


def block_conv_apply(feats: jnp.ndarray, bst: BlockStructure,
                     weight: jnp.ndarray, bs: int = 4) -> jnp.ndarray:
    """Submanifold conv over a :class:`BlockStructure`.

    feats [M, Cin], weight [k^3, Cin, Cout] in :func:`kernel_offsets`
    x-major layout -> [M, Cout] (0 on invalid/dropped rows). Exactly
    equivalent to :func:`subm_gather_matmul` over the same voxel set
    (modulo fp summation order). Plain jax ops end to end, so autodiff
    handles the backward: the scatter's transpose is the (unique-index)
    gather, and the conv backward is two more dense convs on the MXU.
    """
    M, Cin = feats.shape
    K = weight.shape[0]
    k = round(K ** (1.0 / 3.0))
    assert k ** 3 == K
    hs = bs + (k - 1)
    NB = bst.block_valid.shape[0]
    D = bst.scat_idx.shape[1]

    src = jnp.broadcast_to(feats[:, None, :], (M, D, Cin)).reshape(
        M * D, Cin)
    halo = jnp.zeros((NB * hs ** 3, Cin), feats.dtype).at[
        bst.scat_idx.reshape(-1)].add(src, mode="drop",
                                      unique_indices=True)
    halo = halo.reshape(NB, hs, hs, hs, Cin)
    # no preferred_element_type: an f32 output would make autodiff feed
    # an f32 cotangent into the bf16 transpose convs. XLA's TPU conv
    # accumulates bf16 inputs in f32 internally, so the bf16 output
    # matches the gather path's f32-accumulate + cast numerics.
    out = jax.lax.conv_general_dilated(
        halo, weight.reshape(k, k, k, Cin, -1).astype(feats.dtype),
        window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))   # [NB, bs^3, Cout]
    flat = out.reshape(NB * bs ** 3, -1).astype(feats.dtype)
    safe = jnp.clip(bst.out_idx, 0, flat.shape[0] - 1)
    y = jnp.take(flat, safe, axis=0)
    return jnp.where((bst.out_idx >= 0)[:, None], y, 0.0)


class Downsampled(NamedTuple):
    sv: SparseVoxels            # coarse level (canonical)
    parent_idx: jnp.ndarray     # [M_fine] coarse row of each fine voxel (-1)
    child_offset: jnp.ndarray   # [M_fine] kernel slot in [0, 8)


class DownStructure(NamedTuple):
    """Geometry of one stride-2 downsample level — a pure function of the
    fine coords/mask, independent of features and parameters, so it can
    be precomputed once per batch outside the jitted train step (see
    models/scene_geometry.py).

    order:        [M_fine] fine rows sorted by parent code
    seg:          [M_fine] output slot per SORTED child (capacity = drop)
    slot_sorted:  [M_fine] kernel slot in [0, 8) per SORTED child
    valid_sorted: [M_fine] validity per SORTED child
    coords/mask:  the coarse voxel set (canonical)
    parent_idx:   [M_fine] coarse row per fine voxel, ORIGINAL order (-1)
    child_offset: [M_fine] kernel slot per fine voxel, ORIGINAL order
    """
    order: jnp.ndarray
    seg: jnp.ndarray
    slot_sorted: jnp.ndarray
    valid_sorted: jnp.ndarray
    coords: jnp.ndarray
    mask: jnp.ndarray
    parent_idx: jnp.ndarray
    child_offset: jnp.ndarray


def downsample_structure(coords: jnp.ndarray, mask: jnp.ndarray,
                         capacity_out: int) -> DownStructure:
    """Geometry half of :func:`downsample`: distinct parents
    (coords >> 1), child->parent maps and kernel slots.

    Note: the packed code is lexicographic, so parent codes are NOT
    monotone under the child-code sort — the children are re-sorted by
    parent code before the adjacency dedup."""
    M = coords.shape[0]
    parent = coords >> 1
    pcode = pack_code(parent, mask)
    order = jnp.argsort(pcode).astype(jnp.int32)     # children by parent
    pcode_s = jnp.take(pcode, order)
    parent_s = jnp.take(parent, order, axis=0)
    coords_s = jnp.take(coords, order, axis=0)
    mask_s = pcode_s != INVALID_CODE

    first = jnp.concatenate(
        [np.array([True]), pcode_s[1:] != pcode_s[:-1]]) & mask_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1    # [M] parent slot
    seg = jnp.where(mask_s & (seg < capacity_out), seg, capacity_out)
    seg_rep = jnp.where(first, seg, capacity_out)    # one writer per slot

    out_mask = jnp.zeros((capacity_out + 1,), bool).at[seg_rep].set(
        True)[:capacity_out]
    out_coords = jnp.zeros((capacity_out + 1, 3), jnp.int32).at[
        seg_rep].set(parent_s)[:capacity_out]

    child = coords_s & 1
    slot = (child[:, 0] * 4 + child[:, 1] * 2 + child[:, 2]).astype(
        jnp.int32)                                   # [M] in [0,8)

    # map back to the original fine-row order
    parent_idx = jnp.zeros((M,), jnp.int32).at[order].set(
        jnp.where(seg < capacity_out, seg, -1))
    parent_idx = jnp.where(mask, parent_idx, -1)
    child_orig = coords & 1
    slot_orig = (child_orig[:, 0] * 4 + child_orig[:, 1] * 2
                 + child_orig[:, 2]).astype(jnp.int32)
    return DownStructure(
        order=order, seg=seg, slot_sorted=slot, valid_sorted=mask_s,
        coords=jnp.where(out_mask[:, None], out_coords, 0),
        mask=out_mask, parent_idx=parent_idx, child_offset=slot_orig)


def downsample_apply(ds: DownStructure, feats: jnp.ndarray,
                     weight: jnp.ndarray) -> jnp.ndarray:
    """Feature half of :func:`downsample`:
    y[parent] = sum_children W[slot(child)] x[child]. weight [8, Cin,
    Cout] -> coarse feats [capacity_out, Cout] (0 on invalid rows)."""
    capacity_out = ds.mask.shape[0]
    feats_s = jnp.take(feats, ds.order, axis=0)
    Cout = weight.shape[-1]
    contrib = jnp.zeros((feats.shape[0], Cout), dtype=feats.dtype)
    for k in range(8):
        sel = (ds.slot_sorted == k) & ds.valid_sorted
        xk = jnp.where(sel[:, None], feats_s, 0.0)
        contrib = contrib + jnp.dot(
            xk, weight[k], preferred_element_type=jnp.float32
        ).astype(feats.dtype)
    out_feats = jnp.zeros((capacity_out + 1, Cout),
                          dtype=feats.dtype).at[ds.seg].add(
        contrib)[:capacity_out]
    return jnp.where(ds.mask[:, None], out_feats, 0.0)


def downsample(sv: SparseVoxels, weight: jnp.ndarray,
               capacity_out: int) -> Downsampled:
    """SparseConv3d(kernel=2, stride=2) (reference
    spconv_unet_v1m1_base.py:208-218): output voxel set = distinct
    parents (coords >> 1); y[parent] = sum_children W[slot(child)] x[child]
    where slot = child coords & 1 packed as x*4+y*2+z.

    weight: [8, Cin, Cout]. Parents beyond capacity_out are dropped
    (sorted order keeps the drop deterministic). Composition of
    :func:`downsample_structure` + :func:`downsample_apply`."""
    ds = downsample_structure(sv.coords, sv.mask, capacity_out)
    out_feats = downsample_apply(ds, sv.feats, weight)
    out = SparseVoxels(coords=ds.coords, feats=out_feats, mask=ds.mask)
    return Downsampled(sv=out, parent_idx=ds.parent_idx,
                       child_offset=ds.child_offset)


def inverse_conv(parent_idx: jnp.ndarray, child_offset: jnp.ndarray,
                 coarse_feats: jnp.ndarray, fine_mask: jnp.ndarray,
                 weight: jnp.ndarray) -> jnp.ndarray:
    """SparseInverseConv3d(kernel=2) back to the fine voxel set
    (reference :245-256): y[child] = W[slot(child)] x[parent].

    parent_idx/child_offset from :class:`DownStructure` (original fine
    order), coarse_feats [M_coarse, Cin], weight [8, Cin, Cout] ->
    [M_fine, Cout]."""
    Mc = coarse_feats.shape[0]
    safe = jnp.clip(parent_idx, 0, Mc - 1)
    gathered = jnp.take(coarse_feats, safe, axis=0)  # [M_fine, Cin]
    valid = (parent_idx >= 0) & fine_mask
    gathered = jnp.where(valid[:, None], gathered, 0.0)
    Cout = weight.shape[-1]
    out = jnp.zeros((gathered.shape[0], Cout), dtype=coarse_feats.dtype)
    for k in range(8):
        sel = (child_offset == k) & valid
        xk = jnp.where(sel[:, None], gathered, 0.0)
        out = out + jnp.dot(xk, weight[k],
                            preferred_element_type=jnp.float32
                            ).astype(coarse_feats.dtype)
    return out


def voxelize(points: jnp.ndarray, feats: jnp.ndarray, mask: jnp.ndarray,
             grid_size: float, min_coord: jnp.ndarray,
             capacity: int) -> Tuple[SparseVoxels, jnp.ndarray, jnp.ndarray]:
    """GridSample-style dedup: one representative (first in code order)
    per occupied voxel (reference
    pointcept/datasets/transform_with_extrinsic.py:1179-1327, train mode,
    shared ``min_coord`` with the 3D branch as in point_fusion.py:64-73).

    points [N, 3] world coords, feats [N, C], mask [N] ->
    (SparseVoxels (canonical, capacity rows), rep_idx [capacity] input row
    of each kept voxel (-1), world_coords [capacity, 3] of the rep).
    """
    g = jnp.floor((points - min_coord[None, :]) / grid_size).astype(jnp.int32)
    g = jnp.clip(g, 0, (1 << CODE_BITS) - 1)
    code = pack_code(g, mask)
    order = jnp.argsort(code).astype(jnp.int32)
    code_s = jnp.take(code, order)
    g_s = jnp.take(g, order, axis=0)
    f_s = jnp.take(feats, order, axis=0)
    p_s = jnp.take(points, order, axis=0)
    m_s = code_s != INVALID_CODE

    first = jnp.concatenate(
        [np.array([True]), code_s[1:] != code_s[:-1]]) & m_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(first, seg, capacity)  # only reps scatter

    out_mask = jnp.zeros((capacity + 1,), bool).at[seg].set(
        True, mode="drop")[:capacity]
    out_coords = jnp.zeros((capacity + 1, 3), jnp.int32).at[seg].set(
        g_s, mode="drop")[:capacity]
    out_feats = jnp.zeros((capacity + 1, feats.shape[-1]),
                          dtype=feats.dtype).at[seg].set(
        f_s, mode="drop")[:capacity]
    rep = jnp.full((capacity + 1,), -1, jnp.int32).at[seg].set(
        order, mode="drop")[:capacity]
    world = jnp.zeros((capacity + 1, 3), dtype=points.dtype).at[seg].set(
        p_s, mode="drop")[:capacity]
    sv = SparseVoxels(coords=out_coords, feats=out_feats, mask=out_mask)
    return sv, rep, world


def merge_voxel_sets(a_coords, a_feats, a_mask, b_coords, b_feats, b_mask
                     ) -> Tuple[SparseVoxels, jnp.ndarray]:
    """Concatenate two voxel sets (duplicates allowed, as the reference's
    PointFusion concatenates indices, point_fusion.py:159-168) and
    re-canonicalize. Returns the merged set and the permutation applied
    to the concatenated rows (first len(a) rows are a's)."""
    coords = jnp.concatenate([a_coords, b_coords], axis=0)
    feats = jnp.concatenate([a_feats, b_feats], axis=0)
    mask = jnp.concatenate([a_mask, b_mask], axis=0)
    return canonicalize(coords, feats, mask)


class Clustered(NamedTuple):
    coords: jnp.ndarray       # [cap, 3] coarse grid coords
    mask: jnp.ndarray         # [cap]
    parent_idx: jnp.ndarray   # [M_fine] coarse row per fine voxel (-1)


def pool_clusters(coords: jnp.ndarray, mask: jnp.ndarray,
                  capacity_out: int) -> Clustered:
    """Stride-2 cluster structure without features: distinct parents
    (coords >> 1) and the fine->coarse mapping. Backs PTv3's
    SerializedPooling (reference point_transformer_v3m1_base.py:344-447,
    whose code-prefix clustering equals coords>>1 for z-orders)."""
    M = coords.shape[0]
    parent = coords >> 1
    pcode = pack_code(parent, mask)
    order = jnp.argsort(pcode).astype(jnp.int32)
    pcode_s = jnp.take(pcode, order)
    parent_s = jnp.take(parent, order, axis=0)
    mask_s = pcode_s != INVALID_CODE
    first = jnp.concatenate(
        [np.array([True]), pcode_s[1:] != pcode_s[:-1]]) & mask_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(mask_s & (seg < capacity_out), seg, capacity_out)
    seg_rep = jnp.where(first, seg, capacity_out)
    out_mask = jnp.zeros((capacity_out + 1,), bool).at[seg_rep].set(
        True)[:capacity_out]
    out_coords = jnp.zeros((capacity_out + 1, 3), jnp.int32).at[
        seg_rep].set(parent_s)[:capacity_out]
    parent_idx = jnp.zeros((M,), jnp.int32).at[order].set(
        jnp.where(seg < capacity_out, seg, -1))
    parent_idx = jnp.where(mask, parent_idx, -1)
    return Clustered(coords=jnp.where(out_mask[:, None], out_coords, 0),
                     mask=out_mask, parent_idx=parent_idx)


def segment_reduce(values: jnp.ndarray, seg_idx: jnp.ndarray,
                   capacity: int, reduce: str = "max") -> jnp.ndarray:
    """Masked segment reduction: values [M, C], seg_idx [M] (-1 = skip)
    -> [capacity, C]. ``reduce`` in {max, sum, mean} (torch_scatter
    segment_csr equivalent used by PTv3 pooling)."""
    C = values.shape[-1]
    ok = seg_idx >= 0
    tgt = jnp.where(ok, seg_idx, capacity)
    if reduce == "max":
        neg = jnp.finfo(values.dtype).min
        v = jnp.where(ok[:, None], values, neg)
        out = jnp.full((capacity + 1, C), neg, values.dtype).at[tgt].max(v)
        out = out[:capacity]
        return jnp.where(out == neg, 0.0, out)
    v = jnp.where(ok[:, None], values, 0.0)
    out = jnp.zeros((capacity + 1, C), values.dtype).at[tgt].add(v)[:capacity]
    if reduce == "mean":
        cnt = jnp.zeros((capacity + 1,), values.dtype).at[tgt].add(
            ok.astype(values.dtype))[:capacity]
        out = out / jnp.maximum(cnt[:, None], 1.0)
    return out
