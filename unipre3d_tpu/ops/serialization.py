"""Space-filling-curve serialization codes (z-order / Hilbert / axis orders).

TPU-native equivalent of the reference's serialization infrastructure
(reference pointcept/models/utils/serialization/{z_order,hilbert}.py and
openpoints/models/PCM/serialization.py): point clouds are sorted by a
space-filling-curve code of their voxel coordinate so that sequence models
(PTv3 patch attention, PCM mamba orders) see spatially-coherent 1D orders.

Design differences from the reference:

* Codes are 3*depth-bit integers in **uint32** (depth <= 10). Batch index
  is NOT packed into the key — the TPU build keeps an explicit padded
  ``[B, N]`` batch layout, so per-batch sorting is just a batched argsort
  and no 48-bit/int64 keys are needed.
* Bit interleaving and the Hilbert transform are expressed as static
  Python loops over bit positions (unrolled at trace time) of vectorized
  uint32 ops — no LUTs, no host round-trips.

Hilbert encoding follows Skilling's public-domain "Programming the Hilbert
curve" axes->transpose algorithm, the same one the reference's torch
implementation uses.

Supported order names (superset of reference PCM.py:87-97 and
structure.py:47-102): ``z``, ``z-trans``, ``hilbert``, ``hilbert-trans``,
and the six axis permutations ``xyz, xzy, yxz, yzx, zxy, zyx``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_DEPTH = 10  # 3*10 = 30 bits in uint32

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans",
          "xyz", "xzy", "yxz", "yzx", "zxy", "zyx")

_PERMS = {
    "xyz": (0, 1, 2), "xzy": (0, 2, 1), "yxz": (1, 0, 2),
    "yzx": (1, 2, 0), "zxy": (2, 0, 1), "zyx": (2, 1, 0),
}


def _check_depth(depth: int) -> None:
    if not (0 < depth <= MAX_DEPTH):
        raise ValueError(f"depth must be in [1, {MAX_DEPTH}], got {depth}")


@functools.partial(jax.jit, static_argnames=("depth",))
def z_order_encode(grid_coord: jnp.ndarray, depth: int = MAX_DEPTH) -> jnp.ndarray:
    """Morton code: interleave bits of (x, y, z).

    grid_coord: [..., 3] int -> [...] uint32. Bit i of x lands at 3i+2,
    y at 3i+1, z at 3i (x most significant within each triple).
    """
    _check_depth(depth)
    g = grid_coord.astype(jnp.uint32)
    x, y, z = g[..., 0], g[..., 1], g[..., 2]
    code = jnp.zeros_like(x)
    for i in range(depth):
        code = code | (((x >> i) & 1) << (3 * i + 2))
        code = code | (((y >> i) & 1) << (3 * i + 1))
        code = code | (((z >> i) & 1) << (3 * i))
    return code


@functools.partial(jax.jit, static_argnames=("depth",))
def z_order_decode(code: jnp.ndarray, depth: int = MAX_DEPTH) -> jnp.ndarray:
    """Inverse of ``z_order_encode``: [...] uint32 -> [..., 3] int32."""
    _check_depth(depth)
    c = code.astype(jnp.uint32)
    x = jnp.zeros_like(c)
    y = jnp.zeros_like(c)
    z = jnp.zeros_like(c)
    for i in range(depth):
        x = x | (((c >> (3 * i + 2)) & 1) << i)
        y = y | (((c >> (3 * i + 1)) & 1) << i)
        z = z | (((c >> (3 * i)) & 1) << i)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("depth",))
def hilbert_encode(grid_coord: jnp.ndarray, depth: int = MAX_DEPTH) -> jnp.ndarray:
    """3D Hilbert-curve index of voxel coordinates (Skilling transform).

    grid_coord: [..., 3] int in [0, 2^depth) -> [...] uint32 in
    [0, 2^(3*depth)).
    """
    _check_depth(depth)
    g = grid_coord.astype(jnp.uint32)
    X = [g[..., 0], g[..., 1], g[..., 2]]
    n = 3
    M = jnp.uint32(1 << (depth - 1))

    # Axes -> transpose (Skilling). Static loop over bit planes.
    Q = 1 << (depth - 1)
    while Q > 1:
        P = jnp.uint32(Q - 1)
        Qc = jnp.uint32(Q)
        for i in range(n):
            hi = (X[i] & Qc) != 0
            # invert low bits of X[0], or exchange low bits of X[0]<->X[i]
            t = (X[0] ^ X[i]) & P
            X0_inv = X[0] ^ P
            X0_exc = X[0] ^ t
            Xi_exc = X[i] ^ t
            X[0] = jnp.where(hi, X0_inv, X0_exc)
            if i != 0:
                X[i] = jnp.where(hi, X[i], Xi_exc)
        Q >>= 1

    # Gray encode
    for i in range(1, n):
        X[i] = X[i] ^ X[i - 1]
    t = jnp.zeros_like(X[0])
    Q = 1 << (depth - 1)
    while Q > 1:
        cond = (X[n - 1] & jnp.uint32(Q)) != 0
        t = jnp.where(cond, t ^ jnp.uint32(Q - 1), t)
        Q >>= 1
    for i in range(n):
        X[i] = X[i] ^ t

    # Interleave transpose bits: bit b of X[i] -> output bit 3*b + (2 - i)
    code = jnp.zeros_like(X[0])
    for b in range(depth):
        for i in range(n):
            code = code | (((X[i] >> b) & 1) << (n * b + (n - 1 - i)))
    return code


@functools.partial(jax.jit, static_argnames=("depth",))
def hilbert_decode(code: jnp.ndarray, depth: int = MAX_DEPTH) -> jnp.ndarray:
    """Inverse Hilbert: [...] uint32 -> [..., 3] int32."""
    _check_depth(depth)
    c = code.astype(jnp.uint32)
    n = 3
    # De-interleave into transpose form
    X = [jnp.zeros_like(c) for _ in range(n)]
    for b in range(depth):
        for i in range(n):
            X[i] = X[i] | (((c >> (n * b + (n - 1 - i))) & 1) << b)

    N_top = jnp.uint32(2 << (depth - 1))
    # Gray decode by H ^ (H/2)
    t = X[n - 1] >> 1
    for i in range(n - 1, 0, -1):
        X[i] = X[i] ^ X[i - 1]
    X[0] = X[0] ^ t

    # Undo excess work
    Q = 2
    while Q != (1 << depth):
        P = jnp.uint32(Q - 1)
        Qc = jnp.uint32(Q)
        for i in range(n - 1, -1, -1):
            hi = (X[i] & Qc) != 0
            tt = (X[0] ^ X[i]) & P
            X0_inv = X[0] ^ P
            X0_exc = X[0] ^ tt
            Xi_exc = X[i] ^ tt
            X[0] = jnp.where(hi, X0_inv, X0_exc)
            if i != 0:
                X[i] = jnp.where(hi, X[i], Xi_exc)
        Q <<= 1
    del N_top
    return jnp.stack(X, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("order", "depth"))
def encode(grid_coord: jnp.ndarray, order: str = "z",
           depth: int = MAX_DEPTH) -> jnp.ndarray:
    """Serialization code for one order name (see module docstring).

    grid_coord: [..., 3] non-negative ints < 2^depth -> [...] uint32.
    ``*-trans`` variants swap the x/y axes before encoding, matching the
    reference's transposed orders.
    """
    if order == "z":
        return z_order_encode(grid_coord, depth)
    if order == "z-trans":
        return z_order_encode(grid_coord[..., np.array([1, 0, 2])], depth)
    if order == "hilbert":
        return hilbert_encode(grid_coord, depth)
    if order == "hilbert-trans":
        return hilbert_encode(grid_coord[..., np.array([1, 0, 2])], depth)
    if order in _PERMS:
        p = _PERMS[order]
        g = grid_coord.astype(jnp.uint32)
        return ((g[..., p[0]] << (2 * depth)) | (g[..., p[1]] << depth)
                | g[..., p[2]])
    raise ValueError(f"unknown serialization order: {order}")


@functools.partial(jax.jit, static_argnames=("depth",))
def grid_coord_from_points(points: jnp.ndarray, grid_size: float,
                           depth: int = MAX_DEPTH) -> jnp.ndarray:
    """Voxelize float coords to per-batch-min-anchored grid coords clipped
    to the depth range. points: [B, N, 3] -> [B, N, 3] int32."""
    mins = jnp.min(points, axis=-2, keepdims=True)
    g = jnp.floor((points - mins) / grid_size).astype(jnp.int32)
    return jnp.clip(g, 0, (1 << depth) - 1)
