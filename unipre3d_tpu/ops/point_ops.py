"""Batched point-cloud primitives: FPS, kNN, ball query, grouping,
three-NN interpolation.

TPU-first reimplementation of the reference's pointnet2 CUDA kernel set
(reference openpoints/cpp/pointnet2_batch/src/*.cu, wrapped at
openpoints/models/layers/{subsample,group}.py). Semantics match the CUDA
ops bit-for-bit where they matter:

* ``furthest_point_sample`` seeds with index 0 and iteratively picks the
  point maximizing the min-distance to the selected set
  (sampling_gpu.cu parallel-reduction FPS).
* ``ball_query`` returns the first ``nsample`` in-radius indices in point
  order, padding with the *first* in-radius index; centers with no
  neighbor get index 0 (ball_query_gpu.cu:35-50, strict ``d2 < r^2``).
* ``three_nn``/``three_interpolate`` use inverse-distance weights over the
  3 nearest support points (interpolate_gpu.cu).

All functions are shape-static, fully differentiable where the reference's
autograd Functions are (gather/grouping/interpolation carry gradients;
index computations do not), and jit/vmap/shard_map friendly. Distance
matrices are computed via a single MXU matmul (``-2 x@y^T + |x|^2 +
|y|^2``) rather than pairwise loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distances.

    src: [B, N, C], dst: [B, M, C] -> [B, N, M].
    """
    # HIGHEST precision: neighbor selection is sensitive to matmul error
    # (default TPU matmul precision is bf16-ish and shifts d2 by ~1e-2).
    dist = -2.0 * jnp.einsum(
        "bnc,bmc->bnm", src, dst, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    dist += jnp.sum(src.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    dist += jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)[:, None, :]
    return dist


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative farthest point sampling.

    xyz: [B, N, 3] -> indices [B, npoint] int32. First index is always 0,
    matching the reference CUDA kernel.
    """
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    sq_norm = jnp.sum(xyz * xyz, axis=-1)  # [B, N]

    def step(carry, _):
        min_dist, last_idx = carry
        last = jnp.take_along_axis(xyz, last_idx[:, None, None], axis=1)  # [B,1,3]
        last_sq = jnp.take_along_axis(sq_norm, last_idx[:, None], axis=1)  # [B,1]
        d = sq_norm - 2.0 * jnp.einsum(
            "bnc,bmc->bn", xyz, last, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32) + last_sq
        min_dist = jnp.minimum(min_dist, d)
        nxt = jnp.argmax(min_dist, axis=-1).astype(jnp.int32)
        return (min_dist, nxt), nxt

    init_idx = jnp.zeros((B,), dtype=jnp.int32)
    init_dist = jnp.full((B, N), 1e10, dtype=jnp.float32)
    (_, _), rest = jax.lax.scan(step, (init_dist, init_idx), None,
                                length=npoint - 1)
    return jnp.concatenate([init_idx[:, None], rest.T.astype(jnp.int32)], axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def knn(query: jnp.ndarray, support: jnp.ndarray, k: int):
    """k nearest neighbors of each query among support points.

    query: [B, M, 3], support: [B, N, 3] ->
    (dists [B, M, k] sorted ascending, idx [B, M, k] int32).
    """
    d2 = square_distance(query, support)  # [B, M, N]
    neg_d, idx = jax.lax.top_k(-d2, k)
    return -neg_d, idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("nsample",))
def ball_query(radius: float, nsample: int, support: jnp.ndarray,
               query: jnp.ndarray) -> jnp.ndarray:
    """Fixed-radius neighborhood query with CUDA-parity semantics.

    support: [B, N, 3] all points, query: [B, M, 3] ball centers ->
    idx [B, M, nsample] int32. Selects the first ``nsample`` support
    indices (in index order) with d2 < radius^2; slots beyond the found
    count are filled with the first found index (or 0 if none found).
    """
    B, N, _ = support.shape
    d2 = square_distance(query, support)  # [B, M, N]
    inball = d2 < radius * radius
    # Stable compaction: in-ball indices first, preserving index order.
    order_key = jnp.where(inball,
                          jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2),
                          N + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2))
    sorted_idx = jnp.argsort(order_key, axis=-1).astype(jnp.int32)[..., :nsample]
    count = jnp.sum(inball, axis=-1, dtype=jnp.int32)  # [B, M]
    first = sorted_idx[..., 0:1]
    first = jnp.where(count[..., None] > 0, first, 0)
    slot = jax.lax.broadcasted_iota(jnp.int32, sorted_idx.shape, 2)
    return jnp.where(slot < count[..., None], sorted_idx, first)


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather: points [B, N, C], idx [B, ...] -> [B, ..., C].

    Equivalent of reference ``index_points`` / ``gather_operation``
    (differentiable through the gather).
    """
    B = points.shape[0]
    flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(*idx.shape, points.shape[-1])


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Grouping: points [B, N, C], idx [B, M, K] -> [B, M, K, C]
    (reference ``grouping_operation``, channel-last layout)."""
    return index_points(points, idx)


@jax.jit
def three_nn(query: jnp.ndarray, support: jnp.ndarray):
    """3 nearest support points per query: -> (dists [B,M,3], idx [B,M,3])."""
    return knn(query, support, 3)


@jax.jit
def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      dists: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance weighted interpolation.

    features: [B, N, C] support features, idx/dists: [B, M, 3] ->
    [B, M, C]. Weights 1/(d+1e-8) normalized, matching reference
    PointNetFeaturePropagation (openpoints pointmlp.py:356-422).
    """
    w = 1.0 / (dists + 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    gathered = index_points(features, idx)  # [B, M, 3, C]
    return jnp.sum(gathered * w[..., None], axis=2)


@functools.partial(jax.jit, static_argnames=("num_groups", "group_size",
                                             "use_knn"))
def subsample_group(pts: jnp.ndarray, num_groups: int, group_size: int,
                    radius: float = 0.1, use_knn: bool = False):
    """FPS centers + neighborhood grouping with center-relative coords.

    pts: [B, N, 3] -> (neighborhood [B, G, K, 3] relative to centers,
    centers [B, G, 3]). Mirrors reference ``SubsampleGroup``
    (openpoints/models/layers/group_embed.py:14-59): FPS then ball query
    (default) or kNN, grouped coords made relative to the query center.
    """
    fps_idx = furthest_point_sample(pts, num_groups)
    centers = index_points(pts, fps_idx)  # [B, G, 3]
    if use_knn:
        _, idx = knn(centers, pts, group_size)
    else:
        idx = ball_query(radius, group_size, pts, centers)
    grouped = index_points(pts, idx)  # [B, G, K, 3]
    return grouped - centers[:, :, None, :], centers
