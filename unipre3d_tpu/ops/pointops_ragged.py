"""Offset-based (ragged) point ops over concatenated clouds.

TPU-native equivalent of the reference's ``pointops_cuda`` extension
(reference openpoints/cpp/pointops/src/* wrapped at
openpoints/cpp/pointops/functions/pointops.py): scene-style pipelines
concatenate variable-size clouds into one [N_total, 3] array with a
cumulative ``offset`` vector. On TPU the ragged structure is expressed
with a per-point batch id and masked pairwise distances — queries never
cross scene boundaries — over static shapes.

All functions take/return flat arrays + offsets exactly like the
reference wrappers (knnquery/ballquery/interpolation/grouping); the
batch-id masking replaces the CUDA kernels' per-offset loops.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def offset2batch(offset: jnp.ndarray, n_total: int) -> jnp.ndarray:
    """Cumulative offsets [B] -> per-point batch id [n_total]
    (reference pointcept offset2batch)."""
    idx = jnp.arange(n_total)
    return jnp.sum(idx[:, None] >= offset[None, :], axis=1).astype(jnp.int32)


def _masked_d2(query, q_batch, support, s_batch):
    """Pairwise squared distances with cross-scene pairs set to +inf."""
    d2 = (jnp.sum(query ** 2, 1)[:, None] + jnp.sum(support ** 2, 1)[None]
          - 2.0 * jnp.einsum("nc,mc->nm", query, support,
                             precision=jax.lax.Precision.HIGHEST))
    same = q_batch[:, None] == s_batch[None, :]
    return jnp.where(same, d2, jnp.inf)


@functools.partial(jax.jit, static_argnames=("nsample",))
def knn_query(nsample: int, support: jnp.ndarray, s_offset: jnp.ndarray,
              query: jnp.ndarray, q_offset: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ragged kNN (reference knnquery): returns (idx [Nq, k],
    dist [Nq, k]) with flat support indices, never crossing offsets."""
    qb = offset2batch(q_offset, query.shape[0])
    sb = offset2batch(s_offset, support.shape[0])
    d2 = _masked_d2(query[:, :3], qb, support[:, :3], sb)
    neg, idx = jax.lax.top_k(-d2, nsample)
    return idx.astype(jnp.int32), jnp.sqrt(jnp.maximum(-neg, 0.0))


@functools.partial(jax.jit, static_argnames=("nsample",))
def ball_query(radius: float, nsample: int, support: jnp.ndarray,
               s_offset: jnp.ndarray, query: jnp.ndarray,
               q_offset: jnp.ndarray) -> jnp.ndarray:
    """Ragged fixed-radius query (reference ballquery): first nsample
    in-radius support indices per query, padded with the first hit."""
    qb = offset2batch(q_offset, query.shape[0])
    sb = offset2batch(s_offset, support.shape[0])
    d2 = _masked_d2(query[:, :3], qb, support[:, :3], sb)
    inball = d2 < radius * radius
    Ns = support.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    key = jnp.where(inball, iota, Ns + iota)
    srt = jnp.argsort(key, axis=1).astype(jnp.int32)[:, :nsample]
    count = jnp.sum(inball, axis=1, dtype=jnp.int32)
    first = jnp.where(count[:, None] > 0, srt[:, :1], 0)
    slot = jax.lax.broadcasted_iota(jnp.int32, srt.shape, 1)
    return jnp.where(slot < count[:, None], srt, first)


def grouping(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Flat gather (reference grouping): feats [N, C], idx [M, K] ->
    [M, K, C]."""
    return jnp.take(feats, idx.reshape(-1), axis=0).reshape(
        *idx.shape, feats.shape[-1])


@jax.jit
def interpolation(support: jnp.ndarray, s_offset: jnp.ndarray,
                  query: jnp.ndarray, q_offset: jnp.ndarray,
                  feats: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Ragged 3-NN inverse-distance interpolation (reference
    interpolation): support/query flat coords + offsets, feats [Ns, C]
    -> [Nq, C]."""
    idx, dist = knn_query(k, support, s_offset, query, q_offset)
    w = 1.0 / jnp.maximum(dist, 1e-8) ** 2
    w = w / jnp.sum(w, axis=1, keepdims=True)
    g = grouping(feats, idx)
    return jnp.sum(g * w[..., None], axis=1)


@functools.partial(jax.jit, static_argnames=("n_max",))
def farthest_point_sampling(coords: jnp.ndarray, offset: jnp.ndarray,
                            new_offset: jnp.ndarray, n_max: int
                            ) -> jnp.ndarray:
    """Ragged FPS (reference sampling): per-scene FPS of
    ``new_offset`` counts, returned as flat indices padded to ``n_max``
    per scene (invalid slots repeat the scene's first index)."""
    n_total = coords.shape[0]
    batch = offset2batch(offset, n_total)
    B = offset.shape[0]
    starts = jnp.concatenate([jnp.zeros(1, offset.dtype), offset[:-1]])
    counts_out = new_offset - jnp.concatenate(
        [jnp.zeros(1, new_offset.dtype), new_offset[:-1]])

    def fps_one(b):
        in_scene = batch == b
        big = jnp.where(in_scene, 0.0, jnp.inf)
        xyz = coords[:, :3]
        start = starts[b]

        def step(carry, i):
            min_d, last = carry
            d = jnp.sum((xyz - xyz[last]) ** 2, axis=1) + big
            min_d = jnp.minimum(min_d, d)
            nxt = jnp.argmax(jnp.where(in_scene, min_d, -1.0))
            return (min_d, nxt), nxt

        init = (jnp.full((n_total,), jnp.inf), start)
        (_, _), rest = jax.lax.scan(step, init, jnp.arange(n_max - 1))
        picks = jnp.concatenate([start[None], rest]).astype(jnp.int32)
        valid = jnp.arange(n_max) < counts_out[b]
        return jnp.where(valid, picks, start)

    return jax.vmap(fps_one)(jnp.arange(B))
