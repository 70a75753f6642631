"""Scale-adaptive 2D->3D feature fusion (the paper's core novelty).

Object-level ``feature_fusion``: project point-token centers into the
conditioning view, z-buffer occlusion per pixel, gather the VAE feature at
each surviving pixel, concat with point features and run the fusion MLP.
TPU-native rewrite of reference fusion/feat_fusion.py:5-145 — the
dynamic ``torch.nonzero`` + scatter_reduce pipeline becomes static-shape
masked scatter-min over a dense pixel grid.

Axis convention parity note: the reference indexes the feature map as
``image_features[b, :, pixel_x, pixel_y]`` and bounds-checks ``x < H``/
``y < W`` (feat_fusion.py:91-131), i.e. the *x* projection indexes image
rows. We reproduce that exactly so converted checkpoints behave
identically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def project_points_to_image(center: jnp.ndarray, c2w: jnp.ndarray,
                            intrinsic: jnp.ndarray):
    """Project world points into the source view.

    center: [B, N, 3]; c2w: [B, 4, 4] *transposed* camera-to-world
    (row-vector convention, as stored by the data pipeline); intrinsic:
    [3, 4] pinhole. Returns (pix [B, N, 2] rounded int32, depth [B, N]).
    Matches reference feat_fusion.py:23-56 (w2c = inv(c2w^T)).
    """
    B, N, _ = center.shape
    ones = jnp.ones((B, N, 1), dtype=center.dtype)
    hom = jnp.concatenate([center, ones], axis=-1)
    w2c = jnp.linalg.inv(jnp.swapaxes(c2w, -1, -2))  # [B, 4, 4]
    cam_pts = jnp.einsum("bij,bnj->bni", w2c, hom)
    z = cam_pts[..., 2]
    px = cam_pts[..., 0] * intrinsic[0, 0] / z + intrinsic[0, 2]
    py = cam_pts[..., 1] * intrinsic[1, 1] / z + intrinsic[1, 2]
    pix = jnp.round(jnp.stack([px, py], axis=-1)).astype(jnp.int32)
    return pix, z


def feature_fusion_gather(center: jnp.ndarray, image_features: jnp.ndarray,
                          c2w: jnp.ndarray, intrinsic: jnp.ndarray,
                          image_proj=None) -> jnp.ndarray:
    """Occlusion-aware per-point image features.

    center [B, N, 3], image_features [B, C, H, W], c2w [B, 4, 4] (or
    [B, V, 4, 4] — first view used), intrinsic [3, 4] ->
    mapped features [B, N, C] (zero for occluded / out-of-view points).

    ``image_proj`` (optional): per-pixel linear map applied to the N
    GATHERED rows instead of all H*W pixels (the gather commutes with
    any per-pixel map) — the trainable affine + 1x1 conv of the frozen
    VAE's feature path (see models/gaussian_predictor.py:ImageConv).
    """
    if c2w.ndim == 4:
        c2w = c2w[:, 0]
    B, N = center.shape[:2]
    C, H, W = image_features.shape[1:]

    pix, depth = project_points_to_image(center, c2w, intrinsic)
    x, y = pix[..., 0], pix[..., 1]
    inside = (x >= 0) & (y >= 0) & (x < H) & (y < W) & (depth >= 0)

    # z-buffer: scatter-min depth into the pixel grid, keep closest point
    flat_id = jnp.clip(y, 0, W - 1) * H + jnp.clip(x, 0, H - 1)  # [B, N]
    big = jnp.asarray(jnp.inf, depth.dtype)
    masked_depth = jnp.where(inside, depth, big)

    def zbuf(ids, d):
        buf = jnp.full((H * W,), big, dtype=d.dtype)
        return buf.at[ids].min(d)

    min_depth = jax.vmap(zbuf)(flat_id, masked_depth)  # [B, H*W]
    winner = inside & (masked_depth == jnp.take_along_axis(
        min_depth, flat_id, axis=1))

    # gather feature at (x=row, y=col) — reference axis convention
    feats = jnp.swapaxes(image_features.reshape(B, C, H * W), 1, 2)  # [B,HW,C]
    gathered = jnp.take_along_axis(
        feats, (jnp.clip(x, 0, H - 1) * W + jnp.clip(y, 0, W - 1))[..., None],
        axis=1)  # [B, N, C]
    if image_proj is not None:
        gathered = image_proj(gathered)
    return jnp.where(winner[..., None], gathered, 0.0)


def feature_fusion(x: jnp.ndarray, center: jnp.ndarray,
                   image_features: jnp.ndarray, c2w: jnp.ndarray,
                   intrinsic: jnp.ndarray, fusion_mlp,
                   image_proj=None) -> jnp.ndarray:
    """Full object-level fusion (reference feat_fusion.py:58-145).

    x: point tokens [B, N(+1 with CLS), C_pt]; center [B, N, 3]. A leading
    CLS token (x wider than center by one) gets zero image features.
    Returns fusion_mlp([x ‖ mapped]) with shape [B, N(+1), out].
    """
    B, N = center.shape[:2]
    mapped = feature_fusion_gather(center, image_features, c2w, intrinsic,
                                   image_proj)
    if x.shape[1] > N:  # CLS token at position 0
        zeros = jnp.zeros((B, x.shape[1] - N, mapped.shape[-1]),
                          dtype=mapped.dtype)
        mapped = jnp.concatenate([zeros, mapped], axis=1)
    fused = jnp.concatenate([x, mapped.astype(x.dtype)], axis=-1)
    return fusion_mlp(fused)
