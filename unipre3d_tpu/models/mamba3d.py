"""Mamba3D backbone: local-geometry aggregation + bidirectional Mamba.

Flax rewrite of reference openpoints/models/Mamba3D/Mamba3D.py:132-646
with the pretraining config (model/point_predictor.py:199-220): 128 FPS
groups of 32 (kNN), 384-dim group embedding, CLS token, 16 blocks of
[LNP (K_Norm k=4 over centers -> softmax K_Pool -> shared MLP, SiLU)
 -> bimamba v4 mixer], positional embedding re-added at every block,
fusion after the last block.

Reference quirk preserved: the encoder returns ``(tokens, cls_pos)`` —
the *learned CLS positional embedding* is handed to the Gaussian head as
the base position (its first 3 dims, broadcast over all points;
reference Mamba3D.py:612-646 consumed at gaussian_predictor.py:301-306).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from unipre3d_tpu.models import fusion as fusion_lib
from unipre3d_tpu.models.layers import DropPath, PointGroupEncoder
from unipre3d_tpu.models.mamba_mixer import MambaMixer
from unipre3d_tpu.ops import index_points, knn, subsample_group


class LNPBlock(nn.Module):
    """K_Norm -> K_Pool -> shared MLP (reference Mamba3D.py:188-353).
    CLS token (position 0) passes through untouched."""
    dim: int
    k_group_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, center, feat):
        """center [B, G, 3], feat [B, G+1, C] -> [B, G+1, C]."""
        cls_tok = feat[:, :1]
        x = feat[:, 1:]  # [B, G, C]
        B, G, C = x.shape

        # kNN among the centers themselves
        _, idx = knn(center, center, self.k_group_size)
        knn_x = index_points(x, idx)  # [B, G, K, C]

        mean_x = x[:, :, None, :]
        std_x = jnp.std(knn_x - mean_x)
        knn_x = (knn_x - mean_x) / (std_x + 1e-5)

        knn_x = jnp.concatenate(
            [knn_x, jnp.broadcast_to(mean_x, knn_x.shape)], axis=-1)  # 2C
        alpha = self.param("affine_alpha_feat", nn.initializers.ones,
                           (1, 1, 1, 2 * self.dim))
        beta = self.param("affine_beta_feat", nn.initializers.zeros,
                          (1, 1, 1, 2 * self.dim))
        knn_x = alpha * knn_x + beta

        # K_Pool: softmax-weighted aggregation over the K axis
        e_x = jnp.exp(knn_x)
        pooled = (knn_x * e_x).mean(axis=2) / e_x.mean(axis=2)  # [B, G, 2C]

        pooled = nn.LayerNorm(dtype=self.dtype, name="pre_norm_ft")(pooled)
        out = nn.Dense(self.dim, dtype=self.dtype, name="share_mlp")(pooled)
        out = jax.nn.silu(out)
        return jnp.concatenate([cls_tok, out], axis=1)


class Mamba3DBlock(nn.Module):
    dim: int
    k_group_size: int = 4
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, center, x, deterministic: bool = True):
        dp = DropPath(self.drop_path)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + dp(LNPBlock(self.dim, self.k_group_size, dtype=self.dtype,
                            name="lfa")(center, h), deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + dp(MambaMixer(self.dim, bimamba=True, dtype=self.dtype,
                              name="mixer")(h), deterministic)
        return x


class Mamba3DEncoder(nn.Module):
    trans_dim: int = 384
    depth: int = 16
    num_group: int = 128
    group_size: int = 32
    k_group_size: int = 4  # center_local_k
    drop_path_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts, image_features=None, c2w=None, fusion_mlp=None,
                 intrinsic=None, image_proj=None, train: bool = False):
        """pts [B, N, 3(+1)] -> (tokens [B, G, C], cls_pos [B, 1, C]).

        NOTE the second return is the learned CLS positional embedding
        (reference center quirk), not geometric centers.
        """
        pts = pts[..., :3]
        neighborhood, center = subsample_group(
            pts, self.num_group, self.group_size, use_knn=True)
        tokens = PointGroupEncoder(self.trans_dim, dtype=self.dtype,
                                   name="encoder")(neighborhood, train=train)

        B = tokens.shape[0]
        cls_token = self.param("cls_token",
                               nn.initializers.truncated_normal(0.02),
                               (1, 1, self.trans_dim))
        cls_pos = self.param("cls_pos",
                             nn.initializers.truncated_normal(0.02),
                             (1, 1, self.trans_dim))

        pos = nn.Dense(128, dtype=self.dtype, name="pos_embed_fc1")(
            center.astype(self.dtype))
        pos = jax.nn.silu(pos)
        pos = nn.Dense(self.trans_dim, dtype=self.dtype,
                       name="pos_embed_fc2")(pos)

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, self.trans_dim))
             .astype(self.dtype), tokens], axis=1)
        pos = jnp.concatenate(
            [jnp.broadcast_to(cls_pos, (B, 1, self.trans_dim))
             .astype(self.dtype), pos], axis=1)

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        for i in range(self.depth):
            x = Mamba3DBlock(self.trans_dim, self.k_group_size,
                             drop_path=dpr[i], dtype=self.dtype,
                             name=f"block{i}")(center, x + pos,
                                               deterministic=not train)
            if i == self.depth - 1 and fusion_mlp is not None:
                x = fusion_lib.feature_fusion(
                    x, center, image_features, c2w, intrinsic, fusion_mlp,
                    image_proj)

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        cls_pos_b = jnp.broadcast_to(cls_pos, (B, 1, self.trans_dim))
        return x[:, 1:, :], cls_pos_b.astype(jnp.float32)
