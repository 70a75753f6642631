"""Standard point transformer backbone (Point-BERT style).

TPU-native flax rewrite of reference
openpoints/models/backbone/transformer.py:247-327: FPS to ``num_groups``
centers, ball-query groups of ``group_size``, mini-PointNet group
embedding, CLS token + MLP positional embedding, ``depth`` pre-LN blocks
with the positional embedding re-added at every block input, and the
scale-adaptive image-feature fusion applied after the last block.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from unipre3d_tpu.models import fusion as fusion_lib
from unipre3d_tpu.models.layers import Block, PointGroupEncoder


class PointTransformerEncoder(nn.Module):
    in_channels: int = 3
    num_groups: int = 128
    group_size: int = 32
    radius: float = 0.1
    encoder_dims: int = 384
    trans_dim: int = 384
    depth: int = 16
    num_heads: int = 6
    drop_path_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts, image_features=None, c2w=None,
                 fusion_mlp=None, intrinsic=None, image_proj=None,
                 train: bool = False):
        """pts [B, N, 3(+)] -> (tokens [B, G, trans_dim], centers [B, G, 3]).

        When ``image_features``/``fusion_mlp`` are provided, fusion runs
        after the last block (reference transformer.py:185-206).
        """
        from unipre3d_tpu.ops import subsample_group

        pts = pts[:, :, :3]
        neighborhood, center = subsample_group(
            pts, self.num_groups, self.group_size, radius=self.radius)

        tokens = PointGroupEncoder(self.encoder_dims, dtype=self.dtype,
                                   name="encoder")(neighborhood, train=train)
        tokens = nn.Dense(self.trans_dim, dtype=self.dtype,
                          name="reduce_dim")(tokens)

        B = tokens.shape[0]
        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.trans_dim))
        cls_pos = self.param("cls_pos", nn.initializers.normal(1.0),
                             (1, 1, self.trans_dim))

        pos = nn.Dense(128, dtype=self.dtype, name="pos_embed_fc1")(
            center.astype(self.dtype))
        pos = nn.gelu(pos, approximate=False)
        pos = nn.Dense(self.trans_dim, dtype=self.dtype,
                       name="pos_embed_fc2")(pos)

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, self.trans_dim)).astype(self.dtype),
             tokens], axis=1)
        pos = jnp.concatenate(
            [jnp.broadcast_to(cls_pos, (B, 1, self.trans_dim)).astype(self.dtype),
             pos], axis=1)

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        for i in range(self.depth):
            # positional embedding re-added at every block (reference
            # TransformerEncoder.forward: x = block(x + pos))
            x = Block(self.trans_dim, self.num_heads, drop_path=dpr[i],
                      dtype=self.dtype, name=f"block{i}")(
                x + pos, deterministic=not train)
            if i == self.depth - 1 and fusion_mlp is not None:
                x = fusion_lib.feature_fusion(
                    x, center, image_features, c2w, intrinsic, fusion_mlp,
                    image_proj)

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x[:, 1:, :], center
