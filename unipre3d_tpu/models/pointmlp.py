"""PointMLP backbone: residual-MLP U-Net over FPS/kNN groups.

TPU-native flax rewrite of reference
openpoints/models/backbone/pointmlp.py:100-638 with the factory's
hyperparameters (embed 64, dims x2 per stage to 1024, k=24 kNN,
reducers 2, use_xyz=False, anchor normalization, decoder dims
[512, 256, 128, 128] with 3-NN inverse-distance propagation) and the
reference quirks preserved:

* grouping distances use ALL point channels (incl. the gravity 4th
  channel when in_channels=4);
* geometric-affine "anchor" normalization with learned alpha/beta and a
  per-cloud global std;
* image fusion at the last decoder layer over the full-resolution
  cloud, returning channel-last fused tokens.

Everything is channel-last [B, N, C]; 1x1 Conv1d == Dense.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from unipre3d_tpu.models import fusion as fusion_lib
from unipre3d_tpu.ops import (furthest_point_sample, index_points, knn,
                              three_interpolate, three_nn)


class ConvBNReLU(nn.Module):
    out_channels: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.out_channels, use_bias=self.use_bias,
                     dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn")(x)
        return nn.relu(x)


class ConvBNReLURes(nn.Module):
    """relu(net2(net1(x)) + x) residual block (reference
    ConvBNReLURes1D, groups=1, res_expansion=1)."""
    channels: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.channels, use_bias=self.use_bias,
                     dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.channels, use_bias=self.use_bias,
                     dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(h)
        return nn.relu(h + x)


class LocalGrouper(nn.Module):
    """FPS + kNN + anchor-normalized geometric affine
    (reference pointmlp.py:114-195)."""
    channel: int
    sample_ratio: int
    kneighbors: int
    use_xyz: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, points):
        """xyz [B, N, C_xyz] (all point channels), points [B, N, D] ->
        (new_xyz [B, S, C_xyz], new_points [B, S, K, 2D(+3)])."""
        B, N, _ = xyz.shape
        S = N // self.sample_ratio
        fps_idx = furthest_point_sample(xyz, S)
        new_xyz = index_points(xyz, fps_idx)
        new_points = index_points(points, fps_idx)

        _, idx = knn(new_xyz, xyz, self.kneighbors)
        grouped_xyz = index_points(xyz, idx)          # [B, S, K, C]
        grouped_points = index_points(points, idx)    # [B, S, K, D]
        if self.use_xyz:
            grouped_points = jnp.concatenate(
                [grouped_points, grouped_xyz], axis=-1)

        d = grouped_points.shape[-1]
        alpha = self.param("affine_alpha", nn.initializers.ones,
                           (1, 1, 1, d))
        beta = self.param("affine_beta", nn.initializers.zeros,
                          (1, 1, 1, d))
        anchor = (jnp.concatenate([new_points, new_xyz], axis=-1)
                  if self.use_xyz else new_points)[:, :, None, :]
        diff = grouped_points - anchor
        std = jnp.std(diff.reshape(B, -1), axis=-1)[:, None, None, None]
        grouped_points = diff / (std + 1e-5)
        grouped_points = alpha * grouped_points + beta

        new_points = jnp.concatenate(
            [grouped_points,
             jnp.broadcast_to(new_points[:, :, None, :],
                              (*grouped_points.shape[:3],
                               new_points.shape[-1]))], axis=-1)
        return new_xyz, new_points


class PreExtraction(nn.Module):
    out_channels: int
    blocks: int = 2
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [B, S, K, D] -> [B, S, out]."""
        B, S, K, D = x.shape
        h = x.reshape(B * S, K, D)
        h = ConvBNReLU(self.out_channels, self.use_bias, dtype=self.dtype,
                       name="transfer")(h, train)
        for i in range(self.blocks):
            h = ConvBNReLURes(self.out_channels, self.use_bias,
                              dtype=self.dtype, name=f"res{i}")(h, train)
        h = jnp.max(h, axis=1)
        return h.reshape(B, S, self.out_channels)


class PosExtraction(nn.Module):
    channels: int
    blocks: int = 2
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.blocks):
            x = ConvBNReLURes(self.channels, self.use_bias,
                              dtype=self.dtype, name=f"res{i}")(x, train)
        return x


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance upsampling + fuse MLP + residual blocks
    (reference PointNetFeaturePropagation, pointmlp.py:356-422)."""
    out_channels: int
    blocks: int = 2
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, train: bool = False):
        """xyz1 [B,N,3+] dense, xyz2 [B,S,3+] coarse, points1 [B,N,D1]
        (skip, may be None), points2 [B,S,D2] -> [B,N,out]."""
        dists, idx = three_nn(xyz1, xyz2)
        interpolated = three_interpolate(points2, idx, dists)
        x = (jnp.concatenate([points1, interpolated], axis=-1)
             if points1 is not None else interpolated)
        x = ConvBNReLU(self.out_channels, self.use_bias, dtype=self.dtype,
                       name="fuse")(x, train)
        x = PosExtraction(self.out_channels, self.blocks, self.use_bias,
                          dtype=self.dtype, name="extraction")(x, train)
        return x


class PointMLPEncoder(nn.Module):
    in_channels: int = 4
    embed_dim: int = 64
    dim_expansion: Sequence[int] = (2, 2, 2, 2)
    pre_blocks: Sequence[int] = (2, 2, 2, 2)
    pos_blocks: Sequence[int] = (2, 2, 2, 2)
    de_blocks: Sequence[int] = (2, 2, 2, 2)
    de_dims: Sequence[int] = (512, 256, 128, 128)
    k_neighbors: Sequence[int] = (24, 24, 24, 24)
    reducers: Sequence[int] = (2, 2, 2, 2)
    use_xyz: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts, image_features=None, c2w=None, fusion_mlp=None,
                 intrinsic=None, image_proj=None, train: bool = False):
        """pts [B, N, in_channels] -> (features [B, N, de_dims[-1]],
        centers = the input points [B, N, 3+])."""
        p = pts
        x = ConvBNReLU(self.embed_dim, use_bias=False, dtype=self.dtype,
                       name="embedding")(p.astype(self.dtype), train)

        p_list, x_list = [p], [x]
        last = self.embed_dim
        channels = [self.embed_dim]
        for i in range(len(self.pre_blocks)):
            out_ch = last * self.dim_expansion[i]
            channels.append(out_ch)
            p, grouped = LocalGrouper(
                last, self.reducers[i], self.k_neighbors[i], self.use_xyz,
                dtype=self.dtype, name=f"grouper{i}")(p, x)
            x = PreExtraction(out_ch, self.pre_blocks[i], dtype=self.dtype,
                              name=f"pre{i}")(grouped, train)
            x = PosExtraction(out_ch, self.pos_blocks[i], dtype=self.dtype,
                              name=f"pos{i}")(x, train)
            p_list.append(p)
            x_list.append(x)
            last = out_ch

        p_list = p_list[::-1]
        x_list = x_list[::-1]
        x = x_list[0]
        de_dims = [channels[-1], *self.de_dims]
        n_dec = len(de_dims) - 1
        for i in range(n_dec):
            x = FeaturePropagation(
                de_dims[i + 1], self.de_blocks[i], dtype=self.dtype,
                name=f"decode{i}")(p_list[i + 1], p_list[i],
                                   x_list[i + 1], x, train)
            if i == n_dec - 1 and fusion_mlp is not None:
                x = fusion_lib.feature_fusion(
                    x, p_list[i + 1][..., :3], image_features, c2w,
                    intrinsic, fusion_mlp, image_proj)
        return x, p_list[-1]
