"""PCM (Point Cloud Mamba) backbone: serialization-ordered Mamba U-Net.

Flax/TPU rewrite of the reference PCM stack with the UniPre3D
pretraining hyperparameters (reference model/point_predictor.py:136-197,
openpoints/models/PCM/PCM.py:24-725, PointMLP_layers.py:23-112,
mamba_layer.py:10-94, segmentation/base_seg.py:17-63):

* encoder: ConvBNReLU embedding (384ch over all 4 input channels), 4
  stages of [GAM LocalGrouper (FPS/2 + kNN-12, anchor-normalized affine,
  residual stream carried through the FPS selection) -> PreExtraction
  (1 res block, max-pool) -> per-layer space-filling-curve re-ordering
  -> order-prompt tokens -> MambaBlock(s)] with mamba_blocks [1,2,2,4]
  over the 9 orders ``xyz,xzy,yxz,yzx,zxy,zyx,hilbert,z,z-trans``;
* decoder: 3-NN inverse-distance feature propagation back to full
  resolution with image FeatureFusion at the last decode layer;
* SegHead (conv-bn-relu-dropout-conv) -> 128-d per-point tokens; the
  center handed to the Gaussian head is the original input cloud.

TPU-native differences: sequence re-ordering is a per-batch argsort of
uint32 SFC codes (ops/serialization.py) instead of the reference's
int64 batch-packed global sort; the selective scan is a log-depth
``associative_scan`` (ops/scan.py) instead of the CUDA kernel; the
optional FPS-windowed scan for 100k+ point scenes keeps static shapes
by reshaping to ``[B * n_windows, W, C]``.

``MambaBlock`` reproduces the reference residual-stream semantics
(mamba_layer.py:47-90): ``residual = residual + drop_path(x)``;
``x = mixer(RMSNorm(residual))``; residual kept in fp32.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unipre3d_tpu.models import fusion as fusion_lib
from unipre3d_tpu.models.layers import DropPath
from unipre3d_tpu.models.mamba_mixer import MambaMixer
from unipre3d_tpu.models.pointmlp import (ConvBNReLU, FeaturePropagation,
                                          PreExtraction)
from unipre3d_tpu.ops import furthest_point_sample, index_points, knn
from unipre3d_tpu.ops.serialization import encode

PCM_ORDERS = ("xyz", "xzy", "yxz", "yzx", "zxy", "zyx",
              "hilbert", "z", "z-trans")
SER_DEPTH = 10


def serialize_reorder(p: jnp.ndarray, arrays, order: str,
                      grid_size: float = 0.02):
    """Reorder a batched sequence by the SFC code of its voxelized
    positions (reference PCM_utils.serialization, PCM.py:265-278).

    p: [B, N, 3]; arrays: list of [B, N, C] (entries may be None).
    Returns (p_sorted, [arrays_sorted...]).
    """
    g = jnp.floor(p / grid_size).astype(jnp.int32)
    g = g - jnp.min(g, axis=1, keepdims=True)
    g = jnp.clip(g, 0, (1 << SER_DEPTH) - 1)
    code = encode(g, order=order, depth=SER_DEPTH)  # [B, N] uint32
    idx = jnp.argsort(code, axis=1).astype(jnp.int32)
    p_s = index_points(p, idx)
    out = [None if a is None else index_points(a, idx) for a in arrays]
    return p_s, out


class PCMLocalGrouper(nn.Module):
    """GAM grouper with residual stream (reference
    PointMLP_layers.py:23-86): FPS downsample (sorted indices, so the
    serialization order survives), kNN-12 over the previous level,
    anchor-normalized geometric affine, concat [grouped ‖ anchor]."""
    sample_ratio: int
    kneighbors: int
    use_xyz: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, points, points_res=None):
        """xyz [B, N, 3], points [B, N, D], points_res [B, N, D] | None
        -> (new_xyz [B, S, 3], grouped [B, S, K, 2D(+3)], new_res)."""
        B, N, _ = xyz.shape
        S = N // self.sample_ratio
        if S == N:
            new_xyz, new_points = xyz, points
        else:
            fps_idx = furthest_point_sample(xyz, S)
            fps_idx = jnp.sort(fps_idx, axis=-1)
            new_xyz = index_points(xyz, fps_idx)
            new_points = index_points(points, fps_idx)
            if points_res is not None:
                points_res = index_points(points_res, fps_idx)

        k = min(self.kneighbors, N)
        _, idx = knn(new_xyz, xyz, k)
        grouped_xyz = index_points(xyz, idx)        # [B, S, K, 3]
        grouped_points = index_points(points, idx)  # [B, S, K, D]
        if self.use_xyz:
            grouped_points = jnp.concatenate(
                [grouped_points, grouped_xyz], axis=-1)

        anchor = (jnp.concatenate([new_points, new_xyz], axis=-1)
                  if self.use_xyz else new_points)[:, :, None, :]
        d = grouped_points.shape[-1]
        alpha = self.param("affine_alpha", nn.initializers.ones, (1, 1, 1, d))
        beta = self.param("affine_beta", nn.initializers.zeros, (1, 1, 1, d))
        diff = grouped_points - anchor
        std = jnp.std(diff.reshape(B, -1), axis=-1)[:, None, None, None]
        grouped_points = alpha * (diff / (std + 1e-5)) + beta

        grouped = jnp.concatenate(
            [grouped_points,
             jnp.broadcast_to(new_points[:, :, None, :],
                              (B, S, k, new_points.shape[-1]))], axis=-1)
        return new_xyz, grouped, points_res


class PCMStage(nn.Module):
    """Grouper + PreExtraction as one remat region: the grouped
    [B, S, K, 2D+3] tensor (~600 MB at the reference batch size) is
    recomputed in the backward instead of saved."""
    out_ch: int
    reducer: int
    kneighbors: int
    pre_blocks: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, x, x_res, train: bool = False):
        p, grouped, x_res = PCMLocalGrouper(
            self.reducer, self.kneighbors, dtype=self.dtype,
            name="grouper")(p, x, x_res)
        x = PreExtraction(self.out_ch, self.pre_blocks, dtype=self.dtype,
                          name="pre")(grouped, train)
        return p, x, x_res


class MambaBlock(nn.Module):
    """Add -> RMSNorm -> Mamba residual wrapper (reference
    mamba_layer.py:10-94, fused_add_norm semantics)."""
    dim: int
    drop_path: float = 0.0
    bimamba: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, deterministic: bool = True):
        """x, residual: [B, L, D] -> (mixer_out, new_residual_fp32)."""
        if residual is None:
            residual = x.astype(jnp.float32)
        else:
            residual = residual.astype(jnp.float32) + DropPath(
                self.drop_path)(x, deterministic).astype(jnp.float32)
        h = nn.RMSNorm(epsilon=1e-5, dtype=self.dtype,
                       name="norm")(residual)
        h = MambaMixer(self.dim, bimamba=self.bimamba, dtype=self.dtype,
                       name="mixer")(h.astype(self.dtype))
        return h, residual


class SegHead(nn.Module):
    """conv-bn-relu -> dropout -> conv (reference
    segmentation/base_seg.py SegHead, mlps [in, in, num_classes])."""
    num_classes: int
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = x.shape[-1]
        # bias=False: the reference's create_convblock1d drops the conv
        # bias when a norm follows (openpoints/models/layers/conv.py:72)
        x = ConvBNReLU(d, use_bias=False, dtype=self.dtype,
                       name="conv0")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train,
                       rng_collection="droppath")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


class PointMambaEncoder(nn.Module):
    """4-stage serialization-ordered Mamba encoder (reference
    PCM.py:24-510 with the pretraining config)."""
    in_channels: int = 4
    embed_dim: int = 384
    dim_expansion: Sequence[int] = (1, 1, 2, 1)
    pre_blocks: Sequence[int] = (1, 1, 1, 1)
    pos_blocks: Sequence[int] = (0, 0, 0, 0)
    mamba_blocks: Sequence[int] = (1, 2, 2, 4)
    k_neighbors: Sequence[int] = (12, 12, 12, 12)
    reducers: Sequence[int] = (2, 2, 2, 2)
    mamba_layers_orders: Sequence[str] = PCM_ORDERS
    use_order_prompt: bool = True
    prompt_num_per_order: int = 6
    drop_path_rate: float = 0.1
    grid_size: float = 0.02
    use_windows: bool = False
    windows_size: int = 1200
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts, train: bool = False
                 ) -> Tuple[list, list]:
        """pts [B, N, in_channels] -> (p_list, x_list): points and
        channel-last features per stage (index 0 = full resolution)."""
        assert len(self.mamba_layers_orders) == sum(self.mamba_blocks)
        p = pts[..., :3]
        x = ConvBNReLU(self.embed_dim, use_bias=False, dtype=self.dtype,
                       name="embedding")(pts.astype(self.dtype), train)

        # order prompt table: one row-range per distinct order
        unique_orders = list(dict.fromkeys(self.mamba_layers_orders))
        if self.use_order_prompt:
            prompt_table = self.param(
                "order_prompt", nn.initializers.normal(0.02),
                (len(unique_orders) * self.prompt_num_per_order, 384))
            order2slot = {o: i for i, o in enumerate(unique_orders)}

        n_stages = len(self.pre_blocks)
        total_mamba = sum(self.mamba_blocks)
        dpr = [0.0] + [self.drop_path_rate * i / max(total_mamba - 1, 1)
                       for i in range(total_mamba)]

        p_list, x_list = [p], [x]
        x_res = None
        cur_order = "original"
        layer_idx = 0
        last_ch = self.embed_dim
        for i in range(n_stages):
            out_ch = last_ch * self.dim_expansion[i]
            stage_cls = nn.remat(PCMStage, static_argnums=(4,))
            p, x, x_res = stage_cls(
                out_ch, self.reducers[i], self.k_neighbors[i],
                self.pre_blocks[i], dtype=self.dtype,
                name=f"stage{i}")(p, x, x_res, train)

            if x_res is not None and last_ch != out_ch:
                x_res = nn.Dense(out_ch, use_bias=False, dtype=self.dtype,
                                 name=f"residual_proj{i}")(x_res)

            if self.use_order_prompt:
                prompt_proj = nn.Dense(out_ch, use_bias=False,
                                       dtype=self.dtype,
                                       name=f"order_prompt_proj{i}")
            pos_proj = nn.Dense(out_ch, use_bias=False, dtype=self.dtype,
                                name=f"pos_proj{i}")

            for _ in range(self.mamba_blocks[i]):
                order = self.mamba_layers_orders[layer_idx]
                if order != cur_order:
                    p, (x, x_res) = serialize_reorder(
                        p, [x, x_res], order, self.grid_size)
                    cur_order = order

                p_in, x_in, res_in = p, x, x_res
                n_windows = 1
                if self.use_windows and p.shape[1] > self.windows_size:
                    p_in, x_in, res_in, n_windows, p_base, p_std = \
                        self._pre_split(p, x, x_res)

                x_in = x_in + pos_proj(p_in.astype(self.dtype))
                if self.use_order_prompt:
                    s = order2slot[order] * self.prompt_num_per_order
                    prom = prompt_proj(jax.lax.dynamic_slice_in_dim(
                        prompt_table, s, self.prompt_num_per_order))
                    prom = jnp.broadcast_to(
                        prom[None], (x_in.shape[0], *prom.shape))
                    x_in = jnp.concatenate([prom, x_in, prom], axis=1)
                    if res_in is not None:
                        res_in = jnp.concatenate(
                            [prom.astype(jnp.float32), res_in,
                             prom.astype(jnp.float32)], axis=1)
                # remat: 9 bimamba layers of [B, L, 2*dim] activations
                # otherwise exceed HBM at the reference batch size
                block_cls = nn.remat(MambaBlock, static_argnums=(3,))
                x_in, res_in = block_cls(
                    out_ch, drop_path=dpr[layer_idx], dtype=self.dtype,
                    name=f"mamba{layer_idx}")(x_in, res_in, not train)
                if self.use_order_prompt:
                    k = self.prompt_num_per_order
                    x_in = x_in[:, k:-k]
                    res_in = res_in[:, k:-k]

                if n_windows > 1:
                    p, x, x_res = self._post_split(
                        p_in, x_in, res_in, n_windows, p_base, p_std)
                else:
                    x, x_res = x_in, res_in
                layer_idx += 1

            p_list.append(p)
            x_list.append(x)
            last_ch = out_ch
        return p_list, x_list

    def _pre_split(self, p, x, x_res):
        """FPS-select to a multiple of windows_size and fold windows into
        the batch axis with per-window coordinate renormalization
        (reference PCM.py:456-496)."""
        B, N, _ = x.shape
        W = self.windows_size
        n_windows = N // W
        n_sample = n_windows * W
        fps_idx = jnp.sort(furthest_point_sample(p, n_sample), axis=-1)
        p = index_points(p, fps_idx).reshape(B * n_windows, W, -1)
        x = index_points(x, fps_idx).reshape(B * n_windows, W, -1)
        if x_res is not None:
            x_res = index_points(x_res, fps_idx).reshape(B * n_windows, W, -1)
        p_base = jnp.min(p, axis=1, keepdims=True)
        p_std = jnp.max(p, axis=1, keepdims=True) - p_base + 1e-6
        return (p - p_base) / p_std, x, x_res, n_windows, p_base, p_std

    def _post_split(self, p, x, x_res, n_windows, p_base, p_std):
        p = p * p_std + p_base
        BW, W, _ = x.shape
        B = BW // n_windows
        p = p.reshape(B, n_windows * W, -1)
        x = x.reshape(B, n_windows * W, -1)
        if x_res is not None:
            x_res = x_res.reshape(B, n_windows * W, -1)
        return p, x, x_res


class PointMambaDecoder(nn.Module):
    """Feature propagation back to full resolution + fusion at the last
    decode layer (reference PCM.py:514-725, decoder mamba_blocks all 0
    in the pretraining config)."""
    decoder_channel_list: Sequence[int] = (768, 384, 384, 384)
    decoder_blocks: Sequence[int] = (1, 1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p_list, x_list, image_features=None, c2w=None,
                 fusion_mlp=None, intrinsic=None, image_proj=None,
                 train: bool = False):
        """p_list/x_list from the encoder (fine -> coarse) ->
        [B, N, decoder_channel_list[-1]] at full resolution."""
        ps = list(reversed(p_list))
        xs = list(reversed(x_list))
        de_dims = [xs[0].shape[-1], *self.decoder_channel_list]
        x = xs[0]
        n_dec = len(de_dims) - 1
        for i in range(n_dec):
            x = FeaturePropagation(
                de_dims[i + 1], self.decoder_blocks[i], use_bias=True,
                dtype=self.dtype,
                name=f"decode{i}")(ps[i + 1], ps[i], xs[i + 1], x, train)
            if i == n_dec - 1 and fusion_mlp is not None:
                x = fusion_lib.feature_fusion(
                    x, ps[i + 1][..., :3], image_features, c2w, intrinsic,
                    fusion_mlp, image_proj)
        return x


class PointMambaSeg(nn.Module):
    """BaseSeg assembly: encoder + decoder + SegHead (reference
    base_seg.py:17-63 with _get_mamba_config). Returns
    (tokens [B, N, 128], centers = original cloud [B, N, 3])."""
    in_channels: int = 4
    num_classes: int = 128
    use_windows: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts, image_features=None, c2w=None, fusion_mlp=None,
                 intrinsic=None, image_proj=None, train: bool = False):
        p_list, x_list = PointMambaEncoder(
            in_channels=self.in_channels, use_windows=self.use_windows,
            dtype=self.dtype, name="encoder")(pts, train=train)
        x = PointMambaDecoder(dtype=self.dtype, name="decoder")(
            p_list, x_list, image_features, c2w, fusion_mlp, intrinsic,
            image_proj, train=train)
        x = SegHead(self.num_classes, dtype=self.dtype, name="head")(x, train)
        return x, p_list[0]
