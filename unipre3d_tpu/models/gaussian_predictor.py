"""Top-level Gaussian-splat predictor (backbone -> per-point Gaussians).

Flax rewrite of reference model/gaussian_predictor.py:16-447 and
model/point_predictor.py:18-220: a 3D backbone (+ optional frozen-VAE
feature fusion) emits 23 channels per point token which are split into
``[3, 1, 3, 4, 3, 9]`` = xyz-offset / opacity / scale / rotation / SH-DC /
SH-rest and activated into a renderable Gaussian dict:

* position: ``tanh(x) * offset_scale + center``
* scale: ``exp(clamp(x, -1, 20))``; opacity: ``sigmoid``;
  rotation: L2-normalized quaternion (reference :249-254, 297-306)

Object level returns dense ``[B, N, ...]`` dicts; scene level (added with
the sparse backbones) returns padded per-scene tensors with a validity
mask instead of the reference's variable-length lists.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unipre3d_tpu.models.transformer import PointTransformerEncoder
from unipre3d_tpu.models.vae import AutoencoderKL
from unipre3d_tpu.utils.camera import intrinsics_from_fov

# feature_dim/fusion_dim per backbone (reference gaussian_predictor.py:19-50)
MODEL_CONFIGS = {
    "pointmlp": {"feature_dim": 128, "fusion_dim": 128, "final_dim": 128},
    "transformer": {"feature_dim": 384, "fusion_dim": 384, "final_dim": 384},
    "pcm": {"feature_dim": 384, "fusion_dim": 384, "final_dim": 384},
    "mamba3d": {"feature_dim": 384, "fusion_dim": 384, "final_dim": 384},
    "sparseunet": {"feature_dim": 128, "fusion_dim": 32, "final_dim": 32},
    "ptv3": {"feature_dim": 32, "fusion_dim": 32, "final_dim": 32},
}

VAE_FIRST_BLOCK_CHANNELS = 128  # block_out_channels[0] of the SD-VAE


def group_normalize(x: jnp.ndarray, num_groups: int,
                    epsilon: float) -> jnp.ndarray:
    """Parameter-free half of GroupNorm over NHWC input (flax semantics:
    stats over spatial dims + channels within each group), f32 math."""
    B, H, W, C = x.shape
    g = x.astype(jnp.float32).reshape(B, H, W, num_groups, C // num_groups)
    mean = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean((g - mean) ** 2, axis=(1, 2, 4), keepdims=True)
    return ((g - mean) * jax.lax.rsqrt(var + epsilon)).reshape(B, H, W, C)


class GroupNormAffine(nn.Module):
    """GroupNorm split into a parameter-free normalize +
    a trainable per-channel affine. Param tree identical to
    ``nn.GroupNorm`` ({scale, bias}), so checkpoints/export are
    unaffected; ``affine`` alone is valid on rows whose statistics were
    already normalized over the FULL feature map (the frozen-VAE maps —
    see ``GaussianSplatPredictor._forward_object``)."""
    ch: int
    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.ch,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.ch,))

    def affine(self, xn):
        y = xn.astype(jnp.float32) * self.scale + self.bias
        return y.astype(self.dtype)

    def __call__(self, x):
        return self.affine(group_normalize(x, self.num_groups,
                                           self.epsilon))


class ImageConv(nn.Module):
    """GroupNorm + 1x1 Conv over the frozen-VAE feature map (reference
    model/image_predictor.py:41-54). Param tree matches the former
    ``nn.Sequential([nn.GroupNorm, nn.Conv])`` (layers_0 / layers_1).

    ``proj_rows`` is the object-path fast route: the object fusion
    consumes the conv output at only N projected pixels per view
    (models/fusion.py), and with the upstream map stop-gradiented both
    GroupNorm's affine and the 1x1 conv are per-pixel linear maps that
    commute with the gather — so the step applies them to the N
    gathered rows instead of all H*W pixels (measured: the full-map
    conv + its backward were ~51 GF + ~0.4 GB of scattered cotangent
    traffic per step for 0.8% pixel utilization)."""
    out_dim: int
    feat_ch: int = VAE_FIRST_BLOCK_CHANNELS
    dtype: Any = jnp.float32

    def setup(self):
        self.layers_0 = GroupNormAffine(self.feat_ch, dtype=self.dtype,
                                        name="layers_0")
        self.layers_1 = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                                name="layers_1")

    def __call__(self, x):
        """x [B, H, W, feat_ch] NHWC -> [B, H, W, out_dim]."""
        return self.layers_1(self.layers_0(x))

    def proj_rows(self, xn_rows):
        """Pre-normalized rows [B, N, feat_ch] -> [B, N, out_dim]."""
        y = self.layers_0.affine(xn_rows)
        return self.layers_1(y[:, :, None, :])[:, :, 0, :]


def split_dimensions(max_sh_degree: int):
    dims = [3, 1, 3, 4, 3]
    if max_sh_degree != 0:
        dims.append(((max_sh_degree + 1) ** 2 - 1) * 3)
    return dims


class FinalHead(nn.Module):
    """Per-token Gaussian parameter head (reference
    point_predictor.py:78-85)."""
    hidden: int
    out: int = 23
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class PointFeaturePredictor(nn.Module):
    """Backbone + final head (reference model/point_predictor.py:18).

    ``backbone_overrides``: hashable tuple of (field, value) pairs
    forwarded to the backbone constructor (lists stored as tuples).
    Used to shrink the scene backbones for compile-budgeted dry runs
    (``cfg.model.backbone_overrides``); production configs leave it
    unset so the reference architecture (SURVEY §2.3) is built.
    """
    backbone_type: str
    in_channels: int = 3
    backbone_overrides: Any = None
    dtype: Any = jnp.float32

    def _overrides(self) -> dict:
        if not self.backbone_overrides:
            return {}
        return {k: v for k, v in self.backbone_overrides}

    def setup(self):
        bt = self.backbone_type
        if bt == "transformer":
            kw = dict(in_channels=self.in_channels, num_groups=128,
                      encoder_dims=384, depth=16, dtype=self.dtype)
            kw.update(self._overrides())
            self.encoder = PointTransformerEncoder(**kw)
            self.final = FinalHead(128, dtype=self.dtype)
        elif bt == "pointmlp":
            from unipre3d_tpu.models.pointmlp import PointMLPEncoder
            self.encoder = PointMLPEncoder(in_channels=self.in_channels,
                                           dtype=self.dtype)
            self.final = FinalHead(64, dtype=self.dtype)
        elif bt == "mamba3d":
            from unipre3d_tpu.models.mamba3d import Mamba3DEncoder
            self.encoder = Mamba3DEncoder(dtype=self.dtype)
            self.final = FinalHead(128, dtype=self.dtype)
        elif bt == "pcm":
            from unipre3d_tpu.models.pcm import PointMambaSeg
            self.encoder = PointMambaSeg(in_channels=self.in_channels,
                                         dtype=self.dtype)
            # reference head for pcm: Linear(128->64)+ReLU+Linear(64->23)
            # (model/point_predictor.py:85)
            self.final = FinalHead(64, dtype=self.dtype)
        elif bt == "sparseunet":
            from unipre3d_tpu.models.sparseunet import SpUNet
            self.encoder = SpUNet(in_channels=6, num_classes=64,
                                  dtype=self.dtype, **self._overrides())
            self.final = FinalHead(32, dtype=self.dtype)
        elif bt == "ptv3":
            from unipre3d_tpu.models.ptv3 import PointTransformerV3
            self.encoder = PointTransformerV3(in_channels=6, dtype=self.dtype,
                                              **self._overrides())
            self.final = FinalHead(32, dtype=self.dtype)
        else:
            raise ValueError(f"unsupported backbone: {bt}")

    def __call__(self, x, image_features=None, c2w=None, fusion_mlp=None,
                 intrinsic=None, image_proj=None, train: bool = False):
        """Object-level forward (+ optional fusion): returns
        (per-token 23ch output [B, G, 23], centers [B, G, 3])."""
        feats, center = self.encoder(
            x, image_features=image_features, c2w=c2w, fusion_mlp=fusion_mlp,
            intrinsic=intrinsic, image_proj=image_proj, train=train)
        return self.final(feats), center

    def forward_scene(self, data, image_features=None,
                      unprojected=None, fusion_mlp=None,
                      train: bool = False, geometry=None):
        """Scene-level forward for the sparse backbones: returns
        (per-point 23ch output [B, M, 23], coords [B, M, 3], mask [B, M]).

        ``geometry``: precomputed index structures (see
        models/scene_geometry.py); None = build inline."""
        feats, coords, mask = self.encoder.forward_point_fusion(
            data, image_features, unprojected, fusion_mlp, train=train,
            geometry=geometry)
        return self.final(feats), coords, mask


class GaussianSplatPredictor(nn.Module):
    """Unified predictor (reference model/gaussian_predictor.py:16)."""
    backbone_type: str = "transformer"
    in_channels: int = 3
    max_sh_degree: int = 1
    isotropic: bool = False
    offset_scale: float = 1.0
    use_fusion: bool = True
    level: str = "object"
    fov: float = 49.13434264120263
    training_resolution: int = 128
    backbone_overrides: Any = None
    vae_overrides: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self.split_dims = split_dimensions(self.max_sh_degree)
        mc = MODEL_CONFIGS[self.backbone_type]
        self.point_network = PointFeaturePredictor(
            self.backbone_type, self.in_channels,
            backbone_overrides=self.backbone_overrides, dtype=self.dtype)
        if self.use_fusion:
            vo = {k: v for k, v in (self.vae_overrides or ())}
            self.image_network = AutoencoderKL(dtype=self.dtype, **vo)
            out_dim = (mc["feature_dim"] if self.level == "object"
                       else mc["fusion_dim"])
            feat_ch = tuple(vo.get("block_out_channels",
                                   (VAE_FIRST_BLOCK_CHANNELS,)))[0]
            self.image_conv = ImageConv(out_dim, feat_ch=feat_ch,
                                        dtype=self.dtype)
            if self.level == "object":
                self.fusion_mlps = nn.Sequential([
                    nn.Dense(mc["fusion_dim"], dtype=self.dtype),
                    nn.relu,
                ])
            else:
                from unipre3d_tpu.models.sparseunet import SubMConvBlock
                self.fusion_mlps = SubMConvBlock(mc["fusion_dim"],
                                                 dtype=self.dtype)
        if self.level == "object":
            # np: avoids a lifted jax-array constant in the jaxpr
            self.intrinsic = np.asarray(
                intrinsics_from_fov(self.fov, self.training_resolution))

    def _image_features(self, image, vae_features=None):
        """Frozen VAE features -> image_conv. image [B*V, 3, H, W].

        ``vae_features`` (optional, [B*V, 128, H, W]): precomputed
        ``decoder_block_3`` activations. The VAE is frozen and the
        conditioning images of an example never change across epochs
        (rotation aug rotates cloud+cameras, not pixels), so a cache of
        these features skips ~85% of the step FLOPs; the trainable
        ``image_conv`` still runs inside the step (gradients intact).
        See training/feature_cache.py. Reference recomputes the frozen
        VAE every step (model/image_predictor.py:56-81)."""
        if vae_features is None:
            vae_out = self.image_network(image)
            feat = jax.lax.stop_gradient(vae_out["decoder_block_3"])
        else:
            feat = jax.lax.stop_gradient(
                vae_features.astype(self.dtype))
        # image_conv is NHWC
        feat = jnp.transpose(feat, (0, 2, 3, 1))
        feat = self.image_conv(feat)
        return jnp.transpose(feat, (0, 3, 1, 2))  # [B*V, C, H, W]

    def extract_vae_features(self, image):
        """Raw frozen-VAE ``decoder_block_3`` features for the cache.
        image [N, 3, H, W] -> [N, 128, H, W]. Exposed as an apply method:
        ``model.apply(vars, imgs, method="extract_vae_features")``."""
        return jax.lax.stop_gradient(
            self.image_network(image)["decoder_block_3"])

    def __call__(self, point_cloud, image=None,
                 source_cameras_view_to_world=None, unprojected_coords=None,
                 train: bool = False,
                 vae_features=None, geometry=None) -> Dict[str, jnp.ndarray]:
        if self.level == "scene":
            return self._forward_scene(point_cloud, image,
                                       unprojected_coords, train,
                                       vae_features, geometry)
        return self._forward_object(point_cloud, image,
                                    source_cameras_view_to_world, train,
                                    vae_features)

    def _raw_normalized_features(self, image, vae_features=None):
        """Frozen-VAE features, group-NORMALIZED but not affine/conv'd,
        as [B*V, feat_ch, H, W]. The per-channel affine + 1x1 conv are
        applied AFTER the fusion gather (see ImageConv.proj_rows) —
        exact because the map is stop-gradiented and both are per-pixel
        linear."""
        if vae_features is None:
            vae_out = self.image_network(image)
            feat = jax.lax.stop_gradient(vae_out["decoder_block_3"])
        else:
            feat = jax.lax.stop_gradient(vae_features.astype(self.dtype))
        feat = jnp.transpose(feat, (0, 2, 3, 1))
        gn = self.image_conv.layers_0
        feat = group_normalize(feat, gn.num_groups, gn.epsilon)
        feat = jax.lax.stop_gradient(feat).astype(self.dtype)
        return jnp.transpose(feat, (0, 3, 1, 2))

    def _forward_object(self, point_cloud, image, c2w, train,
                        vae_features=None):
        if self.use_fusion:
            B, V = image.shape[:2]
            img = image.reshape(B * V, *image.shape[2:])
            vf = None if vae_features is None else \
                vae_features.reshape(B * V, *vae_features.shape[2:])
            image_features = self._raw_normalized_features(img, vf)
            if V > 1:
                # multi-view union (reference _multi_view_union,
                # gaussian_predictor.py:413-420): run the backbone once
                # per conditioning view and concatenate the per-view
                # gaussians along the point axis
                point_cloud = jnp.repeat(point_cloud, V, axis=0)
                c2w = c2w.reshape(B * V, 1, *c2w.shape[2:])
            out, center = self.point_network(
                point_cloud, image_features=image_features, c2w=c2w,
                fusion_mlp=self.fusion_mlps, intrinsic=self.intrinsic,
                image_proj=self.image_conv.proj_rows, train=train)
        else:
            B, V = point_cloud.shape[0], 1
            out, center = self.point_network(point_cloud, train=train)
        d = self._activate(out, center)
        if V > 1:
            d = {k: v.reshape(B, V * v.shape[1], *v.shape[2:])
                 for k, v in d.items()}
        return d

    def _forward_scene(self, point_cloud, image, unprojected_coords, train,
                       vae_features=None, geometry=None):
        B, V = image.shape[:2]
        img = image.reshape(B * V, *image.shape[2:])
        vf = None if vae_features is None else \
            vae_features.reshape(B * V, *vae_features.shape[2:])
        image_features = self._image_features(img, vf) \
            if self.use_fusion else None
        out, coords, mask = self.point_network.forward_scene(
            point_cloud, image_features, unprojected_coords,
            self.fusion_mlps if self.use_fusion else None, train=train,
            geometry=geometry)
        d = self._activate(out, coords)
        d["mask"] = mask
        return d

    def _activate(self, out, center) -> Dict[str, jnp.ndarray]:
        """23ch -> activated Gaussian dict (reference :279-328). out
        [B, N, 23], center [B, N, 3] -> dict of [B, N, ...] f32."""
        out = out.astype(jnp.float32)
        splits = np.cumsum(self.split_dims)[:-1]
        xyz_raw, opacity, scaling, rotation, f_dc, *rest = jnp.split(
            out, splits, axis=-1)
        pos = jnp.tanh(xyz_raw) * self.offset_scale + \
            center.astype(jnp.float32)[..., :3]
        if self.isotropic:
            scaling = jnp.broadcast_to(scaling[..., :1], scaling.shape)
        # safe norm: padded scene rows have rotation == 0 and
        # jnp.linalg.norm has a NaN gradient at exactly 0
        rot_norm = jnp.sqrt(jnp.sum(rotation ** 2, axis=-1,
                                    keepdims=True) + 1e-12)
        d = {
            "xyz": pos,
            "opacity": jax.nn.sigmoid(opacity),
            "scaling": jnp.exp(jnp.clip(scaling, -1, 20)),
            "rotation": rotation / jnp.maximum(rot_norm, 1e-6),
            "features_dc": f_dc.reshape(*f_dc.shape[:-1], 1, 3),
        }
        if self.max_sh_degree > 0:
            fr = rest[0]
            d["features_rest"] = fr.reshape(*fr.shape[:-1], -1, 3)
        else:
            d["features_rest"] = jnp.zeros(
                (*f_dc.shape[:-1], (self.max_sh_degree + 1) ** 2 - 1, 3),
                dtype=jnp.float32)
        return d


def build_predictor(cfg, dtype=jnp.float32) -> GaussianSplatPredictor:
    """Construct from a composed config (factory, reference
    networkCallBack at gaussian_predictor.py:440)."""
    res = (int(cfg.data.training_resolution)
           if "training_resolution" in cfg.data else
           int(cfg.data.training_height))

    def freeze(v):
        return tuple(freeze(x) for x in v) if isinstance(v, (list, tuple)) \
            else v

    bo = dict(cfg.model.get("backbone_overrides") or {})
    if cfg.model.backbone_type == "sparseunet" and "tpu" in cfg:
        # sparse-conv executor knob (tpu.sparse_conv_impl=gather|block):
        # routed through backbone_overrides so make_geometry_fn builds
        # the matching index structures
        impl = cfg.tpu.get("sparse_conv_impl", None)
        if impl and "conv_impl" not in bo:
            bo["conv_impl"] = str(impl)
    if bo:
        bo = tuple(sorted((k, freeze(v)) for k, v in bo.items()))
    else:
        bo = None
    vo = cfg.model.get("vae_overrides") or None
    if vo:
        vo = tuple(sorted((k, freeze(v)) for k, v in vo.items()))
    return GaussianSplatPredictor(
        backbone_overrides=bo,
        vae_overrides=vo,
        backbone_type=cfg.model.backbone_type,
        in_channels=int(cfg.model.in_channels),
        max_sh_degree=int(cfg.model.max_sh_degree),
        isotropic=bool(cfg.model.isotropic),
        offset_scale=float(cfg.model.offset_scale),
        use_fusion=bool(cfg.opt.use_fusion),
        level=cfg.opt.level,
        fov=float(cfg.data.fov),
        training_resolution=res,
        dtype=dtype,
    )
