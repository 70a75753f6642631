"""Shared flax building blocks for the 3D backbones.

ViT-style pre-LN attention blocks, stochastic depth, and the mini-PointNet
group embedder — the TPU-native equivalents of reference
openpoints/models/backbone/transformer.py:10-243. All modules take a
``dtype`` for bf16 compute with f32 params.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class Mlp(nn.Module):
    """Linear -> GELU -> Linear (reference transformer.py:10-33)."""
    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention, qkv without bias
    (reference transformer.py:36-77)."""
    dim: int
    num_heads: int
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B,N,H,D]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (head_dim ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class DropPath(nn.Module):
    """Per-sample stochastic depth."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Block(nn.Module):
    """Pre-LN transformer block (reference transformer.py:80-120)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dp = DropPath(self.drop_path)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + dp(Attention(self.dim, self.num_heads, dtype=self.dtype,
                             name="attn")(h), deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + dp(Mlp(int(self.dim * self.mlp_ratio), self.dim,
                       dtype=self.dtype, name="mlp")(h), deterministic)
        return x


class PointGroupEncoder(nn.Module):
    """Mini-PointNet over local groups (reference transformer.py:210-243).

    Input group coords [B, G, K, 3] -> tokens [B, G, encoder_channel].
    Uses BatchNorm like the reference; under pjit the stats are global-batch
    (SyncBN equivalent for free).
    """
    encoder_channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, point_groups, train: bool = False):
        B, G, K, _ = point_groups.shape
        x = point_groups.reshape(B * G, K, 3).astype(self.dtype)
        x = nn.Dense(128, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(256, dtype=self.dtype, name="conv2")(x)
        g = jnp.max(x, axis=1, keepdims=True)  # [BG, 1, 256]
        x = jnp.concatenate([jnp.broadcast_to(g, x.shape), x], axis=-1)
        x = nn.Dense(512, dtype=self.dtype, name="conv3")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.encoder_channel, dtype=self.dtype, name="conv4")(x)
        x = jnp.max(x, axis=1)  # [BG, C]
        return x.reshape(B, G, self.encoder_channel)
