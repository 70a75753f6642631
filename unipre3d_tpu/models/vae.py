"""Flax AutoencoderKL (SD-VAE) used as the frozen 2D texture encoder.

Architecture matches the diffusers ``AutoencoderKL`` the reference loads
from ``weights/`` (sd-vae-ft-mse; config at reference weights/config.json:
block_out_channels [128, 256, 512, 512], 2 layers/block, GN32, silu,
latent 4ch) so converted checkpoints are drop-in. The forward runs the
full encode->mode->decode pass and returns every decoder up-block output,
mirroring the reference's forward hooks (model/image_predictor.py:56-81);
only ``decoder_block_3`` (128 ch at input resolution) is consumed by the
fusion path.

Weights are frozen at the training level (stop_gradient + excluded from
the optimizer); use :func:`convert_torch_vae_state_dict` to import the
published torch weights.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ResnetBlock2D(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention (diffusers mid-block Attention)."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        attn = jnp.einsum("bnc,bmc->bnm", q, k) * (C ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        h = jnp.einsum("bnm,bmc->bnc", attn, v)
        h = nn.Dense(C, dtype=self.dtype, name="to_out")(h)
        return x + h.reshape(B, H, W, C)


class MidBlock(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_0")(x)
        x = AttnBlock(self.channels, dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                x = ResnetBlock2D(ch, dtype=self.dtype,
                                  name=f"down_{i}_resnet_{j}")(x)
            if i < len(self.block_out_channels) - 1:
                # stride-2 conv with diffusers' asymmetric (0,1) padding
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=2, padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(x)
        x = MidBlock(self.block_out_channels[-1], dtype=self.dtype,
                     name="mid")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        rev = list(reversed(self.block_out_channels))  # [512, 512, 256, 128]
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        x = MidBlock(rev[0], dtype=self.dtype, name="mid")(x)
        block_outputs = {}
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                x = ResnetBlock2D(ch, dtype=self.dtype,
                                  name=f"up_{i}_resnet_{j}")(x)
            if i < len(rev) - 1:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(x)
            block_outputs[f"decoder_block_{i}"] = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x, block_outputs


class AutoencoderKL(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images [B, 3, H, W] (channel-first like the reference pipeline)
        -> dict of decoder block feature maps [B, C, h, w] plus the
        reconstruction under key "sample"."""
        x = jnp.transpose(images, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        moments = Encoder(self.block_out_channels, self.layers_per_block,
                          self.latent_channels, dtype=self.dtype,
                          name="encoder")(x)
        moments = nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype,
                          name="quant_conv")(moments)
        mean = moments[..., :self.latent_channels]  # posterior mode
        z = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype,
                    name="post_quant_conv")(mean)
        sample, feats = Decoder(self.block_out_channels,
                                self.layers_per_block, dtype=self.dtype,
                                name="decoder")(z)
        out = {k: jnp.transpose(v, (0, 3, 1, 2)) for k, v in feats.items()}
        out["sample"] = jnp.transpose(sample, (0, 3, 1, 2))
        return out


def convert_torch_vae_state_dict(state_dict: Dict[str, Any],
                                 n_blocks: int = 4,
                                 layers_per_block: int = 2) -> Dict:
    """Map a diffusers AutoencoderKL torch state_dict onto this module's
    param tree (numpy arrays). Conv [O,I,kh,kw]->[kh,kw,I,O]; Dense
    [O,I]->[I,O]. ``n_blocks``/``layers_per_block`` mirror the module
    config (defaults: the sd-vae-ft-mse 4x2 layout); the converter is
    validated against a real torch forward in
    tests/test_vae_torch_parity.py."""
    import numpy as np

    def conv_w(v):
        return np.transpose(np.asarray(v), (2, 3, 1, 0))

    def dense_w(v):
        return np.transpose(np.asarray(v), (1, 0))

    params: Dict[str, Any] = {}

    def put(path, kernel=None, bias=None, scale=None):
        node = params
        for p in path.split("/"):
            node = node.setdefault(p, {})
        if kernel is not None:
            node["kernel"] = kernel
        if bias is not None:
            node["bias"] = bias
        if scale is not None:
            node["scale"] = scale

    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(dst, src):
        put(dst, kernel=conv_w(sd[src + ".weight"]), bias=sd[src + ".bias"])

    def dense(dst, src):
        # diffusers attention projections are Linear
        put(dst, kernel=dense_w(sd[src + ".weight"]), bias=sd[src + ".bias"])

    def norm(dst, src):
        put(dst, scale=sd[src + ".weight"], bias=sd[src + ".bias"])

    def resnet(dst, src):
        norm(f"{dst}/norm1", f"{src}.norm1")
        conv(f"{dst}/conv1", f"{src}.conv1")
        norm(f"{dst}/norm2", f"{src}.norm2")
        conv(f"{dst}/conv2", f"{src}.conv2")
        if f"{src}.conv_shortcut.weight" in sd:
            conv(f"{dst}/conv_shortcut", f"{src}.conv_shortcut")

    def attn(dst, src):
        norm(f"{dst}/group_norm", f"{src}.group_norm")
        dense(f"{dst}/to_q", f"{src}.to_q")
        dense(f"{dst}/to_k", f"{src}.to_k")
        dense(f"{dst}/to_v", f"{src}.to_v")
        dense(f"{dst}/to_out", f"{src}.to_out.0")

    # encoder
    conv("encoder/conv_in", "encoder.conv_in")
    for i in range(n_blocks):
        for j in range(layers_per_block):
            resnet(f"encoder/down_{i}_resnet_{j}",
                   f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n_blocks - 1:
            conv(f"encoder/down_{i}_downsample",
                 f"encoder.down_blocks.{i}.downsamplers.0.conv")
    resnet("encoder/mid/resnets_0", "encoder.mid_block.resnets.0")
    attn("encoder/mid/attentions_0", "encoder.mid_block.attentions.0")
    resnet("encoder/mid/resnets_1", "encoder.mid_block.resnets.1")
    norm("encoder/conv_norm_out", "encoder.conv_norm_out")
    conv("encoder/conv_out", "encoder.conv_out")
    conv("quant_conv", "quant_conv")
    conv("post_quant_conv", "post_quant_conv")
    # decoder
    conv("decoder/conv_in", "decoder.conv_in")
    resnet("decoder/mid/resnets_0", "decoder.mid_block.resnets.0")
    attn("decoder/mid/attentions_0", "decoder.mid_block.attentions.0")
    resnet("decoder/mid/resnets_1", "decoder.mid_block.resnets.1")
    for i in range(n_blocks):
        for j in range(layers_per_block + 1):
            resnet(f"decoder/up_{i}_resnet_{j}",
                   f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n_blocks - 1:
            conv(f"decoder/up_{i}_upsample",
                 f"decoder.up_blocks.{i}.upsamplers.0.conv")
    norm("decoder/conv_norm_out", "decoder.conv_norm_out")
    conv("decoder/conv_out", "decoder.conv_out")

    # nested dict -> flax param tree ({"params": ...} handled by caller)
    return params
