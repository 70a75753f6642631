"""Torch-forward parity for the VAE and LPIPS weight converters.

The pretrained sd-vae-ft-mse / LPIPS weights are unreachable in this
environment (BASELINE.md), but torch itself is importable — so the
converters are validated against minimal torch re-implementations that
mirror the diffusers / torchvision+lpips module names exactly: randomly
initialize torch, convert with our converters, and assert the Flax
forward matches the torch forward. This proves real weights will drop
in correctly the day they are reachable (round-2 VERDICT missing #1).

Reference consumers: model/image_predictor.py:28-54 (frozen
AutoencoderKL), train_network.py:224-231 (LPIPS(vgg) loss).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn


# ---------------------------------------------------------------------------
# minimal diffusers-named AutoencoderKL in torch
# ---------------------------------------------------------------------------

class TResnet(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(tnn.functional.silu(self.norm1(x)))
        h = self.conv2(tnn.functional.silu(self.norm2(h)))
        sc = getattr(self, "conv_shortcut", None)
        return (sc(x) if sc is not None else x) + h


class TAttn(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = tnn.GroupNorm(32, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(1, 2) * C ** -0.5, dim=-1)
        h = self.to_out[0](attn @ v)
        return x + h.transpose(1, 2).reshape(B, C, H, W)


class TMid(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = tnn.ModuleList([TResnet(c, c), TResnet(c, c)])
        self.attentions = tnn.ModuleList([TAttn(c)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TDown(tnn.Module):
    def __init__(self, cin, cout, last):
        super().__init__()
        self.resnets = tnn.ModuleList([TResnet(cin, cout),
                                       TResnet(cout, cout)])
        if not last:
            ds = tnn.Module()
            ds.conv = tnn.Conv2d(cout, cout, 3, stride=2)
            self.downsamplers = tnn.ModuleList([ds])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "downsamplers"):
            x = tnn.functional.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0].conv(x)
        return x


class TUp(tnn.Module):
    def __init__(self, cin, cout, last):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnet(cin, cout), TResnet(cout, cout), TResnet(cout, cout)])
        if not last:
            us = tnn.Module()
            us.conv = tnn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = tnn.ModuleList([us])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "upsamplers"):
            x = tnn.functional.interpolate(x, scale_factor=2.0,
                                           mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class TEncoder(tnn.Module):
    def __init__(self, chans, latent):
        super().__init__()
        self.conv_in = tnn.Conv2d(3, chans[0], 3, padding=1)
        blocks, cin = [], chans[0]
        for i, c in enumerate(chans):
            blocks.append(TDown(cin, c, last=i == len(chans) - 1))
            cin = c
        self.down_blocks = tnn.ModuleList(blocks)
        self.mid_block = TMid(chans[-1])
        self.conv_norm_out = tnn.GroupNorm(32, chans[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(chans[-1], 2 * latent, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(tnn.functional.silu(self.conv_norm_out(x)))


class TDecoder(tnn.Module):
    def __init__(self, chans, latent):
        super().__init__()
        rev = list(reversed(chans))
        self.conv_in = tnn.Conv2d(latent, rev[0], 3, padding=1)
        self.mid_block = TMid(rev[0])
        blocks, cin = [], rev[0]
        for i, c in enumerate(rev):
            blocks.append(TUp(cin, c, last=i == len(rev) - 1))
            cin = c
        self.up_blocks = tnn.ModuleList(blocks)
        self.conv_norm_out = tnn.GroupNorm(32, rev[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        x = self.mid_block(self.conv_in(z))
        feats = []
        for b in self.up_blocks:
            x = b(x)
            feats.append(x)
        x = self.conv_out(tnn.functional.silu(self.conv_norm_out(x)))
        return x, feats


class TAutoencoderKL(tnn.Module):
    def __init__(self, chans=(32, 64), latent=4):
        super().__init__()
        self.encoder = TEncoder(chans, latent)
        self.decoder = TDecoder(chans, latent)
        self.quant_conv = tnn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = tnn.Conv2d(latent, latent, 1)
        self.latent = latent

    def forward(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean = moments[:, : self.latent]
        return self.decoder(self.post_quant_conv(mean))


def test_vae_converter_matches_torch_forward():
    from unipre3d_tpu.models.vae import (AutoencoderKL,
                                         convert_torch_vae_state_dict)
    chans = (32, 64)
    torch.manual_seed(0)
    tmodel = TAutoencoderKL(chans).eval()
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        t_sample, t_feats = tmodel(x)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_torch_vae_state_dict(sd, n_blocks=len(chans),
                                          layers_per_block=2)
    fmodel = AutoencoderKL(block_out_channels=chans)
    out = fmodel.apply({"params": params}, jnp.asarray(x.numpy()))

    np.testing.assert_allclose(np.asarray(out["sample"]),
                               t_sample.numpy(), atol=2e-5)
    for i, tf in enumerate(t_feats):
        np.testing.assert_allclose(
            np.asarray(out[f"decoder_block_{i}"]), tf.numpy(), atol=2e-5,
            err_msg=f"decoder_block_{i}")


# ---------------------------------------------------------------------------
# LPIPS: torchvision-vgg16-named trunk + lpips linear heads in torch
# ---------------------------------------------------------------------------

def _make_torch_vgg16_features():
    """torchvision vgg16().features layout (conv indices 0..28)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(cin, v, 3, padding=1), tnn.ReLU()]
            cin = v
    return tnn.Sequential(*layers)


def _torch_lpips(features, lin_ws, x, y):
    """lpips.LPIPS(net='vgg') forward in torch ops: scaling layer,
    relu taps at 3/8/15/22/29, unit-normalize, 1x1 linear heads,
    spatial mean, layer sum."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(img):
        h = (img - shift) / scale
        out = []
        for i, layer in enumerate(features):
            h = layer(h)
            if i in (3, 8, 15, 22, 29):
                out.append(h)
        return out

    fx, fy = taps(x), taps(y)
    total = 0.0
    for (a, b), w in zip(zip(fx, fy), lin_ws):
        na = a / (torch.sqrt((a ** 2).sum(1, keepdim=True)) + 1e-10)
        nb = b / (torch.sqrt((b ** 2).sum(1, keepdim=True)) + 1e-10)
        d = (na - nb) ** 2
        wd = (d * w.clamp(min=0).view(1, -1, 1, 1)).sum(1)
        total = total + wd.mean(dim=(1, 2))
    return total


def test_lpips_converter_matches_torch_forward():
    from unipre3d_tpu.utils.lpips import (convert_lpips_torch_state_dict,
                                          lpips_fn)
    torch.manual_seed(1)
    feats = _make_torch_vgg16_features().eval()
    # random non-negative linear heads like the lpips checkpoints
    lin_ws = [torch.rand(c) * 0.1
              for c in (64, 128, 256, 512, 512)]
    x = torch.rand(2, 3, 32, 32) * 2 - 1
    y = torch.rand(2, 3, 32, 32) * 2 - 1
    with torch.no_grad():
        t_val = _torch_lpips(feats, lin_ws, x, y)

    vgg_sd = {f"features.{k}": v.numpy()
              for k, v in feats.state_dict().items()}
    lin_sd = {f"lin{i}.model.1.weight": w.numpy().reshape(1, -1, 1, 1)
              for i, w in enumerate(lin_ws)}
    params = convert_lpips_torch_state_dict(vgg_sd, lin_sd)
    f_val = lpips_fn(params, jnp.asarray(x.numpy()), jnp.asarray(y.numpy()))
    np.testing.assert_allclose(np.asarray(f_val), t_val.numpy(),
                               rtol=1e-4, atol=1e-5)
