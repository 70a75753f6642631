"""LPIPS perceptual metric (VGG16 variant) in Flax.

Rewrite of the ``lpips.LPIPS(net="vgg")`` module the reference uses for
its perceptual loss and eval metric (reference train_network.py:224-231,
292-296; eval.py Metricator): input-scaling layer, torchvision-VGG16
feature trunk tapped at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3,
unit-normalized features, learned 1x1 linear heads, spatial + layer mean.

Pretrained weights are NOT bundled (this environment has no network
egress); convert them once with :func:`convert_lpips_torch_state_dict`
from a torchvision ``vgg16`` state dict + the ``lpips`` package's linear
weights, then pass the resulting params in. ``lpips_fn`` with random
params is architecture-correct but not a calibrated metric; the trainer
only enables the LPIPS loss term when weights are supplied
(``opt.lpips_weights``), mirroring the reference's
``start_lpips_after`` gating.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features layout: conv indices per slice
VGG_SLICES = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
VGG_CHANNELS = ((64, 64), (128, 128), (256, 256, 256),
                (512, 512, 512), (512, 512, 512))

# lpips ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 trunk emitting the five relu taps. Input NCHW in [-1, 1]."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        # scaling layer (lpips normalization)
        x = (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
        h = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        taps = []
        for si, (idxs, chans) in enumerate(zip(VGG_SLICES, VGG_CHANNELS)):
            if si > 0:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for li, (idx, ch) in enumerate(zip(idxs, chans)):
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{idx}")(h)
                h = nn.relu(h)
            taps.append(h)
        return taps


class LPIPS(nn.Module):
    """Full LPIPS head: distance between two NCHW images in [-1, 1]."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y) -> jnp.ndarray:
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fx = vgg(x)
        fy = vgg(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a ** 2, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b ** 2, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (d.shape[-1],))
            # 1x1 conv with non-negative weights (lpips clamps at eval)
            wd = jnp.einsum("bhwc,c->bhw", d, jnp.maximum(w, 0.0))
            total = total + jnp.mean(wd, axis=(1, 2))
        return total


def lpips_fn(params, x, y) -> jnp.ndarray:
    """Functional entry: params from LPIPS.init or the converter."""
    return LPIPS().apply({"params": params}, x, y)


def convert_lpips_torch_state_dict(vgg_sd: Dict[str, "np.ndarray"],
                                   lin_sd: Dict[str, "np.ndarray"]
                                   ) -> Dict:
    """Convert torchvision ``vgg16().features`` weights + the lpips
    package's linear-layer weights into LPIPS params.

    vgg_sd keys: ``features.N.weight``/``features.N.bias`` (or bare
    ``N.weight``); lin_sd keys: ``linN.model.1.weight`` [1, C, 1, 1].
    """
    def get(sd, *names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n])
        raise KeyError(names)

    vgg_params: Dict[str, Any] = {}
    for idxs in VGG_SLICES:
        for idx in idxs:
            w = get(vgg_sd, f"features.{idx}.weight", f"{idx}.weight")
            b = get(vgg_sd, f"features.{idx}.bias", f"{idx}.bias")
            vgg_params[f"conv{idx}"] = {
                # torch OIHW -> flax HWIO
                "kernel": np.transpose(w, (2, 3, 1, 0)),
                "bias": b,
            }
    params: Dict[str, Any] = {"vgg": vgg_params}
    for i in range(5):
        w = get(lin_sd, f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight")
        params[f"lin{i}"] = w.reshape(-1)
    return params


def load_lpips_params(path: str):
    """Load converted params from an .npz produced by
    ``np.savez(path, **flatten(params))`` or a torch .pth checkpoint
    containing both vgg and lin weights."""
    if path.endswith(".npz"):
        flat = dict(np.load(path))
        params: Dict[str, Any] = {}
        for k, v in flat.items():
            node = params
            parts = k.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        return params
    import torch  # torch cpu is available in this image
    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    vgg_sd = {k: v for k, v in sd.items() if "features" in k or
              k.split(".")[0].isdigit()}
    lin_sd = {k: v for k, v in sd.items() if k.startswith(("lin", "lins"))}
    return convert_lpips_torch_state_dict(vgg_sd, lin_sd)
