"""PyTorch checkpoint interop.

The reference's pretrained backbones are consumed by third-party
*torch* fine-tuning repos (reference docs/OBJECT_LEVEL_DOWNSTREAM_TASKS
.md, weights loaded via ``opt.pretrained_ckpt`` at
model/point_predictor.py:44-53, strict=False). This module bridges both
directions:

* :func:`export_transformer_predictor` — name-exact torch state dict of
  the standard-Transformer backbone (+ final head / image_conv /
  fusion_mlps) matching reference openpoints/models/backbone/
  transformer.py:247-327 naming, ready for the downstream repos.
* :func:`import_transformer_backbone` — load a torch transformer
  checkpoint into our Flax params (warm-start parity).
* :func:`export_state_dict` — generic flattened export for any backbone
  (dotted names, torch tensor conventions) as the fallback for the
  backbones whose downstream repos use other naming.

Conversion rules: Dense kernel [in, out] <-> Linear weight [out, in];
Dense used as 1x1 Conv1d <-> weight [out, in, 1]; flax Conv HWIO <->
torch OIHW; LayerNorm/GroupNorm/BatchNorm scale <-> weight; BatchNorm
batch_stats mean/var <-> running_mean/running_var.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def _np(x):
    return np.asarray(x)


def _dense_w(kernel):
    return _np(kernel).T  # [in, out] -> [out, in]


def _conv1d_w(kernel):
    return _np(kernel).T[..., None]  # [in, out] -> [out, in, 1]


def _conv2d_w(kernel):
    return np.transpose(_np(kernel), (3, 2, 0, 1))  # HWIO -> OIHW


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, name))
        else:
            out[name] = _np(v)
    return out


def export_state_dict(params: Dict, batch_stats: Optional[Dict] = None,
                      prefix: str = "") -> Dict[str, np.ndarray]:
    """Generic export: flax leaf names with torch tensor conventions."""
    flat = _flatten(params, prefix)
    out = {}
    for name, arr in flat.items():
        if name.endswith(".kernel"):
            base = name[:-7]
            if arr.ndim == 2:
                out[base + ".weight"] = _dense_w(arr)
            elif arr.ndim == 4:
                out[base + ".weight"] = _conv2d_w(arr)
            else:
                out[base + ".weight"] = arr
        elif name.endswith(".scale"):
            out[name[:-6] + ".weight"] = arr
        else:
            out[name] = arr
    if batch_stats:
        for name, arr in _flatten(batch_stats, prefix).items():
            if name.endswith(".mean"):
                out[name[:-5] + ".running_mean"] = arr
            elif name.endswith(".var"):
                out[name[:-4] + ".running_var"] = arr
            else:
                out[name] = arr
    return out


# ---------------------------------------------------------------------------
# transformer: name-exact mapping to the reference module tree
# ---------------------------------------------------------------------------

def _bn(sd, torch_name, p, bs):
    sd[torch_name + ".weight"] = _np(p["scale"])
    sd[torch_name + ".bias"] = _np(p["bias"])
    sd[torch_name + ".running_mean"] = _np(bs["mean"])
    sd[torch_name + ".running_var"] = _np(bs["var"])


def export_transformer_backbone(enc_params: Dict, enc_stats: Dict,
                                prefix: str = "") -> Dict[str, np.ndarray]:
    """Our PointTransformerEncoder params -> reference
    openpoints transformer naming (:247-327)."""
    p = enc_params
    bs = enc_stats
    sd: Dict[str, np.ndarray] = {}
    pre = (prefix + ".") if prefix else ""

    # mini-PointNet Encoder (reference Encoder:210-243)
    e = p["encoder"]
    ebs = bs["encoder"]
    sd[pre + "encoder.first_conv.0.weight"] = _conv1d_w(e["conv1"]["kernel"])
    sd[pre + "encoder.first_conv.0.bias"] = _np(e["conv1"]["bias"])
    _bn(sd, pre + "encoder.first_conv.1", e["bn1"], ebs["bn1"])
    sd[pre + "encoder.first_conv.3.weight"] = _conv1d_w(e["conv2"]["kernel"])
    sd[pre + "encoder.first_conv.3.bias"] = _np(e["conv2"]["bias"])
    sd[pre + "encoder.second_conv.0.weight"] = _conv1d_w(e["conv3"]["kernel"])
    sd[pre + "encoder.second_conv.0.bias"] = _np(e["conv3"]["bias"])
    _bn(sd, pre + "encoder.second_conv.1", e["bn2"], ebs["bn2"])
    sd[pre + "encoder.second_conv.3.weight"] = _conv1d_w(e["conv4"]["kernel"])
    sd[pre + "encoder.second_conv.3.bias"] = _np(e["conv4"]["bias"])

    sd[pre + "reduce_dim.weight"] = _dense_w(p["reduce_dim"]["kernel"])
    sd[pre + "reduce_dim.bias"] = _np(p["reduce_dim"]["bias"])
    sd[pre + "cls_token"] = _np(p["cls_token"])
    sd[pre + "cls_pos"] = _np(p["cls_pos"])
    sd[pre + "pos_embed.0.weight"] = _dense_w(p["pos_embed_fc1"]["kernel"])
    sd[pre + "pos_embed.0.bias"] = _np(p["pos_embed_fc1"]["bias"])
    sd[pre + "pos_embed.2.weight"] = _dense_w(p["pos_embed_fc2"]["kernel"])
    sd[pre + "pos_embed.2.bias"] = _np(p["pos_embed_fc2"]["bias"])

    i = 0
    while f"block{i}" in p:
        b = p[f"block{i}"]
        t = f"{pre}blocks.blocks.{i}."
        for ln in ("norm1", "norm2"):
            sd[t + ln + ".weight"] = _np(b[ln]["scale"])
            sd[t + ln + ".bias"] = _np(b[ln]["bias"])
        sd[t + "attn.qkv.weight"] = _dense_w(b["attn"]["qkv"]["kernel"])
        if "bias" in b["attn"]["qkv"]:
            sd[t + "attn.qkv.bias"] = _np(b["attn"]["qkv"]["bias"])
        sd[t + "attn.proj.weight"] = _dense_w(b["attn"]["proj"]["kernel"])
        sd[t + "attn.proj.bias"] = _np(b["attn"]["proj"]["bias"])
        sd[t + "mlp.fc1.weight"] = _dense_w(b["mlp"]["fc1"]["kernel"])
        sd[t + "mlp.fc1.bias"] = _np(b["mlp"]["fc1"]["bias"])
        sd[t + "mlp.fc2.weight"] = _dense_w(b["mlp"]["fc2"]["kernel"])
        sd[t + "mlp.fc2.bias"] = _np(b["mlp"]["fc2"]["bias"])
        i += 1

    sd[pre + "norm.weight"] = _np(p["norm"]["scale"])
    sd[pre + "norm.bias"] = _np(p["norm"]["bias"])
    return sd


def export_transformer_predictor(params: Dict, batch_stats: Dict
                                 ) -> Dict[str, np.ndarray]:
    """Full GaussianSplatPredictor (transformer backbone) -> reference
    state-dict naming (point_network.encoder.*, point_network.final.*,
    image_conv.*, fusion_mlps.*). VAE weights are not exported (the
    reference loads them from diffusers, never from the ckpt)."""
    pn = params["point_network"]
    pn_bs = batch_stats.get("point_network", {})
    sd = export_transformer_backbone(
        pn["encoder"], pn_bs.get("encoder", {}),
        prefix="point_network.encoder")
    sd["point_network.final.0.weight"] = _dense_w(pn["final"]["fc1"]["kernel"])
    sd["point_network.final.0.bias"] = _np(pn["final"]["fc1"]["bias"])
    sd["point_network.final.2.weight"] = _dense_w(pn["final"]["fc2"]["kernel"])
    sd["point_network.final.2.bias"] = _np(pn["final"]["fc2"]["bias"])
    if "image_conv" in params:
        ic = params["image_conv"]["layers_0"]
        sd["image_conv.0.weight"] = _np(ic["scale"])
        sd["image_conv.0.bias"] = _np(ic["bias"])
        conv = params["image_conv"]["layers_1"]
        sd["image_conv.1.weight"] = _conv2d_w(conv["kernel"])
        sd["image_conv.1.bias"] = _np(conv["bias"])
    if "fusion_mlps" in params and "layers_0" in params["fusion_mlps"]:
        fm = params["fusion_mlps"]["layers_0"]
        sd["fusion_mlps.0.weight"] = _dense_w(fm["kernel"])
        sd["fusion_mlps.0.bias"] = _np(fm["bias"])
    return sd


def import_transformer_backbone(sd: Dict[str, np.ndarray],
                                enc_params: Dict, enc_stats: Dict,
                                prefix: str = "") -> None:
    """Inverse of :func:`export_transformer_backbone`: mutate our param /
    batch_stats dicts in place from a torch state dict (tensors or
    arrays). Missing keys are skipped (reference loads strict=False)."""
    def get(name):
        key = (prefix + "." + name) if prefix else name
        v = sd.get(key)
        if v is None:
            return None
        return np.asarray(getattr(v, "numpy", lambda: v)())

    def put_dense(node, torch_name):
        w = get(torch_name + ".weight")
        if w is None:
            return
        node["kernel"] = w.reshape(w.shape[0], -1).T.astype(np.float32)
        b = get(torch_name + ".bias")
        if b is not None:
            node["bias"] = b.astype(np.float32)

    def put_bn(pnode, snode, torch_name):
        w = get(torch_name + ".weight")
        if w is None:
            return
        pnode["scale"] = w.astype(np.float32)
        pnode["bias"] = get(torch_name + ".bias").astype(np.float32)
        snode["mean"] = get(torch_name + ".running_mean").astype(np.float32)
        snode["var"] = get(torch_name + ".running_var").astype(np.float32)

    e, ebs = enc_params["encoder"], enc_stats["encoder"]
    put_dense(e["conv1"], "encoder.first_conv.0")
    put_bn(e["bn1"], ebs["bn1"], "encoder.first_conv.1")
    put_dense(e["conv2"], "encoder.first_conv.3")
    put_dense(e["conv3"], "encoder.second_conv.0")
    put_bn(e["bn2"], ebs["bn2"], "encoder.second_conv.1")
    put_dense(e["conv4"], "encoder.second_conv.3")
    put_dense(enc_params["reduce_dim"], "reduce_dim")
    for name in ("cls_token", "cls_pos"):
        v = get(name)
        if v is not None:
            enc_params[name] = v.astype(np.float32)
    put_dense(enc_params["pos_embed_fc1"], "pos_embed.0")
    put_dense(enc_params["pos_embed_fc2"], "pos_embed.2")
    i = 0
    while f"block{i}" in enc_params:
        b = enc_params[f"block{i}"]
        t = f"blocks.blocks.{i}."
        for ln in ("norm1", "norm2"):
            w = get(t + ln + ".weight")
            if w is not None:
                b[ln]["scale"] = w.astype(np.float32)
                b[ln]["bias"] = get(t + ln + ".bias").astype(np.float32)
        put_dense(b["attn"]["qkv"], t + "attn.qkv")
        put_dense(b["attn"]["proj"], t + "attn.proj")
        put_dense(b["mlp"]["fc1"], t + "mlp.fc1")
        put_dense(b["mlp"]["fc2"], t + "mlp.fc2")
        i += 1
    w = get("norm.weight")
    if w is not None:
        enc_params["norm"]["scale"] = w.astype(np.float32)
        enc_params["norm"]["bias"] = get("norm.bias").astype(np.float32)


def save_torch_checkpoint(path: str, state_dict: Dict[str, np.ndarray],
                          extra: Optional[Dict[str, Any]] = None) -> None:
    """Write a torch-loadable checkpoint (reference save format:
    {model_state_dict, ...}, train_network.py:200-220)."""
    import torch
    payload = {"model_state_dict": {
        k: torch.from_numpy(np.ascontiguousarray(v).copy())
        for k, v in state_dict.items()}}
    if extra:
        payload.update(extra)
    torch.save(payload, path)
