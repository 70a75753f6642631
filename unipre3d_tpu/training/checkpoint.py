"""Checkpoint save/load (reference ModelManager save dicts,
train_network.py:200-220) with mid-run resume — a capability the
reference trainer lacks (SURVEY.md §5 checkpoint/resume).

Format: a .npz of the flattened state dict ("/"-joined keys), written
atomically. Chosen over msgpack because serializing the ~113M-param
state through Python msgpack takes ~1 min on this host while np.savez
streams it in seconds; the layout stays trivially readable from any
numpy environment (including the torch fine-tune side).
"""

from __future__ import annotations

import io
import os
from typing import Any, Dict, Tuple

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

_SEP = "/"


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        name = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            if not v:
                out[name + _SEP + "__empty__"] = np.zeros(0)
            else:
                out.update(_flatten(v, name))
        else:
            out[name] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        if parts[-1] == "__empty__":
            parts = parts[:-1]
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node.setdefault(parts[-1], {})
            continue
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _state_payload(state, best_psnr: float) -> Dict:
    return {
        "step": np.asarray(state.step),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
        "rng": np.asarray(state.rng),
        "best_psnr": np.asarray(best_psnr),
    }


def save_checkpoint(path: str, state, best_psnr: float = 0.0) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = flax.serialization.to_state_dict(
        jax.device_get(_state_payload(state, best_psnr)))
    flat = _flatten(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_checkpoint(path: str, state=None):
    """Returns (payload dict, best_psnr). If ``state`` is given, the
    payload is restored onto its pytree structure (exact resume)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    payload = _unflatten(flat)
    best = float(np.asarray(payload.get("best_psnr", 0.0)))
    if state is None:
        return payload, best
    from unipre3d_tpu.training.trainer import TrainState
    template = flax.serialization.to_state_dict(
        jax.device_get(_state_payload(state, 0.0)))
    restored = flax.serialization.from_state_dict(
        _state_payload(state, 0.0), payload)
    new_state = TrainState(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=jax.tree_util.tree_map(
            lambda t, r: jnp.asarray(r), state.opt_state,
            restored["opt_state"]),
        ema_params=restored["ema_params"],
        rng=jnp.asarray(restored["rng"]))
    del template
    return new_state, best
