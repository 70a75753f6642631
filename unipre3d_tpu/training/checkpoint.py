"""Checkpoint save/load (reference ModelManager save dicts,
train_network.py:200-220) with mid-run resume — a capability the
reference trainer lacks (SURVEY.md §5 checkpoint/resume).

Format: msgpack via flax.serialization, one file per checkpoint
(``model_latest.ckpt`` after every validation, ``model_best.ckpt`` on
PSNR improvement), containing step/params/batch_stats/opt_state/
ema_params/best_psnr.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, state, best_psnr: float = 0.0) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "ema_params": jax.device_get(state.ema_params),
        "rng": np.asarray(state.rng),
        "best_psnr": np.asarray(best_psnr),
    }
    # to_state_dict flattens optax NamedTuple states into plain dicts
    # msgpack can serialize
    payload = flax.serialization.to_state_dict(payload)
    data = flax.serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, state=None):
    """Returns (payload dict, best_psnr). If ``state`` is given, the
    payload is restored onto its pytree structure (exact resume)."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    best = float(payload.get("best_psnr", 0.0))
    if state is None:
        return payload, best
    from unipre3d_tpu.training.trainer import TrainState
    template = {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "ema_params": jax.device_get(state.ema_params),
        "rng": np.asarray(state.rng),
        "best_psnr": np.zeros(()),
    }
    restored = flax.serialization.from_state_dict(template, payload)
    new_state = TrainState(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=jax.tree_util.tree_map(
            lambda t, r: jnp.asarray(r), state.opt_state,
            restored["opt_state"]),
        ema_params=restored["ema_params"],
        rng=jnp.asarray(restored["rng"]))
    return new_state, best
