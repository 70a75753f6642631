"""Device-resident cache of frozen-VAE conditioning features.

TPU-first redesign of the reference's per-step frozen-VAE recompute
(reference model/image_predictor.py:56-81 runs the full SD-VAE under
``no_grad`` every iteration): the VAE is frozen and an example's
conditioning images never change across epochs (rotation augmentation
rotates the point cloud and re-derives the cameras — the pixels are
fixed, reference dataset/shapenet.py:537-599), so its
``decoder_block_3`` output per (example, view) is a pure function of
the image bytes. The cache:

* keeps features in a fixed-capacity HBM ring buffer (``[C, 128, H, W]``
  bf16) — no host<->device transfer on either path (the TPU tunnel makes
  host round-trips ~30-50 ms);
* keys entries by a blake2b hash of the conditioning-image bytes, so it
  needs no dataset cooperation and is exact (no false sharing);
* on miss, runs the jitted extractor once and writes the features into
  the buffer with a donated scatter — the same FLOPs the live path would
  have spent, spent once;
* on hit, a jitted gather feeds the train step, skipping ~85% of the
  step FLOPs (the VAE dominates the object-level step).

The trainable ``image_conv`` that consumes these features still runs
inside the train step, so gradients and the loss trajectory are
identical to the live path (features are stop-gradient in both).
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _image_key(img: np.ndarray) -> bytes:
    return hashlib.blake2b(np.ascontiguousarray(img).tobytes(),
                           digest_size=16).digest()


class DeviceVAECache:
    """LRU cache of decoder_block_3 features in device memory.

    Parameters
    ----------
    feature_fn: jitted ``(params, images [N,3,H,W]) -> [N,128,H,W]``.
    capacity: number of (example, view) feature slots in HBM
        (each slot is ``128*H*W`` bf16 ≈ 4 MB at 128x128).
    """

    def __init__(self, feature_fn, capacity: int, img_h: int, img_w: int,
                 channels: int = 128, dtype=jnp.bfloat16):
        self.feature_fn = feature_fn
        self.capacity = int(capacity)
        self.shape = (channels, img_h, img_w)
        self.buf = jnp.zeros((self.capacity, *self.shape), dtype=dtype)
        # key -> slot; OrderedDict gives LRU eviction order
        self.slots: "OrderedDict[bytes, int]" = OrderedDict()
        self.free = list(range(self.capacity - 1, -1, -1))
        self.hits = 0
        self.misses = 0

        def gather(buf, idx):
            return buf[idx]

        def insert(buf, idx, feats):
            return buf.at[idx].set(feats.astype(buf.dtype))

        self._gather = jax.jit(gather)
        self._insert = jax.jit(insert, donate_argnums=(0,))

    def _slot_for(self, key: bytes) -> Optional[int]:
        slot = self.slots.get(key)
        if slot is not None:
            self.slots.move_to_end(key)
        return slot

    def _alloc(self, key: bytes) -> int:
        if self.free:
            slot = self.free.pop()
        else:  # evict least-recently-used
            _, slot = self.slots.popitem(last=False)
        self.slots[key] = slot
        return slot

    def attach(self, batch: Dict[str, Any], params, n_in: int):
        """Return ``vae_features [B, n_in, 128, H, W]`` for the batch's
        conditioning images (device array), updating the cache. ``batch``
        must be the host (numpy) batch — images are hashed on the host
        before the device transfer."""
        images = np.asarray(batch["gt_images"][:, :n_in])
        B, V = images.shape[:2]
        flat = images.reshape(B * V, *images.shape[2:])
        keys = [_image_key(flat[i]) for i in range(B * V)]
        slot_of = [self._slot_for(k) for k in keys]

        miss_idx = [i for i, s in enumerate(slot_of) if s is None]
        if miss_idx:
            self.misses += len(miss_idx)
            feats = self.feature_fn(params, jnp.asarray(flat[miss_idx]))
            new_slots = []
            for i in miss_idx:
                s = self._alloc(keys[i])
                slot_of[i] = s
                new_slots.append(s)
            self.buf = self._insert(self.buf,
                                    jnp.asarray(new_slots, jnp.int32), feats)
        self.hits += len(keys) - len(miss_idx)

        out = self._gather(self.buf, jnp.asarray(slot_of, jnp.int32))
        return out.reshape(B, V, *self.shape)

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0


def make_feature_fn(model):
    """Jitted frozen-VAE extractor for the cache:
    ``(params, images [N,3,H,W]) -> decoder_block_3 [N,128,H,W]``."""
    def fn(params, images):
        return model.apply({"params": params}, images,
                           method="extract_vae_features")
    return jax.jit(fn)
