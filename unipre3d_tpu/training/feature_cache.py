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
  have spent, spent once. Miss batches are padded to power-of-two
  buckets so the jitted extractor/insert compile once per bucket, not
  once per distinct miss count (each fresh shape costs a ~20-60 s
  remote compile on the tunneled TPU);
* on hit, a jitted gather feeds the train step, skipping ~85% of the
  step FLOPs (the VAE dominates the object-level step);
* optionally spills LRU-evicted entries to a host-RAM L2 tier
  (``host_capacity`` slots): for datasets larger than HBM capacity, a
  tunnel upload of a cached feature (~4 MB) is still far cheaper than a
  VAE forward at 128x128, so the steady-state hit rate holds.

The trainable ``image_conv`` that consumes these features still runs
inside the train step, so gradients flow identically to the live path
(features are stop-gradient in both). With the default bf16 buffer the
features are quantized once on insert, so losses match the live float32
path to bf16 tolerance (~1e-2 relative); pass ``dtype=jnp.float32`` for
bit-exact parity at 2x the HBM footprint.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _image_key(img: np.ndarray) -> bytes:
    return hashlib.blake2b(np.ascontiguousarray(img).tobytes(),
                           digest_size=16).digest()


def _bucket(n: int) -> int:
    """Smallest power of two >= n (compile-shape bucketing)."""
    b = 1
    while b < n:
        b *= 2
    return b


def _pad_rows(arr: np.ndarray, n: int) -> np.ndarray:
    """Pad the leading axis to ``n`` by repeating the last row."""
    if arr.shape[0] == n:
        return arr
    reps = np.repeat(arr[-1:], n - arr.shape[0], axis=0)
    return np.concatenate([arr, reps], axis=0)


class DeviceVAECache:
    """LRU cache of decoder_block_3 features in device memory.

    Parameters
    ----------
    feature_fn: jitted ``(params, images [N,3,H,W]) -> [N,128,H,W]``.
    capacity: number of (example, view) feature slots in HBM
        (each slot is ``128*H*W`` bf16 ≈ 4 MB at 128x128).
    host_capacity: number of L2 slots in host RAM (0 disables the spill
        tier). Evicted L1 entries move here; an L2 hit re-uploads the
        stored features instead of recomputing the VAE.
    """

    def __init__(self, feature_fn, capacity: int, img_h: int, img_w: int,
                 channels: int = 128, dtype=jnp.bfloat16,
                 host_capacity: int = 0):
        self.feature_fn = feature_fn
        self.capacity = int(capacity)
        self.shape = (channels, img_h, img_w)
        self.buf = jnp.zeros((self.capacity, *self.shape), dtype=dtype)
        # key -> slot; OrderedDict gives LRU eviction order
        self.slots: "OrderedDict[bytes, int]" = OrderedDict()
        self.free = list(range(self.capacity - 1, -1, -1))
        self.host_capacity = int(host_capacity)
        self.host: "OrderedDict[bytes, np.ndarray]" = OrderedDict()
        self.hits = 0
        self.l2_hits = 0
        self.misses = 0

        def gather(buf, idx):
            return buf[idx]

        def insert(buf, idx, feats):
            # duplicate (padded) indices carry identical rows, so the
            # scatter's last-wins semantics are harmless
            return buf.at[idx].set(feats.astype(buf.dtype))

        self._gather = jax.jit(gather)
        self._insert = jax.jit(insert, donate_argnums=(0,))

    def _slot_for(self, key: bytes) -> Optional[int]:
        slot = self.slots.get(key)
        if slot is not None:
            self.slots.move_to_end(key)
        return slot

    def _alloc(self, key: bytes) -> Tuple[int, Optional[bytes]]:
        """Reserve a slot for ``key``; returns (slot, evicted_key)."""
        evicted = None
        if self.free:
            slot = self.free.pop()
        else:  # evict least-recently-used
            evicted, slot = self.slots.popitem(last=False)
        self.slots[key] = slot
        return slot, evicted

    def _spill_to_host(self, pairs: List[Tuple[bytes, int]]):
        """Move evicted L1 entries (key, slot) into the host tier in one
        batched gather + transfer, before the slots are overwritten."""
        if not pairs or not self.host_capacity:
            return
        idx = jnp.asarray([s for _, s in pairs], jnp.int32)
        feats = np.asarray(self._gather(self.buf, idx))
        for (key, _), feat in zip(pairs, feats):
            self.host[key] = feat
            self.host.move_to_end(key)
        while len(self.host) > self.host_capacity:
            self.host.popitem(last=False)

    def _insert_bucketed(self, slot_list: List[int], feats) -> None:
        """Donated scatter; ``feats`` must already carry
        ``_bucket(len(slot_list))`` rows (padding happens on the host so
        no per-miss-count device shapes are created)."""
        b = feats.shape[0]
        slot_list = slot_list + [slot_list[-1]] * (b - len(slot_list))
        self.buf = self._insert(self.buf,
                                jnp.asarray(slot_list, jnp.int32), feats)

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
            assert len(keys) <= self.capacity, (
                "DeviceVAECache capacity must cover one batch of views")
            # split L1 misses into L2 hits (host upload) vs true misses
            # (VAE forward); keys may repeat within a batch — only the
            # first occurrence is materialized, the rest reuse its slot
            upload_idx, compute_idx, seen = [], [], set()
            for i in miss_idx:
                if keys[i] in seen:
                    continue
                seen.add(keys[i])
                if keys[i] in self.host:
                    upload_idx.append(i)
                else:
                    compute_idx.append(i)
            self.l2_hits += len(upload_idx)
            self.misses += len(compute_idx)

            # pull the L2 payloads out BEFORE spilling so an eviction
            # cascade can't drop a feature we are about to re-promote
            upload_feats = [self.host.pop(keys[i]) for i in upload_idx]

            spills: List[Tuple[bytes, int]] = []
            for i in upload_idx + compute_idx:
                slot, evicted = self._alloc(keys[i])
                slot_of[i] = slot
                if evicted is not None:
                    spills.append((evicted, slot))
            self._spill_to_host(spills)

            if upload_idx:
                stacked = _pad_rows(np.stack(upload_feats),
                                    _bucket(len(upload_idx)))
                self._insert_bucketed([slot_of[i] for i in upload_idx],
                                      jnp.asarray(stacked))
            if compute_idx:
                imgs = _pad_rows(flat[compute_idx],
                                 _bucket(len(compute_idx)))
                feats = self.feature_fn(params, jnp.asarray(imgs))
                self._insert_bucketed([slot_of[i] for i in compute_idx],
                                      feats)
            # duplicate keys within the batch reuse the winner's slot
            for i in miss_idx:
                if slot_of[i] is None:
                    slot_of[i] = self.slots[keys[i]]
        self.hits += len(keys) - len(miss_idx)

        out = self._gather(self.buf, jnp.asarray(slot_of, jnp.int32))
        return out.reshape(B, V, *self.shape)

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.l2_hits + self.misses
        return (self.hits + self.l2_hits) / total if total else 0.0


def make_feature_fn(model):
    """Jitted frozen-VAE extractor for the cache:
    ``(params, images [N,3,H,W]) -> decoder_block_3 [N,128,H,W]``."""
    def fn(params, images):
        return model.apply({"params": params}, images,
                           method="extract_vae_features")
    return jax.jit(fn)
