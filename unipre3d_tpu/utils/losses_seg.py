"""Classification / segmentation losses for downstream fine-tuning.

JAX equivalents of the reference's vendored loss zoo
(openpoints/loss/cross_entropy.py — CE with label smoothing, SmoothCE —
and pointcept/models/losses/{misc,lovasz}.py — focal, dice, Lovász).
The pretraining loop itself uses only the photometric losses in
utils/losses.py; these serve fine-tune-style workloads and keep
component parity (SURVEY.md §2.10).

All functions take logits [N, C] and integer labels [N]; an
``ignore_index`` masks labels out (pointcept convention: -1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _valid_mask(labels, ignore_index):
    return labels != ignore_index


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  label_smoothing: float = 0.0,
                  weight: Optional[jnp.ndarray] = None,
                  ignore_index: int = -1) -> jnp.ndarray:
    """CE with optional label smoothing and per-class weights
    (reference openpoints/loss/cross_entropy.py)."""
    C = logits.shape[-1]
    valid = _valid_mask(labels, ignore_index)
    safe = jnp.clip(labels, 0, C - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(safe, C)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / C
    nll = -jnp.sum(onehot * logp, axis=-1)
    if weight is not None:
        nll = nll * jnp.take(weight, safe)
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def smooth_cross_entropy(logits, labels, num_classes: Optional[int] = None,
                         eps: float = 0.2, ignore_index: int = -1):
    """SmoothCrossEntropy (reference openpoints SmoothCE default eps 0.2)."""
    return cross_entropy(logits, labels, label_smoothing=eps,
                         ignore_index=ignore_index)


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
               gamma: float = 2.0, alpha: float = 0.5,
               ignore_index: int = -1) -> jnp.ndarray:
    """Multi-class focal loss (reference pointcept FocalLoss)."""
    C = logits.shape[-1]
    valid = _valid_mask(labels, ignore_index)
    safe = jnp.clip(labels, 0, C - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    pt = jnp.exp(jnp.take_along_axis(logp, safe[:, None], axis=1))[:, 0]
    ce = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    loss = alpha * (1 - pt) ** gamma * ce
    loss = jnp.where(valid, loss, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)


def dice_loss(logits: jnp.ndarray, labels: jnp.ndarray,
              smooth: float = 1.0, exponent: float = 2.0,
              ignore_index: int = -1) -> jnp.ndarray:
    """Mean Dice loss over classes (reference pointcept DiceLoss)."""
    C = logits.shape[-1]
    valid = _valid_mask(labels, ignore_index)
    probs = jax.nn.softmax(logits, axis=-1) * valid[:, None]
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, C - 1), C) * valid[:, None]
    num = 2 * jnp.sum(probs * onehot, axis=0) + smooth
    den = jnp.sum(probs ** exponent + onehot ** exponent, axis=0) + smooth
    return 1.0 - jnp.mean(num / den)


def lovasz_softmax(logits: jnp.ndarray, labels: jnp.ndarray,
                   ignore_index: int = -1) -> jnp.ndarray:
    """Lovász-Softmax (reference pointcept/models/losses/lovasz.py,
    per-image 'present'-class variant), expressed with static shapes:
    the sort is a lax.sort per class and ignored points get zero error
    sorted to the end."""
    C = logits.shape[-1]
    valid = _valid_mask(labels, ignore_index)
    probs = jax.nn.softmax(logits, axis=-1)
    safe = jnp.clip(labels, 0, C - 1)

    def one_class(c):
        fg = (safe == c) & valid
        errors = jnp.where(valid, jnp.abs(fg.astype(probs.dtype)
                                          - probs[:, c]), -1.0)
        order = jnp.argsort(-errors)  # descending; ignored (-1) last
        err_s = jnp.take(errors, order)
        fg_s = jnp.take(fg.astype(probs.dtype), order)
        n_valid = jnp.sum(valid)
        gts = jnp.sum(fg_s)
        inter = gts - jnp.cumsum(fg_s)
        union = gts + jnp.cumsum(1.0 - fg_s)
        jaccard = 1.0 - inter / jnp.maximum(union, 1e-12)
        grad = jnp.diff(jaccard, prepend=0.0)
        idx_ok = jnp.arange(errors.shape[0]) < n_valid
        loss_c = jnp.sum(jnp.where(idx_ok, jnp.maximum(err_s, 0.0) * grad,
                                   0.0))
        present = gts > 0
        return jnp.where(present, loss_c, 0.0), present

    losses, present = jax.vmap(one_class)(jnp.arange(C))
    return jnp.sum(losses) / jnp.maximum(
        jnp.sum(present.astype(losses.dtype)), 1.0)
