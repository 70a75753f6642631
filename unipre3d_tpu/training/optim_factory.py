"""Optimizer / LR-scheduler factories.

Optax-based equivalent of the reference's vendored optimizer zoo
(reference openpoints/optim/optim_factory.py — adamw/adam/sgd/lamb/
lars/adafactor/adagrad/adadelta/rmsprop/nadam/radam/novograd/... — and
openpoints/scheduler/* — cosine/tanh/step/multistep/poly/plateau).
UniPre3D's pretraining itself only uses AdamW(eps=1e-15)+StepLR
(train_network.py:147-178, built in trainer.make_optimizer); this
factory provides the wider surface for fine-tune-style workloads.

Weight-decay filtering follows the reference convention: no decay for
1-D params (biases, norm scales) or names listed in
``no_weight_decay``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import optax


def make_schedule(name: str, base_lr: float, *, total_steps: int = 100_000,
                  warmup_steps: int = 0, decay_rate: float = 0.1,
                  step_size: int = 30_000, milestones: Sequence[int] = (),
                  min_lr: float = 0.0, power: float = 0.9):
    """LR schedule by name: cosine | step | multistep | poly | linear |
    constant | tanh (reference openpoints/scheduler)."""
    name = name.lower()
    if name == "cosine":
        sched = optax.cosine_decay_schedule(
            base_lr, max(total_steps - warmup_steps, 1),
            alpha=min_lr / base_lr if base_lr else 0.0)
    elif name == "step":
        sched = optax.exponential_decay(
            base_lr, step_size, decay_rate, staircase=True)
    elif name == "multistep":
        sched = optax.piecewise_constant_schedule(
            base_lr, {int(m): decay_rate for m in milestones})
    elif name == "poly":
        sched = optax.polynomial_schedule(
            base_lr, min_lr, power, max(total_steps - warmup_steps, 1))
    elif name == "linear":
        sched = optax.linear_schedule(
            base_lr, min_lr, max(total_steps - warmup_steps, 1))
    elif name == "constant":
        sched = optax.constant_schedule(base_lr)
    elif name == "tanh":
        import math

        def sched(step):
            t = jax.numpy.clip(step / max(total_steps - warmup_steps, 1),
                               0.0, 1.0)
            return min_lr + (base_lr - min_lr) * 0.5 * (
                1.0 - jax.numpy.tanh(3.0 * (2.0 * t - 1.0)) / math.tanh(3.0))
    else:
        raise ValueError(f"unknown schedule: {name}")
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
        sched = optax.join_schedules([warm, sched], [warmup_steps])
    return sched


_OPTIMIZERS: dict = {
    "adamw": lambda lr, **kw: optax.adamw(
        lr, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999),
        eps=kw.get("eps", 1e-8), weight_decay=kw.get("weight_decay", 0.01),
        mask=kw.get("mask")),
    "adam": lambda lr, **kw: optax.adam(
        lr, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999),
        eps=kw.get("eps", 1e-8)),
    "sgd": lambda lr, **kw: optax.sgd(
        lr, momentum=kw.get("momentum", 0.9),
        nesterov=kw.get("nesterov", True)),
    "lamb": lambda lr, **kw: optax.lamb(
        lr, weight_decay=kw.get("weight_decay", 0.0), mask=kw.get("mask")),
    "lars": lambda lr, **kw: optax.lars(
        lr, weight_decay=kw.get("weight_decay", 0.0),
        momentum=kw.get("momentum", 0.9)),
    "adafactor": lambda lr, **kw: optax.adafactor(lr),
    "adagrad": lambda lr, **kw: optax.adagrad(lr, eps=kw.get("eps", 1e-10)),
    "adadelta": lambda lr, **kw: optax.adadelta(
        lr, rho=kw.get("rho", 0.9), eps=kw.get("eps", 1e-6)),
    "rmsprop": lambda lr, **kw: optax.rmsprop(
        lr, decay=kw.get("decay", 0.9), eps=kw.get("eps", 1e-8),
        momentum=kw.get("momentum", 0.9)),
    "nadam": lambda lr, **kw: optax.nadam(
        lr, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999)),
    "radam": lambda lr, **kw: optax.radam(
        lr, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999)),
    "novograd": lambda lr, **kw: optax.novograd(
        lr, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.25),
        weight_decay=kw.get("weight_decay", 0.0)),
    "lion": lambda lr, **kw: optax.lion(
        lr, weight_decay=kw.get("weight_decay", 0.0)),
    "sgdp": lambda lr, **kw: optax.sgd(
        lr, momentum=kw.get("momentum", 0.9)),
}


def weight_decay_mask(params, no_weight_decay: Sequence[str] = ()):
    """True where decay applies: ndim > 1 and name not excluded
    (reference add_weight_decay semantics)."""
    def decide(path, leaf):
        name = jax.tree_util.keystr(path)
        if any(tok in name for tok in no_weight_decay):
            return False
        return getattr(leaf, "ndim", 0) > 1
    return jax.tree_util.tree_map_with_path(decide, params)


def build_optimizer(name: str, lr, *, grad_clip: Optional[float] = None,
                    params=None, no_weight_decay: Sequence[str] = (),
                    **kwargs) -> optax.GradientTransformation:
    """Optimizer by name with optional decay masking + grad clipping."""
    name = name.lower()
    if name not in _OPTIMIZERS:
        raise ValueError(
            f"unknown optimizer {name}; have {sorted(_OPTIMIZERS)}")
    if params is not None and "mask" not in kwargs and \
            name in ("adamw", "lamb"):
        kwargs["mask"] = weight_decay_mask(params, no_weight_decay)
    tx = _OPTIMIZERS[name](lr, **kwargs)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(float(grad_clip)), tx)
    return tx
