"""Hook-driven fine-tune engine test: tiny classification task learns."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unipre3d_tpu.data.loader import Loader
from unipre3d_tpu.training.hooks import (CheckpointLoader, CheckpointSaver,
                                         ClsEvaluator, FinetuneTrainer,
                                         HookBase, InformationWriter,
                                         IterationTimer)
from unipre3d_tpu.utils.losses_seg import cross_entropy


class ToyClsDataset:
    """Separable 2-class point clouds: class = sign of mean x."""

    def __init__(self, n=32, seed=0):
        rng = np.random.default_rng(seed)
        self.examples = []
        for i in range(n):
            label = i % 2
            shift = 0.5 if label else -0.5
            pts = rng.normal(0, 0.2, (64, 3)).astype(np.float32)
            pts[:, 0] += shift
            self.examples.append({"points": pts,
                                  "label": np.int32(label)})

    def __len__(self):
        return len(self.examples)

    def __getitem__(self, i):
        return self.examples[i]


def make_task(rng):
    import flax.linen as nn

    class ClsHead(nn.Module):
        @nn.compact
        def __call__(self, pts):
            h = nn.Dense(32)(pts)
            h = nn.relu(h)
            h = jnp.max(h, axis=1)
            return nn.Dense(2)(h)

    model = ClsHead()
    params = model.init(rng, jnp.zeros((1, 64, 3)))["params"]
    tx = optax.adam(1e-2)

    class State:
        pass

    from unipre3d_tpu.training.trainer import TrainState
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params),
                       ema_params=params, rng=rng)

    @jax.jit
    def train_step(state, batch):
        def loss_fn(p):
            logits = model.apply({"params": p}, batch["points"])
            return cross_entropy(logits, batch["label"])
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new = state._replace(params=params, opt_state=opt_state,
                             step=state.step + 1)
        return new, {"loss": loss}

    @jax.jit
    def predict(state, batch):
        return model.apply({"params": state.params}, batch["points"])

    return state, train_step, predict


def test_finetune_engine_learns_and_checkpoints(tmp_path):
    rng = jax.random.PRNGKey(0)
    state, train_step, predict = make_task(rng)
    train_loader = Loader(ToyClsDataset(32), batch_size=8, shuffle=True)
    val_loader = Loader(ToyClsDataset(16, seed=1), batch_size=8,
                        shuffle=False)
    out = str(tmp_path / "ft")

    calls = []

    class Probe(HookBase):
        def before_epoch(self):
            calls.append("epoch")

    trainer = FinetuneTrainer(
        state, train_step, train_loader, out, max_epoch=5,
        predict_fn=predict, val_loader=val_loader,
        hooks=[CheckpointLoader(), IterationTimer(),
               InformationWriter(log_every=4), ClsEvaluator(num_classes=2),
               CheckpointSaver(metric="val_acc"), Probe()])
    trainer.train()

    assert calls.count("epoch") == 5
    assert trainer.eval_metrics["val_acc"] > 0.9
    assert os.path.exists(os.path.join(out, "model_latest.ckpt"))
    assert os.path.exists(os.path.join(out, "model_best.ckpt"))
    assert os.path.exists(os.path.join(out, "train.jsonl"))


def test_semseg_evaluator(tmp_path):
    from unipre3d_tpu.training.hooks import SemSegEvaluator

    class T:
        out_dir = str(tmp_path)
        epoch = 0
        eval_metrics = {}

        class val_loader:
            @staticmethod
            def epoch(_):
                rng = np.random.default_rng(0)
                lab = rng.integers(0, 3, 100)
                yield {"segment": lab, "_lab": lab}

        @staticmethod
        def predict(batch):
            # perfect prediction -> mIoU 1.0
            return jax.nn.one_hot(jnp.asarray(batch["_lab"]), 3) * 10

    ev = SemSegEvaluator(num_classes=3)
    ev.trainer = T
    ev.after_epoch()
    assert T.eval_metrics["val_miou"] == 1.0
    assert T.eval_metrics["val_allacc"] == 1.0
