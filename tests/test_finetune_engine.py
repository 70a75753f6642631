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


def test_insseg_evaluator(tmp_path):
    """ScanNet-protocol instance AP: perfect predictions -> mAP 1.0;
    a half-overlap prediction passes AP25 but fails AP50+."""
    from unipre3d_tpu.training.hooks import InsSegEvaluator

    n = 400
    segment = np.zeros(n, np.int64)
    segment[200:] = 1
    instance = np.zeros(n, np.int64)
    instance[100:200] = 1
    instance[200:] = 2

    def masks_of(slices):
        m = np.zeros((len(slices), n), np.int32)
        for k, (a, b) in enumerate(slices):
            m[k, a:b] = 1
        return m

    def make_trainer(pred):
        class T:
            out_dir = str(tmp_path)
            epoch = 0
            eval_metrics = {}

            class val_loader:
                @staticmethod
                def epoch(_):
                    yield {"segment": segment, "instance": instance}

            @staticmethod
            def predict(batch):
                return pred
        return T

    ev = InsSegEvaluator(num_classes=2, segment_ignore_index=())
    perfect = {"pred_classes": np.array([0, 0, 1]),
               "pred_scores": np.array([0.9, 0.8, 0.95]),
               "pred_masks": masks_of([(0, 100), (100, 200), (200, 400)])}
    ev.trainer = make_trainer(perfect)
    ev.after_epoch()
    assert ev.trainer.eval_metrics["val_map"] == 1.0
    assert ev.trainer.eval_metrics["val_ap50"] == 1.0

    # instance 2 predicted with only ~33% IoU (100/300 overlap):
    # counts at 0.25 but not at 0.5
    partial = {"pred_classes": np.array([0, 0, 1]),
               "pred_scores": np.array([0.9, 0.8, 0.95]),
               "pred_masks": masks_of([(0, 100), (100, 200), (100, 300)])}
    ev2 = InsSegEvaluator(num_classes=2, segment_ignore_index=())
    ev2.trainer = make_trainer(partial)
    ev2.after_epoch()
    m = ev2.trainer.eval_metrics
    assert m["val_ap25"] == 1.0
    assert m["val_ap50"] == 0.5   # class 0 perfect, class 1 missed
    assert m["val_map"] == 0.5


def test_mix3d_collate():
    """Mix3d hook merges two scenes at fixed capacity (reference
    point_collate_fn mix_prob, pointcept/datasets/utils.py:61-72)."""
    from unipre3d_tpu.data.transforms import make_mix3d_collate, mix3d_pair

    rng = np.random.default_rng(0)
    M = 64
    a = {"coord": np.full((M, 3), 1.0, np.float32),
         "segment": np.zeros(M, np.int64),
         "mask": np.arange(M) < 40}
    b = {"coord": np.full((M, 3), 2.0, np.float32),
         "segment": np.ones(M, np.int64),
         "mask": np.arange(M) < 50}
    m = mix3d_pair(a, b, rng)
    assert m["coord"].shape == (M, 3)
    valid = m["mask"]
    assert valid.sum() == M  # 90 valid points subsampled to capacity
    # both scenes contribute
    assert (m["segment"][valid] == 0).any() and \
        (m["segment"][valid] == 1).any()
    # coords follow their segment
    np.testing.assert_array_equal(
        m["coord"][valid][m["segment"][valid] == 1][:, 0], 2.0)

    hook = make_mix3d_collate(mix_prob=1.0, seed=0)
    out = hook([a, b])
    assert len(out) == 2 and out[0]["coord"].shape == (M, 3)
    hook0 = make_mix3d_collate(mix_prob=0.0)
    out0 = hook0([a, b])
    assert out0[0] is a
