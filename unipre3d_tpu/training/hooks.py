"""Hook-driven training engine for downstream fine-tuning.

JAX equivalent of the vendored Pointcept engine the reference's
fine-tune stage relies on (reference pointcept/engines/train.py,
pointcept/engines/hooks/{misc,evaluator}.py; SURVEY.md §2.10): an
epoch-based trainer whose behavior is assembled from hooks —
IterationTimer, InformationWriter, CheckpointSaver/Loader, evaluators
(classification accuracy, semantic-segmentation mIoU) and a
RuntimeProfiler that wraps warm-up steps in ``jax.profiler`` traces
(the torch.profiler analog).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class HookBase:
    trainer: "FinetuneTrainer" = None

    def before_train(self): ...
    def before_epoch(self): ...
    def before_step(self): ...
    def after_step(self, metrics: Dict): ...
    def after_epoch(self): ...
    def after_train(self): ...


class IterationTimer(HookBase):
    """Per-iteration timing with warmup skip (reference misc.py:32-76)."""

    def __init__(self, warmup_iter: int = 2):
        self.warmup_iter = warmup_iter
        self._times: List[float] = []

    def before_step(self):
        self._t0 = time.perf_counter()

    def after_step(self, metrics):
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        if len(self._times) > self.warmup_iter:
            metrics["iter_time"] = dt
            metrics["iter_time_avg"] = float(
                np.mean(self._times[self.warmup_iter:]))


class InformationWriter(HookBase):
    """Console + jsonl metrics writer (reference misc.py:78-144)."""

    def __init__(self, log_every: int = 10):
        self.log_every = log_every

    def before_train(self):
        os.makedirs(self.trainer.out_dir, exist_ok=True)
        self._f = open(os.path.join(self.trainer.out_dir, "train.jsonl"),
                       "a")

    def after_step(self, metrics):
        it = self.trainer.global_step
        if it % self.log_every == 0:
            flat = {k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()}
            flat.update(step=it, epoch=self.trainer.epoch)
            self._f.write(json.dumps(flat) + "\n")
            self._f.flush()
            msg = " ".join(f"{k}={v:.4g}" if isinstance(v, float)
                           else f"{k}={v}" for k, v in flat.items())
            print(f"[finetune] {msg}", flush=True)

    def after_train(self):
        self._f.close()


class CheckpointSaver(HookBase):
    """Save latest every epoch + best on metric improvement
    (reference misc.py:146-205)."""

    def __init__(self, metric: str = "val_acc", mode: str = "max"):
        self.metric = metric
        self.mode = mode
        self.best: Optional[float] = None

    def after_epoch(self):
        from unipre3d_tpu.training import checkpoint as ckpt_lib
        t = self.trainer
        ckpt_lib.save_checkpoint(
            os.path.join(t.out_dir, "model_latest.ckpt"), t.state,
            self.best or 0.0)
        cur = t.eval_metrics.get(self.metric)
        if cur is None:
            return
        better = self.best is None or (
            cur > self.best if self.mode == "max" else cur < self.best)
        if better:
            self.best = float(cur)
            ckpt_lib.save_checkpoint(
                os.path.join(t.out_dir, "model_best.ckpt"), t.state,
                self.best)


class CheckpointLoader(HookBase):
    """Resume from model_latest.ckpt when present
    (reference misc.py:207-253)."""

    def before_train(self):
        from unipre3d_tpu.training import checkpoint as ckpt_lib
        path = os.path.join(self.trainer.out_dir, "model_latest.ckpt")
        if os.path.exists(path):
            self.trainer.state, _ = ckpt_lib.load_checkpoint(
                path, self.trainer.state)
            print(f"[finetune] resumed from {path}")


class RuntimeProfiler(HookBase):
    """jax.profiler trace of a few warm steps -> TensorBoard/XProf dir
    (reference misc.py:316-464 torch.profiler analog)."""

    def __init__(self, start_step: int = 3, num_steps: int = 2):
        self.start_step = start_step
        self.num_steps = num_steps
        self._active = False

    def before_step(self):
        if self.trainer.global_step == self.start_step:
            self._dir = os.path.join(self.trainer.out_dir, "profile")
            jax.profiler.start_trace(self._dir)
            self._active = True

    def after_step(self, metrics):
        if self._active and self.trainer.global_step >= \
                self.start_step + self.num_steps - 1:
            jax.profiler.stop_trace()
            self._active = False
            print(f"[finetune] profile written to {self._dir}")


class ClsEvaluator(HookBase):
    """Per-epoch classification accuracy / mean class accuracy
    (reference hooks/evaluator.py:22-103)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes

    def after_epoch(self):
        t = self.trainer
        if t.val_loader is None:
            return
        correct = np.zeros(self.num_classes)
        seen = np.zeros(self.num_classes)
        for batch in t.val_loader.epoch(0):
            logits = t.predict(batch)
            pred = np.asarray(jnp.argmax(logits, -1)).reshape(-1)
            lab = np.asarray(batch["label"]).reshape(-1)
            for c in range(self.num_classes):
                m = lab == c
                seen[c] += m.sum()
                correct[c] += (pred[m] == c).sum()
        acc = correct.sum() / max(seen.sum(), 1)
        macc = float(np.mean(correct[seen > 0] / seen[seen > 0])) \
            if (seen > 0).any() else 0.0
        t.eval_metrics.update(val_acc=float(acc), val_macc=macc)
        print(f"[finetune] epoch {t.epoch}: acc={acc:.4f} mAcc={macc:.4f}")


class SemSegEvaluator(HookBase):
    """Per-epoch mIoU / mAcc / allAcc (reference evaluator.py:106-203)."""

    def __init__(self, num_classes: int, ignore_index: int = -1):
        self.num_classes = num_classes
        self.ignore_index = ignore_index

    def after_epoch(self):
        t = self.trainer
        if t.val_loader is None:
            return
        inter = np.zeros(self.num_classes)
        union = np.zeros(self.num_classes)
        target = np.zeros(self.num_classes)
        correct = 0
        total = 0
        for batch in t.val_loader.epoch(0):
            logits = t.predict(batch)
            pred = np.asarray(jnp.argmax(logits, -1)).reshape(-1)
            lab = np.asarray(batch["segment"]).reshape(-1)
            ok = lab != self.ignore_index
            pred, lab = pred[ok], lab[ok]
            correct += (pred == lab).sum()
            total += len(lab)
            for c in range(self.num_classes):
                p, l = pred == c, lab == c
                inter[c] += (p & l).sum()
                union[c] += (p | l).sum()
                target[c] += l.sum()
        present = target > 0
        iou = inter[present] / np.maximum(union[present], 1)
        macc = inter[present] / np.maximum(target[present], 1)
        t.eval_metrics.update(
            val_miou=float(iou.mean()) if present.any() else 0.0,
            val_macc=float(macc.mean()) if present.any() else 0.0,
            val_allacc=float(correct / max(total, 1)))
        print(f"[finetune] epoch {t.epoch}: "
              f"mIoU={t.eval_metrics['val_miou']:.4f} "
              f"allAcc={t.eval_metrics['val_allacc']:.4f}")


class InsSegEvaluator(HookBase):
    """ScanNet-protocol instance-segmentation AP (reference
    hooks/evaluator.py:205-581): per-class greedy matching of predicted
    instances to GT at IoU thresholds {0.5..0.9 step 0.05} U {0.25},
    min region size 100, AP via the step-width-integrated PR curve;
    reports mAP / AP50 / AP25.

    ``trainer.predict(batch)`` must return a dict with ``pred_classes``
    [K], ``pred_scores`` [K] and ``pred_masks`` [K, N] (binary).
    """

    def __init__(self, num_classes: int, class_names=None,
                 segment_ignore_index=(-1,), instance_ignore_index=-1,
                 min_region_size: int = 100):
        self.num_classes = num_classes
        self.class_names = list(class_names) if class_names else \
            [str(i) for i in range(num_classes)]
        self.segment_ignore_index = set(segment_ignore_index)
        self.instance_ignore_index = instance_ignore_index
        self.overlaps = np.append(np.arange(0.5, 0.95, 0.05), 0.25)
        self.min_region_size = min_region_size
        self.valid_classes = [c for c in range(num_classes)
                              if c not in self.segment_ignore_index]

    def _match_scene(self, pred, segment, instance):
        """Associate predictions with GT instances for one scene
        (reference associate_instances, evaluator.py:227-302)."""
        segment = np.asarray(segment).reshape(-1)
        instance = np.asarray(instance).reshape(-1)
        void_mask = np.isin(segment, list(self.segment_ignore_index))
        gts = {c: [] for c in self.valid_classes}
        ids, first, counts = np.unique(instance, return_index=True,
                                       return_counts=True)
        seg_of = segment[first]
        for iid, seg, cnt in zip(ids, seg_of, counts):
            if iid == self.instance_ignore_index or \
                    seg in self.segment_ignore_index:
                continue
            gts[int(seg)].append({"id": int(iid), "verts": int(cnt),
                                  "matched": []})
        preds = {c: [] for c in self.valid_classes}
        classes = np.asarray(pred["pred_classes"]).reshape(-1)
        scores = np.asarray(pred["pred_scores"]).reshape(-1)
        masks = np.asarray(pred["pred_masks"]).astype(bool)
        for k in range(len(classes)):
            c = int(classes[k])
            if c in self.segment_ignore_index or c not in preds:
                continue
            mask = masks[k]
            verts = int(mask.sum())
            if verts < self.min_region_size:
                continue
            p = {"score": float(scores[k]), "verts": verts,
                 "void": int((void_mask & mask).sum()), "matched": []}
            for g in gts[c]:
                inter = int(((instance == g["id"]) & mask).sum())
                if inter > 0:
                    p["matched"].append((g, inter))
                    g["matched"].append((p, inter))
            preds[c].append(p)
        return {"gt": gts, "pred": preds}

    def _ap(self, scenes):
        """AP table [n_valid_classes, n_overlaps] (reference
        evaluate_matches, evaluator.py:304-504)."""
        ap = np.full((len(self.valid_classes), len(self.overlaps)),
                     np.nan)
        for oi, th in enumerate(self.overlaps):
            for li, c in enumerate(self.valid_classes):
                y_true, y_score = [], []
                hard_fn = 0
                has_gt = has_pred = False
                visited = set()
                for scene in scenes:
                    gts = [g for g in scene["gt"][c]
                           if g["verts"] >= self.min_region_size]
                    preds = scene["pred"][c]
                    has_gt |= bool(gts)
                    has_pred |= bool(preds)
                    # greedy GT -> pred matching by confidence
                    for g in gts:
                        best = None
                        extras = []
                        for p, inter in g["matched"]:
                            if id(p) in visited:
                                continue
                            iou = inter / (g["verts"] + p["verts"] - inter)
                            if iou > th:
                                if best is None:
                                    best = p
                                elif p["score"] > best["score"]:
                                    extras.append(best)
                                    best = p
                                else:
                                    extras.append(p)
                        if best is None:
                            hard_fn += 1
                        else:
                            visited.add(id(best))
                            y_true.append(1)
                            y_score.append(best["score"])
                            for p in extras:  # duplicate hits are FPs
                                y_true.append(0)
                                y_score.append(p["score"])
                    # unmatched predictions are FPs unless mostly void /
                    # small-GT overlap (ScanNet ignore rule)
                    for p in preds:
                        hit = any(
                            inter / (g["verts"] + p["verts"] - inter) > th
                            for g, inter in p["matched"])
                        if hit:
                            continue
                        ignore = p["void"] + sum(
                            inter for g, inter in p["matched"]
                            if g["verts"] < self.min_region_size)
                        if ignore / p["verts"] <= th:
                            y_true.append(0)
                            y_score.append(p["score"])
                if not has_gt:
                    continue
                if not has_pred or not y_true:
                    ap[li, oi] = 0.0
                    continue
                order = np.argsort(y_score)[::-1]  # descending confidence
                yt = np.asarray(y_true)[order]
                tp = np.cumsum(yt)
                fp = np.cumsum(1 - yt)
                # every GT is either a TP somewhere in the list or a
                # hard FN, so recall denominator = total GT count
                denom = max(int(tp[-1]) + hard_fn, 1)
                prec = tp / np.maximum(tp + fp, 1)
                rec = tp / denom
                # standard step integration of the PR curve
                prec = np.concatenate([[1.0], prec])
                rec = np.concatenate([[0.0], rec])
                ap[li, oi] = float(np.sum(np.diff(rec) * prec[1:]))
        return ap

    def after_epoch(self):
        t = self.trainer
        if t.val_loader is None:
            return
        scenes = []
        for batch in t.val_loader.epoch(0):
            pred = t.predict(batch)
            scenes.append(self._match_scene(
                pred, batch["segment"], batch["instance"]))
        ap = self._ap(scenes)
        o25 = np.isclose(self.overlaps, 0.25)
        o50 = np.isclose(self.overlaps, 0.5)
        m = {"val_map": float(np.nanmean(ap[:, ~o25])),
             "val_ap50": float(np.nanmean(ap[:, o50])),
             "val_ap25": float(np.nanmean(ap[:, o25]))}
        t.eval_metrics.update({k: (0.0 if np.isnan(v) else v)
                               for k, v in m.items()})
        print(f"[finetune] epoch {t.epoch}: mAP={m['val_map']:.4f} "
              f"AP50={m['val_ap50']:.4f} AP25={m['val_ap25']:.4f}")


class FinetuneTrainer:
    """Epoch-based hook-driven trainer (reference engines/train.py:309).

    ``train_step(state, batch) -> (state, metrics)`` and
    ``predict_fn(state, batch) -> logits`` are jitted callables the
    caller builds for the task (classification, part-seg, sem-seg).
    """

    def __init__(self, state, train_step: Callable, train_loader,
                 out_dir: str, max_epoch: int,
                 predict_fn: Optional[Callable] = None, val_loader=None,
                 hooks: Sequence[HookBase] = ()):
        self.state = state
        self.train_step = train_step
        self.predict_fn = predict_fn
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.out_dir = out_dir
        self.max_epoch = max_epoch
        self.hooks = list(hooks)
        for h in self.hooks:
            h.trainer = self
        self.epoch = 0
        self.global_step = 0
        self.eval_metrics: Dict[str, float] = {}

    def predict(self, batch):
        jb = jax.tree_util.tree_map(jnp.asarray, batch)
        return self.predict_fn(self.state, jb)

    def _call(self, name, *a):
        for h in self.hooks:
            getattr(h, name)(*a)

    def train(self):
        self._call("before_train")
        for self.epoch in range(self.epoch, self.max_epoch):
            self._call("before_epoch")
            for batch in self.train_loader.epoch(self.epoch):
                self._call("before_step")
                jb = jax.tree_util.tree_map(jnp.asarray, batch)
                self.state, metrics = self.train_step(self.state, jb)
                self.global_step += 1
                metrics = {k: v for k, v in metrics.items()}
                self._call("after_step", metrics)
            self._call("after_epoch")
        self._call("after_train")
        return self.state
