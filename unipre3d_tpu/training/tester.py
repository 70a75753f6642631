"""Downstream evaluation harness: fragment voting + TTA ensembling.

Parity with the reference Pointcept tester (reference
pointcept/engines/test.py:115-352 ``SemSegTester``): a whole scene is
evaluated by

1. **TTA** — running a list of augmentation pipelines over the raw scene
   (identity by default; rotations/scales for ensembling),
2. **grid-crop fragmenting** — test-mode GridSample splits each
   augmented scene into ``count.max()`` fragments, fragment ``i`` taking
   the ``i % count``-th point of every voxel, each carrying ``index``
   back into the augmented scene (reference
   pointcept/datasets/transform.py:853-880),
3. **logit voting** — each fragment's per-point class probabilities are
   scatter-added into one whole-scene ``[n, K]`` accumulator over
   ``index`` (test.py:178-198),
4. whole-scene argmax against the labels -> per-class
   intersection/union/target, mIoU / mAcc / allAcc (test.py:230-340).

The model is abstracted as ``predict_fn(fragment_dict) -> logits
[n_frag, K]`` so the same tester drives any fine-tuned scene backbone
(SparseUNet / PTv3 through training/hooks.py FinetuneTrainer.predict).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from unipre3d_tpu.data.transforms import (Compose, TRANSFORMS,
                                          fnv_hash_vec)


def _build_pipeline(spec) -> Compose:
    """Config-syntax transform list -> Compose (``[name, kwargs]``
    entries or transform instances)."""
    built = [t if not isinstance(t, (tuple, list))
             else TRANSFORMS[t[0]](**(t[1] if len(t) > 1 else {}))
             for t in spec]
    return Compose(built)

_POINT_KEYS = ("coord", "grid_coord", "color", "normal", "segment",
               "instance", "feat", "displacement")


def grid_fragments(data_dict: Dict[str, np.ndarray], grid_size: float,
                   keys: Sequence[str] = ("coord", "color", "normal",
                                          "feat"),
                   return_grid_coord: bool = True
                   ) -> List[Dict[str, np.ndarray]]:
    """Test-mode GridSample: split a scene into voxel-stratified
    fragments that cover every point exactly once (reference
    transform.py:853-880). Each fragment carries ``index`` — the row of
    each fragment point in the input scene."""
    coord = np.asarray(data_dict["coord"])
    scaled = coord / grid_size
    grid_coord = np.floor(scaled).astype(np.int64)
    gmin = grid_coord.min(0)
    grid_coord = grid_coord - gmin
    key = fnv_hash_vec(grid_coord)
    idx_sort = np.argsort(key)
    key_sort = key[idx_sort]
    _, count = np.unique(key_sort, return_counts=True)
    starts = np.cumsum(np.insert(count, 0, 0)[:-1])
    fragments = []
    for i in range(int(count.max())):
        idx_part = idx_sort[starts + i % count]
        part = {"index": idx_part}
        if return_grid_coord:
            part["grid_coord"] = grid_coord[idx_part].astype(np.int32)
        part["min_coord"] = (gmin * grid_size).astype(np.float32)
        for k, v in data_dict.items():
            if k in ("index", "min_coord"):
                continue
            if k in keys or (k in _POINT_KEYS and k != "grid_coord"):
                part[k] = v[idx_part]
            else:
                part[k] = v
        fragments.append(part)
    return fragments


class SemSegTester:
    """Fragment-voting semantic-segmentation tester.

    Parameters
    ----------
    num_classes: label-space size K.
    predict_fn: ``(fragment_dict) -> [n_frag, K]`` logits.
    grid_size: voxel size of the fragmenting GridSample.
    aug_transforms: TTA pipelines, each a transform list in the
        data/transforms.py config syntax (``[["RandomRotate", {...}]]``)
        or a callable ``data_dict -> data_dict``. Default: identity.
    ignore_index: label to exclude (reference -1).
    save_path: when set, per-scene ``{name}_pred.npy`` argmax dumps
        (reference result/ folder, test.py:165-176).
    """

    def __init__(self, num_classes: int, predict_fn: Callable,
                 grid_size: float = 0.02,
                 aug_transforms: Optional[Sequence] = None,
                 ignore_index: int = -1,
                 save_path: Optional[str] = None):
        self.num_classes = num_classes
        self.predict_fn = predict_fn
        self.grid_size = grid_size
        self.ignore_index = ignore_index
        self.save_path = save_path
        if aug_transforms is None:
            self.augs = [lambda d: d]
        else:
            self.augs = [a if callable(a) else _build_pipeline(a)
                         for a in aug_transforms]

    @staticmethod
    def _softmax(x):
        x = x - x.max(axis=-1, keepdims=True)
        e = np.exp(x)
        return e / e.sum(axis=-1, keepdims=True)

    def test_scene(self, data_dict: Dict[str, np.ndarray]
                   ) -> Dict[str, np.ndarray]:
        """One scene -> (pred [n], accumulated probs [n, K])."""
        n = len(data_dict["coord"])
        probs = np.zeros((n, self.num_classes), np.float64)
        for aug in self.augs:
            aug_dict = aug({k: (np.copy(v) if isinstance(v, np.ndarray)
                                else v) for k, v in data_dict.items()})
            for frag in grid_fragments(aug_dict, self.grid_size):
                logits = np.asarray(self.predict_fn(frag))
                probs[frag["index"]] += self._softmax(logits)
        return probs.argmax(-1), probs

    def test(self, scenes) -> Dict[str, float]:
        """``scenes``: iterable of dicts with at least coord + segment
        (+ optional name, inverse, origin_segment). Returns the
        aggregate record (mIoU / mAcc / allAcc + per-class IoU)."""
        K = self.num_classes
        inter = np.zeros(K)
        union = np.zeros(K)
        target = np.zeros(K)
        correct, total = 0, 0
        for idx, scene in enumerate(scenes):
            pred, _ = self.test_scene(scene)
            segment = np.asarray(scene["segment"]).reshape(-1)
            if "origin_segment" in scene and "inverse" in scene:
                # labels live on the pre-voxelized cloud: map the voxel
                # predictions back through the recorded inverse
                # (reference test.py:199-204)
                pred = pred[np.asarray(scene["inverse"]).reshape(-1)]
                segment = np.asarray(scene["origin_segment"]).reshape(-1)
            if self.save_path:
                os.makedirs(self.save_path, exist_ok=True)
                name = scene.get("name", f"scene{idx:04d}")
                np.save(os.path.join(self.save_path, f"{name}_pred.npy"),
                        pred)
            ok = segment != self.ignore_index
            p, l = pred[ok], segment[ok]
            correct += int((p == l).sum())
            total += int(len(l))
            for c in range(K):
                pc, lc = p == c, l == c
                inter[c] += int((pc & lc).sum())
                union[c] += int((pc | lc).sum())
                target[c] += int(lc.sum())
        present = target > 0
        iou_class = inter / np.maximum(union, 1e-10)
        acc_class = inter / np.maximum(target, 1e-10)
        return {
            "mIoU": float(iou_class[present].mean()) if present.any()
            else 0.0,
            "mAcc": float(acc_class[present].mean()) if present.any()
            else 0.0,
            "allAcc": float(correct / max(total, 1)),
            "iou_class": iou_class,
        }


def _softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def _intersection_union_cls(pred, label, K, ignore_index):
    """Per-class intersection / union / target counts of 1-D label
    arrays (reference pointcept/utils/misc.py intersection_and_union)."""
    ok = label != ignore_index
    p, l = pred[ok], label[ok]
    inter = np.zeros(K)
    union = np.zeros(K)
    target = np.zeros(K)
    for c in range(K):
        pc, lc = p == c, l == c
        inter[c] = int((pc & lc).sum())
        union[c] = int((pc | lc).sum())
        target[c] = int(lc.sum())
    return inter, union, target


class ClsTester:
    """Single-pass shape-classification tester (reference
    pointcept/engines/test.py:354-430 ``ClsTester``): argmax over each
    example's class logits, per-class intersection/union/target
    accumulated over the loader, mIoU/mAcc/allAcc like the reference.

    predict_fn: ``(example_dict) -> [K] or [B, K]`` class logits.
    Examples are dicts carrying at least ``category`` (int label or
    [B] labels)."""

    def __init__(self, num_classes: int, predict_fn: Callable,
                 ignore_index: int = -1):
        self.num_classes = num_classes
        self.predict_fn = predict_fn
        self.ignore_index = ignore_index

    def test(self, examples) -> Dict[str, float]:
        K = self.num_classes
        inter = np.zeros(K)
        union = np.zeros(K)
        target = np.zeros(K)
        for ex in examples:
            logits = np.asarray(self.predict_fn(ex))
            if logits.ndim == 1:
                logits = logits[None]
            pred = logits.argmax(-1).reshape(-1)
            label = np.asarray(ex["category"]).reshape(-1)
            i, u, t = _intersection_union_cls(pred, label, K,
                                              self.ignore_index)
            inter += i
            union += u
            target += t
        iou_class = inter / (union + 1e-10)
        acc_class = inter / (target + 1e-10)
        return {
            "mIoU": float(iou_class.mean()),
            "mAcc": float(acc_class.mean()),
            "allAcc": float(inter.sum() / (target.sum() + 1e-10)),
            "iou_class": iou_class,
        }


class ClsVotingTester:
    """TTA-voting classification tester (reference test.py:432-546
    ``ClsVotingTester``): every example is augmented ``num_repeat``
    times through the (random) ``aug_transforms`` pipelines; each
    repeat's prediction is the softmax-sum over the augmented copies,
    and the best repeat by ``metric`` is kept (the reference's
    per-evaluation best-record loop).

    predict_fn: ``(example_dict) -> [K]`` logits for ONE augmented copy.
    aug_transforms: list of pipelines (data/transforms.py config syntax
    or callables); each pipeline produces one vote per repeat.
    Identity-only by default (voting then equals ClsTester)."""

    def __init__(self, num_classes: int, predict_fn: Callable,
                 num_repeat: int = 10, metric: str = "allAcc",
                 aug_transforms: Optional[Sequence] = None,
                 ignore_index: int = -1):
        self.num_classes = num_classes
        self.predict_fn = predict_fn
        self.num_repeat = num_repeat
        self.metric = metric
        self.ignore_index = ignore_index
        if aug_transforms is None:
            self.augs = [lambda d: d]
        else:
            self.augs = [a if callable(a) else _build_pipeline(a)
                         for a in aug_transforms]

    def test_once(self, examples) -> Dict[str, float]:
        K = self.num_classes
        inter = np.zeros(K)
        target = np.zeros(K)
        for ex in examples:
            probs = np.zeros((K,), np.float64)
            for aug in self.augs:
                copy = aug({k: (np.copy(v) if isinstance(v, np.ndarray)
                                else v) for k, v in ex.items()})
                probs += _softmax(np.asarray(
                    self.predict_fn(copy)).reshape(-1))
            pred = np.asarray([probs.argmax()])
            label = np.asarray(ex["category"]).reshape(-1)
            i, _, t = _intersection_union_cls(pred, label, K,
                                              self.ignore_index)
            inter += i
            target += t
        acc_class = inter / (target + 1e-10)
        return {
            "mAcc": float(acc_class.mean()),
            "allAcc": float(inter.sum() / (target.sum() + 1e-10)),
        }

    def test(self, examples) -> Dict[str, float]:
        best = None
        for i in range(self.num_repeat):
            rec = self.test_once(examples)
            if best is None or rec[self.metric] > best[self.metric]:
                best = dict(rec, best_repeat=i)
        return best


class PartSegTester:
    """Part-segmentation tester (reference test.py:548-640
    ``PartSegTester``): per shape, per-point part probabilities are
    softmax-summed over the TTA copies, argmaxed, and scored as the
    mean IoU over the parts of the shape's CATEGORY (absent parts
    count 1.0); aggregates to instance-average ``ins_mIoU`` and
    category-average ``cat_mIoU``.

    predict_fn: ``(example_dict) -> [n, K]`` per-point part logits.
    categories: ordered category names; category2part: name -> list of
    part labels in the global K-part space (ShapeNetPart layout).
    Examples carry ``cls_token`` (category index) and ``segment``."""

    def __init__(self, num_classes: int, predict_fn: Callable,
                 categories: Sequence[str],
                 category2part: Dict[str, Sequence[int]],
                 aug_transforms: Optional[Sequence] = None):
        self.num_classes = num_classes
        self.predict_fn = predict_fn
        self.categories = list(categories)
        self.category2part = category2part
        if aug_transforms is None:
            self.augs = [lambda d: d]
        else:
            self.augs = [a if callable(a) else _build_pipeline(a)
                         for a in aug_transforms]

    def test(self, examples) -> Dict[str, Any]:
        n_cat = len(self.categories)
        iou_category = np.zeros(n_cat)
        iou_count = np.zeros(n_cat)
        for ex in examples:
            label = np.asarray(ex["segment"]).reshape(-1)
            probs = np.zeros((label.size, self.num_classes), np.float64)
            for aug in self.augs:
                copy = aug({k: (np.copy(v) if isinstance(v, np.ndarray)
                                else v) for k, v in ex.items()})
                probs += _softmax(np.asarray(self.predict_fn(copy)))
            pred = probs.argmax(-1)
            ci = int(ex["cls_token"])
            parts = self.category2part[self.categories[ci]]
            parts_iou = np.zeros(len(parts))
            for j, part in enumerate(parts):
                if (label == part).sum() == 0 and (pred == part).sum() == 0:
                    parts_iou[j] = 1.0
                else:
                    i = ((label == part) & (pred == part)).sum()
                    u = ((label == part) | (pred == part)).sum()
                    parts_iou[j] = i / (u + 1e-10)
            iou_category[ci] += parts_iou.mean()
            iou_count[ci] += 1
        return {
            "ins_mIoU": float(iou_category.sum()
                              / (iou_count.sum() + 1e-10)),
            "cat_mIoU": float((iou_category
                               / (iou_count + 1e-10)).mean()),
            "iou_category": iou_category / (iou_count + 1e-10),
        }
