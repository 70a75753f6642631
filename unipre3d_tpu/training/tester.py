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
from typing import Callable, Dict, List, Optional, Sequence

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
