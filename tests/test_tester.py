"""SemSegTester: fragment voting + TTA (reference engines/test.py
SemSegTester parity)."""

import numpy as np

from unipre3d_tpu.training.tester import SemSegTester, grid_fragments


def _scene(n=500, seed=0):
    rng = np.random.default_rng(seed)
    coord = rng.uniform(0, 1.0, (n, 3)).astype(np.float32)
    segment = (coord[:, 0] > 0.5).astype(np.int64)  # 2 classes by x
    return {"coord": coord, "feat": coord.copy(), "segment": segment}


def test_fragments_cover_every_point_once_per_round():
    scene = _scene()
    frags = grid_fragments(scene, grid_size=0.1)
    assert len(frags) > 1   # several points per voxel at this size
    # fragment 0 covers each voxel exactly once; the union of all
    # fragments covers every point at least once
    seen = np.concatenate([f["index"] for f in frags])
    assert set(seen.tolist()) == set(range(len(scene["coord"])))
    # every fragment has one point per occupied voxel
    n_vox = len(frags[0]["index"])
    for f in frags:
        assert len(f["index"]) == n_vox
    # per-fragment point keys are sliced, scene keys passed through
    assert frags[0]["coord"].shape == (n_vox, 3)
    assert frags[0]["segment"].shape == (n_vox,)
    assert frags[0]["grid_coord"].dtype == np.int32


def test_oracle_predictor_reaches_perfect_miou():
    scene = _scene()

    def oracle(frag):
        lab = (frag["coord"][:, 0] > 0.5).astype(int)
        logits = np.zeros((len(lab), 2), np.float32)
        logits[np.arange(len(lab)), lab] = 10.0
        return logits

    tester = SemSegTester(num_classes=2, predict_fn=oracle, grid_size=0.1)
    rec = tester.test([scene])
    assert rec["mIoU"] == 1.0 and rec["allAcc"] == 1.0


def test_voting_overrides_minority_noise():
    """A predictor wrong on exactly one fragment per scene is outvoted
    by the clean fragments (the point of fragment voting)."""
    scene = _scene(800, seed=1)
    calls = {"i": 0}

    def flaky(frag):
        lab = (frag["coord"][:, 0] > 0.5).astype(int)
        if calls["i"] == 0:   # first fragment: all wrong
            lab = 1 - lab
        calls["i"] += 1
        logits = np.zeros((len(lab), 2), np.float32)
        logits[np.arange(len(lab)), lab] = 5.0
        return logits

    # dense voxels (~6 pts/voxel) => every point is voted on by many
    # fragments and the single bad fragment is outvoted
    tester = SemSegTester(num_classes=2, predict_fn=flaky, grid_size=0.2)
    rec = tester.test([scene])
    assert rec["allAcc"] > 0.95


def test_tta_ensembling_and_origin_mapping(tmp_path):
    scene = _scene(300, seed=2)
    # voxelized labels + inverse map back to a larger origin cloud
    inverse = np.random.default_rng(3).integers(0, 300, 900)
    scene["inverse"] = inverse
    scene["origin_segment"] = scene["segment"][inverse]

    def oracle(frag):
        lab = (frag["coord"][:, 0] > 0.5).astype(int)
        logits = np.zeros((len(lab), 2), np.float32)
        logits[np.arange(len(lab)), lab] = 3.0
        return logits

    # two TTA pipelines: identity + a z-rotation (labels unchanged)
    tester = SemSegTester(
        num_classes=2, predict_fn=oracle, grid_size=0.1,
        aug_transforms=[[], [["RandomRotate",
                              {"angle": [0.5, 0.5], "axis": "z", "p": 1.0}]]],
        save_path=str(tmp_path))
    rec = tester.test([scene])
    # rotation moves points but the oracle looks at rotated coords, so
    # the identity pass dominates correctness; mapping through inverse
    # must keep metrics on the origin cloud
    assert rec["allAcc"] > 0.45
    import os
    assert os.path.exists(tmp_path / "scene0000_pred.npy")
    pred = np.load(tmp_path / "scene0000_pred.npy")
    assert pred.shape == (900,)   # origin-cloud size


# ---- ClsTester / ClsVotingTester / PartSegTester (reference
# engines/test.py:354-640 parity) ----

from unipre3d_tpu.training.tester import (ClsTester, ClsVotingTester,
                                          PartSegTester)


def _cls_examples(n=20, K=4, seed=0):
    rng = np.random.default_rng(seed)
    exs = []
    for i in range(n):
        cat = i % K      # every class present (absent classes zero the
        exs.append({"coord": rng.normal(size=(32, 3)).astype(np.float32),
                    "category": cat})    # class-mean like the reference)
    return exs


def test_cls_tester_oracle_and_metrics():
    exs = _cls_examples()

    def oracle(ex):
        logits = np.zeros(4, np.float32)
        logits[ex["category"]] = 5.0
        return logits

    rec = ClsTester(4, oracle).test(exs)
    assert rec["allAcc"] > 0.999 and rec["mAcc"] > 0.999
    assert rec["mIoU"] > 0.999

    def wrong(ex):
        logits = np.zeros(4, np.float32)
        logits[(ex["category"] + 1) % 4] = 5.0
        return logits

    rec = ClsTester(4, wrong).test(exs)
    assert rec["allAcc"] == 0.0


def test_cls_voting_changes_argmax():
    """One noisy view is outvoted by two clean augmented views —
    voting must flip the argmax relative to the single-view path."""
    ex = {"coord": np.zeros((8, 3), np.float32), "category": 1,
          "view": 0}
    calls = {"i": 0}

    def predict(e):
        # first call (identity aug) is confidently wrong; later calls
        # (rotated copies) are mildly right: softmax-sum must pick 1
        i = calls["i"]
        calls["i"] += 1
        logits = np.zeros(3, np.float32)
        if i % 3 == 0:
            logits[2] = 2.0
        else:
            logits[1] = 2.0
        return logits

    single = ClsTester(3, predict).test([ex])
    assert single["allAcc"] == 0.0     # first vote alone is wrong
    calls["i"] = 0
    voting = ClsVotingTester(
        3, predict, num_repeat=1,
        aug_transforms=[lambda d: d, lambda d: d, lambda d: d])
    rec = voting.test([ex])
    assert rec["allAcc"] > 0.999       # 2-of-3 clean votes win


def test_cls_voting_keeps_best_repeat():
    ex = {"coord": np.zeros((4, 3), np.float32), "category": 0}
    calls = {"i": 0}

    def predict(e):
        i = calls["i"]
        calls["i"] += 1
        logits = np.zeros(2, np.float32)
        logits[0 if i >= 2 else 1] = 3.0   # repeats 0,1 wrong; 2+ right
        return logits

    rec = ClsVotingTester(2, predict, num_repeat=4,
                          metric="allAcc").test([ex])
    assert rec["allAcc"] > 0.999 and rec["best_repeat"] >= 2


def test_partseg_tester_category_scoped_iou():
    categories = ["chair", "table"]
    category2part = {"chair": [0, 1], "table": [2, 3]}
    rng = np.random.default_rng(5)
    # chair with parts 0/1 split by x
    coord = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    segment = (coord[:, 0] > 0.5).astype(np.int64)
    ex = {"coord": coord, "segment": segment, "cls_token": 0}

    def oracle(e):
        lab = (e["coord"][:, 0] > 0.5).astype(int)
        logits = np.zeros((len(lab), 4), np.float32)
        logits[np.arange(len(lab)), lab] = 4.0
        return logits

    rec = PartSegTester(4, oracle, categories, category2part).test([ex])
    assert rec["ins_mIoU"] > 0.999 and abs(rec["cat_mIoU"] - 0.5) < 1e-6  # table absent

    def half_wrong(e):
        lab = (e["coord"][:, 0] > 0.5).astype(int)
        logits = np.zeros((len(lab), 4), np.float32)
        logits[np.arange(len(lab)), 1 - lab] = 4.0
        return logits

    rec = PartSegTester(4, half_wrong, categories, category2part).test([ex])
    assert rec["ins_mIoU"] < 0.1


def test_partseg_tta_voting_outvotes_noise():
    categories = ["chair"]
    category2part = {"chair": [0, 1]}
    coord = np.random.default_rng(7).uniform(0, 1, (60, 3)).astype(
        np.float32)
    segment = (coord[:, 1] > 0.5).astype(np.int64)
    ex = {"coord": coord, "segment": segment, "cls_token": 0}
    calls = {"i": 0}

    def flaky(e):
        lab = (e["coord"][:, 1] > 0.5).astype(int)
        if calls["i"] == 0:
            lab = 1 - lab
        calls["i"] += 1
        logits = np.zeros((len(lab), 2), np.float32)
        logits[np.arange(len(lab)), lab] = 2.0
        return logits

    rec = PartSegTester(2, flaky, categories, category2part,
                        aug_transforms=[lambda d: d] * 3).test([ex])
    assert rec["ins_mIoU"] > 0.999
