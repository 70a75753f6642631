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
