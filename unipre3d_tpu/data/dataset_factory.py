"""Dataset dispatch (reference dataset/dataset_factory.py:5)."""

from __future__ import annotations


def get_dataset(cfg, split: str):
    """Build the dataset for a composed config + split name.

    ``data.dataset_root == "synthetic"`` (or a missing root) selects the
    procedural synthetic dataset so the full pipeline runs without any
    mounted data.
    """
    category = cfg.data.category
    root = cfg.data.get("dataset_root", cfg.data.get("pts_dataset_root", ""))
    if root == "synthetic" or not (root and __import__("os").path.isdir(root)):
        if category == "scannet":
            from unipre3d_tpu.data.synthetic_scene import SyntheticSceneDataset
            return SyntheticSceneDataset(cfg, split)
        from unipre3d_tpu.data.synthetic import SyntheticDataset
        return SyntheticDataset(cfg, split)
    if category == "shapenet":
        from unipre3d_tpu.data.shapenet import ShapeNetDataset
        return ShapeNetDataset(cfg, split)
    if category == "scannet":
        from unipre3d_tpu.data.scannet import ScanNetDataset
        return ScanNetDataset(cfg, split)
    raise ValueError(f"unknown dataset category: {category}")
