"""Tests for the Hydra-compatible config composer."""

import pytest

from unipre3d_tpu.training.config import load_config, ConfigNode


@pytest.mark.parametrize("name,backbone,level,category", [
    ("transformer_pretraining", "transformer", "object", "shapenet"),
    ("pointmlp_pretraining", "pointmlp", "object", "shapenet"),
    ("pcm_pretraining", "pcm", "object", "shapenet"),
    ("mamba3d_pretraining", "mamba3d", "object", "shapenet"),
    ("sparseunet_pretraining", "sparseunet", "scene", "scannet"),
    ("ptv3_pretraining", "ptv3", "scene", "scannet"),
])
def test_pretraining_configs_compose(name, backbone, level, category):
    cfg = load_config(name)
    assert cfg.model.backbone_type == backbone
    assert cfg.opt.level == level
    assert cfg.data.category == category
    # settings.yaml keys present
    assert cfg.opt.imgs_per_obj == 4
    assert cfg.model.max_sh_degree == 1
    assert cfg.opt.ema.use is True
    assert cfg.logging.val_log == 2000
    # group files landed under their group key
    assert "project" in cfg.wandb
    assert cfg.cam_embd.embedding is None


def test_default_config_is_transformer():
    cfg = load_config("default_config")
    assert cfg.model.backbone_type == "transformer"


def test_own_body_overrides_defaults():
    # each pretraining yaml overrides opt.loss from settings-composed tree
    cfg = load_config("sparseunet_pretraining")
    assert cfg.opt.loss == "l2"
    cfg2 = load_config("transformer_pretraining")
    assert cfg2.opt.loss == "focal_l2"


def test_cli_overrides():
    cfg = load_config("transformer_pretraining",
                      overrides=["opt.batch_size=8", "opt.iterations=10",
                                 "data.dataset_root=/tmp/x", "model.aug=false"])
    assert cfg.opt.batch_size == 8
    assert cfg.opt.iterations == 10
    assert cfg.data.dataset_root == "/tmp/x"
    assert cfg.model.aug is False


def test_attribute_access_nested():
    cfg = ConfigNode.from_obj({"a": {"b": {"c": 3}}})
    assert cfg.a.b.c == 3
    cfg.a.b.c = 5
    assert cfg["a"]["b"]["c"] == 5
