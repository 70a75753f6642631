"""ImageConv gather-commute refactor: numerical equivalence tests.

The object fusion consumes the frozen-VAE feature map at only N
projected pixels (models/fusion.py), so the round-5 step applies
GroupNorm's affine + the 1x1 conv to the N gathered rows instead of all
H*W pixels (models/gaussian_predictor.py:ImageConv.proj_rows). These
tests pin the exactness of that commutation:

1. ImageConv.__call__ == nn.Sequential([nn.GroupNorm, nn.Conv]) with
   identical params (param-tree compatibility + full-map numerics);
2. gather(conv(map)) == proj_rows(gather(normalize(map))) through
   feature_fusion_gather (the production route).
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from unipre3d_tpu.models.gaussian_predictor import (ImageConv,
                                                    group_normalize)
from unipre3d_tpu.models.fusion import feature_fusion_gather


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    B, C, H, W = 2, 32, 16, 16
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    ic = ImageConv(out_dim=48, feat_ch=C)
    params = ic.init(jax.random.PRNGKey(0), x)["params"]
    # non-trivial affine so the split actually matters
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 * np.arange(p.size).reshape(p.shape)
        .astype(np.float32) / p.size, params)
    return x, ic, params


def test_imageconv_matches_sequential(setup):
    x, ic, params = setup
    seq = nn.Sequential([
        nn.GroupNorm(num_groups=32, epsilon=1e-6),
        nn.Conv(48, (1, 1)),
    ])
    y_new = ic.apply({"params": params}, x)
    y_old = seq.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_old),
                               rtol=1e-5, atol=1e-5)


def test_gather_commutes_with_proj(setup):
    x, ic, params = setup
    B, H, W, C = x.shape
    rng = np.random.default_rng(1)
    # full-map route: conv then occlusion-aware gather
    full = ic.apply({"params": params}, x)            # [B, H, W, 48]
    full_nchw = jnp.transpose(full, (0, 3, 1, 2))

    center = jnp.asarray(
        rng.uniform(-0.4, 0.4, (B, 24, 3)).astype(np.float32))
    c2w = jnp.tile(jnp.eye(4)[None], (B, 1, 1)).at[:, 3, 2].set(-1.6)
    intrinsic = jnp.asarray(
        [[20.0, 0, H / 2, 0], [0, 20.0, W / 2, 0], [0, 0, 1, 0]],
        jnp.float32)

    ref = feature_fusion_gather(center, full_nchw, c2w, intrinsic)

    # production route: normalize, gather raw, affine+conv per row
    xn = group_normalize(x, 32, 1e-6)
    xn_nchw = jnp.transpose(xn, (0, 3, 1, 2))
    out = feature_fusion_gather(
        center, xn_nchw, c2w, intrinsic,
        image_proj=lambda rows: ic.apply({"params": params}, rows,
                                         method=ImageConv.proj_rows))
    # at least some points must actually hit the image for the test to
    # mean anything
    assert float(jnp.sum(jnp.abs(ref))) > 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
