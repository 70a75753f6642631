"""Micro-attribution of the scene step's geometry machinery on the TPU.

Slope-times the individual primitives the SparseUNet scene step is built
from — argsort-based canonicalization, voxelize/merge, per-level
downsample, find_neighbors internals (hierarchical rank lookup vs the
z-adjacency column derivation), and the gather-conv — at the full
reference config shapes (80k pts + 4k pixels), so the model-forward time
(~285 ms, PERF_NOTES.md) can be attributed below the component level.

Run ALONE on the TPU host:  python tools/geom_breakdown.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from unipre3d_tpu.ops import sparse as sp


def time_slope(run_n, lo=2, hi=10, repeats=2):
    lo_t = min(run_n(lo) for _ in range(repeats))
    hi_t = min(run_n(hi) for _ in range(repeats))
    return max((hi_t - lo_t) / (hi - lo), 1e-9)


def bench(name, jitted, *args, lo=2, hi=10):
    out = jitted(*args)
    scalar = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), o, jnp.float32(0)))
    float(scalar(out))

    def run_n(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = jitted(*args)
        float(scalar(o))
        return time.perf_counter() - t0

    ms = time_slope(run_n, lo, hi) * 1e3
    print(f"{name:42s}: {ms:9.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    M = 81920 + 4096          # fine-level capacity (80k pts + 4k pixels)
    # synthetic room-like cloud: surface-ish distribution, 0.02 grid
    pts = rng.uniform(0, 8.0, (M, 3)).astype(np.float32)
    coords = np.floor(pts / 0.02).astype(np.int32) % 400
    mask = np.ones((M,), bool)
    feats = rng.normal(size=(M, 32)).astype(np.float32)

    coords_j = jnp.asarray(coords)[None]
    feats_j = jnp.asarray(feats.astype(np.float32))[None]
    mask_j = jnp.asarray(mask)[None]

    canon = jax.jit(jax.vmap(sp.canonicalize))
    bench("canonicalize (argsort 84k)", canon, coords_j,
          feats_j.astype(jnp.bfloat16), mask_j)
    sv_b, _ = canon(coords_j, feats_j.astype(jnp.bfloat16), mask_j)

    # bare argsort of the packed codes
    codes_np = np.sort(
        np.asarray(jax.vmap(sp.pack_code)(coords_j, mask_j))[0])
    codes1 = jnp.asarray(codes_np)

    shuf = jnp.asarray(rng.permutation(codes_np))
    bench("argsort u32 84k (bare)",
          jax.jit(lambda c: jnp.argsort(c)), shuf)
    bench("argsort u32 154k (pixels)",
          jax.jit(lambda c: jnp.argsort(c)),
          jnp.asarray(rng.permutation(
              np.sort(rng.integers(0, 2**30, 153600).astype(np.uint32)))))

    offs3 = sp.kernel_offsets(3)
    offs5 = sp.kernel_offsets(5)
    fn3 = jax.jit(lambda s: jax.vmap(
        sp.find_neighbors, in_axes=(0, None))(s, offs3))
    fn5 = jax.jit(lambda s: jax.vmap(
        sp.find_neighbors, in_axes=(0, None))(s, offs5))
    bench("find_neighbors k3 (84k)", fn3, sv_b)
    bench("find_neighbors k5 (84k)", fn5, sv_b)

    # find_neighbors internals at k5: the merge lookup on s^2=25 cols
    def lookup_only(s, n_cols):
        codes = sp.pack_code(s.coords, s.mask)
        r = n_cols  # dummy; build [M, n_cols] targets from xy shifts
        dxdy = np.asarray([(dx, dy) for dx in range(-2, 3)
                           for dy in range(-2, 3)][:n_cols], np.int32)
        txy = s.coords[:, None, :2] + dxdy[None, :, :]
        z = s.coords[:, 2].astype(jnp.uint32)
        tgt = ((txy[..., 0].astype(jnp.uint32) << 20)
               | (txy[..., 1].astype(jnp.uint32) << 10) | z[:, None])
        return sp._merge_lookup(codes, tgt, return_floor=True)

    bench("merge_lookup 25 cols (2.1M needles)",
          jax.jit(lambda s: jax.vmap(
              lambda ss: lookup_only(ss, 25))(s)), sv_b)
    bench("merge_lookup 9 cols (0.76M needles)",
          jax.jit(lambda s: jax.vmap(
              lambda ss: lookup_only(ss, 9))(s)), sv_b)

    # take_elements at the z-adjacency volume: k5 does 4 code_at passes
    # over [M, 25]
    idx = jnp.asarray(rng.integers(0, M, (M, 25)).astype(np.int32))
    bench("take_elements [84k,25] (one pass)",
          jax.jit(lambda c, i: sp.take_elements(c, i)), codes1, idx)

    # gather-conv at fine level, 96ch bf16 (decoder block cost)
    f96 = jnp.asarray(rng.normal(size=(M, 96)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    w96 = jnp.asarray(rng.normal(size=(27, 96, 96)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    nbr3 = fn3(sv_b)[0]
    bench("subm conv k3 96ch fwd (84k)",
          jax.jit(lambda f, n, w: sp.subm_gather_matmul(f, n, w)),
          f96, nbr3, w96)

    def conv_loss(f, n, w):
        return jnp.sum(sp.subm_gather_matmul(f, n, w).astype(jnp.float32))

    bench("subm conv k3 96ch fwd+bwd (84k)",
          jax.jit(jax.grad(conv_loss, argnums=(0, 2))), f96, nbr3, w96)

    # downsample chain (what the encoder does per level)
    w_dn = jnp.asarray(rng.normal(size=(8, 96, 96)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    sv96 = sp.SparseVoxels(coords=sv_b.coords[0], feats=f96,
                           mask=sv_b.mask[0])
    bench("downsample 84k -> 28k (argsort+scatter)",
          jax.jit(lambda s, w: sp.downsample(s, w, M // 3)), sv96, w_dn)

    # voxelize the 8-view pixel cloud (PointFusion)
    P = 153600
    pw = jnp.asarray(rng.uniform(0, 8.0, (P, 3)).astype(np.float32))
    pf = jnp.asarray(rng.normal(size=(P, 32)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    pm = jnp.asarray(np.ones((P,), bool))
    mc = jnp.zeros((3,), jnp.float32)
    bench("voxelize 154k pixels -> 4k",
          jax.jit(lambda a, b, c: sp.voxelize(a, b, c, 0.02, mc, 4096)),
          pw, pf, pm)

    # masked BN fwd+bwd at fine level 96ch
    from unipre3d_tpu.models.sparseunet import MaskedBatchNorm
    bn = MaskedBatchNorm(dtype=jnp.bfloat16)
    v = bn.init(jax.random.PRNGKey(0), f96[None], mask_j, True)

    def bn_loss(p, x):
        y, _ = bn.apply({"params": p["params"],
                         "batch_stats": v["batch_stats"]},
                        x, mask_j, True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32))

    bench("masked BN 96ch fwd+bwd (84k)",
          jax.jit(jax.grad(bn_loss, argnums=(0, 1))), v, f96[None])


if __name__ == "__main__":
    main()
