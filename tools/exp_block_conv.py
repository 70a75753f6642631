"""Per-conv executor shootout at the real SpUNet level shapes.

Times ONE submanifold conv fwd and fwd+bwd through (a) the gather
executor, (b) the block-dense executor at several static block
capacities, on synthetic surface-like voxel sets at the production
level shapes. Answers whether XLA's batched 3D conv lowering is
MXU-bound or im2col-materialization-bound. Run ALONE on the TPU host:
`python tools/exp_block_conv.py`.
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


def time_slope(run_n, lo=5, hi=20, repeats=2):
    lo_t = min(run_n(lo) for _ in range(repeats))
    hi_t = min(run_n(hi) for _ in range(repeats))
    return max((hi_t - lo_t) / (hi - lo), 1e-9)


def bench(fn, args, grad=False):
    if grad:
        def loss(*a):
            return jnp.sum(fn(*a).astype(jnp.float32))

        def run(*a):
            g = jax.grad(loss, argnums=tuple(range(len(a))))(*a)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in g)
        j = jax.jit(run)
    else:
        j = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(j(*args))

    def run_n(n):
        t0 = time.perf_counter()
        v = None
        for _ in range(n):
            v = j(*args)
        float(v)
        return time.perf_counter() - t0

    return time_slope(run_n) * 1e3


def surface_voxels(rng, n_valid, cap, extent):
    """Surface-like cloud: points on a few planes + a sphere shell."""
    pts = []
    n1 = n_valid // 2
    xy = rng.integers(0, extent, (n1, 2))
    pts.append(np.stack([xy[:, 0], xy[:, 1],
                         (xy[:, 0] // 7) % extent], 1))
    n2 = n_valid - n1
    th = rng.uniform(0, np.pi, n2)
    ph = rng.uniform(0, 2 * np.pi, n2)
    r = extent * 0.4
    c = extent // 2
    pts.append(np.stack([c + r * np.sin(th) * np.cos(ph),
                         c + r * np.sin(th) * np.sin(ph),
                         c + r * np.cos(th)], 1).astype(int))
    coords = np.concatenate(pts).astype(np.int32) % extent
    key = (coords[:, 0].astype(np.int64) << 40) | \
          (coords[:, 1].astype(np.int64) << 20) | coords[:, 2]
    _, first = np.unique(key, return_index=True)
    mask = np.zeros((cap,), bool)
    keep = first[:cap]
    out = np.zeros((cap, 3), np.int32)
    out[:len(keep)] = coords[keep]
    mask[:len(keep)] = True
    return out, mask


def main():
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    # (name, valid, cap, extent, Cin, Cout, k)
    cases = [
        ("fine k3 96ch (dec0)", 60000, 84000, 200, 96, 96, 3),
        ("fine k3 32ch (fusion)", 60000, 84000, 200, 32, 32, 3),
        ("L0 k3 64ch", 20000, 28000, 100, 64, 64, 3),
        ("stem k5 6->32", 60000, 80000, 200, 6, 32, 5),
    ]
    for name, n_valid, cap, extent, cin, cout, k in cases:
        coords, mask = surface_voxels(rng, n_valid, cap, extent)
        sv, _ = jax.jit(sp.canonicalize)(
            jnp.asarray(coords),
            jnp.asarray(rng.normal(size=(cap, cin)).astype(np.float32)),
            jnp.asarray(mask))
        feats = sv.feats.astype(dtype)
        W = jnp.asarray(rng.normal(size=(k ** 3, cin, cout))
                        .astype(np.float32) * 0.1).astype(dtype)
        offs = sp.kernel_offsets(k)
        nbr = jax.jit(lambda s: sp.find_neighbors(s, offs))(sv)
        g_f = bench(lambda f, w: sp.subm_gather_matmul(f, nbr, w),
                    (feats, W))
        g_b = bench(lambda f, w: sp.subm_gather_matmul(f, nbr, w),
                    (feats, W), grad=True)
        line = f"{name:22s} gather {g_f:7.2f}/{g_b:7.2f} ms"
        for div in (8, 16, 32):
            nb_cap = max(cap // div, 16)
            bst = jax.jit(lambda s: sp.block_structure(
                s.coords, s.mask, nb_cap, bs=4, halo=k // 2))(sv)
            nblk = int(np.asarray(bst.block_valid).sum())
            b_f = bench(lambda f, w: sp.block_conv_apply(f, bst, w, 4),
                        (feats, W))
            b_b = bench(lambda f, w: sp.block_conv_apply(f, bst, w, 4),
                        (feats, W), grad=True)
            line += f" | div{div}({nblk}b) {b_f:7.2f}/{b_b:7.2f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
