"""Sweep the dense splat kernel's pixel-block worksets on the TPU.

The object-regime backward runs (R=128 renders) x (n_pix/p_blk) tiny
programs; if program startup dominates, a larger p_blk (bigger workset)
should win until VMEM pressure bites. Run ALONE on the TPU host:
`python tools/bench_dense_worksets.py`.
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

from unipre3d_tpu.ops.rasterizer import pallas_splat_dense as psd


def time_slope(run_n, lo=5, hi=20, repeats=2):
    lo_t = min(run_n(lo) for _ in range(repeats))
    hi_t = min(run_n(hi) for _ in range(repeats))
    return max((hi_t - lo_t) / (hi - lo), 1e-9)


def main():
    R, N, res = 128, 128, 128
    rng = np.random.default_rng(0)
    mean2d = jnp.asarray(
        rng.uniform(0, res, (R, N, 2)).astype(np.float32))
    conic = jnp.asarray(
        np.tile(np.array([0.05, 0.0, 0.05], np.float32), (R, N, 1)))
    color = jnp.asarray(rng.uniform(0, 1, (R, N, 3)).astype(np.float32))
    opa = jnp.asarray(rng.uniform(0.3, 1, (R, N)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 2, (R, N)).astype(np.float32))
    valid = jnp.ones((R, N), bool)
    bg = np.zeros(3, np.float32)

    def loss(m, c, col, o):
        img = psd.rasterize_dense_batched(m, c, col, o, depth, valid,
                                          bg, res, res)
        return jnp.sum(img)

    fwd = jax.jit(loss)
    fwdbwd = jax.jit(lambda *a: sum(
        jnp.sum(g) for g in jax.grad(loss, argnums=(0, 1, 2, 3))(*a)))

    for ws_f, ws_b in [(262144, 262144), (524288, 262144),
                       (524288, 524288), (1048576, 524288),
                       (1048576, 1048576)]:
        psd._WORKSET_FWD = ws_f
        psd._WORKSET_BWD = ws_b
        fwd_ = jax.jit(loss)
        fb_ = jax.jit(lambda *a: sum(
            jnp.sum(g) for g in jax.grad(loss, argnums=(0, 1, 2, 3))(*a)))
        try:
            float(fwd_(mean2d, conic, color, opa))
            float(fb_(mean2d, conic, color, opa))
        except Exception as e:
            print(f"ws=({ws_f},{ws_b}): FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue

        def run_f(n):
            t0 = time.perf_counter()
            v = None
            for _ in range(n):
                v = fwd_(mean2d, conic, color, opa)
            float(v)
            return time.perf_counter() - t0

        def run_fb(n):
            t0 = time.perf_counter()
            v = None
            for _ in range(n):
                v = fb_(mean2d, conic, color, opa)
            float(v)
            return time.perf_counter() - t0

        tf = time_slope(run_f) * 1e3
        tfb = time_slope(run_fb) * 1e3
        print(f"ws=({ws_f:7d},{ws_b:7d}): fwd {tf:6.2f} ms   "
              f"fwd+bwd {tfb:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
