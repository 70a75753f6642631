"""Micro-bench of the dense batched splat kernel at the object shape.

R=B*V=128 renders, N gaussians, 128x128 — the exact shape routed by
render_supervision_views in the transformer pretraining step. Slope
timing (see bench.py docstring). Run alone on the TPU host.
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


def time_slope(run_n, lo=5, hi=40, repeats=2):
    lo_t = min(run_n(lo) for _ in range(repeats))
    hi_t = min(run_n(hi) for _ in range(repeats))
    return max((hi_t - lo_t) / (hi - lo), 1e-9)


def main(R=128, N=128, res=128):
    from unipre3d_tpu.ops.rasterizer.pallas_splat_dense import \
        rasterize_dense_batched

    rng = np.random.default_rng(0)
    mean2d = jnp.asarray(
        rng.uniform(0, res, (R, N, 2)).astype(np.float32))
    conic = jnp.asarray(
        np.stack([np.full((R, N), 0.05), np.full((R, N), 0.01),
                  np.full((R, N), 0.05)], -1).astype(np.float32))
    color = jnp.asarray(rng.uniform(0, 1, (R, N, 3)).astype(np.float32))
    opacity = jnp.asarray(
        rng.uniform(0.3, 1, (R, N)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 2, (R, N)).astype(np.float32))
    valid = jnp.ones((R, N), bool)
    bg = np.zeros(3, np.float32)

    def fwd(m, c, col, o):
        return jnp.sum(rasterize_dense_batched(
            m, c, col, o, depth, valid, bg, res, res))

    def fwdbwd(m, c, col, o):
        g = jax.grad(fwd, argnums=(0, 1, 2, 3))(m, c, col, o)
        return sum(jnp.sum(x) for x in g)

    for name, fn in [("fwd", jax.jit(fwd)), ("fwd+bwd", jax.jit(fwdbwd))]:
        v = fn(mean2d, conic, color, opacity)
        float(v)

        def run_n(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(mean2d, conic, color, opacity)
            float(out)
            return time.perf_counter() - t0

        ms = time_slope(run_n) * 1e3
        pairs = R * res * res * N
        print(f"R={R} N={N} res={res} {name:8s}: {ms:7.2f} ms  "
              f"({pairs/ms/1e6:.0f} Mpairs/ms)", flush=True)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--R", type=int, default=128)
    p.add_argument("--N", type=int, default=128)
    p.add_argument("--res", type=int, default=128)
    a = p.parse_args()
    main(a.R, a.N, a.res)
