"""Attribute the dense splat kernel's time (transcendentals vs MXU).

Times fwd / fwd+bwd of rasterize_dense_batched at the object shape with
pieces stubbed through the module hooks in pallas_splat_dense
(numerically WRONG variants — measurement only). Run ALONE on the TPU
host: `python tools/exp_splat_variants.py [R N res]`.
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


def time_slope(run_n, lo=5, hi=40, repeats=2):
    lo_t = min(run_n(lo) for _ in range(repeats))
    hi_t = min(run_n(hi) for _ in range(repeats))
    return max((hi_t - lo_t) / (hi - lo), 1e-9)


def bench(R, N, res):
    rng = np.random.default_rng(0)
    mean2d = jnp.asarray(rng.uniform(0, res, (R, N, 2)).astype(np.float32))
    conic = jnp.asarray(np.stack(
        [np.full((R, N), 0.05), np.full((R, N), 0.01),
         np.full((R, N), 0.05)], -1).astype(np.float32))
    color = jnp.asarray(rng.uniform(0, 1, (R, N, 3)).astype(np.float32))
    opa = jnp.asarray(rng.uniform(0.3, 1, (R, N)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 2, (R, N)).astype(np.float32))
    valid = jnp.ones((R, N), bool)
    bg = np.zeros(3, np.float32)

    def fwd(m, c, col, o):
        return jnp.sum(psd.rasterize_dense_batched(
            m, c, col, o, depth, valid, bg, res, res))

    def fwdbwd(m, c, col, o):
        g = jax.grad(fwd, argnums=(0, 1, 2, 3))(m, c, col, o)
        return sum(jnp.sum(x) for x in g)

    out = {}
    for name, fn in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
        j = jax.jit(fn)
        float(j(mean2d, conic, color, opa))

        def run_n(n):
            t0 = time.perf_counter()
            v = None
            for _ in range(n):
                v = j(mean2d, conic, color, opa)
            float(v)
            return time.perf_counter() - t0

        out[name] = time_slope(run_n) * 1e3
    return out


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    fake_exp = lambda x: x * 0.5 + 1.0
    fake_log = lambda x: x * 0.5 - 1.0
    variants = [
        ("base", {}),
        ("no exp", {"_EXP": fake_exp}),
        ("no log", {"_LOG": fake_log}),
        ("no exp/log", {"_EXP": fake_exp, "_LOG": fake_log}),
        ("tri 1-pass", {"_DOT2X_SINGLE": True}),
        ("all off", {"_EXP": fake_exp, "_LOG": fake_log,
                     "_DOT2X_SINGLE": True}),
    ]
    base = {k: getattr(psd, k) for k in ("_EXP", "_LOG", "_DOT2X_SINGLE")}
    for name, over in variants:
        for k, v in {**base, **over}.items():
            setattr(psd, k, v)
        r = bench(R, N, res)
        print(f"{name:12s}: fwd {r['fwd']:7.2f} ms   "
              f"fwd+bwd {r['fwd+bwd']:7.2f} ms", flush=True)
    for k, v in base.items():
        setattr(psd, k, v)


if __name__ == "__main__":
    main()
