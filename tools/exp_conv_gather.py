"""Experiment: attribute the 17.6 ms subm-conv and 35 ms merge-lookup.

Measures conv-gather variants (window gather, per-column, rolled-gather,
pure matmul) and the sort-based merge-rank lookup candidate against the
hierarchical rank, at the scene fine-level shape (86k voxels, 96 ch,
k=3^3). Run ALONE on the TPU host: python tools/exp_conv_gather.py
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
    print(f"{name:44s}: {ms:9.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    M = 81920 + 4096
    pts = rng.uniform(0, 8.0, (M, 3)).astype(np.float32)
    coords = np.floor(pts / 0.02).astype(np.int32) % 400
    mask = np.ones((M,), bool)
    feats = rng.normal(size=(M, 96)).astype(np.float32)

    sv, _ = jax.jit(sp.canonicalize)(
        jnp.asarray(coords), jnp.asarray(feats).astype(jnp.bfloat16),
        jnp.asarray(mask))
    offs3 = sp.kernel_offsets(3)
    nbr3 = jax.jit(lambda s: sp.find_neighbors(s, offs3))(sv)
    nbr3.block_until_ready()
    f96 = sv.feats
    w96 = jnp.asarray(rng.normal(size=(27, 96, 96))).astype(jnp.bfloat16)

    # --- conv variants ---
    bench("conv full (current: window gather)",
          jax.jit(lambda f, n, w: sp.subm_gather_matmul(f, n, w)),
          f96, nbr3, w96)

    def conv_gall(f, n, w):
        g = sp._gather_all(f, n)
        return jax.lax.dot_general(
            g.reshape(M, 27 * 96), w.reshape(27 * 96, -1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(f.dtype)

    bench("conv via per-column gathers", jax.jit(conv_gall),
          f96, nbr3, w96)

    def conv_flat(f, n, w):
        safe = jnp.clip(n, 0, M - 1)
        g = jnp.take(f, safe.reshape(-1), axis=0).reshape(M, 27, 96)
        g = jnp.where((n >= 0)[..., None], g, 0)
        return jax.lax.dot_general(
            g.reshape(M, 27 * 96), w.reshape(27 * 96, -1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(f.dtype)

    bench("conv via flat 2.3M-row gather", jax.jit(conv_flat),
          f96, nbr3, w96)

    def conv_rolled(f, n, w):
        # rolled-gather: p-th window element = take(roll(f, -p), a)
        cols = n.reshape(M, 9, 3)
        a = jnp.min(jnp.where(cols >= 0, cols, M + 3), axis=2)   # [M, 9]
        ac = jnp.clip(a, 0, M - 1)
        o = cols - a[..., None]
        g = jnp.zeros((M, 9, 3, 96), f.dtype)
        for p in range(3):
            gp = jnp.take(jnp.roll(f, -p, axis=0), ac, axis=0)   # [M,9,96]
            for k in range(3):
                g = g.at[:, :, k, :].add(
                    jnp.where((o[:, :, k] == p)[..., None], gp, 0))
        g = jnp.where((cols >= 0)[..., None], g, 0)
        return jax.lax.dot_general(
            g.reshape(M, 27 * 96), w.reshape(27 * 96, -1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(f.dtype)

    bench("conv via rolled gathers", jax.jit(conv_rolled),
          f96, nbr3, w96)

    bench("window gather only", jax.jit(
        lambda f, n: sp._window_gather(f, n, 3)), f96, nbr3)

    def win_only(f, n):
        win = jnp.concatenate([jnp.roll(f, -p, axis=0)
                               for p in range(3)], axis=1)
        cols = n.reshape(M, 9, 3)
        a = jnp.min(jnp.where(cols >= 0, cols, M + 3), axis=2)
        return jnp.take(win, jnp.clip(a, 0, M - 1), axis=0)

    bench("window build + row gather (no select)", jax.jit(win_only),
          f96, nbr3)

    bench("pure matmul [86k,2592]@[2592,96] bf16", jax.jit(
        lambda g, w: jax.lax.dot_general(
            g, w.reshape(27 * 96, -1), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(g.dtype)),
        jnp.zeros((M, 27 * 96), jnp.bfloat16), w96)

    # --- lookup variants ---
    codes = sp.pack_code(sv.coords, sv.mask)
    r = 1
    dxdy = np.asarray([(dx, dy) for dx in range(-r, r + 1)
                       for dy in range(-r, r + 1)], np.int32)
    G = dxdy.shape[0]

    def build_tgt(s):
        txy = s.coords[:, None, :2] + dxdy[None, :, :]
        z = s.coords[:, 2].astype(jnp.uint32)
        ok = jnp.all((txy >= 0) & (txy < 1024), axis=-1) & s.mask[:, None]
        t = ((txy[..., 0].astype(jnp.uint32) << 20)
             | (txy[..., 1].astype(jnp.uint32) << 10) | z[:, None])
        return jnp.where(ok, t, sp.INVALID_CODE)

    tgt = jax.jit(build_tgt)(sv)   # [M, G]

    bench(f"hierarchical lookup {G} cols", jax.jit(
        lambda c, t: sp._merge_lookup(c, t, return_floor=True)),
        codes, tgt)

    def merge_rank(c, t):
        # batched merge: sort [G, 2M] of (codes ++ needles), rank by
        # position arithmetic. Returns (found idx or -1, floor rank).
        Gn, Mn = t.shape[1], c.shape[0]
        keys = jnp.concatenate(
            [jnp.broadcast_to(c, (Gn, Mn)), t.T], axis=1)      # [G, 2M]
        payload = jnp.broadcast_to(jnp.arange(2 * Mn, dtype=jnp.int32),
                                   (Gn, 2 * Mn))
        sk, sp_ = jax.lax.sort((keys, payload), dimension=1, num_keys=1,
                               is_stable=True)
        is_b = sp_ >= Mn
        nb = jnp.cumsum(is_b.astype(jnp.int32), axis=1)        # inclusive
        pos = jax.lax.broadcasted_iota(jnp.int32, sk.shape, 1)
        floor = pos - nb                                        # = #A<=b - 1
        prev_k = jnp.pad(sk[:, :-1], ((0, 0), (1, 0)),
                         constant_values=0)
        prev_is_a = jnp.pad(~is_b[:, :-1], ((0, 0), (1, 0)),
                            constant_values=False)
        found = is_b & prev_is_a & (prev_k == sk) & \
            (sk != sp.INVALID_CODE)
        res = jnp.where(found, floor, -1)
        # scatter back to needle order: out[g, orig-M]
        bidx = jnp.where(is_b, sp_ - Mn, 2 * Mn)
        gi = jax.lax.broadcasted_iota(jnp.int32, sk.shape, 0)
        out_res = jnp.full((Gn, Mn + 1), -1, jnp.int32).at[
            gi, bidx].set(res, mode="drop")[:, :Mn]
        out_floor = jnp.full((Gn, Mn + 1), -1, jnp.int32).at[
            gi, bidx].set(floor, mode="drop")[:, :Mn]
        return out_res.T, out_floor.T

    import functools
    bench(f"merge-sort rank {G} cols", jax.jit(merge_rank), codes, tgt)

    # pieces
    keys = jnp.concatenate(
        [jnp.broadcast_to(codes, (G, M)), tgt.T], axis=1)
    payload = jnp.broadcast_to(jnp.arange(2 * M, dtype=jnp.int32),
                               (G, 2 * M))
    bench(f"bare pair-sort [{G}, 2M]", jax.jit(
        lambda k, p: jax.lax.sort((k, p), dimension=1, num_keys=1,
                                  is_stable=True)), keys, payload)
    bench(f"cumsum [{G}, 2M] i32", jax.jit(
        lambda p: jnp.cumsum((p >= M).astype(jnp.int32), axis=1)), payload)
    sc_vals = jnp.zeros((G, M), jnp.int32)
    sc_idx = jnp.asarray(rng.integers(0, M, (G, M)).astype(np.int32))
    gi = jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32)[:, None], (G, M))
    bench(f"2D scatter [{G}, M] -> [{G}, M]", jax.jit(
        lambda i, g, v: jnp.full((G, M), -1, jnp.int32).at[g, i].set(v)),
        sc_idx, gi, sc_vals)

    # take_elements window variant: 2 aligned 8-rows around floor
    idx = jnp.asarray(rng.integers(2, M - 2, (M, 9)).astype(np.int32))

    def window16(c, i):
        n_pad = -(-M // 8) * 8
        tab = jnp.concatenate([c, jnp.zeros((n_pad - M + 8,), c.dtype)])
        rows = tab.reshape(-1, 8)
        base = i // 8
        g0 = jnp.take(rows, base, axis=0)            # [M, 9, 8]
        g1 = jnp.take(rows, base + 1, axis=0)
        return jnp.concatenate([g0, g1], axis=-1)    # [M, 9, 16]

    bench("16-wide window gather [M,9]", jax.jit(window16), codes, idx)

    # conv at stem shape: k5, 6ch in, 32 out
    offs5 = sp.kernel_offsets(5)
    nbr5 = jax.jit(lambda s: sp.find_neighbors(s, offs5))(sv)
    nbr5.block_until_ready()
    f6 = jnp.asarray(rng.normal(size=(M, 6))).astype(jnp.bfloat16)
    w5 = jnp.asarray(rng.normal(size=(125, 6, 32))).astype(jnp.bfloat16)
    bench("stem conv k5 6->32 (current)", jax.jit(
        lambda f, n, w: sp.subm_gather_matmul(f, n, w)), f6, nbr5, w5)


if __name__ == "__main__":
    main()
