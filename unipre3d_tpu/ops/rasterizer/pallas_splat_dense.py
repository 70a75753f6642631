"""Batched dense Pallas splat — the object-level training fast path.

The object pretraining regime (reference configs/*_pretraining.yaml:
batch 32 x 4 supervision views, 128-1024 gaussians per render at 128^2)
is the opposite of the 100k-gaussian regime the binned kernel targets:
N is tiny, so per-tile binning, duplicate sorting and capacity
compaction are pure overhead (measured: the XLA tiled path spends
~97 ms of a 130 ms train step here). This kernel instead:

* batches ALL renders in the Pallas grid ``(R, pixel_blocks)`` — one
  launch for the whole ``[B, V]`` supervision set (the reference runs a
  Python double loop of CUDA launches, train_network.py:417-443);
* keeps the full depth-sorted gaussian table of a render resident in
  VMEM and streams pixels, not gaussians: every pixel block composites
  every gaussian (dense);
* pushes every per-(pixel, gaussian) computation with outer-product or
  prefix structure onto the MXU instead of the VPU (the round-3 kernel
  was VPU-bound at ~45 vector ops per pair; measured 9.4 ms fwd /
  17.3 ms fwd+bwd at the object shape R=128, N=128, 128^2):
  - the EWA exponent is a degree-2 polynomial in the pixel coords, so
    ``power = pixel_basis [P,6] @ coef [6,C]`` — one tiny matmul
    replaces the dx/dy/quadratic VPU chain;
  - transmittance prefixes are computed in log space with a triangular
    matmul ``log(1-alpha) @ L_strict`` instead of a 7-step
    multiplicative roll scan (numerically this matches the CUDA
    reference's sequential f32 ``T *= 1-alpha``: both accumulate
    O(N·eps) rounding);
  - the backward's five geometry gradient rows are moments of
    ``dpow`` against the same pixel basis: ``M = dpow^T @ basis
    [C,6]`` — one matmul replaces five masked [P,C] reductions;
* needs no cross-block transmittance carries — a pixel's full
  compositing chain lives in one program — so the analytic backward is
  single-pass (suffix trick within the local chunk loop) and
  accumulates per-gaussian gradients across pixel blocks into a
  revisited ``[ROWS, N]`` output block.

Compositing semantics match render.py:_composite / the CUDA reference
(alpha cap 0.99, skip power>0 or alpha<1/255, T stop 1e-4, frozen T
after the stop), so tests check it against the XLA renderer's autodiff.
Unlike the tiled paths there is no per-tile bbox cull, so the output
matches the *brute-force* reference renderer (CUDA's tile-granular cull
only drops sub-1/255 tails).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unipre3d_tpu.ops.rasterizer.pallas_splat import (
    ALPHA_MAX, ALPHA_MIN, ROWS, _pack)

T_EPS = 1e-4
LOG_T_EPS = math.log(T_EPS)
HI = jax.lax.Precision.HIGHEST

# measurement indirection hooks (tools/exp_splat_variants.py overrides
# these to attribute kernel time between transcendentals and matmuls;
# production never touches them)
_EXP = jnp.exp
_LOG = jnp.log
_DOT2X_SINGLE = False   # True: one bf16 DEFAULT pass (hook, see above)

# pixel-block x gaussian-chunk working set: P_BLK*CHUNK_N f32 elements
# per intermediate. The backward keeps ~2x more intermediates live
# (grad terms + suffix scans), so it gets half the forward's budget —
# both fit well under the ~16 MB/core VMEM. (A 1M forward workset
# measured 5.05 vs 6.94 ms standalone — tools/bench_dense_worksets.py
# round 5 — but its jvp variant inside the train step needs 20.2 MB of
# scoped VMEM and the compile OOMs, so the standalone win is not
# reachable; keep 256k.)
_WORKSET_FWD = 262144
_WORKSET_BWD = 262144


def _plan(n_pad: int, n_pix: int, workset: int = _WORKSET_BWD):
    chunk_n = min(n_pad, 512)
    # n_pad is padded to a chunk multiple by rasterize_dense_batched;
    # a floored n_chunks would silently drop trailing gaussians.
    assert n_pad % chunk_n == 0, (n_pad, chunk_n)
    # largest power of two within the workset budget, then shrink until
    # it divides the pixel count
    p_blk = 1 << ((workset // chunk_n).bit_length() - 1)
    while p_blk > 1 and n_pix % p_blk:
        p_blk //= 2
    # Mosaic layout: an out-spec block's last dim must be a multiple of
    # 128 or equal the array dim — fall back to one whole-image block
    if p_blk % 128:
        p_blk = n_pix
    assert n_pix % p_blk == 0, (n_pix, p_blk)
    return chunk_n, p_blk


def _pix_basis(b, p_blk, img_w):
    """Degree-2 monomial basis of the pixel coords of flat-pixel block
    ``b``: [P, 6] columns (1, px, py, px^2, py^2, px*py)."""
    flat = b * p_blk + jax.lax.broadcasted_iota(jnp.int32, (p_blk, 1), 0)
    px = (flat % img_w).astype(jnp.float32)
    py = (flat // img_w).astype(jnp.float32)
    one = jnp.ones_like(px)
    return jnp.concatenate(
        [one, px, py, px * px, py * py, px * py], axis=1)


def _power_coefs(g):
    """EWA exponent as polynomial coefficients over the pixel basis.

    power(p, c) = -0.5*(A*dx^2 + C*dy^2) - B*dx*dy with dx = gx - px
    expands to  k0 + k1*px + k2*py + k3*px^2 + k4*py^2 + k5*px*py.
    g [16, C] packed chunk -> [6, C]."""
    gx, gy = g[0:1, :], g[1:2, :]
    A, B, C = g[2:3, :], g[3:4, :], g[4:5, :]
    k0 = -0.5 * (A * gx * gx + C * gy * gy) - B * gx * gy
    k1 = A * gx + B * gy
    k2 = C * gy + B * gx
    return jnp.concatenate([k0, k1, k2, -0.5 * A, -0.5 * C, -B], axis=0)


def _tri_strict_lower(C):
    """[C, C] with 1 where row < col: x @ L = exclusive prefix sum."""
    r = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    return (r < c).astype(jnp.float32)


def _tri_strict_upper(C):
    """[C, C] with 1 where row > col: x @ U = exclusive suffix sum."""
    r = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    return (r > c).astype(jnp.float32)


def _dot_2x(x, tri):
    """x [P,C] @ tri [C,C] (0/1 entries) with a two-pass hi/lo split.

    Mosaic exposes only DEFAULT (one bf16 pass, ~2^-9 relative — too
    lossy for transmittance prefixes) and HIGHEST (~3x passes) dot
    precisions. Splitting x into a bf16 head and an f32 residual and
    summing two DEFAULT passes gives ~2^-18 relative at 2/3 the
    HIGHEST cost; the triangular matrix is exact in bf16."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = x - hi
    d = lambda a: jax.lax.dot_general(
        a, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if _DOT2X_SINGLE:
        return d(x)
    return d(hi) + d(lo)


def _chunk_alpha(g, basis):
    """(alpha, e=exp(power), power, skip); alpha 0 on skipped pairs.

    The tiny positive threshold on the power>0 skip guards the MXU
    polynomial's rounding: valid conics give power <= 0 exactly, and a
    +eps rounding at a gaussian's center must not zero its alpha."""
    power = jax.lax.dot_general(
        basis, _power_coefs(g), (((1,), (0,)), ((), ())),
        precision=HI, preferred_element_type=jnp.float32)      # [P, C]
    e = _EXP(power)
    a = jnp.minimum(ALPHA_MAX, g[5, :][None, :] * e)
    skip = (power > 1e-4) | (a < ALPHA_MIN)
    return jnp.where(skip, 0.0, a), e, power, skip


def _chunk_transmittance(alpha, log_t_in, tri):
    """Log-space compositing state for one chunk.

    Returns (w, contrib, t_before, lg, log_t_incl, log_t_out) where
    log_t_in/_out are [1, P] carries. T stop semantics: a gaussian
    contributes iff the transmittance AFTER it stays >= T_EPS; T
    freezes at the stop (log-space min over the contributing prefix)."""
    om = 1.0 - alpha
    lg = _LOG(om)
    pe = _dot_2x(lg, tri)                                      # [P, C]
    pe = pe + jnp.transpose(log_t_in)
    log_t_incl = pe + lg
    contrib = log_t_incl >= LOG_T_EPS
    t_before = _EXP(pe)
    w = jnp.where(contrib, alpha * t_before, 0.0)
    log_t_out = jnp.min(
        jnp.where(contrib, log_t_incl, jnp.transpose(log_t_in)),
        axis=1)[None, :]
    return w, contrib, t_before, lg, log_t_out


def _dense_fwd_kernel(data_ref, bg_ref, out_ref, tfin_ref,
                      *, n_chunks, chunk_n, p_blk, img_w):
    b = pl.program_id(1)
    basis = _pix_basis(b, p_blk, img_w)
    tri = _tri_strict_lower(chunk_n)

    def body(c, carry):
        rgb, log_t = carry                              # [3,P], [1,P]
        g = data_ref[0, :, pl.ds(c * chunk_n, chunk_n)]  # [16, C]
        alpha, *_ = _chunk_alpha(g, basis)
        w, _, _, _, log_t = _chunk_transmittance(alpha, log_t, tri)
        rgb = rgb + jax.lax.dot_general(
            g[6:9, :], w, (((1,), (1,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)
        return rgb, log_t

    rgb0 = jnp.zeros((3, p_blk), jnp.float32)
    t0 = jnp.zeros((1, p_blk), jnp.float32)
    if n_chunks == 1:  # unrolled: no loop-carried VMEM round-trip
        rgb, log_t = body(0, (rgb0, t0))
    else:
        rgb, log_t = jax.lax.fori_loop(0, n_chunks, body, (rgb0, t0))
    t = jnp.exp(log_t)
    out_ref[0] = rgb + bg_ref[:, :] * t
    tfin_ref[0] = t


def _dense_bwd_kernel(data_ref, bg_ref, gout_ref, dgrad_ref,
                      *, n_chunks, chunk_n, p_blk, img_w):
    b = pl.program_id(1)
    basis = _pix_basis(b, p_blk, img_w)
    tri = _tri_strict_lower(chunk_n)
    tri_u = _tri_strict_upper(chunk_n)

    @pl.when(b == 0)
    def _():
        dgrad_ref[:] = jnp.zeros_like(dgrad_ref)

    g_pix = gout_ref[0]                                  # [3, P]
    bgdotg = jnp.sum(bg_ref[:, :] * g_pix, axis=0)       # [P]

    def chunk_grads(c, g, alpha, e, skip, w, contrib, t_before, tb, s):
        """Shared per-chunk gradient math; returns the suffix update.

        The five geometry rows are pixel-basis moments of dpow:
          row0 (d mx) = -(A*(gx*M0 - Mx) + B*(gy*M0 - My))
          row1 (d my) = -(C*(gy*M0 - My) + B*(gx*M0 - Mx))
          row2 (d A)  = -0.5*(gx^2*M0 - 2*gx*Mx + Mxx)
          row3 (d B)  = -(gx*gy*M0 - gx*My - gy*Mx + Mxy)
          row4 (d C)  = -0.5*(gy^2*M0 - 2*gy*My + Myy)
        with M = dpow^T @ basis = [M0, Mx, My, Mxx, Myy, Mxy] per
        gaussian — one [P,C]x[P,6] MXU contraction replaces five
        masked [P,C] VPU reductions (this was half the round-3
        backward's runtime)."""
        cg = jax.lax.dot_general(
            g_pix, g[6:9, :], (((0,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)  # [P, C]
        u = w * cg
        suf = _dot_2x(u, tri_u)
        s_i = suf + s[:, None]

        om = 1.0 - alpha
        one_m = jnp.maximum(om, 1e-6)
        dalpha = jnp.where(
            contrib, cg * t_before - (s_i + tb[:, None]) / one_m, 0.0)
        dcol = jax.lax.dot_general(
            g_pix, w, (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)  # [3, C]
        live = jnp.logical_not(skip) & (alpha < ALPHA_MAX)
        dpow = dalpha * jnp.where(live, alpha, 0.0)

        M = jax.lax.dot_general(
            dpow, basis, (((0,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)  # [C, 6]
        M0, Mx, My = M[:, 0], M[:, 1], M[:, 2]
        Mxx, Myy, Mxy = M[:, 3], M[:, 4], M[:, 5]
        gx, gy = g[0, :], g[1, :]
        A, B, C = g[2, :], g[3, :], g[4, :]
        ex = gx * M0 - Mx          # sum_p dpow * dx
        ey = gy * M0 - My          # sum_p dpow * dy

        dopa = jnp.sum(dalpha * jnp.where(live, e, 0.0), axis=0)
        rows = jnp.concatenate([
            (-(A * ex + B * ey))[None, :],
            (-(C * ey + B * ex))[None, :],
            (-0.5 * (gx * ex - gx * Mx + Mxx))[None, :],
            (-(gy * ex - gx * My + Mxy))[None, :],
            (-0.5 * (gy * ey - gy * My + Myy))[None, :],
            dopa[None, :],
            dcol,
            jnp.zeros((ROWS - 9, chunk_n), jnp.float32),
        ], axis=0)
        # one fused [ROWS, C] read-modify-write instead of nine strided
        # single-row RMWs
        dgrad_ref[0, :, pl.ds(c * chunk_n, chunk_n)] += rows
        return s + jnp.sum(u, axis=1)

    if n_chunks == 1:
        # single chunk: entry T == 1 and T_final falls out of the same
        # prefix matmul the gradients need — one pass, no scratch sweep
        g = data_ref[0, :, pl.ds(0, chunk_n)]
        alpha, e, power, skip = _chunk_alpha(g, basis)
        w, contrib, t_before, lg, log_t_out = _chunk_transmittance(
            alpha, jnp.zeros((1, p_blk), jnp.float32), tri)
        tb = jnp.exp(log_t_out)[0, :] * bgdotg
        chunk_grads(0, g, alpha, e, skip, w, contrib,
                    t_before, tb, jnp.zeros((p_blk,), jnp.float32))
        return

    def entry_ts(scratch):
        # forward sweep: per-chunk entry log-T (chunk 0 enters at 0)
        def fbody(c, log_t):
            scratch[pl.ds(c, 1), :] = log_t
            g = data_ref[0, :, pl.ds(c * chunk_n, chunk_n)]
            alpha, *_ = _chunk_alpha(g, basis)
            return _chunk_transmittance(alpha, log_t, tri)[4]

        log_t_fin = jax.lax.fori_loop(
            0, n_chunks, fbody, jnp.zeros((1, p_blk), jnp.float32))
        # tb[p] = T_final * (bg . g_p): the background's share of the
        # suffix term in dalpha
        tb = jnp.exp(log_t_fin)[0, :] * bgdotg

        # backward sweep (back-to-front): suffix carry s over later chunks
        def bbody(ci, s):
            c = n_chunks - 1 - ci
            g = data_ref[0, :, pl.ds(c * chunk_n, chunk_n)]
            alpha, e, power, skip = _chunk_alpha(g, basis)
            log_t_in = scratch[pl.ds(c, 1), :]
            w, contrib, t_before, _, _ = _chunk_transmittance(
                alpha, log_t_in, tri)
            return chunk_grads(c, g, alpha, e, skip, w, contrib,
                               t_before, tb, s)

        jax.lax.fori_loop(0, n_chunks, bbody,
                          jnp.zeros((p_blk,), jnp.float32))

    pl.run_scoped(entry_ts, pltpu.VMEM((n_chunks, p_blk), jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _dense(data, bg, img_h, img_w):
    return _dense_fwd(data, bg, img_h, img_w)[0]


def _dense_fwd_impl(data, bg, img_h, img_w):
    R, _, n_pad = data.shape
    n_pix = img_h * img_w
    chunk_n, p_blk = _plan(n_pad, n_pix, _WORKSET_FWD)
    n_pblk = n_pix // p_blk
    kern = functools.partial(_dense_fwd_kernel,
                             n_chunks=n_pad // chunk_n, chunk_n=chunk_n,
                             p_blk=p_blk, img_w=img_w)
    out, tfin = pl.pallas_call(
        kern,
        grid=(R, n_pblk),
        in_specs=[
            pl.BlockSpec((1, ROWS, n_pad), lambda r, b: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1), lambda r, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, p_blk), lambda r, b: (r, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p_blk), lambda r, b: (r, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 3, n_pix), jnp.float32),
            jax.ShapeDtypeStruct((R, 1, n_pix), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(data, bg)
    return out, tfin


def _dense_fwd(data, bg, img_h, img_w):
    out, tfin = _dense_fwd_impl(data, bg, img_h, img_w)
    return out, (data, bg, tfin)


def _dense_bwd(img_h, img_w, res, g_out):
    data, bg, tfin = res
    R, _, n_pad = data.shape
    n_pix = img_h * img_w
    chunk_n, p_blk = _plan(n_pad, n_pix)
    n_pblk = n_pix // p_blk
    kern = functools.partial(_dense_bwd_kernel,
                             n_chunks=n_pad // chunk_n, chunk_n=chunk_n,
                             p_blk=p_blk, img_w=img_w)
    dgrad = pl.pallas_call(
        kern,
        grid=(R, n_pblk),
        in_specs=[
            pl.BlockSpec((1, ROWS, n_pad), lambda r, b: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1), lambda r, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, p_blk), lambda r, b: (r, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS, n_pad), lambda r, b: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, ROWS, n_pad), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(data, bg, g_out)
    # bg cotangent: dL/dbg = sum over renders+pixels of T_fin * g
    dbg = jnp.einsum("rp,rcp->c", tfin[:, 0, :], g_out)[:, None]
    return dgrad, dbg


_dense.defvjp(_dense_fwd, _dense_bwd)


def rasterize_dense_batched(mean2d, conic, color, opacity, depth, valid,
                            bg_color, img_h: int, img_w: int) -> jnp.ndarray:
    """Rasterize R renders in ONE Pallas launch.

    All inputs carry a leading render axis R (= B*V flattened):
    mean2d [R,N,2], conic [R,N,3], color [R,N,3], opacity/depth/valid
    [R,N]; returns images [R, 3, H, W]. Gaussians are depth-sorted per
    render here (XLA argsort over N is cheap at object scale).
    """
    R, N = opacity.shape
    n_pad = -(-N // 128) * 128
    if n_pad > 512:
        # keep chunk_n=512 an exact divisor so every chunk is visited
        n_pad = -(-n_pad // 512) * 512
    key = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(key, axis=1)
    take = lambda a: jnp.take_along_axis(
        a, order.reshape(R, N, *([1] * (a.ndim - 2))), axis=1)
    opa_sorted = take(jnp.where(valid, opacity, 0.0)[..., None])[..., 0]
    data = jax.vmap(_pack, in_axes=(0, 0, 0, 0, None))(
        take(mean2d), take(conic), take(color), opa_sorted, n_pad)
    bg = jnp.asarray(bg_color, jnp.float32).reshape(3, 1)
    out = _dense(data, bg, img_h, img_w)                 # [R, 3, H*W]
    return out.reshape(R, 3, img_h, img_w)
