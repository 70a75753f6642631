"""Selective state-space scan (S6 / Mamba) for TPU.

TPU-native replacement for the reference's CUDA ``selective_scan_fn`` /
fused ``mamba_inner_fn`` (reference openpoints/models/PCM/mamba/
mamba_ssm/ops/selective_scan_interface.py:14-441 and its Mamba3D
bimamba copy): the input-gated linear recurrence

    h_t = exp(delta_t * A) h_{t-1} + delta_t B_t u_t
    y_t = <C_t, h_t> + D u_t          (optionally gated: y *= silu(z))

is evaluated with ``jax.lax.associative_scan`` over the sequence axis —
a log-depth parallel scan that XLA maps well onto the VPU — instead of
a sequential CUDA kernel. Layout is channel-last ``[B, L, D]`` with the
SSM state dimension N innermost.

``selective_scan_ref``-equivalent semantics: delta_bias added before
softplus, strictly causal, fp32 state arithmetic.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _ssm_combine(a, b):
    """Associative combine for h_t = A_t h_{t-1} + b_t."""
    A1, b1 = a
    A2, b2 = b
    return A1 * A2, A2 * b1 + b2


def selective_scan(u: jnp.ndarray, delta: jnp.ndarray, A: jnp.ndarray,
                   B: jnp.ndarray, C: jnp.ndarray,
                   D: Optional[jnp.ndarray] = None,
                   z: Optional[jnp.ndarray] = None,
                   delta_bias: Optional[jnp.ndarray] = None,
                   delta_softplus: bool = False,
                   chunk_size: int = 64) -> jnp.ndarray:
    """u, delta: [Batch, L, D]; A: [D, N]; B, C: [Batch, L, N];
    D: [D]; z: [Batch, L, D] -> y [Batch, L, D].

    For sequences longer than ``chunk_size`` the recurrence runs as a
    rematerialized ``lax.scan`` over chunks with an associative scan
    inside each chunk: peak memory is O(B * chunk * D * N) instead of
    the O(B * L * D * N) of a full-length associative scan (the
    reference's CUDA kernel is sequential with O(B*D*N) state; this is
    the TPU-shaped middle ground, SURVEY.md §7 hard part 3).
    """
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)
    if delta_softplus:
        delta = jax.nn.softplus(delta)

    Bsz, L, Dd = u.shape
    Bm = B.astype(jnp.float32)
    Cm = C.astype(jnp.float32)

    if L <= chunk_size:
        dA = jnp.exp(delta[..., None] * A[None, None])   # [B, L, D, N]
        dBu = (delta * u)[..., None] * Bm[:, :, None, :]
        _, h = jax.lax.associative_scan(_ssm_combine, (dA, dBu), axis=1)
        y = jnp.einsum("bldn,bln->bld", h, Cm)
    else:
        pad = (-L) % chunk_size
        if pad:
            u_p = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
            d_p = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)))
            B_p = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0)))
            C_p = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0)))
        else:
            u_p, d_p, B_p, C_p = u, delta, Bm, Cm
        nc = (L + pad) // chunk_size

        def to_chunks(x):
            return x.reshape(Bsz, nc, chunk_size, *x.shape[2:]
                             ).swapaxes(0, 1)

        @functools.partial(jax.checkpoint)
        def chunk_step(h0, xs):
            uc, dc, Bc, Cc = xs  # [B, c, ...]
            dA = jnp.exp(dc[..., None] * A[None, None])
            dBu = (dc * uc)[..., None] * Bc[:, :, None, :]
            cumA, cumB = jax.lax.associative_scan(
                _ssm_combine, (dA, dBu), axis=1)
            h = cumA * h0[:, None] + cumB      # [B, c, D, N]
            yc = jnp.einsum("bcdn,bcn->bcd", h, Cc)
            return h[:, -1], yc

        h0 = jnp.zeros((Bsz, Dd, A.shape[1]), jnp.float32)
        _, ys = jax.lax.scan(
            chunk_step, h0,
            (to_chunks(u_p), to_chunks(d_p), to_chunks(B_p),
             to_chunks(C_p)))
        y = ys.swapaxes(0, 1).reshape(Bsz, L + pad, Dd)[:, :L]

    if D is not None:
        y = y + D.astype(jnp.float32) * u
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y


def selective_scan_ref(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                       delta_softplus=False):
    """Sequential lax.scan reference (mirrors the reference repo's
    ``selective_scan_ref`` pure-torch oracle) — used by tests."""
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    Bsz, L, Dd = u.shape
    N = A.shape[1]

    def step(h, inputs):
        u_t, d_t, B_t, C_t = inputs
        dA = jnp.exp(d_t[..., None] * A[None])          # [B, D, N]
        h = dA * h + (d_t * u_t)[..., None] * B_t[:, None, :]
        y_t = jnp.einsum("bdn,bn->bd", h, C_t)
        return h, y_t

    h0 = jnp.zeros((Bsz, Dd, N), jnp.float32)
    xs = (u.swapaxes(0, 1), delta.swapaxes(0, 1),
          B.astype(jnp.float32).swapaxes(0, 1),
          C.astype(jnp.float32).swapaxes(0, 1))
    _, ys = jax.lax.scan(step, h0, xs)
    y = ys.swapaxes(0, 1)
    if D is not None:
        y = y + D.astype(jnp.float32) * u
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y


def causal_conv1d(x: jnp.ndarray, weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Depthwise causal conv (reference causal-conv1d CUDA package).

    x: [B, L, D]; weight: [K, D] (taps oldest->newest); -> [B, L, D].
    """
    K = weight.shape[0]
    pad = jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
    y = sum(pad[:, i:i + x.shape[1], :] * weight[i][None, None, :]
            for i in range(K))
    if bias is not None:
        y = y + bias[None, None, :]
    return y
