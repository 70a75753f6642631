"""Mamba sequence-mixer module (uni- and bi-directional).

Flax rewrite of the reference Mamba block (reference
openpoints/models/Mamba3D/bimamba_ssm/modules/mamba_simple.py:60-290 and
the PCM copy): in_proj -> (x, z), depthwise causal conv + silu, input-
dependent (dt, B, C) via x_proj/dt_proj, selective scan, silu(z) gate,
out_proj. ``bimamba`` adds an independent parameter set scanned over the
flipped sequence, outputs summed (bimamba_type v2/v4 fast path).

Parameter initialization parity: A = log-range S4D-real init,
dt_proj bias = inverse-softplus of log-uniform dt in [1e-3, 0.1].
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unipre3d_tpu.ops.scan import causal_conv1d, selective_scan


def _a_log_init(d_inner, d_state):
    def init(key, shape, dtype=jnp.float32):
        A = np.tile(np.arange(1, d_state + 1, dtype=np.float32),
                    (d_inner, 1))
        return jnp.asarray(np.log(A), dtype)
    return init


def _dt_bias_init(d_inner, dt_min=1e-3, dt_max=0.1, floor=1e-4):
    def init(key, shape, dtype=jnp.float32):
        dt = np.exp(np.random.RandomState(0).uniform(size=d_inner)
                    * (math.log(dt_max) - math.log(dt_min))
                    + math.log(dt_min)).clip(min=floor)
        inv = dt + np.log(-np.expm1(-dt))
        return jnp.asarray(inv, dtype)
    return init


class SSMBranch(nn.Module):
    """One scan direction: conv -> (dt, B, C) -> selective scan."""
    d_inner: int
    d_state: int = 16
    d_conv: int = 4
    dt_rank: int = 24
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        """x, z: [B, L, d_inner] -> y [B, L, d_inner] (gated)."""
        conv_w = self.param("conv_weight", nn.initializers.lecun_normal(),
                            (self.d_conv, self.d_inner))
        conv_b = self.param("conv_bias", nn.initializers.zeros,
                            (self.d_inner,))
        x = causal_conv1d(x, conv_w, conv_b)
        x = jax.nn.silu(x)

        x_dbl = nn.Dense(self.dt_rank + 2 * self.d_state, use_bias=False,
                         dtype=self.dtype, name="x_proj")(x)
        dt, B, C = jnp.split(
            x_dbl, [self.dt_rank, self.dt_rank + self.d_state], axis=-1)
        dt = nn.Dense(self.d_inner, use_bias=False, dtype=self.dtype,
                      name="dt_proj")(dt)
        dt_bias = self.param("dt_bias", _dt_bias_init(self.d_inner),
                             (self.d_inner,))
        A_log = self.param("A_log", _a_log_init(self.d_inner, self.d_state),
                           (self.d_inner, self.d_state))
        D = self.param("D", nn.initializers.ones, (self.d_inner,))
        A = -jnp.exp(A_log.astype(jnp.float32))
        return selective_scan(x, dt, A, B, C, D=D, z=z, delta_bias=dt_bias,
                              delta_softplus=True)


class MambaMixer(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    bimamba: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x [B, L, d_model] -> [B, L, d_model]."""
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)
        xz = nn.Dense(2 * d_inner, use_bias=False, dtype=self.dtype,
                      name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)

        y = SSMBranch(d_inner, self.d_state, self.d_conv, dt_rank,
                      dtype=self.dtype, name="fwd")(xs, z)
        if self.bimamba:
            y_b = SSMBranch(d_inner, self.d_state, self.d_conv, dt_rank,
                            dtype=self.dtype, name="bwd")(
                jnp.flip(xs, axis=1), jnp.flip(z, axis=1))
            y = y + jnp.flip(y_b, axis=1)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        name="out_proj")(y.astype(self.dtype))
