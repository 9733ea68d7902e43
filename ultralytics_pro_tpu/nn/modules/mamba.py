"""Mamba-YOLO blocks: selective scan as jax.lax.associative_scan — TPU-native.

Behavioral parity with the reference mamba_yolo.py (SS2D:6, XSSBlock:238,
VSSBlock:305, SimpleStem:388, VisionClueMerge:405), whose hot op is the
`selective_scan` CUDA extension (SURVEY.md §2.9: the required TPU equivalent).
Here the linear state recurrence h_t = exp(dt*A) h_{t-1} + dt*B_t u_t runs as
a PARALLEL associative scan (log-depth, XLA-fused) instead of a sequential
CUDA loop — the canonical TPU formulation.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase


def selective_scan(u, delta, A, B, C, D):
    """Associative-scan selective scan (mamba S6).

    u: (B, L, d) inputs; delta: (B, L, d) softplus'd step sizes;
    A: (d, n) state matrix (negative); B, C: (B, L, n) input/output proj;
    D: (d,) skip. Returns (B, L, d).

    Recurrence per (batch, channel, state): h_t = exp(delta_t A) h_{t-1} +
    delta_t B_t u_t; y_t = C_t . h_t + D u_t. The scan combine
    (a1,b1)*(a2,b2) = (a1 a2, a2 b1 + b2) is associative -> log-depth.
    """
    da = jnp.exp(jnp.einsum("bld,dn->bldn", delta, A))  # (B, L, d, n)
    db_u = jnp.einsum("bld,bln,bld->bldn", delta, B, u)

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (da, db_u), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, C)
    return y + u * D[None, None, :]


class SS2D(ConvBase):
    """2D selective scan (reference mamba_yolo.py:6): in-proj -> dw conv ->
    4-directional selective scans over the flattened grid -> gate -> out."""

    d_model: int = 96
    d_state: int = 16
    expand: float = 2.0
    dt_rank: int = 0  # 0 -> ceil(d_model/16)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        d_inner = int(self.expand * self.d_model)
        dtr = self.dt_rank or max(1, self.d_model // 16)
        n = self.d_state

        xz = nn.Dense(2 * d_inner, dtype=self.dtype, name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)
        xs = nn.Conv(d_inner, (3, 3), padding=((1, 1), (1, 1)),
                     feature_group_count=d_inner, dtype=self.dtype, name="conv2d")(xs)
        xs = jax.nn.silu(xs)

        # shared projections (reference uses per-direction copies; one set +
        # direction flips keeps params lean and the math equivalent in spirit)
        x_proj = nn.Dense(dtr + 2 * n, use_bias=False, dtype=self.dtype, name="x_proj")
        dt_proj = nn.Dense(d_inner, dtype=self.dtype, name="dt_proj")
        A_log = self.param("A_log", lambda k, s: jnp.log(
            jnp.broadcast_to(jnp.arange(1, n + 1, dtype=jnp.float32), s)), (d_inner, n))
        Dskip = self.param("D", nn.initializers.ones, (d_inner,))
        A = -jnp.exp(A_log)

        def scan_dir(seq):
            """seq (B, L, d_inner) -> scanned (B, L, d_inner)."""
            proj = x_proj(seq)
            dt, Bm, Cm = jnp.split(proj, [dtr, dtr + n], axis=-1)
            delta = jax.nn.softplus(dt_proj(dt))
            return selective_scan(seq, delta, A, Bm, Cm, Dskip)

        seq_hw = xs.reshape(b, h * w, d_inner)
        seq_wh = xs.transpose(0, 2, 1, 3).reshape(b, h * w, d_inner)
        ys = (
            scan_dir(seq_hw)
            + scan_dir(seq_hw[:, ::-1])[:, ::-1]
            + scan_dir(seq_wh).reshape(b, w, h, d_inner).transpose(0, 2, 1, 3).reshape(b, h * w, d_inner)
            + scan_dir(seq_wh[:, ::-1])[:, ::-1].reshape(b, w, h, d_inner).transpose(0, 2, 1, 3).reshape(b, h * w, d_inner)
        )
        y = nn.LayerNorm(dtype=self.dtype, name="out_norm")(ys.reshape(b, h, w, d_inner))
        y = y * jax.nn.silu(z)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(y)


class LSBlock(ConvBase):
    """Local spatial block (reference mamba_yolo.py:217): dw3x3+BN -> 1x1 ->
    GELU -> 1x1 + residual."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = Conv(c2=c, k=3, g=c, act=False, dtype=self.dtype, name="cv1")(x, train)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="cv2")(y)
        y = jax.nn.gelu(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="cv3")(y)
        return x + y


class RGBlock(ConvBase):
    """Gated conv FFN (reference mamba_yolo.py:194)."""

    e: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        hid = int(c * self.e)
        y = nn.Conv(hid, (1, 1), dtype=self.dtype, name="fc1")(x)
        g = nn.Conv(hid, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=hid,
                    dtype=self.dtype, name="dw")(y)
        y = jax.nn.gelu(g) + y
        return x + nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(y)


class VSSBlock(ConvBase):
    """Vision state-space block (reference mamba_yolo.py:305): proj -> LS ->
    LN+SS2D residual -> RG FFN."""

    c2: int = 0
    d_state: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2 = self.c2 or x.shape[-1]
        x = nn.Conv(c2, (1, 1), dtype=self.dtype, name="proj")(x)
        x = LSBlock(dtype=self.dtype, name="ls")(x, train)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = x + SS2D(d_model=c2, d_state=self.d_state, dtype=self.dtype, name="ss2d")(y, train)
        return RGBlock(dtype=self.dtype, name="rg")(x, train)


class XSSBlock(ConvBase):
    """n chained VSS inner blocks behind an input proj (reference
    mamba_yolo.py:238)."""

    c2: int = 0
    n: int = 1
    d_state: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="proj")(x)
        x = LSBlock(dtype=self.dtype, name="ls")(x, train)
        for i in range(self.n):
            y = nn.LayerNorm(dtype=self.dtype, name=f"norm_{i}")(x)
            x = x + SS2D(d_model=self.c2, d_state=self.d_state, dtype=self.dtype,
                         name=f"ss2d_{i}")(y, train)
            x = RGBlock(dtype=self.dtype, name=f"rg_{i}")(x, train)
        return x


class SimpleStem(ConvBase):
    """2x stride-2 convs stem (reference mamba_yolo.py:388)."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(c2=self.c2 // 2, k=3, s=2, dtype=self.dtype, name="cv1")(x, train)
        return Conv(c2=self.c2, k=3, s=2, dtype=self.dtype, name="cv2")(x, train)


class VisionClueMerge(ConvBase):
    """Space-to-depth downsample + 1x1 proj (reference mamba_yolo.py:405)."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="pw")(y, train)
