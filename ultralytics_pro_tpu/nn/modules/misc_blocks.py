"""Misc community blocks, tranche 4 (reference nn/modules one-offs):
DySample, ContextGuided (CGNet), DWR, EVC, Conv2Former, EPSANet, FocalNet.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import BN_EPS, BN_MOMENTUM, Conv, ConvBase
from ultralytics_pro_tpu.ops.deform import bilinear_gather


def _bn(mod, name, x, train):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        use_fast_variance=False, epsilon=BN_EPS, dtype=mod.dtype,
                        name=name, parent=mod)(x)


class DySample(ConvBase):
    """Dynamic upsampling (reference DySample.py:20, 'lp' style): per output
    subpixel, a learned offset relative to the static init grid selects the
    bilinear sample point; grid_sample becomes our vectorized gather."""

    scale: int = 2
    groups: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s, g = self.scale, self.groups if c % self.groups == 0 else 1
        s2 = s * s
        off = nn.Conv(2 * g * s2, (1, 1), kernel_init=nn.initializers.normal(1e-3),
                      dtype=self.dtype, name="offset")(x).astype(jnp.float32)
        off = off.reshape(b, h, w, g, s2, 2) * 0.25
        # static subpixel grid (reference _init_pos): offsets of each subpixel
        # center from the source pixel center, in source-pixel units
        r = (np.arange(s) - (s - 1) / 2) / s
        py, px = np.meshgrid(r, r, indexing="ij")
        init = jnp.asarray(np.stack([py.ravel(), px.ravel()], -1), jnp.float32)  # (s2,2)
        pos = off + init[None, None, None, None]
        iy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None, None]
        ix = jnp.arange(w, dtype=jnp.float32)[None, None, :, None, None]
        sy = (iy + pos[..., 0]).transpose(0, 3, 1, 2, 4).reshape(b * g, h, w, s2)
        sx = (ix + pos[..., 1]).transpose(0, 3, 1, 2, 4).reshape(b * g, h, w, s2)
        cg = c // g
        xg = x.reshape(b, h, w, g, cg).transpose(0, 3, 1, 2, 4).reshape(b * g, h, w, cg)
        cols = bilinear_gather(xg.astype(jnp.float32), sy, sx)  # (B*g,H,W,s2,cg)
        cols = cols.reshape(b, g, h, w, s, s, cg).transpose(0, 2, 4, 3, 5, 1, 6)
        return cols.reshape(b, h * s, w * s, c).astype(x.dtype)


class ContextGuidedBlock(ConvBase):
    """CGNet block (reference ContextGuided.py:254): local DW 3x3 + dilated
    surrounding DW 3x3 joint, BN+PReLU, FGlo global gate, residual."""

    c2: int = 0
    d: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.c2 // 2
        y = Conv(c2=n, k=1, dtype=self.dtype, name="conv1x1")(x, train)
        loc = nn.Conv(n, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=n,
                      use_bias=False, dtype=self.dtype, name="F_loc")(y)
        sur = nn.Conv(n, (3, 3), padding="SAME", kernel_dilation=(self.d, self.d),
                      feature_group_count=n, use_bias=False, dtype=self.dtype,
                      name="F_sur")(y)
        j = jnp.concatenate([loc, sur], -1)
        j = _bn(self, "bn", j, train)
        j = jnp.where(j >= 0, j, j * self.param("prelu", nn.initializers.constant(0.25),
                                                 (2 * n,)))  # per-channel (reference nn.PReLU(2n))
        g = j.mean(axis=(1, 2))
        g = jax.nn.relu(nn.Dense(max(self.c2 // 16, 4), dtype=self.dtype, name="fglo_fc1")(g))
        g = jax.nn.sigmoid(nn.Dense(self.c2, dtype=self.dtype, name="fglo_fc2")(g))
        j = j * g[:, None, None, :]
        return x + j if x.shape[-1] == self.c2 else j


class C2f_Context(ConvBase):
    """C2f with ContextGuided bottlenecks (ContextGuided.py:305)."""

    c2: int = 0
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(ContextGuidedBlock(c2=c, dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class DWR(ConvBase):
    """Dilation-wise residual (reference DWR.py:36): 3x3 stem, then d=1/3/5
    region branches, concat -> 1x1 BN, residual."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2
        y = Conv(c2=c // 2, k=3, dtype=self.dtype, name="stem")(x, train)
        b1 = nn.Conv(c // 2, (3, 3), padding="SAME", dtype=self.dtype, name="d1")(y)
        b3 = nn.Conv(c // 2, (3, 3), padding="SAME", kernel_dilation=(3, 3),
                     dtype=self.dtype, name="d3")(y)
        b5 = nn.Conv(c // 2, (3, 3), padding="SAME", kernel_dilation=(5, 5),
                     dtype=self.dtype, name="d5")(y)
        j = jnp.concatenate([b1, b3, b5], -1)
        j = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="fuse")(j)
        j = _bn(self, "bn", j, train)
        return x + j if x.shape[-1] == c else j


class C2f_DWRSeg(ConvBase):
    """C2f with DWR bottlenecks (DWR.py:92)."""

    c2: int = 0
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(DWR(c2=c, dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class EVCBlock(ConvBase):
    """Explicit visual center (reference EVC.py): a smoothed MLP branch plus a
    learnable-codebook encoding branch, concatenated."""

    c2: int = 0
    codes: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 2
        y = Conv(c2=c, k=3, dtype=self.dtype, name="stem")(x, train)
        # MLP branch (dw + channel mlp, residual)
        m = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                    dtype=self.dtype, name="mlp_dw")(y)
        m = y + nn.Dense(c, dtype=self.dtype, name="mlp_fc")(jax.nn.gelu(m))
        # LVC branch: soft-assign features to K codewords
        b, h, w, _ = y.shape
        feats = y.reshape(b, h * w, c).astype(jnp.float32)
        codebook = self.param("codewords", nn.initializers.normal(1.0), (self.codes, c))
        scale = self.param("code_scale", nn.initializers.ones, (self.codes,))
        d2 = ((feats[:, :, None, :] - codebook[None, None]) ** 2).sum(-1)  # (B,N,K)
        assign = jax.nn.softmax(-scale[None, None] * d2, axis=-1)
        resid = feats[:, :, None, :] - codebook[None, None]
        enc = (assign[..., None] * resid).sum(1)  # (B,K,C)
        enc = jax.nn.relu(_bn(self, "enc_bn", enc.mean(1)[:, None, None, :], train))[:, 0, 0]
        gate = jax.nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="enc_fc")(enc))
        lvc = y * gate[:, None, None, :].astype(y.dtype)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="out")(
            jnp.concatenate([m, lvc], -1), train)


class Conv2FormerBlock(ConvBase):
    """Conv modulation (reference Conv2Former.py): attn = DW 11x11 of a
    projection, multiplies a value projection; + MLP."""

    dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        a = nn.Conv(c, (11, 11), padding="SAME", feature_group_count=c,
                    dtype=self.dtype, name="attn_dw")(
            jax.nn.gelu(nn.Conv(c, (1, 1), dtype=self.dtype, name="attn_pw")(y)))
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(y)
        x = x + nn.Conv(c, (1, 1), dtype=self.dtype, name="proj")(a * v)
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(y)
        return x + nn.Dense(c, dtype=self.dtype, name="fc2")(jax.nn.gelu(y))


class EPSA(ConvBase):
    """Pyramid squeeze attention (reference EPSANet.py): channel quarters
    through k=3/5/7/9 convs, per-branch SE, softmax-normalized across
    branches."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2
        q = c // 4
        outs = []
        for i, k in enumerate((3, 5, 7, 9)):
            outs.append(Conv(c2=q, k=k, g=max(2 ** i, 1) if q % max(2 ** i, 1) == 0 else 1,
                             dtype=self.dtype, name=f"conv{i}")(x, train))
        feats = jnp.stack(outs, axis=-2)  # (B,H,W,4,q)
        se = feats.mean(axis=(1, 2))      # (B,4,q)
        se = jax.nn.relu(nn.Dense(max(q // 4, 4), dtype=self.dtype, name="se_fc1")(se))
        se = nn.Dense(q, dtype=self.dtype, name="se_fc2")(se)
        w = jax.nn.softmax(se, axis=-2)[:, None, None]
        return (feats * w).reshape(*feats.shape[:3], c)


class FocalModulation(ConvBase):
    """Focal modulation (reference FocalModulation.py / FocalNet): q + gated
    hierarchical DW-conv context aggregation + global level."""

    levels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        L = self.levels
        f = nn.Dense(2 * c + (L + 1), dtype=self.dtype, name="f")(x)
        q, ctx, gates = f[..., :c], f[..., c:2 * c], f[..., 2 * c:]
        out = jnp.zeros_like(q)
        for l in range(L):
            k = 3 + 2 * l
            ctx = jax.nn.gelu(nn.Conv(c, (k, k), padding="SAME", feature_group_count=c,
                                      use_bias=False, dtype=self.dtype, name=f"focal{l}")(ctx))
            out = out + ctx * gates[..., l:l + 1]
        glob = jax.nn.gelu(ctx.mean(axis=(1, 2), keepdims=True))
        out = out + glob * gates[..., L:L + 1]
        out = q * nn.Conv(c, (1, 1), dtype=self.dtype, name="h")(out)
        return x + nn.Dense(c, dtype=self.dtype, name="proj")(out)
