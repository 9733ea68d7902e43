"""Attention-zoo modules named by BASELINE config #5: MHSA/BoT3, CoordAtt,
DCNv2 family, deformable-LKA family, plus common SE-style blocks.

Behavioral parity with the reference blocks (ultralytics/nn/modules/block.py:
MHSA:6020, BoT3:6095, CoordAtt:6132, DCNv2:2702, C2f_DCN:2783, C3_DCN:2798,
deformable_LKA:5026, C2f_DLKA:5078, SEAttention:4750, ECAAttention:4834,
SimAM:5252, EMA:6213). Deformable sampling runs through ops/deform.py
(bilinear-gather + MXU matmul) instead of CUDA deform_conv2d.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import BN_EPS, BN_MOMENTUM, Conv, ConvBase
from ultralytics_pro_tpu.ops.deform import deform_conv2d


def _bn(mod, x, name, train):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        use_fast_variance=False, epsilon=BN_EPS, dtype=mod.dtype,
                        name=name, parent=mod)(x)


class MHSA(ConvBase):
    """Multi-head self-attention over the spatial map with relative position
    embeddings (reference block.py:6020)."""

    heads: int = 4
    pos_emb: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        hd = c // self.heads
        q = nn.Conv(c, (1, 1), name="query", dtype=self.dtype)(x).reshape(b, n, self.heads, hd)
        k = nn.Conv(c, (1, 1), name="key", dtype=self.dtype)(x).reshape(b, n, self.heads, hd)
        v = nn.Conv(c, (1, 1), name="value", dtype=self.dtype)(x).reshape(b, n, self.heads, hd)
        energy = jnp.einsum("bnhd,bmhd->bhnm", q, k)
        if self.pos_emb:
            rel_h = self.param("rel_h", nn.initializers.normal(1.0), (1, self.heads, hd, 1, h))
            rel_w = self.param("rel_w", nn.initializers.normal(1.0), (1, self.heads, hd, w, 1))
            pos = (rel_h + rel_w).reshape(1, self.heads, hd, n)  # (1, heads, hd, N)
            energy = energy + jnp.einsum("bnhd,ohdm->bhnm", q, pos.transpose(0, 1, 2, 3))
        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        return out.reshape(b, h, w, c)


class BottleneckTransformer(ConvBase):
    """Conv1x1 -> MHSA with residual (reference block.py:6067)."""

    c2: int = 0
    heads: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv1")(x, train)
        y = MHSA(heads=self.heads, dtype=self.dtype, name="mhsa")(y, train)
        return x + y if x.shape[-1] == self.c2 else y


class BoT3(ConvBase):
    """C3 with transformer bottlenecks (reference block.py:6095)."""

    c2: int = 0
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = BottleneckTransformer(c2=c_, dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class CoordAtt(ConvBase):
    """Coordinate attention: pooled-axis excitation (reference block.py:6132)."""

    reduction: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        mip = max(8, c // self.reduction)
        x_h = x.mean(axis=2)  # (B, H, C) pool over width
        x_w = x.mean(axis=1)  # (B, W, C) pool over height
        y = jnp.concatenate([x_h, x_w], axis=1)[:, :, None, :]  # (B, H+W, 1, C)
        y = nn.Conv(mip, (1, 1), use_bias=True, dtype=self.dtype, name="conv1")(y)
        y = _bn(self, y, "bn1", train)
        y = y * jax.nn.relu6(y + 3) / 6  # h_swish
        yh, yw = y[:, :h], y[:, h:]
        a_h = jax.nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, name="conv_h")(yh))  # (B,H,1,C)
        a_w = jax.nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, name="conv_w")(yw))  # (B,W,1,C)
        return x * a_h.transpose(0, 1, 2, 3).reshape(b, h, 1, c) * a_w.reshape(b, 1, w, c)


class DCNv2(ConvBase):
    """Modulated deformable conv block: offset+mask conv -> deformable sample
    -> BN -> act (reference block.py:2702)."""

    c2: int = 0
    k: int = 3
    s: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.conv import apply_act

        kk = self.k * self.k
        p = (self.k - 1) // 2
        om = nn.Conv(3 * kk, (self.k, self.k), strides=(self.s, self.s),
                     padding=((p, p), (p, p)), dtype=self.dtype, name="conv_offset_mask")(x)
        offsets, mask_logit = om[..., : 2 * kk], om[..., 2 * kk:]
        mask = jax.nn.sigmoid(mask_logit)
        weight = self.param(
            "weight", nn.initializers.lecun_normal(), (self.k, self.k, x.shape[-1], self.c2)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.c2,))
        y = deform_conv2d(x, offsets, weight, mask=mask, bias=bias,
                          stride=self.s, padding=p)
        y = _bn(self, y, "bn", train)
        return apply_act(y, self.act)


class C2f_DCN(ConvBase):
    """C2f with DCNv2 bottlenecks (reference block.py:2783)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = False
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            z = Conv(c2=c, k=3, dtype=self.dtype, name=f"m_{i}_cv1")(ys[-1], train)
            z = DCNv2(c2=c, k=3, dtype=self.dtype, name=f"m_{i}_cv2")(z, train)
            ys.append(ys[-1] + z if self.shortcut else z)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class C3_DCN(ConvBase):
    """C3 with DCNv2 bottlenecks (reference block.py:2798)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            z = Conv(c2=c_, k=1, dtype=self.dtype, name=f"m_{i}_cv1")(a, train)
            z = DCNv2(c2=c_, k=3, dtype=self.dtype, name=f"m_{i}_cv2")(z, train)
            a = a + z if self.shortcut else z
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class DeformConvDW(ConvBase):
    """Depthwise deformable conv (offset conv + deformable sample), the
    building block of D-LKA (reference DeformConv, block.py:4998)."""

    k: int = 5
    d: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        kk = self.k * self.k
        p = self.d * (self.k - 1) // 2
        offsets = nn.Conv(2 * kk, (self.k, self.k), padding=((p, p), (p, p)),
                          kernel_dilation=(self.d, self.d), dtype=self.dtype,
                          name="offset_net")(x)
        weight = self.param("weight", nn.initializers.lecun_normal(), (self.k, self.k, 1, c))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return deform_conv2d(x, offsets, weight, bias=bias, stride=1, padding=p,
                             dilation=self.d, groups=c)


class deformable_LKA(ConvBase):
    """Deformable large-kernel attention (reference block.py:5026): 5x5
    deformable DW -> 7x7 dilated deformable DW -> 1x1, gating the input."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn = DeformConvDW(k=5, d=1, dtype=self.dtype, name="conv0")(x, train)
        attn = DeformConvDW(k=7, d=3, dtype=self.dtype, name="conv_spatial")(attn, train)
        attn = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="conv1")(attn)
        return x * attn


class deformable_LKA_Attention(ConvBase):
    """proj -> GELU -> D-LKA -> proj with residual (reference block.py:5052)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_1")(x)
        y = jax.nn.gelu(y)
        y = deformable_LKA(dtype=self.dtype, name="spatial_gating_unit")(y, train)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_2")(y)
        return x + y


class C2f_DLKA(ConvBase):
    """C2f with D-LKA attention bottlenecks (reference block.py:5078)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = False
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(deformable_LKA_Attention(dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class SEAttention(ConvBase):
    """Squeeze-and-excitation (reference block.py:4750)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))
        y = jax.nn.relu(nn.Dense(c // self.reduction, dtype=self.dtype, name="fc_0")(y))
        y = jax.nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="fc_1")(y))
        return x * y[:, None, None, :]


class ECAAttention(ConvBase):
    """Efficient channel attention via 1D conv over pooled channels
    (reference block.py:4834)."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))[:, :, None]  # (B, C, 1)
        p = self.kernel_size // 2
        y = nn.Conv(1, (self.kernel_size,), padding=((p, p),), dtype=self.dtype, name="conv")(y)
        return x * jax.nn.sigmoid(y[..., 0])[:, None, None, :]


class SimAM(ConvBase):
    """Parameter-free attention (reference block.py:5252)."""

    e_lambda: float = 1e-4

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w - 1
        mu = x.mean(axis=(1, 2), keepdims=True)
        d = (x - mu) ** 2
        v = d.sum(axis=(1, 2), keepdims=True) / n
        e_inv = d / (4 * (v + self.e_lambda)) + 0.5
        return x * jax.nn.sigmoid(e_inv)


class EMA(ConvBase):
    """Efficient multi-scale attention (reference block.py:6213)."""

    factor: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.factor
        cg = c // g
        xg = x.reshape(b * g, h, w, cg)
        # 1x1 branch over pooled h/w
        xh = xg.mean(axis=2)[:, :, None, :]  # (bg, H, 1, cg)
        xw = xg.mean(axis=1)[:, None, :, :].transpose(0, 2, 1, 3)  # (bg, W, 1, cg)
        hw = nn.Conv(cg, (1, 1), dtype=self.dtype, name="conv1x1")(jnp.concatenate([xh, xw], 1))
        ah, aw = hw[:, :h], hw[:, h:]
        xg1 = nn.GroupNorm(num_groups=cg, dtype=self.dtype, name="gn")(
            xg * jax.nn.sigmoid(ah).reshape(b * g, h, 1, cg) * jax.nn.sigmoid(aw).reshape(b * g, 1, w, cg)
        )
        xg2 = nn.Conv(cg, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv3x3")(xg)
        # cross attention between branches
        x11 = jax.nn.softmax(xg1.mean(axis=(1, 2)), axis=-1)[:, None, :]  # (bg,1,cg)
        x12 = xg2.reshape(b * g, h * w, cg)
        x21 = jax.nn.softmax(xg2.mean(axis=(1, 2)), axis=-1)[:, None, :]
        x22 = xg1.reshape(b * g, h * w, cg)
        weights = (jnp.einsum("boc,bnc->bn", x11, x12) + jnp.einsum("boc,bnc->bn", x21, x22))
        weights = jax.nn.sigmoid(weights.reshape(b * g, h, w, 1))
        return (xg * weights).reshape(b, h, w, c)
