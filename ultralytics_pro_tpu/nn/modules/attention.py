"""Attention-zoo modules named by BASELINE config #5: MHSA/BoT3, CoordAtt,
DCNv2 family, deformable-LKA family, plus common SE-style blocks.

Behavioral parity with the reference blocks (ultralytics/nn/modules/block.py:
MHSA:6020, BoT3:6095, CoordAtt:6132, DCNv2:2702, C2f_DCN:2783, C3_DCN:2798,
deformable_LKA:5026, C2f_DLKA:5078, SEAttention:4750, ECAAttention:4834,
SimAM:5252, EMA:6213). Deformable sampling runs through ops/deform.py
(bilinear-gather + MXU matmul) instead of CUDA deform_conv2d.
"""

from __future__ import annotations

from typing import Any, Tuple

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
            # rel_h varies along the H axis, rel_w along W; broadcast to
            # (h, w) THEN flatten so position m = y*w + x matches the q/k
            # token order from x.reshape(b, h*w, ...)
            rel_h = self.param("rel_h", nn.initializers.normal(1.0), (1, self.heads, hd, h, 1))
            rel_w = self.param("rel_w", nn.initializers.normal(1.0), (1, self.heads, hd, 1, w))
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
        y = jax.nn.relu(nn.Dense(max(c // self.reduction, 4), dtype=self.dtype, name="fc_0")(y))
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


class GAMAttention(ConvBase):
    """Global attention mechanism: MLP channel gate + grouped-conv spatial gate
    with a final channel shuffle (reference block.py:3659)."""

    c2: int = 0
    rate: int = 4
    group: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.rate if self.group else 1
        att = nn.Dense(c // self.rate, dtype=self.dtype, name="channel_attention_0")(x)
        att = nn.Dense(c, dtype=self.dtype, name="channel_attention_2")(jax.nn.relu(att))
        x = x * att
        s = nn.Conv(c // self.rate, (7, 7), padding=3, feature_group_count=g,
                    dtype=self.dtype, name="spatial_attention_0")(x)
        s = jax.nn.relu(_bn(self, s, "spatial_attention_1", train))
        s = nn.Conv(self.c2 or c, (7, 7), padding=3, feature_group_count=g,
                    dtype=self.dtype, name="spatial_attention_3")(s)
        s = jax.nn.sigmoid(_bn(self, s, "spatial_attention_4", train))
        # channel shuffle over 4 groups (reference channel_shuffle(x, 4))
        cc = s.shape[-1]
        s = s.reshape(b, h, w, 4, cc // 4).swapaxes(-1, -2).reshape(b, h, w, cc)
        return x * s


class CrissCrossAttention(ConvBase):
    """Criss-cross (row+column) attention with -inf self-row masking
    (reference block.py:4713)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        q = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="query_conv")(x)
        k = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="key_conv")(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value_conv")(x)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        # column (H) attention: for each (b, w) slice, HxH energies, diag=-inf
        e_h = jnp.einsum("bhwc,bkwc->bwhk", q, k)
        e_h = e_h - jnp.where(jnp.eye(h, dtype=bool), jnp.inf, 0.0)
        e_h = jnp.moveaxis(e_h, 1, 2)  # (b, h, w, h)
        # row (W) attention
        e_w = jnp.einsum("bhwc,bhkc->bhwk", q, k)  # (b, h, w, w)
        att = jax.nn.softmax(jnp.concatenate([e_h, e_w], -1), axis=-1)
        a_h, a_w = att[..., :h], att[..., h:]
        out_h = jnp.einsum("bhwk,bkwc->bhwc", a_h, v)
        out_w = jnp.einsum("bhwk,bhkc->bhwc", a_w, v)
        return gamma * (out_h + out_w) + x


class SKAttention(ConvBase):
    """Selective-kernel: multi-scale conv branches fused by softmax channel
    weights (reference block.py:4784)."""

    kernels: Any = (1, 3, 5, 7)
    reduction: int = 16
    L: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        d = max(self.L, c // self.reduction)
        feats = []
        for i, k in enumerate(self.kernels):
            f = nn.Conv(c, (k, k), padding=k // 2, dtype=self.dtype, name=f"convs_{i}_conv")(x)
            feats.append(jax.nn.relu(_bn(self, f, f"convs_{i}_bn", train)))
        u = sum(feats)
        z = nn.Dense(d, dtype=self.dtype, name="fc")(u.mean(axis=(1, 2)))
        ws = jnp.stack([nn.Dense(c, dtype=self.dtype, name=f"fcs_{i}")(z)
                        for i in range(len(self.kernels))], 0)  # (K, B, C)
        ws = jax.nn.softmax(ws, axis=0)[:, :, None, None, :]
        return (ws * jnp.stack(feats, 0)).sum(0)


class _ZPoolGate(ConvBase):
    """AttentionGate: cat(max,mean over channel) -> 7x7 conv+BN -> sigmoid."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        z = jnp.concatenate([x.max(-1, keepdims=True), x.mean(-1, keepdims=True)], -1)
        a = nn.Conv(1, (7, 7), padding=3, use_bias=False, dtype=self.dtype, name="conv")(z)
        return x * jax.nn.sigmoid(_bn(self, a, "bn", train))


class TripletAttention(ConvBase):
    """Rotate-and-gate over the three axis pairings (reference block.py:4911)."""

    no_spatial: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NHWC: gate over (C,W) plane -> transpose H<->C; over (H,C) -> W<->C
        x1 = _ZPoolGate(dtype=self.dtype, name="cw")(jnp.swapaxes(x, 1, 3), train)
        x1 = jnp.swapaxes(x1, 1, 3)
        x2 = _ZPoolGate(dtype=self.dtype, name="hc")(jnp.swapaxes(x, 2, 3), train)
        x2 = jnp.swapaxes(x2, 2, 3)
        if self.no_spatial:
            return 0.5 * (x1 + x2)
        x3 = _ZPoolGate(dtype=self.dtype, name="hw")(x, train)
        return (x1 + x2 + x3) / 3.0


class ShuffleAttention(ConvBase):
    """Split channel/spatial gates per group, then shuffle (reference
    block.py:4020)."""

    G: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        cg = c // self.G // 2
        x = x.reshape(b * self.G, h, w, 2 * cg)
        x0, x1 = x[..., :cg], x[..., cg:]
        cw = self.param("cweight", nn.initializers.zeros, (1, 1, 1, cg))
        cb = self.param("cbias", nn.initializers.ones, (1, 1, 1, cg))
        sw = self.param("sweight", nn.initializers.zeros, (1, 1, 1, cg))
        sb = self.param("sbias", nn.initializers.ones, (1, 1, 1, cg))
        xc = x0 * jax.nn.sigmoid(cw * x0.mean((1, 2), keepdims=True) + cb)
        xs = x1 * jax.nn.sigmoid(sw * nn.GroupNorm(num_groups=cg, dtype=self.dtype,
                                                   name="gn")(x1) + sb)
        y = jnp.concatenate([xc, xs], -1).reshape(b, h, w, c)
        # channel shuffle with 2 groups
        y = y.reshape(b, h, w, 2, c // 2).swapaxes(-1, -2).reshape(b, h, w, c)
        return y


class LSKblock(ConvBase):
    """Large-selective-kernel spatial gating (reference block.py:6243)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        a1 = nn.Conv(c, (5, 5), padding=2, feature_group_count=c, dtype=self.dtype, name="conv0")(x)
        a2 = nn.Conv(c, (7, 7), padding=9, kernel_dilation=3, feature_group_count=c,
                     dtype=self.dtype, name="conv_spatial")(a1)
        a1 = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="conv1")(a1)
        a2 = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="conv2")(a2)
        att = jnp.concatenate([a1, a2], -1)
        agg = jnp.concatenate([att.mean(-1, keepdims=True), att.max(-1, keepdims=True)], -1)
        sig = jax.nn.sigmoid(nn.Conv(2, (7, 7), padding=3, dtype=self.dtype, name="conv_squeeze")(agg))
        att = a1 * sig[..., :1] + a2 * sig[..., 1:]
        return x * nn.Conv(c, (1, 1), dtype=self.dtype, name="conv")(att)


class ASPP(ConvBase):
    """Atrous spatial pyramid pooling (reference block.py:6431)."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        g = nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="conv")(x.mean((1, 2), keepdims=True))
        g = jax.image.resize(g, (b, h, w, self.c2), "bilinear")
        a1 = nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="atrous_block1")(x)
        a6 = nn.Conv(self.c2, (3, 3), padding=6, kernel_dilation=6, dtype=self.dtype, name="atrous_block6")(x)
        a12 = nn.Conv(self.c2, (3, 3), padding=12, kernel_dilation=12, dtype=self.dtype, name="atrous_block12")(x)
        a18 = nn.Conv(self.c2, (3, 3), padding=18, kernel_dilation=18, dtype=self.dtype, name="atrous_block18")(x)
        return nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="conv_1x1_output")(
            jnp.concatenate([g, a1, a6, a12, a18], -1))


class CARAFE(ConvBase):
    """Content-aware upsampling: predicted k x k reassembly kernels applied to
    a kxk source-resolution neighborhood (the
    reference reassembles a k_up=5 window in UPSAMPLED space — same
    content-aware-reassembly role, different neighborhood geometry) (reference block.py:6170). Formulated as a
    one-hot-free gather: unfold via conv patches, weight, and sum on the MXU."""

    c2: int = 0
    kernel_size: int = 3
    up_factor: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        k, up = self.kernel_size, self.up_factor
        comp = nn.Conv(c // 4, (1, 1), dtype=self.dtype, name="down")(x)
        wgt = nn.Conv(k * k * up * up, (k, k), padding=k // 2,
                      dtype=self.dtype, name="encoder")(comp)  # (b,h,w,k*k*up*up)
        wgt = wgt.reshape(b, h, w, up * up, k * k)
        wgt = jax.nn.softmax(wgt, axis=-1)
        # extract kxk patches of x: (b, h, w, k*k, c)
        pads = k // 2
        xp = jnp.pad(x, ((0, 0), (pads, pads), (pads, pads), (0, 0)))
        patches = jnp.stack([
            xp[:, i:i + h, j:j + w] for i in range(k) for j in range(k)
        ], 3)
        y = jnp.einsum("bhwuk,bhwkc->bhwuc", wgt, patches)  # (b,h,w,up*up,c)
        y = y.reshape(b, h, w, up, up, c).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, h * up, w * up, c)


class EffectiveSE(ConvBase):
    """VoVNet effective squeeze-excite: single 1x1 + hard-sigmoid gate
    (reference block.py:4857)."""

    add_maxpool: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        se = x.mean(axis=(1, 2), keepdims=True)
        if self.add_maxpool:
            se = 0.5 * se + 0.5 * x.max(axis=(1, 2), keepdims=True)
        se = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc")(se)
        return x * jnp.clip(se / 6.0 + 0.5, 0.0, 1.0)  # hard sigmoid


class SPDConv(ConvBase):
    """Space-to-depth then Conv-BN-SiLU: stride-free downsampling that keeps
    all pixels (reference conv.py:1774, SPD-Conv paper)."""

    c2: int = 0
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.conv import Conv

        x = jnp.concatenate([x[:, ::2, ::2], x[:, 1::2, ::2],
                             x[:, ::2, 1::2], x[:, 1::2, 1::2]], -1)
        return Conv(c2=self.c2, k=self.k, s=self.s, dtype=self.dtype, name="conv")(x, train)


class CoordConv(ConvBase):
    """Conv over features + normalized coordinate channels
    (reference conv.py:1608, Liu et al. CoordConv)."""

    c2: int = 0
    k: int = 1
    s: int = 1
    with_r: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.conv import Conv

        b, h, w, _ = x.shape
        ys = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)
        xs = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        coords = [jnp.broadcast_to(gx[None, ..., None], (b, h, w, 1)),
                  jnp.broadcast_to(gy[None, ..., None], (b, h, w, 1))]
        if self.with_r:
            coords.append(jnp.sqrt(coords[0] ** 2 + coords[1] ** 2))
        x = jnp.concatenate([x, *coords], -1)
        return Conv(c2=self.c2, k=self.k, s=self.s, dtype=self.dtype, name="conv")(x, train)


class DSConv(ConvBase):
    """Depthwise-separable conv: k-depthwise then 1x1 pointwise, each Conv-BN
    with SiLU (reference conv.py:2110)."""

    c2: int = 0
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.conv import Conv

        c1 = x.shape[-1]
        x = Conv(c2=c1, k=self.k, s=self.s, g=c1, dtype=self.dtype, name="dwconv")(x, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="pwconv")(x, train)


class SegNext_Attention(ConvBase):
    """SegNeXt MSCA: depthwise 5x5 + multi-scale strip convs (7/11/21) as a
    multiplicative gate (reference block.py:3753)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]

        def dw(inp, kh, kw, name):
            return nn.Conv(c, (kh, kw), padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
                           feature_group_count=c, dtype=self.dtype, name=name)(inp)

        attn = dw(x, 5, 5, "conv0")
        a0 = dw(dw(attn, 1, 7, "conv0_1"), 7, 1, "conv0_2")
        a1 = dw(dw(attn, 1, 11, "conv1_1"), 11, 1, "conv1_2")
        a2 = dw(dw(attn, 1, 21, "conv2_1"), 21, 1, "conv2_2")
        attn = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv3")(attn + a0 + a1 + a2)
        return attn * x


class DAttention(ConvBase):
    """Deformable attention (DAT; fork reference block.py:3799, default
    dwc_pe path): queries predict a per-location offset field, keys/values are
    bilinearly sampled at the deformed grid, plus a depthwise conv positional
    residual. grid_sample becomes an explicit gather+lerp (TPU-friendly)."""

    n_heads: int = 8
    ksize: int = 9

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        hd = c // self.n_heads
        scale = hd**-0.5
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_q")(x)

        # offset net: dw k9 -> LN -> GELU -> 1x1 to (dy, dx)
        p = self.ksize // 2
        off = nn.Conv(c, (self.ksize, self.ksize), padding=((p, p), (p, p)),
                      feature_group_count=c, dtype=self.dtype, name="conv_offset_0")(q)
        off = nn.LayerNorm(dtype=self.dtype, name="conv_offset_1")(off)
        off = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv_offset_3")(nn.gelu(off))  # (b, h, w, 2) = (dy, dx)

        # reference grid in [-1, 1] (align_corners), deformed + clamped
        gy = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)
        gx = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)
        ref = jnp.stack(jnp.meshgrid(gy, gx, indexing="ij"), -1)  # (h, w, 2)
        pos = jnp.clip(ref[None] + off, -1.0, 1.0)
        py = (pos[..., 0] + 1.0) * 0.5 * (h - 1)  # pixel coords
        px = (pos[..., 1] + 1.0) * 0.5 * (w - 1)

        # bilinear gather from x at (py, px)
        y0 = jnp.floor(py).astype(jnp.int32)
        x0 = jnp.floor(px).astype(jnp.int32)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        y0 = jnp.clip(y0, 0, h - 1)
        x0 = jnp.clip(x0, 0, w - 1)
        wy = (py - y0)[..., None]
        wx = (px - x0)[..., None]
        flat = x.reshape(b, h * w, c)

        def take(yy, xx):
            return jnp.take_along_axis(flat, (yy * w + xx).reshape(b, -1, 1), axis=1).reshape(b, h, w, c)

        xs = ((take(y0, x0) * (1 - wy) * (1 - wx)) + (take(y0, x1) * (1 - wy) * wx)
              + (take(y1, x0) * wy * (1 - wx)) + (take(y1, x1) * wy * wx))

        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_k")(xs)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_v")(xs)
        n = h * w

        def heads(t):
            return t.reshape(b, n, self.n_heads, hd).transpose(0, 2, 1, 3)  # (b, nh, n, hd)

        attn = jax.nn.softmax(heads(q) @ jnp.swapaxes(heads(k), -2, -1) * scale, -1)
        out = (attn @ heads(v)).transpose(0, 2, 1, 3).reshape(b, h, w, c)
        # depthwise positional residual on q (dwc_pe=True default)
        lepe = nn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                       dtype=self.dtype, name="rpe_table")(q)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out + lepe)


class LSKA(ConvBase):
    """Large separable kernel attention (reference block.py:6615): cascaded
    (1,k)+(k,1) DW convs, then dilated pairs, then 1x1 — the product gates x."""

    k: int = 11

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        d = max(self.k // 3, 2)  # dilation of the long-range pair
        k0 = 5
        a = nn.Conv(c, (1, k0), padding=((0, 0), (k0 // 2, k0 // 2)),
                    feature_group_count=c, dtype=self.dtype, name="dw_h")(x)
        a = nn.Conv(c, (k0, 1), padding=((k0 // 2, k0 // 2), (0, 0)),
                    feature_group_count=c, dtype=self.dtype, name="dw_v")(a)
        ke = self.k // d + 1
        a = nn.Conv(c, (1, ke), padding="SAME", kernel_dilation=(1, d),
                    feature_group_count=c, dtype=self.dtype, name="dwd_h")(a)
        a = nn.Conv(c, (ke, 1), padding="SAME", kernel_dilation=(d, 1),
                    feature_group_count=c, dtype=self.dtype, name="dwd_v")(a)
        a = nn.Conv(c, (1, 1), dtype=self.dtype, name="pw")(a)
        return x * a


class CPCA(ConvBase):
    """Channel-prior conv attention (reference CPCAChannelAttention
    block.py:3538 + the multi-strip spatial stage): avg+max MLP channel gate,
    then 5x5 + (1,7)/(7,1) + (1,11)/(11,1) + (1,21)/(21,1) DW strip convs
    summed as the spatial gate."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        hid = max(c // self.reduction, 8)

        def mlp(v, prefix):
            v = jax.nn.relu(nn.Dense(hid, dtype=self.dtype, name=f"{prefix}_fc1")(v))
            return nn.Dense(c, dtype=self.dtype, name=f"{prefix}_fc2")(v)

        ca = jax.nn.sigmoid(mlp(x.mean(axis=(1, 2)), "ca") + mlp(x.max(axis=(1, 2)), "ca2"))
        y = x * ca[:, None, None, :]
        s = nn.Conv(c, (5, 5), padding=((2, 2), (2, 2)), feature_group_count=c,
                    dtype=self.dtype, name="dw5")(y)
        for i, k in enumerate((7, 11, 21)):
            h = nn.Conv(c, (1, k), padding=((0, 0), (k // 2, k // 2)),
                        feature_group_count=c, dtype=self.dtype, name=f"strip{i}_h")(y)
            h = nn.Conv(c, (k, 1), padding=((k // 2, k // 2), (0, 0)),
                        feature_group_count=c, dtype=self.dtype, name=f"strip{i}_v")(h)
            s = s + h
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="pw")(s)
        return y * jax.nn.sigmoid(s)


class FocusedLinearAttention(ConvBase):
    """Focused linear attention (reference block.py:6270): relu feature maps
    raised to a focusing power with norm restoration; O(N*d^2) linear
    attention + a per-head DW conv on V."""

    num_heads: int = 8
    focusing: float = 3.0
    dw_k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = self.num_heads if c % self.num_heads == 0 else 1
        hd = c // nh
        n = h * w
        t = x.reshape(b, n, c)
        q = nn.Dense(c, dtype=self.dtype, name="q")(t)
        kv = nn.Dense(2 * c, dtype=self.dtype, name="kv")(t)
        k, v = jnp.split(kv, 2, axis=-1)
        k = k + self.param("pos", nn.initializers.zeros, (1, 1, c))
        scale = jax.nn.softplus(self.param("scale", nn.initializers.zeros, (1, 1, c)))
        q = (jax.nn.relu(q) + 1e-6) / (scale + 1e-6)
        k = (jax.nn.relu(k) + 1e-6) / (scale + 1e-6)
        qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
        kn = jnp.linalg.norm(k, axis=-1, keepdims=True)
        q = (q ** self.focusing)
        k = (k ** self.focusing)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6) * qn
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6) * kn
        q = q.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        # linear attention: out_i = (q_i @ sum_j k_j v_j^T) / (q_i . sum_j k_j)
        z = 1.0 / (jnp.einsum("bhnd,bhd->bhn", q, k.sum(axis=2)) + 1e-6)
        kv_ctx = jnp.einsum("bhnd,bhne->bhde", k, vh)
        out = jnp.einsum("bhnd,bhde->bhne", q, kv_ctx) * z[..., None]
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        # per-head DW conv on V (local detail branch)
        vimg = v.reshape(b, h, w, c)
        p = self.dw_k // 2
        out = out + nn.Conv(c, (self.dw_k, self.dw_k), padding=((p, p), (p, p)),
                            feature_group_count=c, dtype=self.dtype, name="dwc")(vimg)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out).reshape(b, h, w, c)


class Yolov7_Tiny_E_ELAN(ConvBase):
    """v7-tiny ELAN (reference block.py:5829): 2 stems + 2 cascaded 3x3,
    concat all 4, 1x1 fuse."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        x1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        x2 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        x3 = Conv(c2=c_, k=3, dtype=self.dtype, name="cv3")(x2, train)
        x4 = Conv(c2=c_, k=3, dtype=self.dtype, name="cv4")(x3, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv5")(
            jnp.concatenate([x1, x2, x3, x4], -1), train)


class Yolov7_E_ELAN(ConvBase):
    """v7 E-ELAN (reference block.py:5963): 2 stems + 4 cascaded 3x3 convs;
    `layer` selects which intermediates aggregate (expand-merge cardinality)."""

    c2: int = 0
    in_c: int = 0
    layer: Tuple[int, ...] = (0, 1, 3, 5)
    backbone: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.in_c or self.c2 // 2
        stem_c = c_ if self.backbone else self.c2
        x1 = Conv(c2=stem_c, k=1, dtype=self.dtype, name="cv1")(x, train)
        x2 = Conv(c2=stem_c, k=1, dtype=self.dtype, name="cv2")(x, train)
        x3 = Conv(c2=c_, k=3, dtype=self.dtype, name="cv3")(x2, train)
        x4 = Conv(c2=c_, k=3, dtype=self.dtype, name="cv4")(x3, train)
        x5 = Conv(c2=c_, k=3, dtype=self.dtype, name="cv5")(x4, train)
        x6 = Conv(c2=c_, k=3, dtype=self.dtype, name="cv6")(x5, train)
        inter = [x1, x2, x3, x4, x5, x6]
        y = jnp.concatenate([inter[i] for i in self.layer], -1)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv7")(y, train)


class V7DownSampling(ConvBase):
    """v7 dual-path downsample (reference block.py:6000): maxpool+1x1 branch
    || 1x1+3x3s2 branch, concatenated."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        a = nn.max_pool(x, (2, 2), (2, 2), padding="VALID")
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(a, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        b = Conv(c2=c_, k=3, s=2, dtype=self.dtype, name="cv3")(b, train)
        return jnp.concatenate([a, b], -1)
