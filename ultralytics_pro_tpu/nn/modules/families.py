"""Model-family modules: RTMDet, PicoDet, HEYDet, LeYOLO, hyper-yolo,
MAF-YOLO, PST, RCS-YOLO, S-YOLO (slim-neck v2), yolor-R, ALSS, CST, FBRT, BGF.

Each class mirrors the behavior of its reference counterpart (file:line cited
per class) in flax/NHWC with static shapes. Irregular ops are reformulated
for XLA: hypergraph message passing is a masked matmul, BiFormer's region
routing is a static top-k gather, PST's sparse attention runs dense
cross-scale attention (the reference's own training-phase configuration).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.block import Bottleneck, C2f
from ultralytics_pro_tpu.nn.modules.conv import (
    BN_EPS,
    BN_MOMENTUM,
    Conv,
    ConvBase,
    DWConv,
    apply_act,
    autopad,
)


def _bn(mod, name, x, train, eps=BN_EPS):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        use_fast_variance=False, epsilon=eps, dtype=mod.dtype,
                        name=name, parent=mod)(x)


def channel_shuffle(x, groups: int):
    """NHWC channel shuffle (reference RCSOSA.py:142)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w, groups, c // groups).swapaxes(-1, -2).reshape(b, h, w, c)


# --------------------------------------------------------------------------
# RTMDet
# --------------------------------------------------------------------------

class CSPNeXtBlock(ConvBase):
    """Conv k0 -> DWConv k1(5) with shortcut (reference block.py:671)."""

    c2: int = 0
    shortcut: bool = True
    k: Sequence[int] = (3, 5)

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(c2=self.c2, k=self.k[0], dtype=self.dtype, name="cv1")(x, train)
        y = DWConv(c2=self.c2, k=self.k[1], dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class RTMBlock(ConvBase):
    """CSP block over CSPNeXtBlocks + channel attention on the fused map
    (reference block.py:491, RTMDet's CSPNeXt stage)."""

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
            a = CSPNeXtBlock(c2=c_, shortcut=self.shortcut, k=(3, 5),
                             dtype=self.dtype, name=f"m_{i}")(a, train)
        cat = jnp.concatenate([a, b], -1)
        # ChannelAttention on the CONCATENATED branches BEFORE the fuse conv
        # (mmdet CSPLayer order: attention(cat) -> final_conv)
        g = cat.mean(axis=(1, 2), keepdims=True)
        g = jax.nn.sigmoid(nn.Conv(cat.shape[-1], (1, 1), dtype=self.dtype,
                                   name="attn_fc")(g))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(cat * g, train)


# --------------------------------------------------------------------------
# PicoDet (ESNet / LCNet pieces)
# --------------------------------------------------------------------------

class CBH(ConvBase):
    """Conv-BN-HardSwish (reference block.py:3327)."""

    c2: int = 0
    k: int = 3
    s: int = 1
    g: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.k - 1) // 2
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=self.g,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        return jax.nn.hard_swish(_bn(self, "bn", y, train))


class DWConvblock(ConvBase):
    """DW k conv + PW 1x1, ReLU after each BN (reference block.py:3516)."""

    c2: int = 0
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        p = self.k // 2
        y = nn.Conv(c1, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=c1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(_bn(self, "bn1", y, train))
        y = nn.Conv(self.c2, (1, 1), use_bias=False, dtype=self.dtype, name="conv2")(y)
        return jax.nn.relu(_bn(self, "bn2", y, train))


def _se_hswish(mod, x, c, train, prefix):
    """SE with a hard-sigmoid gate (reference ES_SEModule: the gate must be
    bounded to [0, 1])."""
    s = x.mean(axis=(1, 2))
    s = jax.nn.relu(nn.Dense(c // 4, dtype=mod.dtype, name=f"{prefix}_fc0", parent=mod)(s))
    s = jax.nn.hard_sigmoid(nn.Dense(c, dtype=mod.dtype, name=f"{prefix}_fc1", parent=mod)(s))
    return x * s[:, None, None, :]


class ES_Bottleneck(ConvBase):
    """ESNet bottleneck (reference block.py:4116): stride-1 = half-split +
    ghost branch + shuffle; stride-2 = dual downsample branches + DW+PW."""

    c2: int = 0
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        bf = self.c2 // 2
        if self.s == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            # branch3: GhostConv + SE + PW (block.py:4151)
            g = Conv(c2=bf // 2, k=3, dtype=self.dtype, name="b3_ghost1")(x2, train)
            g2 = DWConv(c2=bf // 2, k=5, dtype=self.dtype, name="b3_ghost2")(g, train)
            y = jnp.concatenate([g, g2], -1)
            y = _se_hswish(self, y, bf, train, "b3_se")
            y = nn.Conv(bf, (1, 1), use_bias=False, dtype=self.dtype, name="b3_pw")(y)
            y = jax.nn.hard_swish(_bn(self, "b3_bn", y, train))
            out = jnp.concatenate([x1, y], -1)
            return channel_shuffle(out, 2)
        # stride 2
        b1 = nn.Conv(c1, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     feature_group_count=c1, use_bias=False, dtype=self.dtype,
                     name="b1_dw")(x)
        b1 = _bn(self, "b1_bn1", b1, train)
        b1 = nn.Conv(bf, (1, 1), use_bias=False, dtype=self.dtype, name="b1_pw")(b1)
        b1 = jax.nn.hard_swish(_bn(self, "b1_bn2", b1, train))
        b2 = nn.Conv(bf, (1, 1), use_bias=False, dtype=self.dtype, name="b2_pw1")(x)
        b2 = jax.nn.hard_swish(_bn(self, "b2_bn1", b2, train))
        b2 = nn.Conv(bf, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     feature_group_count=bf, use_bias=False, dtype=self.dtype,
                     name="b2_dw")(b2)
        b2 = _bn(self, "b2_bn2", b2, train)
        b2 = _se_hswish(self, b2, bf, train, "b2_se")
        b2 = nn.Conv(bf, (1, 1), use_bias=False, dtype=self.dtype, name="b2_pw2")(b2)
        b2 = jax.nn.hard_swish(_bn(self, "b2_bn3", b2, train))
        y = jnp.concatenate([b1, b2], -1)
        # branch4: DW+PW on the fused map
        y2 = nn.Conv(self.c2, (3, 3), padding=((1, 1), (1, 1)),
                     feature_group_count=self.c2, use_bias=False,
                     dtype=self.dtype, name="b4_dw")(y)
        y2 = _bn(self, "b4_bn1", y2, train)
        y2 = nn.Conv(self.c2, (1, 1), use_bias=False, dtype=self.dtype, name="b4_pw")(y2)
        return jax.nn.hard_swish(_bn(self, "b4_bn2", y2, train))


class ADD(ConvBase):
    """x[0] + alpha * x[1] (reference block.py:6112)."""

    alpha: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x[0] + self.alpha * x[1]


# --------------------------------------------------------------------------
# HEYDet
# --------------------------------------------------------------------------

class EdgeEnhancer(ConvBase):
    """x + sigmoid-conv(x - avgpool3(x)): sharpen local edges."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        edge = x - nn.avg_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))
        g = jax.nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, name="conv")(edge))
        return x + edge * g


class EIMS(ConvBase):
    """Multi-scale edge-information enhance (reference block.py:6806):
    pyramid-pooled branches, edge-enhanced, fused with a local DW path and a
    dual-domain (channel x spatial) selection gate."""

    bins: Sequence[int] = (3, 6, 9, 12)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        cb = c // len(self.bins)
        outs = [DWConv(c2=c, k=3, dtype=self.dtype, name="local")(x, train)]
        for i, g in enumerate(self.bins):
            f = jax.image.resize(x, (b, g, g, c), method="bilinear")
            f = Conv(c2=cb, k=1, dtype=self.dtype, name=f"pool{i}_cv1")(f, train)
            f = Conv(c2=cb, k=3, g=cb, dtype=self.dtype, name=f"pool{i}_cv2")(f, train)
            f = jax.image.resize(f, (b, h, w, cb), method="bilinear")
            outs.append(EdgeEnhancer(dtype=self.dtype, name=f"ee{i}")(f, train))
        y = jnp.concatenate(outs, -1)  # 2c channels
        # dual-domain selection: channel gate x spatial gate (DSM, reduced)
        cg = jax.nn.sigmoid(nn.Dense(2 * c, dtype=self.dtype, name="dsm_c")(y.mean(axis=(1, 2))))
        sg = jax.nn.sigmoid(nn.Conv(1, (7, 7), padding=((3, 3), (3, 3)),
                                    dtype=self.dtype, name="dsm_s")(y))
        y = y * cg[:, None, None, :] * sg
        return DWConv(c2=c, k=3, dtype=self.dtype, name="final")(y, train)


class CSP_EIMS(ConvBase):
    """C2f whose inner blocks are EIMS (reference block.py:6840)."""

    c2: int = 0
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(EIMS(dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class LocalGlobalAttention(ConvBase):
    """Patch-pooled MLP attention with prompt-cosine masking
    (reference block.py:6846), P x P patches."""

    out_dim: int = 0
    patch: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        p, d = min(self.patch, x.shape[1], x.shape[2]), self.out_dim
        nh, nw = h // p, w // p
        patches = x[:, :nh * p, :nw * p].reshape(b, nh, p, nw, p, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, p * p, c)
        feats = patches.mean(axis=-1)  # pixel-mean over channels
        y = nn.Dense(d // 2, dtype=self.dtype, name="mlp1")(feats)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        y = nn.Dense(d, dtype=self.dtype, name="mlp2")(y)
        y = y * jax.nn.softmax(y, axis=-1)
        prompt = self.param("prompt", nn.initializers.normal(1.0), (d,))
        tdt = self.param("top_down_transform", lambda k, s: jnp.eye(s[0]), (d, d))
        cos = (y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-6)) @ \
              (prompt / (jnp.linalg.norm(prompt) + 1e-6))
        y = y * jnp.clip(cos, 0, 1)[..., None]
        y = y @ tdt
        y = y.reshape(b, nh, nw, d)
        y = jax.image.resize(y, (b, h, w, d), method="bilinear")
        return nn.Conv(d, (1, 1), dtype=self.dtype, name="conv")(y)


class HRIF(ConvBase):
    """High-res information fusion of two maps (reference block.py:6889):
    per-input local+global LGA branches + shared-projection bypass, squeezed
    and refined by a RepConv."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.conv import RepConv

        x1, x2 = x
        hidc = self.c2 // 2
        w1 = Conv(c2=hidc, k=1, act=False, dtype=self.dtype, name="W_x1")(x1, train)
        w2 = Conv(c2=hidc, k=1, act=False, dtype=self.dtype, name="W_x2")(x2, train)
        bp = Conv(c2=self.c2, k=3, g=4, dtype=self.dtype, name="W")(w1 + w2, train)
        a = jnp.concatenate([
            LocalGlobalAttention(out_dim=hidc, patch=2, dtype=self.dtype, name="lgb1_local")(w1, train),
            LocalGlobalAttention(out_dim=hidc, patch=4, dtype=self.dtype, name="lgb1_global")(w1, train)], -1)
        b = jnp.concatenate([
            LocalGlobalAttention(out_dim=hidc, patch=2, dtype=self.dtype, name="lgb2_local")(w2, train),
            LocalGlobalAttention(out_dim=hidc, patch=4, dtype=self.dtype, name="lgb2_global")(w2, train)], -1)
        y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="conv_squeeze")(
            jnp.concatenate([a, b, bp], -1), train)
        y = RepConv(c2=self.c2, k=3, dtype=self.dtype, name="rep_conv")(y, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="conv_final")(y, train)


# --------------------------------------------------------------------------
# LeYOLO
# --------------------------------------------------------------------------

class mn_conv(ConvBase):
    """Conv-BN-act with LeYOLO's padding rule: no padding when k == s
    (reference leyolo.py:37). act 'RE' = relu6, 'HS' = hardswish."""

    c2: int = 0
    k: int = 1
    s: int = 1
    act: str = "RE"
    g: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = 0 if self.k == self.s else autopad(self.k)
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=self.g,
                    use_bias=True, dtype=self.dtype, name="c")(x)
        y = _bn(self, "bn", y, train)
        if self.act == "RE":
            return jax.nn.relu6(y)
        if self.act == "SI":
            return jax.nn.silu(y)
        return jax.nn.hard_swish(y)


class MobileNetV3_BLOCK(ConvBase):
    """Inverted bottleneck: optional PW expand -> DW k,s -> PW project-BN,
    residual when c1 == c2 and s == 1 (reference leyolo.py:73)."""

    c2: int = 0
    k: int = 3
    e: Any = None  # expansion channels (None -> c1)
    act: str = "RE"
    s: int = 1
    pw: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        cm = int(self.e) if self.e else c1
        y = x
        if self.pw:
            y = mn_conv(c2=cm, act=self.act, dtype=self.dtype, name="expand")(y, train)
        y = mn_conv(c2=cm, k=self.k, s=self.s, g=cm, act=self.act,
                    dtype=self.dtype, name="dw")(y, train)
        y = nn.Conv(self.c2, (1, 1), use_bias=True, dtype=self.dtype, name="project")(y)
        y = _bn(self, "project_bn", y, train)
        return x + y if c1 == self.c2 and self.s == 1 else y


# --------------------------------------------------------------------------
# hyper-yolo
# --------------------------------------------------------------------------

class MANet(ConvBase):
    """Mixed aggregation network block (reference hyperyolo.py:12)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = False
    p: int = 1
    k: int = 3
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv_first")(x, train)
        y0 = Conv(c2=c, k=1, dtype=self.dtype, name="cv_block_1")(y, train)
        dh = int(self.p * 2 * c)
        y1 = Conv(c2=dh, k=1, dtype=self.dtype, name="cv_b2_0")(y, train)
        y1 = DWConv(c2=dh, k=self.k, dtype=self.dtype, name="cv_b2_1")(y1, train)
        y1 = Conv(c2=c, k=1, dtype=self.dtype, name="cv_b2_2")(y1, train)
        y2, y3 = jnp.split(y, 2, axis=-1)
        ys = [y0, y1, y2, y3]
        for i in range(self.n):
            ys.append(Bottleneck(c2=c, shortcut=self.shortcut, k=(3, 3), e=1.0,
                                 dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv_final")(jnp.concatenate(ys, -1), train)


class HyperComputeModule(ConvBase):
    """Hypergraph conv over spatial tokens (reference hyperyolo.py:75): the
    distance-thresholded incidence matrix H drives two masked-matmul message
    passes (v->e mean, e->v mean) — pure MXU work, no sparse ops."""

    c2: int = 0
    threshold: float = 10.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c).astype(jnp.float32)
        # |a-b|^2 = |a|^2 + |b|^2 - 2ab^T: two matmuls, no (N,N,C) intermediate
        sq = (t ** 2).sum(-1)
        d2 = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * (t @ t.swapaxes(1, 2)), 0.0)
        hg = (jnp.sqrt(jnp.maximum(d2, 0.0)) < self.threshold).astype(jnp.float32)
        # hypergraph conv is channel-preserving (c2 == c1 in the reference
        # yamls); the residual `v + t` requires matching widths
        f = nn.Dense(c, dtype=self.dtype, name="fc")(t).astype(jnp.float32)
        # v -> e (mean over member vertices), then e -> v
        ht = hg.swapaxes(1, 2)
        e = (ht @ f) / jnp.maximum(ht.sum(-1, keepdims=True), 1.0)
        v = (hg @ e) / jnp.maximum(hg.sum(-1, keepdims=True), 1.0)
        y = (v + t).reshape(b, h, w, c).astype(x.dtype)
        return jax.nn.silu(_bn(self, "bn", y, train))


# --------------------------------------------------------------------------
# MAF-YOLO
# --------------------------------------------------------------------------

class AVG(ConvBase):
    """Average downsample (reference mafyolo.py:38; also serves
    nn.AvgPool2d(k, s) yaml entries)."""

    k: int = 2
    s: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.avg_pool(x, (self.k, self.k), (self.s, self.s), padding="VALID")


class DepthBottleneckUni(ConvBase):
    """1x1 -> DW k (+ parallel DW small-k, UniRepLK-style) -> 1x1, optional
    residual (reference mafyolo.py DepthBottleneckUniv2)."""

    c2: int = 0
    shortcut: bool = True
    k: int = 5
    depth_e: float = 2.0
    small_k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        cm = int(x.shape[-1] * self.depth_e)
        y = Conv(c2=cm, k=1, dtype=self.dtype, name="cv1")(x, train)
        d = DWConv(c2=cm, k=self.k, act=False, dtype=self.dtype, name="dw_large")(y, train)
        d = d + DWConv(c2=cm, k=self.small_k, act=False, dtype=self.dtype,
                       name="dw_small")(y, train)
        y = apply_act(d, True)
        y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class RepHMS(ConvBase):
    """Multi-branch cascaded ELAN with depth-wise Uni bottlenecks
    (reference mafyolo.py:329)."""

    c2: int = 0
    width: int = 3
    depth: int = 1
    depth_e: float = 2.0
    k: int = 5
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c2=c_ * self.width, k=1, dtype=self.dtype, name="conv1")(x, train)
        xs = [y[..., i * c_:(i + 1) * c_] for i in range(self.width)]
        xs[1] = xs[1] + xs[0]
        cascade, elan = [], [xs[0]]
        for i in range(self.width - 1):
            for j in range(self.depth):
                if i > 0:
                    xs[i + 1] = xs[i + 1] + cascade[j]
                    if j == self.depth - 1:
                        cascade = [cascade[-1]] if self.depth > 1 else []
                xs[i + 1] = DepthBottleneckUni(c2=c_, k=self.k, depth_e=self.depth_e,
                                               dtype=self.dtype,
                                               name=f"m_{i}_{j}")(xs[i + 1], train)
                elan.append(xs[i + 1])
                if i < self.width - 2:
                    cascade.append(xs[i + 1])
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="conv2")(jnp.concatenate(elan, -1), train)


# --------------------------------------------------------------------------
# PST (Pyramid Sparse Transformer)
# --------------------------------------------------------------------------

class PSAttnBlock(ConvBase):
    """Cross-scale attention block (reference block.py PSAttnBlock): queries
    from the high-res map, keys/values from the upper (coarser) map; dense
    attention == the reference's training configuration (topk=0)."""

    c: int = 0
    num_heads: int = 4
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x, up, train: bool = False):
        b, h, w, c = x.shape
        hu, wu = up.shape[1], up.shape[2]
        nh = self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q")(
            nn.LayerNorm(dtype=self.dtype, name="norm_q")(x)).reshape(b, h * w, nh, c // nh)
        kv_in = nn.LayerNorm(dtype=self.dtype, name="norm_kv")(up)
        k = nn.Dense(c, dtype=self.dtype, name="k")(kv_in).reshape(b, hu * wu, nh, c // nh)
        v = nn.Dense(c, dtype=self.dtype, name="v")(kv_in).reshape(b, hu * wu, nh, c // nh)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(c // nh)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, h, w, c)
        x = x + nn.Dense(c, dtype=self.dtype, name="proj")(y)
        z = nn.LayerNorm(dtype=self.dtype, name="norm_mlp")(x)
        z = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(z)
        z = nn.Dense(c, dtype=self.dtype, name="fc2")(jax.nn.gelu(z))
        return x + z


class PST(ConvBase):
    """Pyramid sparse transformer fusion of (x, upper) (reference
    block.py:7940)."""

    c2: int = 0
    n: int = 1
    mlp_ratio: float = 2.0
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat, upper = x
        c_ = max(32, (int(self.c2 * self.e) // 32) * 32)
        y = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(feat, train)
        up = Conv(c2=c_, k=1, dtype=self.dtype, name="cvup")(upper, train)
        outs = [y]
        for i in range(self.n):
            y = PSAttnBlock(c=c_, num_heads=max(c_ // 32, 1), mlp_ratio=self.mlp_ratio,
                            dtype=self.dtype, name=f"attnlayer_{i}")(y, up, train)
            outs.append(y)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(outs, -1), train)


# --------------------------------------------------------------------------
# RCS-YOLO
# --------------------------------------------------------------------------

class SR(ConvBase):
    """Shuffle-RepVGG: half passthrough, half RepVGG, shuffle
    (reference RCSOSA.py:128)."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.goldyolo import RepVGGBlock

        x1, x2 = jnp.split(x, 2, axis=-1)
        y = RepVGGBlock(c2=self.c2 // 2, dtype=self.dtype, name="repconv")(x2, train)
        return channel_shuffle(jnp.concatenate([x1, y], -1), 2)


class RCSOSA(ConvBase):
    """VoVNet-style one-shot aggregation of SR chains (reference
    RCSOSA.py:157)."""

    c2: int = 0
    n: int = 1
    se: bool = False
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.goldyolo import RepVGGBlock

        c_ = int(x.shape[-1] * self.e)
        c_ = max((c_ // 8) * 8, 8)
        x1 = RepVGGBlock(c2=c_, dtype=self.dtype, name="conv1")(x, train)
        x2 = x1
        for i in range(max(self.n // 2, 1)):
            x2 = SR(c2=c_, dtype=self.dtype, name=f"sr1_{i}")(x2, train)
        x3 = x2
        for i in range(max(self.n // 2, 1)):
            x3 = SR(c2=c_, dtype=self.dtype, name=f"sr2_{i}")(x3, train)
        y = RepVGGBlock(c2=self.c2, dtype=self.dtype, name="conv3")(
            jnp.concatenate([x1, x2, x3], -1), train)
        if self.se:
            s = y.mean(axis=(1, 2))
            s = jax.nn.relu(nn.Dense(max(self.c2 // 16, 1), dtype=self.dtype, name="se_fc0")(s))
            s = jax.nn.sigmoid(nn.Dense(self.c2, dtype=self.dtype, name="se_fc1")(s))
            y = y * s[:, None, None, :]
        return y


# --------------------------------------------------------------------------
# S-YOLO (slim-neck v2)
# --------------------------------------------------------------------------

class SNI(ConvBase):
    """Soft nearest-neighbor interpolation upsample: NN x f scaled by 1/f^2
    (reference Slimneckv2.py:33)."""

    up_f: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        y = jax.image.resize(x, (b, h * self.up_f, w * self.up_f, c), method="nearest")
        return y / (self.up_f ** 2)


class GSConvE(ConvBase):
    """Enhanced GSConv: half conv, half (3x3 dense + 3x3 DW + GELU), shuffled
    (reference Slimneckv2.py:48)."""

    c2: int = 0
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        x1 = Conv(c2=c_, k=self.k, s=self.s, dtype=self.dtype, name="cv1")(x, train)
        y = nn.Conv(c_, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="cv2_0")(x1)
        y = nn.Conv(c_, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c_,
                    use_bias=False, dtype=self.dtype, name="cv2_1")(y)
        y = jax.nn.gelu(y)
        out = jnp.concatenate([x1, y], -1)
        b, h, w, c = out.shape
        return out.reshape(b, h, w, 2, c // 2).swapaxes(-1, -2).reshape(b, h, w, c)


# --------------------------------------------------------------------------
# yolor / R family
# --------------------------------------------------------------------------

class ResBottleneck(ConvBase):
    """1x1 -> 3x3 -> residual (classic Res unit used by ResCSP*)."""

    c2: int = 0
    shortcut: bool = True
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(c2=c_, k=3, dtype=self.dtype, name="cv2")(y, train)
        y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class BottleneckCSPB(ConvBase):
    """CSP-B topology (reference block.py:758): single stem, parallel plain
    1x1, post-BN fuse."""

    c2: int = 0
    n: int = 1
    shortcut: bool = False
    inner: Any = Bottleneck

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2
        x1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        y1 = x1
        for i in range(self.n):
            y1 = self.inner(c2=c_, shortcut=self.shortcut, e=1.0 if self.inner is Bottleneck else 0.5,
                            dtype=self.dtype, name=f"m_{i}")(y1, train)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv2")(x1)
        y = jnp.concatenate([y1, y2], -1)
        y = apply_act(_bn(self, "bn", y, train), True)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(y, train)


class ResCSPB(BottleneckCSPB):
    """CSP-B with Res bottlenecks (reference block.py:3712)."""

    inner: Any = ResBottleneck


class BottleneckCSPC(ConvBase):
    """CSP-C topology (reference block.py:778): dual 1x1 stems, conv after
    the bottleneck chain, concat, final 1x1."""

    c2: int = 0
    n: int = 1
    shortcut: bool = False
    inner: Any = Bottleneck

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * 0.5)
        x1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        x2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv2")(x)
        y1 = x1
        for i in range(self.n):
            y1 = self.inner(c2=c_, shortcut=self.shortcut, e=1.0 if self.inner is Bottleneck else 0.5,
                            dtype=self.dtype, name=f"m_{i}")(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv3")(y1)
        y = apply_act(_bn(self, "bn", jnp.concatenate([y1, x2], -1), train), True)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv4")(y, train)


class ResCSPC(BottleneckCSPC):
    """CSP-C with Res bottlenecks (reference block.py:3720)."""

    inner: Any = ResBottleneck


class Stem(ConvBase):
    """yolor stem: 3x3 s1 widen + 3x3 s2 downsample (the R-family yamls name
    a `Stem` the reference registry does not export; this is the standard
    CSP stem those configs describe)."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(c2=self.c2 // 2, k=3, dtype=self.dtype, name="cv1")(x, train)
        return Conv(c2=self.c2, k=3, s=2, dtype=self.dtype, name="cv2")(y, train)


# --------------------------------------------------------------------------
# ALSS-YOLO
# --------------------------------------------------------------------------

class ALSS(ConvBase):
    """Asymmetric light split-shuffle block (reference ALSSyolo.py:32)."""

    c2: int = 0
    n: int = 1
    alpha: float = 0.2
    beta: float = 1.0
    s: int = 1
    use_identity: bool = False
    shortcut_mode: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        sc = int(c1 * self.alpha)
        main_in = c1 - sc
        bc = int(main_in * self.beta)
        main_out = self.c2 - sc
        xs, xm = x[..., :sc], x[..., sc:]
        if self.s == 2:
            if self.shortcut_mode == 0:
                xs = Conv(c2=sc, k=3, s=2, dtype=self.dtype, name="shortcut")(xs, train)
            else:
                xs = nn.avg_pool(xs, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
                if self.shortcut_mode == 1:
                    xs = Conv(c2=sc, k=3, dtype=self.dtype, name="shortcut")(xs, train)
        elif not self.use_identity:
            xs = Conv(c2=sc, k=3, dtype=self.dtype, name="shortcut")(xs, train)
        y = Conv(c2=bc, k=3, dtype=self.dtype, name="initial_conv")(xm, train)
        for i in range(self.n):
            s = 2 if (self.s == 2 and i == 0) else 1
            y = Conv(c2=bc, k=3, s=s, g=bc, act=False, dtype=self.dtype,
                     name=f"middle_{i}")(y, train)
        y = Conv(c2=main_out, k=3, dtype=self.dtype, name="final_conv")(y, train)
        return channel_shuffle(jnp.concatenate([y, xs], -1), 2)


class LCA(ConvBase):
    """Lightweight coordinate attention: per-channel DW gates from H- and
    W-pooled profiles (reference ALSSyolo.py:113)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        xh = x.mean(axis=2, keepdims=True)  # (B,H,1,C)
        xw = x.mean(axis=1, keepdims=True)  # (B,1,W,C)
        ah = jax.nn.sigmoid(nn.Conv(c, (1, 1), feature_group_count=c,
                                    dtype=self.dtype, name="conv_h")(xh))
        aw = jax.nn.sigmoid(nn.Conv(c, (1, 1), feature_group_count=c,
                                    dtype=self.dtype, name="conv_w")(xw))
        return x * ah * aw


# --------------------------------------------------------------------------
# CST-YOLO
# --------------------------------------------------------------------------

class CST(ConvBase):
    """CSP-Swin: swin transformer block on one CSP branch (reference
    cstyolo.py:518)."""

    c2: int = 0
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.backbones import SwinBlock

        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        heads = max(c_ // 32, 1)
        for i in range(self.n):
            a = SwinBlock(dim=c_, heads=heads, window=7, shift=(3 if i % 2 else 0),
                          dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class MCS(ConvBase):
    """Multi-scale channel selection (reference cstyolo.py:336), generalized
    to any c1 divisible by 4: four pyramid-depooled branches gate the input
    via an ECA-style 1D conv, quarters are summed and projected."""

    c2: int = 0
    grids: Sequence[int] = (16, 10, 8, 5)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        q = c // 4
        pooled = []
        for i, g in enumerate(self.grids):
            f = Conv(c2=q, k=1, dtype=self.dtype, name=f"dp{i}_cv")(x, train)
            gs = min(g, h)
            f = jax.image.resize(f, (b, gs, gs, q), method="bilinear")
            f = Conv(c2=q, k=3, dtype=self.dtype, name=f"dp{i}_conv")(f, train)
            f = jax.image.resize(f, (b, h, w, q), method="bilinear")
            pooled.append(f)
        cat = jnp.concatenate(pooled, -1)  # (B,H,W,c)
        g = cat.mean(axis=(1, 2))[:, :, None]  # (B,C,1)
        g = nn.Conv(1, (3,), padding=((1, 1),), use_bias=False, dtype=self.dtype,
                    name="eca")(g)[..., 0]
        y = x * jax.nn.sigmoid(g)[:, None, None, :]
        quarters = sum(jnp.split(y, 4, axis=-1))
        out = Conv(c2=self.c2, k=1, dtype=self.dtype, name="conv6")(quarters, train)
        return out + x if self.c2 == c else out


class WeightedConcat(ConvBase):
    """Learned-weight concat of n inputs (reference cstyolo.py MyConcat4:490,
    MyConcat6:504)."""

    n_in: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.param("w", nn.initializers.ones, (self.n_in,))
        w = w / (w.sum() + 1e-4)
        return jnp.concatenate([w[i] * x[i] for i in range(self.n_in)], -1)


# --------------------------------------------------------------------------
# FBRT-YOLO
# --------------------------------------------------------------------------

class Pzconv(ConvBase):
    """Residual DW 3/5/7 + PW chain (reference conv.py:2070)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                    dtype=self.dtype, name="conv1")(x)
        y = Conv(c2=c, k=1, dtype=self.dtype, name="conv2")(y, train)
        y = nn.Conv(c, (5, 5), padding=((2, 2), (2, 2)), feature_group_count=c,
                    dtype=self.dtype, name="conv3")(y)
        y = Conv(c2=c, k=1, dtype=self.dtype, name="conv4")(y, train)
        y = nn.Conv(c, (7, 7), padding=((3, 3), (3, 3)), feature_group_count=c,
                    dtype=self.dtype, name="conv5")(y)
        return y + x


class Down(ConvBase):
    """Grouped 3x3 s2 + PW (reference conv.py:2098)."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        y = Conv(c2=c1, k=3, s=2, g=max(c1 // 2, 1), act=False, dtype=self.dtype,
                 name="conv2")(x, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="conv4")(y, train)


# --------------------------------------------------------------------------
# BGF-YOLO (BiFormer attention)
# --------------------------------------------------------------------------

class BiLevelRoutingAttention(ConvBase):
    """BiFormer bi-level routing attention (reference biformer.py:104): the
    feature map splits into n_win x n_win regions; a region-affinity router
    selects top-k source regions per target region; token attention runs only
    against the gathered K/V of those regions. Static top-k + gather -> XLA
    friendly. A DW 5x5 on V provides the local-context branch (lce)."""

    num_heads: int = 8
    n_win: int = 4
    topk: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nwin = self.n_win
        if h % nwin or w % nwin:  # fall back to a divisor
            nwin = 2 if (h % 2 == 0 and w % 2 == 0) else 1
        hw, ww = h // nwin, w // nwin
        r = nwin * nwin
        t = hw * ww
        nh = self.num_heads if c % self.num_heads == 0 else 1
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        lce = nn.Conv(c, (5, 5), padding=((2, 2), (2, 2)), feature_group_count=c,
                      dtype=self.dtype, name="lce")(v)

        def regionize(z):  # (B,H,W,C) -> (B, R, T, C)
            z = z.reshape(b, nwin, hw, nwin, ww, c)
            return z.transpose(0, 1, 3, 2, 4, 5).reshape(b, r, t, c)

        qr, kr, vr = regionize(q), regionize(k), regionize(v)
        # region-level routing
        q_reg = qr.mean(axis=2)  # (B,R,C)
        k_reg = kr.mean(axis=2)
        aff = jnp.einsum("brc,bsc->brs", q_reg, k_reg)
        topk = min(self.topk, r)
        _, idx = jax.lax.top_k(aff, topk)  # (B,R,topk)
        # gather K/V of routed regions: (B,R,topk*T,C)
        def gather(z):
            zt = jnp.take_along_axis(z[:, None], idx[..., None, None], axis=2)
            return zt.reshape(b, r, topk * t, c)

        kg, vg = gather(kr), gather(vr)
        qh = qr.reshape(b, r, t, nh, c // nh)
        kh = kg.reshape(b, r, topk * t, nh, c // nh)
        vh = vg.reshape(b, r, topk * t, nh, c // nh)
        att = jnp.einsum("brqhd,brkhd->brhqk", qh, kh) / np.sqrt(c // nh)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("brhqk,brkhd->brqhd", att, vh).reshape(b, r, t, c)
        y = y.reshape(b, nwin, nwin, hw, ww, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, name="wo")(y + lce)
