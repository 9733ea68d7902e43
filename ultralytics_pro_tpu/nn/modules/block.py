"""Core building blocks — flax.linen, NHWC.

Behavioral parity with the reference block zoo (ultralytics/nn/modules/block.py):
DFL:232, Proto:257, SPP:359, SPPF:382, C1:409, C2:431, C2f:457, C3:509,
Bottleneck:644, BottleneckCSP:689, GhostBottleneck, C3k2:1485, PSA:1774,
C2PSA:1829, SCDown:1923, Attention (v10_Attention:1668), CIB/C2fCIB:1592,1637.

Design: channel-last, lazy input channels, bottleneck splits done with
jnp.split/concat which XLA fuses away; attention blocks batch their matmuls
so they land on the MXU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import (
    Conv,
    ConvBase,
    DWConv,
    GhostConv,
    LightConv,
    apply_act,
    max_pool_same,
)


class Bottleneck(ConvBase):
    """Standard bottleneck with optional residual (reference block.py:644)."""

    c2: int = 0
    shortcut: bool = True
    g: int = 1
    k: Any = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c2=c_, k=self.k[0], s=1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(c2=self.c2, k=self.k[1], s=1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class C1(ConvBase):
    """CSP bottleneck with 1 conv (reference block.py:409)."""

    c2: int = 0
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv1")(x, train)
        z = y
        for i in range(self.n):
            z = Conv(c2=self.c2, k=3, dtype=self.dtype, name=f"m_{i}")(z, train)
        return z + y


class C2(ConvBase):
    """CSP bottleneck with 2 convs (reference block.py:431)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            a = Bottleneck(c2=c, shortcut=self.shortcut, g=self.g, k=(3, 3), e=1.0,
                           dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], -1), train)


class C2f(ConvBase):
    """Faster CSP bottleneck w/ 2 convs and n cross-connected bottlenecks
    (reference block.py:457) — the YOLOv8 workhorse."""

    c2: int = 0
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    def inner(self, c: int, i: int):
        return Bottleneck(c2=c, shortcut=self.shortcut, g=self.g, k=(3, 3), e=1.0,
                          dtype=self.dtype, name=f"m_{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(self.inner(c, i)(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class C3(ConvBase):
    """CSP bottleneck with 3 convs (reference block.py:509)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: Any = ((1, 1), (3, 3))  # bottleneck kernels; C3k overrides

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c2=c_, shortcut=self.shortcut, g=self.g, k=self.k, e=1.0,
                           dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class C3k(C3):
    """C3 with configurable bottleneck kernel size k (reference block.py C3k)."""

    kk: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c2=c_, shortcut=self.shortcut, g=self.g, k=(self.kk, self.kk), e=1.0,
                           dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class C3k2(C2f):
    """YOLO11 block: C2f whose inner blocks are C3k when c3k=True (reference block.py:1485)."""

    c3k: bool = False

    def inner(self, c: int, i: int):
        if self.c3k:
            return C3k(c2=c, n=2, shortcut=self.shortcut, g=self.g, dtype=self.dtype, name=f"m_{i}")
        return Bottleneck(c2=c, shortcut=self.shortcut, g=self.g, k=(3, 3), e=1.0,
                          dtype=self.dtype, name=f"m_{i}")


class SPP(ConvBase):
    """Spatial pyramid pooling (reference block.py:359)."""

    c2: int = 0
    k: Any = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        pools = [max_pool_same(y, k) for k in self.k]
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate([y, *pools], -1), train)


class SPPF(ConvBase):
    """Fast SPP: 3 cascaded k-pools == SPP(5,9,13) (reference block.py:382)."""

    c2: int = 0
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        y1 = max_pool_same(y, self.k)
        y2 = max_pool_same(y1, self.k)
        y3 = max_pool_same(y2, self.k)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([y, y1, y2, y3], -1), train
        )


class GhostBottleneck(ConvBase):
    """Ghost bottleneck (reference block.py GhostBottleneck)."""

    c2: int = 0
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c2=c_, k=1, s=1, dtype=self.dtype, name="gc1")(x, train)
        if self.s == 2:
            y = DWConv(c2=c_, k=self.k, s=self.s, act=False, dtype=self.dtype, name="dw")(y, train)
        y = GhostConv(c2=self.c2, k=1, s=1, act=False, dtype=self.dtype, name="gc2")(y, train)
        if self.s == 2:
            sc = DWConv(c2=x.shape[-1], k=self.k, s=self.s, act=False, dtype=self.dtype, name="sc_dw")(x, train)
            sc = Conv(c2=self.c2, k=1, act=False, dtype=self.dtype, name="sc_pw")(sc, train)
        else:
            sc = x if x.shape[-1] == self.c2 else Conv(c2=self.c2, k=1, act=False, dtype=self.dtype, name="sc_pw")(x, train)
        return y + sc


class C3Ghost(C3):
    """C3 with GhostBottleneck inner blocks."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = GhostBottleneck(c2=c_, k=3, s=1, dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class BottleneckCSP(ConvBase):
    """Original CSP bottleneck (reference block.py:689)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c2=c_, shortcut=self.shortcut, g=self.g, e=1.0,
                           dtype=self.dtype, name=f"m_{i}")(a, train)
        a = nn.Conv(features=c_, kernel_size=(1, 1), use_bias=False, dtype=self.dtype, name="cv3")(a)
        b = nn.Conv(features=c_, kernel_size=(1, 1), use_bias=False, dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([a, b], -1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, use_fast_variance=False,
                         dtype=self.dtype, name="bn")(y)
        y = jax.nn.silu(y)  # the fork's variant uses SiLU (block.py:710)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv4")(y, train)


class DFL(ConvBase):
    """Distribution-Focal-Loss decode: softmax expectation over reg_max bins.

    Reference (block.py:232) realizes this as a frozen 1x1 conv; on TPU it is a
    softmax + dot with arange, fused by XLA.
    Input (B, A, 4*reg_max) -> output (B, A, 4).
    """

    reg_max: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, a, _ = x.shape
        x = x.reshape(b, a, 4, self.reg_max)
        probs = jax.nn.softmax(x, axis=-1)
        bins = jnp.arange(self.reg_max, dtype=probs.dtype)
        return jnp.einsum("bacr,r->bac", probs, bins)


class Proto(ConvBase):
    """Segmentation mask prototypes (reference block.py:257)."""

    c_: int = 256
    c2: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(c2=self.c_, k=3, dtype=self.dtype, name="cv1")(x, train)
        x = nn.ConvTranspose(
            features=self.c_, kernel_size=(2, 2), strides=(2, 2), padding="VALID",
            use_bias=True, transpose_kernel=True, dtype=self.dtype, name="upsample",
        )(x)
        x = Conv(c2=self.c_, k=3, dtype=self.dtype, name="cv2")(x, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(x, train)


class Attention(ConvBase):
    """Multi-head self-attention over the spatial map w/ depthwise positional
    encoding (reference block.py v10_Attention:1668). Matmuls are batched
    (B*heads, N, d) so they tile onto the MXU."""

    dim: int = 0
    num_heads: int = 8
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        nh_kd = key_dim * self.num_heads
        qkv = Conv(c2=self.dim + nh_kd * 2, k=1, act=False, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(b, n, self.num_heads, key_dim * 2 + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, key_dim * 2], axis=-1)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h, w, self.dim)
        pe = Conv(c2=self.dim, k=3, g=self.dim, act=False, dtype=self.dtype, name="pe")(
            v.reshape(b, h, w, self.dim), train
        )
        return Conv(c2=self.dim, k=1, act=False, dtype=self.dtype, name="proj")(out + pe, train)


class PSABlock(ConvBase):
    """Attention + FFN with residuals (reference block.py PSABlock)."""

    c: int = 0
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Attention(dim=self.c, num_heads=self.num_heads, attn_ratio=self.attn_ratio,
                      dtype=self.dtype, name="attn")(x, train)
        x = x + y if self.shortcut else y
        f = Conv(c2=self.c * 2, k=1, dtype=self.dtype, name="ffn_0")(x, train)
        f = Conv(c2=self.c, k=1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        return x + f if self.shortcut else f


class PSA(ConvBase):
    """Position-sensitive attention block (reference block.py:1774)."""

    c2: int = 0
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        b = b + Attention(dim=c, num_heads=c // 64, attn_ratio=0.5, dtype=self.dtype, name="attn")(b, train)
        f = Conv(c2=c * 2, k=1, dtype=self.dtype, name="ffn_0")(b, train)
        f = Conv(c2=c, k=1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        b = b + f
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], -1), train)


class C2PSA(ConvBase):
    """CSP wrapper around n PSABlocks (reference block.py:1829). Requires c1==c2."""

    c2: int = 0
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            b = PSABlock(c=c, attn_ratio=0.5, num_heads=max(1, c // 64), dtype=self.dtype, name=f"m_{i}")(b, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], -1), train)


class SCDown(ConvBase):
    """Separable downsample: 1x1 pointwise then k-stride depthwise (reference block.py:1923)."""

    c2: int = 0
    k: int = 3
    s: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv1")(x, train)
        return Conv(c2=self.c2, k=self.k, s=self.s, g=self.c2, act=False, dtype=self.dtype, name="cv2")(x, train)


class CIB(ConvBase):
    """Conditional identity block, YOLOv10 (reference block.py:1592)."""

    c2: int = 0
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c2=c1, k=3, g=c1, dtype=self.dtype, name="cv1_0")(x, train)
        y = Conv(c2=2 * c_, k=1, dtype=self.dtype, name="cv1_1")(y, train)
        y = Conv(c2=2 * c_, k=3, g=2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv1_3")(y, train)
        y = Conv(c2=self.c2, k=3, g=self.c2, dtype=self.dtype, name="cv1_4")(y, train)
        if self.shortcut and c1 == self.c2:
            return x + y
        return y


class C2fCIB(C2f):
    """C2f with CIB inner blocks, YOLOv10 (reference block.py:1637)."""

    lk: bool = False

    def inner(self, c: int, i: int):
        return CIB(c2=c, shortcut=self.shortcut, e=1.0, lk=self.lk, dtype=self.dtype, name=f"m_{i}")


class HGStem(ConvBase):
    """PPHGNetV2 stem with 5 convs and a maxpool branch (reference block.py:279)."""

    cm: int = 0
    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        relu = jax.nn.relu
        x = Conv(c2=self.cm, k=3, s=2, act=relu, dtype=self.dtype, name="stem1")(x, train)
        # stem2a/2b use k=2 with asymmetric pad (0,1,0,1)
        x2 = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = Conv(c2=self.cm // 2, k=2, s=1, p=0, act=relu, dtype=self.dtype, name="stem2a")(x2, train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = Conv(c2=self.cm, k=2, s=1, p=0, act=relu, dtype=self.dtype, name="stem2b")(x2, train)
        x1 = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 1, 1, 1),
            ((0, 0), (0, 1), (0, 1), (0, 0)),
        )
        x = jnp.concatenate([x1, x2], axis=-1)
        x = Conv(c2=self.cm, k=3, s=2, act=relu, dtype=self.dtype, name="stem3")(x, train)
        return Conv(c2=self.c2, k=1, s=1, act=relu, dtype=self.dtype, name="stem4")(x, train)


class HGBlock(ConvBase):
    """PPHGNetV2 HG_Block: n cascaded convs, concat, squeeze+excite convs
    (reference block.py:315)."""

    cm: int = 0
    c2: int = 0
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    act: Any = jax.nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        ys = [x]
        for i in range(self.n):
            if self.lightconv:
                y = LightConv(c2=self.cm, k=self.k, dtype=self.dtype, name=f"m_{i}")(ys[-1], train)
            else:
                y = Conv(c2=self.cm, k=self.k, act=self.act, dtype=self.dtype, name=f"m_{i}")(ys[-1], train)
            ys.append(y)
        y = jnp.concatenate(ys, axis=-1)
        y = Conv(c2=self.c2 // 2, k=1, act=self.act, dtype=self.dtype, name="sc")(y, train)
        y = Conv(c2=self.c2, k=1, act=self.act, dtype=self.dtype, name="ec")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class ResNetBlock(ConvBase):
    """ResNet block with standard convs (reference block.py ResNetBlock)."""

    c2: int = 0
    s: int = 1
    e: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3 = self.e * self.c2
        relu = jax.nn.relu
        y = Conv(c2=self.c2, k=1, s=1, act=relu, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(c2=self.c2, k=3, s=self.s, act=relu, dtype=self.dtype, name="cv2")(y, train)
        y = Conv(c2=c3, k=1, act=False, dtype=self.dtype, name="cv3")(y, train)
        if self.s != 1 or x.shape[-1] != c3:
            x = Conv(c2=c3, k=1, s=self.s, act=False, dtype=self.dtype, name="shortcut")(x, train)
        return relu(x + y)


class ResNetLayer(ConvBase):
    """ResNet stage (reference block.py:822)."""

    c2: int = 0
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.is_first:
            x = Conv(c2=self.c2, k=7, s=2, p=3, act=jax.nn.relu, dtype=self.dtype, name="stem")(x, train)
            return max_pool_same(x, 3, 2)
        x = ResNetBlock(c2=self.c2, s=self.s, e=self.e, dtype=self.dtype, name="b0")(x, train)
        for i in range(1, self.n):
            x = ResNetBlock(c2=self.c2, s=1, e=self.e, dtype=self.dtype, name=f"b{i}")(x, train)
        return x


class RepC3(ConvBase):
    """C3 with RepConv inner blocks (reference block.py RepC3, used by RT-DETR
    CCFF neck)."""

    c2: int = 0
    n: int = 3
    e: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.conv import RepConv

        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = RepConv(c2=c_, k=3, dtype=self.dtype, name=f"m_{i}")(a, train)
        y = a + b
        if c_ != self.c2:
            y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(y, train)
        return y


def _bn(name: str, dtype, x, train: bool):
    from ultralytics_pro_tpu.nn.modules.conv import BN_EPS, BN_MOMENTUM

    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, use_fast_variance=False, dtype=dtype,
                        name=name)(x)


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class BottleneckCSP2(ConvBase):
    """CSPNet v2 variant with Mish merge (fork reference block.py:720):
    hidden = c2 (no expansion), both branches from cv1."""

    c2: int = 0
    n: int = 1
    shortcut: bool = False
    g: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2)
        x1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        y1 = x1
        for i in range(self.n):
            y1 = Bottleneck(c2=c_, shortcut=self.shortcut, g=self.g, e=1.0,
                            dtype=self.dtype, name=f"m_{i}")(y1, train)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv2")(x1)
        y = _mish(_bn("bn", self.dtype, jnp.concatenate([y1, y2], -1), train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(y, train)


class SPPCSPC(ConvBase):
    """CSP-wrapped SPP, YOLOv7/v4 neck centerpiece (fork reference
    block.py:2366)."""

    c2: int = 0
    e: float = 0.5
    k: Any = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(2 * self.c2 * self.e)
        x1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        x1 = Conv(c2=c_, k=3, dtype=self.dtype, name="cv3")(x1, train)
        x1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv4")(x1, train)
        pools = [max_pool_same(x1, kk) for kk in self.k]
        y1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv5")(
            jnp.concatenate([x1, *pools], -1), train)
        y1 = Conv(c2=c_, k=3, dtype=self.dtype, name="cv6")(y1, train)
        y2 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv7")(
            jnp.concatenate([y1, y2], -1), train)


class SPPFCSPC(ConvBase):
    """SPPCSPC with cascaded single-k pooling (fork reference block.py:2387)."""

    c2: int = 0
    e: float = 0.5
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(2 * self.c2 * self.e)
        x1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        x1 = Conv(c2=c_, k=3, dtype=self.dtype, name="cv3")(x1, train)
        x1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv4")(x1, train)
        p1 = max_pool_same(x1, self.k)
        p2 = max_pool_same(p1, self.k)
        p3 = max_pool_same(p2, self.k)
        y1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv5")(
            jnp.concatenate([x1, p1, p2, p3], -1), train)
        y1 = Conv(c2=c_, k=3, dtype=self.dtype, name="cv6")(y1, train)
        y2 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv7")(
            jnp.concatenate([y1, y2], -1), train)


class C3x(C3):
    """C3 with cross convolutions — bottleneck kernels (1,3)/(3,1)
    (reference block.py:535)."""

    k: Any = ((1, 3), (3, 1))


class C3TR(ConvBase):
    """C3 whose bottleneck chain is a TransformerBlock (reference
    block.py:578): learned positional embedding + n MHSA/MLP layers."""

    c2: int = 0
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        bb, h, w, c = a.shape
        t = a.reshape(bb, h * w, c)
        t = t + nn.Dense(c, dtype=self.dtype, name="pos")(t)  # learned pos (ref conv embed)
        heads = max(c // 32, 1)
        for i in range(self.n):
            q = nn.SelfAttention(num_heads=heads, dtype=self.dtype, name=f"attn_{i}")(t)
            t = t + q
            m = nn.Dense(4 * c, dtype=self.dtype, name=f"fc1_{i}")(t)
            t = t + nn.Dense(c, dtype=self.dtype, name=f"fc2_{i}")(jax.nn.gelu(m))
        a = t.reshape(bb, h, w, c)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)
