"""YOLOv9 / v10 / v12 module families.

Behavioral parity with the reference blocks (ultralytics/nn/modules/block.py:
RepNCSPELAN4:1278, ELAN1:1347, ADown:1368, SPPELAN:1388, CBLinear:1408,
CBFuse:1431; v10 CIB/C2fCIB live in block.py; v12 AAttn:2034, ABlock:2117,
A2C2f:2181) and the v10Detect head (head.py:2227).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.block import C3
from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase, RepConv, max_pool_same


class RepNBottleneck(ConvBase):
    """Bottleneck with a RepConv first conv (reference block.py RepNBottleneck)."""

    c2: int = 0
    shortcut: bool = True
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = RepConv(c2=c_, k=self.k[0], dtype=self.dtype, name="cv1")(x, train)
        y = Conv(c2=self.c2, k=self.k[1], dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class RepNCSP(ConvBase):
    """C3-style CSP with RepNBottlenecks (reference block.py RepNCSP)."""

    c2: int = 0
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = RepNBottleneck(c2=c_, e=1.0, dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class RepNCSPELAN4(ConvBase):
    """GELAN block (reference block.py:1278). args: c2, c3, c4, n."""

    c2: int = 0
    c3: int = 0
    c4: int = 0
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(c2=self.c3, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        z = RepNCSP(c2=self.c4, n=self.n, dtype=self.dtype, name="cv2_csp")(ys[-1], train)
        z = Conv(c2=self.c4, k=3, dtype=self.dtype, name="cv2_conv")(z, train)
        ys.append(z)
        z = RepNCSP(c2=self.c4, n=self.n, dtype=self.dtype, name="cv3_csp")(z, train)
        z = Conv(c2=self.c4, k=3, dtype=self.dtype, name="cv3_conv")(z, train)
        ys.append(z)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv4")(jnp.concatenate(ys, -1), train)


class ELAN1(ConvBase):
    """Simplified ELAN (reference block.py:1347). args: c2, c3, c4."""

    c2: int = 0
    c3: int = 0
    c4: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(c2=self.c3, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        ys.append(Conv(c2=self.c4, k=3, dtype=self.dtype, name="cv2")(ys[-1], train))
        ys.append(Conv(c2=self.c4, k=3, dtype=self.dtype, name="cv3")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv4")(jnp.concatenate(ys, -1), train)


class ADown(ConvBase):
    """Asymmetric downsample: avg-pool+conv3x3s2 on one half, max-pool+conv1x1
    on the other (reference block.py:1368)."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 2
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1), ((0, 0), (0, 1), (0, 1), (0, 0))
        ) / 4.0  # avg_pool2d(2, 1, 0, ceil) equivalent on same-size grid
        x1, x2 = jnp.split(x, 2, axis=-1)
        x1 = Conv(c2=c, k=3, s=2, dtype=self.dtype, name="cv1")(x1, train)
        x2 = max_pool_same(x2, 3, 2)
        x2 = Conv(c2=c, k=1, dtype=self.dtype, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], -1)


class SPPELAN(ConvBase):
    """SPP-ELAN (reference block.py:1388). args: c2, c3."""

    c2: int = 0
    c3: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = [Conv(c2=self.c3, k=1, dtype=self.dtype, name="cv1")(x, train)]
        for _ in range(3):
            y.append(max_pool_same(y[-1], 5))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv5")(jnp.concatenate(y, -1), train)


class CBLinear(ConvBase):
    """Conv producing a TUPLE of per-branch channel groups (reference
    block.py:1408). args: c2s (list), k, s."""

    c2s: Tuple[int, ...] = ()
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        y = nn.Conv(sum(self.c2s), (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), use_bias=True, dtype=self.dtype, name="conv")(x)
        import numpy as np

        splits = np.cumsum(self.c2s)[:-1].tolist()
        return tuple(jnp.split(y, splits, axis=-1))


class CBFuse(ConvBase):
    """Fuse selected CBLinear outputs (upsampled to the last input's size)
    by summation (reference block.py:1431). args: idx (list)."""

    idx: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, xs, train: bool = False):
        target = xs[-1]
        b, h, w, c = target.shape
        out = target
        for i, x in enumerate(xs[:-1]):
            xi = x[self.idx[i]]
            if xi.shape[1] != h or xi.shape[2] != w:
                xi = jax.image.resize(xi, (xi.shape[0], h, w, xi.shape[-1]), method="nearest")
            out = out + xi
        return out


class AAttn(ConvBase):
    """Area attention (reference block.py:2034): full attention within
    area-partitioned token groups + depthwise positional conv."""

    dim: int = 0
    num_heads: int = 8
    area: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        hd = self.dim // self.num_heads
        qk = Conv(c2=self.dim * 2, k=1, act=False, dtype=self.dtype, name="qk")(x, train)
        v = Conv(c2=self.dim, k=1, act=False, dtype=self.dtype, name="v")(x, train)
        pp = Conv(c2=self.dim, k=7, g=self.dim, act=False, dtype=self.dtype, name="pe")(v, train)

        area = self.area if n % self.area == 0 else 1
        tokens = n // area
        qk_t = qk.reshape(b * area, tokens, 2, self.num_heads, hd)
        q, k = qk_t[:, :, 0], qk_t[:, :, 1]
        v_t = v.reshape(b * area, tokens, self.num_heads, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * hd**-0.5
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v_t).reshape(b, h, w, self.dim)
        return Conv(c2=self.dim, k=1, act=False, dtype=self.dtype, name="proj")(out + pp, train)


class ABlock(ConvBase):
    """Area-attention block: AAttn + conv MLP, residual (reference block.py:2117)."""

    dim: int = 0
    num_heads: int = 8
    mlp_ratio: float = 1.2
    area: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + AAttn(dim=self.dim, num_heads=self.num_heads, area=self.area,
                      dtype=self.dtype, name="attn")(x, train)
        hidden = int(self.dim * self.mlp_ratio)
        y = Conv(c2=hidden, k=1, dtype=self.dtype, name="mlp_0")(x, train)
        y = Conv(c2=self.dim, k=1, act=False, dtype=self.dtype, name="mlp_1")(y, train)
        return x + y


class A2C2f(ConvBase):
    """YOLO12 R-ELAN block (reference block.py:2181). args: c2, a2, area,
    residual, mlp_ratio."""

    c2: int = 0
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    mlp_ratio: float = 2.0
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        num_heads = max(1, c_ // 32)
        y = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y]
        z = y
        for i in range(self.n):
            if self.a2:
                z = ABlock(dim=c_, num_heads=num_heads, mlp_ratio=self.mlp_ratio,
                           area=self.area, dtype=self.dtype, name=f"m_{i}_0")(z, train)
                z = ABlock(dim=c_, num_heads=num_heads, mlp_ratio=self.mlp_ratio,
                           area=self.area, dtype=self.dtype, name=f"m_{i}_1")(z, train)
            else:
                z = C3(c2=c_, n=2, dtype=self.dtype, name=f"m_{i}")(z, train)
            ys.append(z)
        out = Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)
        if self.residual and self.a2 and x.shape[-1] == self.c2:
            gamma = self.param("gamma", nn.initializers.constant(0.01), (self.c2,))
            return x + gamma * out
        return out
