"""YOLOv13 blocks: hypergraph correlation enhancement + FullPAD — flax, NHWC.

Behavioral parity with the reference v13 modules (ultralytics/nn/modules/
block.py: AdaHyperedgeGen:~7150, AdaHGConv, AdaHGComputation, C3AH,
FuseModule, HyperACE:7356, DownsampleConv:7411, FullPAD_Tunnel:7445,
DSBottleneck/DSC3k/DSC3k2:7018), redesigned channel-last. The hypergraph
message passing is three batched matmuls (participation A: nodes->edges->
nodes) — pure MXU work.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase


from ultralytics_pro_tpu.nn.modules.attention import DSConv  # dw+pw (conv.py:2110)


class DSBottleneck(ConvBase):
    """DSConv k1 -> DSConv k2 with optional residual (block.py DSBottleneck)."""

    c2: int = 0
    shortcut: bool = True
    e: float = 0.5
    k1: int = 3
    k2: int = 5
    d2: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = DSConv(c2=c_, k=self.k1, dtype=self.dtype, name="cv1")(x, train)
        # d2 is 1 in every bundled config; attention.DSConv has no dilation
        y = DSConv(c2=self.c2, k=self.k2, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class DSC3k(ConvBase):
    """C3 over DSBottlenecks (block.py DSC3k)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    k1: int = 3
    k2: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = DSBottleneck(c2=c_, shortcut=self.shortcut, e=1.0, k1=self.k1,
                             k2=self.k2, dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], -1), train)


class DSC3k2(ConvBase):
    """C3k2 variant whose bottlenecks are depthwise-separable (block.py
    DSC3k2): split, chain of DSC3k (c3k=True) or DSBottleneck, dense concat."""

    c2: int = 0
    n: int = 1
    dsc3k: bool = False
    e: float = 0.5
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c2=2 * c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        parts = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            if self.dsc3k:
                parts.append(DSC3k(c2=c_, n=2, shortcut=self.shortcut, dtype=self.dtype,
                                   name=f"m_{i}")(parts[-1], train))
            else:
                parts.append(DSBottleneck(c2=c_, shortcut=self.shortcut, dtype=self.dtype,
                                          name=f"m_{i}")(parts[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, -1), train)


class AdaHGComputation(ConvBase):
    """Adaptive hypergraph convolution over flattened tokens (block.py
    AdaHyperedgeGen + AdaHGConv + AdaHGComputation): context-conditioned
    hyperedge prototypes -> participation A (softmax over NODES) -> edge
    aggregation -> node dissemination, residual."""

    num_hyperedges: int = 8
    num_heads: int = 4
    context: str = "both"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh, ne = self.num_heads, self.num_hyperedges
        hd = c // nh
        tokens = x.reshape(b, h * w, c)

        # --- AdaHyperedgeGen
        proto_base = self.param("prototype_base", nn.initializers.xavier_uniform(), (ne, c))
        if self.context == "mean":
            ctxv = tokens.mean(1)
        elif self.context == "max":
            ctxv = tokens.max(1)
        else:
            ctxv = jnp.concatenate([tokens.mean(1), tokens.max(1)], -1)
        offsets = nn.Dense(ne * c, dtype=self.dtype, name="context_net")(ctxv).reshape(b, ne, c)
        protos = proto_base[None] + offsets
        xp = nn.Dense(c, dtype=self.dtype, name="pre_head_proj")(tokens)
        xh = xp.reshape(b, -1, nh, hd)
        ph = protos.reshape(b, ne, nh, hd)
        logits = jnp.einsum("bnhd,behd->bhne", xh, ph) / math.sqrt(hd)
        A = jax.nn.softmax(logits.mean(1), axis=1)  # (B, N, E), softmax over nodes

        # --- AdaHGConv
        He = jnp.einsum("bne,bnc->bec", A, tokens)
        He = jax.nn.gelu(nn.Dense(c, dtype=self.dtype, name="edge_proj")(He))
        Xn = jnp.einsum("bne,bec->bnc", A, He)
        Xn = jax.nn.gelu(nn.Dense(c, dtype=self.dtype, name="node_proj")(Xn))
        return (Xn + tokens).reshape(b, h, w, c)


class C3AH(ConvBase):
    """CSP block around AdaHGComputation (block.py C3AH)."""

    c2: int = 0
    e: float = 1.0
    num_hyperedges: int = 8
    context: str = "both"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        c_ = max(16, (c_ // 16) * 16)  # AdaHG head_dim=16 divisibility
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        a = AdaHGComputation(num_hyperedges=self.num_hyperedges, num_heads=c_ // 16,
                             context=self.context, dtype=self.dtype, name="m")(a, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], -1), train)


class HyperACE(ConvBase):
    """Hypergraph-based Adaptive Correlation Enhancement (block.py:7356):
    fuse P3/P4/P5 at the middle scale, split 3 ways, two C3AH hypergraph
    branches + a DS low-order chain, concat, project."""

    c2: int = 0
    n: int = 1
    num_hyperedges: int = 8
    dsc3k: bool = True
    shortcut: bool = False
    e1: float = 0.5
    e2: float = 1.0
    context: str = "both"
    channel_adjust: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # FuseModule: avg-pool P3, upsample P5, concat at P4 scale
        p3, p4, p5 = feats
        p3d = jax.lax.reduce_window(p3, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        b, h, w, _ = p4.shape
        p5u = jax.image.resize(p5, (b, h, w, p5.shape[-1]), "nearest")
        fused = Conv(c2=p4.shape[-1], k=1, dtype=self.dtype, name="fuse_conv")(
            jnp.concatenate([p3d, p4, p5u], -1), train)

        c = int(self.c2 * self.e1)
        y = Conv(c2=3 * c, k=1, dtype=self.dtype, name="cv1")(fused, train)
        y0, y1, y2 = jnp.split(y, 3, axis=-1)
        out1 = C3AH(c2=c, e=self.e2, num_hyperedges=self.num_hyperedges,
                    context=self.context, dtype=self.dtype, name="branch1")(y1, train)
        out2 = C3AH(c2=c, e=self.e2, num_hyperedges=self.num_hyperedges,
                    context=self.context, dtype=self.dtype, name="branch2")(y1, train)
        parts = [y0, out1, y2]
        last = y2
        for i in range(self.n):
            if self.dsc3k:
                last = DSC3k(c2=c, n=2, shortcut=self.shortcut, k1=3, k2=7,
                             dtype=self.dtype, name=f"m_{i}")(last, train)
            else:
                last = DSBottleneck(c2=c, shortcut=self.shortcut, dtype=self.dtype,
                                    name=f"m_{i}")(last, train)
            parts.append(last)
        parts.append(out2)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, -1), train)


class DownsampleConv(ConvBase):
    """2x avg-pool + optional channel-doubling 1x1 (block.py:7411)."""

    channel_adjust: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        if self.channel_adjust:
            y = Conv(c2=x.shape[-1] * 2, k=1, dtype=self.dtype, name="channel_adjust")(y, train)
        return y


class FullPAD_Tunnel(ConvBase):
    """Gated residual fusion: x0 + gate * x1 (block.py:7445)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        gate = self.param("gate", nn.initializers.zeros, ())
        return x[0] + gate * x[1]
