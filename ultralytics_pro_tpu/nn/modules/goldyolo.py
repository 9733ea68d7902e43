"""Gold-YOLO gather-and-distribute neck — flax.linen, NHWC.

Behavioral parity with the reference gold-yolo blocks (ultralytics/nn/modules/
block.py: RepVGGBlock:2816, SimFusion_3in:2960, SimFusion_4in:2983, IFM:3004,
InjectionMultiSum_Auto_pool:3027, PyramidPoolAgg:3080, TopBasicLayer:3215,
AdvPoolFusion:3238, SimSPPF:3253, SimConv:3269, RepBlock:3293), redesigned
NHWC: adaptive-avg-pool becomes a strided reduce_window sized from the static
shapes, and the low-res transformer (TopBasicLayer) runs its attention as
plain batched matmuls over the pooled tokens.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase, RepConv


def adaptive_avg_pool(x, out_hw):
    """NHWC adaptive average pool to a static output size (torch
    F.adaptive_avg_pool2d equivalent; shapes here are always clean multiples
    in these necks, so the strided-window formulation is exact)."""
    b, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (oh, ow) == (h, w):
        return x
    sh, sw = h // oh, w // ow
    kh, kw = h - (oh - 1) * sh, w - (ow - 1) * sw
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, kh, kw, 1), (1, sh, sw, 1), "VALID",
    )
    return s / (kh * kw)


def upsample_to(x, out_hw, method: str = "bilinear"):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, int(out_hw[0]), int(out_hw[1]), c), method=method)


def relu(x):
    return jax.nn.relu(x)


class SimConv(ConvBase):
    """Conv + BN + ReLU (reference block.py:3269)."""

    c2: int = 0
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Conv(c2=self.c2, k=self.k, s=self.s, act=relu, dtype=self.dtype,
                    name="conv")(x, train)


class RepVGGBlock(ConvBase):
    """Rep-style 3x3+1x1+identity block with ReLU (reference block.py:2816) —
    the same re-param structure as RepConv, ReLU activation."""

    c2: int = 0
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return RepConv(c2=self.c2, k=3, s=self.s, act=relu, bn_identity=True,
                       dtype=self.dtype, name="rep")(x, train)


class RepBlock(ConvBase):
    """n chained RepVGGBlocks (reference block.py:3293)."""

    c2: int = 0
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = RepVGGBlock(c2=self.c2, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n - 1):
            x = RepVGGBlock(c2=self.c2, dtype=self.dtype, name=f"block_{i}")(x, train)
        return x


class SimSPPF(ConvBase):
    """SPPF with ReLU convs (reference block.py:3253)."""

    c2: int = 0
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.conv import max_pool_same

        c_ = x.shape[-1] // 2
        x = SimConv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        y1 = max_pool_same(x, self.k)
        y2 = max_pool_same(y1, self.k)
        y3 = max_pool_same(y2, self.k)
        return SimConv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], -1), train)


class SimFusion_3in(ConvBase):
    """Fuse P(n-1)/P(n)/P(n+1) at the middle scale (reference block.py:2960):
    avg-pool the finer map, bilinear-upsample the coarser, 1x1-ReLU embed each
    (identity when channels already match), concat, fuse conv."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = x[1].shape[1:3]
        x0 = adaptive_avg_pool(x[0], hw)
        if x0.shape[-1] != self.c2:
            x0 = SimConv(c2=self.c2, k=1, dtype=self.dtype, name="cv1")(x0, train)
        x1 = x[1]
        if x1.shape[-1] != self.c2:
            x1 = SimConv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(x1, train)
        x2 = upsample_to(x[2], hw)
        if x2.shape[-1] != self.c2:
            x2 = SimConv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(x2, train)
        return SimConv(c2=self.c2, k=1, dtype=self.dtype, name="cv_fuse")(
            jnp.concatenate([x0, x1, x2], -1), train)


class SimFusion_4in(ConvBase):
    """Pool/upsample 4 levels to the 3rd's size and concat (block.py:2983)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_l, x_m, x_s, x_n = x
        hw = x_s.shape[1:3]
        return jnp.concatenate([
            adaptive_avg_pool(x_l, hw), adaptive_avg_pool(x_m, hw), x_s,
            upsample_to(x_n, hw),
        ], -1)


class IFM(ConvBase):
    """Information fusion: Conv -> n RepVGG -> Conv(sum(ouc)) (block.py:3004)."""

    ouc: Tuple[int, ...] = (64, 32)
    embed_dim_p: int = 96
    fuse_block_num: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(c2=self.embed_dim_p, dtype=self.dtype, name="conv_in")(x, train)
        for i in range(self.fuse_block_num):
            x = RepVGGBlock(c2=self.embed_dim_p, dtype=self.dtype, name=f"rep_{i}")(x, train)
        return Conv(c2=sum(self.ouc), dtype=self.dtype, name="conv_out")(x, train)


class InjectionMultiSum_Auto_pool(ConvBase):
    """Inject a slice of the global IFM stream into a local map
    (block.py:3027): local*hsigmoid(global_act) + global_feat, with the global
    stream pooled or upsampled to the local size."""

    c2: int = 0
    global_inp: Tuple[int, ...] = (64, 32)
    flag: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_l, x_g = x
        h, w = x_l.shape[1:3]
        start = sum(self.global_inp[: self.flag])
        g = x_g[..., start:start + self.global_inp[self.flag]]

        local_feat = Conv(c2=self.c2, k=1, act=False, dtype=self.dtype, name="local_embedding")(x_l, train)
        global_act = Conv(c2=self.c2, k=1, act=False, dtype=self.dtype, name="global_act")(g, train)
        global_feat = Conv(c2=self.c2, k=1, act=False, dtype=self.dtype, name="global_embedding")(g, train)

        if h < g.shape[1]:  # local is coarser -> pool the global stream
            # NOTE: the reference skips h_sigmoid on this branch
            # (block.py:3060-3063) — replicated faithfully
            sig_act = adaptive_avg_pool(global_act, (h, w))
            global_feat = adaptive_avg_pool(global_feat, (h, w))
        else:
            sig_act = upsample_to(jax.nn.relu6(global_act + 3.0) / 6.0, (h, w))
            global_feat = upsample_to(global_feat, (h, w))
        return local_feat * sig_act + global_feat


class PyramidPoolAgg(ConvBase):
    """Pool every level to (H-1)//stride+1 of the coarsest and concat
    (block.py:3080)."""

    c2: int = 0
    stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x[-1].shape[1:3]
        oh = (h - 1) // self.stride + 1
        ow = (w - 1) // self.stride + 1
        out = [adaptive_avg_pool(xi, (oh, ow)) for xi in x]
        return Conv(c2=self.c2, dtype=self.dtype, name="conv")(
            jnp.concatenate(out, -1), train)


class TopBasicLayer(ConvBase):
    """Transformer over the pooled pyramid tokens (block.py:3215): block_num x
    (conv-QKV attention + ReLU6 conv-MLP), then 1x1 conv to sum(ouc)."""

    ouc: Tuple[int, ...] = (64, 128)
    block_num: int = 2
    key_dim: int = 8
    num_heads: int = 4
    mlp_ratio: float = 4.0
    attn_ratio: float = 2.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, dim = x.shape
        nh, kd = self.num_heads, self.key_dim
        d = int(self.attn_ratio * kd)
        for i in range(self.block_num):
            # attention (reference Attention block.py:3158): 1x1 conv q/k/v
            q = Conv(c2=nh * kd, k=1, act=False, dtype=self.dtype, name=f"b{i}_to_q")(x, train)
            k = Conv(c2=nh * kd, k=1, act=False, dtype=self.dtype, name=f"b{i}_to_k")(x, train)
            v = Conv(c2=nh * d, k=1, act=False, dtype=self.dtype, name=f"b{i}_to_v")(x, train)
            q = q.reshape(b, h * w, nh, kd).transpose(0, 2, 1, 3)
            k = k.reshape(b, h * w, nh, kd).transpose(0, 2, 3, 1)
            v = v.reshape(b, h * w, nh, d).transpose(0, 2, 1, 3)
            attn = jax.nn.softmax((q @ k) * (kd ** -0.5), axis=-1)
            o = (attn @ v).transpose(0, 2, 1, 3).reshape(b, h, w, nh * d)
            o = Conv(c2=dim, k=1, act=False, dtype=self.dtype, name=f"b{i}_proj")(
                jax.nn.relu6(o), train)
            x = x + o
            # conv MLP (reference Mlp block.py:3130)
            hdim = int(dim * self.mlp_ratio)
            m = Conv(c2=hdim, k=1, act=False, dtype=self.dtype, name=f"b{i}_fc1")(x, train)
            m = nn.Conv(hdim, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=hdim,
                        dtype=self.dtype, name=f"b{i}_dw")(m)
            m = jax.nn.relu6(m)
            m = Conv(c2=dim, k=1, act=False, dtype=self.dtype, name=f"b{i}_fc2")(m, train)
            x = x + m
        return nn.Conv(sum(self.ouc), (1, 1), dtype=self.dtype, name="conv_out")(x)


class AdvPoolFusion(ConvBase):
    """Pool x1 to x2's size and concat (block.py:3238)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1, x2 = x
        return jnp.concatenate([adaptive_avg_pool(x1, x2.shape[1:3]), x2], -1)
