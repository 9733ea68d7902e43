"""EfficientFormerV2 — faithful flax/NHWC implementation.

Parity target: reference `nn/modules/EfficientFormerV2.py` (Attention4D :64,
LGQuery :249, Attention4DDownsample :281, Embedding :444, Mlp :507,
AttnFFN :567, FFN :610, EfficientFormerV2 :691, variants :900-955).
Replaces the round-2 pool-mixer stand-in with the real hybrid architecture:
stages 0-1 are conv-FFN (MetaBlock) stacks, the last `vit_num` blocks of
stages 2-3 are Attention4D mixers with a learned relative-position bias and
talking heads, inter-stage downsampling 2->3 is the attention-substituted
(asub) embedding. All attention matmuls are plain MXU einsums; the RPE gather
is a constant-index table built at trace time from the actual feature
resolution (the reference builds it at init resolution and silently SKIPS the
bias at any other input size — building per-trace is strictly more faithful
to the paper and costs nothing under jit).

Weight import from reference checkpoints: `backbone_import.py`
(`efficientformerv2_state_dict_to_flax`), parity-tested in
tests/test_backbone_import.py.
"""

from __future__ import annotations

import itertools
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.backbones2 import _bn
from ultralytics_pro_tpu.nn.modules.conv import ConvBase

EFV2_WIDTH = {
    "l": (40, 80, 192, 384),
    "s2": (32, 64, 144, 288),
    "s1": (32, 48, 120, 224),
    "s0": (32, 48, 96, 176),
}
EFV2_DEPTH = {
    "l": (5, 5, 15, 10),
    "s2": (4, 4, 12, 8),
    "s1": (3, 3, 9, 6),
    "s0": (2, 2, 6, 4),
}
# per-stage per-block MLP expansion ratios (reference :32-61)
EFV2_ERATIOS = {
    "l": {0: [4] * 5, 1: [4] * 5, 2: [4, 4, 4, 4, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4],
          3: [4, 4, 4, 3, 3, 3, 3, 4, 4, 4]},
    "s2": {0: [4] * 4, 1: [4] * 4, 2: [4, 4, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4],
           3: [4, 4, 3, 3, 3, 3, 4, 4]},
    "s1": {0: [4] * 3, 1: [4] * 3, 2: [4, 4, 3, 3, 3, 3, 4, 4, 4], 3: [4, 4, 3, 3, 4, 4]},
    "s0": {0: [4] * 2, 1: [4] * 2, 2: [4, 3, 3, 3, 4, 4], 3: [4, 3, 3, 4]},
}
EFV2_VIT_NUM = {"s0": 2, "s1": 2, "s2": 4, "l": 6}
EFV2_ACT = {"s0": jax.nn.relu, "s1": jax.nn.relu, "s2": jax.nn.relu, "l": jax.nn.gelu}


def _conv(mod, x, c, k, s, name, groups=1):
    """torch nn.Conv2d(k, stride, padding=k//2, bias=True) equivalent."""
    p = k // 2
    return nn.Conv(c, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                   feature_group_count=groups, use_bias=True, dtype=mod.dtype,
                   name=name, parent=mod)(x)


def _rpe_table(points_q, points_k, scale_y=1.0, scale_x=1.0):
    """First-occurrence offset enumeration, identical to the reference double
    loop (EfficientFormerV2.py:132-143, :336-360) so `attention_biases`
    checkpoints import verbatim. Returns (idx (Nq, Nk) int32, n_offsets)."""
    offsets: dict = {}
    idxs = []
    for p1 in points_q:
        for p2 in points_k:
            off = (math.floor(abs(p1[0] * scale_y - p2[0])),
                   math.floor(abs(p1[1] * scale_x - p2[1])))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return np.asarray(idxs, np.int32).reshape(len(points_q), len(points_k)), len(offsets)


class Attention4D(ConvBase):
    """Spatial MHSA over the (H, W) grid with conv q/k/v, a depthwise local-V
    branch, learned RPE bias and talking heads (reference :64-234). With
    `stride`, attention runs on a 2x-downsampled grid and the result is
    bilinearly upsampled back (the stage-2 "stride attention" trick)."""

    dim: int = 0
    key_dim: int = 32
    num_heads: int = 8
    attn_ratio: int = 4
    stride: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h0, w0, _ = x.shape
        if self.stride:
            x = _conv(self, x, self.dim, 3, self.stride, "stride_conv", groups=self.dim)
            x = _bn(self, "stride_bn", x, train)
        _, h, w, _ = x.shape
        n = h * w
        nh_kd = self.key_dim * self.num_heads
        d = self.attn_ratio * self.key_dim
        dh = d * self.num_heads

        q = _bn(self, "q_bn", _conv(self, x, nh_kd, 1, 1, "q"), train)
        k = _bn(self, "k_bn", _conv(self, x, nh_kd, 1, 1, "k"), train)
        v = _bn(self, "v_bn", _conv(self, x, dh, 1, 1, "v"), train)
        v_local = _bn(self, "v_local_bn",
                      _conv(self, v, dh, 3, 1, "v_local", groups=dh), train)

        # (b, h, w, heads*kd) -> (b, heads, n, kd); torch channel order is
        # head-major so a straight reshape matches the reference flatten
        q = q.reshape(b, n, self.num_heads, self.key_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.num_heads, self.key_dim).transpose(0, 2, 1, 3)
        vv = v.reshape(b, n, self.num_heads, d).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnk,bhmk->bhnm", q, k) * (self.key_dim ** -0.5)

        pts = list(itertools.product(range(h), range(w)))
        idx, n_off = _rpe_table(pts, pts)
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (self.num_heads, n_off))
        attn = attn + biases[:, jnp.asarray(idx)].astype(attn.dtype)

        th1_w = self.param("talking_head1_w", nn.initializers.normal(0.02),
                           (self.num_heads, self.num_heads))
        th1_b = self.param("talking_head1_b", nn.initializers.zeros, (self.num_heads,))
        th2_w = self.param("talking_head2_w", nn.initializers.normal(0.02),
                           (self.num_heads, self.num_heads))
        th2_b = self.param("talking_head2_b", nn.initializers.zeros, (self.num_heads,))
        attn = jnp.einsum("bhnm,gh->bgnm", attn, th1_w.astype(attn.dtype)) + th1_b.astype(attn.dtype)[:, None, None]
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
        attn = jnp.einsum("bhnm,gh->bgnm", attn, th2_w.astype(attn.dtype)) + th2_b.astype(attn.dtype)[:, None, None]

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vv)  # (b, heads, n, d)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, dh)
        out = out + v_local
        out = _bn(self, "proj_bn", _conv(self, out, self.dim, 1, 1, "proj"), train)
        if self.stride:
            out = jax.image.resize(out, (b, h0, w0, self.dim), method="bilinear")
        return out


class LGQuery(ConvBase):
    """Local (DW s2 conv) + global (avg-pool s2) query builder (reference :249)."""

    out_dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        local_q = _conv(self, x, c, 3, 2, "local", groups=c)
        pool_q = nn.avg_pool(x, (2, 2), strides=(2, 2))
        ph = local_q.shape[1] - pool_q.shape[1]
        pw = local_q.shape[2] - pool_q.shape[2]
        if ph or pw:
            pool_q = jnp.pad(pool_q, ((0, 0), (0, ph), (0, pw), (0, 0)))
        q = local_q + pool_q
        return _bn(self, "proj_bn", _conv(self, q, self.out_dim, 1, 1, "proj"), train)


class Attention4DDownsample(ConvBase):
    """Cross-resolution attention: half-res queries attend over full-res
    keys/values, + strided local-V (reference :281-436)."""

    dim: int = 0
    out_dim: int = 0
    key_dim: int = 16
    num_heads: int = 8
    attn_ratio: int = 4
    act: Any = jax.nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        nh_kd = self.key_dim * self.num_heads
        d = self.attn_ratio * self.key_dim
        dh = d * self.num_heads

        q4 = LGQuery(out_dim=nh_kd, dtype=self.dtype, name="q")(x, train)
        hq, wq = q4.shape[1], q4.shape[2]
        nq, nk = hq * wq, h * w

        k = _bn(self, "k_bn", _conv(self, x, nh_kd, 1, 1, "k"), train)
        v = _bn(self, "v_bn", _conv(self, x, dh, 1, 1, "v"), train)
        v_local = _bn(self, "v_local_bn",
                      _conv(self, v, dh, 3, 2, "v_local", groups=dh), train)

        q = q4.reshape(b, nq, self.num_heads, self.key_dim).transpose(0, 2, 1, 3)
        kk = k.reshape(b, nk, self.num_heads, self.key_dim).transpose(0, 2, 1, 3)
        vv = v.reshape(b, nk, self.num_heads, d).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnk,bhmk->bhnm", q, kk) * (self.key_dim ** -0.5)

        pts_q = list(itertools.product(range(hq), range(wq)))
        pts_k = list(itertools.product(range(h), range(w)))
        idx, n_off = _rpe_table(pts_q, pts_k, scale_y=h / hq, scale_x=w / wq)
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (self.num_heads, n_off))
        attn = attn + biases[:, jnp.asarray(idx)].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vv)
        out = out.transpose(0, 2, 1, 3).reshape(b, hq, wq, dh)
        ph = out.shape[1] - v_local.shape[1]
        pw = out.shape[2] - v_local.shape[2]
        if ph or pw:
            v_local = jnp.pad(v_local, ((0, 0), (0, ph), (0, pw), (0, 0)))
        out = out + v_local
        out = self.act(out)
        return _bn(self, "proj_bn", _conv(self, out, self.out_dim, 1, 1, "proj"), train)


class EFV2Mlp(ConvBase):
    """1x1 -> BN -> act -> DW3x3 -> BN -> act -> 1x1 -> BN (reference Mlp :507,
    mid_conv=True always in V2 blocks)."""

    hidden: int = 0
    out: int = 0
    act: Any = jax.nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.act(_bn(self, "norm1", _conv(self, x, self.hidden, 1, 1, "fc1"), train))
        x = self.act(_bn(self, "mid_norm",
                         _conv(self, x, self.hidden, 3, 1, "mid", groups=self.hidden), train))
        return _bn(self, "norm2", _conv(self, x, self.out, 1, 1, "fc2"), train)


class EFV2AttnFFN(ConvBase):
    """x + ls1*Attention4D(x); x + ls2*Mlp(x) (reference AttnFFN :567)."""

    dim: int = 0
    mlp_ratio: int = 4
    stride: int = 0
    act: Any = jax.nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-5), (self.dim,))
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-5), (self.dim,))
        x = x + ls1.astype(x.dtype) * Attention4D(
            dim=self.dim, stride=self.stride, dtype=self.dtype, name="token_mixer")(x, train)
        x = x + ls2.astype(x.dtype) * EFV2Mlp(
            hidden=self.dim * self.mlp_ratio, out=self.dim, act=self.act,
            dtype=self.dtype, name="mlp")(x, train)
        return x


class EFV2FFN(ConvBase):
    """x + ls2*Mlp(x) (reference FFN :610)."""

    dim: int = 0
    mlp_ratio: int = 4
    act: Any = jax.nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-5), (self.dim,))
        return x + ls2.astype(x.dtype) * EFV2Mlp(
            hidden=self.dim * self.mlp_ratio, out=self.dim, act=self.act,
            dtype=self.dtype, name="mlp")(x, train)


class EfficientFormerV2(ConvBase):
    """4-stage hybrid backbone returning the 4 stage maps at /4 /8 /16 /32
    (reference :691, fork_feat layout: per-output BatchNorm)."""

    variant: str = "s0"

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = self.variant
        dims = EFV2_WIDTH[v]
        depths = EFV2_DEPTH[v]
        e_ratios = EFV2_ERATIOS[v]
        vit_num = EFV2_VIT_NUM[v]
        act = EFV2_ACT[v]

        # stem: conv3x3 s2 + BN + act, conv3x3 s2 + BN (reference stem :236)
        x = act(_bn(self, "stem_bn0", _conv(self, x, dims[0] // 2, 3, 2, "stem0"), train))
        x = _bn(self, "stem_bn1", _conv(self, x, dims[0], 3, 2, "stem1"), train)

        outs = []
        for s in range(4):
            for bi in range(depths[s]):
                ratio = e_ratios[s][bi]
                if s >= 2 and bi >= depths[s] - vit_num:
                    stride = 2 if (s == 2 and bi == depths[s] - vit_num) else 0
                    x = EFV2AttnFFN(dim=dims[s], mlp_ratio=ratio, stride=stride,
                                    act=act, dtype=self.dtype, name=f"s{s}_b{bi}")(x, train)
                else:
                    x = EFV2FFN(dim=dims[s], mlp_ratio=ratio, act=act,
                                dtype=self.dtype, name=f"s{s}_b{bi}")(x, train)
            outs.append(_bn(self, f"norm{s}", x, train))
            if s < 3:
                if s < 2:  # standard conv embedding (reference Embedding else-branch)
                    x = _bn(self, f"emb{s}_bn", _conv(self, x, dims[s + 1], 3, 2, f"emb{s}"), train)
                else:  # attention-substituted downsample (asub)
                    a = Attention4DDownsample(dim=dims[s], out_dim=dims[s + 1], act=act,
                                              dtype=self.dtype, name=f"emb{s}_attn")(x, train)
                    c = _bn(self, f"emb{s}_bn", _conv(self, x, dims[s + 1], 3, 2, f"emb{s}"), train)
                    x = a + c
        return outs
