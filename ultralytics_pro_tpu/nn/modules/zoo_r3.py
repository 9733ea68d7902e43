"""Round-3 module-zoo tranche: the ranked missing-module tail from the
buildability sweep (VERDICT r2 Missing #1). Flax/NHWC re-designs of the
reference blocks — citations per class.

Covers: ReOrg, Transpose, C3C2, LC_Block/LC_SEModule, conv_bn_relu_maxpool,
DepthSepConv, mobilev3_bneck, CPCAChannelAttention, MobileOne stage wrappers,
HorBlock (gnconv), ResXCSP*, Silence, CAConv, Light_HGBlock, DiTBlock,
ConvNextBlock, VanillaStem, DualConv, SCConv, and v7-lite one-offs.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.block import Bottleneck
from ultralytics_pro_tpu.nn.modules.conv import (
    BN_EPS,
    BN_MOMENTUM,
    Conv,
    ConvBase,
    DWConv,
    GhostConv,
    LightConv,
    RepConv,
    autopad,
)


def _bn(mod, name, x, train):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        use_fast_variance=False, epsilon=BN_EPS, dtype=mod.dtype,
                        name=name, parent=mod)(x)


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class ReOrg(ConvBase):
    """Space-to-depth 2x (reference conv.py:537): 4 strided quadrants
    concatenated on channels; (B,H,W,C) -> (B,H/2,W/2,4C)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]], -1)


class Transpose(ConvBase):
    """Plain ConvTranspose2d k2 s2 upsample, bias, no BN/act (reference
    block.py:3311)."""

    c2: int = 0
    k: int = 2
    s: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.ConvTranspose(self.c2, (self.k, self.k), strides=(self.s, self.s),
                                padding="VALID", use_bias=True, dtype=self.dtype,
                                name="upsample")(x)


class Silence(ConvBase):
    """Identity (reference yolov9 Silence)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


class C3C2(ConvBase):
    """CSP variant (reference block.py:3566): raw 1x1 conv stem; bottleneck
    chain runs on BN+SiLU of it, concat with the RAW stem, Mish-act 1x1 out."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = nn.Conv(c_, (1, 1), use_bias=False, feature_group_count=self.g,
                    dtype=self.dtype, name="conv")(x)
        z = jax.nn.silu(_bn(self, "bn", y, train))
        for i in range(self.n):
            z = Bottleneck(c2=c_, shortcut=self.shortcut, g=self.g, e=1.0,
                           dtype=self.dtype, name=f"m_{i}")(z, train)
        return Conv(c2=self.c2, k=1, act=_mish, dtype=self.dtype,
                    name="cv1")(jnp.concatenate([z, y], -1), train)


class LC_SEModule(ConvBase):
    """PPLCNet SE with SiLU gate (reference block.py:3352)."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        g = x.mean(axis=(1, 2), keepdims=True)
        g = jax.nn.relu(nn.Conv(c // self.reduction, (1, 1), dtype=self.dtype, name="conv1")(g))
        g = jax.nn.silu(nn.Conv(c, (1, 1), dtype=self.dtype, name="conv2")(g))
        return x * g


class LC_Block(ConvBase):
    """PPLCNet block (reference block.py:3383): DW CBH(k=dw_size, stride) ->
    optional LC_SE -> PW CBH 1x1. YAML args [c2, stride, dw_size, use_se]."""

    c2: int = 0
    s: int = 1
    dw_size: int = 3
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.families import CBH

        c1 = x.shape[-1]
        y = CBH(c2=c1, k=self.dw_size, s=self.s, g=c1, dtype=self.dtype, name="dw_conv")(x, train)
        if self.use_se:
            y = LC_SEModule(dtype=self.dtype, name="se")(y, train)
        return CBH(c2=self.c2, k=1, s=1, dtype=self.dtype, name="pw_conv")(y, train)


class conv_bn_relu_maxpool(ConvBase):
    """Shufflenet-lite stem (reference block.py:3454): conv3x3 s2 BN ReLU +
    maxpool3x3 s2 p1."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.c2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        y = jax.nn.relu(_bn(self, "bn", y, train))
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class DepthSepConv(ConvBase):
    """PicoDet-lite DW-separable conv (reference block.py:2472): DW k,s BN ->
    optional SE -> PW 1x1 BN -> HardSwish. YAML args [c2, dw_size, s, use_se]."""

    c2: int = 0
    dw_size: int = 3
    s: int = 1
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        p = (self.dw_size - 1) // 2
        y = nn.Conv(c1, (self.dw_size, self.dw_size), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=c1,
                    use_bias=False, dtype=self.dtype, name="dw")(x)
        y = _bn(self, "bn1", y, train)
        if self.use_se:
            g = y.mean(axis=(1, 2), keepdims=True)
            g = jax.nn.relu(nn.Conv(c1 // 16 or 1, (1, 1), dtype=self.dtype, name="se_fc1")(g))
            g = jax.nn.sigmoid(nn.Conv(c1, (1, 1), dtype=self.dtype, name="se_fc2")(g))
            y = y * g
        y = nn.Conv(self.c2, (1, 1), use_bias=False, dtype=self.dtype, name="pw")(y)
        return jax.nn.hard_swish(_bn(self, "bn2", y, train))


class mobilev3_bneck(ConvBase):
    """MobileNetV3 inverted residual (reference block.py:5159): optional PW
    expand, DW k/s, optional SE, HS/ReLU, PW-linear; identity residual when
    s==1 and c1==c2. YAML args [c2, hidden, k, s, use_se, use_hs]."""

    c2: int = 0
    hidden: int = 0
    k: int = 3
    s: int = 1
    use_se: bool = True
    use_hs: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        act = jax.nn.hard_swish if self.use_hs else jax.nn.relu
        y = x
        if c1 != self.hidden:
            y = nn.Conv(self.hidden, (1, 1), use_bias=False, dtype=self.dtype, name="pw")(y)
            y = act(_bn(self, "bn0", y, train))
        p = (self.k - 1) // 2
        y = nn.Conv(self.hidden, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=self.hidden,
                    use_bias=False, dtype=self.dtype, name="dw")(y)
        y = _bn(self, "bn1", y, train)
        if c1 != self.hidden:
            # SE sits before the activation in the expand branch order
            if self.use_se:
                y = self._se(y, train)
            y = act(y)
        else:
            y = act(y)
            if self.use_se:
                y = self._se(y, train)
        y = nn.Conv(self.c2, (1, 1), use_bias=False, dtype=self.dtype, name="pw_linear")(y)
        y = _bn(self, "bn2", y, train)
        if self.s == 1 and c1 == self.c2:
            return x + y
        return y

    def _se(self, y, train):
        c = y.shape[-1]
        g = y.mean(axis=(1, 2), keepdims=True)
        g = jax.nn.relu(nn.Conv(max(c // 4, 8), (1, 1), dtype=self.dtype, name="se_fc1")(g))
        g = jax.nn.hard_sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, name="se_fc2")(g))
        return y * g


class CPCAChannelAttention(ConvBase):
    """CPCA channel attention (reference block.py:3538): shared 1x1 MLP over
    avg- and max-pooled stats, sigmoid sum gates the input."""

    internal: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        fc1 = nn.Conv(max(self.internal, 1), (1, 1), dtype=self.dtype, name="fc1")
        fc2 = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")
        a = x.mean(axis=(1, 2), keepdims=True)
        a = jax.nn.sigmoid(fc2(jax.nn.relu(fc1(a))))
        m = x.max(axis=(1, 2), keepdims=True)
        m = jax.nn.sigmoid(fc2(jax.nn.relu(fc1(m))))
        return x * (a + m)


class MobileOne(ConvBase):
    """MobileOne stage (reference block.py:4507): n MobileOneBlocks; first
    maps c1->c2 with stride, rest keep c2. YAML args [c2, k, s, use_se]."""

    c2: int = 0
    n: int = 1
    k: int = 3
    s: int = 1
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.reparam import MobileOneBlock

        y = x
        for i in range(self.n):
            y = MobileOneBlock(c2=self.c2, k=self.k, s=self.s if i == 0 else 1,
                               num_convs=1, use_se=self.use_se, dtype=self.dtype,
                               name=f"m_{i}")(y, train)
        return y


class MobileOne_origin(ConvBase):
    """Official MobileOne stage (reference block.py:4519/_make_stage): each of
    `blocks` steps = DW MobileOneBlock(k3, groups=in) + PW MobileOneBlock(k1),
    `branches` over-param conv branches, trailing num_se blocks use SE.
    YAML args [c2, blocks, branches, use_se, num_se]."""

    c2: int = 0
    blocks: int = 2
    branches: int = 1
    use_se: bool = False
    num_se: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.reparam import MobileOneBlock

        y = x
        n_se = self.num_se if self.use_se else 0
        for i in range(self.blocks):
            se = i >= (self.blocks - n_se)
            cin = y.shape[-1]
            y = MobileOneBlock(c2=cin, k=3, s=1, g=cin, num_convs=self.branches,
                               use_se=se, dtype=self.dtype, name=f"dw_{i}")(y, train)
            y = MobileOneBlock(c2=self.c2, k=1, s=1, num_convs=self.branches,
                               use_se=se, dtype=self.dtype, name=f"pw_{i}")(y, train)
        return y


class gnconv(ConvBase):
    """Recursive gated conv (reference block.py:4633): proj to 2*dim, split
    [dims[0], sum(dims)], 7x7 DW over the sum, staged gated products."""

    order: int = 5
    scale: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = x.shape[-1]
        dims = [dim // 2 ** i for i in range(self.order)][::-1]
        fused = nn.Conv(2 * dim, (1, 1), dtype=self.dtype, name="proj_in")(x)
        pwa, abc = fused[..., :dims[0]], fused[..., dims[0]:]
        s = sum(dims)
        abc = nn.Conv(s, (7, 7), padding="SAME", feature_group_count=s,
                      use_bias=True, dtype=self.dtype, name="dwconv")(abc) * self.scale
        splits = []
        off = 0
        for di in dims:
            splits.append(abc[..., off:off + di])
            off += di
        y = pwa * splits[0]
        for i in range(self.order - 1):
            y = nn.Conv(dims[i + 1], (1, 1), dtype=self.dtype, name=f"pw_{i}")(y) * splits[i + 1]
        return nn.Conv(dim, (1, 1), dtype=self.dtype, name="proj_out")(y)


class HorBlock(ConvBase):
    """HorNet block (reference block.py:4667): LN -> gnconv residual (gamma1),
    then LN -> MLP4x residual (gamma2). Channel-preserving."""

    ls_init: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = x.shape[-1]
        g1 = self.param("gamma1", nn.initializers.constant(self.ls_init), (dim,))
        g2 = self.param("gamma2", nn.initializers.constant(self.ls_init), (dim,))
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + g1 * gnconv(dtype=self.dtype, name="gnconv")(y, train)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(4 * dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.Dense(dim, dtype=self.dtype, name="pwconv2")(jax.nn.gelu(y))
        return x + g2 * y


class ResXBottleneck(ConvBase):
    """ResX unit: 1x1 -> grouped 3x3 (g=32) -> 1x1 residual (reference Res
    with g=32, e=1.0 — block.py:3744 lineage)."""

    c2: int = 0
    shortcut: bool = True
    e: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        g = 32 if c_ % 32 == 0 else 1
        y = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(c2=c_, k=3, g=g, dtype=self.dtype, name="cv2")(y, train)
        y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class CAConv(ConvBase):
    """Coordinate-attention gated conv (reference conv.py:1089): CoordAtt
    h/w pooled gates on the input, then conv-BN-ReLU k,s to c2."""

    c2: int = 0
    k: int = 3
    s: int = 1
    reduction: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        mip = max(8, c // self.reduction)
        xh = x.mean(axis=2)  # (B,H,C)
        xw = x.mean(axis=1)  # (B,W,C)
        y = jnp.concatenate([xh, xw], axis=1)[:, :, None, :]  # (B,H+W,1,C)
        y = nn.Conv(mip, (1, 1), dtype=self.dtype, name="conv1")(y)
        y = jax.nn.hard_swish(_bn(self, "bn1", y, train))
        ah = jax.nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, name="conv_h")(y[:, :h]))
        aw = jax.nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, name="conv_w")(y[:, h:]))
        g = x * ah.reshape(b, h, 1, c) * aw.reshape(b, 1, w, c)
        p = self.k // 2
        out = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                      padding=((p, p), (p, p)), use_bias=True, dtype=self.dtype,
                      name="conv")(g)
        return jax.nn.relu(_bn(self, "bn2", out, train))


class Light_HGBlock(ConvBase):
    """PPHGNetV2 HG block with selectable inner conv (reference block.py:6583):
    num: 1=Ghost, 2=Rep(k3), 3=DW, 4=Light; n cascaded, concat, squeeze+excite."""

    cm: int = 0
    c2: int = 0
    k: int = 3
    n: int = 6
    num: int = 1
    shortcut: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ys = [x]
        for i in range(self.n):
            if self.num == 2:
                y = RepConv(c2=self.cm, dtype=self.dtype, name=f"m_{i}")(ys[-1], train)
            elif self.num == 3:
                y = DWConv(c2=self.cm, k=self.k, dtype=self.dtype, name=f"m_{i}")(ys[-1], train)
            elif self.num == 4:
                y = LightConv(c2=self.cm, k=self.k, dtype=self.dtype, name=f"m_{i}")(ys[-1], train)
            else:
                y = GhostConv(c2=self.cm, k=self.k, dtype=self.dtype, name=f"m_{i}")(ys[-1], train)
            ys.append(y)
        y = jnp.concatenate(ys, axis=-1)
        y = Conv(c2=self.c2 // 2, k=1, dtype=self.dtype, name="sc")(y, train)
        y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="ec")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class DiTBlock(ConvBase):
    """DiT block with self-derived adaLN-zero modulation (reference DiT.py:22):
    tokens emit their own 6-way shift/scale/gate; MHSA + MLP residuals with
    sigmoid mean-gates. Channel-preserving, NHWC -> tokens -> NHWC."""

    num_heads: int = 16
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        nh = self.num_heads if c % self.num_heads == 0 else 1
        mod = nn.Dense(6 * c, dtype=self.dtype, name="adaLN")(jax.nn.silu(t))
        sm, cm_, gm, sp, cp, gp = jnp.split(mod, 6, axis=-1)
        y = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype, name="norm1")(t)
        y = y * (1 + cm_) + sm
        y = nn.MultiHeadDotProductAttention(num_heads=nh, qkv_features=c,
                                            dtype=self.dtype, name="attn")(y, y)
        t = t + jax.nn.sigmoid(gm.mean(-1, keepdims=True)) * y
        y = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype, name="norm2")(t)
        y = y * (1 + cp) + sp
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(jax.nn.gelu(y, approximate=True))
        t = t + jax.nn.sigmoid(gp.mean(-1, keepdims=True)) * y
        return t.reshape(b, h, w, c)


class ConvNextBlock(ConvBase):
    """ConvNeXt block as shipped in the fork's block.py:3604: DW7x7 -> LN ->
    MLP4x -> layer-scale -> residual. Channel-preserving."""

    ls_init: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = x.shape[-1]
        y = nn.Conv(dim, (7, 7), padding="SAME", feature_group_count=dim,
                    dtype=self.dtype, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.Dense(dim, dtype=self.dtype, name="pwconv2")(jax.nn.gelu(y))
        g = self.param("gamma", nn.initializers.constant(self.ls_init), (dim,))
        return x + g * y


class VanillaStem(ConvBase):
    """VanillaNet stem (reference VanillaNet.py stem pair): conv4x4 s4 + BN,
    then 1x1 + BN with deep activation. YAML args [c2, k, s]."""

    c2: int = 0
    k: int = 4
    s: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding="VALID" if self.k == self.s else "SAME",
                    dtype=self.dtype, name="stem1")(x)
        y = jax.nn.leaky_relu(_bn(self, "bn1", y, train))
        y = nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="stem2")(y)
        return jax.nn.leaky_relu(_bn(self, "bn2", y, train))


class DualConv(ConvBase):
    """Dual 3x3-grouped + 1x1 parallel conv (reference block.py DualConv):
    sum of both paths. YAML args [c2, s?, g?]."""

    c2: int = 0
    s: int = 1
    g: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.g if x.shape[-1] % self.g == 0 and self.c2 % self.g == 0 else 1
        a = nn.Conv(self.c2, (3, 3), strides=(self.s, self.s), padding=((1, 1), (1, 1)),
                    feature_group_count=g, use_bias=False, dtype=self.dtype, name="gc")(x)
        b = nn.Conv(self.c2, (1, 1), strides=(self.s, self.s), use_bias=False,
                    dtype=self.dtype, name="pwc")(x)
        return a + b


class SCConv(ConvBase):
    """Self-calibrated conv (reference SCConv/gelan-c-SCConv): branch a =
    k3 conv gated by sigmoid of an upsampled pooled conv; branch b = plain k3;
    concat halves -> c2."""

    c2: int = 0
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        x1, x2 = jnp.split(x, 2, axis=-1) if x.shape[-1] % 2 == 0 else (x, x)
        # calibration branch: 4x avg-pool -> conv -> nearest upsample -> gate
        p = nn.avg_pool(x1, (4, 4), strides=(4, 4), padding="VALID")
        p = nn.Conv(x1.shape[-1], (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="k2")(p)
        p = jnp.repeat(jnp.repeat(p, 4, axis=1), 4, axis=2)
        p = p[:, :x1.shape[1], :x1.shape[2]]
        gate = jax.nn.sigmoid(x1 + p)
        a = nn.Conv(c_, (3, 3), strides=(self.s, self.s), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="k3")(x1) * (
            gate[:, ::self.s, ::self.s] if self.s > 1 else gate)[..., :1]
        a = _bn(self, "bn_a", a, train)
        b = nn.Conv(c_, (3, 3), strides=(self.s, self.s), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="k1")(x2)
        b = _bn(self, "bn_b", b, train)
        return jax.nn.relu(jnp.concatenate([a, b], -1))


class ResXCSPB(ConvBase):
    """CSP-B topology with grouped ResX units (reference block.py:3740)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.families import BottleneckCSPB

        return BottleneckCSPB(c2=self.c2, n=self.n, shortcut=self.shortcut,
                              inner=ResXBottleneck, dtype=self.dtype,
                              name="csp")(x, train)


class ResXCSPC(ConvBase):
    """CSP-C topology with grouped ResX units (reference block.py:3744)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.families import BottleneckCSPC

        return BottleneckCSPC(c2=self.c2, n=self.n, shortcut=self.shortcut,
                              inner=ResXBottleneck, dtype=self.dtype,
                              name="csp")(x, train)


class ResXCSPA(ConvBase):
    """CSP-A topology with grouped ResX units (reference block.py:3729)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        x1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        y1 = x1
        for i in range(self.n):
            y1 = ResXBottleneck(c2=c_, shortcut=self.shortcut, dtype=self.dtype,
                                name=f"m_{i}")(y1, train)
        y2 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype,
                    name="cv3")(jnp.concatenate([y1, y2], -1), train)
