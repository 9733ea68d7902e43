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


class RepViTBlockY(ConvBase):
    """Yaml-form RepViTBlock, faithful to the reference module's stride-2
    branch (repvit.py:107-119): token mixer = DW k3 s2 + SE(0.25) + PW to
    oup; channel mixer = Residual(PW 2*oup -> GELU -> PW-linear, zero-init
    BN). Note the reference's own yolov8-RepViTBlock.yaml args fail the
    module's `hidden_dim == 2*inp` assert, so that yaml cannot build
    upstream; this follows the module semantics with the yaml's oup."""

    c2: int = 0
    k: int = 3
    s: int = 2
    use_se: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        p = (self.k - 1) // 2
        t = nn.Conv(c1, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=c1,
                    use_bias=False, dtype=self.dtype, name="dw")(x)
        t = _bn(self, "dw_bn", t, train)
        if self.use_se:
            from ultralytics_pro_tpu.nn.modules.backbones2 import _se as _se2

            t = _se2(self, t, c1, "se", r=4, gate=jax.nn.sigmoid)
        t = nn.Conv(self.c2, (1, 1), use_bias=False, dtype=self.dtype, name="pw")(t)
        t = _bn(self, "pw_bn", t, train)
        y = nn.Conv(2 * self.c2, (1, 1), use_bias=False, dtype=self.dtype, name="fc1")(t)
        y = jax.nn.gelu(_bn(self, "fc1_bn", y, train))
        y = nn.Conv(self.c2, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")(y)
        # bn_weight_init=0 on the projection (reference Residual branch)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         use_fast_variance=False, epsilon=BN_EPS,
                         scale_init=nn.initializers.zeros, dtype=self.dtype,
                         name="fc2_bn", parent=self)(y)
        return t + y


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
    """MobileOne stage (reference block.py:4507): n depthwise-separable
    MobileOneBlocks, each c1->c2 at stride s with k over-param branches
    (kernel fixed 3). YAML args [c2, k, s] with n = depth-scaled repeat;
    verified against the reference constructor (c1, c2, n, k, stride)."""

    c2: int = 0
    n: int = 1
    k: int = 4
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.reparam import MobileOneBlockDW

        y = x
        for i in range(self.n):
            y = MobileOneBlockDW(c2=self.c2, k=self.k, s=self.s,
                                 dtype=self.dtype, name=f"m_{i}")(y, train)
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
        # (pool window clamps to the map so tiny P5 maps don't pool to zero)
        pw = min(4, x1.shape[1], x1.shape[2])
        p = nn.avg_pool(x1, (pw, pw), strides=(pw, pw), padding="VALID")
        p = nn.Conv(x1.shape[-1], (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="k2")(p)
        p = jnp.repeat(jnp.repeat(p, pw, axis=1), pw, axis=2)
        p = p[:, :x1.shape[1], :x1.shape[2]]
        dh, dw = x1.shape[1] - p.shape[1], x1.shape[2] - p.shape[2]
        if dh > 0 or dw > 0:  # non-divisible maps: edge-extend the upsample
            p = jnp.pad(p, ((0, 0), (0, max(dh, 0)), (0, max(dw, 0)), (0, 0)),
                        mode="edge")
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


# ---------------------------------------------------------------------------
# Batch 2: CSP-A, shuffle/lite stems, GELAN variants, MLLA, misc gates
# ---------------------------------------------------------------------------


class Dense(ConvBase):
    """PPLCNet classify tail (reference block.py:3410): 1x1 conv (bias-free,
    no padding) + HardSwish; dropout is a train-time no-op here."""

    c2: int = 0
    k: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.c2, (self.k, self.k), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="dense_conv")(x)
        return jax.nn.hard_swish(y)


def channel_shuffle(x, groups: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    return x.swapaxes(3, 4).reshape(b, h, w, c)


class Shuffle_Block(ConvBase):
    """ShuffleNetV2 unit (reference block.py:3468): stride-1 splits channels
    (identity || pw-dw-pw), stride-2 runs both branches on x; channel shuffle
    of 2 groups after concat. YAML args [c2, stride]."""

    c2: int = 0
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        bf = self.c2 // 2

        def pw(y, c, name, act):
            y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name=f"{name}_conv")(y)
            y = _bn(self, f"{name}_bn", y, train)
            return jax.nn.relu(y) if act else y

        def dw(y, name):
            c = y.shape[-1]
            y = nn.Conv(c, (3, 3), strides=(self.s, self.s), padding=((1, 1), (1, 1)),
                        feature_group_count=c, use_bias=False, dtype=self.dtype,
                        name=f"{name}_conv")(y)
            return _bn(self, f"{name}_bn", y, train)

        if self.s == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            y2 = pw(dw(pw(x2, bf, "b2_pw1", True), "b2_dw"), bf, "b2_pw2", True)
            out = jnp.concatenate([x1, y2], -1)
        else:
            y1 = pw(dw(x, "b1_dw"), bf, "b1_pw", True)
            y2 = pw(dw(pw(x, bf, "b2_pw1", True), "b2_dw"), bf, "b2_pw2", True)
            out = jnp.concatenate([y1, y2], -1)
        return channel_shuffle(out, 2)


class BottleneckCSPA(ConvBase):
    """CSP-A topology (reference block.py:739): Conv stem -> bottleneck chain;
    parallel plain 1x1; BN+SiLU on concat; final Conv."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True
    inner: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            if self.inner is None:
                y1 = Bottleneck(c2=c_, shortcut=self.shortcut, e=1.0,
                                dtype=self.dtype, name=f"m_{i}")(y1, train)
            else:
                y1 = self.inner(c2=c_, shortcut=self.shortcut, dtype=self.dtype,
                                name=f"m_{i}")(y1, train)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv2")(x)
        y = jax.nn.silu(_bn(self, "bn", jnp.concatenate([y1, y2], -1), train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(y, train)


class Shortcut(ConvBase):
    """Elementwise sum of two feature maps (reference block.py:2410)."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        if isinstance(xs, (list, tuple)):
            return xs[0] + xs[1]
        return xs


class EffStem(ConvBase):
    """EfficientNet stem (reference EfficientNet.py:38 `stem`): conv3x3 s2 +
    BN + ReLU6."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.c2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        return jnp.clip(jax.nn.relu(_bn(self, "bn", y, train)), 0, 6)


class PatchEmbed(ConvBase):
    """ViT patch embed as a yaml layer (reference SwinTransformer.py:350):
    conv k=patch s=patch projection + LayerNorm. YAML args [c2, patch]."""

    c2: int = 0
    patch: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch
        y = nn.Conv(self.c2, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(y)


class VanillaBlock(ConvBase):
    """VanillaNet block (reference VanillaNet.py:114): 1x1+BN, deep-train
    leaky, 1x1+BN, maxpool stride, then the learned DW-conv activation."""

    c2: int = 0
    s: int = 2
    act_num: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        y = nn.Conv(c1, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = jax.nn.leaky_relu(_bn(self, "bn1", y, train))
        y = nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="conv2")(y)
        y = _bn(self, "bn2", y, train)
        if self.s > 1:
            y = nn.max_pool(y, (self.s, self.s), strides=(self.s, self.s))
        # VanillaNet 'activation': ReLU then a learned DW conv (series-informed)
        y = jax.nn.relu(y)
        k = 2 * self.act_num + 1
        y = nn.Conv(self.c2, (k, k), padding="SAME", feature_group_count=self.c2,
                    use_bias=False, dtype=self.dtype, name="act_dw")(y)
        return _bn(self, "bn3", y, train)


class Down_wt(ConvBase):
    """Haar wavelet downsample (reference Haar.py:9): one DWT level gives
    LL/HL/LH/HH quarter-res bands, concat -> 1x1 BN ReLU."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = x[:, 0::2, 0::2]
        b = x[:, 1::2, 0::2]
        c = x[:, 0::2, 1::2]
        d = x[:, 1::2, 1::2]
        ll = (a + b + c + d) * 0.5
        hl = (-a - b + c + d) * 0.5
        lh = (-a + b - c + d) * 0.5
        hh = (a - b - c + d) * 0.5
        y = jnp.concatenate([ll, hl, lh, hh], -1)
        y = nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="conv")(y)
        return jax.nn.relu(_bn(self, "bn", y, train))


class MLLABlock(ConvBase):
    """Mamba-like linear attention block (reference MLLABLock.py): CPE dwconv
    residual, LN, gated (SiLU) linear attention with elu+1 kernel, RoPE on
    q/k (reference RoPE :96 — parameter-free rotation of channel pairs by
    grid-position angles; the reference's broadcast rotates along the W axis
    and assumes square maps, reproduced here with true per-axis indices so
    rectangular maps also work), LePE dwconv, out proj, CPE2, LN + MLP.
    Channel-preserving; accepts NHWC."""

    dim: int = 0  # inferred from input; kept for wrapper-kwarg compat
    mlp_ratio: float = 4.0
    num_heads: int = 0  # 0 = auto: the reference OVERRIDES its num_heads arg
    # with max(1, dim // 64) (MLLABLock.py MLLABlock.__init__)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = self.num_heads if self.num_heads and c % self.num_heads == 0 else max(1, c // 64)
        while nh > 1 and c % nh:  # heads must divide channels (c=224 -> 2)
            nh -= 1
        hd = c // nh

        def rope(t):
            """Rotate adjacent channel pairs by angle = w-index * theta_k
            (reference MLLABLock.py RoPE.forward with h==w)."""
            k_max = c // 2
            theta = 1.0 / (10000.0 ** (jnp.arange(k_max, dtype=jnp.float32) / k_max))
            ang = jnp.arange(w, dtype=jnp.float32)[:, None] * theta[None]  # (w, k_max)
            cos = jnp.cos(ang).astype(t.dtype)
            sin = jnp.sin(ang).astype(t.dtype)
            tr = t.reshape(b, h, w, k_max, 2)
            re, im = tr[..., 0], tr[..., 1]
            out = jnp.stack([re * cos - im * sin, re * sin + im * cos], -1)
            return out.reshape(b, h, w, c)

        x = x + nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                        dtype=self.dtype, name="cpe1")(x)
        t = x.reshape(b, h * w, c)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(t)  # torch LN default eps
        gate = jax.nn.silu(nn.Dense(c, dtype=self.dtype, name="act_proj")(y))
        v = nn.Dense(c, dtype=self.dtype, name="in_proj")(y)
        v = v.reshape(b, h, w, c)
        v = jax.nn.silu(nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                                dtype=self.dtype, name="dwc")(v)).reshape(b, h * w, c)
        qk = nn.Dense(2 * c, dtype=self.dtype, name="qk")(v)
        q, k = jnp.split(qk, 2, axis=-1)
        q = jax.nn.elu(q) + 1.0
        k = jax.nn.elu(k) + 1.0
        n = h * w
        q_rope = rope(q.reshape(b, h, w, c)).reshape(b, n, nh, hd).swapaxes(1, 2)
        k_rope = rope(k.reshape(b, h, w, c)).reshape(b, n, nh, hd).swapaxes(1, 2)
        qh = q.reshape(b, n, nh, hd).swapaxes(1, 2)
        kh = k.reshape(b, n, nh, hd).swapaxes(1, 2)
        vh = v.reshape(b, n, nh, hd).swapaxes(1, 2)
        # normalizer from un-rotated q/k; content path through rotated q/k
        # (reference MLLABLock.py :178-181)
        z = 1.0 / (jnp.einsum("bhnd,bhd->bhn", qh, kh.mean(2)) + 1e-6)
        kv = jnp.einsum("bhnd,bhne->bhde", k_rope / n ** 0.5, vh / n ** 0.5)
        att = jnp.einsum("bhnd,bhde->bhne", q_rope, kv) * z[..., None]
        att = att.swapaxes(1, 2).reshape(b, n, c)
        # LePE positional term on v
        lepe = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                       dtype=self.dtype, name="lepe")(v.reshape(b, h, w, c)).reshape(b, n, c)
        y = nn.Dense(c, dtype=self.dtype, name="out_proj")((att + lepe) * gate)
        t = t + y
        x = t.reshape(b, h, w, c)
        x = x + nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                        dtype=self.dtype, name="cpe2")(x)
        t = x.reshape(b, h * w, c)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(t)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        # exact-erf GELU (torch nn.GELU default; jax defaults to tanh approx)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(jax.nn.gelu(y, approximate=False))
        return (t + y).reshape(b, h, w, c)


class SELayerV2(ConvBase):
    """SENetV2 multi-branch squeeze-excite (reference SENetv2.py): 4 parallel
    squeeze FCs, concat, excite FC, sigmoid gate."""

    reduction: int = 32
    branches: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        r = max(c // self.reduction, 4)
        g = x.mean(axis=(1, 2))
        outs = [jax.nn.relu(nn.Dense(r, use_bias=False, dtype=self.dtype,
                                     name=f"sq_{i}")(g)) for i in range(self.branches)]
        e = jax.nn.sigmoid(nn.Dense(c, use_bias=False, dtype=self.dtype,
                                    name="excite")(jnp.concatenate(outs, -1)))
        return x * e[:, None, None, :]


class SEAM(ConvBase):
    """Separated + enhancement attention (reference SEAM.py:17): n x (residual
    DW3x3-GELU-BN + PW-GELU-BN), SE with exp gate."""

    n: int = 1
    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = x
        for i in range(self.n):
            z = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                        dtype=self.dtype, name=f"dw_{i}")(y)
            z = _bn(self, f"dwbn_{i}", jax.nn.gelu(z), train)
            y = y + z
            y = nn.Conv(c, (1, 1), dtype=self.dtype, name=f"pw_{i}")(y)
            y = _bn(self, f"pwbn_{i}", jax.nn.gelu(y), train)
        g = y.mean(axis=(1, 2))
        g = jax.nn.relu(nn.Dense(c // self.reduction or 1, use_bias=False,
                                 dtype=self.dtype, name="fc1")(g))
        g = jax.nn.sigmoid(nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(g))
        return x * jnp.exp(g)[:, None, None, :]


class MultiSEAM(ConvBase):
    """Multi-patch SEAM (reference SEAM.py:90): three patch-embedded DcovN
    towers (p=3/5/7), averaged exp-SE gates upsampled onto x."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        gates = []
        for pi, p in enumerate((3, 5, 7)):
            # maps smaller than the patch zero-pad up to one patch: a 7x7
            # VALID conv on a 2x2 P5 map yields a 0x0 tensor whose mean is
            # NaN (param shapes stay resolution-independent)
            ph, pw = max(p - x.shape[1], 0), max(p - x.shape[2], 0)
            xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0))) if ph or pw else x
            y = nn.Conv(c, (p, p), strides=(p, p), padding="VALID",
                        dtype=self.dtype, name=f"patch_{pi}")(xp)
            y = _bn(self, f"pbn_{pi}", jax.nn.silu(y), train)
            z = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                        dtype=self.dtype, name=f"dw_{pi}")(y)
            y = y + _bn(self, f"dwbn_{pi}", jax.nn.silu(z), train)
            gates.append(y.mean(axis=(1, 2)))
        g = sum(gates) / 3.0
        g = jax.nn.relu(nn.Dense(c // self.reduction or 1, use_bias=False,
                                 dtype=self.dtype, name="fc1")(g))
        g = jax.nn.sigmoid(nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(g))
        return x * jnp.exp(g)[:, None, None, :]


class CascadedGroupAttention(ConvBase):
    """EfficientViT cascaded group attention (CGA): heads run sequentially,
    each head's input = its channel slice + previous head's output; per-head
    DW conv on q. Channel-preserving."""

    num_heads: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = self.num_heads if c % self.num_heads == 0 else 1
        hd = c // nh
        feats = jnp.split(x, nh, axis=-1)
        outs = []
        prev = None
        for i in range(nh):
            f = feats[i] if prev is None else feats[i] + prev
            q = nn.Conv(hd, (1, 1), dtype=self.dtype, name=f"q_{i}")(f)
            q = q + nn.Conv(hd, (3, 3), padding="SAME", feature_group_count=hd,
                            dtype=self.dtype, name=f"qdw_{i}")(q)
            k = nn.Conv(hd, (1, 1), dtype=self.dtype, name=f"k_{i}")(f)
            v = nn.Conv(hd, (1, 1), dtype=self.dtype, name=f"v_{i}")(f)
            qt = q.reshape(b, h * w, hd)
            kt = k.reshape(b, h * w, hd)
            vt = v.reshape(b, h * w, hd)
            att = jax.nn.softmax(qt @ kt.swapaxes(1, 2) * hd ** -0.5, axis=-1)
            o = (att @ vt).reshape(b, h, w, hd)
            prev = o
            outs.append(o)
        y = jnp.concatenate(outs, -1)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="proj")(y)


class InstanceNorm2d(ConvBase):
    """Per-channel spatial instance norm (yaml module `IN`, v11-RGBIR)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = x.mean(axis=(1, 2), keepdims=True)
        v = x.var(axis=(1, 2), keepdims=True)
        return (x - m) / jnp.sqrt(v + 1e-5)


class RepNCSPAK(ConvBase):
    """RepNCSP with AKConv stems (reference block.py:5601 RepNCSP_AKConv):
    cv1/cv2/cv3 are AKConv(num_param=5) instead of 1x1 Convs; the
    RepNBottleneck chain is unchanged."""

    c2: int = 0
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.conv_extra import AKConv
        from ultralytics_pro_tpu.nn.modules.v9v10v12 import RepNBottleneck

        c_ = int(self.c2 * self.e)
        a = AKConv(c2=c_, num_param=5, s=1, dtype=self.dtype, name="cv1")(x, train)
        b = AKConv(c2=c_, num_param=5, s=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = RepNBottleneck(c2=c_, e=1.0, dtype=self.dtype, name=f"m_{i}")(a, train)
        return AKConv(c2=self.c2, num_param=5, s=1, dtype=self.dtype,
                      name="cv3")(jnp.concatenate([a, b], -1), train)


class ELAN4V(ConvBase):
    """GELAN (RepNCSPELAN4) with selectable branch blocks — serves the
    reference's OREPANCSPELAN4 / RepNCSPELAN4AKConv / KANRepNCSPELAN4 /
    FasterRepNCSPELAN4 variant classes (block.py:5593-5650) from one
    topology. variant picks the per-branch CSP core + tail op: 'ak' uses the
    faithful AKConv-stem RepNCSP cores, plain Conv k3 tails, and an
    AKConv(num_param=1) cv4, exactly as block.py:5611-5617."""

    c2: int = 0
    c3: int = 0
    c4: int = 0
    n: int = 1
    variant: str = "rep"

    def _tail(self, c4, i):
        from ultralytics_pro_tpu.nn.modules import reparam
        from ultralytics_pro_tpu.nn.modules.backbones2 import FastKANConv2D

        if self.variant == "orepa":
            return reparam.OREPA(c2=c4, k=3, s=1, dtype=self.dtype, name=f"tail_{i}")
        if self.variant == "kan":
            return FastKANConv2D(c2=c4, k=3, s=1, dtype=self.dtype, name=f"tail_{i}")
        if self.variant == "faster":
            return None  # handled via PConvBlock in branch body
        return Conv(c2=c4, k=3, dtype=self.dtype, name=f"tail_{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.backbones2 import PConvBlock
        from ultralytics_pro_tpu.nn.modules.conv_extra import AKConv
        from ultralytics_pro_tpu.nn.modules.v9v10v12 import RepNCSP

        y = Conv(c2=self.c3, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        z = ys[-1]
        for bi in range(2):
            if self.variant == "ak":  # AKConv stems inside the CSP core
                z = RepNCSPAK(c2=self.c4, n=self.n, dtype=self.dtype, name=f"csp_{bi}")(z, train)
                z = Conv(c2=self.c4, k=3, dtype=self.dtype, name=f"tail_{bi}")(z, train)
                ys.append(z)
                continue
            z = RepNCSP(c2=self.c4, n=self.n, dtype=self.dtype, name=f"csp_{bi}")(z, train)
            if self.variant == "faster":
                z = PConvBlock(dim=self.c4, dtype=self.dtype, name=f"tail_{bi}")(z, train)
            else:
                z = self._tail(self.c4, bi)(z, train)
            ys.append(z)
        cat = jnp.concatenate(ys, -1)
        if self.variant == "ak":  # reference cv4 = AKConv(c3+2c4, c2, 1, 1)
            return AKConv(c2=self.c2, num_param=1, s=1, dtype=self.dtype, name="cv4")(cat, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv4")(cat, train)


class RepNCSPELAN4_high(ConvBase):
    """GELAN high-res variant (reference block.py:1324): c3=c2, c4=c2//2."""

    c2: int = 0
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.v9v10v12 import RepNCSP

        c3, c4 = self.c2, self.c2 // 2
        y = Conv(c2=c3, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        z = ys[-1]
        for bi in range(2):
            z = RepNCSP(c2=c4, n=self.n, dtype=self.dtype, name=f"csp_{bi}")(z, train)
            z = Conv(c2=c4, k=3, dtype=self.dtype, name=f"conv_{bi}")(z, train)
            ys.append(z)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv4")(jnp.concatenate(ys, -1), train)


class RepNCSPELAN4_low(ConvBase):
    """GELAN low-cost variant (reference block.py:1340-ish): c3=c2//2; one
    RepNCSP on the full stem, concat with the stem halves."""

    c2: int = 0
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.v9v10v12 import RepNCSP

        c3 = self.c2 // 2
        t = Conv(c2=c3, k=1, dtype=self.dtype, name="cv1")(x, train)
        t3 = RepNCSP(c2=c3, n=self.n, dtype=self.dtype, name="cv3")(t, train)
        ys = list(jnp.split(t, 2, axis=-1)) + [t3]
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv4")(jnp.concatenate(ys, -1), train)


# ---------------------------------------------------------------------------
# Batch 2b: composite CSP inner blocks + small gates (CGLU, CAA, EMS convs)
# ---------------------------------------------------------------------------


class CGLU(ConvBase):
    """Convolutional GLU (TransNeXt): fc1 -> split (gate, v); v through DW3x3;
    silu(gate)*v -> fc2. Channel-preserving."""

    e: float = 2.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        h = int(c * self.e)
        y = nn.Conv(2 * h, (1, 1), dtype=self.dtype, name="fc1")(x)
        g, v = jnp.split(y, 2, axis=-1)
        v = nn.Conv(h, (3, 3), padding="SAME", feature_group_count=h,
                    dtype=self.dtype, name="dw")(v)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(jax.nn.silu(g) * v)


class CAA(ConvBase):
    """Context-anchor attention (PKINet): 7x7 avg-pool context, 1x1 ->
    1x11 DW -> 11x1 DW -> 1x1, sigmoid gate."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.avg_pool(x, (7, 7), strides=(1, 1), padding="SAME")
        y = Conv(c2=c, k=1, dtype=self.dtype, name="cv1")(y, train)
        y = nn.Conv(c, (1, 11), padding="SAME", feature_group_count=c,
                    dtype=self.dtype, name="dwh")(y)
        y = nn.Conv(c, (11, 1), padding="SAME", feature_group_count=c,
                    dtype=self.dtype, name="dwv")(y)
        y = Conv(c2=c, k=1, dtype=self.dtype, name="cv2")(y, train)
        return x * jax.nn.sigmoid(y)


class EMSConv(ConvBase):
    """Efficient multi-scale conv: half the channels pass through, the other
    half splits into 3x3/5x5 groups; concat -> 1x1 fuse."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        keep, mix = x[..., : c // 2], x[..., c // 2:]
        m1, m2 = jnp.split(mix, 2, axis=-1)
        m1 = Conv(c2=m1.shape[-1], k=3, dtype=self.dtype, name="k3")(m1, train)
        m2 = Conv(c2=m2.shape[-1], k=5, dtype=self.dtype, name="k5")(m2, train)
        y = jnp.concatenate([keep, m1, m2], -1)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="fuse")(y, train)


class EMSConvP(ConvBase):
    """EMSConv pointwise variant: every split gets a scale branch (1/3/5/7)."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        parts = jnp.split(x, 4, axis=-1) if x.shape[-1] % 4 == 0 else [x] * 1
        ks = (1, 3, 5, 7)
        outs = [Conv(c2=p.shape[-1], k=ks[i], dtype=self.dtype, name=f"k{ks[i]}")(p, train)
                for i, p in enumerate(parts)]
        y = jnp.concatenate(outs, -1)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="fuse")(y, train)


class MSBlock(ConvBase):
    """YOLO-MS multi-scale block: 1x1 expand, hierarchical DW-k branches with
    running sum, concat, 1x1 project."""

    c2: int = 0
    ks: Any = (1, 3, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = max(self.c2 // len(self.ks), 8)
        y = Conv(c2=c_ * len(self.ks), k=1, dtype=self.dtype, name="expand")(x, train)
        parts = jnp.split(y, len(self.ks), axis=-1)
        outs = []
        prev = None
        for i, (p, k) in enumerate(zip(parts, self.ks)):
            t = p if prev is None else p + prev
            if k > 1:
                t = Conv(c2=c_, k=1, dtype=self.dtype, name=f"b{i}_in")(t, train)
                t = DWConv(c2=c_, k=k, dtype=self.dtype, name=f"b{i}_dw")(t, train)
                t = Conv(c2=c_, k=1, dtype=self.dtype, name=f"b{i}_out")(t, train)
            prev = t
            outs.append(t)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="proj")(jnp.concatenate(outs, -1), train)


class RetBlock(ConvBase):
    """RetNet/RMT Manhattan-decay self-attention block — faithful to the
    reference (RetNet.py:205 RetBlock; MaSA:147 'whole', MaSAd:24 'chunk'):
    DW3x3 conv-pos residual, then LN -> retention -> residual, LN -> FFN ->
    residual. Retention = softmax attention whose logits carry a per-head
    Manhattan-distance decay bias (RelPos2d:268: decay_n = log(1-2^(-2-4n/N)))
    plus a depthwise-5x5 LePE added to the attended values. 'chunk' mode
    decomposes the attention per axis (width pass then height pass with 1D
    |i-j| decay masks — O(L*(H+W)) and MXU-friendly); 'whole' attends over
    the full L=H*W token grid with the 2D decay mask. Channel-preserving;
    ffn_dim == dim as the C2f/C3 wrappers construct it (RetNet.py:338,360).
    Decay masks are computed in-graph from the static grid (parameter-free)."""

    dim: int = 0
    retention: str = "chunk"
    num_heads: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = self.num_heads
        kd = c // nh
        decay = jnp.log(1.0 - 2.0 ** (-2.0 - 4.0 * jnp.arange(nh, dtype=jnp.float32) / nh))

        def dw(y, k, name):  # torch DWConv2d: plain grouped conv with bias
            p = k // 2
            return nn.Conv(y.shape[-1], (k, k), padding=((p, p), (p, p)),
                           feature_group_count=y.shape[-1], use_bias=True,
                           dtype=self.dtype, name=name, parent=self)(y)

        x = x + dw(x, 3, "pos")
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln1", parent=self)(x)
        q = nn.Dense(c, dtype=self.dtype, name="q_proj", parent=self)(y)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj", parent=self)(y) * (kd ** -0.5)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj", parent=self)(y)
        lepe = dw(v, 5, "lepe")

        qr = q.reshape(b, h, w, nh, kd)
        kr = k.reshape(b, h, w, nh, kd)
        vr = v.reshape(b, h, w, nh, kd)
        if self.retention == "chunk":
            iw = jnp.arange(w, dtype=jnp.float32)
            ih = jnp.arange(h, dtype=jnp.float32)
            mask_w = jnp.abs(iw[:, None] - iw[None, :])[None] * decay[:, None, None]
            mask_h = jnp.abs(ih[:, None] - ih[None, :])[None] * decay[:, None, None]
            # width pass: rows attend along w (reference MaSAd:76-84)
            aw = jnp.einsum("bhind,bhjnd->bhnij", qr, kr) + mask_w[None, None].astype(qr.dtype)
            aw = jax.nn.softmax(aw.astype(jnp.float32), -1).astype(qr.dtype)
            v1 = jnp.einsum("bhnij,bhjnd->bhnid", aw, vr)  # (b, h, nh, w, kd)
            # height pass: columns attend along h (reference MaSAd:87-95)
            ah = jnp.einsum("biwnd,bjwnd->bwnij", qr, kr) + mask_h[None, None].astype(qr.dtype)
            ah = jax.nn.softmax(ah.astype(jnp.float32), -1).astype(qr.dtype)
            out = jnp.einsum("bwnij,bjnwd->bwnid", ah, v1)  # (b, w, nh, h, kd)
            out = out.transpose(0, 3, 1, 2, 4).reshape(b, h, w, c)
        else:  # 'whole': full-grid attention with the 2D Manhattan decay
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32), indexing="ij")
            grid = jnp.stack([gy.reshape(-1), gx.reshape(-1)], -1)  # (L, 2)
            dist = jnp.abs(grid[:, None] - grid[None, :]).sum(-1)  # (L, L)
            mask = dist[None] * decay[:, None, None]  # (nh, L, L)
            l = h * w
            ql = qr.reshape(b, l, nh, kd)
            kl = kr.reshape(b, l, nh, kd)
            vl = vr.reshape(b, l, nh, kd)
            a = jnp.einsum("blnd,bmnd->bnlm", ql, kl) + mask[None].astype(ql.dtype)
            a = jax.nn.softmax(a.astype(jnp.float32), -1).astype(ql.dtype)
            out = jnp.einsum("bnlm,bmnd->blnd", a, vl).reshape(b, h, w, c)
        out = out + lepe
        x = x + nn.Dense(c, dtype=self.dtype, name="out_proj", parent=self)(out)

        z = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln2", parent=self)(x)
        z = nn.Dense(c, dtype=self.dtype, name="fc1", parent=self)(z)
        z = nn.Dense(c, dtype=self.dtype, name="fc2", parent=self)(jax.nn.gelu(z))
        return x + z


class StarCAA(ConvBase):
    """StarBlock + CAA gate (C2f_Star_CAA inner)."""

    dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.backbones2 import StarBlock

        y = StarBlock(dim=self.dim or x.shape[-1], dtype=self.dtype, name="star")(x, train)
        return CAA(dtype=self.dtype, name="caa")(y, train)


class RVB_EMA(ConvBase):
    """RepViTBlock + EMA attention (C2f_RVB_EMA inner)."""

    dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.attention import EMA
        from ultralytics_pro_tpu.nn.modules.backbones2 import RepViTBlock

        y = RepViTBlock(dim=self.dim or x.shape[-1], dtype=self.dtype, name="rvb")(x, train)
        return EMA(dtype=self.dtype, name="ema")(y, train)


class FasterCGLU(ConvBase):
    """PConvBlock + CGLU (C2f_Faster_CGLU inner)."""

    dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.backbones2 import PConvBlock

        y = PConvBlock(dim=self.dim or x.shape[-1], dtype=self.dtype, name="pconv")(x, train)
        return CGLU(dtype=self.dtype, name="cglu")(y, train)


class FasterEMA(ConvBase):
    """PConvBlock + EMA (C2f_Faster_EMA inner)."""

    dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.attention import EMA
        from ultralytics_pro_tpu.nn.modules.backbones2 import PConvBlock

        y = PConvBlock(dim=self.dim or x.shape[-1], dtype=self.dtype, name="pconv")(x, train)
        return EMA(dtype=self.dtype, name="ema")(y, train)


class DynamicConv(ConvBase):
    """CondConv dynamic expert conv — faithful to the reference
    (C2fGhostModuleDynamicConv.py:23 DynamicConv = sigmoid routing over 4
    timm CondConv2d experts). The per-sample mixed-kernel conv is computed
    as the routing-weighted sum of the K expert convs — mathematically
    identical (conv is linear in its kernel) and MXU-friendly: K dense
    batched convs instead of per-sample grouped kernels."""

    c2: int = 0
    k: int = 1
    s: int = 1
    g: int = 1
    num_experts: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = x.mean(axis=(1, 2))
        route = jax.nn.sigmoid(
            nn.Dense(self.num_experts, dtype=self.dtype, name="routing")(pooled))  # (B, K)
        p = self.k // 2
        out = 0.0
        for e in range(self.num_experts):
            y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                        padding=((p, p), (p, p)), feature_group_count=self.g,
                        use_bias=False, dtype=self.dtype, name=f"expert{e}")(x)
            out = out + y * route[:, e][:, None, None, None]
        return out


class GhostDynamicConv(ConvBase):
    """GhostModule built from DynamicConv experts (reference
    C2fGhostModuleDynamicConv.py:78 GhostModule: primary DynamicConv k1 +
    cheap depthwise DynamicConv k3, concat)."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.c2 - self.c2 // 2  # init_channels = ceil(oup/2)
        y = DynamicConv(c2=half, k=1, dtype=self.dtype, name="primary")(x, train)
        y = jax.nn.relu(_bn(self, "bn1", y, train))
        z = DynamicConv(c2=self.c2 - half, k=3, g=half if half == self.c2 - half else 1,
                        dtype=self.dtype, name="cheap")(y, train)
        z = jax.nn.relu(_bn(self, "bn2", z, train))
        return jnp.concatenate([y, z], -1)


class iRMB(ConvBase):
    """Inverted residual mobile block, channel-preserving yaml form
    (reference EMOv2 iRMB with [] args)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.backbones2 import MBConvV2

        return MBConvV2(c2=x.shape[-1], dtype=self.dtype, name="mb")(x, train)


class TorchVisionBackbone(ConvBase):
    """`TorchVision` yaml module equivalent: native ResNet stages built from
    this repo's blocks (reference TorchVision wraps torchvision models;
    zero-egress build recreates the named topology — basic blocks for 18/34,
    4x-expansion bottlenecks for 50/101/152). Emits the final stage."""

    model: str = "resnet18"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.block import ResNetLayer

        cfg = {"resnet18": ((2, 2, 2, 2), 1), "resnet34": ((3, 4, 6, 3), 1),
               "resnet50": ((3, 4, 6, 3), 4), "resnet101": ((3, 4, 23, 3), 4),
               "resnet152": ((3, 8, 36, 3), 4)}.get(self.model)
        if cfg is None:
            raise NotImplementedError(
                f"TorchVision model '{self.model}' not available in the TPU build; "
                "supported: resnet18/34/50/101/152")
        depths, e = cfg
        x = ResNetLayer(c2=64, s=1, is_first=True, dtype=self.dtype, name="stem")(x, train)
        for si, (c, n0) in enumerate(zip((64, 128, 256, 512), depths)):
            x = ResNetLayer(c2=c, s=1 if si == 0 else 2, n=n0, e=e, dtype=self.dtype,
                            name=f"layer{si + 1}")(x, train)
        return x


class Conv_BCN(ConvBase):
    """Conv + batch-channel norm + SiLU (reference Conv_BCN, BCNet yamls)."""

    c2: int = 0
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.conv_extra import BatchChannelNorm

        p = self.k // 2
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        y = BatchChannelNorm(dtype=self.dtype, name="bcn")(y, train)
        return jax.nn.silu(y)


# ---------------------------------------------------------------------------
# Batch 3: EfficientNet MBConv, SwinStage, v7 ELANMO/SPP, LAE, MFAM,
# SFS_Conv, F2SoftHG, MSCAMv3, image-enhancer prefixes
# ---------------------------------------------------------------------------


class MBConvBlock(ConvBase):
    """EfficientNet MBConv as a yaml layer (reference EfficientNet.py:49):
    optional 1x1 expand -> DW k,s -> SE(0.25) -> 1x1 project; id-skip when
    s==1 and c1==c2. YAML args [c2, k, s, expand, drop, se?]."""

    c2: int = 0
    k: int = 3
    s: int = 1
    expand: int = 6
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        h = c1 * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(h, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(y)
            y = jax.nn.silu(_bn(self, "bn0", y, train))
        p = (self.k - 1) // 2
        y = nn.Conv(h, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=h,
                    use_bias=False, dtype=self.dtype, name="dw")(y)
        y = jax.nn.silu(_bn(self, "bn1", y, train))
        if self.use_se:
            g = y.mean(axis=(1, 2), keepdims=True)
            g = jax.nn.silu(nn.Conv(max(c1 // 4, 1), (1, 1), dtype=self.dtype, name="se1")(g))
            g = jax.nn.sigmoid(nn.Conv(h, (1, 1), dtype=self.dtype, name="se2")(g))
            y = y * g
        y = nn.Conv(self.c2, (1, 1), use_bias=False, dtype=self.dtype, name="proj")(y)
        y = _bn(self, "bn2", y, train)
        if self.s == 1 and c1 == self.c2:
            return x + y
        return y


class SwinStage(ConvBase):
    """Swin stage as a yaml layer (reference SwinTransformer.py:264):
    `depth` alternating W-MSA/SW-MSA blocks at fixed dim/heads/window.
    YAML args [dim, depth, heads, window]."""

    dim: int = 96
    depth: int = 2
    heads: int = 3
    window: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.backbones import SwinBlock

        if x.shape[-1] != self.dim:
            x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="proj")(x)
        for i in range(self.depth):
            x = SwinBlock(dim=self.dim, heads=self.heads, window=self.window,
                          shift=0 if i % 2 == 0 else self.window // 2,
                          dtype=self.dtype, name=f"b{i}")(x, train)
        return x


class Yolov7_Tiny_SPP(ConvBase):
    """v7-tiny SPP (reference block.py:5850): dual 1x1 stems, maxpool 5/9/13
    pyramid on one, fuse."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2  # e=0.5 -> c_ = 2*c2*0.5
        x1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        x2 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        pools = [nn.max_pool(x2, (k, k), strides=(1, 1), padding="SAME")
                 for k in (5, 9, 13)]
        x4 = Conv(c2=c_, k=1, dtype=self.dtype,
                  name="cv3")(jnp.concatenate([x2] + pools, -1), train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype,
                    name="cv4")(jnp.concatenate([x1, x4], -1), train)


class Yolov7_Tiny_E_ELANMO(ConvBase):
    """v7-tiny ELAN with MobileOne branch stages (reference block.py:5869):
    cv1/cv2 1x1 stems; cv3/cv4 = DW+PW MobileOneBlock stages; concat 4, cv5."""

    c2: int = 0
    blocks: int = 1
    branches: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.reparam import MobileOneBlock

        c_ = self.c2 // 2
        x1 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        x2 = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)

        def stage(y, name):
            for i in range(self.blocks):
                cin = y.shape[-1]
                y = MobileOneBlock(c2=cin, k=3, s=1, g=cin, num_convs=self.branches,
                                   dtype=self.dtype, name=f"{name}_dw{i}")(y, train)
                y = MobileOneBlock(c2=c_, k=1, s=1, num_convs=self.branches,
                                   dtype=self.dtype, name=f"{name}_pw{i}")(y, train)
            return y

        x3 = stage(x2, "cv3")
        x4 = stage(x3, "cv4")
        return Conv(c2=self.c2, k=1, dtype=self.dtype,
                    name="cv5")(jnp.concatenate([x1, x2, x3, x4], -1), train)


class LAE(ConvBase):
    """Light-weight adaptive extraction downsample (reference LAE.py:37):
    per-pixel softmax over the 2x2 neighborhood (attention branch) weights a
    grouped stride-2 4x-expand conv's 4 sub-maps."""

    group: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        att = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        att = Conv(c2=c, k=1, dtype=self.dtype, name="att")(att, train)
        # (B, 2h', 2w', C) -> (B, h', w', C, 4) quadrant logits
        a = jnp.stack([att[:, 0::2, 0::2], att[:, 0::2, 1::2],
                       att[:, 1::2, 0::2], att[:, 1::2, 1::2]], -1)
        a = jax.nn.softmax(a, axis=-1)
        g = max(1, c // self.group)
        y = Conv(c2=4 * c, k=3, s=2, g=g, dtype=self.dtype, name="ds")(x, train)
        y = y.reshape(b, h // 2, w // 2, 4, c).transpose(0, 1, 2, 4, 3)
        return (y * a).sum(-1)


class MFAM(ConvBase):
    """Multi-scale feature aggregation (MASF-YOLO MFAM): parallel DW 3/5/7
    branches + 1x1, summed, SE-gated, projected to c2."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = Conv(c2=c, k=1, dtype=self.dtype, name="pre")(x, train)
        acc = nn.Conv(c, (1, 1), dtype=self.dtype, name="b1")(y)
        for k in (3, 5, 7):
            acc = acc + nn.Conv(c, (k, k), padding="SAME", feature_group_count=c,
                                dtype=self.dtype, name=f"b{k}")(y)
        g = acc.mean(axis=(1, 2), keepdims=True)
        g = jax.nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, name="se")(g))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="proj")(acc * g, train)


def _frgabor_bank(k: int, order: float, angles, scales):
    """Fractional-Gabor kernel bank (reference SFSConv.py:78-97): one (k, k)
    map per (angle, scale) pair, exp(-((x'^2+(y'/s)^2)^order)) * cos(2*pi*x'/s)
    on a rotated [-1,1] grid. Returned as the init values of the learnable
    modulation maps (the reference wraps each in nn.Parameter)."""
    import numpy as _np

    maps = []
    for angle in angles:
        for scale in scales:
            xx, yy = _np.meshgrid(_np.linspace(-1, 1, k), _np.linspace(-1, 1, k))
            xt = xx * _np.cos(angle) + yy * _np.sin(angle)
            yt = -xx * _np.sin(angle) + yy * _np.cos(angle)
            maps.append(_np.exp(-((xt ** 2 + (yt / scale) ** 2) ** order))
                        * _np.cos(2 * _np.pi * xt / scale))
    return _np.stack(maps).astype(_np.float32)  # (n_maps, k, k)


class _GaborSingle(ConvBase):
    """GaborSingle (reference SFSConv.py:108): learnable base kernel t
    modulated by the summed learnable Gabor maps, then conv + relu + the
    shifted 2x2 max-pool smoothing. The reference's unconditional F.dropout
    (applied even in eval — a torch bug) is omitted: inference is
    deterministic and training regularization is unaffected at p=0 there."""

    c1: int = 0
    c2: int = 0
    k: int = 3
    order: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        angles = (0, 45, 90, 135)  # radians-as-integers, as the reference passes them
        scales = (1, 2, 3, 4)
        bank0 = _frgabor_bank(self.k, self.order, angles, scales)
        # reference: ParameterList of (out, 1, k, k) maps, each initialized to
        # one Gabor map repeated over out channels; summed before modulating t
        gmaps = self.param("gabor_maps",
                           lambda rng: jnp.asarray(bank0)[:, None, :, :].repeat(self.c2, 1),
                           )  # (n_maps, c2, k, k)
        t = self.param("t", nn.initializers.normal(1.0), (self.c2, self.c1, self.k, self.k))
        kernel = (gmaps.sum(0)[:, None] * t).astype(self.dtype)  # (c2, c1, k, k)
        kernel = kernel.transpose(2, 3, 1, 0)  # HWIO
        p = (self.k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.relu(y)
        # F.pad left/top + 2x2 stride-1 max-pool (reference :126-127)
        y = jnp.pad(y, ((0, 0), (1, 0), (1, 0), (0, 0)))
        return nn.max_pool(y, (2, 2), strides=(1, 1))


class SFS_Conv(ConvBase):
    """Separated frequency/spatial conv — faithful to the reference
    (SFSConv.py:255 SFS_Conv): PWC halves; spatial path SPU (split-half DW k3,
    DW k5 on the sum, 1x1, +res); frequency path GaborFPU (one SHARED
    fractional-Gabor-modulated conv applied to 4 channel groups, 1x1, +res);
    concat -> softmax over pooled channels gate -> halves summed -> 1x1."""

    c2: int = 0
    order: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        h = c // 2
        a = Conv(c2=h, k=1, dtype=self.dtype, name="pwc0")(x, train)
        bfr = Conv(c2=h, k=1, dtype=self.dtype, name="pwc1")(x, train)

        # SPU (reference :237-253): in = h channels
        q = h // 2
        s1 = Conv(c2=q, k=3, g=q, dtype=self.dtype, name="spu_c1")(a[..., :q], train)
        s2 = Conv(c2=q, k=5, g=q, dtype=self.dtype, name="spu_c2")(a[..., q:] + s1, train)
        spa = Conv(c2=self.c2, k=1, dtype=self.dtype, name="spu_c3")(
            jnp.concatenate([s1, s2], -1), train)
        if spa.shape[-1] == a.shape[-1]:
            spa = spa + a

        # GaborFPU (reference :129-152): shared GaborSingle over 4 groups
        g = h // 4
        gs = _GaborSingle(c1=g, c2=self.c2 // 4, order=self.order,
                          dtype=self.dtype, name="fpu_gabor")
        fre = jnp.concatenate([gs(bfr[..., i * g:(i + 1) * g], train) for i in range(4)], -1)
        fre = nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="fpu_fc")(fre)
        if fre.shape[-1] == bfr.shape[-1]:
            fre = fre + bfr

        both = jnp.concatenate([spa, fre], -1)
        gate = jax.nn.softmax(both.mean(axis=(1, 2), keepdims=True), axis=-1)
        both = both * gate
        o1, o2 = jnp.split(both, 2, axis=-1)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="pwc_o")(o1 + o2, train)


def math_gcd(a, b):
    import math

    return math.gcd(int(a), int(b)) or 1


class F2SoftHG(ConvBase):
    """Soft hypergraph CSP (reference F2SoftHG.py:109): fused input -> 1x1 to
    3 chunks; two soft-hypergraph token branches on the middle chunk
    (soft-assignment message passing == masked matmuls on the MXU); bottleneck
    chain on the last; concat all, 1x1 out."""

    c2: int = 0  # 0 -> inherit the mid input's channels (reference tasks.py:3026)
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            # FusionModule (reference F2SoftHG.py:90): downsample the high-res
            # input, upsample the low-res one, concat at the mid resolution
            x0, x1, x2 = x
            x0 = nn.avg_pool(x0, (2, 2), strides=(2, 2), padding="VALID")
            x2 = jnp.repeat(jnp.repeat(x2, 2, 1), 2, 2)[:, :x1.shape[1], :x1.shape[2]]
            cat = jnp.concatenate([x0, x1, x2], -1)
            x = Conv(c2=x1.shape[-1], k=1, dtype=self.dtype, name="fuse")(cat, train)
        c2 = self.c2 or x.shape[-1]
        c = int(c2 * self.e)
        y = Conv(c2=3 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:2 * c], y[..., 2 * c:]]

        def softhg(t, name):
            b, h, w, cc = t.shape
            tok = t.reshape(b, h * w, cc)
            edges = nn.Dense(8, dtype=self.dtype, name=f"{name}_assign")(tok)
            a = jax.nn.softmax(edges, axis=1)  # soft vertex->edge
            e = jnp.einsum("bne,bnc->bec", a, tok)
            e = jax.nn.gelu(nn.Dense(cc, dtype=self.dtype, name=f"{name}_edge")(e))
            v = jnp.einsum("bne,bec->bnc", jax.nn.softmax(edges, axis=-1), e)
            return (tok + v).reshape(b, h, w, cc)

        hg1 = softhg(ys[1], "hg1")
        hg2 = softhg(ys[1], "hg2")
        z = ys[-1]
        outs = [ys[0], hg1]
        for i in range(self.n):
            z = Bottleneck(c2=c, shortcut=False, dtype=self.dtype, name=f"m_{i}")(z, train)
            outs.append(z)
        outs.append(hg2)
        return Conv(c2=c2, k=1, dtype=self.dtype,
                    name="cv2")(jnp.concatenate([outs[0], outs[1], ys[2], *outs[2:]], -1), train)


class MSCAMv3(ConvBase):
    """Multi-scale channel attention v3 (reference MSCAM.py:386): 3x3 channel
    reduction to c_, four pooled grouped-conv context branches, expand back,
    sigmoid residual gate."""

    c_: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = jax.nn.silu(nn.Conv(self.c_, (3, 3), padding="VALID", use_bias=False,
                                dtype=self.dtype, name="red")(x))
        outs = []
        for i, (ps, k) in enumerate(((1, 1), (3, 3), (3, 3), (5, 5))):
            p = y.mean(axis=(1, 2), keepdims=True) if ps == 1 else \
                jax.image.resize(y, (y.shape[0], ps, ps, y.shape[-1]), "linear")
            p = nn.Conv(self.c_, (k, k), padding="SAME", feature_group_count=self.c_,
                        use_bias=False, dtype=self.dtype, name=f"b{i}")(p)
            outs.append(p.mean(axis=(1, 2), keepdims=True))
        g = jnp.concatenate(outs, -1)
        g = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="exp")(g)
        return x * jax.nn.sigmoid(g)


class ImageEnhancer(ConvBase):
    """Image-space enhancement prefix (serves the reference's restoration
    front-ends — ADNet/AirNet/FFA/HAT/IAT/RIDNET/MB_TaylorFormer/CPA_arch
    yaml rows, all `[-1, 1, X, []]` with 3-ch in/out): a compact residual
    conv enhancer. DECLARED APPROXIMATION (COVERAGE.md): the reference
    wraps full denoise/dehaze/low-light networks; this recreates the
    pipeline slot (learned 3->w->3 residual enhancement), not each paper."""

    width: int = 16
    blocks: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = Conv(c2=self.width, k=3, dtype=self.dtype, name="head")(x, train)
        for i in range(self.blocks):
            z = Conv(c2=self.width, k=3, dtype=self.dtype, name=f"b{i}_1")(y, train)
            z = Conv(c2=self.width, k=3, act=False, dtype=self.dtype, name=f"b{i}_2")(z, train)
            y = y + z
        d = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name="tail")(y)
        return x + d


class PatchMerging(ConvBase):
    """Swin downsample (reference SwinTransformer.py PatchMerging): 2x2
    space-to-depth, LN, linear 4C -> c2."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        return nn.Dense(self.c2, use_bias=False, dtype=self.dtype, name="reduction")(y)


class ShapeAlignConv(ConvBase):
    """SoftHGNN shape align (reference F2SoftHG.py:140): 2x avg-pool
    downsample + 1x1 channel doubling."""

    adjust: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        if self.adjust:
            y = Conv(c2=2 * x.shape[-1], k=1, dtype=self.dtype, name="conv")(y, train)
        return y


class DASI(ConvBase):
    """Dimension-aware selective integration (reference block.py:7637): high/
    low/mid features aligned to the mid resolution and high channel count,
    attention-weighted fusion + 3-way concat -> c2. Inputs [high, low, mid]."""

    c2: int = 0
    c_high: int = 0

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x_high, x_low, x_mid = xs
        ch = self.c_high or x_high.shape[-1]
        b, hm, wm, _ = x_mid.shape
        lo = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_low")(x_low)
        lo = jax.image.resize(lo, (b, hm, wm, ch), "bilinear")
        mid = nn.Conv(ch, (1, 1), dtype=self.dtype, name="conv_mid")(x_mid)
        hi = nn.Conv(ch, (1, 1), dtype=self.dtype, name="conv_high")(x_high)
        hi = jax.image.resize(hi, (b, hm, wm, ch), "bilinear")
        a = mid.mean(axis=(1, 2), keepdims=True)
        a = jax.nn.relu(nn.Conv(ch // 4, (1, 1), dtype=self.dtype, name="att1")(a))
        a = jax.nn.sigmoid(nn.Conv(ch, (1, 1), dtype=self.dtype, name="att2")(a))
        merged = jnp.concatenate([lo, mid, hi], -1)
        y = nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="merge")(merged)
        return jax.nn.relu(_bn(self, "bn", y, train))


class MergeConv(ConvBase):
    """Concat two inputs + 1x1 fuse back to the first's width (reference
    F2SoftHG.py:154)."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c = xs[0].shape[-1]
        return Conv(c2=c, k=1, dtype=self.dtype,
                    name="conv")(jnp.concatenate(list(xs), -1), train)


class IEMA(ConvBase):
    """Grouped multi-branch attention (reference block.py:7537, MASF-YOLO):
    h/w pooled context convs fused back; grouped DW 3x3 / 1x5 / 5x1 / identity
    branches; cross-spatial softmax reweighting; 1x1 to c2."""

    c2: int = 0
    groups: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        xp = Conv(c2=c, k=1, dtype=self.dtype, name="x_conv")(x.mean(1, keepdims=True), train)
        yp = Conv(c2=c, k=1, dtype=self.dtype, name="y_conv")(x.mean(2, keepdims=True), train)
        ctxm = Conv(c2=c, k=1, dtype=self.dtype, name="concat_conv")(
            jnp.concatenate([jnp.broadcast_to(xp, x.shape),
                             jnp.broadcast_to(yp, x.shape)], -1), train)
        g = self.groups if c % self.groups == 0 else 1
        bc = c // g
        t = ctxm.reshape(b, h, w, g, bc).transpose(0, 3, 1, 2, 4).reshape(b * g, h, w, bc)
        b3 = DWConv(c2=bc, k=3, dtype=self.dtype, name="dw3")(t, train)
        b15 = nn.Conv(bc, (1, 5), padding="SAME", feature_group_count=bc,
                      dtype=self.dtype, name="dw15")(t)
        b51 = nn.Conv(bc, (5, 1), padding="SAME", feature_group_count=bc,
                      dtype=self.dtype, name="dw51")(t)
        m = jnp.concatenate([b3, jax.nn.silu(b15), jax.nn.silu(b51), t], -1)
        m = m.reshape(b, g, h, w, 4 * bc)[:, 0] if g == 1 else \
            m.reshape(b, g, h, w, 4 * bc).transpose(0, 2, 3, 1, 4).reshape(b, h, w, g * 4 * bc)
        m = Conv(c2=c, k=1, dtype=self.dtype, name="merge")(m, train)
        gate = jax.nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, name="rw1")(
            jax.nn.softmax(m.mean(1, keepdims=True), axis=2)))
        y = m * jnp.broadcast_to(gate, m.shape)
        return jax.nn.sigmoid(nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="rw2")(y)) * \
            (y if y.shape[-1] == self.c2 else
             nn.Conv(self.c2, (1, 1), use_bias=False, dtype=self.dtype, name="proj")(y))
