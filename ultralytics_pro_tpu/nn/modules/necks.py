"""Integration necks: BiFPN, Slimneck (GSConv), damo-yolo GiraffeNeck CSPStage,
PPYOLOE CSPResNet — flax.linen, NHWC.

Behavioral parity with the reference integration modules
(ultralytics/nn/modules/BiFPN.py, Slimneck.py, damoyolo.py, ppyolo.py),
redesigned channel-last: the GSConv channel shuffle is an even/odd gather on
the last axis instead of the reshape/permute dance, and all fusions are
static-shape.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase, max_pool_same


def _act(name):
    return {
        "swish": jax.nn.silu, "silu": jax.nn.silu, "relu": jax.nn.relu,
        "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
        "hardsigmoid": jax.nn.hard_sigmoid, None: lambda x: x, False: lambda x: x,
    }[name]


# ---------------------------------------------------------------- BiFPN ----
class Bi_FPN(ConvBase):
    """Learned fast-normalized weighted sum of N inputs (BiFPN.py:9)."""

    length: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(x) if isinstance(x, (list, tuple)) else self.length
        w = self.param("weight", nn.initializers.ones, (n,))
        wn = w / (jnp.sum(jax.nn.silu(w)) + 1e-4)
        return sum(wn[i] * x[i] for i in range(n))


class Concat_BiFPN(ConvBase):
    """Weighted 2-input concat (BiFPN.py:24)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.param("w", nn.initializers.ones, (3,))
        wn = w / (jnp.sum(w) + 1e-4)
        return jnp.concatenate([wn[0] * x[0], wn[1] * x[1]], axis=-1)


# ------------------------------------------------------------- Slimneck ----
class GSConv(ConvBase):
    """Slim-neck grouped-shuffle conv (Slimneck.py:28): half the channels via
    a dense conv, the other half a cheap 5x5 depthwise of it, then an
    interleaving channel shuffle (even/odd gather on the channel axis).
    Mish activation like the reference's local Conv."""

    c2: int = 0
    k: int = 1
    s: int = 1
    act: Any = "mish"

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = _act(self.act) if isinstance(self.act, (str, type(None), bool)) else self.act
        c_ = self.c2 // 2
        x1 = Conv(c2=c_, k=self.k, s=self.s, act=a, dtype=self.dtype, name="cv1")(x, train)
        x2 = Conv(c2=c_, k=5, g=c_, act=a, dtype=self.dtype, name="cv2")(x1, train)
        y = jnp.concatenate([x1, x2], -1)
        # torch shuffle reshape(b*n/2,2,hw).permute(1,0,2): even channels then
        # odd channels
        return jnp.concatenate([y[..., 0::2], y[..., 1::2]], -1)


class GSBottleneck(ConvBase):
    """GSConv bottleneck with a 1x1 shortcut (Slimneck.py:64)."""

    c2: int = 0
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = GSConv(c2=c_, k=1, dtype=self.dtype, name="gs1")(x, train)
        y = GSConv(c2=self.c2, k=3, act=False, dtype=self.dtype, name="gs2")(y, train)
        sc = Conv(c2=self.c2, k=1, act=False, dtype=self.dtype, name="shortcut")(x, train)
        return y + sc


class VoVGSCSP(ConvBase):
    """CSP stage over GSBottlenecks (Slimneck.py:92)."""

    c2: int = 0
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = _act("mish")
        c_ = int(self.c2 * self.e)
        x1 = Conv(c2=c_, k=1, act=a, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            x1 = GSBottleneck(c2=c_, e=1.0, dtype=self.dtype, name=f"gsb_{i}")(x1, train)
        y = Conv(c2=c_, k=1, act=a, dtype=self.dtype, name="cv2")(x, train)
        return Conv(c2=self.c2, k=1, act=a, dtype=self.dtype, name="cv3")(
            jnp.concatenate([y, x1], -1), train)


# ------------------------------------------------------------- damo-yolo ----
class BasicBlock_3x3_Reverse(ConvBase):
    """RepConv 3x3 -> Conv 3x3 with residual (damoyolo.py:136). swish acts."""

    c2: int = 0
    hidden_ratio: float = 1.0
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.conv import RepConv

        ch_hidden = int(x.shape[-1] * self.hidden_ratio)
        y = RepConv(c2=ch_hidden, k=3, act=jax.nn.silu, dtype=self.dtype, name="conv2")(x, train)
        y = Conv(c2=self.c2, k=3, act=jax.nn.silu, dtype=self.dtype, name="conv1")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class CSPStage(ConvBase):
    """Damo-yolo GiraffeNeck CSP stage (damoyolo.py:184): split 1x1 convs,
    chain of BasicBlock_3x3_Reverse with every intermediate output kept and
    concatenated (dense aggregation), optional mid-chain SPP."""

    c2: int = 0
    n: int = 1
    hidden_ratio: float = 1.0
    spp: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch_first = self.c2 // 2
        ch_mid = self.c2 - ch_first
        y1 = Conv(c2=ch_first, k=1, act=jax.nn.silu, dtype=self.dtype, name="conv1")(x, train)
        y2 = Conv(c2=ch_mid, k=1, act=jax.nn.silu, dtype=self.dtype, name="conv2")(x, train)
        mid = [y1]
        for i in range(self.n):
            y2 = BasicBlock_3x3_Reverse(c2=ch_mid, hidden_ratio=self.hidden_ratio,
                                        shortcut=True, dtype=self.dtype,
                                        name=f"convs_{i}")(y2, train)
            if i == (self.n - 1) // 2 and self.spp:
                pooled = jnp.concatenate(
                    [y2] + [max_pool_same(y2, k) for k in (5, 9, 13)], -1)
                y2 = Conv(c2=ch_mid, k=1, act=jax.nn.silu, dtype=self.dtype,
                          name="convs_spp")(pooled, train)
            mid.append(y2)
        return Conv(c2=self.c2, k=1, act=jax.nn.silu, dtype=self.dtype, name="conv3")(
            jnp.concatenate(mid, -1), train)


# --------------------------------------------------------------- ppyoloe ----
class ConvBNLayer(ConvBase):
    """Conv+BN+act (ppyolo.py:85). NOTE: reference default padding=0."""

    c2: int = 0
    k: int = 3
    s: int = 1
    p: Any = None
    act: str = "swish"

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Conv(c2=self.c2, k=self.k, s=self.s, p=self.p, act=_act(self.act),
                    dtype=self.dtype, name="conv")(x, train)


class PPRepVggBlock(ConvBase):
    """ppyoloe rep block: 3x3 + 1x1 parallel convs (ppyolo.py:141)."""

    c2: int = 0
    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.conv import RepConv

        return RepConv(c2=self.c2, k=3, act=_act(self.act), dtype=self.dtype,
                       name="rep")(x, train)


class PPBasicBlock(ConvBase):
    """ConvBN 3x3 + RepVgg with residual (ppyolo.py:244)."""

    c2: int = 0
    act: str = "swish"
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNLayer(c2=self.c2, k=3, p=1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        y = PPRepVggBlock(c2=self.c2, act=self.act, dtype=self.dtype, name="conv2")(y, train)
        return x + y if self.shortcut else y


class CSPResNet_CBS(ConvBase):
    """ppyoloe large stem: 3 stride-2/1 ConvBN layers (ppyolo.py:183)."""

    c2: int = 64
    act: str = "swish"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2
        x = ConvBNLayer(c2=c // 2, k=3, s=2, p=1, act=self.act, dtype=self.dtype, name="stem0")(x, train)
        x = ConvBNLayer(c2=c // 2, k=3, s=1, p=1, act=self.act, dtype=self.dtype, name="stem1")(x, train)
        return ConvBNLayer(c2=c, k=3, s=1, p=1, act=self.act, dtype=self.dtype, name="stem2")(x, train)


class CSPResNet(ConvBase):
    """ppyoloe CSPRes stage (ppyolo.py:172 -> CSPResStage:225): optional
    stride-2 down conv, split 1x1s, n PPBasicBlocks, EffectiveSE attention
    (backbone flavor) or plain neck flavor, 1x1 out."""

    c2: int = 0
    n: int = 1
    conv_down: int = 2  # stride (2 = downsample)
    infor: str = "backbone"
    act: str = "swish"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        if self.infor == "neck":
            _c2 = self.c2 // 2
            y1 = ConvBNLayer(c2=_c2, k=1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
            y2 = ConvBNLayer(c2=_c2, k=1, act=self.act, dtype=self.dtype, name="conv2")(x, train)
            for i in range(self.n):
                y2 = PPBasicBlock(c2=_c2, act=self.act, shortcut=False, dtype=self.dtype,
                                  name=f"blocks_{i}")(y2, train)
            y = jnp.concatenate([y1, y2], -1)
            return ConvBNLayer(c2=self.c2, k=1, act=self.act, dtype=self.dtype, name="conv3")(y, train)

        ch_mid = (c1 + self.c2) // 2
        if self.conv_down == 2:
            x = ConvBNLayer(c2=ch_mid, k=3, s=2, p=1, act=self.act, dtype=self.dtype,
                            name="conv_down")(x, train)
        y1 = ConvBNLayer(c2=ch_mid // 2, k=1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        y2 = ConvBNLayer(c2=ch_mid // 2, k=1, act=self.act, dtype=self.dtype, name="conv2")(x, train)
        for i in range(self.n):
            y2 = PPBasicBlock(c2=ch_mid // 2, act=self.act, shortcut=True, dtype=self.dtype,
                              name=f"blocks_{i}")(y2, train)
        y = jnp.concatenate([y1, y2], -1)
        # EffectiveSE (ppyolo EffectiveSELayer w/ hardsigmoid)
        s = y.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(y.shape[-1], (1, 1), dtype=self.dtype, name="attn_fc")(s)
        y = y * jax.nn.hard_sigmoid(s)
        return ConvBNLayer(c2=self.c2, k=1, act=self.act, dtype=self.dtype, name="conv3")(y, train)


class ResSPP(ConvBase):
    """ppyoloe neck SPP with res blocks (ppyolo.py:6): n controls the block
    layout around the 5/9/13 maxpool pyramid."""

    c2: int = 384
    n: int = 3
    act: str = "swish"
    k: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2 if self.c2 == 1024 else self.c2
        y = ConvBNLayer(c2=c_, k=1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        n_pre = {1: 1, 2: 1, 3: 2, 4: 2}.get(self.n, 2)
        n_post = {1: 0, 2: 1, 3: 1, 4: 2}.get(self.n, 1)
        bi = 0
        for _ in range(n_pre):
            y = PPBasicBlock(c2=c_, act=self.act, shortcut=False, dtype=self.dtype,
                             name=f"bb_{bi}")(y, train)
            bi += 1
        y = jnp.concatenate([y] + [max_pool_same(y, k) for k in self.k], -1)
        y = ConvBNLayer(c2=c_, k=1, act=self.act, dtype=self.dtype, name="conv2")(y, train)
        for _ in range(n_post):
            y = PPBasicBlock(c2=c_, act=self.act, shortcut=False, dtype=self.dtype,
                             name=f"bb_{bi}")(y, train)
            bi += 1
        return y


# ---------------------------------------------------------- mobilenet v3 ----
class conv_bn_hswish(ConvBase):
    """3x3 Conv+BN+Hardswish stem (reference block.py:5144)."""

    c2: int = 16
    s: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Conv(c2=self.c2, k=3, s=self.s, act=jax.nn.hard_swish,
                    dtype=self.dtype, name="conv")(x, train)


class MobileNetV3_InvertedResidual(ConvBase):
    """MobileNetV3 bneck (reference block.py:5205): optional pw expand, dw
    conv, optional SE, pw-linear project, residual when stride 1 and c1==c2."""

    c2: int = 16
    hidden: int = 16
    k: int = 3
    s: int = 1
    use_se: bool = False
    use_hs: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = jax.nn.hard_swish if self.use_hs else jax.nn.relu
        c1 = x.shape[-1]
        y = x
        if c1 != self.hidden:
            y = Conv(c2=self.hidden, k=1, act=a, dtype=self.dtype, name="pw")(y, train)
        y = Conv(c2=self.hidden, k=self.k, s=self.s, g=self.hidden, act=False,
                 dtype=self.dtype, name="dw")(y, train)
        if c1 == self.hidden:
            y = a(y)
        if self.use_se:
            s = y.mean(axis=(1, 2), keepdims=True)
            c_se = max(self.hidden // 4, 8)
            s = nn.Dense(c_se, dtype=self.dtype, name="se_fc1")(s)
            s = jax.nn.relu(s)
            s = nn.Dense(self.hidden, dtype=self.dtype, name="se_fc2")(s)
            y = y * jax.nn.hard_sigmoid(s)
        if c1 != self.hidden:
            y = a(y)
        y = Conv(c2=self.c2, k=1, act=False, dtype=self.dtype, name="pw_linear")(y, train)
        if self.s == 1 and c1 == self.c2:
            y = x + y
        return y
