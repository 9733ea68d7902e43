"""Core convolution family — flax.linen, NHWC, TPU-native.

Behavioral parity with the reference conv zoo (ultralytics/nn/modules/conv.py:
Conv:147, DWConv:411, ConvTranspose:445, Focus:497, GhostConv:545, LightConv,
ChannelAttention:746, SpatialAttention:783, CBAM:817, Concat:850, Index:878),
re-designed for XLA:

- NHWC layout (TPU conv native), channel concat on axis -1;
- input channels are inferred lazily by linen, so no c1 plumbing is needed
  anywhere (this deletes the reference's channel-inference bookkeeping);
- Conv-BN-SiLU is left as conv+BN+elementwise for XLA to fuse; BN folding for
  inference is a pure param transform (see nn/fuse.py).

BatchNorm matches torch semantics: eps=1e-3, torch momentum 0.03 == flax
momentum 0.97.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

BN_MOMENTUM = 0.97  # torch momentum 0.03
BN_EPS = 1e-3
# Train-mode batch-statistics algorithm (eval mode uses running stats, so
# this NEVER affects inference/parity numerics). True = one-pass
# E[x^2]-E[x]^2 — measured +11.5% on the full yolov8s train step at bs128
# (tools/perf_bwd_probe.py: grad 328.6 -> 366.3 imgs/s) because the backward
# re-reads activations once instead of twice per BN. False = torch's
# two-pass form for bit-exact train-step comparison; mathematically
# identical, numerically ~1e-6 apart on normalized activations.
BN_FAST_VARIANCE = [True]


def autopad(k, p=None, d: int = 1):
    """'same'-style padding for kernel k with dilation d (reference conv.py:autopad)."""
    if d > 1:
        k = d * (k - 1) + 1 if isinstance(k, int) else [d * (x - 1) + 1 for x in k]
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


def _pair(x):
    return (x, x) if isinstance(x, int) else tuple(x)


class ConvBase(nn.Module):
    """Shared defaults for all modules: compute dtype (bf16 on TPU) is set via `dtype`."""

    dtype: Any = jnp.float32


def conv_bn_act(mod, x, c2, k, s, p, g, d, act, train):
    """Shared Conv2d(no bias)+BN+act body; creates submodules named conv/bn on `mod`."""
    pp = autopad(k, p, d)
    pads = tuple((q, q) for q in _pair(pp))
    x = nn.Conv(
        features=c2,
        kernel_size=_pair(k),
        strides=_pair(s),
        padding=pads,
        feature_group_count=g,
        kernel_dilation=_pair(d),
        use_bias=False,
        dtype=mod.dtype,
        name="conv",
        parent=mod,
    )(x)
    x = nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        use_fast_variance=BN_FAST_VARIANCE[0],
        epsilon=BN_EPS,
        dtype=mod.dtype,
        name="bn",
        parent=mod,
    )(x)
    return apply_act(x, act)


class Conv(ConvBase):
    """Conv2d(no bias) + BatchNorm + SiLU — THE hot block (reference conv.py:147)."""

    c2: int = 0
    k: Any = 1
    s: Any = 1
    p: Any = None
    g: int = 1
    d: int = 1
    act: Any = True  # True => SiLU, None/False => identity, or a callable

    @nn.compact
    def __call__(self, x, train: bool = False):
        return conv_bn_act(self, x, self.c2, self.k, self.s, self.p, self.g, self.d, self.act, train)


# Model-wide default activation, overridable by the YAML `activation:` key
# (reference tasks.py:2436 sets Conv.default_act via eval(act); same
# last-parse-wins global semantics here). None = SiLU.
DEFAULT_ACT = [None]

_ACT_NAMES = {
    "silu": jax.nn.silu, "relu": jax.nn.relu, "relu6": jax.nn.relu6,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01), "gelu": jax.nn.gelu,
    "hardswish": jax.nn.hard_swish, "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh, "identity": lambda x: x,
}


def resolve_act(spec):
    """'torch.nn.ReLU()' / 'nn.SiLU()' / 'ReLU' -> jax activation fn."""
    name = str(spec).split("(")[0].split(".")[-1].lower()
    if name not in _ACT_NAMES:
        raise ValueError(f"unsupported activation {spec!r}; known: {sorted(_ACT_NAMES)}")
    return _ACT_NAMES[name]


def apply_act(x, act):
    if act is True:
        return DEFAULT_ACT[0](x) if DEFAULT_ACT[0] is not None else jax.nn.silu(x)
    if callable(act):
        return act(x)
    return x


class DWConv(ConvBase):
    """Depth-wise Conv: groups == gcd(c1, c2) (reference conv.py:411)."""

    c2: int = 0
    k: Any = 1
    s: Any = 1
    p: Any = None
    d: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(x.shape[-1], self.c2)
        return conv_bn_act(self, x, self.c2, self.k, self.s, self.p, g, self.d, self.act, train)


def _implicit_init(mean: float, std: float):
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)
    return init


class ImplicitA(ConvBase):
    """YOLOR implicit knowledge, additive: a learned per-channel offset added
    to the feature map (reference conv.py:1130 ImplicitA, init N(0, 0.02))."""

    mean: float = 0.0
    std: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = False):
        imp = self.param("implicit", _implicit_init(self.mean, self.std),
                         (1, 1, 1, x.shape[-1]))
        return x + imp.astype(x.dtype)


class ImplicitM(ConvBase):
    """YOLOR implicit knowledge, multiplicative: a learned per-channel gain
    (reference conv.py:1143 ImplicitM, init N(1, 0.02))."""

    mean: float = 1.0
    std: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = False):
        imp = self.param("implicit", _implicit_init(self.mean, self.std),
                         (1, 1, 1, x.shape[-1]))
        return x * imp.astype(x.dtype)


class ConvTranspose(ConvBase):
    """ConvTranspose2d + optional BN + act (reference conv.py:445)."""

    c2: int = 0
    k: int = 2
    s: int = 2
    p: int = 0
    bn: bool = True
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # lax.conv_transpose pads the DILATED input, so torch's
        # ConvTranspose2d padding p maps to lax padding k-1-p per side:
        # out = (in-1)*s + 2*(k-1-p) - k + 2 = (in-1)*s + k - 2p (torch formula).
        tp = self.k - 1 - self.p
        x = nn.ConvTranspose(
            features=self.c2,
            kernel_size=_pair(self.k),
            strides=_pair(self.s),
            padding=((tp, tp), (tp, tp)),
            use_bias=not self.bn,
            dtype=self.dtype,
            transpose_kernel=True,  # matches torch ConvTranspose2d weight semantics
            name="conv_transpose",
        )(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
        use_fast_variance=False, epsilon=BN_EPS,
                dtype=self.dtype, name="bn",
            )(x)
        return apply_act(x, self.act)


class Focus(ConvBase):
    """Space-to-depth 2x then Conv (reference conv.py:497). wh -> c."""

    c2: int = 0
    k: int = 1
    s: int = 1
    p: Any = None
    g: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NHWC: gather the 4 pixel phases then concat on channels in torch order.
        patches = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]],
            axis=-1,
        )
        return Conv(c2=self.c2, k=self.k, s=self.s, p=self.p, g=self.g, act=self.act,
                    dtype=self.dtype, name="conv")(patches, train)


class GhostConv(ConvBase):
    """Ghost convolution: primary conv + cheap depthwise (reference conv.py:545)."""

    c2: int = 0
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c2=c_, k=self.k, s=self.s, g=self.g, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y2 = Conv(c2=c_, k=5, s=1, g=c_, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class LightConv(ConvBase):
    """1x1 conv (no act) + depthwise k conv w/ ReLU (reference conv.py)."""

    c2: int = 0
    k: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(c2=self.c2, k=1, act=False, dtype=self.dtype, name="conv1")(x, train)
        return DWConv(c2=self.c2, k=self.k, act=jax.nn.relu, dtype=self.dtype, name="conv2")(x, train)


class ChannelAttention(ConvBase):
    """SE-style channel attention (reference conv.py:746)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        att = nn.Conv(features=x.shape[-1], kernel_size=(1, 1), use_bias=True, dtype=self.dtype, name="fc")(pooled)
        return x * jax.nn.sigmoid(att)


class SpatialAttention(ConvBase):
    """Spatial attention over channel mean+max maps (reference conv.py:783)."""

    k: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        att = nn.Conv(
            features=1, kernel_size=_pair(self.k),
            padding=[(self.k // 2, self.k // 2)] * 2, use_bias=False,
            dtype=self.dtype, name="cv1",
        )(jnp.concatenate([avg, mx], axis=-1))
        return x * jax.nn.sigmoid(att)


class CBAM(ConvBase):
    """Channel + spatial attention (reference conv.py:817)."""

    c2: int = 0  # unused; kept for registry arg compat
    k: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttention(dtype=self.dtype, name="channel_attention")(x, train)
        return SpatialAttention(k=self.k, dtype=self.dtype, name="spatial_attention")(x, train)


class Concat(ConvBase):
    """Concatenate a list of feature maps (reference conv.py:850). dim 1 (torch NCHW
    channels) maps to axis -1 in NHWC."""

    dim: int = 1

    @nn.compact
    def __call__(self, xs, train: bool = False):
        axis = -1 if self.dim == 1 else self.dim
        return jnp.concatenate(xs, axis=axis)


class Index(ConvBase):
    """Select one output from a multi-output producer (reference conv.py:878)."""

    c2: int = 0
    index: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x[self.index]


class Upsample(ConvBase):
    """nn.Upsample(scale_factor, mode='nearest') equivalent."""

    scale: int = 2
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        if self.mode == "nearest":
            # exact nearest 2x via repeat (cheaper than jax.image.resize)
            return jnp.repeat(jnp.repeat(x, self.scale, axis=1), self.scale, axis=2)
        return jax.image.resize(x, (b, h * self.scale, w * self.scale, c), method=self.mode)


def max_pool_same(x, k: int, s: int = 1):
    """MaxPool2d(k, stride=s, padding=k//2) torch semantics in NHWC."""
    p = k // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype in (jnp.float32, jnp.bfloat16, jnp.float16) else jnp.finfo(jnp.float32).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )


class MaxPool2d(ConvBase):
    """torch nn.MaxPool2d(k, s, p) equivalent (used by yolov3-tiny-style yamls)."""

    k: int = 2
    s: int = 2
    p: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            (1, self.k, self.k, 1), (1, self.s, self.s, 1),
            ((0, 0), (self.p, self.p), (self.p, self.p), (0, 0)),
        )


class ZeroPad2d(ConvBase):
    """torch nn.ZeroPad2d((l, r, t, b)) equivalent."""

    padding: Any = (0, 1, 0, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        l, r, t, b = self.padding
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class RepConv(ConvBase):
    """RepVGG-style conv: train-time 3x3 + 1x1 (+identity BN) branches summed,
    fusable to a single 3x3 at deploy (reference conv.py:587). The fusion is a
    pure param transform; training keeps the multi-branch form."""

    c2: int = 0
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = True
    bn_identity: bool = False  # identity-BN branch when c1==c2 and s==1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = (Conv(c2=self.c2, k=self.k, s=self.s, g=self.g, act=False, dtype=self.dtype,
                  name="conv1")(x, train)
             + Conv(c2=self.c2, k=1, s=self.s, p=0, g=self.g, act=False, dtype=self.dtype,
                    name="conv2")(x, train))
        if self.bn_identity and x.shape[-1] == self.c2 and self.s == 1:
            y = y + nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                                 use_fast_variance=False, epsilon=BN_EPS,
                                 dtype=self.dtype, name="bn")(x)
        return apply_act(y, self.act)
