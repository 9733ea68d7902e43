"""ASF-YOLO and AFPN neck modules (reference ASFyolo.py, AFPN.py).

- Zoom_cat / ScalSeq / Add / attention_model: ASF-YOLO's scale-sequence
  fusion (the 3D conv over the scale axis becomes a shared 1x1 + max over
  the stacked-scale axis — identical math for a (1,1,1) kernel).
- ASFF_2/ASFF_3: adaptively-weighted same-resolution fusion.
- AFPN: asymptotic progressive FPN over [P3, P4, P5], emitting 3 fused maps
  through the multi-output slot mechanism.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import BN_EPS, BN_MOMENTUM, Conv, ConvBase


def _bn(mod, name, x, train):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        use_fast_variance=False, epsilon=BN_EPS, dtype=mod.dtype,
                        name=name, parent=mod)(x)


def _resize(x, h, w, method="nearest"):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method=method)


class Zoom_cat(ConvBase):
    """Fuse (large, mid, small) maps onto the mid scale: l via max+avg pool,
    s via nearest upsample, channel concat (reference ASFyolo.py:32)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        l, m, s = x
        h, w = m.shape[1], m.shape[2]
        ratio = l.shape[1] // h
        lm = nn.max_pool(l, (ratio, ratio), (ratio, ratio), padding="VALID") + \
            nn.avg_pool(l, (ratio, ratio), (ratio, ratio), padding="VALID")
        su = _resize(s, h, w)
        return jnp.concatenate([lm, m, su], -1)


class ScalSeq(ConvBase):
    """Scale-sequence fusion (reference ASFyolo.py:51): project P3/P4/P5 to a
    common width, align to P3 size, stack on a scale axis, shared (1,1,1)
    conv + BN + leaky-relu, then max over the scale axis."""

    channel: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        p3, p4, p5 = x
        h, w = p3.shape[1], p3.shape[2]
        a = Conv(c2=self.channel, k=1, dtype=self.dtype, name="conv0")(p3, train)
        b = _resize(Conv(c2=self.channel, k=1, dtype=self.dtype, name="conv1")(p4, train), h, w)
        c = _resize(Conv(c2=self.channel, k=1, dtype=self.dtype, name="conv2")(p5, train), h, w)
        stack = jnp.stack([a, b, c], axis=1)  # (B, 3, H, W, C)
        # (1,1,1) Conv3d == one shared Dense over channels
        y = nn.Dense(self.channel, dtype=self.dtype, name="conv3d")(stack)
        bsz = y.shape[0]
        y = _bn(self, "bn3d", y.reshape(bsz, 3 * h, w, self.channel), train)
        y = jax.nn.leaky_relu(y, 0.1).reshape(bsz, 3, h, w, self.channel)
        return y.max(axis=1)  # MaxPool3d over the scale axis


class ASFAdd(ConvBase):
    """x[0] + x[1] (reference ASFyolo.py:81 Add)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x[0] + x[1]


class attention_model(ConvBase):
    """ASF attention: ECA-style channel gate then H/W-profile local gate
    (reference ASFyolo.py:92 channel_att + :111 local_att)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        # reference forward takes [input1, input2]: channel_att(input1) +
        # input2, then local_att on the sum (ASFyolo.py:153-158); a single
        # tensor degrades to input2 = 0
        x, x2 = (x[0], x[1]) if isinstance(x, (list, tuple)) else (x, None)
        c = x.shape[-1]
        k = int(abs((math.log2(max(c, 2)) + 1) / 2))
        k = k if k % 2 else k + 1
        g = x.mean(axis=(1, 2))[:, :, None]  # (B, C, 1)
        g = nn.Conv(1, (k,), padding=((k // 2, k // 2),), use_bias=False,
                    dtype=self.dtype, name="eca")(g)[..., 0]
        x = x * jax.nn.sigmoid(g)[:, None, None, :]
        if x2 is not None:
            x = x + x2
        # local att: pooled H and W profiles -> shared bottleneck -> two gates
        hgt, wid = x.shape[1], x.shape[2]
        xh = x.mean(axis=2)  # (B, H, C)
        xw = x.mean(axis=1)  # (B, W, C)
        cat = jnp.concatenate([xh, xw], axis=1)[:, :, None, :]  # (B, H+W, 1, C)
        mid = nn.Conv(max(c // self.reduction, 4), (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv_1x1")(cat)
        mid = jax.nn.relu(_bn(self, "bn", mid, train))
        sh = jax.nn.sigmoid(nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                                    name="F_h")(mid[:, :hgt]))
        sw = jax.nn.sigmoid(nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                                    name="F_w")(mid[:, hgt:]))
        return x * sh[:, :, 0, :][:, :, None, :] * sw[:, :, 0, :][:, None, :, :]


def _asff(mod, inputs, train, prefix, compress: int = 8):
    """Adaptive spatial feature fusion over same-resolution maps
    (reference AFPN.py:119 ASFF_2 / :149 ASFF_3)."""
    n = len(inputs)
    c = inputs[0].shape[-1]
    ws = [Conv(c2=compress, k=1, dtype=mod.dtype, name=f"{prefix}_w{i}", parent=mod)(v, train)
          for i, v in enumerate(inputs)]
    lw = nn.Conv(n, (1, 1), dtype=mod.dtype, name=f"{prefix}_levels", parent=mod)(
        jnp.concatenate(ws, -1))
    lw = jax.nn.softmax(lw, axis=-1)
    fused = sum(v * lw[..., i:i + 1] for i, v in enumerate(inputs))
    return Conv(c2=c, k=3, dtype=mod.dtype, name=f"{prefix}_conv", parent=mod)(fused, train)


class ASFF_2(ConvBase):
    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _asff(self, list(x), train, "asff2")


class ASFF_3(ConvBase):
    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _asff(self, list(x), train, "asff3")


class _AFPNBlock(ConvBase):
    """Two 3x3 conv-BN-ReLU with residual (AFPN BasicBlock, AFPN.py:35)."""

    dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(c2=self.dim, k=3, act="relu", dtype=self.dtype, name="c1")(x, train)
        y = Conv(c2=self.dim, k=3, act=False, dtype=self.dtype, name="c2")(y, train)
        return jax.nn.relu(x + y)


class AFPN(ConvBase):
    """Asymptotic feature-pyramid network over [P3, P4, P5] (reference
    AFPN.py:366): compress each level, progressively fuse pairs then the
    triple with ASFF weights, refine with residual blocks, expand back.
    Emits 3 maps via the multi-output slot protocol."""

    c2: int = 256
    n: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        p3, p4, p5 = x
        dims = [self.c2 // 4, self.c2 // 2, self.c2]
        f3 = Conv(c2=dims[0], k=1, dtype=self.dtype, name="compress3")(p3, train)
        f4 = Conv(c2=dims[1], k=1, dtype=self.dtype, name="compress4")(p4, train)
        f5 = Conv(c2=dims[2], k=1, dtype=self.dtype, name="compress5")(p5, train)

        # stage 1: fuse P3<->P4
        h3, w3 = f3.shape[1], f3.shape[2]
        f4_up = Conv(c2=dims[0], k=1, dtype=self.dtype, name="f4_up")(
            _resize(f4, h3, w3), train)
        f3_dn = Conv(c2=dims[1], k=2, s=2, p=0, dtype=self.dtype, name="f3_dn")(f3, train)
        f3 = _asff(self, [f3, f4_up], train, "s1_l3")
        f4 = _asff(self, [f3_dn, f4], train, "s1_l4")
        for i in range(self.n):
            f3 = _AFPNBlock(dim=dims[0], dtype=self.dtype, name=f"b3_{i}")(f3, train)
            f4 = _AFPNBlock(dim=dims[1], dtype=self.dtype, name=f"b4_{i}")(f4, train)

        # stage 2: fuse all three at each resolution
        h4, w4 = f4.shape[1], f4.shape[2]
        h5, w5 = f5.shape[1], f5.shape[2]
        at3 = [f3,
               Conv(c2=dims[0], k=1, dtype=self.dtype, name="a3_f4")(_resize(f4, h3, w3), train),
               Conv(c2=dims[0], k=1, dtype=self.dtype, name="a3_f5")(_resize(f5, h3, w3), train)]
        at4 = [Conv(c2=dims[1], k=2, s=2, p=0, dtype=self.dtype, name="a4_f3")(f3, train),
               f4,
               Conv(c2=dims[1], k=1, dtype=self.dtype, name="a4_f5")(_resize(f5, h4, w4), train)]
        at5 = [Conv(c2=dims[2], k=4, s=4, p=0, dtype=self.dtype, name="a5_f3")(f3, train),
               Conv(c2=dims[2], k=2, s=2, p=0, dtype=self.dtype, name="a5_f4")(f4, train),
               f5]
        o3 = _asff(self, at3, train, "s2_l3")
        o4 = _asff(self, at4, train, "s2_l4")
        o5 = _asff(self, at5, train, "s2_l5")
        o3 = Conv(c2=self.c2, k=1, dtype=self.dtype, name="out3")(o3, train)
        o4 = Conv(c2=self.c2, k=1, dtype=self.dtype, name="out4")(o4, train)
        o5 = Conv(c2=self.c2, k=1, dtype=self.dtype, name="out5")(o5, train)
        return [o3, o4, o5]
