"""Deformable-conv family, tranche 2 — DCNv3, DySnakeConv, SAConv, ARConv.

TPU formulation: every irregular-sampling op becomes 4-corner vectorized
bilinear gathers (ops/deform.py) feeding MXU contractions — no grid_sample,
no data-dependent shapes. References:
- DCNv3            reference dcnv3.py:185 (InternImage; softmax-masked grouped
                   sampling + in/out projections), DCNV3_YoLo block.py:5757
- DySnakeConv      reference DySnakeConv.py:7 (snake-bent tap lines, taps
                   contracted by a (k,1)/(1,k) conv == einsum over taps here)
- SAConv2d         reference SAConv.py:60 (weight-standardized switchable
                   atrous conv: d=1 vs d=3 branches share the weight)
- ARConv           reference ARConv.py:7 — the torch version picks ONE
                   rectangular kernel shape per forward from predicted (l, w)
                   (data-dependent shape). TPU redesign: a fixed 3x3 tap grid
                   whose spacing is the CONTINUOUS predicted (l, w)/2 per
                   pixel — same adaptive rectangular receptive field, static
                   shapes, differentiable end-to-end.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import (
    BN_EPS,
    BN_MOMENTUM,
    Conv,
    ConvBase,
    apply_act,
    autopad,
)
from ultralytics_pro_tpu.ops.deform import bilinear_gather, dcnv3_sample


def _bn(mod, name, x, train):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        use_fast_variance=False, epsilon=BN_EPS, dtype=mod.dtype,
                        name=name, parent=mod)(x)


class DCNv3(ConvBase):
    """InternImage DCNv3 core op (dcnv3.py:185), NHWC: dw-conv features
    predict per-group offsets + softmax mask; grouped deformable aggregation;
    input/output 1x1 projections."""

    k: int = 3
    s: int = 1
    g: int = 4
    d: int = 1
    offset_scale: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        g = self.g if c % self.g == 0 else 1
        kk = self.k * self.k
        p = autopad(self.k, None, self.d)
        v = nn.Dense(c, dtype=self.dtype, name="input_proj")(x)
        f = nn.Conv(c, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=c,
                    dtype=self.dtype, name="dw_conv")(x)
        f = jax.nn.gelu(_bn(self, "dw_norm", f, train))
        off = nn.Conv(g * kk * 2, (1, 1), kernel_init=nn.initializers.zeros,
                      dtype=self.dtype, name="offset")(f)
        m = nn.Conv(g * kk, (1, 1), kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name="mask")(f)
        b, ho, wo = m.shape[0], m.shape[1], m.shape[2]
        m = jax.nn.softmax(m.reshape(b, ho, wo, g, kk), axis=-1).reshape(b, ho, wo, g * kk)
        y = dcnv3_sample(v, off.astype(jnp.float32), m.astype(jnp.float32),
                         k=self.k, stride=self.s, padding=p, dilation=self.d,
                         groups=g, offset_scale=self.offset_scale)
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(y.astype(x.dtype))


class DCNV3_YoLo(ConvBase):
    """Conv1x1 -> DCNv3 -> BN -> act (reference block.py:5757)."""

    c2: int = 0
    k: int = 3
    s: int = 1
    g: int = 4
    d: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="conv")(x, train)
        y = DCNv3(k=self.k, s=self.s, g=self.g, d=self.d, dtype=self.dtype,
                  name="dcnv3")(y, train)
        return apply_act(_bn(self, "bn", y, train), self.act)


class Bottleneck_DCNV3(ConvBase):
    """Bottleneck w/ DCNV3_YoLo second conv (block.py:5775)."""

    c2: int = 0
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c2=c_, k=3, dtype=self.dtype, name="cv1")(x, train)
        y = DCNV3_YoLo(c2=self.c2, k=3, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C2f_DCNV3(ConvBase):
    """C2f with DCNv3 bottlenecks (block.py:5788)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = False
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(Bottleneck_DCNV3(c2=c, shortcut=self.shortcut, e=1.0,
                                       dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class DCNV3RepNCSPELAN4(ConvBase):
    """GELAN block whose branch tails are DCNV3_YoLo (block.py:5808)."""

    c2: int = 0
    c3: int = 0
    c4: int = 0
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.v9v10v12 import RepNCSP

        y = Conv(c2=self.c3, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i, _ in enumerate(range(2)):
            z = RepNCSP(c2=self.c4, n=self.n, dtype=self.dtype, name=f"cv{i + 2}_csp")(ys[-1], train)
            z = DCNV3_YoLo(c2=self.c4, k=3, dtype=self.dtype, name=f"cv{i + 2}_dcn")(z, train)
            ys.append(z)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv4")(jnp.concatenate(ys, -1), train)


def _snake_cumulative(off):
    """Iterative center-out offset accumulation (DySnakeConv.py:165-169):
    tap c stays, tap c±i bends by the running sum of offsets outward."""
    k = off.shape[-1]
    c = k // 2
    upper = jnp.cumsum(off[..., c + 1:], axis=-1)
    lower = jnp.cumsum(off[..., :c][..., ::-1], axis=-1)[..., ::-1]
    return jnp.concatenate([lower, jnp.zeros_like(off[..., :1]), upper], axis=-1)


class DSConvSnake(ConvBase):
    """One snake-conv branch (reference DSConv, DySnakeConv.py:20): K taps
    along one axis, perpendicular positions bent by cumulative learned
    offsets; taps contracted on the MXU; GroupNorm + act."""

    c2: int = 0
    morph: int = 0  # 0: taps along x, bends in y; 1: taps along y, bends in x
    k: int = 3
    extend_scope: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        kk = self.k
        off = nn.Conv(2 * kk, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                      name="offset_conv")(x)
        off = jnp.tanh(_bn(self, "offset_bn", off, train)).astype(jnp.float32)
        y_off, x_off = off[..., :kk], off[..., kk:]
        iy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        ix = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        taps = jnp.arange(kk, dtype=jnp.float32) - kk // 2
        if self.morph == 0:
            sx = ix + taps[None, None, None, :]
            sy = iy + _snake_cumulative(y_off) * self.extend_scope
        else:
            sy = iy + taps[None, None, None, :]
            sx = ix + _snake_cumulative(x_off) * self.extend_scope
        sy = jnp.broadcast_to(sy, (b, h, w, kk))
        sx = jnp.broadcast_to(sx, (b, h, w, kk))
        cols = bilinear_gather(x.astype(jnp.float32), sy, sx)  # (B,H,W,K,C)
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (kk, c, self.c2))
        y = jnp.einsum("bhwkc,kco->bhwo", cols, weight.astype(jnp.float32),
                       precision="default").astype(x.dtype)
        y = y + self.param("bias", nn.initializers.zeros, (self.c2,))
        y = nn.GroupNorm(num_groups=max(self.c2 // 4, 1), dtype=self.dtype,
                         name="gn")(y)
        return apply_act(y, True)


class DySnakeConv(ConvBase):
    """concat(std conv, x-snake, y-snake) -> 1x1 (DySnakeConv.py:7)."""

    c2: int = 0
    k: int = 3
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y0 = Conv(c2=self.c2, k=self.k, act=self.act, dtype=self.dtype, name="conv_0")(x, train)
        yx = DSConvSnake(c2=self.c2, morph=0, k=self.k, dtype=self.dtype, name="conv_x")(x, train)
        yy = DSConvSnake(c2=self.c2, morph=1, k=self.k, dtype=self.dtype, name="conv_y")(x, train)
        return Conv(c2=self.c2, k=1, act=self.act, dtype=self.dtype,
                    name="conv_1x1")(jnp.concatenate([y0, yx, yy], -1), train)


class Bottleneck_DySnakeConv(ConvBase):
    """Bottleneck w/ DySnakeConv second conv (DySnakeConv.py:355)."""

    c2: int = 0
    shortcut: bool = True
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c2=c_, k=3, dtype=self.dtype, name="cv1")(x, train)
        y = DySnakeConv(c2=self.c2, k=3, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C3k_DSConv(ConvBase):
    """C3-shaped block with DySnake bottlenecks (DySnakeConv.py:369)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        bb = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck_DySnakeConv(c2=c_, shortcut=self.shortcut, e=1.0,
                                       dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, bb], -1), train)


class C3k2_DSConv(ConvBase):
    """C3k2 whose inner blocks use DySnakeConv (DySnakeConv.py:380)."""

    c2: int = 0
    n: int = 1
    c3k: bool = False
    shortcut: bool = True
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            if self.c3k:
                ys.append(C3k_DSConv(c2=c, n=2, shortcut=self.shortcut,
                                     dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
            else:
                ys.append(Bottleneck_DySnakeConv(c2=c, shortcut=self.shortcut, e=0.5,
                                                 dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class SAConv2d(ConvBase):
    """Switchable Atrous Conv (SAConv.py:60): weight-standardized kernel runs
    at dilation 1 and 3 (d=3 adds a learned weight delta); a spatial switch
    blends the two; global pre/post context 1x1s; BN + act."""

    c2: int = 0
    k: int = 3
    s: int = 1
    d: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        p = autopad(self.k, None, self.d)
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (self.k, self.k, c1, self.c2))
        wd = self.param("weight_diff", nn.initializers.zeros, weight.shape)
        # AWS weight standardization (SAConv.py:27): zero-mean, unit-std per filter
        wf = weight.astype(jnp.float32)
        mean = wf.mean(axis=(0, 1, 2), keepdims=True)
        std = jnp.sqrt(wf.var(axis=(0, 1, 2)) * (wf[..., 0].size / max(wf[..., 0].size - 1, 1))
                       + 1e-5)
        w_std = ((wf - mean) / std).astype(self.dtype)

        # pre-context
        g = x.mean(axis=(1, 2), keepdims=True)
        x = x + nn.Conv(c1, (1, 1), kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, name="pre_context")(g)
        # switch on 5x5 smoothed features (reflect pad, reference :112)
        sw = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
        sw = nn.avg_pool(sw, (5, 5), (1, 1), padding="VALID")
        sw = nn.Conv(1, (1, 1), strides=(self.s, self.s), kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.ones, dtype=self.dtype, name="switch")(sw)

        def run(w, dil):
            pp = autopad(self.k, None, dil)
            return jax.lax.conv_general_dilated(
                x, w, (self.s, self.s), ((pp, pp), (pp, pp)),
                rhs_dilation=(dil, dil), dimension_numbers=("NHWC", "HWIO", "NHWC"))

        out_s = run(w_std, self.d)
        out_l = run(w_std + wd.astype(self.dtype), 3 * self.d)
        out = sw * out_s + (1 - sw) * out_l
        g = out.mean(axis=(1, 2), keepdims=True)
        out = out + nn.Conv(self.c2, (1, 1), kernel_init=nn.initializers.zeros,
                            dtype=self.dtype, name="post_context")(g)
        return apply_act(_bn(self, "bn", out, train), self.act)


class Bottleneck_SAConv(ConvBase):
    """Bottleneck w/ SAConv2d second conv (SAConv.py:138)."""

    c2: int = 0
    shortcut: bool = True
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c2=c_, k=3, dtype=self.dtype, name="cv1")(x, train)
        y = SAConv2d(c2=self.c2, k=3, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C2f_SAConv(ConvBase):
    """C2f with SAConv bottlenecks (SAConv.py:156)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = False
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(Bottleneck_SAConv(c2=c, shortcut=self.shortcut, e=1.0,
                                        dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class C3k2_SAConv(ConvBase):
    """C3k2-shaped SAConv block (SAConv.py:257)."""

    c2: int = 0
    n: int = 1
    c3k: bool = False
    shortcut: bool = True
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(Bottleneck_SAConv(c2=c, shortcut=self.shortcut,
                                        e=1.0 if not self.c3k else 0.5,
                                        dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class ARConv(ConvBase):
    """Adaptive rectangular conv, TPU redesign (see module docstring; torch
    original: ARConv.py:7). Branches predict per-pixel rectangle (l, w) in
    [1, l_max] x [1, w_max], a modulation map and a bias map; a 3x3 tap grid
    spaced (l/2, w/2) is bilinearly gathered and contracted on the MXU."""

    c2: int = 0
    l_max: float = 9.0
    w_max: float = 9.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c1 = x.shape
        f = x
        for i in range(2):  # p_conv: feature prep (ARConv.py:58)
            f = nn.Conv(c1, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f"p_conv{i}")(f)
            f = jax.nn.leaky_relu(_bn(self, f"p_bn{i}", f, train), 0.01)
        lmap = jax.nn.sigmoid(nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                                      dtype=self.dtype, name="l_conv")(f))
        wmap = jax.nn.sigmoid(nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                                      dtype=self.dtype, name="w_conv")(f))
        ll = (1.0 + lmap[..., 0] * (self.l_max - 1.0)).astype(jnp.float32)
        ww = (1.0 + wmap[..., 0] * (self.w_max - 1.0)).astype(jnp.float32)
        m = jnp.tanh(nn.Conv(self.c2, (3, 3), padding=((1, 1), (1, 1)),
                             dtype=self.dtype, name="m_conv")(f))
        bias = nn.Conv(self.c2, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="b_conv")(f)

        iy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        ix = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        taps = jnp.asarray([-0.5, 0.0, 0.5], jnp.float32)
        sy = iy[..., None, None] + ll[..., None, None] * taps[:, None]  # (B,H,W,3,1)
        sx = ix[..., None, None] + ww[..., None, None] * taps[None, :]  # (B,H,W,1,3)
        sy = jnp.broadcast_to(sy, (b, h, w, 3, 3)).reshape(b, h, w, 9)
        sx = jnp.broadcast_to(sx, (b, h, w, 3, 3)).reshape(b, h, w, 9)
        cols = bilinear_gather(f.astype(jnp.float32), sy, sx)
        weight = self.param("weight", nn.initializers.lecun_normal(), (9, c1, self.c2))
        y = jnp.einsum("bhwkc,kco->bhwo", cols, weight.astype(jnp.float32),
                       precision="default").astype(x.dtype)
        return y * m + bias


class DySnakeRepNCSPELAN4(ConvBase):
    """GELAN block with DySnakeConv branch tails (reference
    DySnakeConv.py:392), mirroring DCNV3RepNCSPELAN4 above."""

    c2: int = 0
    c3: int = 0
    c4: int = 0
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.v9v10v12 import RepNCSP

        y = Conv(c2=self.c3, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(2):
            z = RepNCSP(c2=self.c4, n=self.n, dtype=self.dtype, name=f"cv{i + 2}_csp")(ys[-1], train)
            z = DySnakeConv(c2=self.c4, k=3, dtype=self.dtype, name=f"cv{i + 2}_snake")(z, train)
            ys.append(z)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv4")(jnp.concatenate(ys, -1), train)
