"""Conv family, tranche 2 — adaptive/dynamic/receptive-field convs.

Parity targets (reference ultralytics/nn/modules/conv.py):
- Conv2 :318           RepConv-lite: parallel 1x1 added to the kxk before BN
- AConv :1561          avgpool(2,s1) -> Conv 3x3 s2 (YOLOv9 downsample)
- AKConv :1156 / LDConv :1797   N arbitrary-count deformable taps (near-square
  initial layout), bilinear-gathered and contracted on the MXU
- ODConv2d :1297       omni-dimensional dynamic conv: K candidate kernels
  blended by 4 attention vectors (spatial/kernel-in/out/candidate)
- RFAConv :1641, RFCBAMConv :1688, RFCAConv :1724   receptive-field-attention
  convs — the torch versions expand to an (h*k, w*k) image and run a
  stride-k conv; here the k^2 taps stay as a tap axis and the contraction is
  one einsum. The final contraction is identical math; RFCBAMConv's SPATIAL
  attention branch is a documented deviation (a 3x3 conv mixing all k^2 tap
  statistics per coarse cell, vs the reference's conv over the unfolded fine
  grid) — same receptive-field-gating role, not weight-compatible
- FCM :2043 (+_1/_2/_3 variants)  split-path spatial/channel cross-attention
- BatchChannelNorm :73, DynamicTanh :127
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import (
    BN_EPS,
    BN_MOMENTUM,
    Conv,
    ConvBase,
    apply_act,
    autopad,
)
from ultralytics_pro_tpu.ops.deform import bilinear_gather


def _bn(mod, name, x, train, eps=BN_EPS):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        use_fast_variance=False, epsilon=eps, dtype=mod.dtype,
                        name=name, parent=mod)(x)


class Conv2(ConvBase):
    """kxk conv + parallel 1x1 conv summed before BN+act (conv.py:318);
    fusable to one conv by padding the 1x1 into the kxk center."""

    c2: int = 0
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = autopad(self.k)
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=self.g,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        y = y + nn.Conv(self.c2, (1, 1), strides=(self.s, self.s),
                        feature_group_count=self.g, use_bias=False,
                        dtype=self.dtype, name="cv2")(x)
        return apply_act(_bn(self, "bn", y, train), self.act)


class AConv(ConvBase):
    """avg_pool(2, stride 1) -> Conv 3x3 s2 (conv.py:1561, YOLOv9)."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.avg_pool(x, (2, 2), (1, 1), padding="VALID")
        return Conv(c2=self.c2, k=3, s=2, p=1, dtype=self.dtype, name="cv1")(y, train)


def _akconv_base_offsets(n: int):
    """Initial near-square tap layout (conv.py:1221 _get_p_n): a
    round(sqrt(N)) wide grid filled row-major, remainder on the last row."""
    base = int(round(np.sqrt(n)))
    rows, mod = n // base, n % base
    ys, xs = [], []
    for r in range(rows):
        for cc in range(base):
            ys.append(r)
            xs.append(cc)
    for cc in range(mod):
        ys.append(rows)
        xs.append(cc)
    return np.asarray(ys, np.float32), np.asarray(xs, np.float32)


class AKConv(ConvBase):
    """Arbitrary-kernel deformable conv (conv.py:1156; LDConv :1797 is the
    same op): N learned-offset taps starting from a near-square layout,
    bilinear-gathered then contracted + BN + SiLU."""

    c2: int = 0
    num_param: int = 5
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c1 = x.shape
        n = self.num_param
        off = nn.Conv(2 * n, (3, 3), strides=(self.s, self.s),
                      padding=((1, 1), (1, 1)), kernel_init=nn.initializers.zeros,
                      dtype=self.dtype, name="p_conv")(x).astype(jnp.float32)
        ho, wo = off.shape[1], off.shape[2]
        by, bx = _akconv_base_offsets(n)
        iy = (jnp.arange(ho, dtype=jnp.float32) * self.s)[None, :, None, None]
        ix = (jnp.arange(wo, dtype=jnp.float32) * self.s)[None, None, :, None]
        sy = iy + by[None, None, None, :] + off[..., :n]
        sx = ix + bx[None, None, None, :] + off[..., n:]
        # reference clamps sample coords into the image (conv.py:1194)
        sy = jnp.clip(sy, 0, h - 1)
        sx = jnp.clip(sx, 0, w - 1)
        cols = bilinear_gather(x.astype(jnp.float32), sy, sx)  # (B,Ho,Wo,N,C)
        weight = self.param("weight", nn.initializers.lecun_normal(), (n, c1, self.c2))
        y = jnp.einsum("bhwkc,kco->bhwo", cols, weight.astype(jnp.float32),
                       precision="default").astype(x.dtype)
        return apply_act(_bn(self, "bn", y, train), True)


class LDConv(AKConv):
    """Linear deformable conv — identical op to AKConv (conv.py:1797)."""


class ODConv2d(ConvBase):
    """Omni-dimensional dynamic conv (conv.py:1297): K candidate kernels
    blended per sample by 4 sigmoid/softmax attentions over spatial taps,
    input channels, output channels and candidates."""

    c2: int = 0
    k: int = 3
    s: int = 1
    g: int = 1
    K: int = 4
    r: float = 1 / 16
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c1 = x.shape
        ci = c1 // self.g
        kk = self.k * self.k
        hidden = max(int(c1 * self.r), 16)
        a = x.mean(axis=(1, 2))
        a = jax.nn.relu(nn.Dense(hidden, dtype=self.dtype, name="reduction")(a))
        att_f = jax.nn.sigmoid(nn.Dense(self.c2, dtype=self.dtype, name="fc_f")(a))
        att_s = jax.nn.sigmoid(nn.Dense(kk, dtype=self.dtype, name="fc_s")(a))
        att_c = jax.nn.sigmoid(nn.Dense(ci, dtype=self.dtype, name="fc_c")(a))
        att_w = jax.nn.softmax(nn.Dense(self.K, dtype=self.dtype, name="fc_w")(a), axis=-1)
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (self.K, self.k, self.k, ci, self.c2))
        # per-sample kernel: K-blend x spatial x cin x cout attentions
        wk = jnp.einsum("bk,khwio->bhwio", att_w, weight.astype(att_w.dtype))
        wk = wk * att_s.reshape(b, self.k, self.k, 1, 1) \
                * att_c[:, None, None, :, None] * att_f[:, None, None, None, :]
        p = autopad(self.k)

        # grouped over batch: one conv with feature_group_count = B*g
        xg = x.transpose(1, 2, 0, 3).reshape(1, h, w, b * c1)
        wg = wk.transpose(1, 2, 3, 0, 4).reshape(self.k, self.k, ci, b * self.c2)
        y = jax.lax.conv_general_dilated(
            xg, wg.astype(self.dtype), (self.s, self.s), ((p, p), (p, p)),
            feature_group_count=b * self.g,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ho, wo = y.shape[1], y.shape[2]
        y = y.reshape(ho, wo, b, self.c2).transpose(2, 0, 1, 3)
        return apply_act(_bn(self, "bn", y, train), self.act)


class _RFBase(ConvBase):
    """Shared: DW conv generates k^2 tap features per pixel; subclasses weight
    the taps, then one einsum contraction + BN + act replaces the torch
    (h*k, w*k) unfold + stride-k conv."""

    c2: int = 0
    k: int = 3
    s: int = 1

    def _taps(self, mod, x, train):
        c1 = x.shape[-1]
        kk = self.k * self.k
        p = self.k // 2
        f = nn.Conv(c1 * kk, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=c1,
                    use_bias=False, dtype=self.dtype, name="generate", parent=mod)(x)
        f = jax.nn.relu(_bn(mod, "gen_bn", f, train))
        b, ho, wo = f.shape[0], f.shape[1], f.shape[2]
        return f.reshape(b, ho, wo, c1, kk), c1

    def _contract(self, mod, taps, train):
        """taps (B,H,W,C,K^2) -> Conv(k,s=k) equivalent: einsum + BN + SiLU."""
        c1 = taps.shape[3]
        weight = mod.param("weight", nn.initializers.lecun_normal(),
                           (taps.shape[-1], c1, self.c2))
        y = jnp.einsum("bhwkc,kco->bhwo", taps.transpose(0, 1, 2, 4, 3).astype(jnp.float32),
                       weight.astype(jnp.float32), precision="default").astype(mod.dtype)
        return apply_act(_bn(mod, "out_bn", y, train), True)


class RFAConv(_RFBase):
    """Receptive-field attention conv (conv.py:1641): per-pixel softmax over
    the k^2 taps from an avgpool+grouped-1x1 branch."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps, c1 = self._taps(self, x, train)
        kk = self.k * self.k
        p = self.k // 2
        wgt = nn.avg_pool(x, (self.k, self.k), (self.s, self.s),
                          padding=((p, p), (p, p)))
        wgt = nn.Conv(c1 * kk, (1, 1), feature_group_count=c1, use_bias=False,
                      dtype=self.dtype, name="get_weight")(wgt)
        b, ho, wo = wgt.shape[0], wgt.shape[1], wgt.shape[2]
        wgt = jax.nn.softmax(wgt.reshape(b, ho, wo, c1, kk), axis=-1)
        return self._contract(self, taps * wgt, train)


class RFCBAMConv(_RFBase):
    """RF conv + SE channel attention + (max,mean)->conv spatial attention
    over the unfolded taps (conv.py:1688)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps, c1 = self._taps(self, x, train)
        se = x.mean(axis=(1, 2))
        se = jax.nn.relu(nn.Dense(16, use_bias=False, dtype=self.dtype, name="se_fc0")(se))
        se = jax.nn.sigmoid(nn.Dense(c1, use_bias=False, dtype=self.dtype, name="se_fc1")(se))
        weighted = taps * se[:, None, None, :, None]
        mx = taps.max(axis=3)   # (B,H,W,K): over channels
        mean = taps.mean(axis=3)
        sa = jnp.stack([mx, mean], axis=-1)  # (B,H,W,K,2)
        b, ho, wo, kk = sa.shape[:4]
        sa = sa.reshape(b, ho, wo, kk * 2)
        sa = jax.nn.sigmoid(nn.Conv(kk, (3, 3), padding=((1, 1), (1, 1)),
                                    use_bias=False, dtype=self.dtype,
                                    name="get_weight")(sa))
        return self._contract(self, weighted * sa[:, :, :, None, :], train)


class RFCAConv(_RFBase):
    """RF conv + coordinate attention over the taps (conv.py:1724)."""

    reduction: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps, c1 = self._taps(self, x, train)
        # coordinate attention on the per-pixel tap-mean feature
        f = taps.mean(axis=-1)  # (B,H,W,C)
        xh = f.mean(axis=2)     # (B,H,C)
        xw = f.mean(axis=1)     # (B,W,C)
        mip = max(8, c1 // self.reduction)
        y = jnp.concatenate([xh, xw], axis=1)[:, :, None, :]  # (B,H+W,1,C)
        y = nn.Conv(mip, (1, 1), dtype=self.dtype, name="conv1")(y)
        y = jax.nn.hard_swish(_bn(self, "bn1", y, train))
        h = f.shape[1]
        ah = jax.nn.sigmoid(nn.Conv(c1, (1, 1), dtype=self.dtype, name="conv_h")(y[:, :h]))
        aw = jax.nn.sigmoid(nn.Conv(c1, (1, 1), dtype=self.dtype, name="conv_w")(y[:, h:]))
        att = ah[:, :, 0, :][:, :, None, :] * aw[:, :, 0, :][:, None, :, :]
        return self._contract(self, taps * att[..., None], train)


class FCM(ConvBase):
    """Feature-complement mixing (conv.py:2043): split 1/4 vs 3/4 channels,
    deep 3x3 path and shallow 1x1 path exchange spatial/channel attention."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        c_two = c // 4
        c_one = c - c_two
        x1, x2 = x[..., :c_one], x[..., c_one:]
        x3 = Conv(c2=c_one, k=3, dtype=self.dtype, name="conv1")(x1, train)
        x3 = Conv(c2=c_one, k=3, dtype=self.dtype, name="conv12")(x3, train)
        x3 = Conv(c2=c, k=1, dtype=self.dtype, name="conv123")(x3, train)
        x4 = Conv(c2=c, k=1, dtype=self.dtype, name="conv2")(x2, train)
        # spatial gate from shallow path (Spatial, conv.py:1955)
        sp = nn.Conv(1, (1, 1), dtype=self.dtype, name="spatial_conv")(x4)
        sp = jax.nn.sigmoid(_bn(self, "spatial_bn", sp, train))
        # channel gate from deep path (Channel, conv.py:1937)
        ch = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                     dtype=self.dtype, name="channel_dw")(x3)
        ch = jax.nn.sigmoid(ch.mean(axis=(1, 2), keepdims=True))
        out = sp * x3 + ch * x4
        if self.c2 and self.c2 != c:  # reference FCM is channel-preserving;
            # project when a yaml asks for a different width
            out = Conv(c2=self.c2, k=1, dtype=self.dtype, name="proj")(out, train)
        return out


class BatchChannelNorm(ConvBase):
    """Learned sigmoid(rho) blend of BatchNorm and LayerNorm outputs with a
    shared affine (conv.py:73)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        xbn = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           use_fast_variance=False, epsilon=1e-5, use_bias=False,
                           use_scale=False, dtype=self.dtype, name="bn")(x)
        mu = x.mean(axis=(1, 2, 3), keepdims=True)
        var = x.var(axis=(1, 2, 3), keepdims=True)
        xln = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        rho = jax.nn.sigmoid(self.param("rho", nn.initializers.ones, (c,)))
        out = rho * xbn + (1 - rho) * xln
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        return out * gamma + beta


class DynamicTanh(ConvBase):
    """tanh(alpha * x) * weight + bias — normalization-free scaling
    (conv.py:127, DyT)."""

    alpha_init: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.constant(self.alpha_init), (1,))
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return jnp.tanh(alpha * x) * weight + bias
