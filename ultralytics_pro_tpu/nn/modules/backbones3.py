"""Whole-backbone zoo, tranche 3 — transformer/modern-conv families.

Parity targets (reference nn/modules/): MobileViT v1, HorNet (gnConv),
InceptionNext, MogaNet, VanillaNet, CSWinTransformer, MaxViT (block+grid
attention), WTConv wavelet conv. Same 4-stage-map protocol as backbones2.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.backbones2 import _bn
from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase, DWConv


# --------------------------------------------------------------- MobileViT --

class MobileViTBlock(ConvBase):
    """Local conv + unfolded-patch transformer + fold + fuse
    (reference MobileViTv1)."""

    dim: int = 0
    patch: int = 2
    depth: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        d, p = self.dim, self.patch
        y = Conv(c2=c, k=3, dtype=self.dtype, name="local1")(x, train)
        y = Conv(c2=d, k=1, act=False, dtype=self.dtype, name="local2")(y, train)
        nh, nw = h // p, w // p
        t = y[:, :nh * p, :nw * p].reshape(b, nh, p, nw, p, d)
        t = t.transpose(0, 2, 4, 1, 3, 5).reshape(b * p * p, nh * nw, d)
        for i in range(self.depth):
            a = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(t)
            a = nn.SelfAttention(num_heads=max(d // 32, 1), dtype=self.dtype,
                                 name=f"attn{i}")(a)
            t = t + a
            m = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}b")(t)
            m = nn.Dense(2 * d, dtype=self.dtype, name=f"fc{i}a")(m)
            t = t + nn.Dense(d, dtype=self.dtype, name=f"fc{i}b")(jax.nn.silu(m))
        t = t.reshape(b, p, p, nh, nw, d).transpose(0, 3, 1, 4, 2, 5).reshape(b, nh * p, nw * p, d)
        if t.shape[1] != h or t.shape[2] != w:  # restore non-divisible sizes
            t = jax.image.resize(t, (b, h, w, d), method="nearest")
        y = Conv(c2=c, k=1, dtype=self.dtype, name="proj")(t, train)
        return Conv(c2=c, k=3, dtype=self.dtype, name="fuse")(
            jnp.concatenate([x, y], -1), train)


class MobileViT(ConvBase):
    dims: Sequence[int] = (32, 64, 96, 128)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(c2=16, k=3, s=2, dtype=self.dtype, name="stem")(x, train)
        outs = []
        for s in range(4):
            x = Conv(c2=self.dims[s], k=3, s=2, dtype=self.dtype, name=f"down{s}")(x, train)
            if s >= 2:
                x = MobileViTBlock(dim=self.dims[s], dtype=self.dtype, name=f"mvit{s}")(x, train)
            else:
                x = Conv(c2=self.dims[s], k=3, dtype=self.dtype, name=f"conv{s}")(x, train)
            outs.append(x)
        return outs


# ------------------------------------------------------------------ HorNet --

class GnConv(ConvBase):
    """Recursive gated convolution g^n-conv (reference HorNet.py): split the
    projected features into n orders; each order gates the next through a DW
    conv chain."""

    dim: int = 0
    order: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        dims = [d // (2 ** i) for i in range(self.order)][::-1]  # small->large
        total = sum(dims)
        y = nn.Conv(total + dims[0], (1, 1), dtype=self.dtype, name="proj_in")(x)
        a, rest = y[..., :dims[0]], y[..., dims[0]:]
        rest = nn.Conv(total, (5, 5), padding=((2, 2), (2, 2)), feature_group_count=total,
                       dtype=self.dtype, name="dw")(rest)
        parts = []
        off = 0
        for dd in dims:
            parts.append(rest[..., off:off + dd])
            off += dd
        cur = a * parts[0]
        for i in range(1, self.order):
            cur = nn.Conv(dims[i], (1, 1), dtype=self.dtype, name=f"pw{i}")(cur) * parts[i]
        return nn.Conv(d, (1, 1), dtype=self.dtype, name="proj_out")(cur)


class HorNetBlock(ConvBase):
    dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = x + GnConv(dim=self.dim, dtype=self.dtype, name="gnconv")(y, train)
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(y)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="fc2")(jax.nn.gelu(y))


# ------------------------------------------------------------ InceptionNeXt --

class InceptionNeXtBlock(ConvBase):
    """Inception-style DW mixer: identity / 3x3 / band 1x11 / band 11x1
    quarters, then MLP (reference InceptionNext.py)."""

    dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        q = d // 4
        xs = jnp.split(x, [q, 2 * q, 3 * q], axis=-1)
        b3 = nn.Conv(q, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=q,
                     dtype=self.dtype, name="dw3")(xs[1])
        bh = nn.Conv(q, (1, 11), padding=((0, 0), (5, 5)), feature_group_count=q,
                     dtype=self.dtype, name="dwh")(xs[2])
        bv = nn.Conv(d - 3 * q, (11, 1), padding=((5, 5), (0, 0)),
                     feature_group_count=d - 3 * q, dtype=self.dtype, name="dwv")(xs[3])
        y = jnp.concatenate([xs[0], b3, bh, bv], -1)
        y = _bn(self, "bn", y, train)
        y = nn.Dense(4 * d, dtype=self.dtype, name="fc1")(y)
        return x + nn.Dense(d, dtype=self.dtype, name="fc2")(jax.nn.gelu(y))


# ---------------------------------------------------------------- MogaNet --

class MogaBlock(ConvBase):
    """Multi-order gated aggregation (reference MogaNet.py): multi-dilation
    DW context, gated, + channel-MLP."""

    dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        y = _bn(self, "bn1", x, train)
        gate = nn.Conv(d, (1, 1), dtype=self.dtype, name="gate")(y)
        v = nn.Conv(d, (1, 1), dtype=self.dtype, name="value")(y)
        c1 = nn.Conv(d, (5, 5), padding="SAME", feature_group_count=d,
                     dtype=self.dtype, name="dw5")(v)
        c2 = nn.Conv(d, (5, 5), padding="SAME", kernel_dilation=(2, 2),
                     feature_group_count=d, dtype=self.dtype, name="dw5d2")(c1)
        c3 = nn.Conv(d, (7, 7), padding="SAME", kernel_dilation=(3, 3),
                     feature_group_count=d, dtype=self.dtype, name="dw7d3")(c2)
        ctx = (c1 + c2 + c3) / 3.0
        y = jax.nn.silu(gate) * ctx
        x = x + nn.Conv(d, (1, 1), dtype=self.dtype, name="proj")(y)
        y = _bn(self, "bn2", x, train)
        y = nn.Dense(4 * d, dtype=self.dtype, name="fc1")(y)
        return x + nn.Dense(d, dtype=self.dtype, name="fc2")(jax.nn.gelu(y))


# -------------------------------------------------------------- VanillaNet --

class VanillaBlock(ConvBase):
    """VanillaNet stage: conv-BN + deep-training activation (lambda-blended
    identity) + pool (reference VanillaNet.py, simplified to deploy form)."""

    c2: int = 0
    s: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(_bn(self, "bn1", y, train))
        y = nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="conv2")(y)
        y = _bn(self, "bn2", y, train)
        if self.s > 1:
            y = nn.max_pool(y, (self.s, self.s), (self.s, self.s), padding="VALID")
        # learnable series activation (depthwise conv of the activation)
        a = jax.nn.relu(y)
        y = a + nn.Conv(self.c2, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=self.c2, dtype=self.dtype, name="act_dw")(a)
        return y


# ------------------------------------------------------------------ CSWin --

class CSWinBlock(ConvBase):
    """Cross-shaped window attention: half the heads attend in horizontal
    stripes, half in vertical (reference CSWinTransformer.py)."""

    dim: int = 0
    stripe: int = 2
    heads: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h0, w0, c = x.shape
        sw0 = min(self.stripe, h0, w0)
        ph, pw = (-h0) % sw0, (-w0) % sw0
        if ph or pw:  # pad to stripe multiples, crop at the end
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        b, h, w, c = x.shape
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ch = c // 2
        sw = min(self.stripe, h, w)

        def stripes(z, horizontal):
            # horizontal: rows grouped into stripes of height sw, full width
            if horizontal:
                z = z.reshape(b, h // sw, sw, w, -1).reshape(b * (h // sw), sw * w, -1)
            else:
                z = z.transpose(0, 2, 1, 3).reshape(b, w // sw, sw, h, -1)
                z = z.reshape(b * (w // sw), sw * h, -1)
            return z

        def unstripes(z, horizontal):
            if horizontal:
                z = z.reshape(b, h // sw, sw, w, -1).reshape(b, h, w, -1)
            else:
                z = z.reshape(b, w // sw, sw, h, -1).reshape(b, w, h, -1).transpose(0, 2, 1, 3)
            return z

        outs = []
        for half, horiz in ((0, True), (1, False)):
            sl = slice(half * ch, (half + 1) * ch)
            qs, ks, vs = (stripes(t[..., sl], horiz) for t in (q, k, v))
            nh = max(self.heads // 2, 1)
            hd = ch // nh
            L = qs.shape[1]
            qs = qs.reshape(-1, L, nh, hd).transpose(0, 2, 1, 3)
            ks = ks.reshape(-1, L, nh, hd).transpose(0, 2, 1, 3)
            vs = vs.reshape(-1, L, nh, hd).transpose(0, 2, 1, 3)
            att = jax.nn.softmax(qs @ ks.transpose(0, 1, 3, 2) / np.sqrt(hd), axis=-1)
            o = (att @ vs).transpose(0, 2, 1, 3).reshape(-1, L, ch)
            outs.append(unstripes(o, horiz))
        y = jnp.concatenate(outs, -1)
        x = x + nn.Dense(c, dtype=self.dtype, name="proj")(y)
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(y)
        out = x + nn.Dense(c, dtype=self.dtype, name="fc2")(jax.nn.gelu(y))
        return out[:, :h0, :w0]


# ------------------------------------------------------------------ MaxViT --

class MaxViTBlock(ConvBase):
    """MBConv + block (local window) attention + grid (dilated) attention
    (reference MaxViT)."""

    dim: int = 0
    window: int = 4

    def _attn(self, t, name):
        c = t.shape[-1]
        nh = max(c // 32, 1)
        a = nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln")(t)
        a = nn.SelfAttention(num_heads=nh, dtype=self.dtype, name=f"{name}_attn")(a)
        return t + a

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h0, w0, c = x.shape
        g = min(self.window, h0, w0)
        ph, pw = (-h0) % g, (-w0) % g
        if ph or pw:  # pad to window multiples, crop at the end
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        b, h, w, c = x.shape
        # MBConv
        y = Conv(c2=c * 2, k=1, dtype=self.dtype, name="mb_expand")(x, train)
        y = DWConv(c2=c * 2, k=3, dtype=self.dtype, name="mb_dw")(y, train)
        y = Conv(c2=c, k=1, act=False, dtype=self.dtype, name="mb_proj")(y, train)
        x = x + y
        # block attention: (h/g, g, w/g, g) windows
        t = x.reshape(b, h // g, g, w // g, g, c).transpose(0, 1, 3, 2, 4, 5)
        t = t.reshape(-1, g * g, c)
        t = self._attn(t, "block")
        x = t.reshape(b, h // g, w // g, g, g, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        # grid attention: transpose the partition (dilated)
        t = x.reshape(b, g, h // g, g, w // g, c).transpose(0, 2, 4, 1, 3, 5)
        t = t.reshape(-1, g * g, c)
        t = self._attn(t, "grid")
        x = t.reshape(b, h // g, w // g, g, g, c).transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, c)
        return x[:, :h0, :w0]


# ------------------------------------------------------------------ WTConv --

class WTConv(ConvBase):
    """Wavelet conv (reference WTConv/wtconvnext.py): one Haar DWT level,
    depthwise conv per subband, inverse DWT, plus a direct DW path."""

    dim: int = 0
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h0, w0, c = x.shape
        if h0 % 2 or w0 % 2:  # DWT needs even sizes; pad then crop
            x = jnp.pad(x, ((0, 0), (0, h0 % 2), (0, w0 % 2), (0, 0)))
        b, h, w, c = x.shape
        p = self.k // 2
        direct = nn.Conv(c, (self.k, self.k), padding=((p, p), (p, p)),
                         feature_group_count=c, dtype=self.dtype, name="dw")(x)
        # Haar DWT
        e = x.reshape(b, h // 2, 2, w // 2, 2, c)
        a, bb = e[:, :, 0, :, 0], e[:, :, 0, :, 1]
        cc, dd = e[:, :, 1, :, 0], e[:, :, 1, :, 1]
        ll, lh = (a + bb + cc + dd) / 2, (a - bb + cc - dd) / 2
        hl, hh = (a + bb - cc - dd) / 2, (a - bb - cc + dd) / 2
        bands = jnp.concatenate([ll, lh, hl, hh], -1)
        bands = nn.Conv(4 * c, (self.k, self.k), padding=((p, p), (p, p)),
                        feature_group_count=4 * c, dtype=self.dtype, name="dw_wt")(bands)
        ll, lh, hl, hh = jnp.split(bands, 4, axis=-1)
        # inverse Haar
        a = (ll + lh + hl + hh) / 2
        bb = (ll - lh + hl - hh) / 2
        cc = (ll + lh - hl - hh) / 2
        dd = (ll - lh - hl + hh) / 2
        rec = jnp.stack([jnp.stack([a, bb], 3), jnp.stack([cc, dd], 3)], 2)
        rec = rec.reshape(b, h, w, c)
        return (direct + rec)[:, :h0, :w0]


def _stage_backbone(name, block_fn, dims=(32, 64, 128, 256), depths=(1, 2, 3, 1)):
    """Factory: patch-embed stem + per-stage blocks + strided merges."""

    class _Backbone(ConvBase):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem")(x)
            x = nn.LayerNorm(dtype=self.dtype, name="stem_ln")(x)
            outs = []
            for s in range(4):
                if s > 0:
                    x = nn.Conv(dims[s], (2, 2), strides=(2, 2), dtype=self.dtype,
                                name=f"merge{s}")(x)
                    x = nn.LayerNorm(dtype=self.dtype, name=f"merge{s}_ln")(x)
                for bi in range(depths[s]):
                    x = block_fn(dims[s], self.dtype, f"s{s}_b{bi}")(x, train)
                outs.append(x)
            return outs

    _Backbone.__name__ = name
    return _Backbone


HorNet = _stage_backbone("HorNet", lambda d, dt, nm: HorNetBlock(dim=d, dtype=dt, name=nm))
InceptionNeXt = _stage_backbone(
    "InceptionNeXt", lambda d, dt, nm: InceptionNeXtBlock(dim=d, dtype=dt, name=nm))
MogaNet = _stage_backbone("MogaNet", lambda d, dt, nm: MogaBlock(dim=d, dtype=dt, name=nm))
CSWin = _stage_backbone("CSWin", lambda d, dt, nm: CSWinBlock(dim=d, dtype=dt, name=nm))
MaxViT = _stage_backbone("MaxViT", lambda d, dt, nm: MaxViTBlock(dim=d, dtype=dt, name=nm))


class VanillaNet(ConvBase):
    dims: Sequence[int] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem")(x)
        x = jax.nn.relu(_bn(self, "stem_bn", x, train))
        outs = []
        for s in range(4):
            x = VanillaBlock(c2=self.dims[s], s=2 if s > 0 else 1, dtype=self.dtype,
                             name=f"stage{s}")(x, train)
            outs.append(x)
        return outs


class WTConvNeXt(ConvBase):
    dims: Sequence[int] = (32, 64, 128, 256)
    depths: Sequence[int] = (1, 1, 3, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem")(x)
        outs = []
        for s in range(4):
            if s > 0:
                x = nn.Conv(self.dims[s], (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down{s}")(x)
            for bi in range(self.depths[s]):
                y = WTConv(dim=self.dims[s], dtype=self.dtype, name=f"s{s}_b{bi}_wt")(x, train)
                y = _bn(self, f"s{s}_b{bi}_bn", y, train)
                y = nn.Dense(4 * self.dims[s], dtype=self.dtype, name=f"s{s}_b{bi}_fc1")(y)
                y = nn.Dense(self.dims[s], dtype=self.dtype, name=f"s{s}_b{bi}_fc2")(jax.nn.gelu(y))
                x = x + y
            outs.append(x)
        return outs


BACKBONE_VARIANTS3 = {
    "mobilevit_s": (MobileViT, ()),
    "MobileViT": (MobileViT, ()),
    # hornet/moganet/inceptionnext bind the import-faithful backbones5
    # implementations (transplant-parity tested; round-4 tranche). The
    # scaled-down stage assemblies above remain for direct block use.
    "vanillanet_5": (VanillaNet, ()),
    "VanillaNet": (VanillaNet, ()),
    "maxvit_tiny": (MaxViT, ()),
    "MaxViT": (MaxViT, ()),
    "wtconvnext_tiny": (WTConvNeXt, ()),
    "WTConvNeXt": (WTConvNeXt, ()),
}


def _import_block(modpath, clsname):
    import importlib

    return getattr(importlib.import_module(modpath), clsname)


def _focalnet_block(d, dt, nm):
    FocalModulation = _import_block("ultralytics_pro_tpu.nn.modules.misc_blocks",
                                    "FocalModulation")
    return FocalModulation(dtype=dt, name=nm)


def _conv2former_block(d, dt, nm):
    Conv2FormerBlock = _import_block("ultralytics_pro_tpu.nn.modules.misc_blocks",
                                     "Conv2FormerBlock")
    return Conv2FormerBlock(dtype=dt, name=nm)


def _unireplk_block(d, dt, nm):
    UniRepLKNetBlock = _import_block("ultralytics_pro_tpu.nn.modules.reparam",
                                     "UniRepLKNetBlock")
    return UniRepLKNetBlock(k=7, dtype=dt, name=nm)


# whole backbones assembled from blocks defined elsewhere in the zoo
FocalNet = _stage_backbone("FocalNet", _focalnet_block)
Conv2Former = _stage_backbone("Conv2Former", _conv2former_block)
UniRepLKNet = _stage_backbone("UniRepLKNet", _unireplk_block, depths=(1, 1, 2, 1))

BACKBONE_VARIANTS3.update({
    # reference FocalNet.py / Conv2Former.py / DilatedReparam.py UniRepLKNet
    "focalnet_tiny": (FocalNet, ()),
    "FocalNet": (FocalNet, ()),
    "conv2former_n": (Conv2Former, ()),
    "Conv2Former": (Conv2Former, ()),
    "unireplknet_a": (UniRepLKNet, ()),
    "UniRepLKNet": (UniRepLKNet, ()),
})


def _faithful(modname, clsname, **kw):
    import importlib

    cls = getattr(importlib.import_module(
        f"ultralytics_pro_tpu.nn.modules.{modname}"), clsname)
    return (cls, tuple(kw.items()))


# import-faithful round-4 rebinds (backbones5.py; transplant-parity tested,
# official checkpoints load via backbone_import.load_backbone_checkpoint)
BACKBONE_VARIANTS3.update({
    "hornet_tiny": _faithful("backbones5", "HorNetBackbone"),
    "HorNet": _faithful("backbones5", "HorNetBackbone"),
    "hornet_small": _faithful("backbones5", "HorNetBackbone", base_dim=96),
    "moganet_xtiny": _faithful("backbones5", "MogaNetBackbone",
                               embed_dims=(32, 64, 96, 192), depths=(3, 3, 10, 2)),
    "moganet_tiny": _faithful("backbones5", "MogaNetBackbone"),
    "MogaNet": _faithful("backbones5", "MogaNetBackbone"),
    "moganet_small": _faithful("backbones5", "MogaNetBackbone",
                               embed_dims=(64, 128, 320, 512), depths=(2, 3, 12, 2)),
    "inceptionnext_tiny": _faithful("backbones5", "InceptionNeXtBackbone"),
    "InceptionNext": _faithful("backbones5", "InceptionNeXtBackbone"),
    "inceptionnext_small": _faithful("backbones5", "InceptionNeXtBackbone",
                                     depths=(3, 3, 27, 3)),
    "inceptionnext_base": _faithful("backbones5", "InceptionNeXtBackbone",
                                    depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "maxvit_tiny": _faithful("backbones5", "MaxViTBackbone"),
    "MaxViT": _faithful("backbones5", "MaxViTBackbone"),
    "maxvit_small": _faithful("backbones5", "MaxViTBackbone",
                              channels=(96, 192, 384, 768)),
    "CSWin_tiny": _faithful("backbones5", "CSWinBackbone"),
    "CSWin": _faithful("backbones5", "CSWinBackbone"),
    "CSWin_small": _faithful("backbones5", "CSWinBackbone", depths=(2, 4, 32, 2)),
    "CSWin_base": _faithful("backbones5", "CSWinBackbone", embed_dim=96,
                            depths=(2, 4, 32, 2), num_heads=(4, 8, 16, 32)),
})


class EdgeViTBlock(ConvBase):
    """Local-global-local block (reference EdgeViT.py): DW local aggregation,
    sparse global attention on a subsampled token grid, DW local propagation."""

    dim: int = 0
    sr: int = 2  # global-token subsample stride

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # local aggregation
        y = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                    dtype=self.dtype, name="local_agg")(x)
        x = x + y
        # sparse global attention over the subsampled grid
        r = min(self.sr, h, w)
        g = x[:, ::r, ::r]
        gh, gw = g.shape[1], g.shape[2]
        t = nn.LayerNorm(dtype=self.dtype, name="ln")(g.reshape(b, gh * gw, c))
        t = nn.SelfAttention(num_heads=max(c // 32, 1), dtype=self.dtype,
                             name="attn")(t)
        g = t.reshape(b, gh, gw, c)
        g = jax.image.resize(g, (b, h, w, c), method="nearest")
        x = x + g
        # local propagation + MLP
        y = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                    dtype=self.dtype, name="local_prop")(x)
        x = x + y
        m = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        m = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(m)
        return x + nn.Dense(c, dtype=self.dtype, name="fc2")(jax.nn.gelu(m))


EdgeViT = _stage_backbone(
    "EdgeViT", lambda d, dt, nm: EdgeViTBlock(dim=d, dtype=dt, name=nm))


def _efv2_entries():
    from ultralytics_pro_tpu.nn.modules.efficientformer import EfficientFormerV2

    return {
        # reference EfficientFormerV2.py:900-955 — faithful hybrid stages
        # (Attention4D + RPE + talking heads; asub downsample), see
        # efficientformer.py
        "efficientformerv2_s0": (EfficientFormerV2, (("variant", "s0"),)),
        "efficientformerv2_s1": (EfficientFormerV2, (("variant", "s1"),)),
        "efficientformerv2_s2": (EfficientFormerV2, (("variant", "s2"),)),
        "efficientformerv2_l": (EfficientFormerV2, (("variant", "l"),)),
        "EfficientFormer": (EfficientFormerV2, (("variant", "s0"),)),
    }


BACKBONE_VARIANTS3.update({
    # reference EdgeViT.py
    "edgevit_xxs": (EdgeViT, ()),
    "EdgeViT": (EdgeViT, ()),
    **_efv2_entries(),
})
