"""Whole-backbone zoo: ConvNeXt, Swin Transformer, PVTv2, EfficientViT —
flax.linen, NHWC, each returning 4 stage feature maps (strides 4/8/16/32).

Behavioral parity with the reference backbone files (ultralytics/nn/modules/
convnextv2.py, SwinTransformer.py, pvt_v2.py, efficientViT.py — the fork's
~170-file backbone zoo, SURVEY.md §2.4): same stage layouts and widths,
redesigned TPU-first — window partition is pure reshape, shifted-window masks
are precomputed static numpy, PVTv2's spatial-reduction attention is a strided
conv + batched matmul, and EfficientViT's ReLU linear attention is two einsums
(no softmax). parse_model gives these modules 5 y-cache slots (reference
tasks.py:3112 `backbone = True`).

Integration contract: __call__(x, train) -> [f4, f8, f16, f32]; class attr
WIDTH_LIST documents stage channels (reference `m.width_list`).
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase


# ------------------------------------------------------------- ConvNeXt ----
class ConvNeXtBlock(ConvBase):
    """dw7x7 -> LN -> pw(4x) -> GELU -> [GRN] -> pw -> [layer-scale] -> residual.

    grn=False is the V1 block (reference ConvNeXtV1.py:15, layer-scale gamma);
    grn=True is the V2 block (reference ConvNeXtV2_backbone.py:50, GRN on the
    4x hidden channels, no layer scale)."""

    dim: int = 96
    ls_init: float = 1e-6
    grn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, dtype=self.dtype, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = jax.nn.gelu(y)
        if self.grn:
            # global response normalization (reference ConvNeXtV2_backbone.py:36):
            # Gx = ||y||_2 over space; Nx = Gx / mean_c(Gx); y = g*(y*Nx)+b+y
            g = self.param("grn_gamma", nn.initializers.zeros, (4 * self.dim,))
            b = self.param("grn_beta", nn.initializers.zeros, (4 * self.dim,))
            gx = jnp.sqrt(jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(1, 2),
                                  keepdims=True))
            nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
            y = (g * (y * nx.astype(y.dtype)) + b + y).astype(y.dtype)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        if not self.grn:
            gamma = self.param("gamma", nn.initializers.constant(self.ls_init), (self.dim,))
            y = y * gamma
        return x + y


class ConvNeXt(ConvBase):
    """ConvNeXt backbone (tiny by default: depths 3/3/9/3, dims 96..768).

    grn=True gives ConvNeXtV2 stages (reference ConvNeXtV2_backbone.py:82)."""

    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    grn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        # stem: 4x4/4 conv + LN
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for s in range(4):
            if s > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"down_norm_{s}")(x)
                x = nn.Conv(self.dims[s], (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down_{s}")(x)
            for b in range(self.depths[s]):
                x = ConvNeXtBlock(dim=self.dims[s], grn=self.grn, dtype=self.dtype,
                                  name=f"s{s}_b{b}")(x, train)
            outs.append(x)
        return outs


# ----------------------------------------------------------------- Swin ----
def _window_partition(x, w):
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(win, w, h, wd):
    b = win.shape[0] // ((h // w) * (wd // w))
    x = win.reshape(b, h // w, wd // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


def _rel_pos_index(w: int) -> np.ndarray:
    """Relative position index for a w*w window (static numpy)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(h: int, wd: int, w: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows (static numpy, the reference's
    img_mask construction): -100 between different sub-regions."""
    img = np.zeros((1, h, wd, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = img.reshape(1, h // w, w, wd // w, w, 1).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(-1, w * w)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(ConvBase):
    """W-MSA / SW-MSA block with relative position bias + MLP."""

    dim: int = 96
    heads: int = 3
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, wd, c = x.shape
        w = self.window
        ph = (w - h % w) % w
        pw = (w - wd % w) % w
        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, wd + pw
        # reference SwinTransformer_backbone.py:216 shifts odd blocks at EVERY
        # resolution (mask handles the single-window case) — no min(H,W) gate
        shift = self.shift
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        win = _window_partition(y, w)  # (B*nw, w*w, c)

        nh = self.heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(win)
        q, k, v = jnp.split(qkv.reshape(-1, w * w, 3, nh, c // nh), 3, axis=2)
        q = q[:, :, 0].transpose(0, 2, 1, 3)
        k = k[:, :, 0].transpose(0, 2, 1, 3)
        v = v[:, :, 0].transpose(0, 2, 1, 3)
        attn = (q @ k.transpose(0, 1, 3, 2)) * (c // nh) ** -0.5  # (B*nw, nh, ww, ww)

        bias_table = self.param("rel_bias", nn.initializers.normal(0.02),
                                ((2 * w - 1) ** 2, nh))
        idx = jnp.asarray(_rel_pos_index(w).reshape(-1))
        bias = bias_table[idx].reshape(w * w, w * w, nh).transpose(2, 0, 1)
        attn = attn + bias[None]
        if shift:
            mask = jnp.asarray(_shift_mask(hp, wp, w, shift))  # (nw, ww, ww)
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, nh, w * w, w * w) + mask[None, :, None]
            attn = attn.reshape(-1, nh, w * w, w * w)
        attn = jax.nn.softmax(attn, axis=-1)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(-1, w * w, c)
        o = nn.Dense(c, dtype=self.dtype, name="proj")(o)
        o = _window_reverse(o, w, hp, wp)
        if shift:
            o = jnp.roll(o, (shift, shift), axis=(1, 2))
        o = o[:, :h, :wd]
        x = shortcut + o
        m = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        m = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(m)
        m = jax.nn.gelu(m)
        m = nn.Dense(c, dtype=self.dtype, name="fc2")(m)
        return x + m


class SwinTransformer(ConvBase):
    """Swin backbone (tiny: depths 2/2/6/2, dims 96, heads 3/6/12/24)."""

    depths: Tuple[int, ...] = (2, 2, 6, 2)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        # patch embed 4x4/4 + LN
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)
        outs = []
        for s in range(4):
            if s > 0:
                # patch merging: 2x2 neighborhood concat + LN + Dense
                b, h, wd, c = x.shape
                ph, pw = h % 2, wd % 2
                if ph or pw:
                    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                                     x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
                x = nn.LayerNorm(dtype=self.dtype, name=f"merge_norm_{s}")(x)
                x = nn.Dense(self.dims[s], use_bias=False, dtype=self.dtype,
                             name=f"merge_{s}")(x)
            for bI in range(self.depths[s]):
                x = SwinBlock(dim=self.dims[s], heads=self.heads[s], window=self.window,
                              shift=0 if bI % 2 == 0 else self.window // 2,
                              dtype=self.dtype, name=f"s{s}_b{bI}")(x, train)
            outs.append(nn.LayerNorm(dtype=self.dtype, name=f"out_norm_{s}")(x))
        return outs


# ---------------------------------------------------------------- PVTv2 ----
class PVT2Block(ConvBase):
    """PVTv2 block: spatial-reduction attention + dwconv MLP."""

    dim: int = 64
    heads: int = 1
    sr: int = 8
    mlp_ratio: float = 8.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = self.heads
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        q = nn.Dense(c, dtype=self.dtype, name="q")(y).reshape(b, h * w, nh, c // nh)
        kv_in = y
        if self.sr > 1:
            kv_in = nn.Conv(c, (self.sr, self.sr), strides=(self.sr, self.sr),
                            dtype=self.dtype, name="sr")(y)
            kv_in = nn.LayerNorm(dtype=self.dtype, name="sr_norm")(kv_in)
        kv = nn.Dense(2 * c, dtype=self.dtype, name="kv")(kv_in)
        n_kv = kv.shape[1] * kv.shape[2]
        kv = kv.reshape(b, n_kv, 2, nh, c // nh)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (c // nh) ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, c)
        x = x + nn.Dense(c, dtype=self.dtype, name="proj")(o)

        m = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        hid = int(c * self.mlp_ratio)
        m = nn.Dense(hid, dtype=self.dtype, name="fc1")(m)
        m = nn.Conv(hid, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=hid,
                    dtype=self.dtype, name="dw")(m)
        m = jax.nn.gelu(m)
        m = nn.Dense(c, dtype=self.dtype, name="fc2")(m)
        return x + m


class PVTv2(ConvBase):
    """PVTv2 backbone (b0: dims 32/64/160/256, depths 2/2/2/2, sr 8/4/2/1)."""

    dims: Tuple[int, ...] = (32, 64, 160, 256)
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    heads: Tuple[int, ...] = (1, 2, 5, 8)
    srs: Tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratios: Tuple[float, ...] = (8.0, 8.0, 4.0, 4.0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for s in range(4):
            k, st = (7, 4) if s == 0 else (3, 2)
            x = nn.Conv(self.dims[s], (k, k), strides=(st, st),
                        padding=((k // 2, k // 2), (k // 2, k // 2)),
                        dtype=self.dtype, name=f"patch_{s}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"patch_norm_{s}")(x)
            for bI in range(self.depths[s]):
                x = PVT2Block(dim=self.dims[s], heads=self.heads[s], sr=self.srs[s],
                              mlp_ratio=self.mlp_ratios[s], dtype=self.dtype,
                              name=f"s{s}_b{bI}")(x, train)
            x = nn.LayerNorm(dtype=self.dtype, name=f"out_norm_{s}")(x)
            outs.append(x)
        return outs


# ---------------------------------------------------------- EfficientViT ----
class LiteMLA(ConvBase):
    """Lightweight multi-scale linear attention (EfficientViT, MIT): ReLU
    feature maps -> linear attention as two matmuls (no softmax) — the
    canonical TPU-friendly attention."""

    dim: int = 64
    heads_dim: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = max(c // self.heads_dim, 1)
        d = c // nh
        qkv = nn.Conv(3 * c, (1, 1), use_bias=False, dtype=self.dtype, name="qkv")(x)
        # multi-scale: extra 3x3 depthwise aggregation of qkv
        qkv_ms = nn.Conv(3 * c, (3, 3), padding=((1, 1), (1, 1)),
                         feature_group_count=3 * c, use_bias=False,
                         dtype=self.dtype, name="aggreg")(qkv)
        outs = []
        for src in (qkv, qkv_ms):
            q, k, v = jnp.split(src.reshape(b, h * w, 3, nh, d), 3, axis=2)
            q = jax.nn.relu(q[:, :, 0])  # (b, n, nh, d)
            k = jax.nn.relu(k[:, :, 0])
            v = v[:, :, 0]
            # linear attention: out = q (k^T v) / (q k^T 1)
            kv = jnp.einsum("bnhd,bnhe->bhde", k, v)
            num = jnp.einsum("bnhd,bhde->bnhe", q, kv)
            den = jnp.einsum("bnhd,bhd->bnh", q, k.sum(1)) + 1e-6
            outs.append(num / den[..., None])
        o = jnp.concatenate(outs, -1).reshape(b, h, w, 2 * c)
        return nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="proj")(o)


class MBConv(ConvBase):
    """Inverted-residual conv block (expand pw -> dw -> SE-free pw)."""

    c2: int = 0
    s: int = 1
    e: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        mid = int(c1 * self.e)
        y = Conv(c2=mid, k=1, act=jax.nn.hard_swish, dtype=self.dtype, name="pw")(x, train)
        y = Conv(c2=mid, k=3, s=self.s, g=mid, act=jax.nn.hard_swish,
                 dtype=self.dtype, name="dw")(y, train)
        y = Conv(c2=self.c2, k=1, act=False, dtype=self.dtype, name="pw2")(y, train)
        if self.s == 1 and c1 == self.c2:
            y = x + y
        return y


class EfficientViT(ConvBase):
    """EfficientViT backbone (b0-style): conv stem + MBConv stages, LiteMLA
    transformer blocks in the last two stages."""

    dims: Tuple[int, ...] = (16, 32, 64, 128)
    depths: Tuple[int, ...] = (2, 2, 3, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(c2=self.dims[0] // 2, k=3, s=2, act=jax.nn.hard_swish,
                 dtype=self.dtype, name="stem")(x, train)
        outs = []
        for s in range(4):
            x = MBConv(c2=self.dims[s], s=2, dtype=self.dtype, name=f"s{s}_down")(x, train)
            for bI in range(self.depths[s]):
                if s >= 2:
                    x = x + LiteMLA(dim=self.dims[s], dtype=self.dtype,
                                    name=f"s{s}_attn_{bI}")(x, train)
                x = MBConv(c2=self.dims[s], s=1, dtype=self.dtype,
                           name=f"s{s}_b{bI}")(x, train)
            outs.append(x)
        return outs


# builder-facing aliases matching the reference export names
BACKBONE_VARIANTS = {
    # reference convnextv2.py exports
    "convnextv2_atto": (ConvNeXt, (("depths", (2, 2, 6, 2)), ("dims", (40, 80, 160, 320)),
                                   ("grn", True))),
    "convnextv2_nano": (ConvNeXt, (("depths", (2, 2, 8, 2)), ("dims", (80, 160, 320, 640)),
                                   ("grn", True))),
    "convnext_tiny": (ConvNeXt, (("depths", (3, 3, 9, 3)), ("dims", (96, 192, 384, 768)))),
    # reference SwinTransformer.py exports
    "SwinTransformer_Tiny": (SwinTransformer, ()),
    "swin_tiny": (SwinTransformer, ()),
    # reference pvt_v2.py exports
    "pvt_v2_b0": (PVTv2, ()),
    "pvt_v2_b1": (PVTv2, (("dims", (64, 128, 320, 512)),)),
    "pvt_v2_b2": (PVTv2, (("dims", (64, 128, 320, 512)), ("depths", (3, 4, 6, 3)))),
    # reference efficientViT.py exports
    "efficientvit_backbone_b0": (EfficientViT, ()),
    "efficientvit_backbone_b1": (EfficientViT, (("dims", (32, 64, 128, 256)),)),
    "EfficientViT_M0": (EfficientViT, ()),
}
