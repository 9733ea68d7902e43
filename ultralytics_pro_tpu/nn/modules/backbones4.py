"""Whole-backbone zoo, tranche 4: the long single-file tail of the reference's
backbone families served by ONE metaformer-style stage factory with a
per-family token-mixer map.

Design: every family here follows the 4-stage [H/4, H/8, H/16, H/32] layout
with a patchify/conv stem, per-stage downsample, and blocks of the form
x = x + mixer(norm(x)); x = x + MLP(norm(x)). What differs per family is the
token mixer — implemented below from this repo's real blocks (pool, LKA,
linear attention, SS2D, cascaded group attention, partial conv, strips,
inception split, conv modulation). Families whose mixer is faithfully
reproduced are exact-structure; the rest are DECLARED APPROXIMATIONS listed in
COVERAGE.md (the reference files are cited per entry).

Reference: /root/reference/ultralytics/nn/modules/<family>.py per entry.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.backbones2 import _bn
from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase, DWConv


class _Mixer(ConvBase):
    """Token mixer dispatch (channel-preserving, NHWC)."""

    kind: str = "pool"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        k = self.kind
        if k == "identity":
            return x
        if k == "pool":
            return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME") - x
        if k == "dwconv":
            y = nn.Conv(c, (7, 7), padding="SAME", feature_group_count=c,
                        dtype=self.dtype, name="dw")(x)
            return nn.Conv(c, (1, 1), dtype=self.dtype, name="pw")(y)
        if k == "lka":
            # VAN large-kernel attention: dw5 -> dw7 d3 -> 1x1, gate
            a = nn.Conv(c, (5, 5), padding="SAME", feature_group_count=c,
                        dtype=self.dtype, name="dw5")(x)
            a = nn.Conv(c, (7, 7), padding="SAME", kernel_dilation=(3, 3),
                        feature_group_count=c, dtype=self.dtype, name="dw7d3")(a)
            a = nn.Conv(c, (1, 1), dtype=self.dtype, name="pw")(a)
            return a * x
        if k == "strip":
            y = nn.Conv(c, (1, 7), padding="SAME", feature_group_count=c,
                        dtype=self.dtype, name="h")(x)
            y = nn.Conv(c, (7, 1), padding="SAME", feature_group_count=c,
                        dtype=self.dtype, name="v")(y)
            return nn.Conv(c, (1, 1), dtype=self.dtype, name="pw")(y)
        if k == "inception":
            # iFormer/PKI-style split: pool / dw3 / dw5 / global-attn quarter
            c4 = c // 4
            p1 = nn.max_pool(x[..., :c4], (3, 3), strides=(1, 1), padding="SAME")
            p2 = nn.Conv(c4, (3, 3), padding="SAME", feature_group_count=c4,
                         dtype=self.dtype, name="dw3")(x[..., c4:2 * c4])
            p3 = nn.Conv(c4, (5, 5), padding="SAME", feature_group_count=c4,
                         dtype=self.dtype, name="dw5")(x[..., 2 * c4:3 * c4])
            rest = x[..., 3 * c4:]
            b, h, w, cr = rest.shape
            t = rest.reshape(b, h * w, cr)
            att = nn.MultiHeadDotProductAttention(
                num_heads=1, qkv_features=max(cr, 8), dtype=self.dtype, name="attn")(t, t)
            p4 = att.reshape(b, h, w, cr)
            return nn.Conv(c, (1, 1), dtype=self.dtype,
                           name="fuse")(jnp.concatenate([p1, p2, p3, p4], -1))
        if k == "attn":
            b, h, w, _ = x.shape
            nh = max(1, c // 64)
            while nh > 1 and c % nh:  # flax MHA needs heads | qkv_features
                nh -= 1
            t = x.reshape(b, h * w, c)
            y = nn.MultiHeadDotProductAttention(num_heads=nh, qkv_features=c,
                                                dtype=self.dtype, name="attn")(t, t)
            return y.reshape(b, h, w, c)
        if k == "linattn":
            from ultralytics_pro_tpu.nn.modules.zoo_r3 import MLLABlock

            # MLLABlock is a full block (mixer+MLP); return delta so the
            # factory's own residual/MLP wrap stays a no-op double-residual
            return MLLABlock(dtype=self.dtype, name="mlla")(x, train) - x
        if k == "cga":
            from ultralytics_pro_tpu.nn.modules.zoo_r3 import CascadedGroupAttention

            return CascadedGroupAttention(dtype=self.dtype, name="cga")(x, train)
        if k == "pconv":
            c4 = max(c // 4, 1)
            y = nn.Conv(c4, (3, 3), padding="SAME", dtype=self.dtype,
                        name="pc")(x[..., :c4])
            return jnp.concatenate([y, x[..., c4:]], -1)
        if k == "mbconv":
            h2 = c * 2
            y = Conv(c2=h2, k=1, dtype=self.dtype, name="exp")(x, train)
            y = DWConv(c2=h2, k=3, dtype=self.dtype, name="dw")(y, train)
            return Conv(c2=c, k=1, act=False, dtype=self.dtype, name="proj")(y, train)
        if k == "ss2d":
            from ultralytics_pro_tpu.nn.modules.mamba import SS2D

            return SS2D(d_model=c, dtype=self.dtype, name="ss2d")(x, train)
        if k == "convmod":
            a = nn.Conv(c, (11, 11), padding="SAME", feature_group_count=c,
                        dtype=self.dtype, name="mod_dw")(x)
            v = nn.Conv(c, (1, 1), dtype=self.dtype, name="mod_v")(x)
            return nn.Conv(c, (1, 1), dtype=self.dtype, name="mod_pw")(a * v)
        if k == "fft":
            # GFNet/DFFormer-style global filter (reference DFFormer.py):
            # learned complex spectral weights multiply the 2D rFFT of the
            # token map. Dynamic-filter variants predict the weights per
            # token; the shared-filter form here is the GFFormer structure
            # and a declared approximation for DFFormer (COVERAGE.md).
            b, h, w, _ = x.shape
            f = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))
            # Filters live on a fixed base grid and are resized to the
            # trace-time spectrum (the reference GFNet-family filter is
            # stored once and interpolated), so one checkpoint serves every
            # input resolution instead of binding params to the trace shape.
            bh, bw = 16, 9
            wr = self.param("filt_re", nn.initializers.ones, (bh, bw, c))
            wi = self.param("filt_im", nn.initializers.zeros, (bh, bw, c))
            if (h, w // 2 + 1) != (bh, bw):
                wr = jax.image.resize(wr, (h, w // 2 + 1, c), "bilinear")
                wi = jax.image.resize(wi, (h, w // 2 + 1, c), "bilinear")
            f = f * jax.lax.complex(wr.astype(jnp.float32), wi.astype(jnp.float32))
            y = jnp.fft.irfft2(f, s=(h, w), axes=(1, 2)).astype(x.dtype)
            return nn.Conv(c, (1, 1), dtype=self.dtype, name="pw")(y)
        if k == "random":
            # RandFormer: frozen random token-mixing matrix over a pooled grid
            y = nn.avg_pool(x, (4, 4), strides=(4, 4), padding="SAME")
            b, hh, ww, _ = y.shape
            t = y.reshape(b, hh * ww, c)
            m = self.param("rand_mix", nn.initializers.normal(0.02), (hh * ww, hh * ww))
            t = jax.lax.stop_gradient(m) @ t
            y = t.reshape(b, hh, ww, c)
            y = jnp.repeat(jnp.repeat(y, 4, 1), 4, 2)[:, :x.shape[1], :x.shape[2]]
            return nn.Conv(c, (1, 1), dtype=self.dtype, name="pw")(y)
        raise NotImplementedError(f"mixer '{k}'")


class MetaBlock(ConvBase):
    kind: str = "pool"
    mlp_ratio: float = 4.0
    ls_init: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        g1 = self.param("ls1", nn.initializers.constant(self.ls_init), (c,))
        g2 = self.param("ls2", nn.initializers.constant(self.ls_init), (c,))
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + g1 * _Mixer(kind=self.kind, dtype=self.dtype, name="mixer")(y, train)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(jax.nn.gelu(y))
        return x + g2 * y


class StageBackbone(ConvBase):
    """4-stage metaformer backbone: stem(stride4) -> [blocks, down] x 4;
    emits the four stride-4/8/16/32 maps."""

    dims: Sequence[int] = (64, 128, 256, 512)
    depths: Sequence[int] = (2, 2, 6, 2)
    mixers: Any = "pool"  # str or per-stage tuple
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mix = self.mixers if isinstance(self.mixers, (tuple, list)) else [self.mixers] * 4
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="stem")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="stem_norm")(x)
        outs = []
        for s in range(4):
            if s > 0:
                x = nn.Conv(self.dims[s], (2, 2), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down{s}")(x)
                x = nn.LayerNorm(dtype=self.dtype, name=f"down{s}_norm")(x)
            for b in range(self.depths[s]):
                x = MetaBlock(kind=mix[s], mlp_ratio=self.mlp_ratio,
                              dtype=self.dtype, name=f"s{s}_b{b}")(x, train)
            outs.append(x)
        return outs


def _e(dims, depths, mixers, **kw):
    return (StageBackbone, tuple(dict(dims=tuple(dims), depths=tuple(depths),
                                      mixers=mixers, **kw).items()))


# name -> (class, kwargs). EXACT-mixer families: poolformer/identityformer/
# convformer (metaformer paper structure), van (LKA), mlla (linear attention),
# fasternet (partial conv), stripmlp (strips), efficientvim (SS2D). The rest
# substitute the nearest mixer above — each is listed in COVERAGE.md's
# approximations table with its reference file.
BACKBONE_VARIANTS4 = {
    # metaformer family (reference poolformer.py / CAFormer)
    "poolformerv2_s12": _e((64, 128, 320, 512), (2, 2, 6, 2), "pool"),
    "identityformer_s12": _e((64, 128, 320, 512), (2, 2, 6, 2), "identity"),
    "randformer_s12": _e((64, 128, 320, 512), (2, 2, 6, 2), ("random",) * 4),
    "convformer_s18": _e((64, 128, 320, 512), (3, 3, 9, 3), "dwconv"),
    "caformer_s18": _e((64, 128, 320, 512), (3, 3, 9, 3),
                       ("dwconv", "dwconv", "attn", "attn")),
    # VAN (reference VAN.py) — true LKA mixer
    "van_b0": _e((32, 64, 160, 256), (3, 3, 5, 2), "lka"),
    # MLLA (reference MLLA_backbone.py) — true linear-attention block
    "MLLA_Tiny": _e((64, 128, 320, 512), (2, 4, 8, 4), "linattn", mlp_ratio=2.0),
    # FasterNet variants (reference FasterNet.py) — true partial-conv mixer
    "fasternet_s": _e((128, 256, 512, 1024), (1, 2, 13, 2), "pconv", mlp_ratio=2.0),
    "fasternet_t2": _e((96, 192, 384, 768), (1, 2, 8, 2), "pconv", mlp_ratio=2.0),
    # strip-mixer family (reference StripMLP.py / StripNet)
    "StripMLPNet_LightTiny": _e((48, 96, 192, 384), (2, 2, 6, 2), "strip"),
    "StripNet_tiny": _e((48, 96, 192, 384), (2, 2, 6, 2), "strip"),
    # SSM (reference EfficientViM.py) — true SS2D mixer
    "EfficientViM_M5": _e((64, 128, 256, 512), (2, 2, 4, 2), "ss2d"),
    # vheat_tiny is re-bound to the faithful VHeatBackbone below
    # conv-modulation family (reference SMT.py / Conv2Former lineage)
    # smt_l is re-bound to the faithful SMTBackbone below
    # cosnet_tiny is re-bound to the faithful COSNetBackbone below
    "florane_tiny": _e((64, 128, 256, 512), (2, 2, 6, 2), "dwconv"),
    # decouplenet_d2 is re-bound to the faithful DecoupleNetBackbone below
    # overlock_xt is re-bound to the faithful OverLoCKBackbone below
    # pkinet_t is re-bound to the faithful PKINetBackbone below
    # iformer_small is re-bound to the faithful IFormerBackbone below
    # transxnet_tiny is re-bound to the faithful TransXNetBackbone below
    # glnet_4g is re-bound to the faithful GLNetBackbone below
    # uninext_t is re-bound to the faithful UniNeXtBackbone below
    # EMO2_1M/5M are re-bound to the faithful EMO2Backbone below
    # attention tail substitutions
    # EViT_Tiny is re-bound to the faithful EViTBackbone below
    # stvit_small is re-bound to the faithful STViTBackbone below
    # transnext_micro is re-bound to the faithful TransNeXtBackbone below
    # sgformer_s is re-bound to the faithful SGFormerBackbone below
    # GroupMixFormerTiny is re-bound to the faithful backbone below
    # spanet_s is re-bound to the faithful SPANetBackbone below
    # LWGANet_L2 is re-bound to the faithful LWGANetBackbone below
}


class RepVGGBackbone(ConvBase):
    """QARepVGG-A0-style stage stack (reference QARepVGG.py A0: width mult
    0.75, depths 2/4/14/1)."""

    dims: Sequence[int] = (48, 96, 192, 1280)
    depths: Sequence[int] = (2, 4, 14, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.reparam import QARepVGGBlockV2

        x = QARepVGGBlockV2(c2=self.dims[0], k=3, s=2, dtype=self.dtype, name="stem")(x, train)
        outs = []
        for s in range(4):
            for b in range(self.depths[s]):
                x = QARepVGGBlockV2(c2=self.dims[s], k=3, s=2 if b == 0 else 1,
                                    dtype=self.dtype, name=f"s{s}_b{b}")(x, train)
            outs.append(x)
        return outs


class ResNetBackbone(ConvBase):
    """ResNet stage stack (kw_resnet18 / uni_resnet50 / resnet18_moe yaml
    entries map here; the kernel-warehouse / latency-aware / MoE gating of
    the reference variants is approximated by the plain topology —
    COVERAGE.md)."""

    depths: Sequence[int] = (2, 2, 2, 2)
    e: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.block import ResNetLayer

        x = ResNetLayer(c2=64, s=1, is_first=True, dtype=self.dtype, name="stem")(x, train)
        outs = []
        for si, (c, n0) in enumerate(zip((64, 128, 256, 512), self.depths)):
            x = ResNetLayer(c2=c, s=1 if si == 0 else 2, n=n0, e=self.e,
                            dtype=self.dtype, name=f"layer{si + 1}")(x, train)
            outs.append(x)
        return outs


class RepLKNetBackbone(ConvBase):
    """RepLKNet — faithful to the reference (RepLKNet.py:187): 4-conv stem
    (conv3s2, dw3, 1x1, dw3s2), stages of [RepLKBlock, ConvFFN] pairs where
    RepLKBlock = preBN -> 1x1(bn,relu) -> reparam large-kernel DW (31/29/27/13
    + parallel small-5 branch, deploy-fusable) -> relu -> 1x1(bn) -> residual,
    ConvFFN = preBN -> 1x1 -> GELU -> 1x1 -> residual; 1x1 + dw3s2
    transitions. 31B config: channels (128,256,512,1024), layers (2,2,18,2)."""

    dims: Sequence[int] = (128, 256, 512, 1024)
    depths: Sequence[int] = (2, 2, 18, 2)
    lk_sizes: Sequence[int] = (31, 29, 27, 13)
    small_kernel: int = 5
    ffn_ratio: int = 4

    def _cbr(self, x, c, k, s, g, name, train, act=True):
        p = k // 2
        y = nn.Conv(c, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                    feature_group_count=g, use_bias=False, dtype=self.dtype,
                    name=name, parent=self)(x)
        y = _bn(self, f"{name}_bn", y, train)
        return jax.nn.relu(y) if act else y

    @nn.compact
    def __call__(self, x, train: bool = False):
        w0 = self.dims[0]
        x = self._cbr(x, w0, 3, 2, 1, "stem0", train)
        x = self._cbr(x, w0, 3, 1, w0, "stem1", train)
        x = self._cbr(x, w0, 1, 1, 1, "stem2", train)
        x = self._cbr(x, w0, 3, 2, w0, "stem3", train)
        outs = []
        for si in range(4):
            c = self.dims[si]
            lk = self.lk_sizes[si]
            for bi in range(self.depths[si]):
                # RepLKBlock
                y = _bn(self, f"s{si}_b{bi}_prebn", x, train)
                y = self._cbr(y, c, 1, 1, 1, f"s{si}_b{bi}_pw1", train)
                big = self._cbr(y, c, lk, 1, c, f"s{si}_b{bi}_lk", train, act=False)
                small = self._cbr(y, c, self.small_kernel, 1, c,
                                  f"s{si}_b{bi}_sk", train, act=False)
                y = jax.nn.relu(big + small)
                y = self._cbr(y, c, 1, 1, 1, f"s{si}_b{bi}_pw2", train, act=False)
                x = x + y
                # ConvFFN
                y = _bn(self, f"s{si}_b{bi}_ffnbn", x, train)
                y = self._cbr(y, c * self.ffn_ratio, 1, 1, 1, f"s{si}_b{bi}_f1", train, act=False)
                y = jax.nn.gelu(y)
                y = self._cbr(y, c, 1, 1, 1, f"s{si}_b{bi}_f2", train, act=False)
                x = x + y
            outs.append(x)
            if si < 3:
                c2 = self.dims[si + 1]
                x = self._cbr(x, c2, 1, 1, 1, f"t{si}_pw", train)
                x = self._cbr(x, c2, 3, 2, c2, f"t{si}_dw", train)
        return outs


def _dct_maps(h: int, w: int):
    """DCT-II basis + squared-frequency decay map (reference vHeat.py:116-131
    get_cos_map/get_decay_map), computed in f32."""
    import numpy as np

    def cos_map(n):
        wx = (np.linspace(0, n - 1, n, dtype=np.float32)[None, :] + 0.5) / n
        wn = np.linspace(0, n - 1, n, dtype=np.float32)[:, None]
        m = np.cos(wn * wx * np.pi) * np.sqrt(2.0 / n)
        m[0, :] /= np.sqrt(2.0)
        return m

    wn = np.linspace(0, np.pi, h + 1, dtype=np.float32)[:h][:, None]
    wm = np.linspace(0, np.pi, w + 1, dtype=np.float32)[:w][None, :]
    decay = np.exp(-(wn ** 2 + wm ** 2))
    return jnp.asarray(cos_map(h)), jnp.asarray(cos_map(w)), jnp.asarray(decay)


class Heat2D(ConvBase):
    """vHeat heat-conduction operator (reference vHeat.py:99 Heat2D), NHWC.

    dwconv3 -> linear to (x, z) -> 2-D DCT-II over H,W (cos-map matmuls; MXU
    work, not FFT) -> per-frequency decay exp(-(n^2+m^2))^k with k =
    ReLU(Linear(freq_embed)) -> inverse DCT -> LayerNorm -> silu(z) gate ->
    out linear."""

    @nn.compact
    def __call__(self, x, freq, train: bool = False):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                    dtype=self.dtype, name="dwconv")(x)
        xz = nn.Dense(2 * c, dtype=self.dtype, name="linear")(x)
        x, z = jnp.split(xz, 2, axis=-1)
        h, w = x.shape[1], x.shape[2]
        cosn, cosm, decay = _dct_maps(h, w)
        xf = x.astype(jnp.float32)
        xf = jnp.einsum("bhwc,nh->bnwc", xf, cosn)
        xf = jnp.einsum("bnwc,mw->bnmc", xf, cosm)
        k = jax.nn.relu(nn.Dense(c, dtype=self.dtype, name="to_k")(freq))
        xf = xf * jnp.power(decay[:, :, None], k.astype(jnp.float32))
        xf = jnp.einsum("bnmc,nh->bhmc", xf, cosn)
        xf = jnp.einsum("bhmc,mw->bhwc", xf, cosm)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_norm")(xf.astype(x.dtype))
        x = x * jax.nn.silu(z)
        return nn.Dense(c, dtype=self.dtype, name="out_linear")(x)


class VHeatBackbone(ConvBase):
    """Faithful vHeat visual-heat-conduction backbone (reference vHeat.py:227
    vHeat; vheat_tiny :383 = dims (96,192,384,768), depths (2,2,6,2),
    post_norm=False). Stem = conv3s2 -> LN -> GELU -> conv3s2 -> LN; stages of
    pre-norm HeatBlocks (x += Heat2D(LN(x), freq); x += MLP(LN(x))); per-stage
    learnable frequency embeddings (res_i, res_i, C_i) bilinearly resized to
    the running (H, W) as the reference's forward does; stage outputs emitted
    BEFORE each conv3s2+LN downsample (strides 4/8/16/32)."""

    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 6, 2)
    img_size: int = 224
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c0 = self.dims[0]
        x = nn.Conv(c0 // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem_conv1")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="stem_norm1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(c0, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem_conv2")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="stem_norm2")(x)
        outs = []
        for si in range(4):
            c = self.dims[si]
            res = max(self.img_size // 4 // (2 ** si), 1)
            freq = self.param(f"freq{si}",
                              nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
                              (res, res, c))
            h, w = x.shape[1], x.shape[2]
            if (h, w) != (res, res):
                freq = jax.image.resize(freq, (h, w, c), method="linear")
            freq = freq.astype(self.dtype)
            for bi in range(self.depths[si]):
                y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"s{si}_b{bi}_norm1")(x)
                x = x + Heat2D(dtype=self.dtype, name=f"s{si}_b{bi}_op")(y, freq, train)
                y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"s{si}_b{bi}_norm2")(x)
                y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                             name=f"s{si}_b{bi}_fc1")(y)
                y = nn.Dense(c, dtype=self.dtype, name=f"s{si}_b{bi}_fc2")(jax.nn.gelu(y, approximate=False))
                x = x + y
            outs.append(x)
            if si < 3:
                x = nn.Conv(self.dims[si + 1], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=self.dtype, name=f"down{si}")(x)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"down{si}_norm")(x)
        return outs


def _spam_chunks(dim: int):
    """SPAM chunk count + lambdas (reference SPANet.py:191-216): lambs from
    arange(0.7, 1.0, 0.1) in float32; if dim isn't divisible by 3, fall back
    to 2 (even dims) or 1 chunks, reusing the first lambs."""
    import numpy as np

    lambs = [float(v) for v in np.arange(0.7, 1.0, 0.1, dtype=np.float32)]
    n = len(lambs)
    if dim % n != 0:
        n = 3 if dim % 3 == 0 else (2 if dim % 2 == 0 else 1)
    return n, lambs[:n]


def _spf_filter(h0: int, w0: int, r: float, lamb: float, h: int, w: int):
    """Spectral Pooling Filter base at the config resolution (h0, w0), then
    pad (with the center value) or center-crop to the runtime (h, w), exactly
    as the reference SPF.forward does (SPANet.py:86-163). Note the reference
    compares the ROW index against W//2 and the COLUMN index against H//2
    (X from arange(H) with indexing='ij'); all shipped configs are square so
    it is symmetric, but we replicate it verbatim."""
    import numpy as np

    xc, yc = w0 // 2, h0 // 2
    I, J = np.meshgrid(np.arange(h0, dtype=np.float32),
                       np.arange(w0, dtype=np.float32), indexing="ij")
    circle = np.sqrt((I - xc) ** 2 + (J - yc) ** 2)
    filt = np.where(circle < r, np.float32(lamb), 0.0) + \
        np.where(circle > r, np.float32(1.0 - lamb), 0.0)
    filt = np.where(np.isclose(circle, np.float32(r)), np.float32(1.0 / 3.0),
                    filt).astype(np.float32)
    if (h, w) != (h0, w0):
        pad_val = float(filt[h0 // 2, w0 // 2])
        dh, dw = h - h0, w - w0
        if dh < 0 or dw < 0:  # center-crop
            ct = max(0, (h0 - h) // 2)
            cb = h0 - max(0, (h0 - h) // 2 + (h0 - h) % 2)
            cl = max(0, (w0 - w) // 2)
            cr = w0 - max(0, (w0 - w) // 2 + (w0 - w) % 2)
            filt = filt[ct:cb, cl:cr]
        if filt.shape != (h, w):  # pad (top/left get the odd pixel)
            dh, dw = h - filt.shape[0], w - filt.shape[1]
            filt = np.pad(filt,
                          ((max(0, dh // 2 + dh % 2), max(0, dh // 2)),
                           (max(0, dw // 2 + dw % 2), max(0, dw // 2))),
                          constant_values=pad_val)
    return jnp.asarray(filt)


class SPAM(ConvBase):
    """SPANet spectral-pooling aggregation mixer (reference SPANet.py:191):
    1x1 proj -> separable dw (1,k)+(k,1) conv -> channel chunks, each FFT2
    (ortho) -> fftshift -> circular low/high-pass filter -> ifft2 -> per-chunk
    1x1 up-proj, summed into a context map that modulates the conv features."""

    k_size: int = 7
    r: float = 2.0
    h0: int = 56
    w0: int = 56

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        k = self.k_size
        n_chunk, lambs = _spam_chunks(c)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
        y = nn.Conv(c, (1, k), padding=((0, 0), (k // 2, k // 2)),
                    feature_group_count=c, dtype=self.dtype, name="conv0")(y)
        y = nn.Conv(c, (k, 1), padding=((k // 2, k // 2), (0, 0)),
                    feature_group_count=c, dtype=self.dtype, name="conv1")(y)
        h, w = y.shape[1], y.shape[2]
        chunks = jnp.split(y, n_chunk, axis=-1)
        ctx = None
        for i, (ch, lamb) in enumerate(zip(chunks, lambs)):
            filt = _spf_filter(self.h0, self.w0, self.r, lamb, h, w)
            f = jnp.fft.fft2(ch.astype(jnp.float32), axes=(1, 2), norm="ortho")
            f = jnp.fft.fftshift(f, axes=(1, 2)) * filt[None, :, :, None]
            f = jnp.fft.ifftshift(f, axes=(1, 2))
            sp = jnp.real(jnp.fft.ifft2(f, axes=(1, 2), norm="ortho")).astype(y.dtype)
            p = nn.Conv(c, (1, 1), dtype=self.dtype, name=f"pw{i}")(sp)
            ctx = p if ctx is None else ctx + p
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(y * ctx)


class SPANetBackbone(ConvBase):
    """Faithful SPANet (reference SPANet.py:329; spanet_s :536 = layers
    (4,4,12,4), dims (64,128,320,512), radius (2,2,1,1), res-scale on the
    last two stages). conv7-s4-p2 stem, conv3-s2-p1 downsamples, GroupNorm(1)
    norms, SPAM token mixer, 1x1-conv MLP; per-stage GroupNorm'd outputs."""

    dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (4, 4, 12, 4)
    radius: Sequence[float] = (2.0, 2.0, 1.0, 1.0)
    res_scale: Sequence[float] = (0.0, 0.0, 1.0, 1.0)  # 0 = Identity
    mlp_ratio: float = 4.0
    k_size: int = 7
    img_size: int = 224

    def _gn(self, x, name):
        return nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                            name=name, parent=self)(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.dims[0], (7, 7), strides=(4, 4),
                    padding=((2, 2), (2, 2)), dtype=self.dtype, name="stem")(x)
        outs = []
        for si in range(4):
            c = self.dims[si]
            res0 = self.img_size // 4 // (2 ** si)
            if si > 0:
                x = nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"down{si}")(x)
            for bi in range(self.depths[si]):
                pre = f"s{si}_b{bi}"
                y = SPAM(k_size=self.k_size, r=float(self.radius[si]), h0=res0,
                         w0=res0, dtype=self.dtype, name=f"{pre}_mix")(
                    self._gn(x, f"{pre}_norm1"), train)
                if self.res_scale[si]:
                    g = self.param(f"{pre}_res1", nn.initializers.constant(
                        self.res_scale[si]), (c,))
                    x = x * g + y
                else:
                    x = x + y
                y = self._gn(x, f"{pre}_norm2")
                y = nn.Conv(int(c * self.mlp_ratio), (1, 1), dtype=self.dtype,
                            name=f"{pre}_fc1")(y)
                y = nn.Conv(c, (1, 1), dtype=self.dtype,
                            name=f"{pre}_fc2")(jax.nn.gelu(y, approximate=False))
                if self.res_scale[si]:
                    g = self.param(f"{pre}_res2", nn.initializers.constant(
                        self.res_scale[si]), (c,))
                    x = x * g + y
                else:
                    x = x + y
            outs.append(self._gn(x, f"norm_feat{si}"))
        return outs


class SMTAttention(ConvBase):
    """SMT mixer (reference SMT.py:57). ca=True: scale-aware modulation —
    per-head depthwise convs of growing kernel (3,5,7,...) on the `s` branch,
    grouped-1x1 expand + BN + GELU + 1x1 back, modulating `v`. ca=False:
    MHSA plus a parallel depthwise-3x3 local branch on v."""

    ca_heads: int = 4
    sa_heads: int = 8
    ca: bool = True
    expand_ratio: int = 2
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        if self.ca:
            h = self.ca_heads
            ch = c // h
            v = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(x)
            s = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="s")(x)
            outs = []
            for i in range(h):
                k = 3 + i * 2
                outs.append(nn.Conv(ch, (k, k), padding="SAME",
                                    feature_group_count=ch, dtype=self.dtype,
                                    name=f"local_conv_{i + 1}")(
                    s[..., i * ch:(i + 1) * ch]))
            so = jnp.concatenate(outs, -1)
            so = nn.Conv(c * self.expand_ratio, (1, 1), feature_group_count=ch,
                         dtype=self.dtype, name="proj0")(so)
            so = _bn(self, "bn", so, train)
            so = jax.nn.gelu(so, approximate=False)
            so = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj1")(so)
            x = so * v
        else:
            b, hh, ww, _ = x.shape
            nh = self.sa_heads
            d = c // nh
            t = x.reshape(b, hh * ww, c)
            q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(t)
            kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="kv")(t)
            kk, vv = jnp.split(kv, 2, -1)
            q = q.reshape(b, -1, nh, d).transpose(0, 2, 1, 3)
            kk = kk.reshape(b, -1, nh, d).transpose(0, 2, 1, 3)
            vv = vv.reshape(b, -1, nh, d).transpose(0, 2, 1, 3)
            att = jax.nn.softmax((q @ kk.transpose(0, 1, 3, 2)) * (d ** -0.5), -1)
            out = (att @ vv).transpose(0, 2, 1, 3).reshape(b, hh * ww, c)
            vsp = vv.transpose(0, 2, 1, 3).reshape(b, hh, ww, c)
            local = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                            dtype=self.dtype, name="local_conv")(vsp)
            x = (out + local.reshape(b, hh * ww, c)).reshape(b, hh, ww, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(x)


class SMTBackbone(ConvBase):
    """Faithful SMT / scale-aware modulation transformer (reference SMT.py:300
    SMT; smt_l :SMT.py smt_l = dims (96,192,384,768), depths (4,6,28,4),
    ca_attentions (1,1,1,0), head_conv 7, qkv_bias True). Head stem =
    conv(head_conv,s2,BN,ReLU) + conv3(s2,BN,ReLU) + LN; stage embeds are
    overlap conv3-s2 + LN (eps 1e-5); pre-norm blocks (LN eps 1e-6) with
    SMTAttention mixer and an Mlp whose fc1 output is fused with a depthwise
    3x3 (act(x + dwconv(x))); per-stage output LN (eps 1e-6)."""

    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (4, 6, 28, 4)
    ca_heads: Sequence[int] = (4, 4, 4, -1)
    sa_heads: Sequence[int] = (-1, -1, 8, 16)
    mlp_ratios: Sequence[float] = (8, 6, 4, 2)
    ca_attentions: Sequence[int] = (1, 1, 1, 0)
    head_conv: int = 7
    expand_ratio: int = 2
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for si in range(4):
            c = self.dims[si]
            if si == 0:
                p = self.head_conv // 2
                x = nn.Conv(c, (self.head_conv, self.head_conv), strides=(2, 2),
                            padding=((p, p), (p, p)), use_bias=False,
                            dtype=self.dtype, name="stem_conv1")(x)
                x = jax.nn.relu(_bn(self, "stem_bn1", x, train))
                x = nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            use_bias=False, dtype=self.dtype, name="stem_conv2")(x)
                x = jax.nn.relu(_bn(self, "stem_bn2", x, train))
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="stem_norm")(x)
            else:
                x = nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"pe{si}")(x)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"pe{si}_norm")(x)
            for bi in range(self.depths[si]):
                pre = f"s{si}_b{bi}"
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_norm1")(x)
                x = x + SMTAttention(
                    ca_heads=self.ca_heads[si], sa_heads=self.sa_heads[si],
                    ca=bool(self.ca_attentions[si]),
                    expand_ratio=self.expand_ratio, qkv_bias=self.qkv_bias,
                    dtype=self.dtype, name=f"{pre}_attn")(y, train)
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_norm2")(x)
                y = nn.Dense(int(c * self.mlp_ratios[si]), dtype=self.dtype,
                             name=f"{pre}_fc1")(y)
                y = jax.nn.gelu(
                    y + nn.Conv(y.shape[-1], (3, 3), padding="SAME",
                                feature_group_count=y.shape[-1],
                                dtype=self.dtype, name=f"{pre}_dw")(y),
                    approximate=False)
                y = nn.Dense(c, dtype=self.dtype, name=f"{pre}_fc2")(y)
                x = x + y
            # the reference hands the NORMED stage output to the next stage's
            # patch embed (SMT.py forward_features: x = x_spatial)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"norm{si + 1}")(x)
            outs.append(x)
        return outs


class MCFS(ConvBase):
    """COSNet multi-scale contextual feature sharpening mixer (reference
    COSNet.py:57): 1x1 proj -> (a) dual grouped convs at dilation 1/2 summed,
    (b) depthwise-5 sharpening branch where the channel-softmax of the
    spatially-pooled response scales the deviation from the channel mean;
    concat + 1x1 out. All norms are channel LayerNorms (eps 1e-6)."""

    s_kernel: int = 3

    def _ln(self, x, name):
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name,
                            parent=self)(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        sk = self.s_kernel
        g = c // 4 if c >= 4 else 1
        gelu = lambda t: jax.nn.gelu(t, approximate=False)
        xp = self._ln(gelu(nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_1")(x)),
                      "norm_proj")
        p = sk // 2
        sx1 = gelu(nn.Conv(c, (sk, sk), padding=((p, p), (p, p)),
                           feature_group_count=g, dtype=self.dtype,
                           name="s_ctx_1")(xp))
        sx2 = gelu(nn.Conv(c, (sk, sk), kernel_dilation=(2, 2),
                           padding=((p * 2, p * 2), (p * 2, p * 2)),
                           feature_group_count=g, dtype=self.dtype,
                           name="s_ctx_2")(xp))
        sx = self._ln(sx1 + sx2, "norm_s")
        hx = gelu(nn.Conv(c, (5, 5), padding=((2, 2), (2, 2)), use_bias=False,
                          feature_group_count=c, dtype=self.dtype, name="h_ctx")(xp))
        hx_t = xp - hx.mean(axis=-1, keepdims=True)
        sharp = jax.nn.softmax(hx.mean(axis=(1, 2), keepdims=True), axis=-1)
        hx = self._ln(hx + sharp * hx_t, "norm_h")
        return gelu(nn.Conv(c, (1, 1), dtype=self.dtype,
                            name="proj_2")(jnp.concatenate([sx, hx], -1)))


class COSNetBackbone(ConvBase):
    """Faithful COSNet (reference COSNet.py:164; cosnet_tiny spec :9 = depths
    (2,2,6,2), base dim 64, expansion 4, MCFS kernels (5,5,3,3)). conv5-s4
    stem, conv3-s2 downsamples, FSB blocks (:121): dwconv3+LN residual, MCFS
    residual, MLP (1x1 -> gelu -> +gelu(dw3) -> 1x1) residual."""

    depths: Sequence[int] = (2, 2, 6, 2)
    base_dim: int = 64
    expan_ratio: int = 4
    s_kernels: Sequence[int] = (5, 5, 3, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        gelu = lambda t: jax.nn.gelu(t, approximate=False)
        outs = []
        for si in range(4):
            c = self.base_dim * (2 ** si)
            if si == 0:
                x = nn.Conv(c, (5, 5), strides=(4, 4), padding=((2, 2), (2, 2)),
                            dtype=self.dtype, name="stem")(x)
            else:
                x = nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"down{si}")(x)
            for bi in range(self.depths[si]):
                pre = f"s{si}_b{bi}"
                y = gelu(nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                                 feature_group_count=c, dtype=self.dtype,
                                 name=f"{pre}_conv_dw")(x))
                x = x + nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                     name=f"{pre}_norm_dw")(y)
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_ln1")(x)
                x = x + MCFS(s_kernel=self.s_kernels[si], dtype=self.dtype,
                             name=f"{pre}_attn")(y, train)
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_ln2")(x)
                y = gelu(nn.Conv(c * self.expan_ratio, (1, 1), dtype=self.dtype,
                                 name=f"{pre}_fc_1")(y))
                y = y + gelu(nn.Conv(y.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                                     feature_group_count=y.shape[-1],
                                     dtype=self.dtype, name=f"{pre}_pos")(y))
                x = x + nn.Conv(c, (1, 1), dtype=self.dtype,
                                name=f"{pre}_fc_2")(y)
            outs.append(x)
        return outs


def _blurpool2(x):
    """Anti-aliased BlurPool stride 2, filt_size 4 (Zhang 2019; the reference
    FID uses antialiased_cnns.BlurPool — DecoupleNet.py:60): reflect pad
    (1,2) then a fixed binomial [1,3,3,1] depthwise conv."""
    import numpy as np

    a = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
    f = np.outer(a, a)
    f /= f.sum()
    c = x.shape[-1]
    k = jnp.broadcast_to(jnp.asarray(f, x.dtype)[:, :, None, None], (4, 4, 1, c))
    x = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


class DecoupleMRLA(ConvBase):
    """DecoupleNet MRLA attention (reference DecoupleNet.py:119): ghost-style
    primary 1x1 + cheap dw3 halves, gated by a sigmoid of strip-conv (kx1 +
    1xk depthwise) responses on the 2x-downsampled map, nearest-upsampled."""

    att_kernel: int = 9

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        c2 = c // 2
        k = self.att_kernel
        p = k // 2
        t = nn.avg_pool(x, (2, 2), strides=(2, 2))
        t = _bn(self, "init_bn", nn.Conv(c, (1, 1), use_bias=False,
                                         dtype=self.dtype, name="init")(t), train)
        xh = nn.Conv(c, (k, 1), padding=((p, p), (0, 0)), use_bias=False,
                     feature_group_count=c, dtype=self.dtype, name="h_att")(t)
        xw = nn.Conv(c, (1, k), padding=((0, 0), (p, p)), use_bias=False,
                     feature_group_count=c, dtype=self.dtype, name="v_att")(t)
        gate = jax.nn.sigmoid(_bn(self, "bn", xh + xw, train))
        x1 = jax.nn.gelu(_bn(self, "primary_bn", nn.Conv(
            c2, (1, 1), use_bias=False, dtype=self.dtype, name="primary")(x),
            train), approximate=False)
        x2 = jax.nn.gelu(_bn(self, "cheap_bn", nn.Conv(
            c2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            feature_group_count=c2, dtype=self.dtype, name="cheap")(x1),
            train), approximate=False)
        out = jnp.concatenate([x1, x2], -1)
        g = jnp.repeat(jnp.repeat(gate, 2, 1), 2, 2)[:, :out.shape[1], :out.shape[2]]
        return out * g


class DecoupleGA(ConvBase):
    """DecoupleNet global attention (reference DecoupleNet.py:151): MHSA with
    head_dim 4, bias-free qkv/proj."""

    head_dim: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = max(c // self.head_dim, 1)
        ad = nh * self.head_dim
        t = x.reshape(b, h * w, c)
        qkv = nn.Dense(ad * 3, use_bias=False, dtype=self.dtype, name="qkv")(t)
        q, kk, v = jnp.split(qkv.reshape(b, -1, 3, nh, self.head_dim)
                             .transpose(2, 0, 3, 1, 4), 3, 0)
        q, kk, v = q[0], kk[0], v[0]
        att = jax.nn.softmax((q @ kk.transpose(0, 1, 3, 2)) *
                             (self.head_dim ** -0.5), -1)
        out = (att @ v).transpose(0, 2, 1, 3).reshape(b, h * w, ad)
        out = nn.Dense(c, use_bias=False, dtype=self.dtype, name="proj")(out)
        return out.reshape(b, h, w, c)


class DecoupleBlock(ConvBase):
    """DecoupleNet MLPBlock (reference DecoupleNet.py:197): MBFD channel
    decoupling (conv3 quarter / MRLA quarter / GA-or-identity half) followed
    by a BN-GELU 1x1 MLP, residual."""

    stage: int = 0
    att_kernel: int = 9
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        cl = c // 4
        cu = c - 2 * cl
        x1, x2, x3 = x[..., :cl], x[..., cl:2 * cl], x[..., 2 * cl:]
        x1 = nn.Conv(cl, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     dtype=self.dtype, name="mbfd_conv")(x1)
        x2 = DecoupleMRLA(att_kernel=self.att_kernel, dtype=self.dtype,
                          name="mrla")(x2, train)
        if self.stage > 2:
            x3 = _bn(self, "ga_norm",
                     x3 + DecoupleGA(dtype=self.dtype, name="ga")(x3, train),
                     train)
        y = jnp.concatenate([x1, x2, x3], -1)
        y = nn.Conv(int(c * self.mlp_ratio), (1, 1), use_bias=False,
                    dtype=self.dtype, name="mlp0")(y)
        y = jax.nn.gelu(_bn(self, "mlp_bn", y, train), approximate=False)
        y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="mlp3")(y)
        return x + y


class DecoupleFID(ConvBase):
    """DecoupleNet FID downsampler (reference DecoupleNet.py:49): grouped
    conv3 doubling channels, PII partial-interaction conv (with its channel
    reordering), then a dw-conv-s2 branch and a maxpool+BlurPool branch,
    concatenated and fused 1x1."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        c2 = c * 2
        y = nn.Conv(c2, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=c, dtype=self.dtype, name="gconv")(x)
        # PII(dim=2c, n_div=8): split [dc, du, dc, du], conv the two dc parts
        dc = c2 // 8
        du = c - dc
        x1c, x1u = y[..., :dc], y[..., dc:dc + du]
        x2c, x2u = y[..., dc + du:2 * dc + du], y[..., 2 * dc + du:]
        conv = nn.Conv(2 * dc, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                       dtype=self.dtype, name="pii_conv")(
            jnp.concatenate([x1c, x2c], -1))
        y = jnp.concatenate([conv, x1u, x2u], -1)
        mx = nn.max_pool(y, (2, 2), strides=(1, 1))
        mx = _bn(self, "bn_m", _blurpool2(mx), train)
        cv = jax.nn.gelu(nn.Conv(c2, (3, 3), strides=(2, 2),
                                 padding=((1, 1), (1, 1)),
                                 feature_group_count=c2, dtype=self.dtype,
                                 name="conv_d")(y), approximate=False)
        cv = _bn(self, "bn_c", cv, train)
        return nn.Conv(c2, (1, 1), dtype=self.dtype,
                       name="fusion")(jnp.concatenate([cv, mx], -1))


class DecoupleNetBackbone(ConvBase):
    """Faithful DecoupleNet (reference DecoupleNet.py:234; decouplenet_d2
    spec :26 = embed 64, depths (1,6,6,2), att_kernel 9). conv4-s4+BN stem,
    DecoupleBlock stages with FID downsamplers, per-stage output BN."""

    embed_dim: int = 64
    depths: Sequence[int] = (1, 6, 6, 2)
    att_kernel: int = 9
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = _bn(self, "stem_bn", x, train)
        outs = []
        for si in range(4):
            for bi in range(self.depths[si]):
                x = DecoupleBlock(stage=si, att_kernel=self.att_kernel,
                                  mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                                  name=f"s{si}_b{bi}")(x, train)
            outs.append(_bn(self, f"norm_feat{si}", x, train))
            if si < 3:
                x = DecoupleFID(dtype=self.dtype, name=f"fid{si}")(x, train)
        return outs


class UniNeXtBlock(ConvBase):
    """UniNeXt DilatedBlock (reference UniNeXt.py:197): pre-norm windowed
    MHSA (ws x ws zero-padded windows, no pad masking — faithful to the
    reference) with split q/v biases and a depthwise-3x3 LEPE on the full-res
    v, then an Mlp whose hidden adds a LN+GELU'd depthwise branch."""

    num_heads: int = 2
    ws: int = 7
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh, ws = self.num_heads, self.ws
        d = c // nh
        t = x.reshape(b, h * w, c)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(t)
        qb = self.param("q_bias", nn.initializers.zeros, (c,))
        vb = self.param("v_bias", nn.initializers.zeros, (c,))
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype, name="qkv")(y)
        qkv = qkv + jnp.concatenate([qb, jnp.zeros_like(qb), vb]).astype(qkv.dtype)
        q, k, v = jnp.split(qkv, 3, -1)
        lepe = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                       dtype=self.dtype, name="lepe")(v.reshape(b, h, w, c))
        lepe = lepe.reshape(b, h * w, c)

        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        hh, www = h + ph, w + pw
        gh, gw = hh // ws, www // ws

        def win(z):  # (B, N, C) -> (B*G, nh, ws*ws, d)
            z = z.reshape(b, h, w, c)
            z = jnp.pad(z, ((0, 0), (0, ph), (0, pw), (0, 0)))
            z = z.reshape(b, gh, ws, gw, ws, c).transpose(0, 1, 3, 2, 4, 5)
            z = z.reshape(b * gh * gw, ws * ws, nh, d).transpose(0, 2, 1, 3)
            return z

        qw, kw, vw = win(q), win(k), win(v)
        att = jax.nn.softmax((qw * (d ** -0.5)) @ kw.transpose(0, 1, 3, 2), -1)
        o = att @ vw  # (B*G, nh, ws*ws, d)
        o = o.reshape(b, gh, gw, nh, ws, ws, d).transpose(0, 1, 4, 2, 5, 3, 6)
        o = o.reshape(b, hh, www, c)[:, :h, :w, :].reshape(b, h * w, c)
        o = nn.Dense(c, dtype=self.dtype, name="proj")(o + lepe)
        t = t + o

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(t)
        y = jax.nn.gelu(nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                                 name="fc1")(y), approximate=False)
        hid = y.shape[-1]
        y1 = nn.Conv(hid, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=hid,
                     dtype=self.dtype, name="mlp_dw")(y.reshape(b, h, w, hid))
        y1 = jax.nn.gelu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                      name="mlp_norm")(y1.reshape(b, h * w, hid)),
                         approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y + y1)
        return (t + y).reshape(b, h, w, c)


class UniNeXtBackbone(ConvBase):
    """Faithful UniNeXt / DilatedFormer_Windows (reference UniNeXt.py:279;
    uninext_t :476 = embed 64, depths (2,2,18,2), heads (2,4,8,16),
    ws 7). Three-conv stem with token LN+GELU after each, Merge_Block
    (conv3-s2 + LN) downsamples, DilatedBlocks each followed by a depthwise
    CPE residual."""

    embed_dim: int = 64
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    ws: int = 7
    mlp_ratio: float = 4.0

    def _ln_gelu(self, x, name):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name, parent=self)(x)
        return jax.nn.gelu(y, approximate=False)

    @nn.compact
    def __call__(self, x, train: bool = False):
        so = self.embed_dim // 2
        x = nn.Conv(so, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem1")(x)
        x = self._ln_gelu(x, "norm_act1")
        x = nn.Conv(so, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="stem2")(x)
        x = self._ln_gelu(x, "norm_act2")
        x = nn.Conv(so, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="stem3")(x)
        x = self._ln_gelu(x, "norm_act3")
        c = self.embed_dim
        x = nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="merge0")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="merge0_norm")(x)
        outs = []
        for si in range(4):
            c = x.shape[-1]
            for bi in range(self.depths[si]):
                x = UniNeXtBlock(num_heads=self.num_heads[si], ws=self.ws,
                                 mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                                 name=f"s{si}_b{bi}")(x, train)
                x = x + nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                                feature_group_count=c, dtype=self.dtype,
                                name=f"s{si}_cpe{bi}")(x)
            outs.append(x)
            if si < 3:
                x = nn.Conv(c * 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"merge{si + 1}")(x)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"merge{si + 1}_norm")(x)
        return outs


class IFormerMixer(ConvBase):
    """iFormer inception mixer (reference iFormer.py:268): high-frequency
    half = [1x1-expand + dw3] conv path and [maxpool3 + 1x1-expand] pool path
    (each doubling its channels); low-frequency part = MHSA over a 2x
    avg-pooled grid, nearest-upsampled back; concat + residual depthwise fuse
    + 1x1 proj."""

    num_heads: int = 3
    attention_head: int = 1
    pool_size: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        gelu = lambda t: jax.nn.gelu(t, approximate=False)
        b, h, w, dim = x.shape
        head_dim = dim // self.num_heads
        low = self.attention_head * head_dim
        high = dim - low
        cnn_in = high // 2
        cx = nn.Conv(cnn_in * 2, (1, 1), use_bias=False, dtype=self.dtype,
                     name="conv1")(x[..., :cnn_in])
        cx = gelu(nn.Conv(cnn_in * 2, (3, 3), padding=((1, 1), (1, 1)),
                          use_bias=False, feature_group_count=cnn_in * 2,
                          dtype=self.dtype, name="proj1")(cx))
        px = nn.max_pool(jnp.pad(x[..., cnn_in:high],
                                 ((0, 0), (1, 1), (1, 1), (0, 0)),
                                 constant_values=-jnp.inf), (3, 3), strides=(1, 1))
        px = gelu(nn.Conv((high - cnn_in) * 2, (1, 1), dtype=self.dtype,
                          name="proj2")(px))
        hx = jnp.concatenate([cx, px], -1)

        lx = x[..., high:]
        if self.pool_size > 1:
            lx = nn.avg_pool(lx, (self.pool_size,) * 2, strides=(self.pool_size,) * 2)
        hh, ww = lx.shape[1], lx.shape[2]
        t = lx.reshape(b, hh * ww, low)
        qkv = nn.Dense(low * 3, dtype=self.dtype, name="qkv")(t)
        nh = self.attention_head
        d = low // nh
        q, k, v = jnp.split(qkv.reshape(b, -1, 3, nh, d).transpose(2, 0, 3, 1, 4), 3, 0)
        att = jax.nn.softmax((q[0] @ k[0].transpose(0, 1, 3, 2)) * (d ** -0.5), -1)
        o = (att @ v[0]).transpose(0, 2, 1, 3).reshape(b, hh, ww, low)
        if self.pool_size > 1:
            o = jnp.repeat(jnp.repeat(o, self.pool_size, 1), self.pool_size, 2)
        y = jnp.concatenate([hx, o], -1)
        y = y + nn.Conv(y.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, feature_group_count=y.shape[-1],
                        dtype=self.dtype, name="conv_fuse")(y)
        return nn.Conv(dim, (1, 1), dtype=self.dtype, name="proj")(y)


class IFormerBackbone(ConvBase):
    """Faithful iFormer / InceptionTransformer (reference iFormer.py:336;
    iformer_small :530 = dims (96,192,320,384), depths (3,3,9,3), heads
    (3,6,10,12), per-block attention heads, layer-scale 1e-6). Two-conv BN
    stem, conv3-s2+BN stage embeds, learnable per-stage 2-D pos-embeds
    (bilinear-resized off-resolution), pre-norm blocks (LN eps 1e-6)."""

    dims: Sequence[int] = (96, 192, 320, 384)
    depths: Sequence[int] = (3, 3, 9, 3)
    num_heads: Sequence[int] = (3, 6, 10, 12)
    attention_heads: Any = None  # per-block list; default = iformer_small's
    mlp_ratio: float = 4.0
    ls_init: float = 1e-6
    img_size: int = 224

    @nn.compact
    def __call__(self, x, train: bool = False):
        ah = (self.attention_heads if self.attention_heads is not None
              else [1] * 3 + [3] * 3 + [7] * 4 + [9] * 5 + [11] * 3)
        gelu = lambda t: jax.nn.gelu(t, approximate=False)
        c0 = self.dims[0]
        x = nn.Conv(c0 // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem_conv1")(x)
        x = gelu(_bn(self, "stem_bn1", x, train))
        x = nn.Conv(c0, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem_conv2")(x)
        x = _bn(self, "stem_bn2", x, train)
        outs = []
        gi = 0
        for si in range(4):
            c = self.dims[si]
            if si > 0:
                x = nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"pe{si + 1}")(x)
                x = _bn(self, f"pe{si + 1}_bn", x, train)
            np_ = self.img_size // 4 // (2 ** si)
            pos = self.param(f"pos_embed{si + 1}",
                             nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
                             (np_, np_, c))
            h, w = x.shape[1], x.shape[2]
            if (h, w) != (np_, np_):
                pos = jax.image.resize(pos, (h, w, c), method="linear")
            x = x + pos.astype(x.dtype)
            for bi in range(self.depths[si]):
                pre = f"s{si}_b{bi}"
                g1 = self.param(f"{pre}_ls1", nn.initializers.constant(self.ls_init), (c,))
                g2 = self.param(f"{pre}_ls2", nn.initializers.constant(self.ls_init), (c,))
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_norm1")(x)
                x = x + g1 * IFormerMixer(
                    num_heads=self.num_heads[si], attention_head=ah[gi],
                    pool_size=2 if si < 2 else 1, dtype=self.dtype,
                    name=f"{pre}_attn")(y, train)
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_norm2")(x)
                y = gelu(nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                                  name=f"{pre}_fc1")(y))
                x = x + g2 * nn.Dense(c, dtype=self.dtype, name=f"{pre}_fc2")(y)
                gi += 1
            outs.append(x)
        return outs


class EViTAttention(ConvBase):
    """EViT attention (reference EViT.py:66). sr_ratio>1: two cascaded
    rounds — each reduces k/v tokens with a depthwise strided conv +
    LN + GELU, the second round re-queries from the first's output and adds
    it residually. sr_ratio==1: plain MHSA with separate q/k/v projections."""

    num_heads: int = 1
    sr_ratio: int = 1

    def _mhsa(self, q, k, v, b, n, c):
        nh = self.num_heads
        d = c // nh
        q = q.reshape(b, -1, nh, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, nh, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, nh, d).transpose(0, 2, 1, 3)
        att = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) * (d ** -0.5), -1)
        return (att @ v).transpose(0, 2, 1, 3).reshape(b, n, c)

    @nn.compact
    def __call__(self, t, h, w, train: bool = False):
        b, n, c = t.shape
        sr = self.sr_ratio
        gelu = lambda z: jax.nn.gelu(z, approximate=False)
        if sr > 1:
            def reduced(z, idx):
                zs = z.reshape(b, h, w, c)
                zs = nn.Conv(c, (sr, sr), strides=(sr, sr), feature_group_count=c,
                             dtype=self.dtype, name=f"sr_{idx}", parent=self)(zs)
                zs = zs.reshape(b, -1, c)
                return gelu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                         name=f"norm_{idx}", parent=self)(zs))

            x1r = reduced(t, 1)
            q1 = nn.Dense(c, dtype=self.dtype, name="q_1")(t)
            k1 = nn.Dense(c, dtype=self.dtype, name="k_1")(x1r)
            v1 = nn.Dense(c, dtype=self.dtype, name="v_1")(x1r)
            x1 = nn.Dense(c, dtype=self.dtype,
                          name="proj_1")(self._mhsa(q1, k1, v1, b, n, c))
            x2r = reduced(x1, 2)
            q2 = nn.Dense(c, dtype=self.dtype, name="q_2")(x1)
            k2 = nn.Dense(c, dtype=self.dtype, name="k_2")(x2r)
            v2 = nn.Dense(c, dtype=self.dtype, name="v_2")(x2r)
            x2 = x1 + self._mhsa(q2, k2, v2, b, n, c)
            return nn.Dense(c, dtype=self.dtype, name="proj_2")(x2)
        q = nn.Dense(c, dtype=self.dtype, name="q")(t)
        k = nn.Dense(c, dtype=self.dtype, name="k")(t)
        v = nn.Dense(c, dtype=self.dtype, name="v")(t)
        return nn.Dense(c, dtype=self.dtype,
                        name="proj")(self._mhsa(q, k, v, b, n, c))


class EViTBackbone(ConvBase):
    """Faithful EViT (reference EViT.py:196; EViT_Tiny :330 = dims
    (56,112,224,448), stem 28, heads (1,2,4,8), mlp 3, depths (2,4,8,2),
    sr (8,4,2,1)). Three-conv GELU+BN stem; conv2-s2+LN patch embeds; blocks
    apply a depthwise positional residual, cascaded-SR attention on the
    pre-proj tokens (faithful to the reference's x_proj + attn(norm1(x))
    quirk), and the BFFN dual-dwconv MLP; per-stage LN outputs feed forward."""

    dims: Sequence[int] = (56, 112, 224, 448)
    stem_channel: int = 28
    depths: Sequence[int] = (2, 4, 8, 2)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    mlp_ratios: Sequence[float] = (3, 3, 3, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        gelu = lambda z: jax.nn.gelu(z, approximate=False)
        sc = self.stem_channel
        for i, s in enumerate((2, 1, 1), 1):
            x = nn.Conv(sc, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"stem_conv{i}")(x)
            x = _bn(self, f"stem_bn{i}", gelu(x), train)
        outs = []
        for si in range(4):
            c = self.dims[si]
            x = nn.Conv(c, (2, 2), strides=(2, 2), dtype=self.dtype,
                        name=f"pe{si}")(x)
            b, h, w, _ = x.shape
            t = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"pe{si}_norm")(x.reshape(b, h * w, c))
            for bi in range(self.depths[si]):
                pre = f"s{si}_b{bi}"
                cnn = t.reshape(b, h, w, c)
                xp = cnn + nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                                   feature_group_count=c, dtype=self.dtype,
                                   name=f"{pre}_proj")(cnn)
                xp = xp.reshape(b, h * w, c)
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_norm1")(t)
                t = xp + EViTAttention(num_heads=self.num_heads[si],
                                       sr_ratio=self.sr_ratios[si],
                                       dtype=self.dtype,
                                       name=f"{pre}_attn")(y, h, w, train)
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_norm2")(t)
                # BFFN (reference EViT.py:27)
                y = nn.Dense(int(c * self.mlp_ratios[si]), dtype=self.dtype,
                             name=f"{pre}_fc1")(y)
                hid = y.shape[-1]
                ys = y.reshape(b, h, w, hid)
                y1 = _bn(self, f"{pre}_bn1", gelu(nn.Conv(
                    hid, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=hid,
                    dtype=self.dtype, name=f"{pre}_dw1")(ys)), train)
                y2 = _bn(self, f"{pre}_bn2", gelu(nn.Conv(
                    hid, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=hid,
                    dtype=self.dtype, name=f"{pre}_dw2")(y1)), train)
                y = (y1 + y2).reshape(b, h * w, hid)
                t = t + nn.Dense(c, dtype=self.dtype, name=f"{pre}_fc2")(y)
            t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"norm_out{si}")(t)
            x = t.reshape(b, h, w, c)
            outs.append(x)
        return outs


def _unfold3(x):
    """3x3 neighborhood extraction with zero pad (reference STViT.py:98
    Unfold): (B, hh, ww, C) -> (B, hh, ww, 9, C), k = i*3+j."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.stack([xp[:, i:i + h, j:j + w] for i in range(3)
                      for j in range(3)], axis=3)


def _fold3(x):
    """Transpose of _unfold3 (reference STViT.py:111 Fold): scatter-add each
    of the 9 shifted planes back; (B, hh, ww, 9, C) -> (B, hh, ww, C)."""
    b, h, w, _, c = x.shape
    out = jnp.zeros((b, h + 2, w + 2, c), x.dtype)
    for k in range(9):
        i, j = k // 3, k % 3
        out = out.at[:, i:i + h, j:j + w].add(x[:, :, :, k])
    return out[:, 1:1 + h, 1:1 + w]


class STViTRefine(ConvBase):
    """STViT refine attention (reference STViT.py:72): 1x1-conv qkv with the
    (head, 3d) interleaved split, MHSA over all super-tokens, 1x1 proj."""

    num_heads: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = self.num_heads
        d = c // nh
        qkv = nn.Conv(3 * c, (1, 1), dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, nh, 3 * d)
        q, k, v = jnp.split(qkv, 3, -1)  # (B, N, nh, d) each
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        att = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) * (d ** -0.5), -1)
        o = (att @ v).transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="proj")(o)


class StokenAttention(ConvBase):
    """STViT super-token attention (reference STViT.py:124): pad to the
    super-token grid, average-pool initial super tokens, one (stop-gradient)
    soft-association iteration against the 3x3 super-token neighborhood,
    aggregate pixels into super tokens, refine with MHSA, and scatter back
    through the affinity."""

    stoken: int = 8
    n_iter: int = 1
    num_heads: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        st = self.stoken
        if st <= 1:
            return STViTRefine(num_heads=self.num_heads, dtype=self.dtype,
                               name="stoken_refine")(x, train)
        b, h0, w0, c = x.shape
        pb = (st - h0 % st) % st
        pr = (st - w0 % st) % st
        x = jnp.pad(x, ((0, 0), (0, pb), (0, pr), (0, 0)))
        h, w = x.shape[1], x.shape[2]
        hh, ww = h // st, w // st
        scale = c ** -0.5

        pix = x.reshape(b, hh, st, ww, st, c).transpose(0, 1, 3, 2, 4, 5)
        pix = pix.reshape(b, hh * ww, st * st, c)
        stok = x.reshape(b, hh, st, ww, st, c).mean(axis=(2, 4))  # (B, hh, ww, C)

        aff = aff_sum = None
        for it in range(self.n_iter):
            nb = _unfold3(stok).reshape(b, hh * ww, 9, c)  # (B, G, 9, C)
            aff = jax.nn.softmax(
                jnp.einsum("bgpc,bgkc->bgpk", pix, nb) * scale, -1)
            aff = jax.lax.stop_gradient(aff)
            asum = aff.sum(2).reshape(b, hh, ww, 9)[..., None]  # (B,hh,ww,9,1)
            aff_sum = _fold3(asum)[..., 0]  # (B, hh, ww)
            if it < self.n_iter - 1:
                sf = jnp.einsum("bgpc,bgpk->bgkc", pix, aff)
                sf = _fold3(sf.reshape(b, hh, ww, 9, c))
                stok = sf / (aff_sum[..., None] + 1e-12)

        sf = jnp.einsum("bgpc,bgpk->bgkc", pix, aff)
        stok = _fold3(sf.reshape(b, hh, ww, 9, c)) / \
            (jax.lax.stop_gradient(aff_sum)[..., None] + 1e-12)
        stok = STViTRefine(num_heads=self.num_heads, dtype=self.dtype,
                           name="stoken_refine")(stok, train)
        nb = _unfold3(stok).reshape(b, hh * ww, 9, c)
        pix = jnp.einsum("bgkc,bgpk->bgpc", nb, aff)
        pix = pix.reshape(b, hh, ww, st, st, c).transpose(0, 1, 3, 2, 4, 5)
        pix = pix.reshape(b, h, w, c)
        return pix[:, :h0, :w0]


class STViTBackbone(ConvBase):
    """Faithful STViT / super-token vision transformer (reference STViT.py:307;
    stvit_small :413 = dims (64,128,320,512), depths (3,5,9,3), heads
    (1,2,5,8), stoken (8,4,1,1)). Four-conv GELU+BN patch embed, blocks =
    ResDWC pos-embed + LN2d -> StokenAttention residual + BN2d -> conv MLP
    with ResDWC; conv3-s2+BN PatchMerging between stages."""

    dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 5, 9, 3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    stoken: Sequence[int] = (8, 4, 1, 1)
    n_iter: int = 1
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        gelu = lambda z: jax.nn.gelu(z, approximate=False)
        c0 = self.dims[0]
        specs = [(c0 // 2, 2, "pe0"), (c0 // 2, 1, "pe1"),
                 (c0, 2, "pe2"), (c0, 1, "pe3")]
        for cc, s, nm in specs:
            x = nn.Conv(cc, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=nm)(x)
            x = _bn(self, f"{nm}_bn", gelu(x), train)
        outs = []
        for si in range(4):
            c = self.dims[si]
            for bi in range(self.depths[si]):
                pre = f"s{si}_b{bi}"
                x = x + nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                                feature_group_count=c, dtype=self.dtype,
                                name=f"{pre}_pos")(x)
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_norm1")(x)
                x = x + StokenAttention(
                    stoken=self.stoken[si], n_iter=self.n_iter,
                    num_heads=self.num_heads[si], dtype=self.dtype,
                    name=f"{pre}_attn")(y, train)
                y = _bn(self, f"{pre}_norm2", x, train)
                y = gelu(nn.Conv(int(c * self.mlp_ratio), (1, 1),
                                 dtype=self.dtype, name=f"{pre}_fc1")(y))
                y = y + nn.Conv(y.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                                feature_group_count=y.shape[-1],
                                dtype=self.dtype, name=f"{pre}_mlp_dw")(y)
                x = x + nn.Conv(c, (1, 1), dtype=self.dtype,
                                name=f"{pre}_fc2")(y)
            outs.append(x)
            if si < 3:
                x = nn.Conv(self.dims[si + 1], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"down{si + 1}")(x)
                x = _bn(self, f"down{si + 1}_bn", x, train)
        return outs


def _adaptive_avg_pool(x, k: int):
    """torch F.adaptive_avg_pool2d semantics ((B,H,W,C) -> (B,k,k,C)):
    bin i spans [floor(i*H/k), ceil((i+1)*H/k)) — bins may overlap."""
    import math as _m

    b, h, w, c = x.shape
    rows = []
    for i in range(k):
        h0, h1 = (i * h) // k, _m.ceil((i + 1) * h / k)
        cols = []
        for j in range(k):
            w0, w1 = (j * w) // k, _m.ceil((j + 1) * w / k)
            cols.append(x[:, h0:h1, w0:w1].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, 1))
    return jnp.stack(rows, 1)  # (B, k, k, C)


def _gn1(mod, x, name):
    """build_group_norm(num_groups=1, eps=1e-6) — reference TransXNet.py:11."""
    return nn.GroupNorm(num_groups=1, epsilon=1e-6, dtype=mod.dtype,
                        name=name, parent=mod)(x)


class IDConv(ConvBase):
    """TransXNet input-dependent dynamic conv (reference TransXNet.py:80
    DynamicConv2d): a bank of `num_groups` depthwise KxK kernels mixed
    per-sample (and per kernel tap) by a softmax over groups of a projected
    adaptive-KxK pooled descriptor; bias mixed from the GAP descriptor."""

    kernel_size: int = 3
    num_groups: int = 2
    reduction_ratio: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        kk, g = self.kernel_size, self.num_groups
        wbank = self.param("weight",
                           nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
                           (g, c, kk, kk))
        bbank = self.param("bias",
                           nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
                           (g, c))

        proj0 = nn.Conv(c // self.reduction_ratio, (1, 1), dtype=self.dtype,
                        name="proj0")
        proj_gn = nn.GroupNorm(num_groups=1, epsilon=1e-6, dtype=self.dtype,
                               name="proj_gn")
        proj3 = nn.Conv(c * g, (1, 1), dtype=self.dtype, name="proj3")

        def proj(z):  # the reference shares one proj for scale AND bias
            return proj3(jax.nn.gelu(proj_gn(proj0(z)), approximate=False))

        pooled = _adaptive_avg_pool(x, kk)
        scale = proj(pooled).reshape(b, kk, kk, g, c)
        scale = jax.nn.softmax(scale, axis=3)
        # per-sample depthwise kernel (B, K, K, C)
        wk = jnp.einsum("bijgc,gcij->bijc", scale.astype(jnp.float32),
                        wbank.astype(jnp.float32))
        sb = proj(x.mean(axis=(1, 2), keepdims=True)).reshape(b, g, c)
        sb = jax.nn.softmax(sb, axis=1)
        bias = jnp.einsum("bgc,gc->bc", sb.astype(jnp.float32),
                          bbank.astype(jnp.float32))

        def one(xi, wi, bi):
            y = jax.lax.conv_general_dilated(
                xi[None].astype(jnp.float32), wi[:, :, None, :],
                (1, 1), [(kk // 2, kk // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)
            return (y[0] + bi).astype(x.dtype)

        return jax.vmap(one)(x, wk, bias)


class OSRAttention(ConvBase):
    """TransXNet overlapping spatial-reduction attention (reference
    TransXNet.py:33): strided overlapping dw conv + GN/GELU + per-channel 1x1
    reduce the k/v grid; a dw3 local residual refines it; learnable relative
    position bias added to the logits (bicubic-resized off-resolution)."""

    num_heads: int = 1
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x, rpe, train: bool = False):
        b, h, w, c = x.shape
        nh = self.num_heads
        d = c // nh
        sr = self.sr_ratio

        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(x)
        if sr > 1:
            k_ = sr + 3
            kv = nn.Conv(c, (k_, k_), strides=(sr, sr),
                         padding=((k_ // 2, k_ // 2), (k_ // 2, k_ // 2)),
                         use_bias=False, feature_group_count=c,
                         dtype=self.dtype, name="sr0")(x)
            kv = jax.nn.gelu(_gn1(self, kv, "sr_gn1"), approximate=False)
            kv = nn.Conv(c, (1, 1), use_bias=False, feature_group_count=c,
                         dtype=self.dtype, name="sr3")(kv)
            kv = _gn1(self, kv, "sr_gn2")
        else:
            kv = x
        kv = kv + nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                          feature_group_count=c, dtype=self.dtype,
                          name="local_conv")(kv)
        kv = nn.Conv(2 * c, (1, 1), dtype=self.dtype, name="kv")(kv)
        kk, v = jnp.split(kv, 2, -1)
        hs, ws = kk.shape[1], kk.shape[2]
        qh = q.reshape(b, h * w, nh, d).transpose(0, 2, 1, 3)
        kh = kk.reshape(b, hs * ws, nh, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, hs * ws, nh, d).transpose(0, 2, 1, 3)
        att = (qh @ kh.transpose(0, 1, 3, 2)) * (d ** -0.5)
        if att.shape[2:] != rpe.shape[1:]:
            rpe = jax.image.resize(rpe, (nh, att.shape[2], att.shape[3]),
                                   method="cubic")
        att = jax.nn.softmax(att + rpe[None].astype(att.dtype), -1)
        o = (att @ vh).transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return o


class TransXBlock(ConvBase):
    """TransXNet block (reference TransXNet.py:248): dw7 pos-embed residual;
    D-Mixer (IDConv half + OSRA half, STE 1x1 proj residual) with layer
    scale; MS-FFN (multi-scale depthwise 1/3/5/7) with layer scale. All norms
    GroupNorm(1, eps 1e-6)."""

    kernel_size: int = 3
    num_groups: int = 2
    num_heads: int = 1
    sr_ratio: int = 1
    mlp_ratio: float = 4.0
    ls_init: float = 1e-5

    @nn.compact
    def __call__(self, x, rpe, train: bool = False):
        gelu = lambda z: jax.nn.gelu(z, approximate=False)
        c = x.shape[-1]
        x = x + nn.Conv(c, (7, 7), padding=((3, 3), (3, 3)),
                        feature_group_count=c, dtype=self.dtype,
                        name="pos_embed")(x)
        # --- D-Mixer
        y = _gn1(self, x, "norm1")
        c2 = c // 2
        y1 = IDConv(kernel_size=self.kernel_size, num_groups=self.num_groups,
                    dtype=self.dtype, name="local_unit")(y[..., :c2], train)
        y2 = OSRAttention(num_heads=self.num_heads, sr_ratio=self.sr_ratio,
                          dtype=self.dtype,
                          name="global_unit")(y[..., c2:], rpe, train)
        y = jnp.concatenate([y1, y2], -1)
        inner = max(16, c // 8)
        p = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                    dtype=self.dtype, name="mix_proj0")(y)
        p = _gn1(self, gelu(p), "mix_gn1")
        p = _gn1(self, gelu(nn.Conv(inner, (1, 1), dtype=self.dtype,
                                    name="mix_proj3")(p)), "mix_gn2")
        p = _gn1(self, nn.Conv(c, (1, 1), dtype=self.dtype,
                               name="mix_proj6")(p), "mix_gn3")
        y = p + y
        g1 = self.param("ls1_w", nn.initializers.constant(self.ls_init), (c,))
        b1 = self.param("ls1_b", nn.initializers.zeros, (c,))
        x = x + y * g1 + b1
        # --- MS-FFN
        y = _gn1(self, x, "norm2")
        hid = int(c * self.mlp_ratio)
        y = nn.Conv(hid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fc1")(y)
        y = _gn1(self, gelu(y), "fc1_gn")
        chans = [hid - (hid // 4) * 3, hid // 4, hid // 4, hid // 4]
        parts, off = [], 0
        for i, (cc, kk) in enumerate(zip(chans, (1, 3, 5, 7))):
            parts.append(nn.Conv(cc, (kk, kk),
                                 padding=((kk // 2, kk // 2), (kk // 2, kk // 2)),
                                 feature_group_count=cc, dtype=self.dtype,
                                 name=f"msdw{i}")(y[..., off:off + cc]))
            off += cc
        y = jnp.concatenate(parts, -1) + y
        y = _gn1(self, gelu(y), "mid_gn")
        y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = _gn1(self, y, "fc2_gn")
        g2 = self.param("ls2_w", nn.initializers.constant(self.ls_init), (c,))
        b2 = self.param("ls2_b", nn.initializers.zeros, (c,))
        return x + y * g2 + b2


class TransXNetBackbone(ConvBase):
    """Faithful TransXNet (reference TransXNet.py:333; transxnet_tiny 't' =
    layers (3,3,9,3), dims (48,96,224,448), IDConv kernel 7,
    kernel_size config (7,7,7,7) feeds the IDConv; heads (1,2,4,8), sr
    (8,4,2,1), groups 2, layer scale 1e-5). conv7-s4-p3 + GN patch embed,
    conv3-s2 + GN downsamples, GroupNorm'd stage outputs."""

    dims: Sequence[int] = (48, 96, 224, 448)
    depths: Sequence[int] = (3, 3, 9, 3)
    kernel_sizes: Sequence[int] = (7, 7, 7, 7)
    num_groups: Sequence[int] = (2, 2, 2, 2)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    img_size: int = 224

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.dims[0], (7, 7), strides=(4, 4),
                    padding=((3, 3), (3, 3)), dtype=self.dtype, name="stem")(x)
        x = _gn1(self, x, "stem_gn")
        import math as _m
        outs = []
        n = _m.ceil(self.img_size / 4)
        for si in range(4):
            c = self.dims[si]
            if si > 0:
                x = nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"down{si}")(x)
                x = _gn1(self, x, f"down{si}_gn")
            nsr = _m.ceil(n / self.sr_ratios[si])
            rpe = self.param(f"rel_pos{si}", nn.initializers.zeros,
                             (self.num_heads[si], n * n, nsr * nsr))
            for bi in range(self.depths[si]):
                x = TransXBlock(kernel_size=self.kernel_sizes[si],
                                num_groups=self.num_groups[si],
                                num_heads=self.num_heads[si],
                                sr_ratio=self.sr_ratios[si],
                                mlp_ratio=self.mlp_ratios[si],
                                dtype=self.dtype,
                                name=f"s{si}_b{bi}")(x, rpe, train)
            outs.append(_gn1(self, x, f"norm_out{si}"))
            n = _m.ceil(n / 2)
        return outs


def _l2norm(x, axis=-1, eps=1e-12):
    n = jnp.sqrt((x.astype(jnp.float32) ** 2).sum(axis, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


class TorchMHA(ConvBase):
    """torch nn.MultiheadAttention semantics (batch_first): joint in-proj,
    per-head scaled dot product, out-proj."""

    num_heads: int = 1

    @nn.compact
    def __call__(self, q, k, v, train: bool = False):
        b, n, c = q.shape
        nh = self.num_heads
        d = c // nh
        qkv_w = nn.Dense(3 * c, dtype=self.dtype, name="in_proj")
        qq, kk, vv = jnp.split(qkv_w(q), 3, -1) if q is k is v else (
            None, None, None)
        if qq is None:  # separate projections (not needed here, q is k is v)
            raise NotImplementedError
        def heads(z, m):
            return z.reshape(b, m, nh, d).transpose(0, 2, 1, 3)
        qq, kk, vv = heads(qq, n), heads(kk, n), heads(vv, n)
        att = jax.nn.softmax((qq @ kk.transpose(0, 1, 3, 2)) * (d ** -0.5), -1)
        o = (att @ vv).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(o)


class GLMixBlock(ConvBase):
    """GLNet GLMix block (reference GLNet.py:85): adaptive-pooled slots,
    L2-normalized slot<->pixel affinity (learnable scalar scale), slot MHA
    relation, affinity-softmax scatter back, plus a 1x1-dw5-1x1 local branch;
    BN norms, conv MLP with ResDWC."""

    num_heads: int = 2
    pool_size: int = 8
    local_dw_ks: int = 5
    mlp_ratio: float = 3.0
    cpe_ks: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        slots0 = _adaptive_avg_pool(x, self.pool_size).reshape(b, -1, c)
        x = x + nn.Conv(c, (self.cpe_ks, self.cpe_ks),
                        padding="SAME", feature_group_count=c,
                        dtype=self.dtype, name="pos_conv")(x)
        shortcut = x
        y = _bn(self, "norm1", x, train)
        yf = y.reshape(b, h * w, c)
        scale = self.param("slot_scale",
                           nn.initializers.constant(c ** -0.5), ())
        logits = _l2norm(slots0) @ (scale.astype(yf.dtype) *
                                    _l2norm(yf).transpose(0, 2, 1))
        slots = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(yf.dtype) @ yf
        slots = TorchMHA(num_heads=self.num_heads, dtype=self.dtype,
                         name="relation_mha")(slots, slots, slots, train)
        out = jax.nn.softmax(logits.transpose(0, 2, 1).astype(jnp.float32),
                             -1).astype(yf.dtype) @ slots
        out = out.reshape(b, h, w, c)
        loc = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc_conv0")(y)
        p = self.local_dw_ks // 2
        loc = nn.Conv(c, (self.local_dw_ks,) * 2, padding=((p, p), (p, p)),
                      feature_group_count=c, dtype=self.dtype, name="fc_dw")(loc)
        loc = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc_conv2")(loc)
        x = shortcut + out + loc
        y = _bn(self, "norm2", x, train)
        y = nn.Conv(int(c * self.mlp_ratio), (1, 1), dtype=self.dtype,
                    name="mlp0")(y)
        y = y + nn.Conv(y.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=y.shape[-1], dtype=self.dtype,
                        name="mlp_dw")(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype,
                    name="mlp3")(jax.nn.gelu(y, approximate=False))
        return x + y


class MHSAnchwBlock(ConvBase):
    """GLNet MHSA_NCHW block (reference GLNet.py:238): dw cpe, token-LN MHSA
    residual, BN + conv MLP (with ResDWC) residual."""

    num_heads: int = 8
    mlp_ratio: float = 3.0
    cpe_ks: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        x = x + nn.Conv(c, (self.cpe_ks, self.cpe_ks), padding="SAME",
                        feature_group_count=c, dtype=self.dtype,
                        name="pos_conv")(x)
        t = x.reshape(b, h * w, c)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(t)
        t = t + TorchMHA(num_heads=self.num_heads, dtype=self.dtype,
                         name="mha_op")(y, y, y, train)
        x = t.reshape(b, h, w, c)
        y = _bn(self, "norm2", x, train)
        y = nn.Conv(int(c * self.mlp_ratio), (1, 1), dtype=self.dtype,
                    name="mlp0")(y)
        y = y + nn.Conv(y.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=y.shape[-1], dtype=self.dtype,
                        name="mlp_dw")(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype,
                    name="mlp3")(jax.nn.gelu(y, approximate=False))
        return x + y


class GLNetBackbone(ConvBase):
    """Faithful GLNet (reference GLNet.py:444; glnet_4g :745 = depths
    (4,4,18,4), dims (64,128,256,512), head_dim 32, mixing ('glmix','glmix',
    'glmix.mha_nchw','mha_nchw'), 64 ada-avgpool slots, cpe 3, dw5 local,
    mlp_dw, BN norms, overlapped embeds 'proj.norm')."""

    dims: Sequence[int] = (64, 128, 256, 512)
    depths: Sequence[int] = (4, 4, 18, 4)
    head_dim: int = 32
    mlp_ratios: Sequence[float] = (3, 3, 3, 3)
    mixing: Sequence[str] = ("glmix", "glmix", "glmix.mha_nchw", "mha_nchw")
    num_slots: int = 64
    local_dw_ks: int = 5
    cpe_ks: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math as _m

        c0 = self.dims[0]
        x = nn.Conv(c0 // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem_conv1")(x)
        x = jax.nn.gelu(_bn(self, "stem_bn1", x, train), approximate=False)
        x = nn.Conv(c0, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem_conv2")(x)
        x = _bn(self, "stem_bn2", x, train)
        ps = _m.isqrt(self.num_slots)
        outs = []
        for si in range(4):
            c = self.dims[si]
            nh = c // self.head_dim
            if si > 0:
                x = nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"down{si}")(x)
                x = _bn(self, f"down{si}_bn", x, train)
            mode = self.mixing[si]
            for bi in range(self.depths[si]):
                kind = mode if mode in ("glmix", "mha_nchw") else (
                    "glmix" if bi % 2 == 0 else "mha_nchw")
                if kind == "glmix":
                    x = GLMixBlock(num_heads=nh, pool_size=ps,
                                   local_dw_ks=self.local_dw_ks,
                                   mlp_ratio=self.mlp_ratios[si],
                                   cpe_ks=self.cpe_ks, dtype=self.dtype,
                                   name=f"s{si}_b{bi}")(x, train)
                else:
                    x = MHSAnchwBlock(num_heads=nh,
                                      mlp_ratio=self.mlp_ratios[si],
                                      cpe_ks=self.cpe_ks, dtype=self.dtype,
                                      name=f"s{si}_b{bi}")(x, train)
            outs.append(x)
        return outs


def _bn6(mod, name, x, train):
    """EMOv2 'bn_2d' BatchNorm with eps 1e-6 (reference EMOv2.py:123)."""
    from ultralytics_pro_tpu.nn.modules.backbones2 import BN_MOMENTUM
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        use_fast_variance=False, epsilon=1e-6, dtype=mod.dtype,
                        name=name, parent=mod)(x)


def _emo_act(x, act: str):
    if act == "silu":
        return jax.nn.silu(x)
    if act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    return x


class EWMHSAHybrid(ConvBase):
    """EMOv2 hybrid EW-MHSA (reference EMOv2.py:352): the same padded map is
    attended under BOTH a grid partition ('remote': window gathers every
    N-th pixel) and a contiguous window partition ('close'); the two
    attended v maps are summed."""

    dim_mid: int = 32
    dim_head: int = 16
    window: int = 7
    act: str = "gelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h0, w0, c = x.shape
        ws = self.window if self.window > 0 else max(h0, w0)
        pb = (ws - h0 % ws) % ws
        pr = (ws - w0 % ws) % ws
        xp = jnp.pad(x, ((0, 0), (0, pb), (0, pr), (0, 0)))
        hp, wp = h0 + pb, w0 + pr
        n1, n2 = hp // ws, wp // ws
        nh = max(1, c // self.dim_head)
        while nh > 1 and (c % nh or self.dim_mid % nh):
            nh -= 1  # heads must divide qk channels AND the expanded v width
        dh = c // nh
        dhv = self.dim_mid // nh

        qk = nn.Conv(2 * c, (1, 1), dtype=self.dtype, name="qk")(xp)
        v = _emo_act(nn.Conv(self.dim_mid, (1, 1), dtype=self.dtype,
                             name="v")(xp), self.act)

        def part_remote(z):  # (h1 n1)(w1 n2): grid partition (strided gather)
            cc = z.shape[-1]
            z = z.reshape(b, ws, n1, ws, n2, cc).transpose(0, 2, 4, 1, 3, 5)
            return z.reshape(b * n1 * n2, ws * ws, cc)

        def unpart_remote(z, cc):
            z = z.reshape(b, n1, n2, ws, ws, cc).transpose(0, 3, 1, 4, 2, 5)
            return z.reshape(b, hp, wp, cc)

        def part_close(z):  # (n1 h1)(n2 w1): contiguous windows
            cc = z.shape[-1]
            z = z.reshape(b, n1, ws, n2, ws, cc).transpose(0, 1, 3, 2, 4, 5)
            return z.reshape(b * n1 * n2, ws * ws, cc)

        def unpart_close(z, cc):
            z = z.reshape(b, n1, n2, ws, ws, cc).transpose(0, 1, 3, 2, 4, 5)
            return z.reshape(b, hp, wp, cc)

        def attend(qkw, vw, dv):
            # qkw: (G, N, 2C) channel layout (qk, heads, dh); vw: (G, N, mid)
            g, n, _ = qkw.shape
            qkh = qkw.reshape(g, n, 2, nh, dh).transpose(2, 0, 3, 1, 4)
            att = jax.nn.softmax(
                (qkh[0] @ qkh[1].transpose(0, 1, 3, 2)) * (dh ** -0.5), -1)
            vh = vw.reshape(g, n, nh, dv).transpose(0, 2, 1, 3)
            o = (att @ vh).transpose(0, 2, 1, 3).reshape(g, n, nh * dv)
            return o

        o_r = unpart_remote(attend(part_remote(qk), part_remote(v), dhv),
                            self.dim_mid)
        o_c = unpart_close(attend(part_close(qk), part_close(v), dhv),
                           self.dim_mid)
        out = o_r + o_c
        return out[:, :h0, :w0]


class IIRMB(ConvBase):
    """EMOv2 improved inverted residual mobile block (reference
    EMOv2.py:462): pre-norm, expansion via a 1x1 conv eop (first block of a
    stage) or hybrid EW-MHSA (later blocks of attention stages), dw-k
    (stride on the first block) BN+SiLU local conv fused residually, 1x1
    proj, layer scale 1e-6, skip when shape-preserving."""

    dim_out: int = 32
    exp_ratio: float = 2.0
    norm: str = "bn"  # 'bn' | 'ln'
    act: str = "silu"
    dw_ks: int = 5
    stride: int = 1
    dim_head: int = 16
    window: int = 7
    use_attn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        dim_mid = int(c * self.exp_ratio)
        shortcut = x
        if self.norm == "bn":
            y = _bn6(self, "norm", x, train)
        else:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_attn:
            y = EWMHSAHybrid(dim_mid=dim_mid, dim_head=self.dim_head,
                             window=self.window, act=self.act,
                             dtype=self.dtype, name="eop")(y, train)
        else:
            y = _emo_act(nn.Conv(dim_mid, (1, 1), dtype=self.dtype,
                                 name="eop_conv")(y), self.act)
        k, s = self.dw_ks, self.stride
        p = -(-((k - 1) + 1 - s) // 2)  # ceil(((k-1)*1+1-s)/2)
        loc = nn.Conv(dim_mid, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                      use_bias=False, feature_group_count=dim_mid,
                      dtype=self.dtype, name="local_conv")(y)
        loc = jax.nn.silu(_bn6(self, "local_bn", loc, train))
        y = (y + loc) if s == 1 else loc
        y = nn.Conv(self.dim_out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="proj")(y)
        g = self.param("ls_gamma", nn.initializers.constant(1e-6),
                       (self.dim_out,))
        y = y * g
        if s == 1 and c == self.dim_out:
            return shortcut + y
        return y


class EMO2Backbone(ConvBase):
    """Faithful EMOv2 / EMO2 (reference EMOv2.py:560; EMO2_1M_k5_hybrid :771 =
    dims (32,48,80,180), heads (16,16,20,20), depths (2,2,8,3), exp
    (2,2.5,3,3.5), dw5, hybrid attention in stages 3-4; EMO2_5M :833 = dims
    (48,72,160,288), heads (16,24,32,32), depths (3,3,9,3), exp (2,3,4,4)).
    Stem = conv3-s2(BN,SiLU) + dw3(BN,SiLU) + 1x1; every stage starts with a
    stride-2 double-expansion conv-eop IIRMB."""

    dims: Sequence[int] = (32, 48, 80, 180)
    depths: Sequence[int] = (2, 2, 8, 3)
    exp_ratios: Sequence[float] = (2.0, 2.5, 3.0, 3.5)
    dim_heads: Sequence[int] = (16, 16, 20, 20)
    window: int = 7
    dw_ks: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        pre = self.dims[0] // 2
        x = nn.Conv(pre, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=True, dtype=self.dtype, name="stem0")(x)
        x = jax.nn.silu(_bn6(self, "stem0_bn", x, train))
        x = nn.Conv(pre, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    feature_group_count=pre, dtype=self.dtype, name="stem1")(x)
        x = jax.nn.silu(_bn6(self, "stem1_bn", x, train))
        x = nn.Conv(pre, (1, 1), use_bias=False, dtype=self.dtype,
                    name="stem2")(x)
        outs = []
        for si in range(4):
            c = self.dims[si]
            norm = "bn" if si < 2 else "ln"
            act = "silu" if si < 2 else "gelu"
            for bi in range(self.depths[si]):
                first = bi == 0
                x = IIRMB(dim_out=c,
                          exp_ratio=self.exp_ratios[si] * (2 if first else 1),
                          norm=norm, act=act, dw_ks=self.dw_ks,
                          stride=2 if first else 1,
                          dim_head=self.dim_heads[si], window=self.window,
                          use_attn=(not first) and si >= 2,
                          dtype=self.dtype, name=f"s{si}_b{bi}")(x, train)
            outs.append(x)
        return outs


class GMFEfficientAtt(ConvBase):
    """GroupMixFormer group-mix efficient attention (reference
    GroupMixFormer.py:330): qkv split into 4 channel segments — identity /
    sepconv3 / sepconv5 aggregations form the attention part (linear
    attention: softmax over tokens on k, ctx = k^T v, out = q ctx, plus a
    multi-window depthwise conv relative position term on v), the 4th
    segment processes concat(q,k,v) through a local sepconv branch."""

    num_heads: int = 4
    seg: int = 4

    def _hsw(self, x):
        return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0

    def _sep(self, x, c2, k, name):
        p = k // 2
        c = x.shape[-1]
        y = nn.Conv(c, (k, k), padding=((p, p), (p, p)), use_bias=False,
                    feature_group_count=c, dtype=self.dtype,
                    name=f"{name}_dw", parent=self)(x)
        return nn.Conv(c2, (1, 1), use_bias=False, dtype=self.dtype,
                       name=f"{name}_pw", parent=self)(y)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        sd = c // self.seg
        ad = sd * (self.seg - 1)
        nh = self.num_heads
        hd = ad // nh
        t = x.reshape(b, n, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(t)
        q, k, v = [z.reshape(b, h, w, c) for z in jnp.split(qkv, 3, -1)]

        # shared aggregation modules (the reference runs one Aggregator over
        # the 3B-stacked qkv batch — identical weights for q, k and v)
        from ultralytics_pro_tpu.nn.modules.backbones2 import BN_MOMENTUM

        def mk_bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=BN_MOMENTUM, use_fast_variance=False,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        bn0, bn1, bn2 = mk_bn("agg_norm0"), mk_bn("agg_norm1"), mk_bn("agg_norm2")
        a1_dw = nn.Conv(sd, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        feature_group_count=sd, dtype=self.dtype, name="agg1_dw")
        a1_pw = nn.Conv(sd, (1, 1), use_bias=False, dtype=self.dtype, name="agg1_pw")
        a2_dw = nn.Conv(sd, (5, 5), padding=((2, 2), (2, 2)), use_bias=False,
                        feature_group_count=sd, dtype=self.dtype, name="agg2_dw")
        a2_pw = nn.Conv(sd, (1, 1), use_bias=False, dtype=self.dtype, name="agg2_pw")

        def agg(z):
            s0 = self._hsw(bn0(z[..., :sd]))
            s1 = self._hsw(bn1(a1_pw(a1_dw(z[..., sd:2 * sd]))))
            s2 = self._hsw(bn2(a2_pw(a2_dw(z[..., 2 * sd:3 * sd]))))
            y = jnp.concatenate([s0, s1, s2], -1)  # (B, H, W, ad)
            return y.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)  # (B, nh, N, hd)

        qa, ka, va = agg(q), agg(k), agg(v)
        # local branch on the 4th segment of concat(q, k, v)
        loc = jnp.concatenate([q[..., 3 * sd:], k[..., 3 * sd:], v[..., 3 * sd:]], -1)
        loc = self._hsw(_bn(self, "local_bn", self._sep(loc, sd, 3, "local"), train))
        loc = loc.reshape(b, n, sd)

        ks = jax.nn.softmax(ka.astype(jnp.float32), axis=2).astype(ka.dtype)
        ctx = jnp.einsum("bhnk,bhnv->bhkv", ks, va)
        eff = jnp.einsum("bhnk,bhkv->bhnv", qa, ctx)
        # CRPE: windows {3: nh-ceil..} — reference distributes heads over
        # (3, 5, 7) as evenly as possible, remainder to the smaller windows
        base, rem = nh // 3, nh % 3
        splits = [base + (1 if i < rem else 0) for i in range(3)]
        vimg = va.transpose(0, 2, 1, 3).reshape(b, h, w, nh * hd)
        parts, off = [], 0
        for i, (win, cnt) in enumerate(zip((3, 5, 7), splits)):
            if cnt == 0:
                continue
            cc = cnt * hd
            p = win // 2
            parts.append(nn.Conv(cc, (win, win), padding=((p, p), (p, p)),
                                 feature_group_count=cc, dtype=self.dtype,
                                 name=f"crpe{i}")(vimg[..., off:off + cc]))
            off += cc
        cv = jnp.concatenate(parts, -1).reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        out = (hd ** -0.5) * eff + qa * cv
        out = out.transpose(0, 2, 1, 3).reshape(b, n, ad)
        out = jnp.concatenate([out, loc], -1)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out).reshape(b, h, w, c)


class GMFBlock(ConvBase):
    """GroupMixFormer GMA block (reference GroupMixFormer.py:497): residual
    dw3 conv position encoding, pre-LN (eps 1e-6) group-mix attention and
    MLP residuals."""

    num_heads: int = 4
    mlp_ratio: float = 4.0
    seg: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = x + nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=c, dtype=self.dtype, name="cpe")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + GMFEfficientAtt(num_heads=self.num_heads, seg=self.seg,
                                dtype=self.dtype, name="att")(y, train)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = jax.nn.gelu(nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                                 name="fc1")(y), approximate=False)
        return x + nn.Dense(c, dtype=self.dtype, name="fc2")(y)


class GroupMixFormerBackbone(ConvBase):
    """Faithful GroupMixFormer (reference GroupMixFormer.py:575;
    GroupMixFormerTiny :101 = dims (80,160,200,240), depths (4,4,12,4),
    heads 4, seg 4). Hardswish conv stem (stride 4) then per stage a
    stride-2 separable patch embed + GMA blocks — stage outputs land at
    strides 8/16/32/64, exactly like the reference. NOTE: the reference's
    Tiny spec is self-inconsistent (stage-2 attention dim 150 is not
    divisible by 4 heads — GroupMixFormer.__init__ raises ValueError, so
    yolov11-GroupMixFormer*.yaml is unbuildable upstream); we lower such a
    stage's head count to the largest valid divisor (4 -> 3) so the yaml
    builds here."""

    dims: Sequence[int] = (80, 160, 200, 240)
    depths: Sequence[int] = (4, 4, 12, 4)
    num_heads: Sequence[int] = (4, 4, 4, 4)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    seg: int = 4

    def _hsw(self, x):
        return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c0 = self.dims[0]
        x = nn.Conv(c0 // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem_conv1")(x)
        x = self._hsw(_bn(self, "stem_bn1", x, train))
        x = nn.Conv(c0, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem_conv2")(x)
        x = self._hsw(_bn(self, "stem_bn2", x, train))
        outs = []
        for si in range(4):
            c = self.dims[si]
            cin = x.shape[-1]
            y = nn.Conv(cin, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, feature_group_count=cin,
                        dtype=self.dtype, name=f"pe{si}_dw")(x)
            y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"pe{si}_pw")(y)
            x = self._hsw(_bn(self, f"pe{si}_bn", y, train))
            ad = (c // self.seg) * (self.seg - 1)
            nh = self.num_heads[si]
            while ad % nh:  # see class docstring — upstream spec can be invalid
                nh -= 1
            for bi in range(self.depths[si]):
                x = GMFBlock(num_heads=nh,
                             mlp_ratio=self.mlp_ratios[si], seg=self.seg,
                             dtype=self.dtype, name=f"s{si}_b{bi}")(x, train)
            outs.append(x)
        return outs


def _maxpool2_ctx(x):
    """MaxPool2d(2,2, return_indices) + MaxUnpool2d pair for even (B,H,W,C):
    returns (pooled, unpool_fn) where unpool scatters values back to the
    argmax positions (first-max ties, like torch)."""
    b, h, w, c = x.shape
    win = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(b, h // 2, w // 2, 4, c)
    idx = jnp.argmax(win, 3)
    pooled = win.max(3)

    def unpool(y):
        oh = jax.nn.one_hot(idx, 4, dtype=y.dtype, axis=3)
        z = oh * y[:, :, :, None, :]
        z = z.reshape(b, h // 2, w // 2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        return z.reshape(b, h, w, c)

    return pooled, unpool


def _pad_even2(x):
    b, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0))), h, w
    return x, h, w


def _nearest_to(x, h, w):
    """torch F.interpolate(mode='nearest') semantics: src = floor(dst*in/out)."""
    hi = (jnp.arange(h) * x.shape[1]) // h
    wi = (jnp.arange(w) * x.shape[2]) // w
    return x[:, hi][:, :, wi]


def _h_shear(x):
    b, h, w, c = x.shape
    z = jnp.transpose(x, (0, 3, 1, 2))
    z = jnp.pad(z, ((0, 0), (0, 0), (0, 0), (0, w))).reshape(b, c, -1)[..., :-w]
    return jnp.transpose(z.reshape(b, c, h, 2 * w - 1), (0, 2, 3, 1))


def _inv_h_shear(x):
    b, h, _, c = x.shape
    z = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c, -1)
    z = jnp.pad(z, ((0, 0), (0, 0), (0, h))).reshape(b, c, h, 2 * h)[..., :h]
    return jnp.transpose(z, (0, 2, 3, 1))


def _blurpool3(x):
    """antialiased_cnns.BlurPool(stride=3, filt_size=4) (LWGANet.py MRA)."""
    import numpy as np

    a = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
    f = np.outer(a, a)
    f /= f.sum()
    c = x.shape[-1]
    k = jnp.broadcast_to(jnp.asarray(f, x.dtype)[:, :, None, None], (4, 4, 1, c))
    x = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x, k, (3, 3), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


class LWGA12(ConvBase):
    """LWGANet GA12 global attention (reference LWGANet.py:180): max-pool
    with indices, LSK-style dual-branch (dw5 / dw7-d3) spatial gating,
    max-unpool back to the argmax positions."""

    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = jax.nn.relu if self.act == "relu" else (
            lambda z: jax.nn.gelu(z, approximate=False))
        c = x.shape[-1]
        xp, h0, w0 = _pad_even2(x)
        y, unpool = _maxpool2_ctx(xp)
        y = act(nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_1")(y))
        a1 = nn.Conv(c, (5, 5), padding=((2, 2), (2, 2)), feature_group_count=c,
                     dtype=self.dtype, name="conv0")(y)
        a2 = nn.Conv(c, (7, 7), padding=((9, 9), (9, 9)), kernel_dilation=(3, 3),
                     feature_group_count=c, dtype=self.dtype,
                     name="conv_spatial")(a1)
        a1 = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="conv1")(a1)
        a2 = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="conv2")(a2)
        att = jnp.concatenate([a1, a2], -1)
        agg = jnp.concatenate([att.mean(-1, keepdims=True),
                               att.max(-1, keepdims=True)], -1)
        sig = jax.nn.sigmoid(nn.Conv(2, (7, 7), padding=((3, 3), (3, 3)),
                                     dtype=self.dtype, name="conv_squeeze")(agg))
        att = a1 * sig[..., :1] + a2 * sig[..., 1:2]
        att = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv")(att)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_2")(y * att)
        return unpool(y)[:, :h0, :w0]


class LWGABlock(ConvBase):
    """LWGANet LWGA block (reference LWGANet.py:306): channel quarters go
    through point attention (PA, residual), local conv (LA), medium-range
    strip attention (MRA: maxpool+BlurPool-s3, axis-aligned + sheared strip
    convs, nearest-upsampled sigmoid gate), and a stage-dependent global
    branch (GA12 / pooled D_GA / MHSA), then a 1x1 conv MLP residual."""

    stage: int = 0
    att_kernel: int = 11
    mlp_ratio: float = 2.0
    act: str = "relu"

    def _act(self, z):
        return jax.nn.relu(z) if self.act == "relu" else jax.nn.gelu(z, approximate=False)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        sd = c // 4
        x1, x2, x3, x4 = (x[..., :sd], x[..., sd:2 * sd],
                          x[..., 2 * sd:3 * sd], x[..., 3 * sd:])
        # PA
        a = nn.Conv(sd * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pa_0")(x1)
        a = self._act(_bn(self, "pa_bn", a, train))
        a = nn.Conv(sd, (1, 1), use_bias=False, dtype=self.dtype, name="pa_3")(a)
        x1 = x1 + x1 * jax.nn.sigmoid(a)
        # LA
        x2 = self._act(_bn(self, "la_bn", nn.Conv(
            sd, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name="la_conv")(x2), train))
        # MRA
        k = self.att_kernel
        p = k // 2
        t = nn.max_pool(jnp.pad(x3, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                constant_values=-jnp.inf), (3, 3), strides=(1, 1))
        t = _blurpool3(t)
        h1 = nn.Conv(sd, (k, 3), padding=((p, p), (1, 1)), use_bias=False,
                     feature_group_count=sd, dtype=self.dtype, name="mra_h1")(t)
        w1 = nn.Conv(sd, (3, k), padding=((1, 1), (p, p)), use_bias=False,
                     feature_group_count=sd, dtype=self.dtype, name="mra_v1")(t)
        h2 = _inv_h_shear(nn.Conv(sd, (k, 3), padding=((p, p), (1, 1)),
                                  use_bias=False, feature_group_count=sd,
                                  dtype=self.dtype, name="mra_h2")(_h_shear(t)))
        w2t = jnp.transpose(_h_shear(jnp.transpose(t, (0, 2, 1, 3))), (0, 2, 1, 3))
        w2 = nn.Conv(sd, (3, k), padding=((1, 1), (p, p)), use_bias=False,
                     feature_group_count=sd, dtype=self.dtype, name="mra_v2")(w2t)
        w2 = jnp.transpose(_inv_h_shear(jnp.transpose(w2, (0, 2, 1, 3))), (0, 2, 1, 3))
        att = _bn(self, "mra_bn", h1 + w1 + h2 + w2, train)
        x3 = x3 * _nearest_to(jax.nn.sigmoid(att), x3.shape[1], x3.shape[2])
        # GA branch
        if self.stage == 3:
            b, hh, ww, _ = x4.shape
            hd = min(64, sd)
            nh = max(sd // 64, 1)
            t4 = x4.reshape(b, hh * ww, sd)
            qkv = nn.Dense(nh * hd * 3, use_bias=False, dtype=self.dtype,
                           name="ga_qkv")(t4)
            q, kk, v = jnp.split(qkv.reshape(b, -1, 3, nh, hd)
                                 .transpose(2, 0, 3, 1, 4), 3, 0)
            at = jax.nn.softmax((q[0] @ kk[0].transpose(0, 1, 3, 2)) * (hd ** -0.5), -1)
            o = (at @ v[0]).transpose(0, 2, 1, 3).reshape(b, hh * ww, nh * hd)
            o = nn.Dense(sd, use_bias=False, dtype=self.dtype, name="ga_proj")(o)
            x4 = _bn(self, "ga_norm", x4 + o.reshape(b, hh, ww, sd), train)
        elif self.stage == 2:
            xp, h0, w0 = _pad_even2(x4)
            y, unpool = _maxpool2_ctx(xp)
            y = LWGA12(act=self.act, dtype=self.dtype, name="ga12")(y, train)
            y = _bn(self, "dga_norm", y, train)
            x4 = x4 + unpool(y)[:, :h0, :w0]
        else:
            x4 = _bn(self, "ga_norm",
                     x4 + LWGA12(act=self.act, dtype=self.dtype,
                                 name="ga12")(x4, train), train)
        y = jnp.concatenate([x1, x2, x3, x4], -1)
        y = nn.Conv(int(c * self.mlp_ratio), (1, 1), use_bias=False,
                    dtype=self.dtype, name="mlp0")(y)
        y = self._act(_bn(self, "mlp_bn", y, train))
        y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="mlp3")(y)
        return x + _bn(self, "norm1", y, train)


class LWGANetBackbone(ConvBase):
    """Faithful LWGANet (reference LWGANet.py:418; L2_1442_e96_k11_ReLU :643
    = stem 96, depths (1,4,4,2), att kernel 11, ReLU, BN, mlp 2). conv4-s4
    stem + BN; DRFD downsamplers (grouped conv-expand, parallel strided
    dwconv and maxpool branches fused 1x1); per-stage BN'd outputs."""

    stem_dim: int = 96
    depths: Sequence[int] = (1, 4, 4, 2)
    att_kernel: int = 11
    mlp_ratio: float = 2.0
    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = jax.nn.relu if self.act == "relu" else (
            lambda z: jax.nn.gelu(z, approximate=False))
        x = nn.Conv(self.stem_dim, (4, 4), strides=(4, 4), use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = _bn(self, "stem_bn", x, train)
        outs = []
        for si in range(4):
            c = x.shape[-1]
            for bi in range(self.depths[si]):
                x = LWGABlock(stage=si, att_kernel=self.att_kernel,
                              mlp_ratio=self.mlp_ratio, act=self.act,
                              dtype=self.dtype, name=f"s{si}_b{bi}")(x, train)
            outs.append(_bn(self, f"norm_out{si}", x, train))
            if si < 3:
                y = nn.Conv(c * 2, (3, 3), padding=((1, 1), (1, 1)),
                            feature_group_count=c, dtype=self.dtype,
                            name=f"drfd{si}_conv")(x)
                cv = nn.Conv(c * 2, (3, 3), strides=(2, 2),
                             padding=((1, 1), (1, 1)), feature_group_count=c * 2,
                             dtype=self.dtype, name=f"drfd{si}_conv_c")(y)
                cv = _bn(self, f"drfd{si}_norm_c", act(cv), train)
                mx = nn.max_pool(jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                         constant_values=-jnp.inf),
                                 (3, 3), strides=(2, 2))
                mx = _bn(self, f"drfd{si}_norm_m", mx, train)
                x = nn.Conv(c * 2, (1, 1), dtype=self.dtype,
                            name=f"drfd{si}_fusion")(jnp.concatenate([cv, mx], -1))
        return outs


def _bn3(mod, name, x, train):
    """PKINet 'BN' (eps 1e-3, torch momentum 0.03 — reference PKINet.py:70)."""
    return nn.BatchNorm(use_running_average=not train, momentum=0.97,
                        use_fast_variance=False, epsilon=1e-3, dtype=mod.dtype,
                        name=name, parent=mod)(x)


class PKIConvFFN(ConvBase):
    """PKINet ConvFFN (reference PKINet.py:186): token LN, 1x1 expand,
    depthwise-k, global-sigmoid gate (GSiLU), 1x1 back. with_bn selects the
    BN+SiLU ConvNormActs (stage-level FFNs pass norm_cfg=None -> plain
    biased convs)."""

    hidden_scale: float = 4.0
    k: int = 3
    with_bn: bool = False
    add_identity: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        hid = int(c * self.hidden_scale)
        hid = max(8, (hid + 4) // 8 * 8) if hid % 8 else hid  # _make_divisible
        idn = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)
        p = self.k // 2
        if self.with_bn:
            y = jax.nn.silu(_bn3(self, "bn1", nn.Conv(
                hid, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(y), train))
            y = _bn3(self, "bn_dw", nn.Conv(
                hid, (self.k, self.k), padding=((p, p), (p, p)), use_bias=False,
                feature_group_count=hid, dtype=self.dtype, name="dw")(y), train)
        else:
            y = nn.Conv(hid, (1, 1), dtype=self.dtype, name="conv1")(y)
            y = nn.Conv(hid, (self.k, self.k), padding=((p, p), (p, p)),
                        feature_group_count=hid, dtype=self.dtype, name="dw")(y)
        y = y * jax.nn.sigmoid(y.mean(axis=(1, 2), keepdims=True))  # GSiLU
        if self.with_bn:
            y = jax.nn.silu(_bn3(self, "bn2", nn.Conv(
                c, (1, 1), use_bias=False, dtype=self.dtype, name="conv2")(y), train))
        else:
            y = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv2")(y)
        return idn + y if self.add_identity else y


class PKIBlock(ConvBase):
    """PKINet PKIBlock (reference PKINet.py:556): BN pre-norm, Inception
    bottleneck (chained dw3/5/7/9/11 sums, CAA strip-attention gate on the
    pre-conv features, x*(1+caa) fusion), layer-scaled residual, then a BN
    pre-norm ConvFFN residual (also layer-scaled)."""

    kernel_sizes: Any = (3, 5, 7, 9, 11)
    caa_kernel: int = 11
    ffn_scale: float = 4.0
    ffn_k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        idn = x
        y = _bn3(self, "norm1", x, train)
        # InceptionBottleneck (in == out -> add_identity True)
        pre = jax.nn.silu(_bn3(self, "pre_bn", nn.Conv(
            c, (1, 1), use_bias=False, dtype=self.dtype, name="pre_conv")(y), train))
        cur = None
        for i, k in enumerate(self.kernel_sizes):
            p = k // 2
            src = pre if i == 0 else cur
            out = nn.Conv(c, (k, k), padding=((p, p), (p, p)),
                          feature_group_count=c, dtype=self.dtype,
                          name=f"dw{i}")(src)
            cur = out if i == 0 else cur + out
        cur = jax.nn.silu(_bn3(self, "pw_bn", nn.Conv(
            c, (1, 1), use_bias=False, dtype=self.dtype, name="pw_conv")(cur), train))
        # CAA on pre (reference CAA: avgpool7 + 1x1 -> (1,k) -> (k,1) -> 1x1 -> sigmoid)
        kc = self.caa_kernel
        pc = kc // 2
        # the reference builds this CAA with norm_cfg=None/act_cfg=None
        # (PKINet.py:330 with_caa) — plain biased convs, no BN/SiLU
        a = jnp.pad(pre, ((0, 0), (3, 3), (3, 3), (0, 0)))
        a = nn.avg_pool(a, (7, 7), strides=(1, 1))
        a = nn.Conv(c, (1, 1), dtype=self.dtype, name="caa_conv1")(a)
        a = nn.Conv(c, (1, kc), padding=((0, 0), (pc, pc)), feature_group_count=c,
                    dtype=self.dtype, name="caa_h")(a)
        a = nn.Conv(c, (kc, 1), padding=((pc, pc), (0, 0)), feature_group_count=c,
                    dtype=self.dtype, name="caa_v")(a)
        a = nn.Conv(c, (1, 1), dtype=self.dtype, name="caa_conv2")(a)
        caa = jax.nn.sigmoid(a)
        y = cur * (1.0 + caa)
        y = jax.nn.silu(_bn3(self, "post_bn", nn.Conv(
            c, (1, 1), use_bias=False, dtype=self.dtype, name="post_conv")(y), train))
        g1 = self.param("gamma1", nn.initializers.constant(1e-6), (c,))
        x = idn + y * g1
        y = _bn3(self, "norm2", x, train)
        y = PKIConvFFN(hidden_scale=self.ffn_scale, k=self.ffn_k, with_bn=False,
                       add_identity=False, dtype=self.dtype, name="ffn")(y, train)
        g2 = self.param("gamma2", nn.initializers.constant(1e-6), (c,))
        return x + y * g2


class PKINetBackbone(ConvBase):
    """Faithful PKINet (reference PKINet.py:760; pkinet_t :951 arch 'T' =
    stage outs (32,64,128,256), blocks (4,14,22,4), CSP-style stages where
    every PKIBlock reads the SAME split branch and the results are SUMMED,
    the other branch passes a plain-conv GSiLU ConvFFN; conv3-s2 BN+SiLU
    stem (stride 2) and per-stage downsample; outputs at strides 4/8/16/32."""

    outs_ch: Sequence[int] = (32, 64, 128, 256)
    depths: Sequence[int] = (4, 14, 22, 4)
    sc_ffn_scale: Sequence[float] = (8.0, 8.0, 4.0, 4.0)
    sc_ffn_k: Sequence[int] = (5, 7, 9, 11)
    caa_kernel: int = 11

    @nn.compact
    def __call__(self, x, train: bool = False):
        c0 = self.outs_ch[0] // 2  # stem width = first stage's in_channels
        x = jax.nn.silu(_bn3(self, "stem_bn0", nn.Conv(
            c0, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name="stem_conv0")(x), train))
        x = jax.nn.silu(_bn3(self, "stem_bn1", nn.Conv(
            c0, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name="stem_conv1")(x), train))
        x = jax.nn.silu(_bn3(self, "stem_bn2", nn.Conv(
            c0, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name="stem_conv2")(x), train))
        outs = []
        for si in range(4):
            oc = self.outs_ch[si]
            hid = max(8, int(oc * 0.5))
            x = jax.nn.silu(_bn3(self, f"s{si}_down_bn", nn.Conv(
                oc, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                use_bias=False, dtype=self.dtype, name=f"s{si}_down")(x), train))
            y = jax.nn.silu(_bn3(self, f"s{si}_split_bn", nn.Conv(
                2 * hid, (1, 1), use_bias=False, dtype=self.dtype,
                name=f"s{si}_split")(x), train))
            bx, by = y[..., :hid], y[..., hid:]
            bx = PKIConvFFN(hidden_scale=self.sc_ffn_scale[si],
                            k=self.sc_ffn_k[si], with_bn=False,
                            add_identity=True, dtype=self.dtype,
                            name=f"s{si}_scffn")(bx, train)
            agg = None
            for bi in range(self.depths[si]):
                o = PKIBlock(caa_kernel=self.caa_kernel + 2 * bi,
                             dtype=self.dtype, name=f"s{si}_b{bi}")(by, train)
                agg = o if agg is None else agg + o
            y = jnp.concatenate([bx, agg], -1)
            y = jax.nn.silu(_bn3(self, f"s{si}_merge_bn", nn.Conv(
                oc, (1, 1), use_bias=False, dtype=self.dtype,
                name=f"s{si}_merge")(y), train))
            x = jax.nn.silu(_bn3(self, f"s{si}_final_bn", nn.Conv(
                oc, (1, 1), use_bias=False, dtype=self.dtype,
                name=f"s{si}_final")(y), train))
            outs.append(x)
        return outs


def _adaptive_pool1d_matrix(n_in, n_out):
    """Row-stochastic (n_out, n_in) matrix reproducing torch
    adaptive_avg_pool1d bucket boundaries (start=floor(t*n/m),
    end=ceil((t+1)*n/m))."""
    import numpy as np

    P = np.zeros((n_out, n_in), np.float32)
    for t in range(n_out):
        s = (t * n_in) // n_out
        e = -((-(t + 1) * n_in) // n_out)
        P[t, s:e] = 1.0 / (e - s)
    return P


def _transnext_seqlen_mask(h, w, win):
    """Per-position valid-neighbor count + padding mask of the zero-padded
    win x win unfold (reference TransNeXt.py:22 get_seqlen_and_mask):
    returns (count (N,), mask (N, win*win) True where out-of-bounds)."""
    import numpy as np

    p = win // 2
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    mask = np.zeros((h * w, win * win), bool)
    for k in range(win * win):
        a, b = k // win, k % win
        ok = ((ii + a - p >= 0) & (ii + a - p < h)
              & (jj + b - p >= 0) & (jj + b - p < w))
        mask[:, k] = ~ok.reshape(-1)
    return (~mask).sum(-1).astype(np.float32), mask


def _transnext_cpb_table(qh, qw, kh, kw, ph, pw):
    """Continuous-relative-position table + inverse index (reference
    TransNeXt.py:180 get_relative_position_cpb): key axes are the
    adaptive-pooled query axes; coordinates scaled by 8/(pretrain-1), deduped
    with a lexicographic unique, then sign*log2(|.|+1)/log2(8) transformed."""
    import numpy as np

    aqh = np.arange(qh, dtype=np.float32)
    aqw = np.arange(qw, dtype=np.float32)
    akh = (_adaptive_pool1d_matrix(qh, kh) @ aqh).astype(np.float32)
    akw = (_adaptive_pool1d_matrix(qw, kw) @ aqw).astype(np.float32)
    kh_g, kw_g = np.meshgrid(akh, akw, indexing="ij")
    qh_g, qw_g = np.meshgrid(aqh, aqw, indexing="ij")
    rel_h = (qh_g.reshape(-1)[:, None] - kh_g.reshape(-1)[None, :]) / (ph - 1) * 8
    rel_w = (qw_g.reshape(-1)[:, None] - kw_g.reshape(-1)[None, :]) / (pw - 1) * 8
    rel = np.stack([rel_h, rel_w], -1).reshape(-1, 2).astype(np.float32)
    table, idx = np.unique(rel, axis=0, return_inverse=True)
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return idx.reshape(-1).astype(np.int32), table.astype(np.float32)


def _l2n(x):
    """F.normalize(dim=-1): x / max(||x||, 1e-12)."""
    return x / jnp.maximum(jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                           keepdims=True), 1e-12).astype(x.dtype)


def _cpb_bias(mod, table, index, heads, n, m):
    """CPB MLP 2 -> 512 -> heads over the unique coords table, gathered back
    to (heads, n, m) (reference TransNeXt.py:121/:246)."""
    t = nn.Dense(512, dtype=mod.dtype, name="cpb_fc1")(jnp.asarray(table))
    t = nn.Dense(heads, dtype=mod.dtype, name="cpb_fc2")(jax.nn.relu(t))
    return t.T[:, jnp.asarray(index)].reshape(heads, n, m)


class TransNeXtAggAttn(ConvBase):
    """TransNeXt AggregatedAttention (reference TransNeXt.py:30): pixel-focused
    attention where each query attends to its zero-padded 3x3 unfolded local
    keys AND an sr-pooled global key set under ONE softmax; L2-normalized
    q/k with a learnable query embedding, softplus temperature, and a
    per-position log(local_len+pool_len) sequence-length scale; the local
    branch adds a static relative bias pre-softmax and a dynamic
    (q @ learnable_tokens + bias) term post-softmax."""

    num_heads: int = 2
    sr: int = 8
    window: int = 3

    @nn.compact
    def __call__(self, x, h, w, train: bool = False):
        import numpy as np

        b, n, c = x.shape
        heads, hd = self.num_heads, c // self.num_heads
        win2 = self.window * self.window
        ph, pw = h // self.sr, w // self.sr
        pool_len = ph * pw
        cnt, pad_mask = _transnext_seqlen_mask(h, w, self.window)
        seq_scale = jnp.asarray(np.log(cnt + pool_len)[:, None])

        q = nn.Dense(c, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
        q_norm = _l2n(q)
        qe = self.param("query_embedding",
                        nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
                        (heads, 1, hd))
        temp = self.param("temperature",
                          nn.initializers.constant(float(np.log(np.expm1(1 / 0.24)))),
                          (heads, 1, 1))
        q_scaled = (q_norm + qe) * jax.nn.softplus(temp) * seq_scale

        kv = nn.Dense(2 * c, dtype=self.dtype, name="kv")
        kv_loc = kv(x)
        k_loc = _l2n(kv_loc[..., :c].reshape(b, n, heads, hd)).reshape(b, n, c)
        patches = _unfold3(jnp.concatenate([k_loc, kv_loc[..., c:]], -1)
                           .reshape(b, h, w, 2 * c))
        patches = patches.reshape(b, n, win2, 2, heads, hd)
        k_local = patches[:, :, :, 0].transpose(0, 3, 1, 4, 2)  # (b,heads,n,hd,9)
        v_local = patches[:, :, :, 1].transpose(0, 3, 1, 4, 2)

        rpb = self.param("relative_pos_bias_local",
                         nn.initializers.truncated_normal(4e-4), (heads, win2))
        attn_local = jnp.einsum("bhnd,bhndl->bhnl", q_scaled, k_local)
        attn_local = attn_local + rpb[None, :, None, :]
        attn_local = jnp.where(jnp.asarray(pad_mask)[None, None],
                               -jnp.inf, attn_local)

        # pooled branch: 1x1 sr conv -> GELU -> adaptive avg pool -> LN
        xs = x.reshape(b, h, w, c)
        xs = jax.nn.gelu(nn.Conv(c, (1, 1), dtype=self.dtype, name="sr")(xs),
                         approximate=False)
        Ph = jnp.asarray(_adaptive_pool1d_matrix(h, ph))
        Pw = jnp.asarray(_adaptive_pool1d_matrix(w, pw))
        xs = jnp.einsum("ph,bhwc->bpwc", Ph, xs)
        xs = jnp.einsum("qw,bpwc->bpqc", Pw, xs).reshape(b, pool_len, c)
        xs = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(xs)
        kv_pool = kv(xs).reshape(b, pool_len, 2 * heads, hd)
        k_pool = _l2n(kv_pool[:, :, :heads].transpose(0, 2, 1, 3))
        v_pool = kv_pool[:, :, heads:].transpose(0, 2, 1, 3)

        idx, table = _transnext_cpb_table(h, w, ph, pw, h, w)
        pool_bias = _cpb_bias(self, table, idx, heads, n, pool_len)
        attn_pool = q_scaled @ k_pool.transpose(0, 1, 3, 2) + pool_bias[None]

        attn = jax.nn.softmax(
            jnp.concatenate([attn_local, attn_pool], -1).astype(jnp.float32),
            axis=-1).astype(x.dtype)
        a_local, a_pool = attn[..., :win2], attn[..., win2:]
        lt = self.param("learnable_tokens",
                        nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
                        (heads, hd, win2))
        lb = self.param("learnable_bias", nn.initializers.zeros, (heads, 1, win2))
        dyn = jnp.einsum("bhnd,hdl->bhnl", q_norm, lt) + lb[None] + a_local
        x_local = jnp.einsum("bhnl,bhndl->bhnd", dyn, v_local)
        y = (x_local + a_pool @ v_pool).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(y)


class TransNeXtFullAttn(ConvBase):
    """TransNeXt stage-4 Attention (reference TransNeXt.py:212): full MHSA
    with L2-normalized q/k, query embedding, softplus temperature, scalar
    log(N) scale, and a CPB-MLP relative bias over the full N x N grid."""

    num_heads: int = 16

    @nn.compact
    def __call__(self, x, h, w, train: bool = False):
        import numpy as np

        b, n, c = x.shape
        heads, hd = self.num_heads, c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3 * heads, hd).transpose(0, 2, 1, 3)
        q, k, v = qkv[:, :heads], qkv[:, heads:2 * heads], qkv[:, 2 * heads:]
        idx, table = _transnext_cpb_table(h, w, h, w, h, w)
        bias = _cpb_bias(self, table, idx, heads, n, n)
        qe = self.param("query_embedding",
                        nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
                        (heads, 1, hd))
        temp = self.param("temperature",
                          nn.initializers.constant(float(np.log(np.expm1(1 / 0.24)))),
                          (heads, 1, 1))
        attn = ((_l2n(q) + qe) * jax.nn.softplus(temp) * float(np.log(n))) \
            @ _l2n(k).transpose(0, 1, 3, 2) + bias[None]
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(x.dtype)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(y)


class TransNeXtCGLU(ConvBase):
    """TransNeXt ConvolutionalGLU (reference TransNeXt.py:158): fc1 to
    2*(2/3*hidden), dw3x3+GELU gate times value, fc2."""

    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, h, w, train: bool = False):
        b, n, c = x.shape
        hid = int(2 * int(c * self.mlp_ratio) / 3)
        y = nn.Dense(2 * hid, dtype=self.dtype, name="fc1")(x)
        g, v = y[..., :hid], y[..., hid:]
        g = nn.Conv(hid, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=hid,
                    dtype=self.dtype, name="dw")(g.reshape(b, h, w, hid))
        g = jax.nn.gelu(g.reshape(b, n, hid), approximate=False)
        return nn.Dense(c, dtype=self.dtype, name="fc2")(g * v)


class TransNeXtBackbone(ConvBase):
    """Faithful TransNeXt (reference TransNeXt.py:323; transnext_micro :462 =
    dims (48,96,192,384), heads (2,4,8,16), mlp (8,8,4,4), depths (2,2,15,2),
    sr (8,4,2,1), window 3): overlapped patch embeds (7s4 then 3s2) + LN,
    aggregated pixel-focused attention stages 1-3, full normalized attention
    stage 4, ConvolutionalGLU MLPs, per-stage output LN. Relative-position
    tables/masks are computed host-side from the static trace shapes
    (pretrain size = input size, the reference's default)."""

    dims: Sequence[int] = (48, 96, 192, 384)
    depths: Sequence[int] = (2, 2, 15, 2)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for si in range(4):
            c = self.dims[si]
            k, s = (7, 4) if si == 0 else (3, 2)
            p = k // 2
            x = nn.Conv(c, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                        dtype=self.dtype, name=f"pe{si}")(x)
            b, h, w, _ = x.shape
            t = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"pe{si}_norm")(x.reshape(b, h * w, c))
            for bi in range(self.depths[si]):
                pre = f"s{si}_b{bi}"
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_norm1")(t)
                if self.sr_ratios[si] == 1:
                    y = TransNeXtFullAttn(num_heads=self.num_heads[si],
                                          dtype=self.dtype,
                                          name=f"{pre}_attn")(y, h, w, train)
                else:
                    y = TransNeXtAggAttn(num_heads=self.num_heads[si],
                                         sr=self.sr_ratios[si], dtype=self.dtype,
                                         name=f"{pre}_attn")(y, h, w, train)
                t = t + y
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_norm2")(t)
                t = t + TransNeXtCGLU(mlp_ratio=self.mlp_ratios[si],
                                      dtype=self.dtype,
                                      name=f"{pre}_mlp")(y, h, w, train)
            t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"norm_out{si}")(t)
            x = t.reshape(b, h, w, c)
            outs.append(x)
        return outs


def _nn_idx(src, dst):
    """torch F.interpolate mode='nearest' source index per output position:
    floor(i * src / dst)."""
    import numpy as np

    return (np.arange(dst) * src) // dst


def _sg_sincos_pos_embed(h, w, dim):
    """2-D sincos table (reference SGFormer.py:13 get_2d_sincos_pos_embed):
    row-major tokens, layout [sin(w·ω), cos(w·ω), sin(h·ω), cos(h·ω)].
    The reference only generates it for square grids; we extend to h != w."""
    import numpy as np

    omega = 1.0 / 10000 ** (np.arange(dim // 4, dtype=np.float32) / (dim / 4))
    wv, hv = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    out = []
    for pos in (wv.reshape(-1), hv.reshape(-1)):
        ang = np.einsum("m,d->md", pos, omega)
        out += [np.sin(ang), np.cos(ang)]
    return np.concatenate(out, axis=1)[None].astype(np.float32)


class _SGConvGN(ConvBase):
    """Conv2d_BN (reference SGFormer.py:373): bias-free conv + GroupNorm with
    num_groups = max(1, out // min(out, 32))."""

    out: int = 1
    k: int = 1
    s: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        x = nn.Conv(self.out, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="c")(x)
        g = max(1, self.out // min(self.out, 32))
        return nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=self.dtype,
                            name="gn")(x)


def _sg_lepe(mod, x, h, w):
    """LePE positional term (reference SGFormer.py:214): linear then 3x3
    depthwise conv, added to the attention output before proj."""
    b, n, c = x.shape
    y = nn.Dense(c, dtype=mod.dtype, name="lepe_linear")(x)
    y = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                dtype=mod.dtype, name="lepe_conv")(y.reshape(b, h, w, c))
    return y.reshape(b, n, c)


class SGFormerAttnGL(ConvBase):
    """SGFormer global-local attention (reference SGFormer.py:220, the
    mask_init_config=False first-pass path): half the heads attend sr-pooled
    global keys, half do 7x7 zero-padded window attention (padded keys
    participate in the softmax, exactly as upstream); emits the runtime
    saliency mask (window-mean local + key-mean global scores,
    nearest-upsampled) that the NEXT block's sparsification consumes."""

    num_heads: int = 2
    sr: int = 8

    @nn.compact
    def __call__(self, x, h, w, train: bool = False):
        b, n, c = x.shape
        nh2 = self.num_heads // 2
        hd = c // self.num_heads
        scale = hd ** -0.5
        lepe = _sg_lepe(self, x, h, w)

        # global half over sr-strided conv keys
        q1 = nn.Dense(c // 2, dtype=self.dtype, name="q1")(x)
        q1 = q1.reshape(b, n, nh2, hd).transpose(0, 2, 1, 3)
        xs = nn.Conv(c, (self.sr, self.sr), strides=(self.sr, self.sr),
                     dtype=self.dtype, name="sr")(x.reshape(b, h, w, c))
        hs, ws = h // self.sr, w // self.sr
        xs = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          name="norm")(xs.reshape(b, hs * ws, c))
        xs = jax.nn.gelu(xs, approximate=False)
        kv1 = nn.Dense(c, dtype=self.dtype, name="kv1")(xs)
        kv1 = kv1.reshape(b, hs * ws, 2, nh2, hd).transpose(2, 0, 3, 1, 4)
        a1 = jax.nn.softmax(q1 @ kv1[0].transpose(0, 1, 3, 2) * scale, -1)
        x1 = (a1 @ kv1[1]).transpose(0, 2, 1, 3).reshape(b, n, c // 2)
        gm = jax.lax.stop_gradient(a1).mean(1).mean(1).reshape(b, hs, ws)
        gm = gm[:, jnp.asarray(_nn_idx(hs, h))][:, :, jnp.asarray(_nn_idx(ws, w))]

        # local half: 7x7 zero-padded windows
        WS = 7
        ph, pw = (-h) % WS, (-w) % WS
        hp, wp = h + ph, w + pw
        nwh, nww = hp // WS, wp // WS

        def part(t):
            t = jnp.pad(t.reshape(b * nh2, h, w, hd),
                        ((0, 0), (0, ph), (0, pw), (0, 0)))
            t = t.reshape(b * nh2, nwh, WS, nww, WS, hd)
            return t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, WS * WS, hd)

        q2 = nn.Dense(c // 2, dtype=self.dtype, name="q2")(x)
        q2 = q2.reshape(b, n, nh2, hd).transpose(0, 2, 1, 3)
        kv2 = nn.Dense(c, dtype=self.dtype, name="kv2")(x)
        kv2 = kv2.reshape(b, n, 2, nh2, hd).transpose(2, 0, 3, 1, 4)
        q2w, k2w, v2w = part(q2), part(kv2[0]), part(kv2[1])
        a2 = jax.nn.softmax(q2w @ k2w.transpose(0, 2, 1) * scale, -1)
        x2 = (a2 @ v2w).reshape(b * nh2, nwh, nww, WS, WS, hd)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b * nh2, hp, wp, hd)
        x2 = x2[:, :h, :w].reshape(b, nh2, h, w, hd)
        x2 = x2.transpose(0, 2, 3, 1, 4).reshape(b, n, c // 2)
        lm = jax.lax.stop_gradient(a2).reshape(b, nh2, nwh * nww, WS * WS, WS * WS)
        lm = lm.mean(axis=(1, 3, 4)).reshape(b, nwh, nww)
        lm = lm[:, jnp.asarray(_nn_idx(nwh, h))][:, :, jnp.asarray(_nn_idx(nww, w))]

        y = nn.Dense(c, dtype=self.dtype,
                     name="proj")(jnp.concatenate([x1, x2], -1) + lepe)
        mask = lm + gm
        return y, (mask.reshape(b, n),
                   mask.transpose(0, 2, 1).reshape(b, n))


class SGFormerAttnSparse(ConvBase):
    """SGFormer token-sparsification attention (reference SGFormer.py:294, the
    mask_init_config=True path): sort the previous block's saliency mask in
    row-major and column-major orders, keep the top N/sr^2 tokens of each, and
    give half the heads the row-selected K/V, half the column-selected.

    sort_quant > 0 quantizes the sort key first: the saliency mask's
    equal-saliency plateaus (nearest-upsampled copies) carry ~1e-9 summation
    noise, so WHICH of the equally-salient tokens wins the cut is float-level
    chaos in any implementation (reference included: its CPU and CUDA sorts
    already disagree). Quantizing snaps plateaus to exact ties resolved by
    stable index order — deterministic selection for eval/parity."""

    num_heads: int = 2
    sr: int = 8
    sort_quant: float = 0.0

    @nn.compact
    def __call__(self, x, h, w, mask, train: bool = False):
        b, n, c = x.shape
        nh, nh2 = self.num_heads, self.num_heads // 2
        hd = c // nh
        scale = hd ** -0.5
        lepe = _sg_lepe(self, x, h, w)
        q = nn.Dense(c, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        nkv = max(1, n // (self.sr * self.sr))
        m1, m2 = mask
        if self.sort_quant > 0:
            m1 = jnp.round(m1 / self.sort_quant) * self.sort_quant
            m2 = jnp.round(m2 / self.sort_quant) * self.sort_quant
        i1 = jnp.argsort(-m1, axis=1)[:, :nkv]
        s1 = jnp.take_along_axis(x, i1[:, :, None], axis=1)
        xp = x.reshape(b, h, w, c).transpose(0, 2, 1, 3).reshape(b, n, c)
        i2 = jnp.argsort(-m2, axis=1)[:, :nkv]
        s2 = jnp.take_along_axis(xp, i2[:, :, None], axis=1)
        kv1 = nn.Dense(c, dtype=self.dtype, name="kv1")(s1)
        kv1 = kv1.reshape(b, nkv, 2, nh2, hd).transpose(2, 0, 3, 1, 4)
        kv2 = nn.Dense(c, dtype=self.dtype, name="kv2")(s2)
        kv2 = kv2.reshape(b, nkv, 2, nh2, hd).transpose(2, 0, 3, 1, 4)
        k = jnp.concatenate([kv1[0], kv2[0]], 1)
        v = jnp.concatenate([kv1[1], kv2[1]], 1)
        a = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) * scale, -1)
        y = (a @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(y + lepe)


class SGFormerAttnFull(ConvBase):
    """SGFormer stage-4 full attention (reference SGFormer.py:335, sr=1)."""

    num_heads: int = 16

    @nn.compact
    def __call__(self, x, h, w, train: bool = False):
        b, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        lepe = _sg_lepe(self, x, h, w)
        q = nn.Dense(c, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        kv = nn.Dense(2 * c, dtype=self.dtype, name="kv")(x)
        kv = kv.reshape(b, n, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        a = jax.nn.softmax(q @ kv[0].transpose(0, 1, 3, 2) * hd ** -0.5, -1)
        y = (a @ kv[1]).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(y + lepe)


class SGFormerMlp(ConvBase):
    """SGFormer Mlp (reference SGFormer.py:66): act(fc1(x) + dw3(fc1(x)))
    then fc2."""

    hidden: int = 64

    @nn.compact
    def __call__(self, x, h, w, train: bool = False):
        b, n, c = x.shape
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        d = nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.hidden, dtype=self.dtype,
                    name="dw")(y.reshape(b, h, w, self.hidden))
        y = jax.nn.gelu(y + d.reshape(b, n, self.hidden), approximate=False)
        return nn.Dense(c, dtype=self.dtype, name="fc2")(y)


class SGFormerBackbone(ConvBase):
    """Faithful SGFormer (reference SGFormer.py:437; sgformer_s arch 's' :439
    = dims (64,128,256,512), heads (2,4,8,16), depths (2,4,16,1), mlp 4,
    sr (8,4,2,1)): 3-conv GroupNorm stem (stride 4) + sincos pos-embed,
    1x1/dw3s2/1x1 Conv2d_BN PatchMerging downsamples, blocks alternating
    global-local attention (even index: emits the runtime saliency mask) and
    mask-sorted token-sparsification attention (odd index, stages 1-3), full
    attention in stage 4, LePE in every attention, dwconv-augmented MLP, and
    LN'd stage outputs. The pos-embed parameter is created at the trace
    resolution (the reference bicubically resizes a fixed-img_size table;
    ours is exact at any size — checkpoint import resizes instead).
    sort_quant: see SGFormerAttnSparse (deterministic token selection)."""

    dims: Sequence[int] = (64, 128, 256, 512)
    depths: Sequence[int] = (2, 4, 16, 1)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    sort_quant: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        mask = None
        for si in range(4):
            c = self.dims[si]
            if si == 0:
                x = _SGConvGN(out=c, k=3, s=2, dtype=self.dtype, name="pe0_c0")(x)
                x = jax.nn.gelu(x, approximate=False)
                x = _SGConvGN(out=c, k=3, s=1, dtype=self.dtype, name="pe0_c1")(x)
                x = jax.nn.gelu(x, approximate=False)
                x = _SGConvGN(out=c, k=3, s=2, dtype=self.dtype, name="pe0_c2")(x)
            else:
                x = _SGConvGN(out=c, k=1, dtype=self.dtype, name=f"pe{si}_c1")(x)
                x = jax.nn.gelu(x, approximate=False)
                x = _SGConvGN(out=c, k=3, s=2, groups=c, dtype=self.dtype,
                              name=f"pe{si}_c2")(x)
                x = jax.nn.gelu(x, approximate=False)
                x = _SGConvGN(out=c, k=1, dtype=self.dtype, name=f"pe{si}_c3")(x)
            b, h, w, _ = x.shape
            t = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"pe{si}_norm")(x.reshape(b, h * w, c))
            if si == 0:
                pe = self.param("pos_embed",
                                lambda k, s: jnp.asarray(
                                    _sg_sincos_pos_embed(h, w, c)), (1, h * w, c))
                t = t + pe
            for bi in range(self.depths[si]):
                pre = f"s{si}_b{bi}"
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_norm1")(t)
                if self.sr_ratios[si] == 1:
                    y = SGFormerAttnFull(num_heads=self.num_heads[si],
                                         dtype=self.dtype,
                                         name=f"{pre}_attn")(y, h, w, train)
                elif bi % 2 == 1 and si < 3:
                    y = SGFormerAttnSparse(num_heads=self.num_heads[si],
                                           sr=self.sr_ratios[si],
                                           sort_quant=self.sort_quant,
                                           dtype=self.dtype,
                                           name=f"{pre}_attn")(y, h, w, mask,
                                                               train)
                    mask = None
                else:
                    y, mask = SGFormerAttnGL(num_heads=self.num_heads[si],
                                             sr=self.sr_ratios[si],
                                             dtype=self.dtype,
                                             name=f"{pre}_attn")(y, h, w, train)
                t = t + y
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"{pre}_norm2")(t)
                t = t + SGFormerMlp(hidden=int(c * self.mlp_ratios[si]),
                                    dtype=self.dtype,
                                    name=f"{pre}_mlp")(y, h, w, train)
            t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"norm_out{si}")(t)
            x = t.reshape(b, h, w, c)
            outs.append(x)
        return outs


# OverLoCK's DilatedReparamBlock branch table (reference OverLoCK.py:195) —
# one more dilation-1 branch per kernel than the UniRepLKNet table in
# reparam.py, so it gets its own map.
_OL_DRB_TABLE = {
    19: ((5, 7, 9, 9, 3, 3, 3), (1, 1, 1, 2, 4, 5, 7)),
    17: ((5, 7, 9, 3, 3, 3), (1, 1, 2, 4, 5, 7)),
    15: ((5, 7, 7, 3, 3, 3), (1, 1, 2, 3, 5, 7)),
    13: ((5, 7, 7, 3, 3, 3), (1, 1, 2, 3, 4, 5)),
    11: ((5, 7, 5, 3, 3, 3), (1, 1, 2, 3, 4, 5)),
    9: ((5, 7, 5, 3, 3), (1, 1, 2, 3, 4)),
    7: ((5, 3, 3, 3), (1, 1, 2, 3)),
    5: ((3, 3), (1, 2)),
}


class OverLoCKRepBlock(ConvBase):
    """OverLoCK RepConvBlock (reference OverLoCK.py:293): residual dw3 ->
    [LN2d -> DilatedReparamBlock(k) -> BN -> SE -> 1x1 up -> GELU ->
    residual dw3 -> GRN -> 1x1 down] with a res-scale residual
    (LayerScale(identity) + branch; ls=None means plain identity)."""

    k: int = 17
    mlp_ratio: float = 4.0
    ls: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.reparam import GRN

        c = x.shape[-1]
        md = int(c * self.mlp_ratio)
        x = x + nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=c, dtype=self.dtype, name="dw")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        p = self.k // 2
        ks, rs = _OL_DRB_TABLE[self.k]
        z = nn.Conv(c, (self.k, self.k), padding=((p, p), (p, p)),
                    feature_group_count=c, use_bias=False, dtype=self.dtype,
                    name="lk_origin")(y)
        z = _bn(self, "origin_bn", z, train)
        for kk, r in zip(ks, rs):
            pp = (r * (kk - 1) + 1) // 2
            w = nn.Conv(c, (kk, kk), padding=((pp, pp), (pp, pp)),
                        kernel_dilation=(r, r), feature_group_count=c,
                        use_bias=False, dtype=self.dtype,
                        name=f"dil_conv_k{kk}_{r}")(y)
            z = z + _bn(self, f"dil_bn_k{kk}_{r}", w, train)
        z = _bn(self, "drb_bn", z, train)
        inner = max(16, c // 8)
        s = z.mean(axis=(1, 2))
        s = jax.nn.gelu(nn.Dense(inner, dtype=self.dtype, name="se_fc0")(s),
                        approximate=False)
        s = jax.nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="se_fc1")(s))
        z = z * s[:, None, None, :]
        z = nn.Conv(md, (1, 1), dtype=self.dtype, name="fc1")(z)
        z = jax.nn.gelu(z, approximate=False)
        z = z + nn.Conv(md, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=md, dtype=self.dtype,
                        name="mlp_dw")(z)
        z = GRN(dtype=self.dtype, name="grn")(z)
        z = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(z)
        if self.ls:
            g = self.param("ls_w", nn.initializers.ones, (c,))
            b = self.param("ls_b", nn.initializers.zeros, (c,))
            return x * g + b + z
        return x + z


class OverLoCKBackbone(ConvBase):
    """Faithful OverLoCK backbone (reference OverLoCK.py:599; overlock_xt
    :838 = dims (56,112,256,336), depths (2,2,3,2), kernels (17,15,13,7),
    layer-scale on stages 3-4): 4-conv BN stem (stride 4), conv3s2-BN
    downsamples, RepConvBlock stages. The reference's shipped backbone
    forward (OverLoCK.py:785) runs ONLY these stages — its ContMix
    DynamicConvBlocks / CTXDownsample / high_level_proj are constructed
    solely so classification checkpoints load (strict=False) and are never
    executed, so they are intentionally not reproduced."""

    dims: Sequence[int] = (56, 112, 256, 336)
    depths: Sequence[int] = (2, 2, 3, 2)
    kernels: Sequence[int] = (17, 15, 13, 7)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    ls_stages: Sequence[bool] = (False, False, True, True)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c0 = self.dims[0]
        specs = [(c0 // 2, 2), (c0 // 2, 1), (c0, 2), (c0, 1)]
        for i, (cc, s) in enumerate(specs):
            x = nn.Conv(cc, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype, name=f"stem{i}")(x)
            x = _bn(self, f"stem{i}_bn", x, train)
            if i < 3:
                x = jax.nn.gelu(x, approximate=False)
        outs = []
        for si in range(4):
            if si > 0:
                x = nn.Conv(self.dims[si], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=self.dtype, name=f"down{si}")(x)
                x = _bn(self, f"down{si}_bn", x, train)
            for bi in range(self.depths[si]):
                x = OverLoCKRepBlock(k=self.kernels[si],
                                     mlp_ratio=self.mlp_ratios[si],
                                     ls=self.ls_stages[si], dtype=self.dtype,
                                     name=f"b{si}_{bi}")(x, train)
            outs.append(x)
        return outs


def _kw_resnet_plan(layers):
    """Reproduce the reference Warehouse_Manager bookkeeping for KW_ResNet
    (reference KW_ResNet.py:231/:484 — BasicBlock, sharing_range
    ('layer','conv'), all cell ratios 1, spatial_partition=True): warehouse
    names fuse to per-stage 'stage{s}_layer_conv' + per-downsample
    'stage{s-1}_ds_layer', the first block of each stage hands its conv1 over
    to the previous stage's warehouse, cells are (gcd_out, gcd_in, 1, 1) and
    the cell count is the total mixture count across member convs."""
    import math

    planes = (64, 128, 256, 512)
    wh, order = {}, []

    def reserve(name, out, cin, k):
        if name not in wh:
            wh[name] = []
            order.append(name)
        wh[name].append((out, cin, k))

    stages, inp = [], 64
    for s in range(4):
        pl, stride = planes[s], (1 if s == 0 else 2)
        ds = None
        if stride != 1 or inp != pl:
            dname = f"stage{s - 1}_ds_layer" if s > 0 else f"stage{s}_ds_layer"
            reserve(dname, pl, inp, 1)
            ds = (dname, pl, 1, stride)
        blocks = []
        for b in range(layers[s]):
            st = stride if b == 0 else 1
            c1s = s - 1 if (b == 0 and s > 0) else s
            reserve(f"stage{c1s}_layer_conv", pl, inp if b == 0 else pl, 3)
            reserve(f"stage{s}_layer_conv", pl, pl, 3)
            blocks.append(((f"stage{c1s}_layer_conv", pl, 3, st),
                           (f"stage{s}_layer_conv", pl, 3, 1)))
        stages.append((ds, blocks))
        inp = pl
    cells = {}
    for name, shapes in wh.items():
        go, gi = shapes[0][0], shapes[0][1]
        for o, i, _ in shapes:
            go, gi = math.gcd(go, o), math.gcd(gi, i)
        n = sum((o // go) * (i // gi) * k * k for o, i, k in shapes)
        cells[name] = (n, go, gi)
    return order, cells, stages


class KWResNetBackbone(ConvBase):
    """Faithful Kernel-Warehouse ResNet-18 (reference KW_ResNet.py:656
    kw_resnet18): stage-shared warehouses of (co, ci, 1, 1) kernel cells; each
    conv computes per-sample L1-normalized mixture attention (GAP -> fc ->
    LN -> ReLU -> fc, reference Attention :103) over the warehouse and
    assembles its own kernel as attention @ cells, decomposed over
    (spatial, out, in) mixture groups (KWconvNd.forward :152). The per-sample
    dynamic convolution is evaluated as patches x batched matmul — an
    MXU-shaped formulation rather than torch's groups=batch conv trick.
    Eval-time temperature is 0, so the temp_bias schedule (a training-warmup
    artifact) does not contribute."""

    layers: Sequence[int] = (2, 2, 2, 2)

    def _att(self, x, name, n_mix, cells):
        b = x.shape[0]
        hidden = max(int(x.shape[-1] * 0.0625), 16)
        s = x.mean(axis=(1, 2))
        s = nn.Dense(hidden, dtype=self.dtype, name=f"{name}_fc1")(s)
        s = jax.nn.relu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                     name=f"{name}_ln")(s))
        a = nn.Dense(n_mix * (cells + 1), dtype=self.dtype,
                     name=f"{name}_fc2")(s)
        a = a.reshape(b * n_mix, cells + 1)
        a = a / (jnp.abs(a).sum(-1, keepdims=True) + 1e-3)
        return a.reshape(b, n_mix, cells + 1)[..., :-1]

    def _kwconv(self, x, wh, name, out, k, stride):
        b, h, w_, cin = x.shape
        cells, co, ci = wh.shape
        go, gi, gs = out // co, cin // ci, k * k
        att = self._att(x, name, go * gi * gs, cells)
        wk = jnp.einsum("bmc,cd->bmd", att, wh.reshape(cells, co * ci))
        wk = wk.reshape(b, gs, go, gi, co, ci).transpose(0, 2, 4, 3, 5, 1)
        wk = wk.reshape(b, go * co, gi * ci, gs)
        if k == 1:
            return jnp.einsum("bhwc,boc->bhwo", x[:, ::stride, ::stride],
                              wk[..., 0])
        p = k // 2
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        ho = (h + 2 * p - k) // stride + 1
        wo = (w_ + 2 * p - k) // stride + 1
        pats = jnp.stack(
            [xp[:, i:i + (ho - 1) * stride + 1:stride,
                 j:j + (wo - 1) * stride + 1:stride, :]
             for i in range(k) for j in range(k)], axis=-1)
        return jnp.einsum("bhwck,bock->bhwo", pats, wk)

    @nn.compact
    def __call__(self, x, train: bool = False):
        order, cells, stages = _kw_resnet_plan(tuple(self.layers))
        whp = {name: self.param(f"wh{i}", nn.initializers.normal(1.0),
                                cells[name])
               for i, name in enumerate(order)}
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = jax.nn.relu(_bn(self, "stem_bn", x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for s, (ds, blocks) in enumerate(stages):
            for bi, (c1, c2) in enumerate(blocks):
                idn = x
                n1, out1, k1, st1 = c1
                y = self._kwconv(x, whp[n1], f"l{s}_{bi}_c1", out1, k1, st1)
                y = jax.nn.relu(_bn(self, f"l{s}_{bi}_bn1", y, train))
                n2, out2, k2, st2 = c2
                y = self._kwconv(y, whp[n2], f"l{s}_{bi}_c2", out2, k2, st2)
                y = _bn(self, f"l{s}_{bi}_bn2", y, train)
                if bi == 0 and ds is not None:
                    dn, dout, dk, dst = ds
                    idn = self._kwconv(x, whp[dn], f"l{s}_ds", dout, dk, dst)
                    idn = _bn(self, f"l{s}_ds_bn", idn, train)
                x = jax.nn.relu(idn + y)
            outs.append(x)
        return outs


class LAUDBottleneck(ConvBase):
    """LAUDNet latency-aware dynamic bottleneck (reference LAUDNet.py:218,
    dyn_mode='both', granularities 1, MLP channel masker with 1 layer — the
    uni_resnet50 defaults): a per-sample hard channel mask (GAP -> Linear ->
    keep-vs-drop logit compare) gates conv1/conv2 outputs pre-BN, and a
    per-position hard spatial mask (stride-pooled 1x1 conv, logit compare)
    gates the post-bn3 map. Eval-mode semantics (hard thresholds; the
    training-time gumbel-softmax relaxation is train=True only upstream and
    the sparsity/FLOPs accounting is stats-only). The mask grids follow the
    trace resolution, which equals the reference's behavior whenever its
    static `input_size` matches the actual input."""

    planes: int = 64
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        pl = self.planes
        s = x.mean(axis=(1, 2))
        cl = nn.Dense(2 * pl, dtype=self.dtype, name="cmask")(s)
        cmask = (cl[:, :pl] >= cl[:, pl:]).astype(x.dtype)[:, None, None, :]
        xm = x if self.stride == 1 else nn.avg_pool(
            x, (self.stride, self.stride), (self.stride, self.stride))
        sl = nn.Conv(2, (1, 1), dtype=self.dtype, name="smask")(xm)
        smask = (sl[..., :1] >= sl[..., 1:]).astype(x.dtype)

        y = nn.Conv(pl, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = jax.nn.relu(_bn(self, "bn1", y * cmask, train))
        y = nn.Conv(pl, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = jax.nn.relu(_bn(self, "bn2", y * cmask, train))
        y = nn.Conv(4 * pl, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _bn(self, "bn3", y, train) * smask
        idn = x
        if self.downsample:
            idn = nn.Conv(4 * pl, (1, 1), strides=(self.stride, self.stride),
                          use_bias=False, dtype=self.dtype, name="ds")(x)
            idn = _bn(self, "ds_bn", idn, train)
        return jax.nn.relu(idn + y)


class LAUDResNetBackbone(ConvBase):
    """Faithful LAUDNet uni_resnet50 (reference LAUDNet.py:807): ResNet-50
    bottleneck topology where every block carries the latency-aware dynamic
    channel + spatial hard masking of LAUDBottleneck."""

    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = jax.nn.relu(_bn(self, "stem_bn", x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for s, n in enumerate(self.layers):
            pl = 64 * (2 ** s)
            for b in range(n):
                stride = 2 if (s > 0 and b == 0) else 1
                ds = b == 0  # stage 1: channel projection; 2-4: strided
                x = LAUDBottleneck(planes=pl, stride=stride, downsample=ds,
                                   dtype=self.dtype, name=f"l{s}_{b}")(x, train)
            outs.append(x)
        return outs


def _repbn(mod, name, x, train):
    """SLAB RepBN (reference SlabSwinTransformer.py:21): BatchNorm1d over
    tokens per channel + alpha * x. At eval the reference's LinearNorm
    (progressive LN->RepBN re-parameterization schedule, :45) always takes
    the RepBN branch; the train-time LN mixing is a warmup curriculum whose
    step buffer we do not reproduce — training here uses RepBN batch stats
    from step 0 (documented deviation, eval-exact)."""
    y = _bn(mod, name, x, train)
    a = mod.param(f"{name}_alpha", nn.initializers.ones, (1,))
    return y + a * x


class SlabSLA(ConvBase):
    """SLAB SimplifiedLinearAttention (reference SlabSwinTransformer.py:211):
    K gets a learned per-window positional table; Q/K pass relu then elu+1
    (= relu+1 on the non-negative range); linear attention
    Q'(K'^T V) / (Q'.sum K') with a head-shared 5x5 depthwise conv on V
    added before the output projection."""

    num_heads: int = 3
    ws: int = 7

    @nn.compact
    def __call__(self, x):
        bw, n, c = x.shape
        h, d = self.num_heads, c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        pe = self.param("pos", nn.initializers.truncated_normal(
            0.02, lower=-2.0, upper=2.0), (1, n, c))
        q = jax.nn.relu(q) + 1.0
        k = jax.nn.relu(k + pe) + 1.0

        def heads(t):
            return t.reshape(bw, n, h, d).transpose(0, 2, 1, 3).reshape(
                bw * h, n, d)

        q, k, v = heads(q), heads(k), heads(v)
        kv = jnp.einsum("bnd,bnm->bdm", k, v)
        y = jnp.einsum("bnd,bdm->bnm", q, kv)
        den = jnp.einsum("bnd,bd->bn", q, k.sum(1))[..., None]
        y = y / (den + 1e-6)
        vd = nn.Conv(d, (5, 5), padding=((2, 2), (2, 2)), feature_group_count=d,
                     dtype=self.dtype,
                     name="dwc")(v.reshape(bw * h, self.ws, self.ws, d))
        y = y + vd.reshape(bw * h, n, d)
        y = y.reshape(bw, h, n, d).transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(y)


class SlabWindowAttention(ConvBase):
    """Standard Swin window MHSA with relative position bias (reference
    SlabSwinTransformer.py:133) — the 'S' stages of SLAB-Swin."""

    num_heads: int = 12
    ws: int = 7

    @nn.compact
    def __call__(self, x):
        import numpy as np

        bw, n, c = x.shape
        h, d = self.num_heads, c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * d ** -0.5, qkv[1], qkv[2]
        table = self.param("rpb", nn.initializers.truncated_normal(
            0.02, lower=-2.0, upper=2.0), ((2 * self.ws - 1) ** 2, h))
        co = np.stack(np.meshgrid(np.arange(self.ws), np.arange(self.ws),
                                  indexing="ij")).reshape(2, -1)
        rel = co[:, :, None] - co[:, None, :]
        idx = (rel[0] + self.ws - 1) * (2 * self.ws - 1) + rel[1] + self.ws - 1
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, h)
        a = q @ k.transpose(0, 1, 3, 2) + bias.transpose(2, 0, 1)[None]
        a = jax.nn.softmax(a, -1)
        y = (a @ v).transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(y)


class SlabSwinBackbone(ConvBase):
    """Faithful SLAB Swin-T (reference SlabSwinTransformer.py:716;
    SlabSwinTransformer_T :1001 = embed 96, depths (2,2,6,2), heads
    (3,6,12,24), window_size 56, attn 'LLSS', norm = LinearNorm(LN, RepBN)):
    conv4s4 patch embed + RepBN, stages of pre-RepBN blocks — simplified
    linear attention in stages 1-2, windowed MHSA w/ relative bias in stages
    3-4 — plain 2-layer GELU MLPs, quadrant PatchMerging with RepBN, RepBN'd
    stage outputs. With the reference's construction (img_size-derived stage
    grids <= 56) every block clamps its window to the stage grid and zeroes
    its shift, so windows are whole-stage and shifts/masks never engage;
    mismatched runtime sizes zero-pad up to the fixed window grid exactly as
    upstream. Eval norms are pure RepBN (LinearNorm's eval branch)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    base_ws: int = 56
    attn_types: str = "LLSS"
    img_size: int = 224
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="pe")(x)
        _, hh, ww, _ = x.shape
        t = _repbn(self, "pe_norm", x.reshape(b, hh * ww, self.embed_dim),
                   train)
        outs = []
        for si in range(4):
            c = self.embed_dim * (2 ** si)
            init_res = self.img_size // 4 // (2 ** si)
            ws = min(init_res, self.base_ws)
            for bi in range(self.depths[si]):
                pre = f"s{si}_b{bi}"
                y = _repbn(self, f"{pre}_norm1", t, train)
                ph, pw = (-hh) % ws, (-ww) % ws
                hp, wp = hh + ph, ww + pw
                yg = jnp.pad(y.reshape(b, hh, ww, c),
                             ((0, 0), (0, ph), (0, pw), (0, 0)))
                yg = yg.reshape(b, hp // ws, ws, wp // ws, ws, c)
                yw = yg.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
                if self.attn_types[si] == "L":
                    yw = SlabSLA(num_heads=self.num_heads[si], ws=ws,
                                 dtype=self.dtype, name=f"{pre}_attn")(yw)
                else:
                    yw = SlabWindowAttention(num_heads=self.num_heads[si],
                                             ws=ws, dtype=self.dtype,
                                             name=f"{pre}_attn")(yw)
                yw = yw.reshape(b, hp // ws, wp // ws, ws, ws, c)
                yg = yw.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
                y = yg[:, :hh, :ww].reshape(b, hh * ww, c)
                t = t + y
                y = _repbn(self, f"{pre}_norm2", t, train)
                y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                             name=f"{pre}_fc1")(y)
                y = nn.Dense(c, dtype=self.dtype, name=f"{pre}_fc2")(
                    jax.nn.gelu(y, approximate=False))
                t = t + y
            o = _repbn(self, f"norm_out{si}", t, train)
            outs.append(o.reshape(b, hh, ww, c))
            if si < 3:
                g = t.reshape(b, hh, ww, c)
                if hh % 2 or ww % 2:
                    g = jnp.pad(g, ((0, 0), (0, hh % 2), (0, ww % 2), (0, 0)))
                g = jnp.concatenate([g[:, 0::2, 0::2], g[:, 1::2, 0::2],
                                     g[:, 0::2, 1::2], g[:, 1::2, 1::2]], -1)
                hh, ww = g.shape[1], g.shape[2]
                g = g.reshape(b, hh * ww, 4 * c)
                g = _repbn(self, f"pm{si}_norm", g, train)
                t = nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                             name=f"pm{si}_red")(g)
        return outs


def _lin_interp_matrix(n_src, n_dst):
    """torch F.interpolate(mode='linear', align_corners=False) as an
    (n_dst, n_src) matrix: src coord = (i+0.5)*n_src/n_dst - 0.5, clamped."""
    import numpy as np

    M = np.zeros((n_dst, n_src), np.float32)
    scale = n_src / n_dst
    for i in range(n_dst):
        cc = (i + 0.5) * scale - 0.5
        c0 = int(np.floor(cc))
        w1 = cc - c0
        M[i, min(max(c0, 0), n_src - 1)] += 1.0 - w1
        M[i, min(max(c0 + 1, 0), n_src - 1)] += w1
    return M


class SlabPVTSLA(ConvBase):
    """SLAB-PVTv2 SimplifiedLinearAttention (reference SlabPVTv2.py:251,
    linear=False path): q from full tokens, k/v from an sr-strided conv
    (NOTE: the reference's post-sr norm is dead code — its isinstance
    check tests nn.LayerNorm but the module is a LinearNorm, so no norm is
    applied; reproduced by omission), K + learned positional table, relu
    kernel, linear attention Q(K^T V)/(Q.sum K), head-shared 5x5 depthwise
    conv on V (1-D linearly interpolated back to the query length when
    sr > 1), and the reference's RAW (B*h,N,d)->(B,N,C) head merge (a
    block-reshape, not an interleave — faithfully replicated)."""

    num_heads: int = 1
    sr: int = 8

    @nn.compact
    def __call__(self, x, h, w, train: bool = False):
        b, n, c = x.shape
        nh, hd = self.num_heads, c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q")(x)
        if self.sr > 1:
            xk = nn.Conv(c, (self.sr, self.sr), strides=(self.sr, self.sr),
                         dtype=self.dtype, name="sr")(x.reshape(b, h, w, c))
            hk, wk = xk.shape[1], xk.shape[2]
            xk = xk.reshape(b, hk * wk, c)
        else:
            xk = x
        nk = xk.shape[1]
        kv = nn.Dense(2 * c, dtype=self.dtype, name="kv")(xk)
        k, v = kv[..., :c], kv[..., c:]
        pe = self.param("pos", nn.initializers.truncated_normal(
            0.02, lower=-2.0, upper=2.0), (1, nk, c))
        q = jax.nn.relu(q)
        k = jax.nn.relu(k + pe)

        def heads(t, m):
            return t.reshape(b, m, nh, hd).transpose(0, 2, 1, 3).reshape(
                b * nh, m, hd)

        q, k, v = heads(q, n), heads(k, nk), heads(v, nk)
        ctx = jnp.einsum("bmd,bme->bde", k, v)
        y = jnp.einsum("bnd,bde->bne", q, ctx)
        den = jnp.einsum("bnd,bd->bn", q, k.sum(1))[..., None]
        y = y / (den + 1e-6)
        vq = v if nk == n else jnp.einsum(
            "nm,bmd->bnd", jnp.asarray(_lin_interp_matrix(nk, n)), v)
        vd = nn.Conv(hd, (5, 5), padding=((2, 2), (2, 2)),
                     feature_group_count=hd, dtype=self.dtype,
                     name="dwc")(vq.reshape(b * nh, h, w, hd))
        y = (y + vd.reshape(b * nh, n, hd)).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(y)


class SlabPVTBackbone(ConvBase):
    """Faithful SLAB PVTv2-b0 (reference SlabPVTv2.py:546 arch 'b0' = dims
    (32,64,160,256), heads (1,2,5,8), mlp (8,8,4,4), depths (2,2,2,2),
    la_sr (8,4,2,1), attn 'LLLL'): overlapped patch embeds (7s4 / 3s2) +
    RepBN, pre-RepBN blocks of SlabPVTSLA attention and PVT dwconv MLPs
    (fc1 -> dw3 -> GELU -> fc2), RepBN'd stage outputs. Eval norms are the
    RepBN branch of LinearNorm (see _repbn)."""

    dims: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        outs = []
        for si in range(4):
            c = self.dims[si]
            k, s = (7, 4) if si == 0 else (3, 2)
            p = k // 2
            x = nn.Conv(c, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                        dtype=self.dtype, name=f"pe{si}")(x)
            _, hh, ww, _ = x.shape
            t = _repbn(self, f"pe{si}_norm", x.reshape(b, hh * ww, c), train)
            for bi in range(self.depths[si]):
                pre = f"s{si}_b{bi}"
                y = _repbn(self, f"{pre}_norm1", t, train)
                t = t + SlabPVTSLA(num_heads=self.num_heads[si],
                                   sr=self.sr_ratios[si], dtype=self.dtype,
                                   name=f"{pre}_attn")(y, hh, ww, train)
                y = _repbn(self, f"{pre}_norm2", t, train)
                hid = int(c * self.mlp_ratios[si])
                y = nn.Dense(hid, dtype=self.dtype, name=f"{pre}_fc1")(y)
                y = nn.Conv(hid, (3, 3), padding=((1, 1), (1, 1)),
                            feature_group_count=hid, dtype=self.dtype,
                            name=f"{pre}_dw")(y.reshape(b, hh, ww, hid))
                y = jax.nn.gelu(y.reshape(b, hh * ww, hid), approximate=False)
                t = t + nn.Dense(c, dtype=self.dtype, name=f"{pre}_fc2")(y)
            t = _repbn(self, f"norm_out{si}", t, train)
            x = t.reshape(b, hh, ww, c)
            outs.append(x)
        return outs


class MoEResNetBackbone(ConvBase):
    """ResNet with per-sample hard expert routing — faithful to the reference
    (ResNet_MoE.py:165 ResNet + :48 MoEConv): the plain conv7 stem feeds a
    SimpleRouter (avg-pool + Linear -> n_expert scores); every conv inside
    the residual blocks is a MoEConv — one conv producing c2*E channels from
    which the argmax expert's slice is selected per sample via a
    straight-through one-hot (GetMask.backward passes the one-hot gradient
    to the scores) and summed. Returns the 4 stage maps."""

    depths: Sequence[int] = (2, 2, 2, 2)
    n_expert: int = 5  # reference factory default when use_moe (ResNet_MoE.py:377)

    def _moe_conv(self, x, c2, k, s, name, gate):
        p = k // 2
        y = nn.Conv(c2 * self.n_expert, (k, k), strides=(s, s),
                    padding=((p, p), (p, p)), use_bias=False, dtype=self.dtype,
                    name=name, parent=self)(x)
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, self.n_expert, c2) * gate[:, None, None, :, None]
        return y.sum(3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # plain stem: conv7 s2 + BN + relu + maxpool3 s2 (reference :196-200)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = jax.nn.relu(_bn(self, "bn1", x, train))
        x = nn.max_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                constant_values=-jnp.inf), (3, 3), strides=(2, 2))
        # router on the pooled stem features (reference forward :308-320)
        scores = nn.Dense(self.n_expert, dtype=self.dtype,
                          name="router")(x.mean(axis=(1, 2)))
        oh = jax.nn.one_hot(jnp.argmax(scores, -1), self.n_expert, dtype=x.dtype)
        gate = oh + scores.astype(x.dtype) - jax.lax.stop_gradient(scores.astype(x.dtype))

        outs = []
        for si, (c, n0) in enumerate(zip((64, 128, 256, 512), self.depths)):
            for bi in range(n0):
                s = 2 if (si > 0 and bi == 0) else 1
                idn = x
                y = self._moe_conv(x, c, 3, s, f"l{si}_b{bi}_conv1", gate)
                y = jax.nn.relu(_bn(self, f"l{si}_b{bi}_bn1", y, train))
                y = self._moe_conv(y, c, 3, 1, f"l{si}_b{bi}_conv2", gate)
                y = _bn(self, f"l{si}_b{bi}_bn2", y, train)
                if s != 1 or idn.shape[-1] != c:
                    idn = self._moe_conv(idn, c, 1, s, f"l{si}_b{bi}_down", gate)
                    idn = _bn(self, f"l{si}_b{bi}_down_bn", idn, train)
                x = jax.nn.relu(y + idn)
            outs.append(x)
        return outs


def _register_alias_variants():
    from ultralytics_pro_tpu.nn.modules.backbones import (
        BACKBONE_VARIANTS as B1,
    )
    from ultralytics_pro_tpu.nn.modules.backbones2 import (
        BACKBONE_VARIANTS2 as B2,
        MobileNetV4,
    )
    from ultralytics_pro_tpu.nn.modules.backbones3 import (
        BACKBONE_VARIANTS3 as B3,
        UniRepLKNet,
        WTConvNeXt,
    )

    BACKBONE_VARIANTS4.update({
        "wtconvnext_small": (WTConvNeXt, tuple(dict(
            dims=(96, 192, 384, 768), depths=(3, 3, 27, 3)).items())),
        "RepLKNet31B": (RepLKNetBackbone, ()),
        # vHeat (reference vHeat.py:383 vheat_tiny) — faithful Heat2D operator
        "vheat_tiny": (VHeatBackbone, ()),
        # SPANet (reference SPANet.py:536 spanet_s) — faithful SPAM FFT mixer
        "spanet_s": (SPANetBackbone, ()),
        # SMT (reference SMT.py smt_l) — faithful scale-aware modulation
        "smt_l": (SMTBackbone, ()),
        # COSNet (reference COSNet.py:9 cosnet_tiny) — faithful MCFS mixer
        "cosnet_tiny": (COSNetBackbone, ()),
        # DecoupleNet (reference DecoupleNet.py:26 decouplenet_d2)
        "decouplenet_d2": (DecoupleNetBackbone, ()),
        # UniNeXt (reference UniNeXt.py:476 uninext_t)
        "uninext_t": (UniNeXtBackbone, ()),
        # iFormer (reference iFormer.py:530 iformer_small)
        "iformer_small": (IFormerBackbone, ()),
        # EViT (reference EViT.py:330 EViT_Tiny)
        "EViT_Tiny": (EViTBackbone, ()),
        # STViT (reference STViT.py:413 stvit_small)
        "stvit_small": (STViTBackbone, ()),
        # TransXNet (reference TransXNet.py:521 transxnet_tiny)
        "transxnet_tiny": (TransXNetBackbone, ()),
        # GLNet (reference GLNet.py:745 glnet_4g)
        "glnet_4g": (GLNetBackbone, ()),
        # GroupMixFormer (reference GroupMixFormer.py:101 Tiny)
        "GroupMixFormerTiny": (GroupMixFormerBackbone, ()),
        # LWGANet (reference LWGANet.py:643 L2_1442_e96_k11_ReLU)
        "LWGANet_L2_1442_e96_k11_ReLU": (LWGANetBackbone, ()),
        # PKINet (reference PKINet.py:951 pkinet_t, arch 'T')
        "pkinet_t": (PKINetBackbone, ()),
        # TransNeXt (reference TransNeXt.py:462 transnext_micro)
        "transnext_micro": (TransNeXtBackbone, ()),
        # SGFormer (reference SGFormer.py:659 sgformer_s, arch 's')
        "sgformer_s": (SGFormerBackbone, ()),
        # OverLoCK (reference OverLoCK.py:838 overlock_xt)
        "overlock_xt": (OverLoCKBackbone, ()),
        # EMOv2 (reference EMOv2.py:771/:833)
        "EMO2_1M_k5_hybrid": (EMO2Backbone, ()),
        "EMO2_5M_k5_hybrid": (EMO2Backbone, tuple(dict(
            dims=(48, 72, 160, 288), depths=(3, 3, 9, 3),
            exp_ratios=(2.0, 3.0, 4.0, 4.0),
            dim_heads=(16, 24, 32, 32)).items())),
        "MobileNetV4HybridMedium": (MobileNetV4, tuple(dict(
            dims=(48, 80, 160, 256), depths=(2, 2, 8, 4)).items())),
        "MobileNetV4ConvMedium": (MobileNetV4, tuple(dict(
            dims=(48, 80, 160, 256), depths=(2, 2, 8, 4)).items())),
        "QARepVGG_A0": (RepVGGBackbone, ()),
        # Kernel-Warehouse ResNet (reference KW_ResNet.py:656 kw_resnet18)
        "kw_resnet18": (KWResNetBackbone, ()),
        "resnet18_moe": (MoEResNetBackbone, ()),
        # LAUDNet dynamic-masked ResNet-50 (reference LAUDNet.py:807)
        "uni_resnet50": (LAUDResNetBackbone, ()),
        # Slab variants: linear-attention re-params of Swin/PVT — served by
        # the base architectures (approximation, COVERAGE.md)
        # SLAB Swin-T (reference SlabSwinTransformer.py:1001)
        "SlabSwinTransformer_T": (SlabSwinBackbone, ()),
        # SLAB PVTv2-b0 (reference SlabPVTv2.py:807)
        "slab_pvt_v2_b0": (SlabPVTBackbone, ()),
    })


_register_alias_variants()
