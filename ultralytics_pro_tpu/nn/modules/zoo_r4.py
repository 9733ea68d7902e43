"""Round-4 sub-block closure: the reference exports every helper block from
ultralytics.nn.modules, and parse_model resolves ANY exported name via
globals()[m] (reference nn/tasks.py:2836-2842) — so each name below is
YAML-reachable upstream and must build here. This file implements the small
modules that had no equivalent yet; register_r4_builders() wires them (and
aliases onto existing implementations) into the BUILDERS registry.

Reference files are cited per class/entry. Entries marked "approx" are
declared structural approximations recorded in COVERAGE.md.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase, DWConv


class ChannelLN(ConvBase):
    """Channel-last LayerNorm. Serves the reference's channel-first LN
    wrappers (HorLayerNorm HorNet.py, LayerNormProxy DAttention, LayerNorm_s
    conv.py, LayerNorm2d transformer.py) — in NHWC they are all one LN."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.LayerNorm(dtype=self.dtype)(x)


class DropPathLayer(ConvBase):
    """Inference-identity DropPath (reference conv.py DropPath): stochastic
    depth is a train-time regularizer; as a YAML layer it is a passthrough."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


class ZPool(ConvBase):
    """cat(max, mean) over channels (reference block.py ZPool / triplet
    attention)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return jnp.concatenate([x.max(-1, keepdims=True),
                                x.mean(-1, keepdims=True)], -1)


class PConvLayer(ConvBase):
    """Standalone partial convolution (reference block.py PConv /
    FasterNet): conv over the first 1/n_div channels, rest pass through."""

    c2: int = 0
    n_div: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        cp = max(c // self.n_div, 1)
        y = nn.Conv(cp, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="pconv")(x[..., :cp])
        return jnp.concatenate([y, x[..., cp:]], -1)


class AttentionGate(ConvBase):
    """Additive attention gate (reference block.py AttentionGate,
    attention-UNet form collapsed to one input): x * sigmoid(psi(relu(W x)))."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        g = nn.Conv(max(c // 2, 1), (1, 1), dtype=self.dtype, name="w")(x)
        g = nn.Conv(1, (1, 1), dtype=self.dtype, name="psi")(jax.nn.relu(g))
        return x * jax.nn.sigmoid(g)


class BasicRFB(ConvBase):
    """Receptive-field block (reference block.py BasicRFB): three dilated
    branches + linear fuse + shortcut."""

    c2: int = 0
    s: int = 1
    scale: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2 = self.c2 or x.shape[-1]
        cp = max(c2 // 8, 1)
        outs = []
        for i, (k, d) in enumerate(((3, 1), (3, 2), (3, 3))):
            y = Conv(c2=cp * 2, k=1, s=1, dtype=self.dtype, name=f"b{i}_1")(x, train)
            y = Conv(c2=cp * 2, k=k, s=self.s, dtype=self.dtype, name=f"b{i}_2")(y, train)
            y = nn.Conv(cp * 2, (3, 3), padding="SAME", kernel_dilation=(d, d),
                        use_bias=False, dtype=self.dtype, name=f"b{i}_3")(y)
            outs.append(y)
        y = nn.Conv(c2, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fuse")(jnp.concatenate(outs, -1))
        sc = Conv(c2=c2, k=1, s=self.s, act=False, dtype=self.dtype,
                  name="short")(x, train)
        return jax.nn.relu(y * self.scale + sc)


class MSCAM(ConvBase):
    """Multi-scale channel attention (reference MSCAM.py / AFF paper): local
    (pointwise) + global (GAP) channel branches, sigmoid-fused. v2/v4/v5
    differ in branch depth — served by the same structure (approx)."""

    c2: int = 0
    r: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        ci = max(c // self.r, 1)
        loc = nn.Conv(ci, (1, 1), dtype=self.dtype, name="l1")(x)
        loc = nn.Conv(c, (1, 1), dtype=self.dtype, name="l2")(jax.nn.relu(loc))
        g = x.mean((1, 2), keepdims=True)
        g = nn.Conv(ci, (1, 1), dtype=self.dtype, name="g1")(g)
        g = nn.Conv(c, (1, 1), dtype=self.dtype, name="g2")(jax.nn.relu(g))
        return x * jax.nn.sigmoid(loc + g)


class EMCADBlock(ConvBase):
    """EMCAD multi-scale conv attention decoder block (reference MSCAM.py
    EMCAD_block): channel attention + multi-kernel depthwise convs."""

    c2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2 = self.c2 or x.shape[-1]
        x = Conv(c2=c2, k=1, dtype=self.dtype, name="proj")(x, train)
        x = MSCAM(dtype=self.dtype, name="cam")(x, train)
        y = sum(nn.Conv(c2, (k, k), padding="SAME", feature_group_count=c2,
                        dtype=self.dtype, name=f"dw{k}")(x) for k in (1, 3, 5))
        return x + jax.nn.relu6(y)


class SDFM(ConvBase):
    """Superficial detail fusion module (reference block.py SDFM, two-input
    YAML row): per-input 1x1 squeeze, gated cross-fusion, 1x1 out."""

    c2: int = 0

    @nn.compact
    def __call__(self, xs, train: bool = False):
        if not isinstance(xs, (list, tuple)):
            xs = [xs, xs]
        a, b = xs[0], xs[1]
        c2 = self.c2 or a.shape[-1]
        a = Conv(c2=c2, k=1, dtype=self.dtype, name="pa")(a, train)
        b = Conv(c2=c2, k=1, dtype=self.dtype, name="pb")(b, train)
        g = jax.nn.sigmoid(nn.Conv(c2, (1, 1), dtype=self.dtype,
                                   name="gate")(a + b))
        return Conv(c2=c2, k=1, dtype=self.dtype, name="out")(
            a * g + b * (1 - g), train)


class ConcatAttn(ConvBase):
    """Concat + lightweight channel attention (reference HVI_CIDNet.py
    LCA_Concat / LCA_DynamicTanh_Concat, two-input YAML rows; approx)."""

    c2: int = 0

    @nn.compact
    def __call__(self, xs, train: bool = False):
        if isinstance(xs, (list, tuple)):
            xs = jnp.concatenate(xs, -1)
        c2 = self.c2 or xs.shape[-1]
        y = Conv(c2=c2, k=1, dtype=self.dtype, name="fuse")(xs, train)
        return MSCAM(dtype=self.dtype, name="lca")(y, train)


class MultiDilateLocalAttention(ConvBase):
    """Multi-dilate local attention (reference MSDA.py
    MultiDilatelocalAttention): per-head-group depthwise convs at dilations
    1/2/3 gate the value path (sliding-window attention approx)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        c3 = max(c // 3, 1)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(x)
        outs = []
        for i, d in enumerate((1, 2, 3)):
            lo, hi = i * c3, (i + 1) * c3 if i < 2 else c
            cw = hi - lo
            a = nn.Conv(cw, (3, 3), padding="SAME", kernel_dilation=(d, d),
                        feature_group_count=cw, dtype=self.dtype,
                        name=f"dw{d}")(x[..., lo:hi])
            outs.append(jax.nn.softmax(a, axis=-1) * v[..., lo:hi])
        return nn.Conv(c, (1, 1), dtype=self.dtype,
                       name="proj")(jnp.concatenate(outs, -1))


class MLPBlock(ConvBase):
    """fc -> act -> fc (reference transformer.py MLPBlock)."""

    c2: int = 0
    mlp_dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        h = self.mlp_dim or c * 4
        y = nn.Dense(h, dtype=self.dtype, name="lin1")(x)
        return nn.Dense(self.c2 or c, dtype=self.dtype,
                        name="lin2")(jax.nn.gelu(y))


class TransformerLayer(ConvBase):
    """Single MHSA + 2-linear layer, LN-free (reference transformer.py
    TransformerLayer)."""

    c2: int = 0
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        t = t + nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=c, dtype=self.dtype,
            name="ma")(t, t)
        t = t + nn.Dense(c, dtype=self.dtype, name="fc2")(
            nn.Dense(c, dtype=self.dtype, name="fc1")(t))
        return t.reshape(b, h, w, c)


class TransformerBlock(ConvBase):
    """Optional channel-matching conv + learned 2D pos embed + n
    TransformerLayers (reference transformer.py TransformerBlock)."""

    c2: int = 0
    num_heads: int = 4
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2 = self.c2 or x.shape[-1]
        if x.shape[-1] != c2:
            x = Conv(c2=c2, k=1, dtype=self.dtype, name="conv")(x, train)
        b, h, w, _ = x.shape
        pos = self.param("pos", nn.initializers.normal(0.02), (1, h, w, c2))
        x = x + pos.astype(x.dtype)
        for i in range(self.n):
            x = TransformerLayer(c2=c2, num_heads=self.num_heads,
                                 dtype=self.dtype, name=f"tr{i}")(x, train)
        return x


class ConvDyT(ConvBase):
    """Conv + BN replaced by DynamicTanh activation (reference conv.py
    Conv_DynamicTanh): y = w2 * tanh(a * conv(x)) + b."""

    c2: int = 0
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        a = self.param("alpha", nn.initializers.constant(0.5), (1,))
        w = self.param("weight", nn.initializers.ones, (self.c2,))
        b = self.param("bias", nn.initializers.zeros, (self.c2,))
        return jax.nn.silu(jnp.tanh(a.astype(y.dtype) * y) * w.astype(y.dtype)
                           + b.astype(y.dtype))


class KANConv2d(ConvBase):
    """Parametric KAN convolution family (reference kan_convs/*.py). The
    learnable per-edge activation is a basis expansion feeding one conv:
    basis='rbf' (FastKAN/FasterKAN/RBFKAN — gaussian RBFs), 'cheby'
    (Cheby/Gram/Jacobi — Chebyshev polynomials of tanh(x)), 'relu'
    (ReLUKAN — shifted relu^2), 'wav' (WavKAN — Mexican-hat wavelets).
    The plain spline KANConv2d rides 'rbf' (a spline-basis stand-in,
    declared approx)."""

    c2: int = 0
    k: int = 3
    s: int = 1
    basis: str = "rbf"
    grid: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.grid
        if self.basis == "cheby":
            t = jnp.tanh(x)
            feats = [jnp.ones_like(t), t]
            for _ in range(g - 2):
                feats.append(2 * t * feats[-1] - feats[-2])
            phi = jnp.concatenate(feats, -1)
        elif self.basis == "relu":
            knots = jnp.linspace(-2.0, 2.0, g)
            phi = jnp.concatenate(
                [jnp.square(jax.nn.relu(x - kk)) for kk in knots], -1)
        elif self.basis == "wav":
            scales = jnp.linspace(0.5, 2.0, g)
            phi = jnp.concatenate(
                [(1 - (x / s_) ** 2) * jnp.exp(-0.5 * (x / s_) ** 2)
                 for s_ in scales], -1)
        else:  # rbf
            centers = jnp.linspace(-2.0, 2.0, g)
            h = 4.0 / (g - 1)
            phi = jnp.concatenate(
                [jnp.exp(-((x - cc) / h) ** 2) for cc in centers], -1)
        p = self.k // 2
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, name="spline_conv")(phi.astype(x.dtype))
        base = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                       padding=((p, p), (p, p)), dtype=self.dtype,
                       name="base_conv")(jax.nn.silu(x))
        return y + base


class GridDeformAttn(ConvBase):
    """Single-input adapter over transformer.MSDeformAttn so the name is
    usable as a YAML graph row (the reference exports MSDeformAttn from
    nn.modules, making it YAML-reachable via globals()[m]). As a plain layer
    it runs deformable SELF-attention on one feature map: queries are the
    map's own tokens, reference boxes a uniform grid, value the map itself —
    the Deformable-DETR encoder form (reference transformer.py:438)."""

    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.transformer import MSDeformAttn

        if isinstance(x, (list, tuple)):
            x = x[0]
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gx, gy = jnp.meshgrid(xs, ys)
        ref = jnp.stack([gx.reshape(-1), gy.reshape(-1),
                         jnp.full((h * w,), 1.0 / w),
                         jnp.full((h * w,), 1.0 / h)], -1)
        ref = jnp.broadcast_to(ref[None], (b, h * w, 4)).astype(x.dtype)
        nh = self.n_heads if c % self.n_heads == 0 else 1
        y = MSDeformAttn(d_model=c, n_levels=1, n_heads=nh,
                         n_points=self.n_points, dtype=self.dtype,
                         name="msda")(tokens, ref, [tokens], [(h, w)], train)
        return (tokens + y).reshape(b, h, w, c)


class GridDeformDecoderLayer(ConvBase):
    """Single-input adapter over transformer.DeformableTransformerDecoderLayer
    (reference transformer.py:561) for plain YAML rows: the map's tokens act
    as both the query embeddings and the (single-level) value, with a uniform
    grid of reference boxes. Stacks `n` layers when used via the builder."""

    n_heads: int = 8
    n_points: int = 4
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.transformer import (
            DeformableTransformerDecoderLayer)

        if isinstance(x, (list, tuple)):
            x = x[0]
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gx, gy = jnp.meshgrid(xs, ys)
        ref = jnp.stack([gx.reshape(-1), gy.reshape(-1),
                         jnp.full((h * w,), 1.0 / w),
                         jnp.full((h * w,), 1.0 / h)], -1)
        ref = jnp.broadcast_to(ref[None], (b, h * w, 4)).astype(x.dtype)
        nh = self.n_heads if c % self.n_heads == 0 else 1
        emb = tokens
        for i in range(self.n):
            emb = DeformableTransformerDecoderLayer(
                d_model=c, n_heads=nh, d_ffn=max(c * 4, 256), n_levels=1,
                n_points=self.n_points, dtype=self.dtype,
                name=f"layer{i}")(emb, ref, [tokens], [(h, w)], train=train)
        return emb.reshape(b, h, w, c)


class ContrastiveAdapter(ConvBase):
    """Two-input adapter for world.ContrastiveHead / BNContrastiveHead as a
    YAML graph row (reference block.py:1036/1062): expects from=[features,
    text-embeddings]. Raises a clear error — instead of an opaque positional
    TypeError — when wired with a single input."""

    embed_dims: int = 512
    use_bn: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from ultralytics_pro_tpu.nn.modules import world

        if not (isinstance(xs, (list, tuple)) and len(xs) == 2):
            raise ValueError(
                "ContrastiveHead/BNContrastiveHead need two YAML inputs "
                "[image features, text embeddings], e.g. from: [-1, 12]; "
                f"got {type(xs).__name__}"
                + (f" of {len(xs)}" if isinstance(xs, (list, tuple)) else ""))
        x, w = xs
        if w.ndim == 2:
            w = w[None]
        cls = world.BNContrastiveHead if self.use_bn else world.ContrastiveHead
        kw = {"embed_dims": self.embed_dims} if self.use_bn else {}
        return cls(dtype=self.dtype, name="head", **kw)(x, w, train=train)


class VGGBackbone(ConvBase):
    """Plain VGG stage stack (reference VGG_backbone.py VGG11/13/16/19):
    conv3-BN-ReLU xN per stage, maxpool downsample; emits 4 maps."""

    depths: Sequence[int] = (1, 2, 2, 2)
    dims: Sequence[int] = (128, 256, 512, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(c2=64, k=3, s=2, dtype=self.dtype, name="stem")(x, train)
        outs = []
        for si in range(4):
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for bi in range(self.depths[si]):
                x = Conv(c2=self.dims[si], k=3, dtype=self.dtype,
                         name=f"s{si}_b{bi}")(x, train)
            outs.append(x)
        return outs


VGG_DEPTHS = {"VGG11": (1, 2, 2, 2), "VGG13": (2, 2, 2, 2),
              "VGG16": (2, 3, 3, 3), "VGG19": (2, 4, 4, 4)}


def register_r4_builders(BUILDERS, _sc, _kw, _a):
    """Wire the round-4 closure names into the registry. Aliases map
    reference spellings onto this repo's existing implementations; new
    modules above get standard channel-scaled builders."""

    def _get(mod, cls):
        import importlib

        return getattr(importlib.import_module(
            f"ultralytics_pro_tpu.nn.modules.{mod}"), cls)

    def c2_of(mod, cls, **fixed):
        def build(a, n, w, d, mx, ctx):
            return _get(mod, cls), _kw(c2=_sc(a[0], w, mx), **fixed)
        return build

    def plain(mod, cls, **fixed):
        def build(a, n, w, d, mx, ctx):
            return _get(mod, cls), _kw(**fixed)
        return build

    def alias(name, target):
        if target in BUILDERS:
            BUILDERS.setdefault(name, BUILDERS[target])
        return target in BUILDERS

    H = "zoo_r4"
    new = {
        # ---- channel-first LN wrappers (one NHWC LN here)
        "HorLayerNorm": plain(H, "ChannelLN"),
        "LayerNormProxy": plain(H, "ChannelLN"),
        "LayerNorm_s": plain(H, "ChannelLN"),
        "LayerNorm2d": plain(H, "ChannelLN"),
        "DropPath": plain(H, "DropPathLayer"),
        "ZPool": plain(H, "ZPool"),
        "PConv": c2_of(H, "PConvLayer"),
        "AttentionGate": c2_of(H, "AttentionGate"),
        "BasicRFB": lambda a, n, w, d, mx, ctx: (
            _get(H, "BasicRFB"), _kw(c2=_sc(a[0], w, mx), s=_a(a, 1, 1))),
        "MSCAM": plain(H, "MSCAM"),
        "MSCAMv2": plain(H, "MSCAM"),
        "MSCAMv4": plain(H, "MSCAM"),
        "MSCAMv5": plain(H, "MSCAM"),
        "EMCAD_block": c2_of(H, "EMCADBlock"),
        "SDFM": c2_of(H, "SDFM"),
        "LCA_Concat": c2_of(H, "ConcatAttn"),
        "LCA_DynamicTanh_Concat": c2_of(H, "ConcatAttn"),
        "MultiDilatelocalAttention": plain(H, "MultiDilateLocalAttention"),
        "MLPBlock": c2_of(H, "MLPBlock"),
        "TransformerLayer": lambda a, n, w, d, mx, ctx: (
            _get(H, "TransformerLayer"),
            _kw(c2=_sc(a[0], w, mx),
                num_heads=_heads(_sc(a[0], w, mx), _a(a, 1, 4)))),
        "TransformerBlock": lambda a, n, w, d, mx, ctx: (
            _get(H, "TransformerBlock"),
            _kw(c2=_sc(a[0], w, mx),
                num_heads=_heads(_sc(a[0], w, mx), _a(a, 1, 4)), n=n)),
        "Conv_DynamicTanh": lambda a, n, w, d, mx, ctx: (
            _get(H, "ConvDyT"), _kw(c2=_sc(a[0], w, mx), k=_a(a, 1, 1),
                                    s=_a(a, 2, 1))),
        # ---- transformer module re-exports
        "MLP": lambda a, n, w, d, mx, ctx: (
            _get(H, "MLPBlock"), _kw(c2=_sc(a[0], w, mx))),
        # MSDeformAttn & the deformable decoder classes take (query,
        # refer_bbox, value_list, shapes) positionally — as plain YAML rows
        # they ride grid-reference self-attention adapters instead of
        # crashing with a positional TypeError at forward.
        "MSDeformAttn": plain(H, "GridDeformAttn"),
        "TransformerEncoderLayer": lambda a, n, w, d, mx, ctx: (
            _get("transformer", "AIFI"), _kw(cm=_a(a, 1, 1024),
                                             num_heads=_a(a, 2, 8))),
        "DeformableTransformerDecoderLayer": plain(H, "GridDeformDecoderLayer"),
        "DeformableTransformerDecoder": lambda a, n, w, d, mx, ctx: (
            _get(H, "GridDeformDecoderLayer"), _kw(n=max(n, 1))),
        # ---- already-defined classes, now registered
        "CIB": lambda a, n, w, d, mx, ctx: (
            _get("v9v10v12", "CIB") if _has("v9v10v12", "CIB")
            else _get("block", "CIB"),
            _kw(c2=_sc(a[0], w, mx), shortcut=_a(a, 1, True))),
        "DFL": lambda a, n, w, d, mx, ctx: (
            _get("block", "DFL"), _kw()),
        "Proto": lambda a, n, w, d, mx, ctx: (
            _get("block", "Proto"), _kw(c_=_sc(_a(a, 0, 256), w, mx),
                                        c2=_a(a, 1, 32))),
        "SpatialAttention": lambda a, n, w, d, mx, ctx: (
            _get("conv", "SpatialAttention"),
            _kw(k=_a(a, 0, 7) if _a(a, 0, 7) in (3, 7) else 7)),
        "AAttn": lambda a, n, w, d, mx, ctx: (
            _get("v9v10v12", "AAttn"),
            _kw(dim=_sc(a[0], w, mx),
                num_heads=_heads(_sc(a[0], w, mx), _a(a, 1, 8)))),
        "ABlock": lambda a, n, w, d, mx, ctx: (
            _get("v9v10v12", "ABlock"),
            _kw(dim=_sc(a[0], w, mx),
                num_heads=_heads(_sc(a[0], w, mx), _a(a, 1, 8)))),
        "ContrastiveHead": plain(H, "ContrastiveAdapter"),
        "BNContrastiveHead": lambda a, n, w, d, mx, ctx: (
            _get(H, "ContrastiveAdapter"),
            _kw(embed_dims=_a(a, 0, 512), use_bn=True)),
        "MultiOrderGatedAggregation": lambda a, n, w, d, mx, ctx: (
            _get("backbones5", "MultiOrderGatedAggregation"),
            _kw(dim=_sc(a[0], w, mx))),
        "BottleneckTransformer": c2_of("attention", "BottleneckTransformer"),
        "v10_Attention": lambda a, n, w, d, mx, ctx: (
            _get("block", "Attention"),
            _kw(dim=_sc(a[0], w, mx),
                num_heads=_heads(_sc(a[0], w, mx), _a(a, 1, 8)))),
        # ---- generic-bottleneck suffixes (csp_wrappers)
        "Bottleneck_DLKA": _gb("DLKA"),
        "Bottleneck_FLA": _gb("FLA"),
        "Bottleneck_TripletAt": _gb("TripletAt"),
        "Bottleneck_WT": _gb("WT"),
        "Bottleneck_Dual": _gb("Het"),
        "OREPANBottleneck": _gb("OREPA"),
        "VGG11": _vgg("VGG11"), "VGG13": _vgg("VGG13"),
        "VGG16": _vgg("VGG16"), "VGG19": _vgg("VGG19"),
    }

    def _has(mod, cls):
        try:
            _get(mod, cls)
            return True
        except AttributeError:
            return False

    for name, b in new.items():
        BUILDERS.setdefault(name, b)

    # KAN conv family: one parametric module, per-basis entries
    for name, basis in (("KANConv2d", "rbf"), ("FastKANConv2d", "rbf"),
                        ("FasterKANConv2d", "rbf"), ("RBFKANConv2d", "rbf"),
                        ("ChebyKANConv2d", "cheby"), ("GRAMKANConv2d", "cheby"),
                        ("JacobiKANConv2d", "cheby"), ("ReLUKANConv2d", "relu"),
                        ("WavKANConv2d", "wav")):
        def _kan(basis=basis):
            def build(a, n, w, d, mx, ctx):
                return _get(H, "KANConv2d"), _kw(
                    c2=_sc(a[0], w, mx), k=_a(a, 1, 3), s=_a(a, 2, 1),
                    basis=basis)
            return build
        BUILDERS.setdefault(name, _kan())

    # pure aliases onto existing registry rows (reference spelling -> ours)
    for name, target in (
        ("BasicConv", "Conv"), ("DepthWiseConv", "DWConv"),
        ("PointWiseConv", "Conv"), ("DeformConv", "DCNv2"),
        ("RepConvN", "RepConv"), ("Res", "Bottleneck"),
        ("MobileOneBlock_origin", "MobileOneBlock"),
        ("RepVGGDW", "UniRepLKNetBlock"),
        ("C2fPSA", "C2PSA"), ("C2f_Dual", "C2f_Het"),
        ("PRepNCSPELAN4", "RepNCSPELAN4"),
        ("RepNCSP_AKConv", "RepNCSPELAN4AKConv"),
        ("OREPANCSP", "C3k2_OREPA"), ("PSAFLA", "C2PSA_FLA"),
        ("ES_SEModule", "LC_SEModule"),
        ("SELayer", "SEAttention"), ("SELayerV1", "SEAttention"),
        ("EffectiveSELayer", "EffectiveSE"),
        ("RepVggBlock", "RepVGGBlock"), ("BasicBlock", "Bottleneck"),
        ("CSPResStage", "CSPResNet"), ("ConvMS", "Conv"),
        ("RepHDW", "RepHMS"), ("UniRepLKNetBlock_pro", "UniRepLKNetBlock"),
        ("GSConvE2", "GSConvE"), ("ESD", "ADown"), ("ESD2", "ADown"),
        ("DSConv2D", "DSConv"), ("ODConv2d", "ODConv2d_3rd"),
        ("FDConv", "ODConv2d_3rd"), ("FDConv_cfg", "ODConv2d_3rd"),
        ("C2f_FasterBlock_EMA", "C2f_Faster_EMA"),
        ("C3k_ConvNeXtV2Block", "C3k2_ConvNeXtV2Block"),
        ("C2f_MultiOGA", "C2f_Context"),
        ("ContextGuidedBlock_Down", "ContextGuidedBlock"),
        ("InvertedBottleneck", "MobileNetV3_InvertedResidual"),
        ("LocalWindowAttention", "C2PSA_CGA"),
        ("PSAMSDA", "C2PSA"), ("C2PSA_MSDA", "C2PSA"),
        ("C2PSA_KS", "C2PSA"), ("C2PSA_Agent", "C2PSA"),
        ("C2PSA_HV_LCA", "C2PSA"), ("C2PSA_HV_LCA_DynamicTanh", "C2PSA"),
        ("PSASENetV2", "C2PSA_SENetV2"), ("SPPFSENetV2", "SPPF"),
        ("ScConv", "SCConv"), ("RetinexFormer", "IAT"),
        ("LRPCHead", "YOLOEDetect"),
        ("MSDA", "C2PSA"),
        ("MobileOneBlockv5", "MobileOneBlock"),
        ("MobileOnev5", "MobileOneBlock"),
        ("GhostNetV2", "Ghostnetv2"),
        ("RepViT", "repvit_m0_9"),
    ):
        alias(name, target)

    BUILDERS.setdefault(
        "ChannelAggregationFFN",
        lambda a, n, w, d, mx, ctx: (
            _get("backbones5", "ChannelAggregationFFN"),
            _kw(dim=_sc(a[0], w, mx))))


def _heads(c, h):
    """Largest head count <= h that divides c (YAML args may not match the
    width-scaled channel count)."""
    h = max(int(h), 1)
    while h > 1 and c % h:
        h -= 1
    return h


def _gb(suffix):
    def build(a, n, w, d, mx, ctx):
        from ultralytics_pro_tpu.nn.modules.csp_wrappers import \
            GenericBottleneck

        # channel scaling matches the registry's _sc convention via closure
        from ultralytics_pro_tpu.nn.tasks import _a, _kw, _sc

        return GenericBottleneck, _kw(c2=_sc(a[0], w, mx), suffix=suffix,
                                      shortcut=_a(a, 1, True))
    return build


def _vgg(name):
    def build(a, n, w, d, mx, ctx):
        ctx["multi_output"] = 4
        return VGGBackbone, tuple(dict(depths=VGG_DEPTHS[name]).items())
    return build
