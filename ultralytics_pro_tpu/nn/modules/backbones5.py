"""Whole-backbone zoo, tranche 5: import-faithful implementations (round 4).

These replace the declared stage-assembly approximations in backbones3.py for
the highest-value "import-open" families (VERDICT r3 Next #6), matching the
reference torch architectures exactly so official checkpoints transplant:

- HorNet          (reference HorNet.py:262 — g^n-conv, 7x7 + GF variants)
- MogaNet         (reference MogaNet_backbone.py — multi-order gated aggregation)
- InceptionNeXt   (reference InceptionNext.py — inception DW token mixer)
- CSWin           (reference CSWinTransformer.py — cross-shaped window attention)
- GhostNetV2      (reference GhostNetv2.py — DFC-attention ghost blocks)
- GhostNetV3      (reference GhostNetv3.py — train-form reparam ghost blocks)
- ParameterNet    (reference ParameterNet.py — GhostNet_Reparam / parameternet_600m)

Conventions: NHWC; torch channels_first LayerNorm over C == flax LayerNorm on
the trailing axis of an NHWC tensor; weights import via
backbone_import.py (OIHW->HWIO etc.) with transplant-parity tests in
tests/test_backbone_import2.py.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import ConvBase


def _ln(mod, name, x, eps=1e-6):
    return nn.LayerNorm(epsilon=eps, dtype=mod.dtype, name=name)(x)


# ------------------------------------------------------------------ HorNet --

class GnConvFaithful(ConvBase):
    """Recursive gated conv g^n-conv (reference HorNet.py:102 gnconv).

    proj_in: dim -> 2*dim; split [dims[0], sum(dims)] where
    dims = [dim/2^(order-1), ..., dim]; 7x7 DW (with bias) over the sum(dims)
    branch scaled by s; then order-1 gated 1x1 projections."""

    dim: int = 0
    order: int = 5
    s: float = 1.0 / 3.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = [self.dim // 2 ** i for i in range(self.order)][::-1]
        total = sum(dims)
        fused = nn.Conv(2 * self.dim, (1, 1), dtype=self.dtype, name="proj_in")(x)
        pwa, abc = fused[..., :dims[0]], fused[..., dims[0]:]
        dw = nn.Conv(total, (7, 7), padding=((3, 3), (3, 3)), feature_group_count=total,
                     use_bias=True, dtype=self.dtype, name="dwconv")(abc)
        dw = dw * self.s
        parts, off = [], 0
        for d in dims:
            parts.append(dw[..., off:off + d])
            off += d
        y = pwa * parts[0]
        for i in range(self.order - 1):
            y = nn.Conv(dims[i + 1], (1, 1), dtype=self.dtype, name=f"pws_{i}")(y) * parts[i + 1]
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="proj_out")(y)


class HorNetBlockFaithful(ConvBase):
    """HorNet block (reference HorNet.py:211): LN -> gnconv (gamma1-scaled)
    residual, LN -> MLP (gamma2-scaled) residual."""

    dim: int = 0
    order: int = 5
    s: float = 1.0 / 3.0
    layer_scale: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        g1 = self.param("gamma1", nn.initializers.constant(self.layer_scale), (self.dim,))
        g2 = self.param("gamma2", nn.initializers.constant(self.layer_scale), (self.dim,))
        y = _ln(self, "norm1", x)
        y = GnConvFaithful(dim=self.dim, order=self.order, s=self.s,
                           dtype=self.dtype, name="gnconv")(y, train)
        x = x + g1 * y
        y = _ln(self, "norm2", x)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(jax.nn.gelu(y, approximate=False))
        return x + g2 * y


class HorNetBackbone(ConvBase):
    """HorNet 7x7 (reference HorNet.py:262): k4s4 stem + LN, (LN + k2s2)
    downsamples, per-stage g^n-conv order 2/3/4/5, channels_first LN on each
    emitted stage."""

    depths: Sequence[int] = (2, 3, 18, 2)
    base_dim: int = 64
    orders: Sequence[int] = (2, 3, 4, 5)
    s: float = 1.0 / 3.0
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = [self.base_dim * 2 ** i for i in range(4)]
        outs = []
        for st in range(4):
            if st == 0:
                x = nn.Conv(dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                            name="stem_conv")(x)
                x = _ln(self, "stem_ln", x)
            else:
                x = _ln(self, f"down{st}_ln", x)
                x = nn.Conv(dims[st], (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down{st}_conv")(x)
            for b in range(self.depths[st]):
                x = HorNetBlockFaithful(dim=dims[st], order=self.orders[st], s=self.s,
                                        dtype=self.dtype, name=f"s{st}_b{b}")(x, train)
            if st in self.out_indices:
                outs.append(_ln(self, f"norm{st}", x))
        return outs


# ------------------------------------------------------------- MambaVision --

class MambaVisionMixerF(ConvBase):
    """MambaVision token mixer (reference MambaVision.py:226): in_proj ->
    (x, z) halves -> depthwise k3 'same' conv1d + SiLU each -> selective scan
    on x (d_state=8) -> concat z -> out_proj.

    Faithful quirk preserved: the reference applies dt_proj WITH its bias and
    then passes dt_proj.bias AGAIN as the kernel's delta_bias, so the
    effective step is softplus(W@dt + 2b) (MambaVision.py:320+332). The CUDA
    scan is replaced by the TPU associative scan (nn/modules/mamba.py)."""

    dim: int = 0
    d_state: int = 8
    d_conv: int = 3

    @nn.compact
    def __call__(self, x_tokens, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.mamba import selective_scan

        d = self.dim          # expand=1 -> d_inner == dim
        half = d // 2
        dtr = -(-d // 16)     # ceil(d/16)
        xz = nn.Dense(d, use_bias=False, dtype=self.dtype, name="in_proj")(x_tokens)
        x, z = xz[..., :half], xz[..., half:]
        pad = (self.d_conv - 1) // 2
        x = nn.Conv(half, (self.d_conv,), padding=((pad, self.d_conv - 1 - pad),),
                    feature_group_count=half, use_bias=True, dtype=self.dtype,
                    name="conv1d_x")(x)
        z = nn.Conv(half, (self.d_conv,), padding=((pad, self.d_conv - 1 - pad),),
                    feature_group_count=half, use_bias=True, dtype=self.dtype,
                    name="conv1d_z")(z)
        x = jax.nn.silu(x)
        z = jax.nn.silu(z)
        dbl = nn.Dense(dtr + 2 * self.d_state, use_bias=False, dtype=self.dtype,
                       name="x_proj")(x)
        dt, B, C = jnp.split(dbl, [dtr, dtr + self.d_state], axis=-1)
        # dt_proj as explicit params: the kernel semantics need the bias
        # value twice — softplus(delta + delta_bias) where delta already
        # carries the bias once (the reference's double-add, kept faithful)
        dk = self.param("dt_proj_kernel", nn.initializers.lecun_normal(), (dtr, half))
        db = self.param("dt_proj_bias", nn.initializers.zeros, (half,))
        dt = dt @ dk + db
        delta = jax.nn.softplus(dt + db)
        A_log = self.param("A_log", lambda k, s: jnp.log(jnp.broadcast_to(
            jnp.arange(1, self.d_state + 1, dtype=jnp.float32), s)),
            (half, self.d_state))
        D = self.param("D", nn.initializers.ones, (half,))
        y = selective_scan(x.astype(jnp.float32), delta.astype(jnp.float32),
                           -jnp.exp(A_log.astype(jnp.float32)),
                           B.astype(jnp.float32), C.astype(jnp.float32),
                           D.astype(jnp.float32)).astype(x_tokens.dtype)
        y = jnp.concatenate([y, z], -1)
        return nn.Dense(d, use_bias=False, dtype=self.dtype, name="out_proj")(y)


class _MVAttention(ConvBase):
    """timm-style MHSA (reference MambaVision.py:342), qkv_bias=True."""

    dim: int = 0
    heads: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        bw, n, c = x.shape
        hd = c // self.heads
        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax((q * hd ** -0.5) @ k.transpose(0, 1, 3, 2), axis=-1)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(c, use_bias=True, dtype=self.dtype, name="proj")(y)


class _MVBlock(ConvBase):
    """Transformer-stage block (reference MambaVision.py:391): LN -> mixer
    (mamba or attention) residual; LN -> MLP residual. layer_scale=None in
    the published configs -> no gamma params."""

    dim: int = 0
    heads: int = 8
    attention: bool = False
    ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if self.attention:
            y = _MVAttention(dim=self.dim, heads=self.heads, dtype=self.dtype,
                             name="mixer")(y, train)
        else:
            y = MambaVisionMixerF(dim=self.dim, dtype=self.dtype, name="mixer")(y, train)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.ratio), use_bias=True, dtype=self.dtype,
                     name="fc1")(y)
        y = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                     name="fc2")(jax.nn.gelu(y, approximate=False))
        return x + y


class _MVConvBlock(ConvBase):
    """Conv-stage block (reference MambaVision.py:193): conv3+BN+GELU(tanh)
    + conv3+BN, residual."""

    dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         use_fast_variance=False, epsilon=1e-5, dtype=self.dtype,
                         name="norm1")(y)
        y = jax.nn.gelu(y, approximate=True)
        y = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         use_fast_variance=False, epsilon=1e-5, dtype=self.dtype,
                         name="norm2")(y)
        return x + y


class MambaVisionBackbone(ConvBase):
    """MambaVision (reference MambaVision.py:535): 2x conv3s2+BN(1e-4)+ReLU
    patch embed; levels 0-1 conv blocks, levels 2-3 windowed token blocks
    (first half mamba mixers, second half attention); k3s2 downsample convs
    between levels; emits each level's pre-downsample map."""

    dim: int = 80                       # mamba_vision_T
    in_dim: int = 32
    depths: Sequence[int] = (1, 3, 8, 4)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    window_size: Sequence[int] = (8, 8, 14, 7)
    ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.in_dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="patch_conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         use_fast_variance=False, epsilon=1e-4, dtype=self.dtype,
                         name="patch_bn1")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="patch_conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         use_fast_variance=False, epsilon=1e-4, dtype=self.dtype,
                         name="patch_bn2")(x)
        x = jax.nn.relu(x)

        outs = []
        for lvl in range(4):
            d = self.dim * 2 ** lvl
            depth = self.depths[lvl]
            if lvl < 2:
                for bi in range(depth):
                    x = _MVConvBlock(dim=d, dtype=self.dtype,
                                     name=f"s{lvl}_b{bi}")(x, train)
            else:
                ws = self.window_size[lvl]
                b, h, w, c = x.shape
                pad_b = (ws - h % ws) % ws
                pad_r = (ws - w % ws) % ws
                xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
                hp, wp = h + pad_b, w + pad_r
                t = _win_part(xp, ws, ws)  # (B*nW, ws*ws, C)
                # first half mamba, second half attention (MambaVision.py:596)
                attn_from = depth // 2 + 1 if depth % 2 else depth // 2
                for bi in range(depth):
                    t = _MVBlock(dim=d, heads=self.num_heads[lvl],
                                 attention=bi >= attn_from, ratio=self.ratio,
                                 dtype=self.dtype, name=f"s{lvl}_b{bi}")(t, train)
                x = _win_merge(t, ws, ws, hp, wp)[:, :h, :w]
            outs.append(x)
            if lvl < 3:
                x = nn.Conv(2 * d, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            use_bias=False, dtype=self.dtype,
                            name=f"down{lvl}")(x)
        return outs


# -------------------------------------------------------------- GhostNetV2 --

GHOSTNETV2_CFGS = (
    # k, exp, out, se_ratio, stride — reference GhostNetv2.py:236
    ((3, 16, 16, 0.0, 1),),
    ((3, 48, 24, 0.0, 2),),
    ((3, 72, 24, 0.0, 1),),
    ((5, 72, 40, 0.25, 2),),
    ((5, 120, 40, 0.25, 1),),
    ((3, 240, 80, 0.0, 2),),
    ((3, 200, 80, 0.0, 1), (3, 184, 80, 0.0, 1), (3, 184, 80, 0.0, 1),
     (3, 480, 112, 0.25, 1), (3, 672, 112, 0.25, 1)),
    ((5, 672, 160, 0.25, 2),),
    ((5, 960, 160, 0.0, 1), (5, 960, 160, 0.25, 1), (5, 960, 160, 0.0, 1),
     (5, 960, 160, 0.25, 1)),
)


def _mkdiv(v, divisor=4):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _GhostModuleV2(ConvBase):
    """GhostModuleV2 (reference GhostNetv2.py:67): primary 1x1 + cheap DW3
    halves concatenated; 'attn' mode gates by a DFC branch (1x1 + 1x5 + 5x1
    DW convs on the 2x-downsampled input, sigmoid, nearest-upsampled)."""

    oup: int = 0
    relu: bool = True
    attn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math as _m

        init_c = _m.ceil(self.oup / 2)
        y1 = nn.Conv(init_c, (1, 1), use_bias=False, dtype=self.dtype,
                     name="primary_conv")(x)
        y1 = _bn5(self, "primary_bn", y1, train)
        if self.relu:
            y1 = jax.nn.relu(y1)
        y2 = nn.Conv(init_c, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     feature_group_count=init_c, dtype=self.dtype,
                     name="cheap_conv")(y1)
        y2 = _bn5(self, "cheap_bn", y2, train)
        if self.relu:
            y2 = jax.nn.relu(y2)
        out = jnp.concatenate([y1, y2], -1)[..., :self.oup]
        if not self.attn:
            return out
        r = nn.avg_pool(x, (2, 2), (2, 2))
        r = nn.Conv(self.oup, (1, 1), use_bias=False, dtype=self.dtype,
                    name="short_conv0")(r)
        r = _bn5(self, "short_bn0", r, train)
        r = nn.Conv(self.oup, (1, 5), padding=((0, 0), (2, 2)), use_bias=False,
                    feature_group_count=self.oup, dtype=self.dtype,
                    name="short_conv1")(r)
        r = _bn5(self, "short_bn1", r, train)
        r = nn.Conv(self.oup, (5, 1), padding=((2, 2), (0, 0)), use_bias=False,
                    feature_group_count=self.oup, dtype=self.dtype,
                    name="short_conv2")(r)
        r = _bn5(self, "short_bn2", r, train)
        gate = jax.nn.sigmoid(r)
        gate = jax.image.resize(gate, (*out.shape[:3], gate.shape[-1]),
                                method="nearest")
        return out * gate


class _GhostBottleneckV2(ConvBase):
    """GhostBottleneckV2 (reference GhostNetv2.py:125)."""

    mid: int = 0
    out: int = 0
    k: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    attn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        in_chs = x.shape[-1]
        y = _GhostModuleV2(oup=self.mid, relu=True, attn=self.attn,
                           dtype=self.dtype, name="ghost1")(x, train)
        if self.stride > 1:
            p = (self.k - 1) // 2
            y = nn.Conv(self.mid, (self.k, self.k), strides=(self.stride,) * 2,
                        padding=((p, p), (p, p)), use_bias=False,
                        feature_group_count=self.mid, dtype=self.dtype,
                        name="conv_dw")(y)
            y = _bn5(self, "bn_dw", y, train)
        if self.se_ratio > 0:
            red = _mkdiv(self.mid * self.se_ratio)
            s = y.mean(axis=(1, 2), keepdims=True)
            s = nn.Conv(red, (1, 1), use_bias=True, dtype=self.dtype,
                        name="se_reduce")(s)
            s = jax.nn.relu(s)
            s = nn.Conv(self.mid, (1, 1), use_bias=True, dtype=self.dtype,
                        name="se_expand")(s)
            y = y * (jax.nn.relu6(s + 3.0) / 6.0)
        y = _GhostModuleV2(oup=self.out, relu=False, dtype=self.dtype,
                           name="ghost2")(y, train)
        if in_chs == self.out and self.stride == 1:
            return y + res
        p = (self.k - 1) // 2
        sc = nn.Conv(in_chs, (self.k, self.k), strides=(self.stride,) * 2,
                     padding=((p, p), (p, p)), use_bias=False,
                     feature_group_count=in_chs, dtype=self.dtype,
                     name="short_dw")(res)
        sc = _bn5(self, "short_dw_bn", sc, train)
        sc = nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype,
                     name="short_pw")(sc)
        sc = _bn5(self, "short_pw_bn", sc, train)
        return y + sc


class GhostNetV2Backbone(ConvBase):
    """GhostNetV2 (reference GhostNetv2.py:178): k3s2 stem, DFC-attention
    ghost bottlenecks (layer_id>1 use the attn ghost1), final 1x1 ConvBnAct;
    emits the last 4 unique-resolution maps like the reference forward.

    dfc_attn=False is the faithful GhostNetV1 (reference GhostNetv1.py:158):
    identical cfg table and module structure, no DFC gate anywhere — the V2
    state_dict importer serves V1 checkpoints unchanged (V1 dicts simply
    carry no short_conv keys)."""

    width: float = 1.0
    dfc_attn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(_mkdiv(16 * self.width), (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="stem_conv")(x)
        x = jax.nn.relu(_bn5(self, "stem_bn", x, train))
        uniq = {}
        lid = 0
        for g, group in enumerate(GHOSTNETV2_CFGS):
            for (k, exp, c, se, s) in group:
                x = _GhostBottleneckV2(
                    mid=_mkdiv(exp * self.width), out=_mkdiv(c * self.width),
                    k=k, stride=s, se_ratio=se, attn=self.dfc_attn and lid > 1,
                    dtype=self.dtype, name=f"b{lid}")(x, train)
                lid += 1
            uniq[x.shape[1:3]] = x
        x = nn.Conv(_mkdiv(960 * self.width), (1, 1), use_bias=False,
                    dtype=self.dtype, name="final_conv")(x)
        x = jax.nn.relu(_bn5(self, "final_bn", x, train))
        uniq[x.shape[1:3]] = x  # overwrites the last scale, like the reference
        return list(uniq.values())[-4:]


# -------------------------------------------------------------- GhostNetV3 --

GHOSTNETV3_CFGS = (
    # k, exp, out, se_ratio, stride — reference GhostNetv3.py:819
    # GHOSTNET_SPECS["GhostNet1.0"], grouped into the 5 stages whose outputs
    # (stages 2-4 + final 1x1) the reference forward returns.
    ((3, 16, 16, 0.0, 1),),
    ((3, 48, 24, 0.0, 2), (3, 72, 24, 0.0, 1)),
    ((5, 72, 40, 0.25, 2), (5, 120, 40, 0.25, 1)),
    ((3, 240, 80, 0.0, 2), (3, 200, 80, 0.0, 1), (3, 184, 80, 0.0, 1),
     (3, 184, 80, 0.0, 1), (3, 480, 112, 0.25, 1), (3, 672, 112, 0.25, 1)),
    ((5, 672, 160, 0.25, 2), (5, 960, 160, 0.0, 1), (5, 960, 160, 0.25, 1),
     (5, 960, 160, 0.0, 1), (5, 960, 160, 0.25, 1)),
)


class _GhostModuleV3(ConvBase):
    """GhostModuleV3 in its TRAIN form (reference GhostNetv3.py:76) — the
    form published V3 checkpoints store. Primary half: identity BN (only
    when inp == init_channels) + three (1x1 conv + BN) reparam branches,
    summed, ReLU. Cheap half (on the primary half): identity BN + a 1x1 DW
    scale branch (conv + BN) + three (3x3 DW conv + BN) branches, summed.
    Halves concatenate and truncate to oup. mode 'ori_shortcut_mul_conv15'
    (attn=True) gates the output by the DFC short branch — 1x1 + (1,5) +
    (5,1) DW convs on the 2x-avg-pooled input, sigmoid, nearest-resized —
    exactly as GhostNetV2. The fused `primary_conv_module` /
    `cheap_operation_module` in the torch state_dict are dead weights until
    reparameterize() and are skipped on import."""

    oup: int = 0
    relu: bool = True
    attn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math as _m

        init_c = _m.ceil(self.oup / 2)  # ratio=2 -> new_channels == init_c
        inp = x.shape[-1]
        y1 = 0.0
        if inp == init_c:  # primary_rpr_skip (stride is always 1 here)
            y1 = _bn5(self, "primary_skip_bn", x, train)
        # kernel_size=1 -> no primary scale branch in the reference
        for j in range(3):
            b = nn.Conv(init_c, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"primary_conv{j}")(x)
            y1 = y1 + _bn5(self, f"primary_bn{j}", b, train)
        if self.relu:
            y1 = jax.nn.relu(y1)
        # cheap: init == new, so the identity BN always exists and every
        # branch is depthwise (groups = min(init, new) = init)
        y2 = _bn5(self, "cheap_skip_bn", y1, train)
        sc = nn.Conv(init_c, (1, 1), use_bias=False, feature_group_count=init_c,
                     dtype=self.dtype, name="cheap_scale_conv")(y1)
        y2 = y2 + _bn5(self, "cheap_scale_bn", sc, train)
        for j in range(3):
            b = nn.Conv(init_c, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        feature_group_count=init_c, dtype=self.dtype,
                        name=f"cheap_conv{j}")(y1)
            y2 = y2 + _bn5(self, f"cheap_bn{j}", b, train)
        if self.relu:
            y2 = jax.nn.relu(y2)
        out = jnp.concatenate([y1, y2], -1)[..., :self.oup]
        if not self.attn:
            return out
        r = nn.avg_pool(x, (2, 2), (2, 2))
        r = nn.Conv(self.oup, (1, 1), use_bias=False, dtype=self.dtype,
                    name="short_conv0")(r)
        r = _bn5(self, "short_bn0", r, train)
        r = nn.Conv(self.oup, (1, 5), padding=((0, 0), (2, 2)), use_bias=False,
                    feature_group_count=self.oup, dtype=self.dtype,
                    name="short_conv1")(r)
        r = _bn5(self, "short_bn1", r, train)
        r = nn.Conv(self.oup, (5, 1), padding=((2, 2), (0, 0)), use_bias=False,
                    feature_group_count=self.oup, dtype=self.dtype,
                    name="short_conv2")(r)
        r = _bn5(self, "short_bn2", r, train)
        gate = jax.nn.sigmoid(r)
        gate = jax.image.resize(gate, (*out.shape[:3], gate.shape[-1]),
                                method="nearest")
        return out * gate


class _GhostBottleneckV3(ConvBase):
    """GhostBottleneckV3 train form (reference GhostNetv3.py:558): ghost1
    (DFC-gated when global layer_id > 1), multi-branch reparam DW conv when
    stride > 1 (1x1 DW scale + three kxk DW branches, no activation), SE
    (hard-sigmoid), ghost2 (no relu, never gated), and the V1/V2 shortcut."""

    mid: int = 0
    out: int = 0
    k: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    attn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        in_chs = x.shape[-1]
        y = _GhostModuleV3(oup=self.mid, relu=True, attn=self.attn,
                           dtype=self.dtype, name="ghost1")(x, train)
        if self.stride > 1:
            p = (self.k - 1) // 2
            sc = nn.Conv(self.mid, (1, 1), strides=(self.stride,) * 2,
                         use_bias=False, feature_group_count=self.mid,
                         dtype=self.dtype, name="dw_scale_conv")(y)
            acc = _bn5(self, "dw_scale_bn", sc, train)
            for j in range(3):
                b = nn.Conv(self.mid, (self.k, self.k),
                            strides=(self.stride,) * 2,
                            padding=((p, p), (p, p)), use_bias=False,
                            feature_group_count=self.mid, dtype=self.dtype,
                            name=f"dw_conv{j}")(y)
                acc = acc + _bn5(self, f"dw_bn{j}", b, train)
            y = acc
        if self.se_ratio > 0:
            red = _mkdiv(self.mid * self.se_ratio)
            s = y.mean(axis=(1, 2), keepdims=True)
            s = nn.Conv(red, (1, 1), use_bias=True, dtype=self.dtype,
                        name="se_reduce")(s)
            s = jax.nn.relu(s)
            s = nn.Conv(self.mid, (1, 1), use_bias=True, dtype=self.dtype,
                        name="se_expand")(s)
            y = y * (jax.nn.relu6(s + 3.0) / 6.0)
        y = _GhostModuleV3(oup=self.out, relu=False, dtype=self.dtype,
                           name="ghost2")(y, train)
        if in_chs == self.out and self.stride == 1:
            return y + res
        p = (self.k - 1) // 2
        sc = nn.Conv(in_chs, (self.k, self.k), strides=(self.stride,) * 2,
                     padding=((p, p), (p, p)), use_bias=False,
                     feature_group_count=in_chs, dtype=self.dtype,
                     name="short_dw")(res)
        sc = _bn5(self, "short_dw_bn", sc, train)
        sc = nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype,
                     name="short_pw")(sc)
        sc = _bn5(self, "short_pw_bn", sc, train)
        return y + sc


class GhostNetV3Backbone(ConvBase):
    """GhostNetV3 train form (reference GhostNetv3.py:839 GhostNet /
    GhostNet_1_0): k3s2 stem, reparam-style ghost bottlenecks in 5 stages
    (global layer_id > 1 uses the DFC-gated ghost1), final 1x1 ConvBnAct;
    returns [stage2, stage3, stage4, conv_last(stage5)] like the reference
    `_forward_features`. Blocks are named by GLOBAL layer id (b0..b15) so
    the state_dict importer (`ghostnetv3_state_dict_to_flax`) maps
    stages.{g}.{i} by offset."""

    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(_mkdiv(16 * self.width), (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="stem_conv")(x)
        x = jax.nn.relu(_bn5(self, "stem_bn", x, train))
        outs = []
        lid = 0
        for group in GHOSTNETV3_CFGS:
            for (k, exp, c, se, s) in group:
                x = _GhostBottleneckV3(
                    mid=_mkdiv(exp * self.width), out=_mkdiv(c * self.width),
                    k=k, stride=s, se_ratio=se, attn=lid > 1,
                    dtype=self.dtype, name=f"b{lid}")(x, train)
                lid += 1
            outs.append(x)
        x = nn.Conv(_mkdiv(960 * self.width), (1, 1), use_bias=False,
                    dtype=self.dtype, name="final_conv")(x)
        x = jax.nn.relu(_bn5(self, "final_bn", x, train))
        return [outs[1], outs[2], outs[3], x]


PARAMETERNET_CFGS = (
    # k, exp, out, se_ratio, stride — reference ParameterNet.py:862
    # PARAMETERTNET_SPECS["parameternet_600m"]; nine stage groups, features
    # taken after every group containing a stride-2 block (indices 1, 3, 5)
    # plus the final 1x1 conv.
    ((3, 16, 16, 0.0, 1),),
    ((3, 48, 24, 0.0, 2),),
    ((3, 72, 24, 0.0, 1),),
    ((5, 72, 40, 0.25, 2),),
    ((3, 120, 40, 0.25, 1), (3, 120, 40, 0.25, 1)),
    ((3, 240, 80, 0.0, 2),),
    ((3, 200, 80, 0.0, 1), (3, 200, 80, 0.0, 1), (3, 200, 80, 0.0, 1),
     (3, 480, 112, 0.25, 1), (3, 672, 112, 0.25, 1), (3, 672, 112, 0.25, 1)),
    ((5, 672, 160, 0.25, 2),),
    ((3, 960, 160, 0.25, 1), (3, 960, 160, 0.25, 1), (3, 960, 160, 0.25, 1),
     (3, 960, 160, 0.25, 1), (3, 960, 160, 0.25, 1)),
)


class ParameterNetBackbone(ConvBase):
    """GhostNet_Reparam / parameternet_600m train form (reference
    ParameterNet.py:894): the GhostNetV3 reparam ghost machinery in pure
    'ori' mode (no DFC gate anywhere), ParameterNet cfg table, ReLU
    activations. Returns [group1, group3, group5, conv_last(group8)] —
    the reference's `stage_output_indices` selection (strides 4/8/16 + the
    final stride-32 1x1). Blocks are named by GLOBAL layer id (b0..b16) so
    `ghostnetv3_state_dict_to_flax(..., cfgs=PARAMETERNET_CFGS)` maps
    stages.{g}.{i} by offset; ParameterNet dicts carry no short_conv keys."""

    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(_mkdiv(16 * self.width), (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="stem_conv")(x)
        x = jax.nn.relu(_bn5(self, "stem_bn", x, train))
        outs = []
        lid = 0
        for group in PARAMETERNET_CFGS:
            for (k, exp, c, se, s) in group:
                x = _GhostBottleneckV3(
                    mid=_mkdiv(exp * self.width), out=_mkdiv(c * self.width),
                    k=k, stride=s, se_ratio=se, attn=False,
                    dtype=self.dtype, name=f"b{lid}")(x, train)
                lid += 1
            outs.append(x)
        x = nn.Conv(_mkdiv(960 * self.width), (1, 1), use_bias=False,
                    dtype=self.dtype, name="final_conv")(x)
        x = jax.nn.relu(_bn5(self, "final_bn", x, train))
        return [outs[1], outs[3], outs[5], x]


# ------------------------------------------------------------------- CSWin --

def _win_part(x, hsp, wsp):
    """(B, H, W, C) -> (B*nH*nW, hsp*wsp, C) in img2windows order
    (reference CSWinTransformer.py:208)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // hsp, hsp, w // wsp, wsp, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, hsp * wsp, c)


def _win_merge(x, hsp, wsp, h, w):
    """Inverse of _win_part -> (B, H, W, C)."""
    b = x.shape[0] // ((h // hsp) * (w // wsp))
    x = x.reshape(b, h // hsp, w // wsp, hsp, wsp, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


class LePEAttentionF(ConvBase):
    """Cross-shaped-window attention branch with a locally-enhanced
    positional encoding on V (reference CSWinTransformer.py:58): stripes of
    (H_sp, W_sp); lepe = per-window 3x3 DW conv of V added to attn @ V."""

    dim: int = 0
    heads: int = 1
    hsp: int = 1
    wsp: int = 1

    @nn.compact
    def __call__(self, q, k, v, train: bool = False):
        b, h, w, c = q.shape
        hd = c // self.heads
        scale = hd ** -0.5
        # Non-divisible maps zero-pad to stripe multiples and crop back (the
        # torch reference crashes below its design resolution; parity at
        # reference resolutions is unaffected since this path is inactive).
        ph = (self.hsp - h % self.hsp) % self.hsp
        pw = (self.wsp - w % self.wsp) % self.wsp
        if ph or pw:
            pad = ((0, 0), (0, ph), (0, pw), (0, 0))
            q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        hp, wp = h + ph, w + pw

        def to_heads(t):  # (B', N, C) -> (B', heads, N, hd)
            bw, n, _ = t.shape
            return t.reshape(bw, n, self.heads, hd).transpose(0, 2, 1, 3)

        qw = to_heads(_win_part(q, self.hsp, self.wsp))
        kw = to_heads(_win_part(k, self.hsp, self.wsp))
        # v windows as images for the DW lepe conv
        vw_img = _win_part(v, self.hsp, self.wsp).reshape(-1, self.hsp, self.wsp, c)
        lepe = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                       dtype=self.dtype, name="get_v")(vw_img)
        vw = to_heads(vw_img.reshape(-1, self.hsp * self.wsp, c))
        lepe = to_heads(lepe.reshape(-1, self.hsp * self.wsp, c))

        attn = jax.nn.softmax((qw * scale) @ kw.transpose(0, 1, 3, 2), axis=-1)
        out = attn @ vw + lepe  # (B', heads, N, hd)
        out = out.transpose(0, 2, 1, 3).reshape(-1, self.hsp * self.wsp, c)
        out = _win_merge(out, self.hsp, self.wsp, hp, wp)
        return out[:, :h, :w] if (ph or pw) else out


class CSWinBlockFaithful(ConvBase):
    """CSWin block (reference CSWinTransformer.py:137): LN -> qkv -> two
    half-channel stripe branches (or one full-window branch in the last
    stage) -> proj residual; LN -> MLP residual."""

    dim: int = 0
    heads: int = 2
    split: int = 7
    last: bool = False
    ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # stripes wider than the map degrade to full-window attention (the
        # torch reference simply crashes below its design resolution)
        split = min(self.split, h, w)
        last = self.last or (h <= split and w <= split)
        y = _ln(self, "norm1", x, eps=1e-5)
        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if last:
            att = LePEAttentionF(dim=c, heads=self.heads, hsp=h, wsp=w,
                                 dtype=self.dtype, name="attn0")(q, k, v, train)
        else:
            hc = c // 2
            a0 = LePEAttentionF(dim=hc, heads=self.heads // 2, hsp=h, wsp=split,
                                dtype=self.dtype, name="attn0")(
                q[..., :hc], k[..., :hc], v[..., :hc], train)
            a1 = LePEAttentionF(dim=hc, heads=self.heads // 2, hsp=split, wsp=w,
                                dtype=self.dtype, name="attn1")(
                q[..., hc:], k[..., hc:], v[..., hc:], train)
            att = jnp.concatenate([a0, a1], -1)
        x = x + nn.Dense(c, dtype=self.dtype, name="proj")(att)
        y = _ln(self, "norm2", x, eps=1e-5)
        y = nn.Dense(int(c * self.ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(jax.nn.gelu(y, approximate=False))
        return x + y


class CSWinBackbone(ConvBase):
    """CSWin Transformer (reference CSWinTransformer.py:247): k7s4p2 conv
    stem + LN, three k3s2 merge convs + LN, cross-shaped-window blocks;
    emits the last block output of each stage as an NHWC map."""

    embed_dim: int = 64
    depths: Sequence[int] = (1, 2, 21, 1)    # tiny
    split_size: Sequence[int] = (1, 2, 8, 8)
    num_heads: Sequence[int] = (2, 4, 8, 16)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.embed_dim, (7, 7), strides=(4, 4), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, name="stem_conv")(x)
        x = _ln(self, "stem_ln", x, eps=1e-5)
        outs = []
        dim = self.embed_dim
        for st in range(4):
            if st > 0:
                dim *= 2
                x = nn.Conv(dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"merge{st}_conv")(x)
                x = _ln(self, f"merge{st}_ln", x, eps=1e-5)
            for bi in range(self.depths[st]):
                x = CSWinBlockFaithful(dim=dim, heads=self.num_heads[st],
                                       split=self.split_size[st], last=(st == 3),
                                       dtype=self.dtype, name=f"s{st}_b{bi}")(x, train)
            outs.append(x)
        return outs


# ----------------------------------------------------------------- MogaNet --

class MultiOrderDWConv(ConvBase):
    """Multi-dilation DW context (reference MogaNet_backbone.py / MogaNet.py:47):
    5x5 d1 over all channels, then 5x5 d2 over the middle 3/8 and 7x7 d3 over
    the top 1/2, concatenated with the untouched bottom 1/8, 1x1 fused."""

    dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        d1 = int(3 / 8 * d)
        d2 = d // 2
        d0 = d - d1 - d2
        x0 = nn.Conv(d, (5, 5), padding=((2, 2), (2, 2)), feature_group_count=d,
                     dtype=self.dtype, name="DW_conv0")(x)
        x1 = nn.Conv(d1, (5, 5), padding=((4, 4), (4, 4)), kernel_dilation=(2, 2),
                     feature_group_count=d1, dtype=self.dtype,
                     name="DW_conv1")(x0[..., d0:d0 + d1])
        x2 = nn.Conv(d2, (7, 7), padding=((9, 9), (9, 9)), kernel_dilation=(3, 3),
                     feature_group_count=d2, dtype=self.dtype,
                     name="DW_conv2")(x0[..., d - d2:])
        y = jnp.concatenate([x0[..., :d0], x1, x2], -1)
        return nn.Conv(d, (1, 1), dtype=self.dtype, name="PW_conv")(y)


class MultiOrderGatedAggregation(ConvBase):
    """Moga spatial attention (reference MogaNet.py:95): proj_1 + global-mean
    decompose (sigma), SiLU, then gate x multi-order value, proj_2, shortcut."""

    dim: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        sigma = self.param("sigma", nn.initializers.constant(1e-5), (self.dim,))
        shortcut = x
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="proj_1")(x)
        y_d = y.mean(axis=(1, 2), keepdims=True)
        y = y + sigma * (y - y_d)
        y = jax.nn.silu(y)
        g = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="gate")(y)
        v = MultiOrderDWConv(dim=self.dim, dtype=self.dtype, name="value")(y, train)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                    name="proj_2")(jax.nn.silu(g) * jax.nn.silu(v))
        return shortcut + y


class ChannelAggregationFFN(ConvBase):
    """Moga FFN (reference MogaNet.py:6): 1x1 -> DW3x3 -> GELU -> channel
    decompose (sigma-weighted deviation from a 1-ch projection) -> 1x1."""

    dim: int = 0
    ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.dim * self.ratio)
        sigma = self.param("sigma", nn.initializers.constant(1e-5), (hidden,))
        y = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="fc1")(x)
        y = nn.Conv(hidden, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=hidden,
                    dtype=self.dtype, name="dwconv")(y)
        y = jax.nn.gelu(y, approximate=False)
        dec = nn.Conv(1, (1, 1), dtype=self.dtype, name="decompose")(y)
        y = y + sigma * (y - jax.nn.gelu(dec, approximate=False))
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(y)


def _bn5(mod, name, x, train):
    """torch BatchNorm2d defaults: eps 1e-5, momentum 0.1 (flax 0.9)."""
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        use_fast_variance=False, epsilon=1e-5, dtype=mod.dtype,
                        name=name)(x)


class MogaBlockFaithful(ConvBase):
    """Moga block (reference MogaNet_backbone.py:307 MogaBlock):
    x += ls1 * attn(BN(x)) [attn carries its own inner shortcut];
    x += ls2 * caffn(BN(x))."""

    dim: int = 0
    ratio: float = 4.0
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        ls1 = self.param("layer_scale_1", nn.initializers.constant(self.init_value), (self.dim,))
        ls2 = self.param("layer_scale_2", nn.initializers.constant(self.init_value), (self.dim,))
        y = _bn5(self, "norm1", x, train)
        y = MultiOrderGatedAggregation(dim=self.dim, dtype=self.dtype, name="attn")(y, train)
        x = x + ls1 * y
        y = _bn5(self, "norm2", x, train)
        y = ChannelAggregationFFN(dim=self.dim, ratio=self.ratio, dtype=self.dtype,
                                  name="mlp")(y, train)
        return x + ls2 * y


class InceptionDWConv2d(ConvBase):
    """Inception DW mixer (reference InceptionNext.py:19): identity /
    3x3 DW / 1x11 DW / 11x1 DW over (d-3gc, gc, gc, gc) with gc = d/8."""

    dim: int = 0
    band: int = 11

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        gc = int(d * 0.125)
        hb = self.band // 2
        x_id = x[..., :d - 3 * gc]
        x_hw = nn.Conv(gc, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=gc,
                       dtype=self.dtype, name="dwconv_hw")(x[..., d - 3 * gc:d - 2 * gc])
        x_w = nn.Conv(gc, (1, self.band), padding=((0, 0), (hb, hb)),
                      feature_group_count=gc, dtype=self.dtype,
                      name="dwconv_w")(x[..., d - 2 * gc:d - gc])
        x_h = nn.Conv(gc, (self.band, 1), padding=((hb, hb), (0, 0)),
                      feature_group_count=gc, dtype=self.dtype,
                      name="dwconv_h")(x[..., d - gc:])
        return jnp.concatenate([x_id, x_hw, x_w, x_h], -1)


class MetaNeXtBlock(ConvBase):
    """InceptionNeXt block (reference InceptionNext.py:89): token mixer ->
    BN -> 1x1 MLP (GELU) -> gamma layer scale -> + shortcut."""

    dim: int = 0
    ratio: float = 4.0
    ls_init: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        gamma = self.param("gamma", nn.initializers.constant(self.ls_init), (self.dim,))
        y = InceptionDWConv2d(dim=self.dim, dtype=self.dtype, name="token_mixer")(x, train)
        y = _bn5(self, "norm", y, train)
        y = nn.Conv(int(self.ratio * self.dim), (1, 1), dtype=self.dtype, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(y)
        return x + gamma * y


class InceptionNeXtBackbone(ConvBase):
    """InceptionNeXt / MetaNeXt (reference InceptionNext.py:173): k4s4 stem +
    BN, stages with (BN + k2s2 conv) downsample for i>0; emits all 4 stage
    maps (the reference's features[scale] slots)."""

    depths: Sequence[int] = (3, 3, 9, 3)    # 'tiny'
    dims: Sequence[int] = (96, 192, 384, 768)
    mlp_ratios: Sequence[float] = (4, 4, 4, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem_conv")(x)
        x = _bn5(self, "stem_bn", x, train)
        outs = []
        for st in range(4):
            if st > 0:
                x = _bn5(self, f"down{st}_bn", x, train)
                x = nn.Conv(self.dims[st], (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down{st}_conv")(x)
            for b in range(self.depths[st]):
                x = MetaNeXtBlock(dim=self.dims[st], ratio=self.mlp_ratios[st],
                                  dtype=self.dtype, name=f"s{st}_b{b}")(x, train)
            outs.append(x)
        return outs


class MogaNetBackbone(ConvBase):
    """MogaNet (reference MogaNet_backbone.py:455): stage-0 stacked conv stem
    (k3s2 BN GELU k3s2 BN), k3s2+BN patch embeds between stages, MogaBlocks,
    BN after each stage; emits all 4 stage maps."""

    embed_dims: Sequence[int] = (32, 64, 128, 256)   # 'tiny'
    depths: Sequence[int] = (3, 3, 12, 2)
    ffn_ratios: Sequence[float] = (8, 8, 4, 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for st in range(4):
            d = self.embed_dims[st]
            if st == 0:
                x = nn.Conv(d // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="stem_conv1")(x)
                x = _bn5(self, "stem_bn1", x, train)
                x = jax.nn.gelu(x, approximate=False)
                x = nn.Conv(d, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="stem_conv2")(x)
                x = _bn5(self, "stem_bn2", x, train)
            else:
                x = nn.Conv(d, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"embed{st}_conv")(x)
                x = _bn5(self, f"embed{st}_bn", x, train)
            for b in range(self.depths[st]):
                x = MogaBlockFaithful(dim=d, ratio=self.ffn_ratios[st],
                                      dtype=self.dtype, name=f"s{st}_b{b}")(x, train)
            x = _bn5(self, f"out_norm{st}", x, train)
            outs.append(x)
        return outs


# ------------------------------------------------------------------ MaxViT --

def _grid_part(x, g):
    """(B, H, W, C) -> (B*nG, g*g, C), dilated-grid token order (reference
    MaxViT.py:155 grid_partition: H splits as (g, H//g))."""
    b, h, w, c = x.shape
    x = x.reshape(b, g, h // g, g, w // g, c).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(-1, g * g, c)


def _grid_merge(t, g, h, w):
    """Inverse of _grid_part -> (B, H, W, C) (reference MaxViT.py:177)."""
    b = t.shape[0] // ((h // g) * (w // g))
    x = t.reshape(b, h // g, w // g, g, g, -1).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, h, w, -1)


def _rel_pos_index(g):
    """Pair-wise relative position index (reference MaxViT.py:205), numpy."""
    import numpy as _np

    coords = _np.stack(_np.meshgrid(_np.arange(g), _np.arange(g), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += g - 1
    rel[:, :, 1] += g - 1
    rel[:, :, 0] *= 2 * g - 1
    return rel.sum(-1)  # (g*g, g*g)


class _MaxViTMBConv(ConvBase):
    """MBConv (reference MaxViT.py:30): BN -> 1x1 -> timm
    DepthwiseSeparableConv (dw3 s{1,2} + BN + GELU + pw + BN, inner residual
    at s1) -> SqueezeExcite(0.25) -> 1x1; skip = [maxpool2 + 1x1] iff
    downscale."""

    dim: int = 0
    downscale: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        d = self.dim
        s = 2 if self.downscale else 1
        if self.downscale and (x.shape[1] % 2 or x.shape[2] % 2):
            # Odd maps: pad to even so the dw-conv and maxpool skip agree on
            # the output size (the torch reference crashes below its design
            # resolution; the added zero column/row equals the conv's own
            # zero padding, so even-size numerics are untouched).
            x = jnp.pad(x, ((0, 0), (0, x.shape[1] % 2), (0, x.shape[2] % 2),
                            (0, 0)))
        y = _bn5(self, "pre_bn", x, train)
        y = nn.Conv(c_in, (1, 1), use_bias=True, dtype=self.dtype, name="conv1")(y)
        # timm DepthwiseSeparableConv
        z = nn.Conv(c_in, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
                    feature_group_count=c_in, use_bias=False, dtype=self.dtype,
                    name="conv_dw")(y)
        z = _bn5(self, "bn1", z, train)
        z = jax.nn.gelu(z, approximate=False)
        z = nn.Conv(d, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pw")(z)
        z = _bn5(self, "bn2", z, train)
        if s == 1 and c_in == d:
            z = z + y  # DSC's internal residual
        # SqueezeExcite rd = round(d/4)
        se = z.mean(axis=(1, 2), keepdims=True)
        se = nn.Conv(int(round(d * 0.25)), (1, 1), use_bias=True,
                     dtype=self.dtype, name="se_reduce")(se)
        se = nn.Conv(d, (1, 1), use_bias=True, dtype=self.dtype,
                     name="se_expand")(jax.nn.relu(se))
        z = z * jax.nn.sigmoid(se)
        z = nn.Conv(d, (1, 1), use_bias=True, dtype=self.dtype, name="conv2")(z)
        if self.downscale:
            skip = nn.max_pool(x, (2, 2), strides=(2, 2))
            skip = nn.Conv(d, (1, 1), use_bias=True, dtype=self.dtype,
                           name="skip_conv")(skip)
        else:
            skip = x
        return z + skip


class _MaxViTTransformer(ConvBase):
    """Block/grid relative-attention transformer (reference MaxViT.py:313):
    pad to window multiples, partition, LN -> rel-pos MHSA residual,
    LN -> MLP residual, reverse, crop. LN/MLP are per-token so they run on
    the unpartitioned map; only attention needs the partition."""

    dim: int = 0
    heads: int = 32
    window: int = 7
    grid: bool = False
    ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.window
        hd = c // self.heads
        ph, pw = (g - h % g) % g, (g - w % g) % g
        hp, wp = h + ph, w + pw

        def part(t):
            if ph or pw:
                t = jnp.pad(t, ((0, 0), (0, ph), (0, pw), (0, 0)))
            return _grid_part(t, g) if self.grid else _win_part(t, g, g)

        def merge(t):
            t = (_grid_merge(t, g, hp, wp) if self.grid
                 else _win_merge(t, g, g, hp, wp))
            return t[:, :h, :w] if (ph or pw) else t

        y = part(x)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(y)
        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype, name="qkv")(y)
        bw, n, _ = y.shape
        qkv = qkv.reshape(bw, n, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        table = self.param("rel_bias", nn.initializers.zeros,
                           ((2 * g - 1) ** 2, self.heads))
        bias = table[_rel_pos_index(g).reshape(-1)].reshape(n, n, self.heads)
        attn = jax.nn.softmax((q * hd ** -0.5) @ k.transpose(0, 1, 3, 2)
                              + bias.transpose(2, 0, 1)[None], axis=-1)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(bw, n, c)
        o = nn.Dense(c, use_bias=True, dtype=self.dtype, name="proj")(o)
        x = x + merge(o)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.ratio), use_bias=True, dtype=self.dtype,
                     name="fc1")(y)
        y = nn.Dense(c, use_bias=True, dtype=self.dtype,
                     name="fc2")(jax.nn.gelu(y, approximate=False))
        return x + y


class MaxViTBackbone(ConvBase):
    """MaxViT (reference MaxViT.py:617): conv3s2+GELU+conv3s1+GELU stem
    (biased convs, no norm); 4 stages whose first block downscales; each
    block = MBConv -> window transformer -> grid transformer; emits each
    stage's final map."""

    embed_dim: int = 64
    depths: Sequence[int] = (2, 2, 5, 2)
    channels: Sequence[int] = (64, 128, 256, 512)
    num_heads: int = 32
    window: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.embed_dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=True, dtype=self.dtype, name="stem_conv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=True, dtype=self.dtype, name="stem_conv2")(x)
        x = jax.nn.gelu(x, approximate=False)
        outs = []
        for st in range(4):
            d = self.channels[st]
            for bi in range(self.depths[st]):
                pre = f"s{st}_b{bi}"
                x = _MaxViTMBConv(dim=d, downscale=(bi == 0), dtype=self.dtype,
                                  name=f"{pre}_mb")(x, train)
                x = _MaxViTTransformer(dim=d, heads=self.num_heads,
                                       window=self.window, grid=False,
                                       dtype=self.dtype, name=f"{pre}_blk")(x, train)
                x = _MaxViTTransformer(dim=d, heads=self.num_heads,
                                       window=self.window, grid=True,
                                       dtype=self.dtype, name=f"{pre}_grd")(x, train)
            outs.append(x)
        return outs
