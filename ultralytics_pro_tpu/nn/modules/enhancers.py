"""Faithful image-restoration front-ends (reference ADNet.py, IAT.py,
MB_TaylorFormer.py, HAT.py).

These serve the reference's enhancer prefix rows (`[-1, 1, ADNet, []]` etc. in
v10/v11 yamls; reference tasks.py:2873 passes [c1, *args]); each returns a
3-channel enhanced image. ``MBTaylorFormer`` (:589) is the faithful
multi-branch Taylor-attention restorer; ``HATPassthrough`` (:666) serves
HAT's yaml form (see its docstring for why the full SR net doesn't apply).
AirNet is defined nowhere in the reference nn tree (yaml-only, unbuildable
upstream) — the compact enhancer makes its yaml buildable here (COVERAGE.md).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import ConvBase


def _bn5(mod, name, x, train):
    from ultralytics_pro_tpu.nn.modules.backbones2 import BN_MOMENTUM
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        use_fast_variance=False, epsilon=1e-5, dtype=mod.dtype,
                        name=name, parent=mod)(x)


class AffChannel(ConvBase):
    """IAT color normalization (reference IAT.py:117 Aff_channel,
    channel_first): x @ color^T, then per-channel affine."""

    dim: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        alpha = self.param("alpha", nn.initializers.ones, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        color = self.param("color", lambda k, s: jnp.eye(self.dim),
                           (self.dim, self.dim))
        y = jnp.tensordot(x, color, axes=[[-1], [-1]])
        return y * alpha + beta


class CBlockLN(ConvBase):
    """IAT local conv block (reference IAT.py:166 CBlock_ln): dw3 pos-embed,
    Aff_channel norm, 1x1 -> dw5 -> 1x1 attention path and a 1x1 CMlp, both
    layer-scaled (1e-4)."""

    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = x + nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=c, dtype=self.dtype,
                        name="pos_embed")(x)
        g1 = self.param("gamma_1", nn.initializers.constant(1e-4), (c,))
        g2 = self.param("gamma_2", nn.initializers.constant(1e-4), (c,))
        y = AffChannel(dim=c, dtype=self.dtype, name="norm1")(x, train)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv1")(y)
        y = nn.Conv(c, (5, 5), padding=((2, 2), (2, 2)), feature_group_count=c,
                    dtype=self.dtype, name="attn")(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv2")(y)
        x = x + g1 * y
        y = AffChannel(dim=c, dtype=self.dtype, name="norm2")(x, train)
        y = jax.nn.gelu(nn.Conv(int(c * self.mlp_ratio), (1, 1),
                                dtype=self.dtype, name="fc1")(y),
                        approximate=False)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(y)
        return x + g2 * y


class IAT(ConvBase):
    """Faithful Illumination-Adaptive Transformer (reference IAT.py:398 IAT,
    type 'lol'): Local_pred_S predicts per-pixel mul/add maps through two
    3-CBlock branches off a shared LeakyReLU stem; Global_pred predicts a
    3x3 color matrix and gamma from 10 learnable queries attending over a
    stride-4 conv embedding; output = clamp((x*mul + add) @ color^T)^gamma."""

    dim: int = 16
    global_dim: int = 64
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        img1 = nn.Conv(d, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv1")(x)
        img1 = jnp.where(img1 >= 0, img1, 0.2 * img1)  # LeakyReLU(0.2)
        mul = img1
        add = img1
        for i in range(3):
            mul = CBlockLN(dtype=self.dtype, name=f"mul{i}")(mul, train)
            add = CBlockLN(dtype=self.dtype, name=f"add{i}")(add, train)
        mul = mul + img1
        add = add + img1
        mul = jax.nn.relu(nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)),
                                  dtype=self.dtype, name="mul_end")(mul))
        add = jnp.tanh(nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)),
                               dtype=self.dtype, name="add_end")(add))
        img_high = x * mul + add

        # --- Global_pred (reference IAT.py:73)
        gd = self.global_dim
        g = nn.Conv(gd // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="ge_conv1")(x)
        g = jax.nn.gelu(_bn5(self, "ge_bn1", g, train), approximate=False)
        g = nn.Conv(gd, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="ge_conv2")(g)
        g = _bn5(self, "ge_bn2", g, train)
        g = g + nn.Conv(gd, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=gd, dtype=self.dtype,
                        name="gen_pos")(g)
        b, hh, ww, _ = g.shape
        t = g.reshape(b, hh * ww, gd)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="gen_norm1")(t)
        # query attention: 10 learnable queries over the embedded tokens
        nh = self.num_heads
        hd = gd // nh
        q = self.param("q", nn.initializers.ones, (10, gd))
        k = nn.Dense(gd, use_bias=False, dtype=self.dtype, name="gen_k")(y)
        v = nn.Dense(gd, use_bias=False, dtype=self.dtype, name="gen_v")(y)
        qh = jnp.broadcast_to(q.astype(y.dtype), (b, 10, gd))
        qh = qh.reshape(b, 10, nh, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
        att = jax.nn.softmax((qh @ kh.transpose(0, 1, 3, 2)) * (hd ** -0.5), -1)
        t = (att @ vh).transpose(0, 2, 1, 3).reshape(b, 10, gd)
        t = nn.Dense(gd, dtype=self.dtype, name="gen_proj")(t)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="gen_norm2")(t)
        y = jax.nn.gelu(nn.Dense(gd * 4, dtype=self.dtype, name="gen_fc1")(y),
                        approximate=False)
        t = t + nn.Dense(gd, dtype=self.dtype, name="gen_fc2")(y)

        gamma_base = self.param("gamma_base", nn.initializers.ones, (1,))
        color_base = self.param("color_base", lambda kk, s: jnp.eye(3), (3, 3))
        gamma = nn.Dense(1, dtype=self.dtype,
                         name="gamma_linear")(t[:, :1])[:, 0, 0] + gamma_base[0]
        color = nn.Dense(1, dtype=self.dtype,
                         name="color_linear")(t[:, 1:])[..., 0].reshape(b, 3, 3)
        color = color + color_base

        hi = jnp.einsum("bhwc,boc->bhwo", img_high.astype(jnp.float32),
                        color.astype(jnp.float32))
        hi = jnp.clip(hi, 1e-8, 1.0) ** gamma[:, None, None, None].astype(jnp.float32)
        return hi.astype(x.dtype)


class RIDNET(ConvBase):
    """Faithful RIDNet denoiser (reference RIDNet.py:209): fixed MeanShift
    1x1 convs around a 16-feature trunk; ONE EAM block is used by the
    forward (b4 — the reference constructs b1-b3 but never calls them):
    Merge_Run_dual (parallel dilated conv chains, concat-fused, residual) ->
    ResidualBlock -> EResidualBlock -> channel attention; conv3 tail +
    global residual."""

    feats: int = 16

    def _c(self, x, c2, k, name, d=1):
        p = (k // 2) * d
        return nn.Conv(c2, (k, k), padding=((p, p), (p, p)),
                       kernel_dilation=(d, d), dtype=self.dtype, name=name,
                       parent=self)(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.feats
        relu = jax.nn.relu
        s = self._c(x, 3, 1, "sub_mean")
        h = relu(self._c(s, f, 3, "head"))
        # Merge_Run_dual
        o1 = relu(self._c(relu(self._c(h, f, 3, "r1_b1_0")), f, 3, "r1_b1_2", d=2))
        o2 = relu(self._c(relu(self._c(h, f, 3, "r1_b2_0", d=3)), f, 3, "r1_b2_2", d=4))
        r1 = relu(self._c(jnp.concatenate([o1, o2], -1), f, 3, "r1_b3")) + h
        # ResidualBlock
        r2 = relu(self._c(relu(self._c(r1, f, 3, "r2_0")), f, 3, "r2_2") + r1)
        # EResidualBlock
        y = relu(self._c(r2, f, 3, "r3_0"))
        y = relu(self._c(y, f, 3, "r3_2"))
        r3 = relu(self._c(y, f, 1, "r3_4") + r2)
        # CALayer
        g = r3.mean(axis=(1, 2), keepdims=True)
        g = relu(self._c(g, f // 16 if f >= 16 else 1, 1, "ca_c1"))
        g = jax.nn.sigmoid(self._c(g, f, 1, "ca_c2"))
        b = r3 * g
        res = self._c(b, 3, 3, "tail")
        return self._c(res, 3, 1, "add_mean") + x


class FFA(ConvBase):
    """Faithful FFA-Net dehazer (reference FFANet.py:74, gps=3, dim=8,
    blocks=1): three residual groups (Block = conv-relu residual + conv +
    channel attention + pixel attention, residual), fused by a learned
    per-group channel-attention weighting, pixel attention, conv tail +
    global residual."""

    dim: int = 8
    blocks: int = 1

    def _c(self, x, c2, k, name):
        p = k // 2
        return nn.Conv(c2, (k, k), padding=((p, p), (p, p)), dtype=self.dtype,
                       name=name, parent=self)(x)

    def _pa(self, x, prefix):
        c = x.shape[-1]
        y = jax.nn.relu(self._c(x, max(c // 8, 1), 1, f"{prefix}_0"))
        return x * jax.nn.sigmoid(self._c(y, 1, 1, f"{prefix}_2"))

    def _ca(self, x, prefix):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2), keepdims=True)
        y = jax.nn.relu(self._c(y, max(c // 8, 1), 1, f"{prefix}_0"))
        return x * jax.nn.sigmoid(self._c(y, c, 1, f"{prefix}_2"))

    def _block(self, x, prefix):
        d = self.dim
        res = jax.nn.relu(self._c(x, d, 3, f"{prefix}_conv1")) + x
        res = self._c(res, d, 3, f"{prefix}_conv2")
        res = self._ca(res, f"{prefix}_ca")
        res = self._pa(res, f"{prefix}_pa")
        return res + x

    def _group(self, x, g):
        y = x
        for b in range(self.blocks):
            y = self._block(y, f"g{g}_b{b}")
        return self._c(y, self.dim, 3, f"g{g}_tail") + x

    @nn.compact
    def __call__(self, x1, train: bool = False):
        d = self.dim
        x = self._c(x1, d, 3, "pre")
        r1 = self._group(x, 1)
        r2 = self._group(r1, 2)
        r3 = self._group(r2, 3)
        w = jnp.concatenate([r1, r2, r3], -1).mean(axis=(1, 2), keepdims=True)
        w = jax.nn.relu(self._c(w, d // 4, 1, "fca_1"))
        w = jax.nn.sigmoid(self._c(w, d * 3, 1, "fca_3"))
        w = w.reshape(-1, 1, 1, 3, d)
        out = w[..., 0, :] * r1 + w[..., 1, :] * r2 + w[..., 2, :] * r3
        out = self._pa(out, "pa")
        out = self._c(self._c(out, d, 3, "post0"), 3, 3, "post1")
        return out + x1


class RFAConvE(ConvBase):
    """CPA's receptive-field-attention conv (reference CPA.py:10): per-pixel
    softmax over a 3x3 grouped-conv feature bank (weighted by an avg-pooled
    grouped 1x1 score), unfolded to a 3x-resolution grid and reduced by a
    stride-3 conv+BN+ReLU."""

    c2: int = 4
    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        k = self.k
        # scores: avg_pool (count_include_pad) -> grouped 1x1
        xp = jnp.pad(x, ((0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)))
        sc = nn.avg_pool(xp, (k, k), strides=(1, 1))
        sc = nn.Conv(c * k * k, (1, 1), use_bias=False, feature_group_count=c,
                     dtype=self.dtype, name="gw_pw")(sc)
        sc = jax.nn.softmax(sc.reshape(b, h, w, c, k * k).astype(jnp.float32),
                            -1).astype(x.dtype)
        ft = nn.Conv(c * k * k, (k, k), padding=((k // 2, k // 2),) * 2,
                     use_bias=False, feature_group_count=c, dtype=self.dtype,
                     name="gf_conv")(x)
        ft = jax.nn.relu(_bn5(self, "gf_bn", ft, train))
        y = ft.reshape(b, h, w, c, k * k) * sc
        y = y.reshape(b, h, w, c, k, k).transpose(0, 1, 4, 2, 5, 3)
        y = y.reshape(b, h * k, w * k, c)
        y = nn.Conv(self.c2, (k, k), strides=(k, k), dtype=self.dtype,
                    name="out_conv")(y)
        return jax.nn.relu(_bn5(self, "out_bn", y, train))


class CPATransformerBlock(ConvBase):
    """Restormer-style transformer block used inside CPA's prompt blocks
    (reference CPA.py:101; NOTE the reference stores these in a plain python
    list so their weights are never registered/saved — ours are proper
    params, which strictly dominates that behavior)."""

    num_heads: int = 1
    ffn_factor: float = 2.66

    def _ln(self, x, name):
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name,
                            parent=self)(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = self.num_heads
        ch = c // nh
        temp = self.param("temperature", nn.initializers.ones, (nh,))
        y = self._ln(x, "norm1")
        qkv = nn.Conv(3 * c, (1, 1), use_bias=False, dtype=self.dtype,
                      name="qkv")(y)
        qkv = nn.Conv(3 * c, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                      feature_group_count=3 * c, dtype=self.dtype,
                      name="qkv_dw")(qkv)
        q, kk, v = jnp.split(qkv, 3, -1)

        def heads(z):  # (B,H,W,C) -> (B, nh, ch, HW), channel-major per head
            return z.reshape(b, h * w, nh, ch).transpose(0, 2, 3, 1)

        qh, kh, vh = heads(q), heads(kk), heads(v)
        qn = qh / jnp.maximum(jnp.sqrt((qh.astype(jnp.float32) ** 2)
                                       .sum(-1, keepdims=True)), 1e-12).astype(qh.dtype)
        kn = kh / jnp.maximum(jnp.sqrt((kh.astype(jnp.float32) ** 2)
                                       .sum(-1, keepdims=True)), 1e-12).astype(kh.dtype)
        att = jax.nn.softmax(
            (qn @ kn.transpose(0, 1, 3, 2)) * temp[None, :, None, None].astype(qn.dtype), -1)
        o = (att @ vh).transpose(0, 3, 1, 2).reshape(b, h, w, c)
        x = x + nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        name="proj_out")(o)
        y = self._ln(x, "norm2")
        hid = int(c * self.ffn_factor)
        y = nn.Conv(2 * hid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="ffn_in")(y)
        y = nn.Conv(2 * hid, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    feature_group_count=2 * hid, dtype=self.dtype,
                    name="ffn_dw")(y)
        y1, y2 = jnp.split(y, 2, -1)
        y = jax.nn.gelu(y1, approximate=False) * y2
        return x + nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                           name="ffn_out")(y)


class CPAPromptBlock(ConvBase):
    """CPA content-driven prompt block (reference CPA.py:273): channel +
    spatial attention fused, channel-shuffled, 7x7 grouped conv -> sigmoid
    prompt weighting of a bilinear-resized learned prompt; concat + 1x1 and
    4 split-wise transformer blocks."""

    prompt_dim: int = 32
    num_splits: int = 4

    @nn.compact
    def __call__(self, x, prompt, train: bool = False):
        b, h, w, c = x.shape
        # channel attention (no sigmoid) — reference CPA.py:72
        g = x.mean(axis=(1, 2), keepdims=True)
        g = jax.nn.relu(nn.Conv(c // 8 if c >= 8 else 1, (1, 1),
                                dtype=self.dtype, name="ca_0")(g))
        cattn = nn.Conv(c, (1, 1), dtype=self.dtype, name="ca_2")(g) * x
        # spatial attention — reference CPA.py:60
        s2 = jnp.concatenate([x.mean(-1, keepdims=True),
                              x.max(-1, keepdims=True)], -1)
        s2 = jnp.pad(s2, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        sattn = nn.Conv(1, (7, 7), padding="VALID", dtype=self.dtype, name="sa")(s2) * x
        p1 = sattn + cattn
        x2 = jnp.stack([x, p1], -1).reshape(b, h, w, 2 * c)  # (c, t) layout
        # Channel_Shuffle(2): out[i*2+g] = in[g*c+i]
        x2 = x2.reshape(b, h, w, 2, c).transpose(0, 1, 2, 4, 3).reshape(b, h, w, 2 * c)
        x2 = jnp.pad(x2, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        p2 = nn.Conv(c, (7, 7), padding="VALID", feature_group_count=c,
                     dtype=self.dtype, name="pa2")(x2)
        pw = jax.nn.sigmoid(nn.Conv(self.prompt_dim, (1, 1), use_bias=False,
                                    dtype=self.dtype, name="conv1x1")(p2))
        prompt = jax.image.resize(prompt, (prompt.shape[0], h, w,
                                           prompt.shape[-1]), method="linear")
        prompt = jnp.broadcast_to(prompt, (b, h, w, self.prompt_dim))
        prompt = pw * prompt
        prompt = nn.Conv(self.prompt_dim, (3, 3), padding=((1, 1), (1, 1)),
                         use_bias=False, dtype=self.dtype, name="conv3x3")(prompt)
        y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="out_conv1")(jnp.concatenate([x, prompt], -1))
        cs = c // self.num_splits
        outs = [CPATransformerBlock(dtype=self.dtype, name=f"tb{i}")(
            y[..., i * cs:(i + 1) * cs], train) for i in range(self.num_splits)]
        return jnp.concatenate(outs, -1)


def _conv_transpose3s2p1(x, w, bias):
    """torch ConvTranspose2d(k3, s2, p1): out = 2*in - 1. w: torch layout
    (in, out, 3, 3)."""
    k = jnp.flip(jnp.asarray(w), (2, 3)).transpose(2, 3, 0, 1)
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.asarray(bias, x.dtype)


class CPAArch(ConvBase):
    """Faithful CPA-Enhancer (reference CPA.py:319 CPA_arch): an RFAConv
    U-Net (PixelUnshuffle/Shuffle up/down) with content-driven prompt blocks
    at the three decoder scales, fed by a chain of ConvTranspose prompt
    generators off a learned (128, 32, 32) prompt."""

    dim: int = 4
    prompt_inch: int = 128
    prompt_size: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        pc = self.prompt_inch
        p0 = self.param("prompt_param_ini",
                        nn.initializers.uniform(1.0),
                        (self.prompt_size, self.prompt_size, pc))
        prompts = [p0[None]]
        cur = p0[None]
        for i in range(3):
            wt = self.param(f"chain{i}_w", nn.initializers.lecun_normal(),
                            (pc // (2 ** i), pc // (2 ** (i + 1)), 3, 3))
            bt = self.param(f"chain{i}_b", nn.initializers.zeros,
                            (pc // (2 ** (i + 1)),))
            cur = _conv_transpose3s2p1(cur, wt, bt)
            prompts.append(cur)

        def down(z, name):
            c = z.shape[-1]
            z = nn.Conv(c // 2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=name)(z)
            b, h, w, cc = z.shape
            z = z.reshape(b, h // 2, 2, w // 2, 2, cc)
            return z.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, cc * 4)

        def up(z, name):
            c = z.shape[-1]
            z = nn.Conv(c * 2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=name)(z)
            b, h, w, cc = z.shape
            z = z.reshape(b, h, w, cc // 4, 2, 2)
            return z.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * 2, w * 2, cc // 4)

        x0 = RFAConvE(c2=d, dtype=self.dtype, name="conv0")(x, train)
        x1 = RFAConvE(c2=d, dtype=self.dtype, name="conv1")(x0, train)
        x2 = RFAConvE(c2=d * 2, dtype=self.dtype, name="conv2")(down(x1, "down1"), train)
        x3 = RFAConvE(c2=d * 4, dtype=self.dtype, name="conv3")(down(x2, "down2"), train)
        x4 = RFAConvE(c2=d * 8, dtype=self.dtype, name="conv4")(down(x3, "down3"), train)
        x4p = CPAPromptBlock(prompt_dim=pc, dtype=self.dtype,
                             name="prompt3")(x4, prompts[0], train)
        x5 = RFAConvE(c2=d * 4, dtype=self.dtype, name="conv5")(
            jnp.concatenate([up(x4p, "up3"), x3], -1), train)
        x5p = CPAPromptBlock(prompt_dim=pc // 2, dtype=self.dtype,
                             name="prompt2")(x5, prompts[1], train)
        x6 = RFAConvE(c2=d * 2, dtype=self.dtype, name="conv6")(
            jnp.concatenate([up(x5p, "up2"), x2], -1), train)
        x6p = CPAPromptBlock(prompt_dim=pc // 4, dtype=self.dtype,
                             name="prompt1")(x6, prompts[2], train)
        return RFAConvE(c2=3, dtype=self.dtype, name="conv7")(
            jnp.concatenate([up(x6p, "up1"), x1], -1), train)


class ADNet(ConvBase):
    """Faithful attention-guided denoising network (reference ADNet.py:5):
    15 conv3-BN-ReLU layers (dilation 2 at layers 2/5/9/12), a conv3 to 3
    channels, then the attention branch — tanh(cat[x, n]) -> 1x1 -> gate *
    n — subtracted from the input (residual denoise)."""

    features: int = 16
    dilated: Any = (2, 5, 9, 12)

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x
        for i in range(1, 16):
            d = 2 if i in self.dilated else 1
            y = nn.Conv(self.features, (3, 3), padding=((d, d), (d, d)),
                        kernel_dilation=(d, d), use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(y)
            y = jax.nn.relu(_bn5(self, f"bn{i}", y, train))
        n = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv16")(y)
        g = jnp.tanh(jnp.concatenate([x, n], -1))
        g = nn.Conv(3, (1, 1), dtype=self.dtype, name="conv_gate")(g)
        return x - g * n


def _bf_ln(mod, name, x):
    """BiasFree_LayerNorm (reference TaylorFormer.py:26): x scaled by
    1/sqrt(var+1e-5) * weight — variance about the mean, but the mean is NOT
    subtracted from x."""
    c = x.shape[-1]
    w = mod.param(name, nn.initializers.ones, (c,))
    var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x / jnp.sqrt(var + 1e-5)).astype(x.dtype) * w


_TAYLOR_CRPE = {1: ((3, 1),), 2: ((3, 2),), 4: ((3, 2), (5, 2)),
                8: ((3, 2), (5, 3), (7, 3))}


class TaylorAttention(ConvBase):
    """MB-TaylorFormer Taylor-expanded linear attention (reference
    TaylorFormer.py:159): 1x1+dw3 qkv, per-token L2-normalized q/k, the
    first-order Taylor softmax N + qK^T v numerator / denominator form,
    per-head temperature, and a sigmoid CRPE refinement conv over [q;k]."""

    dim: int = 6
    num_heads: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, hh, ww, c = x.shape
        nh = self.num_heads
        ch = c // nh
        n = hh * ww
        qkv = nn.Conv(3 * c, (1, 1), use_bias=False, dtype=self.dtype,
                      name="qkv")(x)
        qkv = nn.Conv(3 * c, (3, 3), padding=((1, 1), (1, 1)),
                      feature_group_count=3 * c, use_bias=False,
                      dtype=self.dtype, name="qkv_dw")(qkv)
        q, k, v = jnp.split(qkv.reshape(b, n, 3 * c), 3, axis=-1)

        def heads(t):
            return t.reshape(b, n, nh, ch).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        q = q / (jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                                 keepdims=True).astype(q.dtype) + 1e-6)
        k = k / (jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                                 keepdims=True).astype(k.dtype) + 1e-6)

        # CRPE refinement over channel-concatenated per-head [q;k] maps
        qk = jnp.concatenate([q, k], -1)  # (b, nh, n, 2ch)
        qk = qk.transpose(0, 2, 1, 3).reshape(b, hh, ww, nh * 2 * ch)
        outs, start = [], 0
        for wi, (win, hs) in enumerate(_TAYLOR_CRPE[nh]):
            seg = qk[..., start:start + hs * 2 * ch]
            start += hs * 2 * ch
            p = win // 2
            outs.append(nn.Conv(hs, (win, win), padding=((p, p), (p, p)),
                                feature_group_count=hs, dtype=self.dtype,
                                name=f"crpe{wi}")(seg))
        refine = jax.nn.sigmoid(jnp.concatenate(outs, -1))  # (b, hh, ww, nh)
        refine = refine.reshape(b, n, nh, 1).transpose(0, 2, 1, 3)

        kv = k.transpose(0, 1, 3, 2) @ v  # (b, nh, ch, ch)
        num = v.sum(axis=2, keepdims=True) + q @ kv
        den = float(n) + q @ k.sum(axis=2)[..., None] + 1e-6
        temp = self.param("temperature", nn.initializers.ones, (nh, 1, 1))
        y = num / den * temp * refine
        y = y.transpose(0, 2, 1, 3).reshape(b, hh, ww, c)
        return nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                       name="proj")(y)


class TaylorFFN(ConvBase):
    """GDFN gated-dwconv FFN (reference TaylorFormer.py:77)."""

    dim: int = 6
    factor: float = 2.66

    @nn.compact
    def __call__(self, x, train: bool = False):
        hid = int(self.dim * self.factor)
        y = nn.Conv(2 * hid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fc1")(x)
        y = nn.Conv(2 * hid, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=2 * hid, use_bias=False,
                    dtype=self.dtype, name="dw")(y)
        g, v = y[..., :hid], y[..., hid:]
        return nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                       name="fc2")(jax.nn.gelu(g, approximate=False) * v)


class TaylorPatchEmbed(ConvBase):
    """DWCPatchEmbed (reference TaylorFormer.py:471 DWConv2d_BN): depthwise
    offset head -> clamped deformable depthwise 3x3 -> pointwise -> Hardswish
    (the commented-out BN is dead upstream — none here either)."""

    out: int = 6
    clamp: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.ops.deform import deform_conv2d

        c = x.shape[-1]
        off = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                      feature_group_count=c, use_bias=False, dtype=self.dtype,
                      name="off_dw")(x)
        off = nn.Conv(18, (1, 1), use_bias=False, dtype=self.dtype,
                      name="off_pw")(off)
        off = jnp.clip(off, -self.clamp, self.clamp)
        w = self.param("dcn", nn.initializers.normal(0.1), (3, 3, 1, c))
        y = deform_conv2d(x, off, w, padding=1, groups=c)
        y = nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw")(y)
        return jax.nn.hard_swish(y)


class MBTaylorFormer(ConvBase):
    """Faithful MB-TaylorFormer (reference TaylorFormer.py:674, the yaml
    defaults: dims (6,12,24,36), blocks (1,1,1,1), heads (1,1,1,1),
    num_path 1, dual_pixel_task=True): 4-level U-Net of Taylor linear
    attention blocks with deformable-dwconv patch embeds, pixel-unshuffle
    down / pixel-shuffle up (dw3+pw conv before each), skip concats with 1x1
    reductions on levels 3/2, a level-1 decoder at 2*dim0, refinement stage,
    dual-pixel skip conv and a 3-channel output conv. With num_path=1 the
    SKFF aggregator is a forward identity (softmax over one branch); its
    dead parameters are not reproduced."""

    dims: Any = (6, 12, 24, 36)
    num_blocks: Any = (1, 1, 1, 1)
    heads: Any = (1, 1, 1, 1)

    def _stage(self, x, dim, blocks, heads, name, train):
        y = TaylorPatchEmbed(out=dim, dtype=self.dtype, name=f"{name}_pe")(
            x, train)
        for i in range(blocks):
            t = _bf_ln(self, f"{name}_b{i}_ln1", y)
            y = y + TaylorAttention(dim=dim, num_heads=heads, dtype=self.dtype,
                                    name=f"{name}_b{i}_attn")(t, train)
            t = _bf_ln(self, f"{name}_b{i}_ln2", y)
            y = y + TaylorFFN(dim=dim, dtype=self.dtype,
                              name=f"{name}_b{i}_ffn")(t, train)
        return y + x

    def _down(self, x, out, name):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                    use_bias=False, dtype=self.dtype, name=f"{name}_dw")(x)
        x = nn.Conv(out // 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f"{name}_pw")(x)
        b, h, w, cc = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, cc)
        return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, 4 * cc)

    def _up(self, x, out, name):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                    use_bias=False, dtype=self.dtype, name=f"{name}_dw")(x)
        x = nn.Conv(out * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f"{name}_pw")(x)
        b, h, w, cc = x.shape
        x = x.reshape(b, h, w, cc // 4, 2, 2)
        return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, 2 * h, 2 * w, cc // 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dims
        nb, hd = self.num_blocks, self.heads
        e1 = nn.Conv(d[0], (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     dtype=self.dtype, name="embed")(x)
        l1 = self._stage(e1, d[0], nb[0], hd[0], "enc1", train)
        l2 = self._stage(self._down(l1, d[1], "down12"), d[1], nb[1], hd[1],
                         "enc2", train)
        l3 = self._stage(self._down(l2, d[2], "down23"), d[2], nb[2], hd[2],
                         "enc3", train)
        lat = self._stage(self._down(l3, d[3], "down34"), d[3], nb[3], hd[3],
                          "latent", train)
        d3 = jnp.concatenate([self._up(lat, d[2], "up43"), l3], -1)
        d3 = nn.Conv(d[2], (1, 1), use_bias=False, dtype=self.dtype,
                     name="reduce3")(d3)
        d3 = self._stage(d3, d[2], nb[2], hd[2], "dec3", train)
        d2 = jnp.concatenate([self._up(d3, d[1], "up32"), l2], -1)
        d2 = nn.Conv(d[1], (1, 1), use_bias=False, dtype=self.dtype,
                     name="reduce2")(d2)
        d2 = self._stage(d2, d[1], nb[1], hd[1], "dec2", train)
        d1 = jnp.concatenate([self._up(d2, d[0], "up21"), l1], -1)
        d1 = self._stage(d1, d[1], nb[0], hd[0], "dec1", train)
        d1 = self._stage(d1, d[1], nb[0], hd[0], "refine", train)
        d1 = d1 + nn.Conv(d[1], (1, 1), use_bias=False, dtype=self.dtype,
                          name="skip")(e1)
        return nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                       dtype=self.dtype, name="out")(d1)


class HATPassthrough(ConvBase):
    """The reference HAT yaml module IS an identity at forward time: with the
    yaml's default args, upsampler='' and HAT.forward (reference
    HAttention.py:956-967) only runs the network body under
    upsampler=='pixelshuffle' — otherwise it computes
    (x - mean) * img_range ... / img_range + mean = x, touching none of the
    constructed parameters. Reproduced exactly (without the dead weights)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x
