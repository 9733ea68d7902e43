"""Faithful image-restoration front-ends (reference ADNet.py, IAT.py).

These serve the reference's enhancer prefix rows (`[-1, 1, ADNet, []]` etc. in
v10/v11 yamls; reference tasks.py:2873 passes [c1, *args]); each returns a
3-channel enhanced image. The remaining restoration families
(AirNet/FFA/HAT/RIDNET/MB_TaylorFormer/CPA_arch) are still served by the
declared-approximation zoo_r3.ImageEnhancer (COVERAGE.md).
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
