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
