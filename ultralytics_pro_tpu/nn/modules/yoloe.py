"""YOLOE building blocks — flax.linen, NHWC.

Behavioral parity with the reference YOLOE modules (ultralytics/nn/modules/
block.py: SwiGLUFFN:2263, Residual:2286, SAVPE:2307), redesigned for XLA:
the SAVPE per-prompt score/aggregate runs as one batched einsum instead of a
B*Q reshape loop, and all shapes are static (Q fixed per trace).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase


class SwiGLUFFN(ConvBase):
    """SwiGLU feed-forward (reference block.py:2263): w12 -> chunk ->
    silu(x1)*x2 -> w3. zero_out initializes w3 to zeros so a Residual wrap
    starts as identity (reference Residual:2286 zero-inits w3)."""

    ec: int = 512
    e: int = 4
    zero_out: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x12 = nn.Dense(self.e * self.ec, dtype=self.dtype, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        hidden = jax.nn.silu(x1) * x2
        init = nn.initializers.zeros if self.zero_out else nn.initializers.lecun_normal()
        return nn.Dense(self.ec, dtype=self.dtype, name="w3", kernel_init=init,
                        bias_init=nn.initializers.zeros)(hidden)


class Residual(ConvBase):
    """x + m(x) (reference block.py:2286). Used with zero_out SwiGLUFFN so the
    text-prompt adapter starts as identity."""

    ec: int = 512
    e: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x + SwiGLUFFN(ec=self.ec, e=self.e, zero_out=True,
                             dtype=self.dtype, name="m")(x, train)


class SAVPE(ConvBase):
    """Spatial-Aware Visual Prompt Embedding (reference block.py:2307).

    Takes the 3 head feature maps and Q binary prompt masks at P3 resolution,
    and emits one normalized embedding per prompt: per-prompt spatial attention
    scores (cv4/cv5/cv6 over mask+features, softmax over valid mask pixels)
    aggregate the cv3 embedding projection. The reference's (B*Q, ...) reshape
    dance becomes a single einsum over a (B, Q, c, HW) score tensor.
    """

    c3: int = 64
    embed: int = 512
    c: int = 16

    @nn.compact
    def __call__(self, feats, vp, train: bool = False):
        """feats: 3 NHWC maps at strides 8/16/32; vp: (B, Q, h3, w3) binary.
        Returns (B, Q, embed) L2-normalized."""
        b, h, w = feats[0].shape[0], feats[0].shape[1], feats[0].shape[2]
        q = vp.shape[1]

        # cv1: 2x Conv3x3 per level, upsampled to P3 size
        xs = []
        ys = []
        for i, f in enumerate(feats):
            xi = Conv(c2=self.c3, k=3, dtype=self.dtype, name=f"cv1_{i}_0")(f, train)
            xi = Conv(c2=self.c3, k=3, dtype=self.dtype, name=f"cv1_{i}_1")(xi, train)
            yi = Conv(c2=self.c3, k=1, dtype=self.dtype, name=f"cv2_{i}")(f, train)
            if i > 0:
                s = 2 ** i
                xi = jnp.repeat(jnp.repeat(xi, s, axis=1), s, axis=2)
                yi = jnp.repeat(jnp.repeat(yi, s, axis=1), s, axis=2)
            xs.append(xi)
            ys.append(yi)
        x = nn.Conv(self.embed, (1, 1), dtype=self.dtype, name="cv3")(jnp.concatenate(xs, -1))
        y = nn.Conv(self.c, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="cv4")(jnp.concatenate(ys, -1))  # (B, h, w, c)

        vp_f = vp.astype(x.dtype)  # (B, Q, h, w)
        vp_img = vp_f.reshape(b * q, h, w, 1)
        vpe = nn.Conv(self.c, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                      name="cv5")(vp_img)  # (B*Q, h, w, c)
        y_q = jnp.broadcast_to(y[:, None], (b, q, h, w, self.c)).reshape(b * q, h, w, self.c)
        z = jnp.concatenate([y_q, vpe], axis=-1)
        z = Conv(c2=self.c, k=3, dtype=self.dtype, name="cv6_0")(z, train)
        z = nn.Conv(self.c, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="cv6_1")(z)

        score = z.reshape(b, q, h * w, self.c)  # channel-last
        mask = vp_f.reshape(b, q, h * w, 1)
        neg = jnp.finfo(score.dtype).min
        score = jnp.where(mask > 0, score * mask, neg)
        score = jax.nn.softmax(score, axis=2)  # over spatial, per (B, Q, c)

        # aggregate: embed split into c groups of (embed//c); score channel k
        # attends group k (reference: score.transpose @ x-chunks)
        xg = x.reshape(b, h * w, self.c, self.embed // self.c)
        agg = jnp.einsum("bqsc,bscd->bqcd", score, xg).reshape(b, q, self.embed)
        return agg / (jnp.linalg.norm(agg, axis=-1, keepdims=True) + 1e-12)
