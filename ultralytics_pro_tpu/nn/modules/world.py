"""YOLO-World modules: text-guided attention blocks + open-vocabulary head.

Behavioral parity with the reference world-model blocks (ultralytics/nn/modules/
block.py: MaxSigmoidAttnBlock:853, C2fAttn:905, ImagePoolingAttn:971,
ContrastiveHead:1036, BNContrastiveHead:1062; head.py WorldDetect:1534;
tasks.py WorldModel:1744 set_classes via CLIP text embeddings).

Text encoding: `encode_text` uses the transformers CLIP text tower when its
weights are locally available; otherwise a deterministic random-projection
embedding keeps the full pipeline runnable in hermetic environments (clearly
NOT semantically meaningful — swap in CLIP for real open-vocabulary use).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.block import Bottleneck
from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase
from ultralytics_pro_tpu.utils import LOGGER


class MaxSigmoidAttnBlock(ConvBase):
    """Max-sigmoid text-guided attention (reference block.py:853)."""

    c2: int = 0
    nh: int = 1
    ec: int = 128
    gc: int = 512
    use_scale: bool = False

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        b, h, w, c1 = x.shape
        hc = self.c2 // self.nh
        g = nn.Dense(self.ec, dtype=self.dtype, name="gl")(guide)  # (B, T, ec)
        g = g.reshape(b, -1, self.nh, self.ec // self.nh)
        embed = x if c1 == self.ec else Conv(c2=self.ec, k=1, act=False, dtype=self.dtype, name="ec")(x, train)
        embed = embed.reshape(b, h, w, self.nh, self.ec // self.nh)
        aw = jnp.einsum("bhwmc,bnmc->bmhwn", embed, g).max(axis=-1)  # (B, nh, H, W)
        aw = aw / (hc**0.5) + self.param("bias", nn.initializers.zeros, (self.nh,))[None, :, None, None]
        aw = jax.nn.sigmoid(aw)
        if self.use_scale:
            aw = aw * self.param("scale", nn.initializers.ones, (1, self.nh, 1, 1))
        y = Conv(c2=self.c2, k=3, act=False, dtype=self.dtype, name="proj_conv")(x, train)
        y = y.reshape(b, h, w, self.nh, hc) * aw.transpose(0, 2, 3, 1)[..., None]
        return y.reshape(b, h, w, self.c2)


class C2fAttn(ConvBase):
    """C2f + text-guided attention tail (reference block.py:905)."""

    c2: int = 0
    n: int = 1
    ec: int = 128
    nh: int = 1
    gc: int = 512
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(Bottleneck(c2=c, shortcut=self.shortcut, g=self.g, k=(3, 3), e=1.0,
                                 dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        ys.append(MaxSigmoidAttnBlock(c2=c, gc=self.gc, ec=self.ec, nh=self.nh,
                                      dtype=self.dtype, name="attn")(ys[-1], guide, train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


def _adaptive_max_pool(p, k: int):
    """torch AdaptiveMaxPool2d((k, k)) semantics: per-cell max over
    floor/ceil-partitioned windows; works for maps smaller than k too."""
    import math

    b, h, w, c = p.shape
    rows = [(math.floor(i * h / k), max(math.ceil((i + 1) * h / k), math.floor(i * h / k) + 1))
            for i in range(k)]
    cols = [(math.floor(j * w / k), max(math.ceil((j + 1) * w / k), math.floor(j * w / k) + 1))
            for j in range(k)]
    cells = [p[:, r0:r1, c0:c1].max(axis=(1, 2)) for r0, r1 in rows for c0, c1 in cols]
    return jnp.stack(cells, axis=1).reshape(b, k, k, c)


class ImagePoolingAttn(ConvBase):
    """Image-aware text-embedding refinement (reference block.py:971)."""

    ec: int = 256
    ct: int = 512
    nh: int = 8
    k: int = 3
    use_scale: bool = False

    @nn.compact
    def __call__(self, feats: List, text, train: bool = False):
        b = feats[0].shape[0]
        hc = self.ec // self.nh
        patches = []
        for i, f in enumerate(feats):
            p = nn.Conv(self.ec, (1, 1), dtype=self.dtype, name=f"projections_{i}")(f)
            patches.append(_adaptive_max_pool(p, self.k).reshape(b, -1, self.ec))
        xkv = jnp.concatenate(patches, axis=1)  # (B, nf*k*k, ec)

        q = nn.Dense(self.ec, dtype=self.dtype, name="query_1")(
            nn.LayerNorm(dtype=self.dtype, name="query_0")(text))
        k = nn.Dense(self.ec, dtype=self.dtype, name="key_1")(
            nn.LayerNorm(dtype=self.dtype, name="key_0")(xkv))
        v = nn.Dense(self.ec, dtype=self.dtype, name="value_1")(
            nn.LayerNorm(dtype=self.dtype, name="value_0")(xkv))
        q = q.reshape(b, -1, self.nh, hc)
        k = k.reshape(b, -1, self.nh, hc)
        v = v.reshape(b, -1, self.nh, hc)
        aw = jax.nn.softmax(jnp.einsum("bnmc,bkmc->bmnk", q, k) / hc**0.5, axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, v).reshape(b, -1, self.ec)
        out = nn.Dense(self.ct, dtype=self.dtype, name="proj")(out)
        scale = self.param("scale", nn.initializers.zeros, (1,)) if self.use_scale else 1.0
        return out * scale + text


class ContrastiveHead(ConvBase):
    """Region-text similarity logits (reference block.py:1036)."""

    @nn.compact
    def __call__(self, x, w, train: bool = False):
        # x (B, H, W, C) image embeddings; w (B, T, C) text embeddings
        bias = self.param("bias", nn.initializers.constant(-10.0), (1,))
        logit_scale = self.param("logit_scale", nn.initializers.constant(np.log(1 / 0.07)), ())
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
        wn = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-8)
        sim = jnp.einsum("bhwc,btc->bhwt", xn, wn)
        return sim * jnp.exp(logit_scale) + bias


class BNContrastiveHead(ConvBase):
    """Contrastive head with BN instead of L2 norm (reference block.py:1062)."""

    embed_dims: int = 512

    @nn.compact
    def __call__(self, x, w, train: bool = False):
        bias = self.param("bias", nn.initializers.constant(-10.0), (1,))
        logit_scale = self.param("logit_scale", nn.initializers.constant(-1.0), ())
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         use_fast_variance=False, dtype=self.dtype, name="norm")(x)
        wn = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-8)
        sim = jnp.einsum("bhwc,btc->bhwt", x, wn)
        return sim * jnp.exp(logit_scale) + bias


def encode_text(texts: List[str], dim: int = 512) -> np.ndarray:
    """Text -> (T, dim) L2-normalized embeddings through the NATIVE CLIP text
    tower (nn/modules/clip_text.py): exact OpenAI-CLIP semantics when a local
    checkpoint + BPE merges file are present; otherwise the same architecture
    with seeded random init behind a loud warning (see CLIPTextEncoder).

    A cached `transformers` CLIP is preferred when available locally (exact
    reference behavior, nn/tasks.py:1781); the hashed projection of round 2
    is gone."""
    try:
        import torch
        from transformers import CLIPTextModelWithProjection, CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained("openai/clip-vit-base-patch32", local_files_only=True)
        enc = CLIPTextModelWithProjection.from_pretrained(
            "openai/clip-vit-base-patch32", local_files_only=True
        )
        with torch.no_grad():
            out = enc(**tok(texts, padding=True, return_tensors="pt")).text_embeds
        e = out.numpy().astype(np.float32)
        if e.shape[1] != dim:
            rng = np.random.default_rng(0)
            e = e @ rng.standard_normal((e.shape[1], dim)).astype(np.float32)
        return e / np.linalg.norm(e, axis=-1, keepdims=True)
    except Exception:
        from ultralytics_pro_tpu.nn.modules.clip_text import get_text_encoder

        return get_text_encoder(dim)(texts)
