"""SAM2: Hiera trunk + FPN neck + streaming memory — flax.linen, NHWC.

Behavioral parity with the reference SAM2 (ultralytics/models/sam/modules/
sam.py:98 SAM2Model, memory_attention.py, encoders.py Hiera/FPNNeck,
memory encoder in sam2 blocks), redesigned TPU-first:

- Hiera mask-unit attention is pure reshape window partition (static shapes);
  stage transitions pool Q 2x2 (hierarchical) — no dynamic padding paths;
- memory attention is standard self+cross transformer layers over a FIXED-size
  memory bank (num_maskmem slots + object pointers) with a validity mask, so
  the whole per-frame video step is ONE compiled function;
- the memory bank is a pytree carried through `lax`-style functional updates
  (predictor holds it host-side between frames).

Also here: TinyViT (MobileSAM image encoder, reference tiny_encoder.py:979).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.models.sam.modules import (
    LayerNorm2d,
    MaskDecoder,
    PromptEncoder,
)


# ------------------------------------------------------------------ Hiera ----
def _win_part(x, w):
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, c)


def _win_unpart(x, w, h, wd):
    b = x.shape[0] // ((h // w) * (wd // w))
    x = x.reshape(b, h // w, wd // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


class HieraBlock(nn.Module):
    """Hiera MultiScaleBlock (reference models/sam/modules/blocks.py:570):
    window partition FIRST (pad to window multiple), attention with 2x2
    Q-pooling INSIDE each window on stage boundaries, window=0 means global
    attention. Matches the torch block exactly so official sam2 checkpoints
    import (tests/test_sam2_import.py)."""

    dim_out: int = 96
    heads: int = 1
    window: int = 8  # 0 = global attention
    q_pool: bool = False
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, wd, c = x.shape
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        shortcut = x
        if c != self.dim_out:
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(y)
        if self.q_pool:
            shortcut = nn.max_pool(shortcut, (2, 2), strides=(2, 2))
        sh, sw = shortcut.shape[1], shortcut.shape[2]

        w = self.window
        if w > 0:
            ph, pw = (w - h % w) % w, (w - wd % w) % w
            yp = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
            xw = _win_part(yp, w)  # (B*nw, w, w, c)
        else:
            xw = y
        bw, wh, ww = xw.shape[0], xw.shape[1], xw.shape[2]

        nh = self.heads
        d = self.dim_out // nh
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(xw)
        qkv = qkv.reshape(bw, wh * ww, 3, self.dim_out)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        oh, ow = wh, ww
        if self.q_pool:
            # pool q INSIDE the window (reference MultiScaleAttention:550)
            q = nn.max_pool(q.reshape(bw, wh, ww, self.dim_out), (2, 2), strides=(2, 2))
            oh, ow = q.shape[1], q.shape[2]
            q = q.reshape(bw, oh * ow, self.dim_out)
        qh = q.reshape(bw, -1, nh, d).transpose(0, 2, 1, 3)
        kh = k.reshape(bw, -1, nh, d).transpose(0, 2, 3, 1)
        vh = v.reshape(bw, -1, nh, d).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax((qh @ kh) * d**-0.5, axis=-1)
        o = (attn @ vh).transpose(0, 2, 1, 3).reshape(bw, oh * ow, self.dim_out)
        o = nn.Dense(self.dim_out, dtype=self.dtype, name="attn_proj")(o)

        if w > 0:
            w2 = w // 2 if self.q_pool else w
            # reference recomputes pad_hw from the POOLED H,W (blocks.py:667)
            ph2 = (w2 - sh % w2) % w2
            pw2 = (w2 - sw % w2) % w2
            o = _win_unpart(o.reshape(-1, w2, w2, self.dim_out), w2, sh + ph2, sw + pw2)
            o = o[:, :sh, :sw]
        else:
            o = o.reshape(b, oh, ow, self.dim_out)
        x = shortcut + o

        m = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        m = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=self.dtype, name="fc1")(m)
        m = jax.nn.gelu(m)
        m = nn.Dense(self.dim_out, dtype=self.dtype, name="fc2")(m)
        return x + m


def _torch_bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Row-stochastic interpolation matrix reproducing torch F.interpolate
    bicubic (a=-0.75, align_corners=False, no antialias, edge clamp)."""
    a = -0.75

    def kern(t):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t**3 - (a + 3) * t**2 + 1
        if t < 2:
            return a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
        return 0.0

    M = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        src = (o + 0.5) * n_in / n_out - 0.5
        f = int(np.floor(src))
        for j in range(f - 1, f + 3):
            M[o, min(max(j, 0), n_in - 1)] += kern(src - j)
    return M


class Hiera(nn.Module):
    """Hierarchical ViT trunk (reference encoders.py:644 Hiera): patch embed
    /4 (k7 s4 p3), windowed-background positional embedding (bicubic-resized
    background + tiled window embed), blocks with lagged per-stage window
    specs, global attention at fixed block indices, 2x2 Q-pooling at the
    first `q_pool` stage boundaries. Returns 4 stage maps (strides 4/8/16/32)."""

    embed_dim: int = 96
    heads: int = 1
    stages: Tuple[int, ...] = (1, 2, 7, 2)
    windows: Tuple[int, ...] = (8, 4, 14, 7)
    global_att: Tuple[int, ...] = (5, 7, 9)
    bkg_size: int = 14  # window_pos_embed_bkg_spatial_size
    q_pool: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = self.embed_dim
        x = nn.Conv(dim, (7, 7), strides=(4, 4), padding=((3, 3), (3, 3)),
                    dtype=self.dtype, name="patch_embed")(x)
        h, wd = x.shape[1], x.shape[2]
        # windowed positional embedding (arXiv:2311.05613): background
        # bicubic-resized to (H, W) + window embed tiled across it
        w0 = self.windows[0]
        pe = self.param("pos_embed", nn.initializers.normal(0.02),
                        (1, self.bkg_size, self.bkg_size, dim))
        pew = self.param("pos_embed_window", nn.initializers.normal(0.02),
                         (1, w0, w0, dim))
        mh = jnp.asarray(_torch_bicubic_matrix(self.bkg_size, h))
        mw = jnp.asarray(_torch_bicubic_matrix(self.bkg_size, wd))
        pe_full = jnp.einsum("hH,bHWc,wW->bhwc", mh, pe.astype(jnp.float32), mw)
        if h % w0 == 0 and wd % w0 == 0:
            pe_full = pe_full + jnp.tile(pew.astype(jnp.float32),
                                         (1, h // w0, wd // w0, 1))
        x = x + pe_full.astype(x.dtype)

        depth = sum(self.stages)
        stage_ends = [sum(self.stages[:i + 1]) - 1 for i in range(len(self.stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][:self.q_pool]
        cur_stage = 1
        heads = self.heads
        outs = []
        for i in range(depth):
            dim_out = dim
            # window lags by a block: the first block of a stage keeps the
            # previous stage's spec (reference encoders.py:764)
            window = self.windows[cur_stage - 1]
            if i in self.global_att:
                window = 0
            if i - 1 in stage_ends:
                dim_out = dim * 2
                heads *= 2
                cur_stage += 1
            x = HieraBlock(dim_out=dim_out, heads=heads, window=window,
                           q_pool=i in q_pool_blocks, dtype=self.dtype,
                           name=f"b{i}")(x, train)
            dim = dim_out
            if i in stage_ends:
                outs.append(x)
        return outs


class FpnNeck(nn.Module):
    """SAM2 FPN neck (reference encoders.py:504 FpnNeck): per-level 1x1 conv
    to d_model (conv_0 takes the COARSEST level, matching the reference's
    backbone_channel_list=[768,...,96] ordering), nearest top-down fusion on
    fpn_top_down_levels=[2,3] only (the sam2 build config). Returns the
    stride-16 image embedding and the stride-4/8 high-res decoder skips
    (projected via hr0/hr1, the reference decoder's conv_s0/conv_s1)."""

    d_model: int = 256
    top_down_levels: Tuple[int, ...] = (2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        n = len(feats) - 1
        out = [None] * len(feats)
        prev = None
        for i in range(n, -1, -1):  # coarse -> fine
            lat = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                          name=f"conv_{n - i}")(feats[i])
            if i in self.top_down_levels and prev is not None:
                b, h, w, c = lat.shape
                prev = lat + jax.image.resize(prev, (b, h, w, c), "nearest")
            else:
                prev = lat
            out[i] = prev
        # SAM2 uses stride16 as the embedding (scalp=1 discards stride32) and
        # strides 4/8 (projected to 32/64 ch by the reference mask decoder's
        # conv_s0/conv_s1) as high-res decoder skips
        hr0 = nn.Conv(self.d_model // 8, (1, 1), dtype=self.dtype, name="hr0")(out[0])
        hr1 = nn.Conv(self.d_model // 4, (1, 1), dtype=self.dtype, name="hr1")(out[1])
        return out[2], (hr0, hr1)


# ----------------------------------------------------------------- memory ----
class MemoryAttentionLayer(nn.Module):
    """Self-attn on frame queries + cross-attn to memory tokens + MLP
    (reference memory_attention.py MemoryAttentionLayer)."""

    d_model: int = 256
    heads: int = 8
    d_ffn: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_tokens, mem_tokens, mem_valid, train: bool = False):
        def mha(q, k, v, mask, name):
            nh = self.heads
            d = self.d_model // nh
            qp = nn.Dense(self.d_model, dtype=self.dtype, name=f"{name}_q")(q)
            kp = nn.Dense(self.d_model, dtype=self.dtype, name=f"{name}_k")(k)
            vp = nn.Dense(self.d_model, dtype=self.dtype, name=f"{name}_v")(v)
            b, nq = qp.shape[:2]
            nk = kp.shape[1]
            qh = qp.reshape(b, nq, nh, d).transpose(0, 2, 1, 3)
            kh = kp.reshape(b, nk, nh, d).transpose(0, 2, 3, 1)
            vh = vp.reshape(b, nk, nh, d).transpose(0, 2, 1, 3)
            a = (qh @ kh) * d**-0.5
            if mask is not None:
                a = jnp.where(mask[:, None, None, :], a, -1e9)
            a = jax.nn.softmax(a, axis=-1)
            o = (a @ vh).transpose(0, 2, 1, 3).reshape(b, nq, self.d_model)
            return nn.Dense(self.d_model, dtype=self.dtype, name=f"{name}_o")(o)

        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(q_tokens)
        q_tokens = q_tokens + mha(y, y, y, None, "self")
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(q_tokens)
        q_tokens = q_tokens + mha(y, mem_tokens, mem_tokens, mem_valid, "cross")
        y = nn.LayerNorm(dtype=self.dtype, name="norm3")(q_tokens)
        y = nn.Dense(self.d_ffn, dtype=self.dtype, name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="fc2")(y)
        return q_tokens + y


class MemoryAttention(nn.Module):
    """Stack of memory-attention layers (reference memory_attention.py:
    MemoryAttention, num_layers=4 for sam2-t)."""

    d_model: int = 256
    layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_tokens, mem_tokens, mem_valid, train: bool = False):
        # project memory (mem_dim=64) up to d_model once
        mem = nn.Dense(self.d_model, dtype=self.dtype, name="mem_proj")(mem_tokens)
        for i in range(self.layers):
            q_tokens = MemoryAttentionLayer(d_model=self.d_model, dtype=self.dtype,
                                            name=f"layer_{i}")(q_tokens, mem, mem_valid, train)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(q_tokens)


class MemoryEncoder(nn.Module):
    """Fuse the predicted mask with the frame embedding into compact memory
    features (reference sam2 memory encoder: mask downsampler + fuser)."""

    mem_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pix_feat, mask_logits, train: bool = False):
        """pix_feat (B, h16, w16, 256); mask_logits (B, H, W, 1) full-res."""
        m = jax.nn.sigmoid(mask_logits)
        for i, c in enumerate((4, 16, 64, 256)):  # stride-16 downsampler
            m = nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"mask_down_{i}")(m)
            m = LayerNorm2d(name=f"mask_ln_{i}")(m)
            m = jax.nn.gelu(m)
        x = nn.Conv(256, (1, 1), dtype=self.dtype, name="pix_proj")(pix_feat) + m
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="fuse")(x)
        x = jax.nn.gelu(x)
        return nn.Conv(self.mem_dim, (1, 1), dtype=self.dtype, name="out")(x)


# ------------------------------------------------------------------ model ----
PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


class SAM2Model(nn.Module):
    """Promptable segmentation with streaming memory (reference
    modules/sam.py:98 SAM2Model). Image mode == SAM with a Hiera encoder;
    video mode adds memory-conditioned per-frame decoding."""

    embed_dim: int = 96
    stages: Tuple[int, ...] = (1, 2, 7, 2)
    heads: int = 1
    windows: Tuple[int, ...] = (8, 4, 14, 7)
    global_att: Tuple[int, ...] = (5, 7, 9)
    img_size: int = 1024
    num_maskmem: int = 7
    mem_dim: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        self.trunk = Hiera(embed_dim=self.embed_dim, stages=self.stages,
                           heads=self.heads, windows=self.windows,
                           global_att=self.global_att, dtype=self.dtype)
        self.neck = FpnNeck(d_model=256, dtype=self.dtype)
        g = self.img_size // 16
        self.prompt_encoder = PromptEncoder(
            embed_dim=256, image_embedding_size=(g, g),
            input_image_size=(self.img_size, self.img_size), mask_in_chans=16,
        )
        self.mask_decoder = MaskDecoder(transformer_dim=256, num_multimask_outputs=3)
        self.memory_attention = MemoryAttention(d_model=256, dtype=self.dtype)
        self.memory_encoder = MemoryEncoder(mem_dim=self.mem_dim, dtype=self.dtype)
        # learned no-memory embedding for unconditioned frames
        self.no_mem_embed = self.param("no_mem_embed", nn.initializers.normal(0.02), (1, 1, 256))

    # -- encode ---------------------------------------------------------------
    def embed_image(self, x):
        """(B, S, S, 3) pixels -> (B, S/16, S/16, 256) (SAMPredictor contract)."""
        x = (x.astype(jnp.float32) - jnp.array(PIXEL_MEAN)) / jnp.array(PIXEL_STD)
        feats = self.trunk(x)
        embed, hr = self.neck(feats)
        return embed

    def embed_image_hr(self, x):
        """Embed + the high-res decoder skip features (strides 4/8)."""
        x = (x.astype(jnp.float32) - jnp.array(PIXEL_MEAN)) / jnp.array(PIXEL_STD)
        feats = self.trunk(x)
        return self.neck(feats)

    # -- prompt decode (image mode / conditioning frame) -----------------------
    def decode(self, image_embed, points, labels, mask_input, multimask_output: bool):
        sparse, dense = self.prompt_encoder(points, labels, mask_input)
        image_pe = self.prompt_encoder.get_dense_pe()[None]
        return self.mask_decoder(image_embed, image_pe, sparse, dense, multimask_output)

    # -- memory ops -------------------------------------------------------------
    def encode_memory(self, image_embed, mask_logits):
        return self.memory_encoder(image_embed, mask_logits)

    def condition_on_memory(self, image_embed, mem_bank, mem_valid):
        """image_embed (B, h, w, 256); mem_bank (B, S, N, mem_dim) with S
        memory slots of N tokens; mem_valid (B, S) bool."""
        b, h, w, c = image_embed.shape
        q = image_embed.reshape(b, h * w, c) + self.no_mem_embed * 0.0
        s, n = mem_bank.shape[1], mem_bank.shape[2]
        mem = mem_bank.reshape(b, s * n, self.mem_dim)
        valid = jnp.repeat(mem_valid, n, axis=1)  # (B, S*N)
        # when no memory is valid, attend to the learned no-mem token instead
        any_valid = mem_valid.any(axis=1, keepdims=True)
        pad_tok = jnp.zeros((b, 1, self.mem_dim), mem.dtype)
        mem = jnp.concatenate([mem, pad_tok], axis=1)
        valid = jnp.concatenate([valid, ~any_valid], axis=1)
        out = self.memory_attention(q, mem, valid)
        return out.reshape(b, h, w, c)

    def __call__(self, x, points, labels):
        """init/trace path: embed + prompt decode + one memory round-trip."""
        embed = self.embed_image(x)
        masks, iou = self.decode(embed, points, labels, None, True)
        # trace the memory modules so their params exist
        full = jax.image.resize(masks[:, :1].transpose(0, 2, 3, 1),
                                (x.shape[0], x.shape[1], x.shape[2], 1), "bilinear")
        mem = self.encode_memory(embed, full)
        bank = mem.reshape(x.shape[0], 1, -1, self.mem_dim)
        cond = self.condition_on_memory(embed, bank, jnp.ones((x.shape[0], 1), bool))
        masks2, iou2 = self.decode(cond, points, labels, None, False)
        return masks, iou


def build_sam2(name: str = "sam2_t", img_size: int = 1024, dtype=jnp.float32) -> SAM2Model:
    """sam2 t/s/b/l registry (reference build.py sam2 configs)."""
    cfgs = {
        "t": dict(embed_dim=96, stages=(1, 2, 7, 2), global_att=(5, 7, 9)),
        "s": dict(embed_dim=96, stages=(1, 2, 11, 2), global_att=(7, 10, 13)),
        "b": dict(embed_dim=112, stages=(2, 3, 16, 3), heads=2, global_att=(12, 16, 20)),
        "l": dict(embed_dim=144, stages=(2, 6, 36, 4), heads=2, global_att=(23, 33, 43),
                  windows=(8, 4, 16, 8)),
    }
    key = name.split("_")[-1][0]
    return SAM2Model(img_size=img_size, dtype=dtype, **cfgs.get(key, cfgs["t"]))


# ---------------------------------------------------------------- TinyViT ----
class TinyViTBlock(nn.Module):
    """TinyViT transformer block (reference tiny_encoder.py): window MHSA with
    learned per-pair attention biases + local 3x3 depthwise conv + MLP."""

    dim: int = 128
    heads: int = 4
    window: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, wd, c = x.shape
        w = min(self.window, h, wd)
        ph = (w - h % w) % w
        pw = (w - wd % w) % w
        y = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, wd + pw
        win = _win_part(y, w).reshape(-1, w * w, c)
        nh = self.heads
        d = c // nh
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(nn.LayerNorm(dtype=self.dtype, name="norm1")(win))
        q, k, v = jnp.split(qkv.reshape(-1, w * w, 3, nh, d), 3, axis=2)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q[:, :, 0], k[:, :, 0]) * d**-0.5
        # learned attention biases over relative offsets (TinyViT signature)
        from ultralytics_pro_tpu.nn.modules.backbones import _rel_pos_index

        table = self.param("attn_bias", nn.initializers.zeros, ((2 * w - 1) ** 2, nh))
        idx = jnp.asarray(_rel_pos_index(w).reshape(-1))
        bias = table[idx].reshape(w * w, w * w, nh).transpose(2, 0, 1)
        attn = jax.nn.softmax(attn + bias[None], axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v[:, :, 0]).reshape(-1, w * w, c)
        o = nn.Dense(c, dtype=self.dtype, name="proj")(o)
        o = _win_unpart(o.reshape(-1, w, w, c), w, hp, wp)[:, :h, :wd]
        x = x + o
        # local conv
        x = x + nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                        dtype=self.dtype, name="local_conv")(x)
        m = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        m = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(m)
        m = jax.nn.gelu(m)
        m = nn.Dense(c, dtype=self.dtype, name="fc2")(m)
        return x + m


class TinyViT(nn.Module):
    """MobileSAM image encoder (reference tiny_encoder.py:979 TinyViT-5M):
    conv stem, MBConv stage, 3 attention stages, 256-ch neck at stride 16."""

    dims: Tuple[int, ...] = (64, 128, 160, 320)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (2, 4, 5, 10)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.backbones import MBConv

        x = (x.astype(jnp.float32) - jnp.array(PIXEL_MEAN)) / jnp.array(PIXEL_STD)
        x = nn.Conv(self.dims[0] // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem0")(x)
        x = jax.nn.gelu(x)
        x = nn.Conv(self.dims[0], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem1")(x)
        # stage 0: MBConvs at stride 4
        for i in range(self.depths[0]):
            x = MBConv(c2=self.dims[0], s=1, dtype=self.dtype, name=f"s0_b{i}")(x, train)
        # stages 1-3: downsample + TinyViT blocks
        for s in range(1, 4):
            stride = (2, 2) if s < 3 else (1, 1)  # keep stride 16 for SAM embed
            x = nn.Conv(self.dims[s], (3, 3), strides=stride, padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"down_{s}")(x)
            for i in range(self.depths[s]):
                x = TinyViTBlock(dim=self.dims[s], heads=self.heads[s],
                                 dtype=self.dtype, name=f"s{s}_b{i}")(x, train)
        # SAM neck: 1x1 -> LN -> 3x3 -> LN to 256
        x = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype, name="neck0")(x)
        x = LayerNorm2d(name="neck_ln0")(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="neck1")(x)
        return LayerNorm2d(name="neck_ln1")(x)
