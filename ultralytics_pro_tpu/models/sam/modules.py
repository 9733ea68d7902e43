"""SAM (Segment Anything Model) core modules, TPU-native flax implementation.

Behavioral parity targets (reference, studied not copied):
  - ImageEncoderViT: ultralytics/models/sam/modules/encoders.py:23 — ViT with
    windowed attention (window 14) + decomposed relative positions, global
    attention at selected depths, 2-conv neck to 256 channels.
  - PromptEncoder: encoders.py:156 — random-Fourier positional encoding,
    point/box/mask embeddings.
  - TwoWayTransformer: modules/transformer.py — 2-layer bidirectional
    token<->image attention.
  - MaskDecoder: modules/decoders.py:11 — IoU token + 4 mask tokens,
    transposed-conv upscaling, per-token hypernetwork MLPs.

TPU-first design notes: NHWC everywhere; prompts are STATIC-shape padded
(label -1 = padding) so one compiled decoder serves any prompt count; window
partition uses reshape/transpose only (64 = 4*14 + pad handled statically);
attention is batched einsum on the MXU in bf16-friendly form.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over the last (channel) axis of NHWC maps with
    torch LayerNorm2d semantics (normalize over C only)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + self.eps)
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        return x * w + b


class MLPBlock(nn.Module):
    mlp_dim: int
    act: str = "gelu"  # encoder blocks use GELU; the two-way transformer's
    # MLP uses ReLU (reference transformer.py:46 activation=nn.ReLU)

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, name="lin1")(x)
        x = jax.nn.relu(x) if self.act == "relu" else nn.gelu(x, approximate=False)
        return nn.Dense(d, name="lin2")(x)


class MLP(nn.Module):
    """n-layer perceptron with ReLU between layers (reference blocks.py MLP)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return nn.sigmoid(x) if self.sigmoid_output else x


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Slice/interpolate relative positional embeddings for (q_size, k_size).

    Static-shape equivalent of the reference get_rel_pos (blocks/utils):
    returns (q_size, k_size, head_dim).
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(rel_pos, (max_rel_dist, rel_pos.shape[1]), "linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class ViTAttention(nn.Module):
    """Multi-head attention with decomposed relative positions
    (reference blocks.py Attention)."""

    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)  # (H, W) of the attended window

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim**-0.5
        qkv = nn.Dense(3 * c, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (B, N, nH, hd)
        q = jnp.swapaxes(q, 1, 2)  # (B, nH, N, hd)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        attn = (q * scale) @ jnp.swapaxes(k, -2, -1)  # (B, nH, N, N)
        if self.use_rel_pos:
            rh = self.param("rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, head_dim))
            rw = self.param("rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, head_dim))
            Rh = _get_rel_pos(h, h, rh)  # (h, h, hd)
            Rw = _get_rel_pos(w, w, rw)
            rq = q.reshape(b, self.num_heads, h, w, head_dim)
            rel_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, Rh)
            rel_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, Rw)
            attn = attn.reshape(b, self.num_heads, h, w, h, w)
            attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
            attn = attn.reshape(b, self.num_heads, h * w, h * w)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).swapaxes(1, 2).reshape(b, h, w, c)
        return nn.Dense(c, name="proj")(out)


def window_partition(x, window: int):
    """(B, H, W, C) -> (B*nW, window, window, C) with bottom/right zero pad."""
    b, h, w, c = x.shape
    ph, pw = (window - h % window) % window, (window - w % window) % window
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x, window: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // (hp // window * wp // window)
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class ViTBlock(nn.Module):
    """Transformer block with optional windowed attention (reference blocks.py
    Block)."""

    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0  # 0 = global
    input_size: Tuple[int, int] = (64, 64)

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            hw = x.shape[1:3]
            x, pad_hw = window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        x = ViTAttention(self.num_heads, input_size=attn_size, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, hw)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        return x + MLPBlock(int(x.shape[-1] * self.mlp_ratio), name="mlp")(y)


class ImageEncoderViT(nn.Module):
    """SAM image encoder: 1024x1024 -> (64, 64, 256) embedding
    (reference encoders.py:23)."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) float
        g = self.img_size // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size,) * 2, strides=(self.patch_size,) * 2,
                    dtype=self.dtype, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros, (1, g, g, self.embed_dim))
        if x.shape[1] != g:  # non-1024 inputs: bilinear-resize the abs pos grid
            pos = jax.image.resize(pos, (1, x.shape[1], x.shape[2], self.embed_dim), "linear")
        x = x + pos
        for i in range(self.depth):
            x = ViTBlock(
                self.num_heads, self.mlp_ratio,
                window_size=0 if i in tuple(self.global_attn_indexes) else self.window_size,
                input_size=(x.shape[1], x.shape[2]), name=f"blocks_{i}",
            )(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_0")(x)
        x = LayerNorm2d(name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="neck_2")(x)
        return LayerNorm2d(name="neck_3")(x)  # (B, g, g, 256)


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (reference blocks.py
    PositionEmbeddingRandom)."""

    num_pos_feats: int = 128
    scale: float = 1.0

    def setup(self):
        self.gaussian_matrix = self.param(
            "positional_encoding_gaussian_matrix",
            lambda k, s: self.scale * jax.random.normal(k, s), (2, self.num_pos_feats),
        )

    def _encode(self, coords):  # coords in [0,1], shape (..., 2)
        coords = 2 * coords - 1
        coords = coords @ self.gaussian_matrix
        coords = 2 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], -1)

    def grid(self, size: Tuple[int, int]):
        h, w = size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        coords = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)  # (h, w, 2)
        return self._encode(coords)  # (h, w, 2*feats)

    def with_coords(self, coords, image_size: Tuple[int, int]):
        c = coords / jnp.array([image_size[1], image_size[0]], jnp.float32)
        return self._encode(c)


class PromptEncoder(nn.Module):
    """Encode padded point/box/mask prompts (reference encoders.py:156).

    Points come in as (B, N, 2) pixel coords with labels (B, N):
      -1 pad, 0 negative click, 1 positive click, 2 box top-left,
      3 box bottom-right. Static N — one compiled graph for any prompt mix.
    """

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        init = nn.initializers.normal(1.0)
        self.point_embeddings = self.param("point_embeddings", init, (4, self.embed_dim))
        self.not_a_point_embed = self.param("not_a_point_embed", init, (1, self.embed_dim))
        self.no_mask_embed = self.param("no_mask_embed", init, (1, self.embed_dim))
        self.mask_down_0 = nn.Conv(self.mask_in_chans // 4, (2, 2), strides=(2, 2), name="mask_downscaling_0")
        self.mask_down_ln0 = LayerNorm2d(name="mask_downscaling_1")
        self.mask_down_1 = nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2), name="mask_downscaling_3")
        self.mask_down_ln1 = LayerNorm2d(name="mask_downscaling_4")
        self.mask_down_2 = nn.Conv(self.embed_dim, (1, 1), name="mask_downscaling_6")

    def get_dense_pe(self):
        return self.pe_layer.grid(self.image_embedding_size)  # (h, w, C)

    def __call__(self, points, labels, masks: Optional[jnp.ndarray] = None):
        """Returns (sparse (B, N, C), dense (B, h, w, C))."""
        pts = points + 0.5  # pixel center
        pe = self.pe_layer.with_coords(pts, self.input_image_size)  # (B, N, C)
        lab = labels[..., None]
        emb = jnp.where(lab == -1, self.not_a_point_embed[0], 0.0)
        pe = jnp.where(lab == -1, 0.0, pe)
        for v in range(4):  # neg, pos, box-tl, box-br
            emb = emb + jnp.where(lab == v, self.point_embeddings[v], 0.0)
        sparse = pe + emb
        h, w = self.image_embedding_size
        if masks is not None:
            m = self.mask_down_0(masks)
            m = nn.gelu(self.mask_down_ln0(m), approximate=False)
            m = self.mask_down_1(m)
            m = nn.gelu(self.mask_down_ln1(m), approximate=False)
            dense = self.mask_down_2(m)
        else:
            dense = jnp.broadcast_to(
                self.no_mask_embed[0], (points.shape[0], h, w, self.embed_dim)
            )
        return sparse, dense


class _DownAttention(nn.Module):
    """Attention with internal channel downsampling (reference
    transformer.py Attention)."""

    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        c = q.shape[-1]
        ci = c // self.downsample_rate
        hd = ci // self.num_heads
        q = nn.Dense(ci, name="q_proj")(q)
        k = nn.Dense(ci, name="k_proj")(k)
        v = nn.Dense(ci, name="v_proj")(v)

        def heads(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, hd).swapaxes(1, 2)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jax.nn.softmax(q @ jnp.swapaxes(k, -2, -1) / math.sqrt(hd), -1)
        out = (attn @ v).swapaxes(1, 2).reshape(q.shape[0], -1, ci)
        return nn.Dense(c, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            # reference transformer.py:209: the first layer's self-attn output
            # REPLACES the queries (no residual add)
            queries = _DownAttention(self.num_heads, name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + _DownAttention(self.num_heads, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries)
        q, k = queries + query_pe, keys + key_pe
        queries = queries + _DownAttention(
            self.num_heads, self.attention_downsample_rate, name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)
        queries = queries + MLPBlock(self.mlp_dim, act="relu", name="mlp")(queries)
        queries = nn.LayerNorm(name="norm3")(queries)
        q, k = queries + query_pe, keys + key_pe
        keys = keys + _DownAttention(
            self.num_heads, self.attention_downsample_rate, name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    num_heads: int = 8
    mlp_dim: int = 2048

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/pe: (B, h, w, C); point_embedding: (B, N, C)."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = jnp.broadcast_to(image_pe.reshape(-1, h * w, c), keys.shape)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.num_heads, self.mlp_dim, skip_first_layer_pe=(i == 0), name=f"layers_{i}"
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + _DownAttention(self.num_heads, 2, name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    """Predict masks + IoU estimates from image and prompt embeddings
    (reference decoders.py:11)."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool):
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, self.transformer_dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (num_mask_tokens, self.transformer_dim))
        b = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], 0)[None],
            (b, 1 + num_mask_tokens, self.transformer_dim))
        tokens = jnp.concatenate([out_tokens, sparse_prompt], 1)
        src = image_embeddings + dense_prompt  # (B, h, w, C)
        hs, src = TwoWayTransformer(name="transformer")(src, image_pe, tokens)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1:1 + num_mask_tokens]  # (B, M, C)
        h, w = image_embeddings.shape[1:3]
        up = src.reshape(b, h, w, self.transformer_dim)
        up = nn.ConvTranspose(self.transformer_dim // 4, (2, 2), strides=(2, 2),
                              name="output_upscaling_0")(up)
        up = nn.gelu(LayerNorm2d(name="output_upscaling_1")(up), approximate=False)
        up = nn.ConvTranspose(self.transformer_dim // 8, (2, 2), strides=(2, 2),
                              name="output_upscaling_3")(up)
        up = nn.gelu(up, approximate=False)  # (B, 4h, 4w, C/8)
        hyper = jnp.stack([
            MLP(self.transformer_dim, self.transformer_dim // 8, 3,
                name=f"output_hypernetworks_mlps_{i}")(mask_out[:, i])
            for i in range(num_mask_tokens)
        ], 1)  # (B, M, C/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)  # (B, M, 4h, 4w)
        iou_pred = MLP(self.iou_head_hidden_dim, num_mask_tokens, self.iou_head_depth,
                       name="iou_prediction_head")(iou_out)
        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]
