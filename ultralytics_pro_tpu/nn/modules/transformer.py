"""Transformer modules for RT-DETR — flax.linen, NHWC/token layouts.

Behavioral parity with the reference (ultralytics/nn/modules/transformer.py:
TransformerEncoderLayer:32, AIFI:171, MLP:348, MSDeformAttn:438,
DeformableTransformerDecoderLayer:561, DeformableTransformerDecoder:688; the
reference's multiscale deformable attention is pure-PyTorch grid_sample,
modules/utils.py:103) — here the bilinear sampling is an explicit gather
formulated so XLA vectorizes it; a Pallas kernel can swap in later
(SURVEY.md §2.9).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import ConvBase


class MLP(ConvBase):
    """Simple multi-layer perceptron (reference transformer.py:348)."""

    hidden_dim: int = 256
    output_dim: int = 4
    num_layers: int = 3
    act: Any = jax.nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers - 1):
            x = self.act(nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layers_{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype, name=f"layers_{self.num_layers - 1}")(x)


class TransformerEncoderLayer(ConvBase):
    """Post-norm transformer encoder layer (reference transformer.py:32)."""

    c1: int = 256
    cm: int = 2048
    num_heads: int = 8
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, pos=None, train: bool = False):
        q = k = x if pos is None else x + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.c1, out_features=self.c1,
            dtype=self.dtype, name="ma",
        )(q, k, x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + attn)
        f = nn.Dense(self.cm, dtype=self.dtype, name="fc1")(x)
        f = nn.Dense(self.c1, dtype=self.dtype, name="fc2")(jax.nn.gelu(f))
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + f)


def sincos_pos_embed_2d(w: int, h: int, dim: int, temperature: float = 10000.0):
    """2D sine-cosine position embedding (reference AIFI.build_2d_sincos...)."""
    grid_w = jnp.arange(w, dtype=jnp.float32)
    grid_h = jnp.arange(h, dtype=jnp.float32)
    gw, gh = jnp.meshgrid(grid_w, grid_h, indexing="ij")
    pos_dim = dim // 4
    omega = jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim
    omega = 1.0 / (temperature**omega)
    out_w = gw.reshape(-1)[:, None] * omega[None]
    out_h = gh.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate(
        [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], axis=1
    )[None]  # (1, w*h, dim)


class AIFI(TransformerEncoderLayer):
    """Intra-scale feature interaction on the P5 map (reference transformer.py:171)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        pos = sincos_pos_embed_2d(w, h, c)
        tokens = x.reshape(b, h * w, c)
        q = k = tokens + pos.astype(x.dtype)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=c, out_features=c,
            dtype=self.dtype, name="ma",
        )(q, k, tokens)
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(tokens + attn)
        f = nn.Dense(self.cm, dtype=self.dtype, name="fc1")(y)
        f = nn.Dense(c, dtype=self.dtype, name="fc2")(jax.nn.gelu(f))
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(y + f)
        return y.reshape(b, h, w, c)


def multi_scale_bilinear_sample(values, shapes, locs, attn, use_pallas=None):
    """Multiscale deformable attention core (reference modules/utils.py:103).

    Args:
        values: list per level of (B, H_l*W_l, nh, hd).
        shapes: static list of (H_l, W_l).
        locs: (B, Q, nh, L, P, 2) sampling locations in [0, 1].
        attn: (B, Q, nh, L, P) softmax weights.

    Returns (B, Q, nh*hd).

    Two backends over the same flattened corner/weight math
    (kernels/msda_pallas.py): the Pallas one-hot-matmul kernel (MXU,
    value table VMEM-resident) on TPU, XLA take_along_axis elsewhere.
    """
    import jax as _jax

    from ultralytics_pro_tpu.kernels.msda_pallas import (
        msda_flatten_coords,
        msda_gather_xla,
        msda_sample_pallas,
    )

    b, q, nh, l, p, _ = locs.shape
    if use_pallas is None:
        import os

        use_pallas = (_jax.default_backend() == "tpu"
                      and os.environ.get("MSDA_PALLAS", "1") != "0")
    idx, w = msda_flatten_coords(shapes, locs, attn.astype(jnp.float32))
    val = jnp.concatenate(values, axis=1).transpose(0, 2, 1, 3)  # (B, nh, V, hd)
    if use_pallas:
        out = msda_sample_pallas(val, idx, w)
    else:
        out = msda_gather_xla(val, idx, w)
    return out.transpose(0, 2, 1, 3).reshape(b, q, nh * out.shape[-1]).astype(locs.dtype)


def _multi_scale_bilinear_sample_reference(values, shapes, locs, attn):
    """Original per-level gather formulation, kept as the agreement-test
    reference for the kernel paths."""
    b, q, nh, l, p, _ = locs.shape
    out = 0
    for lvl, ((hl, wl), val) in enumerate(zip(shapes, values)):
        v = val.reshape(b, hl, wl, nh, -1)  # (B, H, W, nh, hd)
        # grid_sample align_corners=False semantics: x_pix = x*W - 0.5
        xy = locs[:, :, :, lvl]  # (B, Q, nh, P, 2)
        x = xy[..., 0] * wl - 0.5
        y = xy[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        dx = x - x0
        dy = y - y0

        def gather(ix, iy):
            ixc = jnp.clip(ix, 0, wl - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, hl - 1).astype(jnp.int32)
            in_bounds = (ix >= 0) & (ix <= wl - 1) & (iy >= 0) & (iy <= hl - 1)
            flat = iyc * wl + ixc  # (B, Q, nh, P)
            vf = val  # (B, HW, nh, hd)
            # gather per (b, nh): take_along_axis over HW
            idx = flat.transpose(0, 2, 1, 3).reshape(b, nh, q * p)  # (B, nh, QP)
            vv = jnp.take_along_axis(
                vf.transpose(0, 2, 1, 3),  # (B, nh, HW, hd)
                idx[..., None], axis=2,
            )  # (B, nh, QP, hd)
            vv = vv.reshape(b, nh, q, p, -1).transpose(0, 2, 1, 3, 4)  # (B, Q, nh, P, hd)
            return vv * in_bounds[..., None]

        v00 = gather(x0, y0)
        v01 = gather(x0 + 1, y0)
        v10 = gather(x0, y0 + 1)
        v11 = gather(x0 + 1, y0 + 1)
        wx0, wx1 = (1 - dx)[..., None], dx[..., None]
        wy0, wy1 = (1 - dy)[..., None], dy[..., None]
        sampled = (v00 * wx0 * wy0 + v01 * wx1 * wy0 + v10 * wx0 * wy1 + v11 * wx1 * wy1)
        out = out + (sampled * attn[:, :, :, lvl, :, None]).sum(axis=3)  # (B, Q, nh, hd)
    return out.reshape(b, q, -1)


class MSDeformAttn(ConvBase):
    """Multiscale deformable attention (reference transformer.py:438)."""

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, query, refer_bbox, value_list, shapes, train: bool = False):
        """query (B, Q, C); refer_bbox (B, Q, 4) cxcywh in [0,1];
        value_list: per-level (B, H*W, C); shapes: static [(H, W)]."""
        b, q, c = query.shape
        nh, nl, npt = self.n_heads, self.n_levels, self.n_points
        hd = c // nh

        # grid-prior init for sampling offsets (reference _reset_parameters)
        thetas = jnp.arange(nh, dtype=jnp.float32) * (2.0 * math.pi / nh)
        grid_init = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
        grid_init = grid_init / jnp.abs(grid_init).max(-1, keepdims=True)
        grid_init = jnp.tile(grid_init[:, None, None, :], (1, nl, npt, 1))
        scale = jnp.arange(1, npt + 1, dtype=jnp.float32)[None, None, :, None]
        offset_bias = (grid_init * scale).reshape(-1)

        offsets = nn.Dense(
            nh * nl * npt * 2, dtype=self.dtype, name="sampling_offsets",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: offset_bias.astype(dtype),
        )(query).reshape(b, q, nh, nl, npt, 2)
        attn = nn.Dense(nh * nl * npt, dtype=self.dtype, name="attention_weights",
                        kernel_init=nn.initializers.zeros)(query)
        attn = jax.nn.softmax(attn.reshape(b, q, nh, nl * npt), axis=-1).reshape(b, q, nh, nl, npt)

        values = [
            nn.Dense(c, dtype=self.dtype, name="value_proj")(jnp.concatenate(value_list, axis=1))
        ]
        # split projected value back per level
        sizes = [h * w for h, w in shapes]
        splits = []
        start = 0
        vflat = values[0]
        for s in sizes:
            splits.append(vflat[:, start:start + s].reshape(b, s, nh, hd))
            start += s

        cxcy = refer_bbox[:, :, None, None, None, :2]
        wh = refer_bbox[:, :, None, None, None, 2:4]
        locs = cxcy + offsets / npt * wh * 0.5  # (B, Q, nh, L, P, 2)

        out = multi_scale_bilinear_sample(splits, shapes, locs, attn)
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(out)


class DeformableTransformerDecoderLayer(ConvBase):
    """Self-attn + deformable cross-attn + FFN (reference transformer.py:561)."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 3
    n_points: int = 4

    @nn.compact
    def __call__(self, embed, refer_bbox, value_list, shapes, query_pos=None,
                 attn_mask=None, train: bool = False):
        q = k = embed if query_pos is None else embed + query_pos
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model, out_features=self.d_model,
            dtype=self.dtype, name="self_attn",
        )(q, k, embed, mask=attn_mask)
        embed = nn.LayerNorm(dtype=self.dtype, name="norm1")(embed + sa)

        ca = MSDeformAttn(
            d_model=self.d_model, n_levels=self.n_levels, n_heads=self.n_heads,
            n_points=self.n_points, dtype=self.dtype, name="cross_attn",
        )(embed if query_pos is None else embed + query_pos, refer_bbox, value_list, shapes, train)
        embed = nn.LayerNorm(dtype=self.dtype, name="norm2")(embed + ca)

        f = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(embed)
        f = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(jax.nn.relu(f))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(embed + f)
