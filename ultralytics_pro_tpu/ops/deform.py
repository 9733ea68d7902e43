"""Deformable convolution sampling — the XLA replacement for
torchvision.ops.deform_conv2d (reference call sites: nn/modules/block.py:2753
DCNv2, :5011 DeformConv for D-LKA; SURVEY.md §2.9).

Formulation: bilinear-gather the K*K sampling taps per output pixel into an
im2col tensor, apply the modulation mask, then contract with the kernel as ONE
matmul — the irregular memory access becomes 4 vectorized gathers and the
FLOPs land on the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weight: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Deformable conv v1/v2.

    Args:
        x: (B, H, W, C) input.
        offsets: (B, Ho, Wo, 2*K*K) sampling offsets, torch layout: per tap
            (dy, dx) interleaved as [dy0, dx0, dy1, dx1, ...].
        weight: (kh, kw, C // groups, Co) kernel (HWIO).
        mask: optional (B, Ho, Wo, K*K) modulation (post-sigmoid) — DCNv2.
        bias: optional (Co,).

    Returns (B, Ho, Wo, Co).
    """
    b, h, w, c = x.shape
    kh, kw, cin_g, co = weight.shape
    k = kh * kw
    ho, wo = offsets.shape[1], offsets.shape[2]

    # base sampling grid: output pixel * stride - padding + dilation * tap
    oy = jnp.arange(ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - padding
    ty = jnp.arange(kh, dtype=jnp.float32) * dilation
    tx = jnp.arange(kw, dtype=jnp.float32) * dilation
    base_y = oy[:, None, None, None] + ty[None, None, :, None]  # (Ho,1,kh,1)
    base_x = ox[None, :, None, None] + tx[None, None, None, :]  # (1,Wo,1,kw)
    base_y = jnp.broadcast_to(base_y, (ho, wo, kh, kw)).reshape(ho, wo, k)
    base_x = jnp.broadcast_to(base_x, (ho, wo, kh, kw)).reshape(ho, wo, k)

    off = offsets.reshape(b, ho, wo, k, 2)
    sy = base_y[None] + off[..., 0]  # (B, Ho, Wo, K)
    sx = base_x[None] + off[..., 1]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    dy = sy - y0
    dx = sx - x0

    def gather(ix, iy):
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        ok = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        flat = (iyc * w + ixc).reshape(b, -1)  # (B, Ho*Wo*K)
        v = jnp.take_along_axis(x.reshape(b, h * w, c), flat[..., None], axis=1)
        return v.reshape(b, ho, wo, k, c) * ok[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx0, wx1 = (1 - dx)[..., None], dx[..., None]
    wy0, wy1 = (1 - dy)[..., None], dy[..., None]
    cols = v00 * wx0 * wy0 + v01 * wx1 * wy0 + v10 * wx0 * wy1 + v11 * wx1 * wy1
    if mask is not None:
        cols = cols * mask.reshape(b, ho, wo, k, 1)

    if groups == 1:
        out = jnp.einsum("bhwkc,kco->bhwo", cols,
                         weight.reshape(k, c, co), precision="default")
    elif groups == c and cin_g == 1:
        # depthwise: weight (kh,kw,1,C) -> (k, C)
        wdw = weight.reshape(k, co)
        out = (cols * wdw[None, None, None, :, :c]).sum(3) if co == c else None
        if out is None:
            raise ValueError("depthwise deform conv requires co == c")
    else:
        cg = c // groups
        og = co // groups
        cols_g = cols.reshape(b, ho, wo, k, groups, cg)
        w_g = weight.reshape(k, cin_g, groups, og)  # cin_g == cg
        out = jnp.einsum("bhwkgc,kcgo->bhwgo", cols_g, w_g.transpose(0, 1, 2, 3))
        out = out.reshape(b, ho, wo, co)
    if bias is not None:
        out = out + bias
    return out


def bilinear_gather(x: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample K taps per output pixel (zeros outside the image).

    Args:
        x: (B, H, W, C) source.
        sy/sx: (B, Ho, Wo, K) absolute (possibly fractional) pixel coords.

    Returns (B, Ho, Wo, K, C). Same 4-corner vectorized-gather formulation as
    deform_conv2d above — the TPU replacement for F.grid_sample.
    """
    b, h, w, c = x.shape
    ho, wo, k = sy.shape[1], sy.shape[2], sy.shape[3]
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    dy = sy - y0
    dx = sx - x0

    def gather(ix, iy):
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        ok = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        flat = (iyc * w + ixc).reshape(b, -1)
        v = jnp.take_along_axis(x.reshape(b, h * w, c), flat[..., None], axis=1)
        return v.reshape(b, ho, wo, k, c) * ok[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx0, wx1 = (1 - dx)[..., None], dx[..., None]
    wy0, wy1 = (1 - dy)[..., None], dy[..., None]
    return v00 * wx0 * wy0 + v01 * wx1 * wy0 + v10 * wx0 * wy1 + v11 * wx1 * wy1


def dcnv3_sample(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    groups: int = 1,
    offset_scale: float = 1.0,
) -> jnp.ndarray:
    """DCNv3 grouped deformable aggregation (reference dcnv3.py
    dcnv3_core_pytorch): each of `groups` channel groups has its own K=k*k
    sampling offsets; taps are combined with a softmax-normalized mask (no
    weight contraction — projections happen outside).

    Args:
        x: (B, H, W, C), C % groups == 0.
        offsets: (B, Ho, Wo, groups*K*2), per tap (dy, dx).
        mask: (B, Ho, Wo, groups*K), softmax over K within each group.

    Returns (B, Ho, Wo, C).

    DECLARED DEVIATION (ADVICE r2): the reference dcnv3_core_pytorch emits
    offsets in (x, y) order scaled by 1/spatial_norm; we use (dy, dx) in
    absolute pixels. Training from scratch is unaffected (the offset head is
    learned), but importing pretrained DCNv3 weights requires swapping the
    per-tap offset channel pairs and rescaling by the spatial norm — handled
    by `dcnv3_offset_proj_to_tpu` below, which tools/convert_pt.py applies to
    DCNv3 offset-projection weights.
    """
    b, h, w, c = x.shape
    ho, wo = offsets.shape[1], offsets.shape[2]
    kk = k * k
    cg = c // groups

    oy = jnp.arange(ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - padding
    ty = jnp.arange(k, dtype=jnp.float32) * dilation
    base_y = (oy[:, None, None, None] + ty[None, None, :, None])
    base_x = (ox[None, :, None, None] + ty[None, None, None, :])
    base_y = jnp.broadcast_to(base_y, (ho, wo, k, k)).reshape(1, ho, wo, 1, kk)
    base_x = jnp.broadcast_to(base_x, (ho, wo, k, k)).reshape(1, ho, wo, 1, kk)

    off = offsets.reshape(b, ho, wo, groups, kk, 2) * offset_scale
    sy = (base_y + off[..., 0]).transpose(0, 3, 1, 2, 4).reshape(b * groups, ho, wo, kk)
    sx = (base_x + off[..., 1]).transpose(0, 3, 1, 2, 4).reshape(b * groups, ho, wo, kk)
    xg = x.reshape(b, h, w, groups, cg).transpose(0, 3, 1, 2, 4).reshape(b * groups, h, w, cg)
    cols = bilinear_gather(xg, sy, sx)  # (B*g, Ho, Wo, K, cg)
    m = mask.reshape(b, ho, wo, groups, kk).transpose(0, 3, 1, 2, 4).reshape(b * groups, ho, wo, kk)
    out = (cols * m[..., None]).sum(axis=3)  # (B*g, Ho, Wo, cg)
    return out.reshape(b, groups, ho, wo, cg).transpose(0, 2, 3, 1, 4).reshape(b, ho, wo, c)


def dcnv3_offset_proj_to_tpu(weight, bias=None, groups: int = 1, k: int = 3, scale: float = 1.0):
    """Convert a reference DCNv3 offset-projection (linear layer emitting
    (x, y)-ordered, spatial-normalized offsets) to this module's (dy, dx)
    absolute-pixel convention.

    For each of the groups*k*k taps the reference emits [x, y]; we expect
    [dy, dx], so the output-channel pairs are swapped and multiplied by
    `scale` (the reference's offset_scale / spatial-norm factor for the
    layer). Applied by tools/convert_pt.py when importing pretrained DCNv3
    weights (declared deviation — see dcnv3_sample docstring).

    Args:
        weight: (out, in) or (out, ...) array whose leading dim is
            groups*k*k*2 ordered [g, tap, (x, y)].
        bias: optional (out,) array, same channel order.
        groups, k: DCNv3 group count and kernel size.
        scale: multiplier converting normalized offsets to pixels.

    Returns (weight, bias) in [g, tap, (dy, dx)] order, pixel units.
    """
    import numpy as np

    kk = k * k
    w = np.asarray(weight)
    out = w.reshape(groups, kk, 2, *w.shape[1:])
    out = out[:, :, ::-1] * scale  # (x, y) -> (y, x), normalized -> pixels
    w2 = out.reshape(w.shape)
    b2 = None
    if bias is not None:
        b = np.asarray(bias)
        b2 = (b.reshape(groups, kk, 2)[:, :, ::-1] * scale).reshape(b.shape)
    return w2, b2
