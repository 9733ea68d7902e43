"""Pallas multiscale-deformable-attention sampling kernel (SURVEY.md §2.9:
the reference's F.grid_sample-based MSDeformAttn, nn/modules/utils.py:103).

Design (DEFA-style restructuring): the messy coordinate math — per-level
pixel coords, corner decomposition, bilinear×attention weights, in-bounds
masking — stays in XLA where it fuses into a handful of elementwise ops; the
kernel receives FLAT row indices (B, NH, Q, S) into the level-concatenated
value table plus combined weights, keeps the whole (V, hd) value table for one
(batch, head) resident in VMEM, and does the weighted gather-accumulate as a
one-hot matmul on the MXU in Q-tiles:

    out[q] = sum_s w[q, s] * val[idx[q, s]]
           = (onehot(idx) * w) @ val        # (TQ, V) @ (V, hd)

For RT-DETR sizes (V=8400, hd=32, S=48) the one-hot tile is (64, 8400) f32 ~
2.1MB — well inside VMEM, and the matmul runs at MXU rates instead of the
scalar-gather path. An XLA-gather fallback (`msda_gather_xla`) provides the
agreement reference and the CPU path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 64


def _msda_kernel(idx_ref, w_ref, val_ref, out_ref):
    """Grid: (B*NH, Q_tiles). Blocks: idx/w (1, TILE_Q, S), val (1, V, hd),
    out (1, TILE_Q, hd) — leading dim is the (batch*head) block axis."""
    idx = idx_ref[0]  # (TQ, S) int32
    w = w_ref[0]      # (TQ, S) f32
    v = val_ref[0]    # (V, hd)
    tq, s = idx.shape
    vcount = v.shape[0]
    # weighted one-hot: rows of (TQ, V) with w at the sampled positions.
    # build it S-slice by S-slice to bound the live one-hot to (TQ, V).
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, vcount), 1)
    acc = jnp.zeros((tq, vcount), jnp.float32)
    for si in range(s):
        acc = acc + jnp.where(col == idx[:, si:si + 1], w[:, si:si + 1], 0.0)
    out_ref[0] = jnp.dot(acc, v.astype(jnp.float32),
                         preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def msda_sample_pallas(val, idx, w, interpret: bool = False):
    """val (B, NH, V, hd); idx (B, NH, Q, S) int32 flat rows into V (invalid
    rows must carry w=0); w (B, NH, Q, S) combined bilinear*attn weights.
    Returns (B, NH, Q, hd) f32."""
    b, nh, vcount, hd = val.shape
    q, s = idx.shape[2], idx.shape[3]
    qt = -(-q // TILE_Q)
    pad_q = qt * TILE_Q - q
    if pad_q:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    idx2 = idx.reshape(b * nh, qt * TILE_Q, s)
    w2 = w.reshape(b * nh, qt * TILE_Q, s).astype(jnp.float32)
    val2 = val.reshape(b * nh, vcount, hd)

    out = pl.pallas_call(
        _msda_kernel,
        grid=(b * nh, qt),
        in_specs=[
            pl.BlockSpec((1, TILE_Q, s), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q, s), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vcount, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_Q, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nh, qt * TILE_Q, hd), jnp.float32),
        interpret=interpret,
    )(idx2, w2, val2)
    return out.reshape(b, nh, qt * TILE_Q, hd)[:, :, :q]


def msda_flatten_coords(shapes, locs, attn):
    """Coordinate math shared by both paths: sampling locations in [0,1] ->
    flat corner indices + combined weights over the level-concatenated table.

    shapes: static [(H_l, W_l)]; locs (B, Q, NH, L, P, 2); attn (B, Q, NH, L, P).
    Returns idx (B, NH, Q, L*P*4) int32, w (B, NH, Q, L*P*4) f32.
    """
    b, q, nh, l, p, _ = locs.shape
    idx_all, w_all = [], []
    base = 0
    for lvl, (hl, wl) in enumerate(shapes):
        xy = locs[:, :, :, lvl]  # (B, Q, NH, P, 2)
        x = xy[..., 0] * wl - 0.5
        y = xy[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        dx = x - x0
        dy = y - y0
        a = attn[:, :, :, lvl]  # (B, Q, NH, P)
        for cx, cy, cw in ((x0, y0, (1 - dx) * (1 - dy)), (x0 + 1, y0, dx * (1 - dy)),
                           (x0, y0 + 1, (1 - dx) * dy), (x0 + 1, y0 + 1, dx * dy)):
            ib = (cx >= 0) & (cx <= wl - 1) & (cy >= 0) & (cy <= hl - 1)
            flat = (jnp.clip(cy, 0, hl - 1).astype(jnp.int32) * wl
                    + jnp.clip(cx, 0, wl - 1).astype(jnp.int32)) + base
            idx_all.append(flat)
            w_all.append(cw * a * ib)
        base += hl * wl
    idx = jnp.stack(idx_all, -1).reshape(b, q, nh, l * p * 4).transpose(0, 2, 1, 3)
    w = jnp.stack(w_all, -1).reshape(b, q, nh, l * p * 4).transpose(0, 2, 1, 3)
    return idx, w


def msda_gather_xla(val, idx, w):
    """XLA take_along_axis reference path (agreement target + CPU default)."""
    b, nh, vcount, hd = val.shape
    q, s = idx.shape[2], idx.shape[3]
    flat = idx.reshape(b, nh, q * s)
    g = jnp.take_along_axis(val, flat[..., None], axis=2)  # (B, NH, QS, hd)
    g = g.reshape(b, nh, q, s, hd)
    return (g * w[..., None]).sum(axis=3).astype(jnp.float32)
