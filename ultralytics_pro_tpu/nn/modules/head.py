"""Task heads: Detect, Segment, Pose, OBB, Classify — flax.linen, NHWC.

Behavioral parity with the reference heads (ultralytics/nn/modules/head.py:
Detect:28, Segment:790, OBB:991, Pose:1208, Classify:1481): same branch
topology (cv2 box / cv3 cls / cv4 extras, legacy vs DWConv variants), same
decode math (DFL softmax expectation -> dist2bbox * stride), but laid out
channel-last with all levels flattened to one static (B, A, no) tensor so the
whole decode is a handful of fused XLA ops.

Outputs:
    train=True  -> dict of raw per-level maps (loss consumes these).
    train=False -> (decoded, aux) where decoded is (B, A, 4+nc[+extra])
                   channel-LAST (the reference returns channel-first (B, no, A)).
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.block import DFL, Proto
from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase, DWConv
from ultralytics_pro_tpu.ops.anchors import dist2bbox, dist2rbox, make_anchors


def _branch(mod, x, name: str, mid: int, out: int, legacy: bool, train: bool,
            final_bias_init=None):
    """One head branch: Conv3x3 -> Conv3x3 -> 1x1 conv(out) (legacy), or the
    DWConv variant (reference head.py:92-110). Submodules named {name}_0/1/2."""
    if legacy:
        x = Conv(c2=mid, k=3, dtype=mod.dtype, name=f"{name}_0", parent=mod)(x, train)
        x = Conv(c2=mid, k=3, dtype=mod.dtype, name=f"{name}_1", parent=mod)(x, train)
    else:
        c1 = x.shape[-1]
        x = DWConv(c2=c1, k=3, dtype=mod.dtype, name=f"{name}_0_0", parent=mod)(x, train)
        x = Conv(c2=mid, k=1, dtype=mod.dtype, name=f"{name}_0_1", parent=mod)(x, train)
        x = DWConv(c2=mid, k=3, dtype=mod.dtype, name=f"{name}_1_0", parent=mod)(x, train)
        x = Conv(c2=mid, k=1, dtype=mod.dtype, name=f"{name}_1_1", parent=mod)(x, train)
    bias_init = nn.initializers.zeros if final_bias_init is None else final_bias_init
    return nn.Conv(features=out, kernel_size=(1, 1), use_bias=True, bias_init=bias_init,
                   dtype=mod.dtype, name=f"{name}_2", parent=mod)(x)


class Detect(ConvBase):
    """Anchor-free YOLO detect head (reference head.py:28)."""

    nc: int = 80
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)
    legacy: bool = True
    xyxy: bool = False
    end2end: bool = False
    max_det: int = 300

    @property
    def no(self):
        return self.nc + 4 * self.reg_max

    def _raw(self, feats, train: bool, prefix: str = ""):
        """Per-level raw (box, cls) maps, concatenated channel-last."""
        ch0 = feats[0].shape[-1]
        c2 = max(16, ch0 // 4, self.reg_max * 4)
        c3 = max(ch0, min(self.nc, 100))
        s0 = self.strides[0] if len(self.strides) else 8
        raw = []
        for i, x in enumerate(feats):
            s = self.strides[i] if i < len(self.strides) else s0 * 2**i
            box = _branch(self, x, f"{prefix}cv2_{i}", c2, 4 * self.reg_max, True, train,
                          final_bias_init=nn.initializers.constant(1.0))
            cls = _branch(self, x, f"{prefix}cv3_{i}", c3, self.nc, self.legacy, train,
                          final_bias_init=nn.initializers.constant(math.log(5 / self.nc / (640 / s) ** 2)))
            raw.append(jnp.concatenate([box, cls], axis=-1))
        return raw

    def _decode(self, raw, feats):
        b = raw[0].shape[0]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_t = make_anchors(shapes, self.strides, 0.5, dtype=jnp.float32)
        flat = jnp.concatenate([r.reshape(b, -1, self.no) for r in raw], axis=1)
        box, cls = jnp.split(flat, [4 * self.reg_max], axis=-1)
        dist = DFL(reg_max=self.reg_max, name="dfl")(box.astype(jnp.float32))
        dbox = dist2bbox(dist, anchors[None], xywh=not self.xyxy) * stride_t[None]
        return jnp.concatenate([dbox, jax.nn.sigmoid(cls.astype(jnp.float32))], axis=-1)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        raw = self._raw(feats, train)
        if train:
            return {"feats": raw}
        return self._decode(raw, feats), {"feats": raw}


class Segment(Detect):
    """Detect + prototype masks (reference head.py:790)."""

    nm: int = 32
    npr: int = 256

    @nn.compact
    def __call__(self, feats, train: bool = False):
        protos = Proto(c_=self.npr, c2=self.nm, dtype=self.dtype, name="proto")(feats[0], train)
        c4 = max(feats[0].shape[-1] // 4, self.nm)
        b = feats[0].shape[0]
        mc = [
            _branch(self, x, f"cv4_{i}", c4, self.nm, True, train).reshape(b, -1, self.nm)
            for i, x in enumerate(feats)
        ]
        mc = jnp.concatenate(mc, axis=1)  # (B, A, nm)
        raw = self._raw(feats, train)
        if train:
            return {"feats": raw, "mc": mc, "protos": protos}
        y = self._decode(raw, feats)
        return jnp.concatenate([y, mc], axis=-1), {"feats": raw, "mc": mc, "protos": protos}


class OBB(Detect):
    """Detect + rotation angle branch (reference head.py:991)."""

    ne: int = 1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c4 = max(feats[0].shape[-1] // 4, self.ne)
        b = feats[0].shape[0]
        angle = [
            _branch(self, x, f"cv4_{i}", c4, self.ne, True, train).reshape(b, -1, self.ne)
            for i, x in enumerate(feats)
        ]
        angle = jnp.concatenate(angle, axis=1)  # (B, A, ne)
        angle = (jax.nn.sigmoid(angle) - 0.25) * math.pi  # [-pi/4, 3pi/4]
        raw = self._raw(feats, train)
        if train:
            return {"feats": raw, "angle": angle}
        # rotated decode: dist2rbox instead of dist2bbox
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_t = make_anchors(shapes, self.strides, 0.5, dtype=jnp.float32)
        flat = jnp.concatenate([r.reshape(b, -1, self.no) for r in raw], axis=1)
        box, cls = jnp.split(flat, [4 * self.reg_max], axis=-1)
        dist = DFL(reg_max=self.reg_max, name="dfl")(box.astype(jnp.float32))
        dbox = dist2rbox(dist, angle[..., :1], anchors[None]) * stride_t[None]
        y = jnp.concatenate([dbox, jax.nn.sigmoid(cls.astype(jnp.float32)), angle], axis=-1)
        return y, {"feats": raw, "angle": angle}


class Pose(Detect):
    """Detect + keypoint branch (reference head.py:1208)."""

    kpt_shape: Tuple[int, int] = (17, 3)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(feats[0].shape[-1] // 4, nk)
        b = feats[0].shape[0]
        kpt = [
            _branch(self, x, f"cv4_{i}", c4, nk, True, train).reshape(b, -1, nk)
            for i, x in enumerate(feats)
        ]
        kpt = jnp.concatenate(kpt, axis=1)  # (B, A, nk)
        raw = self._raw(feats, train)
        if train:
            return {"feats": raw, "kpt": kpt}
        y = self._decode(raw, feats)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_t = make_anchors(shapes, self.strides, 0.5, dtype=jnp.float32)
        pk = self.kpts_decode(kpt, anchors, stride_t)
        return jnp.concatenate([y, pk], axis=-1), {"feats": raw, "kpt": kpt}

    def kpts_decode(self, kpt, anchors, stride_t):
        """Decode (B, A, nk) keypoints (reference head.py:1254): xy*2 + (anchor-0.5),
        scaled by stride; visibility sigmoid when ndim==3."""
        b, a, _ = kpt.shape
        k = kpt.reshape(b, a, self.kpt_shape[0], self.kpt_shape[1])
        xy = (k[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * stride_t[None, :, None, :]
        if self.kpt_shape[1] == 3:
            k = jnp.concatenate([xy, jax.nn.sigmoid(k[..., 2:3])], axis=-1)
        else:
            k = xy
        return k.reshape(b, a, -1)


class Classify(ConvBase):
    """Image classification head (reference head.py:1481)."""

    c2: int = 1000
    k: int = 1
    s: int = 1
    p: Any = None
    g: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(x, axis=-1)
        c_ = 1280
        x = Conv(c2=c_, k=self.k, s=self.s, p=self.p, g=self.g, dtype=self.dtype, name="conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        logits = nn.Dense(features=self.c2, dtype=self.dtype, name="linear")(x)
        if train:
            return logits
        return jax.nn.softmax(logits, axis=-1)
