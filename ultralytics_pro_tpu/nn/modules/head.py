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

    def _head_channels(self, ch0: int):
        """Box/cls branch widths (reference head.py:91)."""
        return max(16, ch0 // 4, self.reg_max * 4), max(ch0, min(self.nc, 100))

    def _level_box_cls(self, x, i: int, c2: int, c3: int, s: int, train: bool, prefix: str):
        """One level's (box, cls) maps — overridden by IDetect/DDetect."""
        box = _branch(self, x, f"{prefix}cv2_{i}", c2, 4 * self.reg_max, True, train,
                      final_bias_init=nn.initializers.constant(1.0))
        cls = _branch(self, x, f"{prefix}cv3_{i}", c3, self.nc, self.legacy, train,
                      final_bias_init=nn.initializers.constant(math.log(5 / self.nc / (640 / s) ** 2)))
        return box, cls

    def _raw(self, feats, train: bool, prefix: str = ""):
        """Per-level raw (box, cls) maps, concatenated channel-last."""
        ch0 = feats[0].shape[-1]
        c2, c3 = self._head_channels(ch0)
        s0 = self.strides[0] if len(self.strides) else 8
        raw = []
        for i, x in enumerate(feats):
            s = self.strides[i] if i < len(self.strides) else s0 * 2**i
            box, cls = self._level_box_cls(x, i, c2, c3, s, train, prefix)
            raw.append(jnp.concatenate([box, cls], axis=-1))
        return raw

    def _decode(self, raw, feats):
        """Per-level NHWC decode: DFL softmax-expectation + dist2bbox run in
        each level's native layout so XLA fuses them into the tower's conv
        epilogue, and only the small (B, A, 4+nc) results concatenate.

        The round-2 concat-then-decode formulation materialized a ~1 GB f32
        (B, 8400, 144) intermediate at bs128; this form measured +5.1% e2e
        on the chip (tools/perf_decode_probe.py: 2671 -> 2808 imgs/s)."""
        b = raw[0].shape[0]
        s0 = self.strides[0] if len(self.strides) else 8
        outs = []
        for i, r in enumerate(raw):
            s = float(self.strides[i] if i < len(self.strides) else s0 * 2**i)
            h, w = r.shape[1], r.shape[2]
            box = r[..., :4 * self.reg_max].astype(jnp.float32)
            probs = jax.nn.softmax(box.reshape(b, h, w, 4, self.reg_max), axis=-1)
            dist = probs @ jnp.arange(self.reg_max, dtype=jnp.float32)  # (B,H,W,4)
            ax = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, None, :]
            ay = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None, :, None]
            x1 = ax - dist[..., 0]
            y1 = ay - dist[..., 1]
            x2 = ax + dist[..., 2]
            y2 = ay + dist[..., 3]
            if self.xyxy:
                dbox = jnp.stack([x1, y1, x2, y2], -1) * s
            else:
                dbox = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1) * s
            cls = jax.nn.sigmoid(r[..., 4 * self.reg_max:]).astype(jnp.float32)
            outs.append(jnp.concatenate([dbox.reshape(b, h * w, 4),
                                         cls.reshape(b, h * w, self.nc)], -1))
        return jnp.concatenate(outs, axis=1)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        raw = self._raw(feats, train)
        if train:
            return {"feats": raw}
        return self._decode(raw, feats), {"feats": raw}


def decode_single_label(raw, strides, nc: int, reg_max: int = 16):
    """Fused single-label decode over per-level raw head maps.

    Takes the per-level (B, H, W, 4*reg_max+nc) maps a Detect head returns in
    aux["feats"] and produces (boxes (B, A, 4) xywh f32, conf (B, A) f32,
    cls (B, A) int32) WITHOUT ever materializing the (B, A, nc) class-score
    tensor: the class max/argmax run per level in NHWC, so XLA fuses
    sigmoid+max into the head tower epilogue and the only HBM tensors are the
    small 6-column outputs. On the chip this removes ~4 full passes over a
    361 MB f32 tensor at bs128@640 (tools/perf_stage_probe2.py: nms stage
    4.4 ms -> see BASELINE.md round-3 table).

    Matches the reference single-label candidate semantics
    (ultralytics/utils/nms.py:103: `conf, j = x[:, 5:].max(1)`): class chosen
    over ALL classes; a `classes=` filter drops rows afterwards (handled in
    non_max_suppression_fused).
    """
    b = raw[0].shape[0]
    boxes_out, conf_out, cls_out = [], [], []
    for r, s in zip(raw, strides):
        s = float(s)
        h, w = r.shape[1], r.shape[2]
        box = r[..., :4 * reg_max].astype(jnp.float32)
        probs = jax.nn.softmax(box.reshape(b, h, w, 4, reg_max), axis=-1)
        dist = probs @ jnp.arange(reg_max, dtype=jnp.float32)
        ax = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, None, :]
        ay = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None, :, None]
        x1 = ax - dist[..., 0]
        y1 = ay - dist[..., 1]
        x2 = ax + dist[..., 2]
        y2 = ay + dist[..., 3]
        dbox = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1) * s
        logits = r[..., 4 * reg_max:]
        # max in the tower's dtype is exact selection; sigmoid after, in f32
        conf = jax.nn.sigmoid(jnp.max(logits, axis=-1).astype(jnp.float32))
        cls = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        boxes_out.append(dbox.reshape(b, h * w, 4))
        conf_out.append(conf.reshape(b, h * w))
        cls_out.append(cls.reshape(b, h * w))
    return (jnp.concatenate(boxes_out, 1), jnp.concatenate(conf_out, 1),
            jnp.concatenate(cls_out, 1))


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


class IDetect(Detect):
    """YOLOR/v7-lineage detect head (reference head.py:406): the fork's
    anchor-free Detect with ImplicitA (pre-branch additive) and ImplicitM
    (post-branch multiplicative) implicit-knowledge layers on both branches."""

    def _level_box_cls(self, x, i, c2, c3, s, train, prefix):
        from ultralytics_pro_tpu.nn.modules.conv import ImplicitA, ImplicitM

        xb = ImplicitA(dtype=self.dtype, name=f"{prefix}ia2_{i}", parent=self)(x, train)
        xc = ImplicitA(dtype=self.dtype, name=f"{prefix}ia3_{i}", parent=self)(x, train)
        box = _branch(self, xb, f"{prefix}cv2_{i}", c2, 4 * self.reg_max, True, train,
                      final_bias_init=nn.initializers.constant(1.0))
        cls = _branch(self, xc, f"{prefix}cv3_{i}", c3, self.nc, self.legacy, train,
                      final_bias_init=nn.initializers.constant(math.log(5 / self.nc / (640 / s) ** 2)))
        box = ImplicitM(dtype=self.dtype, name=f"{prefix}im2_{i}", parent=self)(box, train)
        cls = ImplicitM(dtype=self.dtype, name=f"{prefix}im3_{i}", parent=self)(cls, train)
        return box, cls


class DDetect(Detect):
    """YOLOv9 detect head (reference head.py:601): Detect with group-4 box
    branch convs and wider cls channels (c2 divisible by 4, c3 up to 2*nc/128)."""

    def _head_channels(self, ch0: int):
        c2 = max(ch0 // 4, self.reg_max * 4, 16)
        c2 = int(math.ceil(c2 / 4) * 4)  # make_divisible(c2, 4)
        c3 = max(ch0, min(self.nc * 2, 128))
        return c2, c3

    def _level_box_cls(self, x, i, c2, c3, s, train, prefix):
        # box: Conv3x3 -> Conv3x3(g=4) -> 1x1 grouped conv (reference :668)
        h = Conv(c2=c2, k=3, dtype=self.dtype, name=f"{prefix}cv2_{i}_0", parent=self)(x, train)
        h = Conv(c2=c2, k=3, g=4, dtype=self.dtype, name=f"{prefix}cv2_{i}_1", parent=self)(h, train)
        box = nn.Conv(features=4 * self.reg_max, kernel_size=(1, 1), feature_group_count=4,
                      use_bias=True, bias_init=nn.initializers.constant(1.0),
                      dtype=self.dtype, name=f"{prefix}cv2_{i}_2", parent=self)(h)
        cls = _branch(self, x, f"{prefix}cv3_{i}", c3, self.nc, self.legacy, train,
                      final_bias_init=nn.initializers.constant(math.log(5 / self.nc / (640 / s) ** 2)))
        return box, cls


class ISegment(IDetect, Segment):
    """IDetect + prototype masks (reference head.py:890)."""


class IOBB(IDetect, OBB):
    """IDetect + rotation branch (reference head.py:1099)."""


class IPose(IDetect, Pose):
    """IDetect + keypoint branch (reference head.py:1344)."""


class DSegment(DDetect, Segment):
    """DDetect + masks (reference head.py:940): protos come from the LAST
    input feature via a 1x1 Conv; detection runs over feats[:-1]."""

    @nn.compact
    def __call__(self, feats, train: bool = False):
        protos = Conv(c2=self.nm, k=1, dtype=self.dtype, name="proto")(feats[-1], train)
        det_feats = feats[:-1]
        c4 = max(det_feats[0].shape[-1] // 4, self.nm)
        b = det_feats[0].shape[0]
        mc = [
            _branch(self, x, f"cv4_{i}", c4, self.nm, True, train).reshape(b, -1, self.nm)
            for i, x in enumerate(det_feats)
        ]
        mc = jnp.concatenate(mc, axis=1)
        raw = self._raw(det_feats, train)
        if train:
            return {"feats": raw, "mc": mc, "protos": protos}
        y = self._decode(raw, det_feats)
        return jnp.concatenate([y, mc], axis=-1), {"feats": raw, "mc": mc, "protos": protos}


class DOBB(DDetect, OBB):
    """DDetect + rotation branch (reference head.py:1153)."""


class DPose(DDetect, Pose):
    """DDetect + keypoint branch (reference head.py:1412)."""


class MAFDetect(Detect):
    """MAF-YOLO detect head (reference head.py:217): box tower = Conv1x1 ->
    UniRepLKNet large-kernel block (k=5) -> Conv1x1 -> 1x1 out; cls tower =
    the DW non-legacy v8 tower."""

    def _level_box_cls(self, x, i, c2, c3, s, train, prefix):
        from ultralytics_pro_tpu.nn.modules.reparam import UniRepLKNetBlock

        h = Conv(c2=c2, k=1, dtype=self.dtype, name=f"{prefix}cv2_{i}_0", parent=self)(x, train)
        h = UniRepLKNetBlock(k=5, dtype=self.dtype, name=f"{prefix}cv2_{i}_1",
                             parent=self)(h, train)
        h = Conv(c2=c2, k=1, dtype=self.dtype, name=f"{prefix}cv2_{i}_2", parent=self)(h, train)
        box = nn.Conv(features=4 * self.reg_max, kernel_size=(1, 1), use_bias=True,
                      bias_init=nn.initializers.constant(1.0), dtype=self.dtype,
                      name=f"{prefix}cv2_{i}_3", parent=self)(h)
        cls = _branch(self, x, f"{prefix}cv3_{i}", c3, self.nc, False, train,
                      final_bias_init=nn.initializers.constant(math.log(5 / self.nc / (640 / s) ** 2)))
        return box, cls


class ASFFDetect(Detect):
    """Detect with Adaptively-Spatial-Feature-Fusion level mixing before the
    towers (ASFF, arXiv:1911.09516). The reference ships
    cfg/models/v10/Detect/yolov10n-ASFF.yaml naming `Detect_ASFF` but defines
    no such class anywhere in its tree (its own parse_model cannot build that
    yaml); this is the canonical ASFF formulation its AFPN.py ASFF_2/ASFF_3
    blocks (:119,:149) use, applied per detect level: every level is resized
    to the target level's grid + width, softmax-gated per-pixel across
    levels, fused by a 3x3 conv, then fed to the standard v8 towers."""

    def _asff_fuse(self, feats, train):
        nl = len(feats)
        fused = []
        for i, xi in enumerate(feats):
            b, h, w, c = xi.shape
            srcs = []
            for j, xj in enumerate(feats):
                if j == i:
                    srcs.append(xj)
                    continue
                y = Conv(c2=c, k=1, dtype=self.dtype, name=f"asff{i}_in{j}",
                         parent=self)(xj, train)
                d = 0
                while y.shape[1] > h:  # stride-2 convs down to the target grid
                    y = Conv(c2=c, k=3, s=2, dtype=self.dtype,
                             name=f"asff{i}_down{j}_{d}", parent=self)(y, train)
                    d += 1
                if y.shape[1] < h:
                    y = jax.image.resize(y, (b, h, w, c), method="nearest")
                srcs.append(y)
            ws = [Conv(c2=8, k=1, dtype=self.dtype, name=f"asff{i}_w{j}",
                       parent=self)(s, train) for j, s in enumerate(srcs)]
            lw = nn.Conv(nl, (1, 1), dtype=self.dtype, name=f"asff{i}_wl",
                         parent=self)(jnp.concatenate(ws, axis=-1))
            lw = jax.nn.softmax(lw.astype(jnp.float32), axis=-1).astype(xi.dtype)
            out = sum(s * lw[..., j:j + 1] for j, s in enumerate(srcs))
            fused.append(Conv(c2=c, k=3, dtype=self.dtype, name=f"asff{i}_conv",
                              parent=self)(out, train))
        return fused

    def _raw(self, feats, train, prefix: str = ""):
        return super()._raw(self._asff_fuse(feats, train), train, prefix)


class MAFSegment(MAFDetect, Segment):
    """MAFDetect + prototype masks (reference head.py:840)."""


class MAFOBB(MAFDetect, OBB):
    """MAFDetect + angle branch (reference head.py:1045)."""


class MAFPose(MAFDetect, Pose):
    """MAFDetect + keypoint branch (reference head.py:1276)."""


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


class RTDETRDecoder(ConvBase):
    """RT-DETR decoder head (reference head.py:1905): flatten multiscale
    features, pick top-nq encoder queries, refine through a deformable
    transformer decoder with per-layer box/score heads.

    Output boxes are normalized cxcywh (the RT-DETR convention; the validator
    scales to pixels — no NMS anywhere).
    """

    nc: int = 80
    hd: int = 256  # hidden dim
    nq: int = 300  # queries
    ndl: int = 6  # decoder layers
    nh: int = 8
    ndp: int = 4  # sampling points
    d_ffn: int = 1024
    strides: Tuple[int, ...] = (8, 16, 32)  # kept for BaseModel stride probing
    legacy: bool = True  # unused; Detect-compat

    def _anchors(self, shapes, grid_size: float = 0.05, eps: float = 1e-2):
        """Grid anchors per level in logit space + validity mask (reference
        head.py:2078)."""
        anchors = []
        for i, (h, w) in enumerate(shapes):
            sy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            sx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
            xy = jnp.stack([gx, gy], -1).reshape(h * w, 2)
            wh = jnp.full((h * w, 2), grid_size * (2.0**i), jnp.float32)
            anchors.append(jnp.concatenate([xy, wh], -1))
        anchors = jnp.concatenate(anchors, 0)[None]  # (1, A, 4)
        valid = ((anchors > eps) & (anchors < 1 - eps)).all(-1, keepdims=True)
        anchors = jnp.log(anchors / (1 - anchors))
        anchors = jnp.where(valid, anchors, jnp.inf)
        return anchors, valid.astype(jnp.float32)

    @nn.compact
    def __call__(self, feats, train: bool = False, dn=None):
        """dn (train only): contrastive-denoising queries from make_cdn_batch —
        {"cls": (b, ng, 2G) int32, "bbox_logit": (b, ng, 2G, 4)} (reference
        get_cdn_group, models/utils/ops.py)."""
        from ultralytics_pro_tpu.nn.modules.conv import Conv
        from ultralytics_pro_tpu.nn.modules.transformer import (
            DeformableTransformerDecoderLayer,
            MLP,
        )

        b = feats[0].shape[0]
        shapes = tuple((f.shape[1], f.shape[2]) for f in feats)
        # input projections (reference input_proj)
        tokens = []
        for i, f in enumerate(feats):
            t = Conv(c2=self.hd, k=1, act=False, dtype=self.dtype, name=f"input_proj_{i}")(f, train)
            tokens.append(t.reshape(b, -1, self.hd))
        memory = jnp.concatenate(tokens, 1)  # (B, A, hd)

        anchors, valid_mask = self._anchors(shapes)
        enc = nn.LayerNorm(dtype=self.dtype, name="enc_output_norm")(
            nn.Dense(self.hd, dtype=self.dtype, name="enc_output")(memory * valid_mask)
        )
        enc_scores = nn.Dense(self.nc, dtype=self.dtype, name="enc_score_head")(enc)  # (B, A, nc)

        # top-nq query selection by max class logit (reference head.py:2143)
        nq = min(self.nq, enc_scores.shape[1])  # tiny images have < nq anchors
        topv, topi = jax.lax.top_k(enc_scores.max(-1), nq)  # (B, nq)
        feat_sel = jnp.take_along_axis(enc, topi[..., None], axis=1)  # (B, nq, hd)
        anc_sel = jnp.take_along_axis(jnp.broadcast_to(anchors, (b, anchors.shape[1], 4)),
                                      topi[..., None], axis=1)
        enc_box_delta = MLP(hidden_dim=self.hd, output_dim=4, num_layers=3,
                            dtype=self.dtype, name="enc_bbox_head")(feat_sel)
        refer_logit = enc_box_delta + anc_sel
        refer_bbox = jax.nn.sigmoid(refer_logit)  # (B, nq, 4) cxcywh
        enc_topk_scores = jnp.take_along_axis(enc_scores, topi[..., None], axis=1)

        embed = jax.lax.stop_gradient(feat_sel)
        bbox = refer_bbox

        # CDN denoising queries prepended at train time (reference
        # RTDETRDetectionModel.loss via get_cdn_group): per-group block
        # attention so dn groups see neither each other nor the matched set.
        t_dn = 0
        attn_mask = None
        # created unconditionally so init (which runs without dn) and train
        # apply share one param tree
        emb_table = self.param(
            "denoising_class_embed",
            nn.initializers.normal(1.0), (self.nc + 1, self.hd))
        if train and dn is not None:
            ng, two_g = dn["cls"].shape[1], dn["cls"].shape[2]
            t_dn = ng * two_g
            dn_embed = emb_table[dn["cls"].reshape(b, t_dn)]
            dn_bbox = jax.nn.sigmoid(dn["bbox_logit"].reshape(b, t_dn, 4))
            embed = jnp.concatenate([dn_embed.astype(embed.dtype), embed], 1)
            bbox = jnp.concatenate([dn_bbox, bbox], 1)
            t = t_dn + nq
            allowed = jnp.zeros((t, t), bool)
            allowed = allowed.at[t_dn:, t_dn:].set(True)  # matched <-> matched
            gi = jnp.arange(t_dn) // two_g
            same_group = gi[:, None] == gi[None, :]
            allowed = allowed.at[:t_dn, :t_dn].set(same_group)  # dn intra-group
            allowed = allowed.at[:t_dn, t_dn:].set(True)  # dn may read matched
            attn_mask = allowed[None, None]  # (1, 1, t, t), flax True=attend

        # query_pos_head is SHARED across decoder layers (reference head.py)
        query_pos_head = MLP(hidden_dim=2 * self.hd, output_dim=self.hd, num_layers=2,
                             dtype=self.dtype, name="query_pos_head")
        dec_bboxes = []
        dec_scores = []
        for i in range(self.ndl):
            qpos = query_pos_head(bbox)
            embed = DeformableTransformerDecoderLayer(
                d_model=self.hd, n_heads=self.nh, d_ffn=self.d_ffn,
                n_levels=len(feats), n_points=self.ndp, dtype=self.dtype,
                name=f"decoder_layer_{i}",
            )(embed, jax.lax.stop_gradient(bbox), tokens, shapes, query_pos=qpos,
              attn_mask=attn_mask, train=train)
            delta = MLP(hidden_dim=self.hd, output_dim=4, num_layers=3,
                        dtype=self.dtype, name=f"dec_bbox_head_{i}")(embed)
            logit_prev = jnp.log(bbox / (1 - bbox + 1e-9) + 1e-9)
            bbox = jax.nn.sigmoid(delta + logit_prev)
            score = nn.Dense(self.nc, dtype=self.dtype, name=f"dec_score_head_{i}")(embed)
            dec_bboxes.append(bbox)
            dec_scores.append(score)
            if train:
                bbox = jax.lax.stop_gradient(bbox)

        dec_bboxes = jnp.stack(dec_bboxes)  # (ndl, B, t_dn + nq, 4)
        dec_scores = jnp.stack(dec_scores)
        aux = {
            "dec_bboxes": dec_bboxes[:, :, t_dn:],
            "dec_scores": dec_scores[:, :, t_dn:],
            "enc_bboxes": refer_bbox,
            "enc_scores": enc_topk_scores,
        }
        if t_dn:
            aux["dn_bboxes"] = dec_bboxes[:, :, :t_dn]
            aux["dn_scores"] = dec_scores[:, :, :t_dn]
        if train:
            return aux
        y = jnp.concatenate([dec_bboxes[-1], jax.nn.sigmoid(dec_scores[-1])], -1)
        return y, aux


class YOLOEDetect(Detect):
    """Prompt-conditioned detect head (reference head.py:1653): box branch as
    Detect; cls branch projects features to an embedding (cv3) matched against
    prompt embeddings by a BNContrastiveHead (cv4). Prompts are text
    (tpe -> Residual-SwiGLU adapter `reprta` + L2 norm), visual (binary masks
    -> SAVPE), or both concatenated (TVP training). The class count at decode
    time is the number of prompt embeddings."""

    embed: int = 512
    with_bn: bool = True

    def _prompt_embeddings(self, feats, prompts, train: bool):
        """Raw prompts -> (B, T[+Q], embed) class prompt embeddings.
        Both adapters always run (on zero-size dummies when a mode is absent)
        so init/apply share one param tree across prompt modes."""
        from ultralytics_pro_tpu.nn.modules.yoloe import Residual, SAVPE

        b = feats[0].shape[0]
        h3, w3 = feats[0].shape[1], feats[0].shape[2]
        c3 = max(feats[0].shape[-1], min(self.nc, 100))
        if prompts is None:
            prompts = {}
        if not isinstance(prompts, dict):
            prompts = {"tpe": prompts}
        tpe = prompts.get("tpe")
        vp = prompts.get("vp")
        vpe = prompts.get("vpe")  # precomputed (B, Q, embed)
        if tpe is None:
            tpe = jnp.zeros((b, 0, self.embed), jnp.float32)
        t = Residual(ec=self.embed, dtype=self.dtype, name="reprta", parent=self)(tpe, train)
        t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)  # get_tpe (head.py:1764)
        # SAVPE dummy must be a NON-EMPTY all-ones mask: a zero-size Q would
        # put a BatchNorm over an empty tensor (NaN stats AND NaN cotangents
        # through the mean's 1/N); the single dummy row is sliced away after.
        vp_in = vp if vp is not None else jnp.ones((b, 1, h3, w3), jnp.float32)
        v = SAVPE(c3=c3, embed=self.embed, dtype=self.dtype, name="savpe", parent=self)(
            feats, vp_in, train
        )
        if vp is None:
            v = v[:, :0]
        if vpe is not None:
            v = jnp.concatenate([v, vpe.astype(v.dtype)], axis=1)
        pe = jnp.concatenate([t, v], axis=1)
        if pe.shape[1] == 0:  # prompt-free shape probe
            pe = jnp.zeros((b, self.nc, self.embed), jnp.float32)
        return pe

    def _raw_yoloe(self, feats, cls_pe, train: bool):
        from ultralytics_pro_tpu.nn.modules.world import BNContrastiveHead, ContrastiveHead

        ch0 = feats[0].shape[-1]
        c2 = max(16, ch0 // 4, self.reg_max * 4)
        c3 = max(ch0, min(self.nc, 100))
        head_cls = BNContrastiveHead if self.with_bn else ContrastiveHead
        raw = []
        for i, x in enumerate(feats):
            box = _branch(self, x, f"cv2_{i}", c2, 4 * self.reg_max, True, train,
                          final_bias_init=nn.initializers.constant(1.0))
            emb = _branch(self, x, f"cv3_{i}", c3, self.embed, self.legacy, train)
            cls = head_cls(dtype=self.dtype, name=f"cv4_{i}")(emb, cls_pe, train)
            raw.append(jnp.concatenate([box, cls], axis=-1))
        return raw

    @nn.compact
    def __call__(self, feats, prompts=None, train: bool = False):
        cls_pe = self._prompt_embeddings(feats, prompts, train)
        raw = self._raw_yoloe(feats, cls_pe, train)
        if train:
            return {"feats": raw}
        b = feats[0].shape[0]
        nc = cls_pe.shape[1]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_t = make_anchors(shapes, self.strides, 0.5, dtype=jnp.float32)
        no = 4 * self.reg_max + nc
        flat = jnp.concatenate([r.reshape(b, -1, no) for r in raw], axis=1)
        box, cls = jnp.split(flat, [4 * self.reg_max], axis=-1)
        dist = DFL(reg_max=self.reg_max, name="dfl")(box.astype(jnp.float32))
        dbox = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
        y = jnp.concatenate([dbox, jax.nn.sigmoid(cls.astype(jnp.float32))], axis=-1)
        return y, {"feats": raw}


class YOLOESegment(YOLOEDetect):
    """YOLOEDetect + prototype masks (reference head.py:1839)."""

    nm: int = 32
    npr: int = 256

    @nn.compact
    def __call__(self, feats, prompts=None, train: bool = False):
        protos = Proto(c_=self.npr, c2=self.nm, dtype=self.dtype, name="proto")(feats[0], train)
        c5 = max(feats[0].shape[-1] // 4, self.nm)
        b = feats[0].shape[0]
        mc = [
            _branch(self, x, f"cv5_{i}", c5, self.nm, True, train).reshape(b, -1, self.nm)
            for i, x in enumerate(feats)
        ]
        mc = jnp.concatenate(mc, axis=1)
        cls_pe = self._prompt_embeddings(feats, prompts, train)
        raw = self._raw_yoloe(feats, cls_pe, train)
        if train:
            return {"feats": raw, "mc": mc, "protos": protos}
        nc = cls_pe.shape[1]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_t = make_anchors(shapes, self.strides, 0.5, dtype=jnp.float32)
        no = 4 * self.reg_max + nc
        flat = jnp.concatenate([r.reshape(b, -1, no) for r in raw], axis=1)
        box, cls = jnp.split(flat, [4 * self.reg_max], axis=-1)
        dist = DFL(reg_max=self.reg_max, name="dfl")(box.astype(jnp.float32))
        dbox = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
        y = jnp.concatenate([dbox, jax.nn.sigmoid(cls.astype(jnp.float32)), mc], axis=-1)
        return y, {"feats": raw, "mc": mc, "protos": protos}


def lrpc_mask_scores(pf_logits, cls_logits, conf: float):
    """Static-shape LRPC (reference LRPCHead head.py:1590): the torch head
    boolean-gathers anchors whose proposal-filter score clears `conf`; the
    TPU formulation uses the reference's own export branch — multiply the
    class logits by the mask instead of gathering, keeping (B, A, nc) static.

    pf_logits: (B, A, 1) proposal-filter logits; cls_logits: (B, A, nc).
    Returns masked cls logits and the (B, A) keep mask."""
    keep = jax.nn.sigmoid(pf_logits[..., 0]) > conf
    return cls_logits * keep[..., None].astype(cls_logits.dtype), keep


class v10Detect(Detect):
    """YOLOv10 end-to-end head (reference head.py:2227): dual one2many/one2one
    branches; inference decodes the one2one branch and takes top-max_det — no
    NMS anywhere."""

    end2end: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # one2many (gradient path) + one2one (detached input) branches
        raw_o2m = self._raw(feats, train)
        detached = [jax.lax.stop_gradient(f) for f in feats]
        raw_o2o = self._raw(detached, train, prefix="one2one_")
        if train:
            return {"feats": raw_o2m, "one2one": raw_o2o}
        y = self._decode(raw_o2o, feats)  # (B, A, 4+nc) xywh pixels
        y = self.postprocess_topk(y)
        return y, {"feats": raw_o2m, "one2one": raw_o2o}

    def postprocess_topk(self, y):
        """Top-max_det selection over (anchor, class) pairs (reference
        Detect.postprocess head.py:194). Returns (B, max_det, 4+nc)-compatible
        layout: boxes repeated per selection with one-hot-ish scores kept."""
        b, a, no = y.shape
        nc = no - 4
        boxes, scores = y[..., :4], y[..., 4:]
        flat = scores.reshape(b, -1)  # (B, A*nc)
        k = min(self.max_det, flat.shape[1])
        topv, topi = jax.lax.top_k(flat, k)
        anchor_idx = topi // nc
        cls_idx = (topi % nc).astype(jnp.float32)
        sel_boxes = jnp.take_along_axis(boxes, anchor_idx[..., None], axis=1)
        return jnp.concatenate(
            [sel_boxes, topv[..., None], cls_idx[..., None]], axis=-1
        )  # (B, max_det, 6): xywh, conf, cls


class WorldDetect(Detect):
    """Open-vocabulary detect head: box branch + contrastive region-text
    classification (reference head.py:1534). The class count is the number of
    text embeddings passed at call time."""

    embed: int = 512
    with_bn: bool = False

    @nn.compact
    def __call__(self, feats, text=None, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.world import BNContrastiveHead, ContrastiveHead

        if text is None:  # fall back: random-normal guide of nc texts
            text = jnp.zeros((feats[0].shape[0], self.nc, self.embed), jnp.float32)
        b = feats[0].shape[0]
        nc = text.shape[1]
        ch0 = feats[0].shape[-1]
        c2 = max(16, ch0 // 4, self.reg_max * 4)
        c3 = max(ch0, min(nc, 100))
        head_cls = BNContrastiveHead if self.with_bn else ContrastiveHead
        raw = []
        for i, x in enumerate(feats):
            box = _branch(self, x, f"cv2_{i}", c2, 4 * self.reg_max, True, train,
                          final_bias_init=nn.initializers.constant(1.0))
            emb = _branch(self, x, f"cv3_{i}", c3, self.embed, True, train)
            cls = head_cls(dtype=self.dtype, name=f"cv4_{i}")(emb, text, train)
            raw.append(jnp.concatenate([box, cls], axis=-1))
        if train:
            return {"feats": raw}
        # decode with dynamic nc
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_t = make_anchors(shapes, self.strides, 0.5, dtype=jnp.float32)
        no = 4 * self.reg_max + nc
        flat = jnp.concatenate([r.reshape(b, -1, no) for r in raw], axis=1)
        box, cls = jnp.split(flat, [4 * self.reg_max], axis=-1)
        dist = DFL(reg_max=self.reg_max, name="dfl")(box.astype(jnp.float32))
        dbox = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
        y = jnp.concatenate([dbox, jax.nn.sigmoid(cls.astype(jnp.float32))], axis=-1)
        return y, {"feats": raw}


# canonical COCO anchors (reference cfg/models/v5/yolov5.yaml anchors key)
V5_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)


class AnchorDetect(ConvBase):
    """TRUE anchor-based YOLOv5/v7 head (reference Detect-for-v5 lineage /
    IDetect head.py:406 with anchors): one 1x1 conv per level emits
    (B, H, W, na*(5+nc)); eval decode is the v5 grid formulation
    xy = (2*sig(txy) - 0.5 + grid) * stride, wh = (2*sig(twh))^2 * anchor,
    score = sig(obj) * sig(cls). Optional ImplicitA/M pre/post adds make it
    the v7 IDetect. Output contract matches Detect: (B, A, 4+nc) with xywh
    pixel boxes then per-class scores, so NMS/val/predict run unchanged."""

    nc: int = 80
    anchors: Any = V5_ANCHORS
    strides: Tuple[int, ...] = (8, 16, 32)
    implicit: bool = False
    legacy: bool = True  # unused; kept for builder-signature parity

    @property
    def na(self):
        return len(self.anchors[0])

    @property
    def no(self):
        return 5 + self.nc

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from ultralytics_pro_tpu.nn.modules.conv import ImplicitA, ImplicitM

        raw = []
        for i, x in enumerate(feats):
            if self.implicit:
                x = ImplicitA(name=f"ia_{i}")(x)
            y = nn.Conv(self.na * self.no, (1, 1), dtype=self.dtype, name=f"m_{i}")(x)
            if self.implicit:
                y = ImplicitM(name=f"im_{i}")(y)
            raw.append(y)  # (B, H, W, na*no)
        if train:
            return {"feats": raw, "anchor_feats": raw}
        outs = []
        for i, y in enumerate(raw):
            b, h, w, _ = y.shape
            s = self.strides[i]
            t = y.reshape(b, h, w, self.na, self.no).astype(jnp.float32)
            sig = jax.nn.sigmoid(t)
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32), indexing="ij")
            grid = jnp.stack([gx, gy], -1)[None, :, :, None, :]  # (1,H,W,1,2)
            anc = jnp.asarray(self.anchors[i], jnp.float32)[None, None, None]  # (1,1,1,na,2)
            xy = (sig[..., :2] * 2.0 - 0.5 + grid) * s
            wh = (sig[..., 2:4] * 2.0) ** 2 * anc
            score = sig[..., 5:] * sig[..., 4:5]
            outs.append(jnp.concatenate([xy, wh, score], -1).reshape(b, -1, 4 + self.nc))
        return jnp.concatenate(outs, axis=1), {"feats": raw}
