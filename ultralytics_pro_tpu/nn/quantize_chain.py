"""Chain-level int8 PTQ: carry int8 activations through the backbone.

Round-3 measurement (BASELINE.md int8 table) showed per-conv int8
(nn/quantize.py) wins only where convs are MXU-bound: each quantized conv
pays a quantize seam (read bf16, write int8) that LOSES on the HBM-bound
early backbone — exactly the region the stage table says is bandwidth-limited
(stem+p2 at 161% of HBM "peak"). The fix is to keep activations in int8
BETWEEN blocks so the tensors crossing HBM are 1 byte/elem instead of 2, and
the only f32 math left is the per-channel epilogue (dequant + folded BN +
SiLU + requant) that XLA fuses into the convolution output.

This module interprets the compiled layer program (nn/tasks.py LayerSpecs)
directly for the longest eligible backbone prefix — consecutive Conv / C2f /
SPPF layers with sequential wiring (the YOLOv5/8/11 backbone shape) — and
runs the remaining layers through the regular flax modules (optionally under
the per-conv int8 interceptor for the deep 3x3s that win standalone).

Scale plumbing: every edge tensor is quantized at the scale its CONSUMING
conv was calibrated for (nn/quantize.py collect_conv_stats input-absmax), so
convs never requantize their input; the only int8->int8 rescales happen at
C2f concat seams. BatchNorm (inference) folds into the dequant as
y = conv_i32 * (s_in * w_scale * gamma/sigma) + (beta - mu * gamma/sigma).

Reference counterpart: the TensorRT-INT8 deployment flow
(ultralytics/engine/exporter.py int8= arg); TRT carries int8 across layers
the same way via its calibration graph.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import BN_EPS, autopad

# layer types the chain interpreter understands. Conv/C2f/SPPF carry the
# int8 math; Upsample (nearest: exact on int8, scale-preserving) and Concat
# (int8->int8 requant to the consumer's calibrated scale) extend the chain
# through the PAN neck so the WHOLE pre-head graph stays 1 byte/elem in HBM.
_CHAIN_TYPES = ("Conv", "C2f", "SPPF", "Upsample", "Concat")
_CONV_TYPES = ("Conv", "C2f", "SPPF")
# model-level special cases the generic rest-of-network runner cannot serve
_UNSUPPORTED_TYPES = {"ImagePoolingAttn", "C2fAttn", "WorldDetect", "YOLOEDetect",
                      "RTDETRDecoder"}


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _norm_type(t: str) -> str:
    return "Upsample" if t == "nn.Upsample" else t


class _QConv:
    """One quantized conv+BN+SiLU: int8 in -> int8 (or f32) out."""

    def __init__(self, kernel_i8, alpha, beta, strides, padding,
                 out_scale: Optional[float], in_scale: float,
                 input_shift: bool = False):
        self.kernel = kernel_i8              # (H, W, I, O) int8
        self.alpha = alpha                   # (O,) f32: s_in * w_scale * bn_g
        self.beta = beta                     # (O,) f32: folded BN bias
        self.strides = strides
        self.padding = padding
        self.out_scale = out_scale           # None => emit f32
        self.in_scale = in_scale
        # uint8-range inputs (folded-preproc stem): x-128 fits int8 exactly;
        # the +128 offset becomes an int32 bias of 128 * sum(kernel)
        self.input_shift = input_shift
        if input_shift:
            self.shift_bias = 128 * jnp.sum(
                kernel_i8.astype(jnp.int32), axis=(0, 1, 2))  # (O,) int32

    def quantize_in(self, x):
        """f32/bf16 activation -> int8 at this conv's calibrated scale."""
        if self.input_shift:
            return jnp.clip(jnp.round(x.astype(jnp.float32)) - 128,
                            -128, 127).astype(jnp.int8)
        return jnp.clip(jnp.round(x.astype(jnp.float32) / self.in_scale),
                        -127, 127).astype(jnp.int8)

    def __call__(self, x_q):
        y = jax.lax.conv_general_dilated(
            x_q, self.kernel, window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        if self.input_shift:
            y = y + self.shift_bias
        yf = y.astype(jnp.float32) * self.alpha + self.beta
        yf = jax.nn.silu(yf)
        if self.out_scale is None:
            return yf
        return jnp.clip(jnp.round(yf / self.out_scale), -127, 127).astype(jnp.int8)

    def residual(self, x_q, x_scale):
        """Variant with an int8 residual added before requant (Bottleneck)."""
        def run(xq_in):
            y = jax.lax.conv_general_dilated(
                xq_in, self.kernel, window_strides=self.strides,
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            yf = y.astype(jnp.float32) * self.alpha + self.beta
            yf = jax.nn.silu(yf) + x_q.astype(jnp.float32) * x_scale
            if self.out_scale is None:
                return yf
            return jnp.clip(jnp.round(yf / self.out_scale), -127, 127).astype(jnp.int8)
        return run


def _requant(q, s_from: float, s_to: float):
    if abs(s_from - s_to) < 1e-12:
        return q
    return jnp.clip(jnp.round(q.astype(jnp.float32) * (s_from / s_to)),
                    -127, 127).astype(jnp.int8)


def _max_pool_same_i8(x, k: int):
    """k x k stride-1 same max pool on int8 (monotonic: scale-preserving)."""
    pad = k // 2
    return jax.lax.reduce_window(
        x, jnp.int8(-128), jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))


class _ChainBuildError(Exception):
    pass


class _Builder:
    def __init__(self, params, batch_stats, stats: Dict):
        self.params = params
        self.bstats = batch_stats
        self.stats = stats  # {path_tuple: in_amax}

    def in_scale(self, *path) -> float:
        key = tuple(path) + ("conv",)
        if key not in self.stats:
            raise _ChainBuildError(f"no calibration stats for {key}")
        amax = self.stats[key]
        if amax <= 0:
            raise _ChainBuildError(f"degenerate calibration amax at {key}")
        return float(amax) / 127.0

    def _tree(self, root, *path):
        node = root
        for p in path:
            if p not in node:
                raise _ChainBuildError(f"missing params node {path}")
            node = node[p]
        return node

    def qconv(self, path, out_scale: Optional[float], strides=(1, 1), k=1,
              p=None, d: int = 1, input_shift: bool = False,
              in_scale: Optional[float] = None) -> _QConv:
        """Quantize the Conv block at `path` (tuple under params root)."""
        conv = self._tree(self.params, *path, "conv")
        bn_p = self._tree(self.params, *path, "bn")
        bn_s = self._tree(self.bstats, *path, "bn")
        kernel = np.asarray(conv["kernel"], np.float32)
        if kernel.ndim != 4:
            raise _ChainBuildError(f"non-2D conv at {path}")
        if "bias" in conv:
            raise _ChainBuildError(f"biased conv at {path}")
        s_in = 1.0 if input_shift else (
            in_scale if in_scale is not None else self.in_scale(*path))
        w_scale = np.maximum(np.abs(kernel).reshape(-1, kernel.shape[3]).max(0),
                             1e-8) / 127.0
        qk = np.clip(np.round(kernel / w_scale[None, None, None, :]),
                     -127, 127).astype(np.int8)
        gamma = np.asarray(bn_p["scale"], np.float32)
        beta = np.asarray(bn_p["bias"], np.float32)
        mean = np.asarray(bn_s["mean"], np.float32)
        var = np.asarray(bn_s["var"], np.float32)
        g = gamma / np.sqrt(var + BN_EPS)
        alpha = s_in * w_scale * g
        bias = beta - mean * g
        pp = autopad(k, p, d)
        pads = tuple((q, q) for q in _pair(pp))
        return _QConv(jnp.asarray(qk), jnp.asarray(alpha, jnp.float32),
                      jnp.asarray(bias, jnp.float32), _pair(strides), pads,
                      out_scale, s_in, input_shift=input_shift)


def _first_conv_path(spec) -> tuple:
    """Path suffix of the first conv a chain layer applies to its input."""
    name = f"layers_{spec.i}"
    if spec.type_name == "Conv":
        return (name,)
    return (name, "cv1")  # C2f / SPPF


def _region_scan(specs) -> List:
    """Longest leading graph region the interpreter can serve: Conv/C2f/SPPF
    carrying the int8 math plus nearest-Upsample and Concat wiring, with every
    `from` source inside the region (layer 0 alone reads the model input)."""
    region: List = []
    ids = set()
    for s in specs:
        t = _norm_type(s.type_name)
        if t not in _CHAIN_TYPES:
            break
        kw = dict(s.kwargs)
        if t == "Conv" and (kw.get("g", 1) != 1 or kw.get("d", 1) != 1
                            or kw.get("act", True) is not True
                            or kw.get("p") not in (None,)):
            break
        if t == "C2f" and kw.get("g", 1) != 1:
            break
        if t == "Upsample" and kw.get("mode", "nearest") != "nearest":
            break
        if t == "Concat" and kw.get("dim", 1) != 1:
            break
        fs = s.f if isinstance(s.f, tuple) else (s.f,)
        ok = True
        for j in fs:
            src = s.i - 1 if j == -1 else j
            if src == -1 and not region:
                continue  # layer 0 consumes the model input
            if src not in ids:
                ok = False
                break
        if not ok:
            break
        region.append(s)
        ids.add(s.i)
    return region


def _build_head_plan(spec, region_ids, params, b: _Builder) -> Optional[Dict]:
    """Detect-head tower extension: when the layer after the region is the
    final plain Detect head (legacy Conv3x3-Conv3x3-1x1 towers, reference
    head.py:91), carry int8 INTO each level's box/cls towers. The neck output
    maps then stay int8 in HBM (1 byte/elem at the largest spatial sizes) and
    the 3x3 tower convs ride the int8 MXU; only the final 1x1 logits convs
    and the decode run in f32."""
    if spec.type_name != "Detect":
        return None
    fs = spec.f if isinstance(spec.f, tuple) else (spec.f,)
    if not all(j in region_ids for j in fs):
        return None
    name = f"layers_{spec.i}"
    layer_params = params.get(name, {})
    levels = []
    try:
        for li, src in enumerate(fs):
            for branch in (f"cv2_{li}", f"cv3_{li}"):
                for part in ("_0", "_1", "_2"):
                    if branch + part not in layer_params:
                        return None  # non-legacy tower naming
            s2_in = b.in_scale(name, f"cv2_{li}_0")
            s3_in = b.in_scale(name, f"cv3_{li}_0")
            cv2_0 = b.qconv((name, f"cv2_{li}_0"),
                            b.in_scale(name, f"cv2_{li}_1"), k=3)
            cv2_1 = b.qconv((name, f"cv2_{li}_1"), None, k=3)
            cv3_0 = b.qconv((name, f"cv3_{li}_0"),
                            b.in_scale(name, f"cv3_{li}_1"), k=3)
            cv3_1 = b.qconv((name, f"cv3_{li}_1"), None, k=3)
            f2 = layer_params[f"cv2_{li}_2"]
            f3 = layer_params[f"cv3_{li}_2"]
            levels.append({
                "src": src, "s_cv2_in": s2_in, "s_cv3_in": s3_in,
                "cv2_0": cv2_0, "cv2_1": cv2_1, "cv3_0": cv3_0, "cv3_1": cv3_1,
                "f2_kernel": jnp.asarray(f2["kernel"], jnp.float32),
                "f2_bias": jnp.asarray(f2["bias"], jnp.float32),
                "f3_kernel": jnp.asarray(f3["kernel"], jnp.float32),
                "f3_bias": jnp.asarray(f3["bias"], jnp.float32),
            })
    except _ChainBuildError:
        return None
    return {"i": spec.i, "f": fs, "levels": levels}


def build_chain_plan(model, variables, stats: Dict) -> Optional[Dict]:
    """Build the chain-int8 plan for the longest eligible leading graph region
    (for v5/v8/v11-shaped models: the entire backbone AND PAN neck; the head
    consumes dequantized saved maps).

    Returns None when the model shape is unsupported (the caller falls back
    to per-conv PTQ). `stats` is collect_conv_stats output on the SAME
    variables this plan will serve (post preproc-fold included).
    """
    specs = model.specs
    if getattr(model.module, "act_name", None):
        return None  # non-SiLU default activation: epilogues assume silu
    for s in specs:
        if s.type_name in _UNSUPPORTED_TYPES or s.multi:
            return None

    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    b = _Builder(params, bstats, stats)

    region = _region_scan(specs)
    if len(region) < 3 or region[0].type_name != "Conv":
        return None

    # head-tower extension: legacy Detect directly after the region
    head = None
    if len(region) == len(specs) - 1:
        head = _build_head_plan(specs[-1], {s.i for s in region}, params, b)
    head_req = {lev["src"]: lev["s_cv2_in"]
                for lev in (head["levels"] if head else [])}

    # Emit scale per layer = the calibrated input scale of its FIRST in-region
    # consumer (transitively through scale-preserving Upsample/Concat); other
    # consumers requant int8->int8 at consumption. No consumer in-region
    # (head-feeding maps, the region tail) => emit f32.
    consumers: Dict[int, List] = {s.i: [] for s in region}
    for s in region:
        fs = s.f if isinstance(s.f, tuple) else (s.f,)
        for j in fs:
            src = s.i - 1 if j == -1 else j
            if src in consumers:
                consumers[src].append(s)

    try:
        req: Dict[int, Optional[float]] = {}
        for s in reversed(region):
            cons = consumers[s.i]
            if not cons:
                req[s.i] = head_req.get(s.i)  # head tower scale, else f32
            elif cons[0].type_name in _CONV_TYPES:
                req[s.i] = b.in_scale(*_first_conv_path(cons[0]))
            else:  # Upsample / Concat pass the requirement through
                req[s.i] = req[cons[0].i]

        entries = []
        for idx, s in enumerate(region):
            out_scale = req[s.i]
            name = f"layers_{s.i}"
            kw = dict(s.kwargs)
            t_name = _norm_type(s.type_name)
            if t_name == "Conv":
                qc = b.qconv((name,), out_scale, strides=kw.get("s", 1),
                             k=kw.get("k", 1), p=kw.get("p"),
                             input_shift=(idx == 0 and b.stats.get(
                                 (name, "conv"), 0.0) > 32.0))
                entries.append({"type": "Conv", "i": s.i, "f": s.f, "cv": qc,
                                "in_scale": qc.in_scale, "out_scale": out_scale})
            elif t_name == "C2f":
                n = kw.get("n", 1)
                shortcut = bool(kw.get("shortcut", False))
                s_cv1 = b.in_scale(name, "cv1")
                s_cv2 = b.in_scale(name, "cv2")
                s_m = [b.in_scale(name, f"m_{j}", "cv1") for j in range(n)]
                s_m_in = [b.in_scale(name, f"m_{j}", "cv2") for j in range(n)]
                cv1 = b.qconv((name, "cv1"), s_m[0], k=1)
                ms = []
                for j in range(n):
                    nxt_s = s_m[j + 1] if j + 1 < n else s_cv2
                    m_cv1 = b.qconv((name, f"m_{j}", "cv1"), s_m_in[j], k=3)
                    m_cv2 = b.qconv((name, f"m_{j}", "cv2"), nxt_s, k=3)
                    ms.append((m_cv1, m_cv2, s_m[j], nxt_s))
                cv2 = b.qconv((name, "cv2"), out_scale, k=1, in_scale=s_cv2)
                entries.append({"type": "C2f", "i": s.i, "f": s.f, "cv1": cv1,
                                "m": ms, "cv2": cv2, "s_cv2": s_cv2,
                                "s_m0": s_m[0], "in_scale": s_cv1,
                                "shortcut": shortcut, "out_scale": out_scale})
            elif t_name == "SPPF":
                s_cv1 = b.in_scale(name, "cv1")
                s_cv2 = b.in_scale(name, "cv2")
                cv1 = b.qconv((name, "cv1"), s_cv2, k=1)
                cv2 = b.qconv((name, "cv2"), out_scale, k=1, in_scale=s_cv2)
                entries.append({"type": "SPPF", "i": s.i, "f": s.f, "cv1": cv1,
                                "cv2": cv2, "s_cv2": s_cv2, "in_scale": s_cv1,
                                "k": kw.get("k", 5), "out_scale": out_scale})
            elif t_name == "Upsample":
                entries.append({"type": "Upsample", "i": s.i, "f": s.f,
                                "scale": int(kw.get("scale", 2)),
                                "out_scale": out_scale})
            else:  # Concat
                entries.append({"type": "Concat", "i": s.i, "f": s.f,
                                "out_scale": out_scale})
    except _ChainBuildError:
        return None

    return {"entries": entries, "n_prefix": len(region),
            "save": set(model.save), "head": head}


def _run_conv_entry(e, q):
    """Run one conv-bearing chain entry on int8 input at e['in_scale']."""
    if e["type"] == "Conv":
        return e["cv"](q)
    if e["type"] == "SPPF":
        y = e["cv1"](q)  # int8 @ s_cv2
        y1 = _max_pool_same_i8(y, e["k"])
        y2 = _max_pool_same_i8(y1, e["k"])
        y3 = _max_pool_same_i8(y2, e["k"])
        return e["cv2"](jnp.concatenate([y, y1, y2, y3], -1))
    # C2f
    y = e["cv1"](q)  # int8 @ s_m0
    c = y.shape[-1] // 2
    pieces = [(y[..., :c], e["s_m0"]), (y[..., c:], e["s_m0"])]
    cur = y[..., c:]
    cur_scale = e["s_m0"]
    for (m_cv1, m_cv2, s_in, s_out) in e["m"]:
        mid = m_cv1(cur)
        if e["shortcut"]:
            cur = m_cv2.residual(cur, cur_scale)(mid)
        else:
            cur = m_cv2(mid)
        cur_scale = s_out
        pieces.append((cur, cur_scale))
    cat = jnp.concatenate(
        [_requant(p, s, e["s_cv2"]) for p, s in pieces], -1)
    return e["cv2"](cat)


def _as_q(v, scale: float):
    """Coerce a cached value to int8 at `scale` (requant or fresh quantize)."""
    kind, t, s = v
    if kind == "q":
        return _requant(t, s, scale)
    return jnp.clip(jnp.round(t.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


def _as_f(v, dtype):
    kind, t, s = v
    if kind == "q":
        return (t.astype(jnp.float32) * s).astype(dtype)
    return t.astype(dtype)


def chain_quantized_apply(model, plan: Dict, rest_qtable: Optional[Dict] = None):
    """Returns apply(variables, x, train=False) running the leading graph
    region in carried int8 and the remaining layers through the regular
    modules (under the per-conv int8 interceptor when rest_qtable is given)."""
    from contextlib import nullcontext

    from ultralytics_pro_tpu.nn.quantize import _quant_interceptor

    module = model.module
    specs = model.specs
    save = set(model.save)
    n_prefix = plan["n_prefix"]
    entries = plan["entries"]

    def apply_fn(variables, x, train: bool = False, **kw):
        assert not train, "chain int8 is a serving path"
        assert entries[0]["type"] == "Conv", "chain must start with a Conv"
        # cache: layer index -> ("q", int8, scale) | ("f", tensor, None)
        vals: Dict[int, tuple] = {}

        def src_vals(e):
            fs = e["f"] if isinstance(e["f"], tuple) else (e["f"],)
            return [vals[e["i"] - 1 if j == -1 else j] for j in fs]

        for k_e, e in enumerate(entries):
            t = e["type"]
            if t in _CONV_TYPES:
                if k_e == 0:
                    q_in = e["cv"].quantize_in(x)
                else:
                    q_in = _as_q(src_vals(e)[0], e["in_scale"])
                y_out = _run_conv_entry(e, q_in)
            elif t == "Upsample":
                kind, v, s = src_vals(e)[0]
                r = jnp.repeat(jnp.repeat(v, e["scale"], axis=1),
                               e["scale"], axis=2)
                vals[e["i"]] = (kind, r, s)
                continue
            else:  # Concat
                srcs = src_vals(e)
                if e["out_scale"] is None:
                    y_out = jnp.concatenate(
                        [_as_f(v, x.dtype) for v in srcs], -1)
                else:
                    y_out = jnp.concatenate(
                        [_as_q(v, e["out_scale"]) for v in srcs], -1)
            vals[e["i"]] = ("f", y_out, None) if e["out_scale"] is None \
                else ("q", y_out, e["out_scale"])

        head = plan.get("head")
        if head is not None:
            # quantized Detect towers: neck maps arrive int8 at the box
            # tower's calibrated scale; the cls tower requants int8->int8
            def final_1x1(t, kernel, bias):
                yf = jax.lax.conv_general_dilated(
                    t, kernel, window_strides=(1, 1), padding=((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return yf + bias

            raw = []
            for lev in head["levels"]:
                kind, q_map, s_map = vals[lev["src"]]
                assert kind == "q", "head source must be int8-carried"
                q2 = _requant(q_map, s_map, lev["s_cv2_in"])
                box = final_1x1(lev["cv2_1"](lev["cv2_0"](q2)),
                                lev["f2_kernel"], lev["f2_bias"])
                q3 = _requant(q_map, s_map, lev["s_cv3_in"])
                cls = final_1x1(lev["cv3_1"](lev["cv3_0"](q3)),
                                lev["f3_kernel"], lev["f3_bias"])
                raw.append(jnp.concatenate([box, cls], -1).astype(x.dtype))
            detect = module.bind(variables).layers[-1]
            if train:
                return {"feats": raw}
            return detect._decode(raw, raw), {"feats": raw}

        # dequantize what the rest of the network (the head) consumes
        y: Dict[int, Any] = {i: _as_f(v, x.dtype) for i, v in vals.items()
                             if i in save}
        out = _as_f(vals[specs[n_prefix - 1].i], x.dtype)

        # rest of the network through the real modules
        bound = module.bind(variables)
        ctx = nn.intercept_methods(_quant_interceptor(rest_qtable)) \
            if rest_qtable else nullcontext()
        with ctx:
            for spec, layer in zip(specs[n_prefix:], bound.layers[n_prefix:]):
                f = spec.f
                if isinstance(f, tuple):
                    inp = [out if j == -1 else y[j] for j in f]
                elif f != -1:
                    inp = y[f]
                else:
                    inp = out
                out = layer(inp, train=train)
                if spec.i in save:
                    y[spec.i] = out
        return out

    return apply_fn


def quantize_model_chain(model, variables, calib_batches,
                         rest_min_ch: int = 128, rest_min_k: int = 3):
    """PTQ entry point: calibrate, build the chain plan for the backbone
    prefix and the per-conv qtable for the rest. Returns (plan, rest_qtable)
    or (None, qtable) when the model is chain-ineligible."""
    from ultralytics_pro_tpu.nn.quantize import build_qtable, collect_conv_stats

    stats = collect_conv_stats(model.module, variables, calib_batches)
    plan = build_chain_plan(model, variables, stats)
    skip = None
    if plan is not None:
        skip = {"/".join(p) for p in stats
                if int(p[0].split("_")[1]) < plan["n_prefix"]
                and p[0].startswith("layers_")}
        if plan.get("head"):
            hname = f"layers_{plan['head']['i']}"
            skip |= {"/".join(p) for p in stats if p[0] == hname}
    qtable = build_qtable(variables, stats, min_ch=rest_min_ch,
                          min_k=rest_min_k, skip_paths=skip)
    return plan, qtable
