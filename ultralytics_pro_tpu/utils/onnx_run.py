"""Native ONNX graph evaluator for the exported op subset.

Runs ModelProto graphs produced by engine/onnx_export.py (and any ONNX model
restricted to the same op set) with jax — no onnxruntime needed. Used by
AutoBackend as the fallback .onnx runtime and by the export round-trip test.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ultralytics_pro_tpu.utils.onnx_proto import ONNX2NP, parse_model


def _conv(jnp, lax, x, w, attrs):
    strides = attrs.get("strides", [1, 1])
    pads = attrs.get("pads", [0, 0, 0, 0])  # t, l, b, r
    dil = attrs.get("dilations", [1, 1])
    group = attrs.get("group", 1)
    pad = ((pads[0], pads[2]), (pads[1], pads[3]))
    return lax.conv_general_dilated(
        x, w, tuple(strides), pad, rhs_dilation=tuple(dil),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=group)


def _maxpool(jnp, lax, x, attrs):
    k = attrs["kernel_shape"]
    s = attrs.get("strides", k)
    pads = attrs.get("pads", [0, 0, 0, 0])
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, k[0], k[1]), (1, 1, s[0], s[1]),
        ((0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])))


def run_onnx(model_bytes: bytes, feeds: Dict[str, np.ndarray]) -> List[np.ndarray]:
    import jax.numpy as jnp
    from jax import lax

    m = parse_model(model_bytes)
    env: Dict[str, object] = {k: jnp.asarray(v) for k, v in m["initializers"].items()}
    for k, v in feeds.items():
        env[k] = jnp.asarray(v)

    for node in m["nodes"]:
        t = node["op_type"]
        a = node["attrs"]
        ins = [env[i] for i in node["inputs"] if i]
        o = node["outputs"]
        if t == "Conv":
            r = _conv(jnp, lax, ins[0], ins[1], a)
            if len(ins) > 2:
                r = r + ins[2].reshape(1, -1, 1, 1)
        elif t == "ConvTranspose":
            s = a.get("strides", [1, 1])
            pads = a.get("pads", [0, 0, 0, 0])
            w = np.asarray(ins[1])  # (Cin, Cout, kh, kw)
            kh, kw = w.shape[2], w.shape[3]
            # equivalent dilated-lhs conv on the flipped HWIO kernel
            whwio = jnp.asarray(np.flip(w.transpose(2, 3, 0, 1), (0, 1)).copy())
            jp = ((kh - 1 - pads[0], kh - 1 - pads[2]),
                  (kw - 1 - pads[1], kw - 1 - pads[3]))
            r = lax.conv_general_dilated(
                ins[0], whwio, (1, 1), jp, lhs_dilation=tuple(s),
                dimension_numbers=("NCHW", "HWIO", "NCHW"))
            if len(ins) > 2:
                r = r + ins[2].reshape(1, -1, 1, 1)
        elif t == "MaxPool":
            r = _maxpool(jnp, lax, ins[0], a)
        elif t == "Transpose":
            r = jnp.transpose(ins[0], a["perm"])
        elif t == "Reshape":
            r = ins[0].reshape([int(v) for v in np.asarray(ins[1])])
        elif t == "Expand":
            r = jnp.broadcast_to(ins[0], [int(v) for v in np.asarray(ins[1])])
        elif t == "Concat":
            r = jnp.concatenate(ins, axis=a["axis"])
        elif t == "Split":
            sizes = [int(v) for v in np.asarray(ins[1])]
            r = jnp.split(ins[0], np.cumsum(sizes)[:-1], axis=a["axis"])
            for name, part in zip(o, r):
                env[name] = part
            continue
        elif t == "Slice":
            st, en, ax, sp = (np.asarray(x).tolist() for x in ins[1:5])
            idx = [slice(None)] * ins[0].ndim
            for s0, e0, a0, p0 in zip(st, en, ax, sp):
                idx[a0] = slice(s0, e0, p0)
            r = ins[0][tuple(idx)]
        elif t == "Add":
            r = ins[0] + ins[1]
        elif t == "Sub":
            r = ins[0] - ins[1]
        elif t == "Mul":
            r = ins[0] * ins[1]
        elif t == "Div":
            r = ins[0] / ins[1]
        elif t == "Max":
            r = jnp.maximum(ins[0], ins[1])
        elif t == "Min":
            r = jnp.minimum(ins[0], ins[1])
        elif t == "Pow":
            r = ins[0] ** ins[1]
        elif t == "MatMul":
            r = ins[0] @ ins[1]
        elif t == "Sigmoid":
            import jax

            r = jax.nn.sigmoid(ins[0])
        elif t == "Exp":
            r = jnp.exp(ins[0])
        elif t == "Tanh":
            r = jnp.tanh(ins[0])
        elif t == "Sin":
            r = jnp.sin(ins[0])
        elif t == "Cos":
            r = jnp.cos(ins[0])
        elif t == "Atan":
            r = jnp.arctan(ins[0])
        elif t == "Log":
            r = jnp.log(ins[0])
        elif t == "Sign":
            r = jnp.sign(ins[0])
        elif t == "Sqrt":
            r = jnp.sqrt(ins[0])
        elif t == "Reciprocal":
            r = 1.0 / ins[0]
        elif t == "Neg":
            r = -ins[0]
        elif t == "Abs":
            r = jnp.abs(ins[0])
        elif t == "Floor":
            r = jnp.floor(ins[0])
        elif t == "Identity":
            r = ins[0]
        elif t == "Cast":
            r = ins[0].astype(ONNX2NP[a["to"]])
        elif t == "Where":
            r = jnp.where(ins[0], ins[1], ins[2])
        elif t in ("ReduceMax", "ReduceSum", "ReduceMin"):
            axes = tuple(int(v) for v in np.asarray(ins[1]))
            fn = {"ReduceMax": jnp.max, "ReduceSum": jnp.sum, "ReduceMin": jnp.min}[t]
            r = fn(ins[0], axis=axes, keepdims=bool(a.get("keepdims", 1)))
        elif t == "Pad":
            pads = np.asarray(ins[1]).tolist()
            n = ins[0].ndim
            cfg = [(pads[i], pads[n + i]) for i in range(n)]
            cval = float(np.asarray(ins[2])) if len(ins) > 2 else 0.0
            r = jnp.pad(ins[0], cfg, constant_values=cval)
        else:
            raise NotImplementedError(f"native ONNX runner: op '{t}'")
        env[o[0]] = r

    return [np.asarray(env[name]) for name in m["outputs"]]
