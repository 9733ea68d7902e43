"""TorchScript export (reference engine/exporter.py export_torchscript:614).

The reference traces its torch model with torch.jit.trace and saves the
artifact with metadata in `_extra_files={'config.txt': json}`. Our compute
path is jax, but torch (CPU) is a first-class runtime in this environment, so
the export is real rather than gated: the model's inference jaxpr is lowered
to the ONNX-subset graph (engine/onnx_export.py), that graph is interpreted
with native torch ops inside an nn.Module, and torch.jit.trace flattens the
interpretation into a plain TorchScript program (aten ops + folded weights)
loadable by `torch.jit.load` / libtorch with no dependency on this package.

I/O contract matches the reference torchscript artifact: input (B, 3, H, W)
float NCHW, output (B, 4+nc[+extra], A) (reference exporter.py:631 layout);
segment adds the (B, 32, H/4, W/4) proto tensor as the second output.
"""

from __future__ import annotations

import numpy as np

from ultralytics_pro_tpu.utils.onnx_proto import ONNX2NP, parse_model

_INT64_MIN = np.iinfo(np.int64).min


def _torch_dtype(torch, np_dtype):
    return torch.from_numpy(np.zeros(0, dtype=np_dtype)).dtype


def _conv(torch, F, x, w, b, attrs):
    s = [int(v) for v in attrs.get("strides", [1, 1])]
    t, l, bo, r = [int(v) for v in attrs.get("pads", [0, 0, 0, 0])]
    d = [int(v) for v in attrs.get("dilations", [1, 1])]
    g = int(attrs.get("group", 1))
    if t == bo and l == r:
        return F.conv2d(x, w, b, stride=s, padding=(t, l), dilation=d, groups=g)
    x = F.pad(x, (l, r, t, bo))
    return F.conv2d(x, w, b, stride=s, padding=0, dilation=d, groups=g)


def _conv_transpose(torch, F, x, w, b, attrs):
    s = [int(v) for v in attrs.get("strides", [1, 1])]
    t, l, bo, r = [int(v) for v in attrs.get("pads", [0, 0, 0, 0])]
    g = int(attrs.get("group", 1))
    # ONNX ConvTranspose pads crop the full (padding=0) output; torch only
    # accepts symmetric padding, so crop explicitly for exactness
    y = F.conv_transpose2d(x, w, b, stride=s, padding=0, groups=g)
    h, wd = y.shape[2], y.shape[3]
    return y[:, :, t:h - bo, l:wd - r]


def _maxpool(torch, F, x, attrs):
    k = [int(v) for v in attrs["kernel_shape"]]
    s = [int(v) for v in attrs.get("strides", k)]
    t, l, bo, r = [int(v) for v in attrs.get("pads", [0, 0, 0, 0])]
    if any((t, l, bo, r)):
        x = F.pad(x, (l, r, t, bo), value=float("-inf"))
    return F.max_pool2d(x, kernel_size=k, stride=s, padding=0)


def _slice(torch, x, starts, ends, axes, steps):
    flip_dims = []
    idx = [slice(None)] * x.dim()
    for s0, e0, a0, p0 in zip(starts, ends, axes, steps):
        if p0 < 0:
            # the exporter only emits negative steps as full-axis reversal
            # (onnx_export._rev): start=-1, end=INT64_MIN, step=-1
            if not (p0 == -1 and s0 == -1 and e0 == _INT64_MIN):
                raise NotImplementedError(f"Slice step {p0} with bounds {s0}:{e0}")
            flip_dims.append(int(a0))
        else:
            idx[int(a0)] = slice(int(s0), int(e0), int(p0))
    if flip_dims:
        x = torch.flip(x, flip_dims)
    return x[tuple(idx)]


def build_torch_module(model_bytes: bytes):
    """Parse ModelProto bytes and return (torch.nn.Module, metadata dict).

    The module's forward interprets the node list with torch ops; under
    torch.jit.trace the interpretation disappears and only the aten graph
    remains. Initializers are registered buffers so .to()/state_dict work."""
    import torch
    import torch.nn.functional as F

    m = parse_model(model_bytes)

    class OnnxTorchModule(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self._names = []
            for i, (k, v) in enumerate(m["initializers"].items()):
                arr = np.ascontiguousarray(v)
                if arr.dtype == np.bool_:
                    arr = arr.astype(np.uint8)
                self.register_buffer(f"w{i}", torch.from_numpy(arr))
                self._names.append(k)

        def forward(self, x):
            env = {k: getattr(self, f"w{i}") for i, k in enumerate(self._names)}
            env["images"] = x.permute(0, 2, 3, 1)  # NCHW artifact I/O -> NHWC graph
            for node in m["nodes"]:
                t = node["op_type"]
                a = node["attrs"]
                ins = [env[i] for i in node["inputs"] if i]
                o = node["outputs"]
                if t == "Conv":
                    r = _conv(torch, F, ins[0], ins[1],
                              ins[2] if len(ins) > 2 else None, a)
                elif t == "ConvTranspose":
                    r = _conv_transpose(torch, F, ins[0], ins[1],
                                        ins[2] if len(ins) > 2 else None, a)
                elif t == "MaxPool":
                    r = _maxpool(torch, F, ins[0], a)
                elif t == "Transpose":
                    r = ins[0].permute([int(p) for p in a["perm"]])
                elif t == "Reshape":
                    r = ins[0].reshape([int(v) for v in ins[1]])
                elif t == "Expand":
                    r = ins[0].expand([int(v) for v in ins[1]])
                elif t == "Concat":
                    r = torch.cat(ins, dim=int(a["axis"]))
                elif t == "Split":
                    parts = torch.split(ins[0], [int(v) for v in ins[1]],
                                        dim=int(a["axis"]))
                    for name, part in zip(o, parts):
                        env[name] = part
                    continue
                elif t == "Slice":
                    st, en, ax, sp = (v.tolist() for v in ins[1:5])
                    r = _slice(torch, ins[0], st, en, ax, sp)
                elif t == "Add":
                    r = ins[0] + ins[1]
                elif t == "Sub":
                    r = ins[0] - ins[1]
                elif t == "Mul":
                    r = ins[0] * ins[1]
                elif t == "Div":
                    r = ins[0] / ins[1]
                elif t == "Max":
                    r = torch.maximum(ins[0], ins[1])
                elif t == "Min":
                    r = torch.minimum(ins[0], ins[1])
                elif t == "Pow":
                    r = ins[0] ** ins[1]
                elif t == "MatMul":
                    r = torch.matmul(ins[0], ins[1])
                elif t == "Sigmoid":
                    r = torch.sigmoid(ins[0])
                elif t == "Exp":
                    r = torch.exp(ins[0])
                elif t == "Tanh":
                    r = torch.tanh(ins[0])
                elif t == "Sin":
                    r = torch.sin(ins[0])
                elif t == "Cos":
                    r = torch.cos(ins[0])
                elif t == "Atan":
                    r = torch.atan(ins[0])
                elif t == "Log":
                    r = torch.log(ins[0])
                elif t == "Sign":
                    r = torch.sign(ins[0])
                elif t == "Sqrt":
                    r = torch.sqrt(ins[0])
                elif t == "Reciprocal":
                    r = torch.reciprocal(ins[0])
                elif t == "Neg":
                    r = -ins[0]
                elif t == "Abs":
                    r = torch.abs(ins[0])
                elif t == "Floor":
                    r = torch.floor(ins[0])
                elif t == "Identity":
                    r = ins[0]
                elif t == "Cast":
                    r = ins[0].to(_torch_dtype(torch, ONNX2NP[a["to"]]))
                elif t == "Where":
                    r = torch.where(ins[0].bool(), ins[1], ins[2])
                elif t in ("ReduceMax", "ReduceSum", "ReduceMin"):
                    axes = [int(v) for v in ins[1]]
                    keep = bool(a.get("keepdims", 1))
                    fn = {"ReduceMax": torch.amax, "ReduceSum": torch.sum,
                          "ReduceMin": torch.amin}[t]
                    r = fn(ins[0], dim=axes, keepdim=keep)
                elif t == "Pad":
                    pads = [int(v) for v in ins[1]]
                    n = ins[0].dim()
                    cfg = []  # F.pad wants (last_lo, last_hi, ..., first_lo, first_hi)
                    for i in range(n - 1, -1, -1):
                        cfg += [pads[i], pads[n + i]]
                    cval = float(ins[2]) if len(ins) > 2 else 0.0
                    r = F.pad(ins[0], cfg, value=cval)
                else:
                    raise NotImplementedError(f"torchscript export: op '{t}'")
                env[o[0]] = r
            outs = [env[name] for name in m["outputs"]]
            return outs[0] if len(outs) == 1 else tuple(outs)

    return OnnxTorchModule(), m.get("metadata", {})


def export_model_torchscript(model, path, imgsz: int = 640, metadata=None) -> str:
    """Lower to the ONNX-subset graph, interpret with torch, jit.trace, save.

    Saves metadata in `_extra_files={'config.txt': json}` exactly like the
    reference (exporter.py:614-630), so reference-side consumers that read the
    config sidecar keep working."""
    import json

    import torch

    from ultralytics_pro_tpu.engine.onnx_export import model_onnx_bytes

    buf = model_onnx_bytes(model, imgsz=imgsz, metadata=None)
    module, _ = build_torch_module(buf)
    module.eval()
    ch = model.ch if hasattr(model, "ch") else 3
    example = torch.zeros(1, ch, imgsz, imgsz)
    with torch.no_grad():
        ts = torch.jit.trace(module, example, check_trace=False)
    extra = {"config.txt": json.dumps(metadata or {})}
    ts.save(str(path), _extra_files=extra)
    return str(path)
