"""Generate parity fixtures by running the reference (torch, CPU) on random inputs.

Run once offline:  python tests/fixtures/gen_fixtures.py
Outputs .npz files consumed by the unit tests. The reference tree is only
EXECUTED here to record expected numerics — no code is copied from it.
"""

import os
import sys
from pathlib import Path

import numpy as np

FIXTURES = Path(__file__).parent
os.environ.setdefault("YOLO_CONFIG_DIR", str(FIXTURES / ".yolo_cfg"))  # keep writes inside repo
sys.path.insert(0, "/root/reference")

# The reference asks importlib.metadata for a torchvision version at import time
# (ultralytics/utils/__init__.py:53) but its NMS has an exact pure-torch path
# (TorchNMS) used whenever torchvision is not imported — fake the metadata only.
import importlib.metadata  # noqa: E402

_orig_version = importlib.metadata.version
importlib.metadata.version = lambda name: "0.23.0" if name == "torchvision" else _orig_version(name)

import torch  # noqa: E402

# Minimal torchvision stub for reference model instantiation (the module zoo
# imports it at module scope; yolov8-class models never call into it).
import types  # noqa: E402


def _make_tv_stub():
    def _unavailable(*a, **k):
        raise RuntimeError("torchvision stubbed out for fixture generation")

    def _nms(boxes, scores, iou_threshold):
        """Real torchvision.ops.nms semantics (greedy, score-ordered) so the
        reference validator runs end-to-end in the parity tools."""
        order = torch.argsort(scores, descending=True)
        keep = []
        while order.numel():
            i = order[0]
            keep.append(i)
            if order.numel() == 1:
                break
            b, rest = boxes[i], boxes[order[1:]]
            x1 = torch.maximum(b[0], rest[:, 0])
            y1 = torch.maximum(b[1], rest[:, 1])
            x2 = torch.minimum(b[2], rest[:, 2])
            y2 = torch.minimum(b[3], rest[:, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            area_b = (b[2] - b[0]) * (b[3] - b[1])
            area_r = (rest[:, 2] - rest[:, 0]) * (rest[:, 3] - rest[:, 1])
            iou = inter / (area_b + area_r - inter).clamp(min=1e-12)
            order = order[1:][iou <= iou_threshold]
        return torch.stack(keep) if keep else torch.zeros(0, dtype=torch.long)

    def _batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.zeros(0, dtype=torch.long)
        off = idxs.to(boxes) * (boxes.max() + 1)
        return _nms(boxes + off[:, None], scores, iou_threshold)

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.23.0"
    ops = types.ModuleType("torchvision.ops")
    ops.nms = _nms
    ops.batched_nms = _batched_nms
    ops.deform_conv2d = _unavailable

    class DeformConv2d(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        forward = staticmethod(_unavailable)

    class StochasticDepth(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        forward = staticmethod(_unavailable)

    ops.DeformConv2d = DeformConv2d
    ops.StochasticDepth = StochasticDepth
    deform = types.ModuleType("torchvision.ops.deform_conv")
    deform.DeformConv2d = DeformConv2d
    ops.deform_conv = deform
    transforms = types.ModuleType("torchvision.transforms")
    transforms.Compose = _unavailable
    models = types.ModuleType("torchvision.models")
    tv.ops = ops
    tv.transforms = transforms
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.deform_conv"] = deform
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.models"] = models


# (_make_tv_stub is invoked by install_stubs() below, together with the
# catch-all finder, so the pair can be scoped by the parity-test fixtures.)


# Generic auto-stubs for optional third-party deps the reference module zoo
# imports at module scope (timm, mamba_ssm, ...). Classes (CamelCase) become
# empty nn.Module subclasses; lowercase names become permissive callables that
# work as decorators (return their first arg).
import importlib.abc  # noqa: E402
import importlib.machinery  # noqa: E402

STUB_ROOTS = {
    "timm", "mamba_ssm", "selective_scan", "selective_scan_cuda", "causal_conv1d",
    "pywt", "fvcore", "seaborn", "einops_exts", "natten", "flash_attn", "triton",
    "depthwise_conv2d_implicit_gemm", "paddle", "mmcv", "mmdet", "mmengine",
    "basicsr", "kornia", "spikingjelly", "thop", "pytorch_wavelets", "taichi",
    "torch_dct", "xformers", "deform_conv2d_onnx_exporter", "ptflops", "onnx",
    "antialiased_cnns",
}


def _stub_callable(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]  # decorator usage
    return _stub_callable


def _to_ntuple(n):
    def to_tuple(x):
        return tuple(x) if isinstance(x, (list, tuple)) else (x,) * n
    return to_tuple


class _DropPath(torch.nn.Module):
    """Real timm DropPath semantics: identity at eval / p=0 (the reference
    backbones are only ever exercised at eval in the parity tests)."""

    def __init__(self, drop_prob=0.0, *a, **k):
        super().__init__()
        self.drop_prob = float(drop_prob or 0.0)

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1 - self.drop_prob
        mask = torch.rand((x.shape[0],) + (1,) * (x.ndim - 1), device=x.device) < keep
        return x * mask / keep




class _BlurPool(torch.nn.Module):
    """Real antialiased_cnns.BlurPool semantics (Zhang 2019): reflect pad +
    fixed binomial depthwise conv (default filt_size=4, stride=2) — needed so
    DecoupleNet's FID computes real values in the parity tests."""

    def __init__(self, channels, pad_type="reflect", filt_size=4, stride=2, pad_off=0):
        super().__init__()
        import math as _math
        self.stride = stride
        p = [int(1.0 * (filt_size - 1) / 2), int(_math.ceil(1.0 * (filt_size - 1) / 2))]
        self.pad_sizes = [p[0] + pad_off, p[1] + pad_off, p[0] + pad_off, p[1] + pad_off]
        a = {1: [1.0], 2: [1.0, 1.0], 3: [1.0, 2.0, 1.0], 4: [1.0, 3.0, 3.0, 1.0],
             5: [1.0, 4.0, 6.0, 4.0, 1.0], 6: [1.0, 5.0, 10.0, 10.0, 5.0, 1.0],
             7: [1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0]}[filt_size]
        a = torch.tensor(a)
        filt = a[:, None] * a[None, :]
        filt = filt / filt.sum()
        self.register_buffer("filt", filt[None, None].repeat(channels, 1, 1, 1))
        self.pad = torch.nn.ReflectionPad2d(self.pad_sizes)

    def forward(self, x):
        import torch.nn.functional as _F
        return _F.conv2d(self.pad(x), self.filt, stride=self.stride, groups=x.shape[1])




class _TimmMlp(torch.nn.Module):
    """Real timm Mlp semantics (fc1 -> act -> drop -> fc2 -> drop) so
    backbones that import it (iFormer.py:34) compute real values."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=torch.nn.GELU, drop=0.0, bias=True, **kw):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = torch.nn.Linear(in_features, hidden_features, bias=bias)
        self.act = act_layer()
        self.fc2 = torch.nn.Linear(hidden_features, out_features, bias=bias)
        self.drop = torch.nn.Dropout(drop if not isinstance(drop, (tuple, list)) else drop[0])

    def forward(self, x):
        return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))




def _act_cls(fn):
    class _Act(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return fn(x)
    return _Act


# timm.models.layers.activations classes used via star-import (EMOv2.py:9)
_TIMM_ACTS = {
    "Sigmoid": _act_cls(torch.sigmoid),
    "Tanh": _act_cls(torch.tanh),
    "Swish": _act_cls(torch.nn.functional.silu),
    "Mish": _act_cls(torch.nn.functional.mish),
    "HardSigmoid": _act_cls(torch.nn.functional.hardsigmoid),
    "HardSwish": _act_cls(torch.nn.functional.hardswish),
    "HardMish": _act_cls(lambda x: 0.5 * x * (x + 2).clamp(min=0, max=2)),
    "PReLU": torch.nn.PReLU,
    "GELU": _act_cls(torch.nn.functional.gelu),
}


class _SqueezeExcite(torch.nn.Module):
    """Real timm efficientnet_blocks.SqueezeExcite semantics (mean-pool ->
    reduce conv -> act -> expand conv -> sigmoid gate), rd_channels =
    round(in_chs * rd_ratio) — needed by MaxViT's MBConv."""

    def __init__(self, in_chs, rd_ratio=0.25, rd_channels=None,
                 act_layer=torch.nn.ReLU, **kw):
        super().__init__()
        if rd_channels is None:
            rd_channels = int(round(in_chs * rd_ratio))
        self.conv_reduce = torch.nn.Conv2d(in_chs, rd_channels, 1, bias=True)
        try:
            self.act1 = act_layer(inplace=True)
        except TypeError:
            self.act1 = act_layer()
        self.conv_expand = torch.nn.Conv2d(rd_channels, in_chs, 1, bias=True)
        self.gate = torch.nn.Sigmoid()

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(self.act1(self.conv_reduce(s)))
        return x * self.gate(s)


class _DepthwiseSeparableConv(torch.nn.Module):
    """Real timm efficientnet_blocks.DepthwiseSeparableConv semantics:
    dw conv -> bn1 -> act -> pw conv -> bn2 (no pw act), internal residual
    when stride==1 and in==out — needed by MaxViT's MBConv."""

    def __init__(self, in_chs, out_chs, dw_kernel_size=3, stride=1,
                 act_layer=torch.nn.ReLU, norm_layer=torch.nn.BatchNorm2d,
                 drop_path_rate=0.0, **kw):
        super().__init__()
        self.has_skip = stride == 1 and in_chs == out_chs
        self.conv_dw = torch.nn.Conv2d(in_chs, in_chs, dw_kernel_size, stride,
                                       dw_kernel_size // 2, groups=in_chs, bias=False)
        self.bn1 = norm_layer(in_chs)
        try:
            self.act1 = act_layer(inplace=True)
        except TypeError:
            self.act1 = act_layer()
        self.se = torch.nn.Identity()
        self.conv_pw = torch.nn.Conv2d(in_chs, out_chs, 1, bias=False)
        self.bn2 = norm_layer(out_chs)

    def forward(self, x):
        sc = x
        x = self.act1(self.bn1(self.conv_dw(x)))
        x = self.bn2(self.conv_pw(self.se(x)))
        return x + sc if self.has_skip else x


# functional (not Mock) implementations for the handful of timm helpers the
# backbone files actually execute at construction/forward time
_REAL_STUBS = {
    "to_2tuple": _to_ntuple(2), "to_3tuple": _to_ntuple(3), "to_4tuple": _to_ntuple(4),
    "to_ntuple": _to_ntuple, "DropPath": _DropPath, "BlurPool": _BlurPool,
    "Mlp": _TimmMlp, "SqueezeExcite": _SqueezeExcite,
    "DepthwiseSeparableConv": _DepthwiseSeparableConv, **_TIMM_ACTS,
    "trunc_normal_": lambda t, *a, **k: torch.nn.init.normal_(t, std=k.get("std", 0.02))
    if hasattr(t, "normal_") else t,
}


class _StubModule(types.ModuleType):
    def __getattr__(self, name):
        if name == "__all__":
            # star-imports (e.g. EMOv2.py:9 `from timm...activations import *`)
            # must materialize the functional stubs
            return list(_REAL_STUBS)
        if name == "__version__":
            # version probes (sympy importtools regex-matches this) must see
            # a string; "0.0.0" reads as "too old", so callers fall back
            return "0.0.0"
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        if name in _REAL_STUBS:
            setattr(self, name, _REAL_STUBS[name])
            return _REAL_STUBS[name]
        if name[:1].isupper():
            meta = type(f"_{name}Meta", (type(torch.nn.Module),), {"__getattr__": lambda cls, n: _stub_callable})
            cls = meta(name, (torch.nn.Module,), {"__init__": lambda self, *a, **k: torch.nn.Module.__init__(self)})
            setattr(self, name, cls)
            return cls
        setattr(self, name, _stub_callable)
        return _stub_callable


class _StubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Last-resort finder (appended to sys.meta_path): stubs ANY module the
    standard finders could not locate, so the reference's 224-file module zoo
    imports regardless of which optional CUDA/vision packages it mentions."""

    def find_spec(self, fullname, path=None, target=None):
        root = fullname.split(".")[0]
        if root.startswith("ultralytics"):
            return None  # real errors in the reference tree should surface
        if root in {"winreg", "msvcrt", "_winreg", "win32api", "win32con", "win32file",
                    "java", "Foundation", "AppKit", "fcntl", "termios", "grp", "pwd",
                    "resource", "ctypes", "curses", "readline"}:
            return None  # platform-conditional imports guarded by try/except upstream
        if root in {"ray", "wandb", "comet_ml", "clearml", "mlflow", "neptune",
                    "dvclive", "hub_sdk", "flint", "gmpy2", "gmpy",
                    "python_flint"}:
            # (gmpy2/gmpy: sympy's importtools CALLS module.version() and
            # regex-parses the result — a stub breaks torch._check's sympy
            # import; an ImportError makes sympy fall back to python ints.)
            # logger/tuner integrations + optional numeric backends: these are
            # feature-gated by try/except ImportError upstream — a stub that
            # imports "successfully" switches the feature ON and then breaks.
            # (triton/sympy stay stubbable: SparXMamba.py imports triton
            # unguarded; torch._dynamo is pre-imported before the stubs land.)
            return None
        return importlib.machinery.ModuleSpec(fullname, self, is_package=True)

    def create_module(self, spec):
        return _StubModule(spec.name)

    def exec_module(self, module):
        module.__path__ = []


# ---------------------------------------------------------------------------
# Scoped stub lifecycle (fixes the full-suite cross-test state leak: a live
# catch-all finder makes torch._dynamo see a fake `triton` package
# (dynamo/utils.py touches triton.language.dtype at import), breaks
# TensorFlow's lazy platform imports, and half-imports jax pallas whose retry
# re-registers config options -> "Config option ... already defined").
# Parity test modules call install_stubs() in a module-scoped fixture and
# uninstall_stubs() at teardown; importing this module installs them too (for
# the offline generation flow and tools/), and fragile real packages are
# pre-imported so they can never be stubbed mid-session.
# ---------------------------------------------------------------------------

_FINDER = _StubFinder()
_installed = False


def _preimport_fragile():
    """Fully import packages whose lazy internals would otherwise resolve
    through the catch-all finder while it is live."""
    for _name in (
        "pandas", "dateutil", "matplotlib", "scipy", "PIL", "yaml", "psutil",
        "cv2", "polars", "requests",
        # torch._dynamo's import probes triton.language.dtype if a `triton`
        # module is importable; jax.experimental.pallas imports a triton
        # lowering layer. Import both for real BEFORE the stub finder exists.
        "torch._dynamo", "jax.experimental.pallas",
    ):
        try:
            __import__(_name)
        except Exception:  # noqa: BLE001  (optional / platform-conditional)
            pass


def install_stubs():
    """Install the torchvision stub + catch-all finder (idempotent)."""
    global _installed
    if _installed:
        return
    _preimport_fragile()
    _make_tv_stub()
    sys.meta_path.append(_FINDER)
    _installed = True


def uninstall_stubs():
    """Remove the finder and every stub module so later tests see a clean
    import state (real absences raise ImportError again)."""
    global _installed
    if not _installed:
        return
    try:
        sys.meta_path.remove(_FINDER)
    except ValueError:
        pass
    for k in list(sys.modules):
        if isinstance(sys.modules.get(k), _StubModule) or k.split(".")[0] == "torchvision":
            del sys.modules[k]
    _installed = False


install_stubs()

torch.manual_seed(0)
rng = np.random.default_rng(0)


def t(x):
    # Copy: several reference ops (clip_boxes etc.) mutate tensors in place,
    # and from_numpy would share memory with our fixture arrays.
    return torch.from_numpy(np.array(x, dtype=np.float32, copy=True))


def gen_boxes():
    from ultralytics.utils import ops

    xyxy = rng.uniform(0, 640, (64, 4)).astype(np.float32)
    xyxy[:, 2:] = xyxy[:, :2] + np.abs(xyxy[:, 2:] - xyxy[:, :2])  # ensure x2>x1,y2>y1
    xywh = ops.xyxy2xywh(t(xyxy)).numpy()
    out = {
        "xyxy": xyxy,
        "xyxy2xywh": xywh,
        "xywh2xyxy": ops.xywh2xyxy(t(xywh)).numpy(),
        "xyxy2ltwh": ops.xyxy2ltwh(t(xyxy)).numpy(),
        "xywh2ltwh": ops.xywh2ltwh(t(xywh)).numpy(),
        "ltwh2xyxy": ops.ltwh2xyxy(ops.xyxy2ltwh(t(xyxy))).numpy(),
        "ltwh2xywh": ops.ltwh2xywh(ops.xyxy2ltwh(t(xyxy))).numpy(),
        "xywhn2xyxy": ops.xywhn2xyxy(t(xywh / 640.0), w=640, h=480, padw=3, padh=5).numpy(),
        "xyxy2xywhn": ops.xyxy2xywhn(t(xyxy), w=640, h=480, clip=True).numpy(),
        "clip_shape": np.array([480, 640], np.float32),
        "clip_boxes": ops.clip_boxes(t(xyxy), (480, 640)).numpy(),
    }
    # scale_boxes: from letterboxed 640x640 back to a 480x640 original
    sb = ops.scale_boxes((640, 640), t(xyxy.copy()), (480, 640)).numpy()
    out["scale_boxes_640_to_480x640"] = sb
    # rotated corners
    xywhr = np.concatenate([xywh[:, :4], rng.uniform(-np.pi / 2, np.pi / 2, (64, 1)).astype(np.float32)], 1)
    out["xywhr"] = xywhr
    out["xywhr2xyxyxyxy"] = ops.xywhr2xyxyxyxy(t(xywhr)).numpy()
    np.savez(FIXTURES / "boxes.npz", **out)


def gen_iou():
    from ultralytics.utils import metrics

    b1 = rng.uniform(0, 640, (32, 4)).astype(np.float32)
    b1[:, 2:] = b1[:, :2] + np.abs(b1[:, 2:] - b1[:, :2]) + 1
    b2 = rng.uniform(0, 640, (48, 4)).astype(np.float32)
    b2[:, 2:] = b2[:, :2] + np.abs(b2[:, 2:] - b2[:, :2]) + 1
    # elementwise pairs (xywh), overlapping-ish
    p1 = rng.uniform(100, 400, (64, 4)).astype(np.float32)
    p2 = (p1 + rng.normal(0, 30, (64, 4))).astype(np.float32)
    p1[:, 2:] = np.abs(p1[:, 2:]) + 2
    p2[:, 2:] = np.abs(p2[:, 2:]) + 2

    obb1 = np.concatenate([p1, rng.uniform(-1.5, 1.5, (64, 1)).astype(np.float32)], 1)
    obb2 = np.concatenate([p2, rng.uniform(-1.5, 1.5, (64, 1)).astype(np.float32)], 1)

    kpt1 = rng.uniform(0, 640, (8, 17, 3)).astype(np.float32)
    kpt1[..., 2] = (rng.uniform(0, 1, (8, 17)) > 0.3).astype(np.float32) * 2
    kpt2 = rng.uniform(0, 640, (12, 17, 2)).astype(np.float32)
    area = rng.uniform(1000, 40000, (8,)).astype(np.float32)
    sigma = np.array(
        [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89],
        np.float32,
    ) / 10.0

    m1 = (rng.uniform(0, 1, (6, 160 * 160)) > 0.5).astype(np.float32)
    m2 = (rng.uniform(0, 1, (9, 160 * 160)) > 0.5).astype(np.float32)

    np.savez(
        FIXTURES / "iou.npz",
        b1=b1, b2=b2, p1=p1, p2=p2, obb1=obb1, obb2=obb2,
        kpt1=kpt1, kpt2=kpt2, area=area, sigma=sigma, m1=m1, m2=m2,
        box_iou=metrics.box_iou(t(b1), t(b2)).numpy(),
        iou=metrics.bbox_iou(t(p1), t(p2), xywh=True).numpy(),
        giou=metrics.bbox_iou(t(p1), t(p2), xywh=True, GIoU=True).numpy(),
        diou=metrics.bbox_iou(t(p1), t(p2), xywh=True, DIoU=True).numpy(),
        ciou=metrics.bbox_iou(t(p1), t(p2), xywh=True, CIoU=True).numpy(),
        iou_xyxy=metrics.bbox_iou(t(b1[:32]), t(b2[:32]), xywh=False).numpy(),
        probiou=metrics.probiou(t(obb1), t(obb2)).numpy(),
        batch_probiou=metrics.batch_probiou(t(obb1[:16]), t(obb2[:24])).numpy(),
        kpt_iou=metrics.kpt_iou(t(kpt1), t(kpt2), t(area), sigma.tolist()).numpy(),
        mask_iou=metrics.mask_iou(t(m1), t(m2)).numpy(),
    )


def gen_anchors():
    from ultralytics.utils import tal

    feats = [torch.zeros(1, 64, 80, 80), torch.zeros(1, 64, 40, 40), torch.zeros(1, 64, 20, 20)]
    strides = torch.tensor([8.0, 16.0, 32.0])
    pts, st = tal.make_anchors(feats, strides, 0.5)
    dist = t(rng.uniform(0, 16, (8400, 4)))
    boxes_xywh = tal.dist2bbox(dist, pts, xywh=True, dim=-1)
    boxes_xyxy = tal.dist2bbox(dist, pts, xywh=False, dim=-1)
    d_back = tal.bbox2dist(pts, boxes_xyxy, 16)
    angle = t(rng.uniform(-1.5, 1.5, (8400, 1)))
    rbox = tal.dist2rbox(dist, angle, pts, dim=-1)
    np.savez(
        FIXTURES / "anchors.npz",
        anchor_points=pts.numpy(), stride_tensor=st.numpy(), dist=dist.numpy(),
        dist2bbox_xywh=boxes_xywh.numpy(), dist2bbox_xyxy=boxes_xyxy.numpy(),
        bbox2dist=d_back.numpy(), angle=angle.numpy(), dist2rbox=rbox.numpy(),
    )


def gen_nms():
    from ultralytics.utils.nms import non_max_suppression

    # Reference NMS dispatches to torchvision.ops.nms when torchvision is
    # importable; hide the stub so it uses its exact pure-torch TorchNMS path.
    tv_mods = {k: sys.modules.pop(k) for k in list(sys.modules) if k.startswith("torchvision")}
    try:
        _gen_nms_inner(non_max_suppression)
    finally:
        sys.modules.update(tv_mods)


def _gen_nms_inner(non_max_suppression):

    bs, nc, na = 2, 80, 8400
    # Build a realistic prediction: clustered boxes + mostly-low scores.
    boxes = rng.uniform(40, 600, (bs, na, 4)).astype(np.float32)
    boxes[..., 2:] = np.abs(rng.normal(60, 30, (bs, na, 2))).astype(np.float32) + 4
    scores = (rng.uniform(0, 1, (bs, na, nc)) ** 8).astype(np.float32)  # few above 0.25
    pred = np.concatenate([boxes, scores], axis=-1).transpose(0, 2, 1)  # (bs, 4+nc, na)

    for name, kw in {
        "default": dict(conf_thres=0.25, iou_thres=0.45),
        "val": dict(conf_thres=0.001, iou_thres=0.7, multi_label=True),
        "agnostic": dict(conf_thres=0.25, iou_thres=0.45, agnostic=True),
    }.items():
        out = non_max_suppression(t(pred), max_det=300, nc=nc, max_time_img=1e9, **kw)
        np.savez(
            FIXTURES / f"nms_{name}.npz",
            pred=pred,
            **{f"out{i}": o.numpy() for i, o in enumerate(out)},
        )


def gen_model_parity(cfg="yolov8n.yaml", out_name="model_yolov8n.npz", imgsz=64):
    """Reference DetectionModel with seeded random weights: record state_dict,
    an input, and the eval-mode decoded output for forward-parity testing."""
    from ultralytics.nn.tasks import DetectionModel

    torch.manual_seed(7)
    model = DetectionModel(cfg=cfg, ch=3, verbose=False)
    model.eval()
    x = rng.standard_normal((1, 3, imgsz, imgsz)).astype(np.float32)
    with torch.no_grad():
        y = model(torch.from_numpy(x))
    y = y[0] if isinstance(y, (list, tuple)) else y
    sd = {f"sd::{k}": v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        FIXTURES / out_name,
        input=x,
        output=y.numpy(),
        stride=model.stride.numpy(),
        **sd,
    )



def gen_tal():
    """Reference TaskAlignedAssigner on random inputs (padded gts + mask)."""
    from ultralytics.utils.tal import TaskAlignedAssigner, make_anchors

    torch.manual_seed(3)
    feats = [torch.zeros(1, 1, 16, 16), torch.zeros(1, 1, 8, 8)]
    anc, stride_t = make_anchors(feats, torch.tensor([8.0, 16.0]), 0.5)
    a = anc.shape[0]
    bs, g, nc = 2, 8, 5
    pd_scores = torch.rand(bs, a, nc)
    cxy = torch.rand(bs, a, 2) * 128
    wh = torch.rand(bs, a, 2) * 60 + 4
    pd_bboxes = torch.cat([cxy - wh / 2, cxy + wh / 2], -1)
    anc_pix = anc * stride_t
    # gts: first n valid per image, rest zero
    n_valid = [5, 3]
    gt_labels = torch.zeros(bs, g, 1, dtype=torch.long)
    gt_bboxes = torch.zeros(bs, g, 4)
    for b in range(bs):
        for i in range(n_valid[b]):
            c = torch.rand(2) * 100 + 14
            s = torch.rand(2) * 50 + 12
            gt_bboxes[b, i] = torch.cat([c - s / 2, c + s / 2])
            gt_labels[b, i] = torch.randint(0, nc, (1,))
    mask_gt = gt_bboxes.sum(2, keepdim=True).gt_(0.0).float()

    assigner = TaskAlignedAssigner(topk=10, num_classes=nc, alpha=0.5, beta=6.0)
    tl, tb, ts, fg, tgi = assigner(pd_scores, pd_bboxes, anc_pix, gt_labels, gt_bboxes, mask_gt)
    np.savez(
        FIXTURES / "tal.npz",
        pd_scores=pd_scores.numpy(), pd_bboxes=pd_bboxes.numpy(), anc_points=anc_pix.numpy(),
        gt_labels=gt_labels.numpy(), gt_bboxes=gt_bboxes.numpy(), mask_gt=mask_gt.numpy(),
        target_labels=tl.numpy(), target_bboxes=tb.numpy(), target_scores=ts.numpy(),
        fg_mask=fg.numpy(), target_gt_idx=tgi.numpy(),
    )


def gen_detect_loss():
    """Reference v8DetectionLoss on the seeded yolov8n with a random batch."""
    from types import SimpleNamespace

    from ultralytics.nn.tasks import DetectionModel
    from ultralytics.utils.loss import v8DetectionLoss

    torch.manual_seed(7)
    model = DetectionModel(cfg="yolov8n.yaml", ch=3, verbose=False)
    model.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    model.train()
    criterion = v8DetectionLoss(model)

    imgsz = 64
    im = torch.from_numpy(rng.standard_normal((2, 3, imgsz, imgsz)).astype(np.float32))
    # random batch: 4 boxes for img0, 2 for img1 (normalized xywh)
    batch_idx = torch.tensor([0, 0, 0, 0, 1, 1], dtype=torch.float32)
    cls = torch.tensor([1, 3, 5, 0, 2, 7], dtype=torch.float32)
    cxy = torch.rand(6, 2) * 0.6 + 0.2
    wh = torch.rand(6, 2) * 0.3 + 0.08
    bboxes = torch.cat([cxy, wh], 1)
    batch = {"batch_idx": batch_idx, "cls": cls, "bboxes": bboxes}

    with torch.no_grad():
        feats = model(im)
        total, items = criterion(feats, batch)
    np.savez(
        FIXTURES / "detect_loss.npz",
        input=im.numpy(), batch_idx=batch_idx.numpy(), cls=cls.numpy(), bboxes=bboxes.numpy(),
        total=total.detach().numpy(), items=items.numpy(),
        feat0=feats[0].numpy(), feat1=feats[1].numpy(), feat2=feats[2].numpy(),
    )



def gen_metrics():
    """Reference ap_per_class on synthetic detections."""
    from ultralytics.utils.metrics import ap_per_class

    n_pred, n_gt, nc = 400, 150, 6
    tp = rng.uniform(0, 1, (n_pred, 10))
    conf = rng.uniform(0.01, 1, n_pred).astype(np.float32)
    # make tp correlated with conf so curves are non-trivial
    tp = (tp < conf[:, None] * np.linspace(0.9, 0.3, 10)[None, :]).astype(bool)
    pred_cls = rng.integers(0, nc, n_pred).astype(np.float32)
    target_cls = rng.integers(0, nc, n_gt).astype(np.float32)
    out = ap_per_class(t(tp.astype(np.float32)).bool().numpy(), conf, pred_cls, target_cls)
    # reference returns tuple: tp, fp, p, r, f1, ap, unique_classes, p_curve, r_curve, f1_curve, x, prec_values
    names = ["tp_out", "fp_out", "p", "r", "f1", "ap", "unique_classes", "p_curve", "r_curve", "f1_curve", "x", "prec_values"]
    save = {"tp": tp, "conf": conf, "pred_cls": pred_cls, "target_cls": target_cls}
    for nm, v in zip(names, out):
        save[nm] = np.asarray(v)
    np.savez(FIXTURES / "metrics.npz", **save)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    jobs = {
        "boxes": gen_boxes,
        "iou": gen_iou,
        "anchors": gen_anchors,
        "nms": gen_nms,
        "model": gen_model_parity,
        "tal": gen_tal,
        "detect_loss": gen_detect_loss,
        "metrics": gen_metrics,
    }
    for name, fn in jobs.items():
        if args.only in (None, name):
            fn()
    print("fixtures written to", FIXTURES)
