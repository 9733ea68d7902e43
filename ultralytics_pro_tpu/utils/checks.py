"""Runtime self-checks (reference ultralytics/utils/checks.py: check_imgsz:115,
check_version:178, check_yolo:638, collect_system_info:674). No auto-pip-install
— this environment is hermetic; missing deps raise with a clear message."""

from __future__ import annotations

import math
import platform
from typing import List, Union

from ultralytics_pro_tpu.utils import LOGGER, colorstr


def check_imgsz(imgsz: Union[int, List[int]], stride: int = 32, min_dim: int = 1,
                max_dim: int = 2, floor: int = 0):
    """Round image size up to a stride multiple (reference checks.py:115)."""
    stride = int(stride)
    if isinstance(imgsz, int):
        sizes = [imgsz]
    else:
        sizes = list(imgsz)
    new = [max(math.ceil(x / stride) * stride, floor) for x in sizes]
    if new != sizes:
        LOGGER.info(f"imgsz {sizes} must be multiple of stride {stride}, updating to {new}")
    if min_dim == 2 and len(new) == 1:
        new = [new[0], new[0]]
    return new[0] if (isinstance(imgsz, int) and max_dim == 1) or (isinstance(imgsz, int) and len(new) == 1) else new


def parse_version(v: str):
    out = []
    for part in v.split("+")[0].split("."):
        digits = "".join(c for c in part if c.isdigit())
        out.append(int(digits) if digits else 0)
    return tuple(out[:3])


def check_version(current: str, required: str = "", name: str = "version",
                  hard: bool = False) -> bool:
    """Semver comparison with >=,<=,==,>,< prefixes (reference checks.py:178)."""
    if not required:
        return True
    c = parse_version(current)
    ok = True
    for r in required.split(","):
        r = r.strip()
        op = "".join(ch for ch in r if ch in "<>=!")
        v = parse_version(r.lstrip("<>=!"))
        ok &= {"": c == v, "==": c == v, ">=": c >= v, "<=": c <= v, ">": c > v,
               "<": c < v, "!=": c != v}[op or ">="]
    if not ok and hard:
        raise ModuleNotFoundError(f"{name}{required} required, found {current}")
    return ok


def check_yolo(verbose: bool = True):
    """Environment summary (reference check_yolo:638)."""
    import jax

    info = collect_system_info()
    if verbose:
        LOGGER.info(", ".join(f"{k}: {v}" for k, v in info.items()))
    return info


def collect_system_info():
    import jax

    import ultralytics_pro_tpu

    return {
        "version": ultralytics_pro_tpu.__version__,
        "python": platform.python_version(),
        "jax": jax.__version__,
        "platform": platform.platform(),
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
        "device0": str(jax.devices()[0]),
    }


def check_amp(model=None, imgsz: int = 64, rel_tol: float = 0.10) -> bool:
    """Mixed-precision numeric sanity (reference check_amp, checks.py:734:
    forward an image in fp16 and fp32 and require close outputs before
    enabling AMP). Here: the SAME params run through the model at compute
    dtype bf16 vs f32; top scores must agree within `rel_tol` and stay
    finite. bf16 needs no loss scaling on TPU, so a False only signals a
    numerically fragile architecture — callers then train in f32."""
    import jax

    if model is None:
        return jax.default_backend() in ("tpu", "cpu")

    import jax.numpy as jnp
    import numpy as np

    variables = getattr(model, "variables", None) or model.init_params(imgsz=imgsz)
    # rebuild BOTH sides at explicit dtypes: the caller's model may itself be
    # bf16, which would make a same-model comparison trivially pass
    m32 = type(model)(model.yaml, dtype=jnp.float32, verbose=False)
    m16 = type(model)(model.yaml, dtype=jnp.bfloat16, verbose=False)
    x = jnp.asarray(np.random.default_rng(0).normal(0.5, 0.25, (1, imgsz, imgsz, 3))
                    .clip(0, 1).astype(np.float32))
    y32 = m32.apply(variables, x, train=False)
    y16 = m16.apply(variables, x, train=False)
    y32 = y32[0] if isinstance(y32, tuple) else y32
    y16 = y16[0] if isinstance(y16, tuple) else y16
    a32, a16 = np.asarray(y32, np.float32), np.asarray(y16, np.float32)
    if not (np.isfinite(a16).all() and np.isfinite(a32).all()):
        return False
    # compare the strongest activations (scores dominate decisions)
    k = min(64, a32.size)
    top = np.argsort(a32.reshape(-1))[-k:]
    denom = np.abs(a32.reshape(-1)[top]) + 1e-3
    rel = np.abs(a16.reshape(-1)[top] - a32.reshape(-1)[top]) / denom
    return bool(rel.max() < rel_tol)
