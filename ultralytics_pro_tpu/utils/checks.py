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


def check_amp(model=None) -> bool:
    """bf16 is native on TPU MXUs — no loss-scaling or NaN sanity pass needed
    (the reference's check_amp, checks.py:734, guards CUDA fp16)."""
    import jax

    return jax.default_backend() in ("tpu", "cpu")
