"""Offline converter: ultralytics .pt checkpoint -> ultralytics_pro_tpu .ckpt.

Usage:  python tools/convert_pt.py yolov8n.pt [out.ckpt]

The .pt pickle references ultralytics' own classes; this converter unpickles
them into inert stand-ins (no code from the checkpoint executes — torch
modules restore via __dict__, never __init__), walks the module tree to
extract the state_dict and the model YAML, and maps weights onto the flax
parameter tree with utils/torch_import (OIHW->HWIO etc.).

SURVEY.md §7 hard part 7: weight import for parity testing / pretrained
initialization without torch on TPU hosts.
"""

from __future__ import annotations

import pickle
import sys
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


class _Stub:
    """Inert stand-in for any pickled class: restores attributes only."""

    def __init__(self, *args, **kwargs):
        pass  # REDUCE-constructed objects may pass constructor args

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple) and state and isinstance(state[0], dict):
            self.__dict__.update(state[0])

    def __getattr__(self, name):
        raise AttributeError(name)


class _StubUnpickler(pickle.Unpickler):
    """Map any ultralytics.* / torch.nn-module class to inert stubs; keep
    torch tensor reconstruction real (needed for the weights)."""

    ALLOW_ROOTS = ("torch", "collections", "numpy", "builtins", "argparse", "pathlib")

    def find_class(self, module, name):
        root = module.split(".")[0]
        if root in self.ALLOW_ROOTS:
            import importlib

            try:
                return getattr(importlib.import_module(module), name)
            except (ImportError, AttributeError):
                pass
        return type(name, (_Stub,), {"__module__": module})


def load_pt(path):
    """Load a .pt checkpoint with stubbed model classes.

    torch>=2.6 zipfile checkpoints route through torch.serialization; we feed
    it our unpickler via pickle_module shim."""
    import torch

    shim = types.ModuleType("stub_pickle")
    shim.Unpickler = _StubUnpickler
    shim.load = lambda f, **kw: _StubUnpickler(f).load()
    return torch.load(path, map_location="cpu", pickle_module=shim, weights_only=False)


def extract_state_dict(module_obj, prefix: str = "") -> dict:
    """Walk a stubbed nn.Module tree: _parameters/_buffers/_modules dicts."""
    out = {}
    d = getattr(module_obj, "__dict__", {})
    for name, p in (d.get("_parameters") or {}).items():
        if p is not None:
            out[prefix + name] = p.detach().numpy() if hasattr(p, "detach") else np.asarray(p)
    for name, b in (d.get("_buffers") or {}).items():
        if b is not None:
            out[prefix + name] = b.detach().numpy() if hasattr(b, "detach") else np.asarray(b)
    for name, m in (d.get("_modules") or {}).items():
        if m is not None:
            out.update(extract_state_dict(m, f"{prefix}{name}."))
    return out


def convert(pt_path, out_path=None, strict: bool = False):
    from ultralytics_pro_tpu.engine.trainer import save_pickle
    from ultralytics_pro_tpu.nn.tasks import TASK2MODEL, guess_model_task
    from ultralytics_pro_tpu.utils.torch_import import load_torch_state_dict

    ckpt = load_pt(pt_path)
    model_obj = ckpt.get("ema") or ckpt.get("model") if isinstance(ckpt, dict) else ckpt
    yaml_dict = getattr(model_obj, "yaml", None) or model_obj.__dict__.get("yaml")
    if yaml_dict is None:
        raise ValueError(f"{pt_path}: no model yaml in checkpoint")
    sd = extract_state_dict(model_obj)
    print(f"extracted {len(sd)} tensors; yaml keys: {list(yaml_dict)[:6]}")

    task = guess_model_task(yaml_dict)
    model = TASK2MODEL[task](yaml_dict)
    variables = model.init_params(imgsz=64)
    variables = load_torch_state_dict(variables, sd, strict=strict)

    out = Path(out_path or Path(pt_path).with_suffix(".ckpt"))
    save_pickle(out, {
        "params": variables["params"],
        "ema": None,
        "batch_stats": variables["batch_stats"],
        "model_yaml": dict(yaml_dict),
        "train_args": (ckpt.get("train_args") if isinstance(ckpt, dict) else None) or {},
        "names": model.names,
    })
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    convert(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
