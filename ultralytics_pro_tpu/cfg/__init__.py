"""Config system: layered merge + validation + CLI entrypoint.

Behavioral parity with the reference config layer (ultralytics/cfg/__init__.py:
cfg2dict:244, get_cfg:278, check_cfg:327, check_dict_alignment:462 did-you-mean
errors, entrypoint:817 `yolo TASK MODE k=v`). Same key names as the reference's
default.yaml so user configs and CLI invocations port unchanged.
"""

from __future__ import annotations

import difflib
import sys
from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, List, Optional, Union

from ultralytics_pro_tpu.utils import (
    DEFAULT_CFG_PATH,
    IterableSimpleNamespace,
    LOGGER,
    colorstr,
    yaml_load,
)

TASKS = {"detect", "segment", "classify", "pose", "obb"}
MODES = {"train", "val", "predict", "export", "track", "benchmark"}

TASK2DATA = {
    "detect": "coco8.yaml",
    "segment": "coco8-seg.yaml",
    "classify": "imagenette160.yaml",
    "pose": "coco8-pose.yaml",
    "obb": "dota8.yaml",
}
TASK2MODEL = {
    "detect": "yolov8n.yaml",
    "segment": "yolov8n-seg.yaml",
    "classify": "yolov8n-cls.yaml",
    "pose": "yolov8n-pose.yaml",
    "obb": "yolov8n-obb.yaml",
}
TASK2METRIC = {
    "detect": "metrics/mAP50-95(B)",
    "segment": "metrics/mAP50-95(M)",
    "classify": "metrics/accuracy_top1",
    "pose": "metrics/mAP50-95(P)",
    "obb": "metrics/mAP50-95(B)",
}

DEFAULT_CFG_DICT = yaml_load(DEFAULT_CFG_PATH)
for _k, _v in DEFAULT_CFG_DICT.items():
    if isinstance(_v, str) and _v.lower() == "none":
        DEFAULT_CFG_DICT[_k] = None
DEFAULT_CFG = IterableSimpleNamespace(**DEFAULT_CFG_DICT)

CFG_FLOAT_KEYS = {"warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "time",
                  "workspace", "batch", "pose", "kobj"}
CFG_FRACTION_KEYS = {
    "dropout", "lrf", "momentum", "weight_decay", "warmup_momentum", "warmup_bias_lr",
    "hsv_h", "hsv_s", "hsv_v", "translate", "scale", "perspective", "flipud", "fliplr",
    "bgr", "mosaic", "mixup", "cutmix", "copy_paste", "conf", "iou", "fraction", "erasing",
}
CFG_INT_KEYS = {"epochs", "patience", "workers", "seed", "close_mosaic", "mask_ratio",
                "max_det", "vid_stride", "line_width", "nbs", "save_period", "max_gt"}
CFG_BOOL_KEYS = {
    "remat",
    "save", "exist_ok", "verbose", "deterministic", "single_cls", "rect", "cos_lr",
    "overlap_mask", "val", "save_json", "half", "dnn", "plots", "show", "save_txt",
    "save_conf", "save_crop", "save_frames", "show_labels", "show_conf", "visualize",
    "augment", "agnostic_nms", "retina_masks", "show_boxes", "keras", "optimize", "int8",
    "dynamic", "simplify", "nms", "profile", "multi_scale", "stream_buffer", "compile",
}


def cfg2dict(cfg) -> Dict:
    """Convert path/str/namespace/dict to a plain dict (reference cfg/__init__.py:244)."""
    if isinstance(cfg, (str, Path)):
        return yaml_load(cfg)
    if isinstance(cfg, SimpleNamespace):
        return vars(cfg)
    return dict(cfg or {})


def check_dict_alignment(base: Dict, custom: Dict):
    """Unknown-key errors with did-you-mean suggestions (reference :462)."""
    mismatched = [k for k in custom if k not in base]
    if mismatched:
        msgs = []
        for k in mismatched:
            matches = difflib.get_close_matches(k, base.keys())
            match_str = f"similar: {matches}" if matches else ""
            msgs.append(f"'{k}' is not a valid key. {match_str}")
        raise SyntaxError("\n".join(msgs))


def check_cfg(cfg: Dict, hard: bool = True):
    """Type/range validation (reference check_cfg:327)."""
    for k, v in cfg.items():
        if v is None:
            continue
        if k in CFG_FLOAT_KEYS and not isinstance(v, (int, float)):
            if hard:
                raise TypeError(f"'{k}={v}' must be a number")
            cfg[k] = float(v)
        elif k in CFG_FRACTION_KEYS:
            if not isinstance(v, (int, float)):
                if hard:
                    raise TypeError(f"'{k}={v}' must be a number")
                v = cfg[k] = float(v)
            if not (0.0 <= v <= 1.0):
                raise ValueError(f"'{k}={v}' must be in [0, 1]")
        elif k in CFG_INT_KEYS and not isinstance(v, int):
            if hard:
                raise TypeError(f"'{k}={v}' must be an int")
            cfg[k] = int(v)
        elif k in CFG_BOOL_KEYS and not isinstance(v, bool):
            if hard:
                raise TypeError(f"'{k}={v}' must be a bool")
            cfg[k] = bool(v)


def get_cfg(cfg=DEFAULT_CFG_DICT, overrides: Optional[Dict] = None) -> IterableSimpleNamespace:
    """Merge defaults + cfg + overrides into a validated namespace (reference :278)."""
    cfg = cfg2dict(cfg)
    if overrides:
        overrides = cfg2dict(overrides)
        check_dict_alignment({**DEFAULT_CFG_DICT, **cfg}, {k: v for k, v in overrides.items() if k != "save_dir"})
        cfg = {**cfg, **overrides}
    for k in ("project", "name"):
        if k in cfg and isinstance(cfg.get(k), (int, float)):
            cfg[k] = str(cfg[k])
    check_cfg(cfg)
    return IterableSimpleNamespace(**{**DEFAULT_CFG_DICT, **cfg})


def smart_value(v: str) -> Any:
    """String -> typed python value (reference :773)."""
    lower = v.lower()
    if lower == "none":
        return None
    if lower == "true":
        return True
    if lower == "false":
        return False
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    return v


def parse_key_value_pair(pair: str):
    k, v = pair.split("=", 1)
    k, v = k.strip(), v.strip()
    if not v:
        raise SyntaxError(f"missing value for argument '{k}'")
    return k, smart_value(v)


def merge_equals_args(args: List[str]) -> List[str]:
    """Rejoin ['k', '=', 'v'] style splits (reference :501)."""
    out = []
    for arg in args:
        if arg == "=" and out:
            continue
        if arg.startswith("=") and out and "=" not in out[-1]:
            out[-1] += arg
        elif arg.endswith("=") and "=" not in arg[:-1]:
            out.append(arg)
        elif out and out[-1].endswith("="):
            out[-1] += arg
        else:
            out.append(arg)
    return out


def entrypoint(argv: Optional[List[str]] = None):
    """`yolo TASK MODE k=v ...` CLI (reference entrypoint:817)."""
    args = merge_equals_args(argv if argv is not None else sys.argv[1:])
    if not args:
        LOGGER.info("usage: yolo TASK MODE model=... data=... [k=v ...]\n"
                    f"tasks: {sorted(TASKS)}\nmodes: {sorted(MODES)}")
        return

    special = {
        "help": lambda: LOGGER.info("yolo TASK MODE k=v ..."),
        "version": lambda: LOGGER.info(__import__("ultralytics_pro_tpu").__version__),
        "checks": lambda: LOGGER.info(f"jax devices: {__import__('jax').devices()}"),
        "settings": lambda: _handle_yolo_settings(args[1:]),
        "login": lambda: _handle_hub("login", args[1:]),
        "logout": lambda: _handle_hub("logout", args[1:]),
        "hub": lambda: _handle_hub(args[1] if len(args) > 1 else "", args[2:]),
        "solutions": lambda: _handle_yolo_solutions(args[1:]),
        "cfg": lambda: LOGGER.info((Path(__file__).parent / "default.yaml").read_text()),
        "copy-cfg": lambda: __import__("shutil").copy(
            Path(__file__).parent / "default.yaml", "default_copy.yaml"),
    }
    if args[0] in special:
        special[args[0]]()
        return

    overrides = {}
    task = mode = None
    for a in args:
        if "=" in a:
            k, v = parse_key_value_pair(a)
            overrides[k] = v
        elif a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        elif a in DEFAULT_CFG_DICT and isinstance(DEFAULT_CFG_DICT[a], bool):
            # bare bool flag: `yolo predict ... show` == show=True (reference
            # entrypoint:899 auto-True for bare booleans)
            overrides[a] = True
        else:
            # did-you-mean across modes and tasks before falling back to keys
            # (reference entrypoint:817 reports mode/task typos distinctly)
            import difflib

            close = difflib.get_close_matches(a, sorted(MODES) + sorted(TASKS), n=2)
            if close and a not in DEFAULT_CFG_DICT:
                raise SyntaxError(f"{a!r} is not a valid task or mode. similar: {close}")
            check_dict_alignment(DEFAULT_CFG_DICT, {a: ""})

    mode = mode or overrides.pop("mode", None) or "predict"
    task = task or overrides.pop("task", None)
    # validate override keys with did-you-mean (reference check_dict_alignment:462)
    check_dict_alignment(DEFAULT_CFG_DICT,
                         {k: v for k, v in overrides.items() if k not in ("model", "data")})
    model_arg = overrides.pop("model", None) or (TASK2MODEL.get(task) if task else "yolov8n.yaml")

    from ultralytics_pro_tpu.engine.model import YOLO

    model = YOLO(model_arg, task=task)
    if mode in ("train", "val") and "data" not in overrides and task:
        overrides["data"] = TASK2DATA[task]
    return getattr(model, mode)(**overrides)


def _handle_yolo_settings(args: List[str]):
    """`yolo settings [reset | key=value ...]` (reference
    handle_yolo_settings cfg/__init__.py:585)."""
    import json

    from ultralytics_pro_tpu.utils.settings import SETTINGS

    if args and args[0] == "reset":
        SETTINGS.reset()
        LOGGER.info("settings reset to defaults")
        return
    updates = dict(parse_key_value_pair(a) for a in args if "=" in a)
    if updates:
        SETTINGS.update_and_save(**updates)
    LOGGER.info(json.dumps({k: v for k, v in SETTINGS.items()}, indent=2, default=str))


def _handle_hub(verb: str, args: List[str]):
    """`yolo login|logout|hub ...` (reference entrypoint special verbs)."""
    from ultralytics_pro_tpu.hub.auth import login, logout

    if verb == "login":
        key = args[0] if args else ""
        ok = login(key)
        LOGGER.info("HUB login ok" if ok else "HUB login failed (key format)")
    elif verb == "logout":
        logout()
    else:
        LOGGER.info("hub verbs: login <api_key> | logout")


def _handle_yolo_solutions(args: List[str]):
    """`yolo solutions [NAME k=v ...]` (reference handle_yolo_solutions
    cfg/__init__.py:631): run a named analytics solution over a source."""
    import ultralytics_pro_tpu.solutions as S

    names = {
        "count": S.ObjectCounter, "heatmap": S.Heatmap, "speed": S.SpeedEstimator,
        "queue": S.QueueManager, "workout": S.AIGym, "analytics": S.Analytics,
        "trackzone": S.TrackZone, "crop": S.ObjectCropper, "blur": S.ObjectBlurrer,
        "visioneye": S.VisionEye, "isegment": S.InstanceSegmentation,
        "inference": S.Inference,
    }
    if not args or args[0] not in names:
        LOGGER.info(f"solutions: {sorted(names)} — `yolo solutions NAME source=...`")
        return
    kwargs = dict(parse_key_value_pair(a) for a in args[1:] if "=" in a)
    source = kwargs.pop("source", None)
    sol = names[args[0]](**kwargs)
    if args[0] == "inference":
        sol.inference()
        return
    if source is None:
        LOGGER.info("pass source=<video/image> to run the solution")
        return sol
    import cv2

    cap = cv2.VideoCapture(source)
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            sol(frame)
    finally:
        cap.release()
    return sol
