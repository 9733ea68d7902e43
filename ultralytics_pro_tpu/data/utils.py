"""Dataset config resolution (reference ultralytics/data/utils.py
check_det_dataset / check_cls_dataset): parse dataset YAML, resolve paths,
normalize `names`. No auto-download in this environment (zero egress) — a
missing dataset raises with the path it looked for."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Union

from ultralytics_pro_tpu.utils import PKG_ROOT, yaml_load


def check_det_dataset(data: Union[str, Path, Dict]) -> Dict:
    """Resolve a detection dataset YAML/dict to absolute train/val paths + names."""
    if isinstance(data, (str, Path)):
        p = Path(data)
        if not p.exists():
            candidates = list((PKG_ROOT / "cfg" / "datasets").glob(p.name))
            if candidates:
                p = candidates[0]
            else:
                raise FileNotFoundError(f"dataset '{data}' not found")
        d = yaml_load(p)
        d["yaml_file"] = str(p)
        root = Path(d.get("path") or p.parent)
    else:
        d = dict(data)
        root = Path(d.get("path") or ".")

    root = root.expanduser()
    if not root.is_absolute():
        root = (Path(d.get("yaml_file", ".")).parent / root).resolve()
    d["path"] = root
    for split in ("train", "val", "test"):
        if d.get(split):
            sp = Path(d[split])
            d[split] = str(sp if sp.is_absolute() else root / sp)

    # zero-egress stand-in for the reference's dataset download hooks: bundled
    # tiny-dataset YAMLs carry `synth: <task>` and generate deterministically
    # at first use (data/synth.py)
    if d.get("synth") and d.get("train") and not Path(d["train"]).exists():
        from ultralytics_pro_tpu.data.synth import make_synth_dataset
        from ultralytics_pro_tpu.utils import LOGGER

        task = d["synth"] if isinstance(d["synth"], str) else "detect"
        LOGGER.info(f"generating synthetic dataset at {root} (task={task})")
        make_synth_dataset(root, n_images=8, imgsz=160,
                           nc=len(d.get("names") or [3]) or 3, task=task)

    names = d.get("names")
    if isinstance(names, list):
        names = dict(enumerate(names))
    elif isinstance(names, dict):
        names = {int(k): v for k, v in names.items()}
    else:
        names = {i: f"class{i}" for i in range(d.get("nc", 80))}
    d["names"] = names
    d["nc"] = len(names)
    return d


def check_cls_dataset(data: Union[str, Path]) -> Dict:
    root = Path(data)
    if not root.exists():
        raise FileNotFoundError(f"classification dataset '{data}' not found")
    train = root / "train" if (root / "train").exists() else root
    val = root / "val" if (root / "val").exists() else (root / "test" if (root / "test").exists() else train)
    classes = sorted(d.name for d in train.iterdir() if d.is_dir())
    return {"path": root, "train": str(train), "val": str(val),
            "names": dict(enumerate(classes)), "nc": len(classes)}
