"""Dataset config resolution (reference ultralytics/data/utils.py
check_det_dataset / check_cls_dataset): parse dataset YAML, resolve paths,
normalize `names`. No auto-download in this environment (zero egress) — a
missing dataset raises with the path it looked for."""

from __future__ import annotations

import os
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
    def _resolve(v):
        sp = Path(v)
        return str(sp if sp.is_absolute() else root / sp)

    for split in ("train", "val", "test"):
        if d.get(split):
            # reference supports a LIST of image dirs per split (VOC.yaml)
            d[split] = ([_resolve(v) for v in d[split]]
                        if isinstance(d[split], (list, tuple)) else _resolve(d[split]))

    # zero-egress stand-in for the reference's dataset download hooks: bundled
    # tiny-dataset YAMLs carry `synth: <task>` and generate deterministically
    # at first use (data/synth.py)
    if d.get("synth") and d.get("train") and not Path(d["train"]).exists():
        from ultralytics_pro_tpu.data.synth import make_synth_dataset
        from ultralytics_pro_tpu.utils import LOGGER

        task = d["synth"] if isinstance(d["synth"], str) else "detect"
        LOGGER.info(f"generating synthetic dataset at {root} (task={task})")
        make_synth_dataset(root, n_images=int(d.get("synth_count", 8)), imgsz=160,
                           nc=len(d.get("names") or [3]) or 3, task=task,
                           channels=int(d.get("channels", 3) or 3))

    # real-dataset download hook (reference check_det_dataset auto-download):
    # when the train dir is missing and the yaml carries `download:` urls,
    # fetch + unzip into the dataset root (fails with a clear message under
    # zero egress)
    _train0 = (d.get("train") or [None])[0] if isinstance(d.get("train"), list) else d.get("train")
    if d.get("download") and _train0 and not Path(_train0).exists():
        from ultralytics_pro_tpu.utils.downloads import safe_download

        urls = d["download"] if isinstance(d["download"], list) else [d["download"]]
        root = Path(d.get("path") or ".")
        root.mkdir(parents=True, exist_ok=True)
        for url in urls:
            safe_download(url, dir=root, unzip=True)

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
    # classify yamls with `synth: classify` generate folder-per-class data at
    # first use (imagenette160.yaml stand-in)
    if str(data).endswith((".yaml", ".yml")):
        p = Path(data)
        if not p.exists():
            cand = list((PKG_ROOT / "cfg" / "datasets").glob(p.name))
            if not cand:
                raise FileNotFoundError(f"classification dataset '{data}' not found")
            p = cand[0]
        d = yaml_load(p)
        root = Path(d.get("path", ".")).expanduser()
        if d.get("synth") == "classify" and not (root / "train").exists():
            _make_synth_cls(root, nc=len(d.get("names") or {0: "a", 1: "b"}) or 2)
        data = root
    root = Path(data).expanduser()
    if not root.exists():
        raise FileNotFoundError(f"classification dataset '{data}' not found")
    train = root / "train" if (root / "train").exists() else root
    val = root / "val" if (root / "val").exists() else (root / "test" if (root / "test").exists() else train)
    classes = sorted(d.name for d in train.iterdir() if d.is_dir())
    return {"path": root, "train": str(train), "val": str(val),
            "names": dict(enumerate(classes)), "nc": len(classes)}


def _make_synth_cls(root: Path, nc: int = 4, n_per_class: int = 8, imgsz: int = 64):
    """Folder-per-class synthetic classification data (imagenette160 stand-in)."""
    import cv2
    import numpy as np

    rng = np.random.default_rng(0)
    for split, n in (("train", n_per_class), ("val", max(n_per_class // 2, 2))):
        for c in range(nc):
            d = root / split / f"class{c}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                im = np.full((imgsz, imgsz, 3), 30 * c + 40, np.uint8)
                color = tuple(int(v) for v in rng.integers(64, 255, 3))
                if c % 4 == 0:
                    cv2.circle(im, (imgsz // 2, imgsz // 2), imgsz // 4 + i, color, -1)
                elif c % 4 == 1:
                    cv2.rectangle(im, (8 + i, 8), (imgsz - 8, imgsz - 8 - i), color, -1)
                elif c % 4 == 2:
                    cv2.line(im, (0, i * 4), (imgsz, imgsz - i * 4), color, 5)
                else:
                    cv2.ellipse(im, (imgsz // 2, imgsz // 2), (imgsz // 3, imgsz // 5 + i),
                                30 * i, 0, 360, color, -1)
                cv2.imwrite(str(d / f"{split}_{c}_{i}.jpg"), im)


def verify_image_label(args):
    """Verify one (im_file, lb_file) pair (reference data/utils.py
    verify_image_label): image opens and is >=10px; label rows are well-formed
    normalized floats. Returns (im_file, nf, ne, ncorrupt, msg)."""
    im_file, lb_file = args
    try:
        import cv2

        im = cv2.imread(str(im_file))
        if im is None:
            return im_file, 0, 0, 1, f"unreadable image {im_file}"
        h, w = im.shape[:2]
        if h < 10 or w < 10:
            return im_file, 0, 0, 1, f"image too small {w}x{h}"
        if lb_file and Path(lb_file).is_file():
            rows = [r.split() for r in Path(lb_file).read_text().strip().splitlines() if r]
            for r in rows:
                vals = [float(v) for v in r]
                if len(vals) < 5 or vals[0] < 0 or any(v < -0.01 or v > 1.01 for v in vals[1:5]):
                    return im_file, 0, 0, 1, f"malformed label row in {lb_file}"
            return im_file, 1 if rows else 0, 0 if rows else 1, 0, ""
        return im_file, 0, 1, 0, ""
    except Exception as e:  # pragma: no cover - defensive
        return im_file, 0, 0, 1, f"{type(e).__name__}: {e}"


def verify_images_parallel(im_files, lb_files, workers: int = 8):
    """Threaded dataset scan (reference uses a process Pool + TQDM); returns
    (n_found, n_empty, n_corrupt, msgs)."""
    from concurrent.futures import ThreadPoolExecutor

    nf = ne = nc = 0
    msgs = []
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for _, f, e, c, msg in pool.map(verify_image_label, zip(im_files, lb_files)):
            nf += f
            ne += e
            nc += c
            if msg:
                msgs.append(msg)
    return nf, ne, nc, msgs


class HUBDatasetStats:
    """Dataset statistics for HUB upload (reference data/utils.py
    HUBDatasetStats): per-split per-class instance counts + unlabelled tally,
    written as stats.json next to the dataset."""

    def __init__(self, path: str = "coco8.yaml", task: str = "detect"):
        self.task = task
        self.data = check_det_dataset(path)
        self.stats = None

    def get_json(self, save: bool = False) -> dict:
        import json

        nc = self.data["nc"]
        out = {"nc": nc, "names": self.data["names"]}
        for split in ("train", "val", "test"):
            sp = self.data.get(split)
            if not sp:
                out[split] = None
                continue
            img_dirs = sp if isinstance(sp, list) else [sp]
            counts = [0] * nc
            n_imgs = n_unlabelled = 0
            for d in img_dirs:
                for im in sorted(Path(d).glob("*")):
                    if im.suffix.lower() not in {".jpg", ".jpeg", ".png", ".bmp"}:
                        continue
                    n_imgs += 1
                    # Mirror the reference img2label_paths: swap only the LAST
                    # /images/ path component and only the final extension, so
                    # dirs like "images_raw" or stems containing ".jpg" map
                    # correctly (ADVICE r2).
                    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
                    lb = Path(sb.join(str(im.with_suffix(".txt")).rsplit(sa, 1)))
                    rows = [r.split() for r in lb.read_text().strip().splitlines()] \
                        if lb.is_file() else []
                    if not rows:
                        n_unlabelled += 1
                    for r in rows:
                        c = int(float(r[0]))
                        if 0 <= c < nc:
                            counts[c] += 1
            out[split] = {
                "instance_stats": {"total": sum(counts), "per_class": counts},
                "image_stats": {"total": n_imgs, "unlabelled": n_unlabelled},
            }
        self.stats = out
        if save:
            p = Path(self.data["path"]) / "stats.json"
            p.write_text(json.dumps(out, indent=2))
        return out
