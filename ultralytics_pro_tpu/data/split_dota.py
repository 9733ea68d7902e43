"""DOTA sliding-window tiling (reference `data/split_dota.py`).

Splits large aerial images into overlapping crops and rewrites the OBB labels
per window — the preprocessing step DOTA training assumes (windows produced
here are what `val`'s merge step reassembles, see trackers/DOTA submission
writer). Functional parity with the reference pipeline:

- ``bbox_iof``       — reference split_dota.py:20. The reference needs shapely
  for polygon∩rect areas; this environment has no shapely, and the clip region
  is always an axis-aligned window, so we compute the EXACT area with a
  Sutherland–Hodgman clip + shoelace instead (dependency-free, same numbers).
- ``get_windows``    — reference split_dota.py:101 (multi-scale grid, window
  kept when window∩image / window area > im_rate_thr, with the all-filtered
  fallback that force-keeps the best windows).
- ``get_window_obj`` — reference split_dota.py:153 (iof >= 0.7 keeps a label).
- ``crop_and_save``  — reference split_dota.py:167 (``name__crop__x___y``
  naming contract, labels shifted to window origin and renormalized).
- ``split_images_and_labels`` / ``split_trainval`` / ``split_test``
  — reference split_dota.py:218/260/298 (rates scale crop/gap as size/rate).
"""

from __future__ import annotations

from glob import glob
from math import ceil
from pathlib import Path
from typing import Any, Dict, List, Tuple

import numpy as np

from ultralytics_pro_tpu.utils import LOGGER, TQDM

__all__ = [
    "bbox_iof",
    "load_yolo_dota",
    "get_windows",
    "get_window_obj",
    "crop_and_save",
    "split_images_and_labels",
    "split_trainval",
    "split_test",
]


def _shoelace(pts: np.ndarray) -> float:
    """Unsigned area of a simple polygon given as (V, 2) vertices."""
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def _clip_halfplane(pts: List[np.ndarray], inside, intersect) -> List[np.ndarray]:
    """One Sutherland–Hodgman pass: keep the part of `pts` with inside()==True."""
    out: List[np.ndarray] = []
    n = len(pts)
    for i in range(n):
        cur, nxt = pts[i], pts[(i + 1) % n]
        cin, nin = inside(cur), inside(nxt)
        if cin:
            out.append(cur)
            if not nin:
                out.append(intersect(cur, nxt))
        elif nin:
            out.append(intersect(cur, nxt))
    return out


def _poly_rect_area(poly: np.ndarray, rect: np.ndarray) -> float:
    """Exact area of polygon∩axis-aligned-rect. poly (V,2), rect (4,) xyxy."""
    x0, y0, x1, y1 = (float(v) for v in rect)
    pts = [poly[i].astype(np.float64) for i in range(len(poly))]

    def cut(axis, bound, keep_le):
        def inside(p):
            return p[axis] <= bound if keep_le else p[axis] >= bound

        def intersect(a, b):
            t = (bound - a[axis]) / (b[axis] - a[axis])
            return a + t * (b - a)

        return inside, intersect

    for axis, bound, keep_le in ((0, x0, False), (0, x1, True), (1, y0, False), (1, y1, True)):
        if not pts:
            return 0.0
        pts = _clip_halfplane(pts, *cut(axis, bound, keep_le))
    return _shoelace(np.asarray(pts)) if len(pts) >= 3 else 0.0


def _clip_halfplane_batch(pts: np.ndarray, cnt: np.ndarray, axis: int, bound: float,
                          keep_le: bool) -> Tuple[np.ndarray, np.ndarray]:
    """One vectorized Sutherland–Hodgman pass over a batch of polygons.

    pts (P, V, 2) padded vertex rings, cnt (P,) valid-vertex counts. Emits
    up to two vertices per edge (cur if inside; edge∩bound if it crosses),
    then compacts each row with a stable argsort so ring order is preserved.
    Returns (new_pts (P, V', 2), new_cnt)."""
    P, V, _ = pts.shape
    idx = np.arange(V)
    nxt_idx = (idx[None, :] + 1) % np.maximum(cnt[:, None], 1)  # (P, V) ring successor
    nxt = np.take_along_axis(pts, np.repeat(nxt_idx[..., None], 2, -1), axis=1)
    valid = idx[None, :] < cnt[:, None]
    cc, cn = pts[..., axis], nxt[..., axis]
    cin = (cc <= bound) if keep_le else (cc >= bound)
    nin = (cn <= bound) if keep_le else (cn >= bound)
    denom = cn - cc
    t = (bound - cc) / np.where(denom == 0, 1e-300, denom)
    inter = pts + t[..., None] * (nxt - pts)
    out_pts = np.empty((P, 2 * V, 2), dtype=pts.dtype)
    out_pts[:, 0::2] = pts
    out_pts[:, 1::2] = inter
    emit = np.empty((P, 2 * V), dtype=bool)
    emit[:, 0::2] = cin & valid
    emit[:, 1::2] = (cin != nin) & valid
    new_cnt = emit.sum(axis=1)
    vmax = max(int(new_cnt.max(initial=0)), 3)
    order = np.argsort(~emit, axis=1, kind="stable")[:, :vmax]  # emitted slots first, in ring order
    return np.take_along_axis(out_pts, np.repeat(order[..., None], 2, -1), axis=1), new_cnt


def _shoelace_batch(pts: np.ndarray, cnt: np.ndarray) -> np.ndarray:
    """Unsigned areas of padded polygon rings: pts (P, V, 2), cnt (P,)."""
    P, V, _ = pts.shape
    idx = np.arange(V)
    nxt_idx = (idx[None, :] + 1) % np.maximum(cnt[:, None], 1)
    nxt = np.take_along_axis(pts, np.repeat(nxt_idx[..., None], 2, -1), axis=1)
    valid = (idx[None, :] < cnt[:, None]) & (cnt[:, None] >= 3)
    cross = pts[..., 0] * nxt[..., 1] - nxt[..., 0] * pts[..., 1]
    return 0.5 * np.abs((cross * valid).sum(axis=1))


def bbox_iof(polygon1: np.ndarray, bbox2: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Intersection-over-foreground of quad polygons vs window rects.

    polygon1 (N, 8) xyxyxyxy pixel coords; bbox2 (M, 4) xyxy windows.
    Returns (N, M): area(poly∩rect) / area(poly) — exact, no shapely
    (reference split_dota.py:20 uses shapely polygons for the same numbers).
    The clip region is always axis-aligned, so the Sutherland–Hodgman clip
    vectorizes across all AABB-surviving pairs at once (real DOTA scenes
    have thousands of OBBs × dozens of windows; a per-pair Python clip was
    the preprocessing bottleneck — ADVICE r3).
    """
    polys = np.asarray(polygon1, dtype=np.float64).reshape(-1, 4, 2)
    rects = np.asarray(bbox2, dtype=np.float64).reshape(-1, 4)

    # bbox prefilter: pairs whose AABBs don't overlap have zero intersection
    lt, rb = polys.min(axis=1), polys.max(axis=1)  # (N, 2) each
    inter_lt = np.maximum(lt[:, None], rects[None, :, :2])
    inter_rb = np.minimum(rb[:, None], rects[None, :, 2:])
    wh = np.clip(inter_rb - inter_lt, 0, None)
    coarse = wh[..., 0] * wh[..., 1]  # (N, M)

    areas = _shoelace_batch(polys, np.full(len(polys), 4))  # (N,)
    out = np.zeros(coarse.shape, dtype=np.float64)
    ii, jj = np.nonzero(coarse)
    if len(ii):
        pts = polys[ii]  # (P, 4, 2)
        cnt = np.full(len(ii), 4)
        bounds = rects[jj]  # (P, 4) xyxy — per-pair clip bounds
        for axis, col, keep_le in ((0, 0, False), (0, 2, True), (1, 1, False), (1, 3, True)):
            # per-pair bound: shift coords so every pair clips at 0, then shift back
            shift = bounds[:, col][:, None, None] * (np.arange(2) == axis)
            pts, cnt = _clip_halfplane_batch(pts - shift, cnt, axis, 0.0, keep_le)
            pts = pts + shift[:, :1]
            if not cnt.any():
                break
        out[ii, jj] = _shoelace_batch(pts, cnt)
    out = out / np.clip(areas, eps, None)[:, None]
    return out


def _exif_size(img) -> Tuple[int, int]:
    """PIL (w, h) corrected for EXIF orientation (rotated JPEGs swap axes)."""
    w, h = img.size
    try:
        rot = dict(img.getexif()).get(274)  # 274 = Orientation
        if rot in (6, 8):  # 270° / 90°
            w, h = h, w
    except Exception:
        pass
    return w, h


def load_yolo_dota(data_root: str, split: str = "train") -> List[Dict[str, Any]]:
    """Load `data_root/{images,labels}/{split}` into anno dicts
    (reference split_dota.py:66): ori_size (h, w), label (n, 9) normalized
    [cls, x1..y4], filepath."""
    from PIL import Image

    from ultralytics_pro_tpu.data.dataset import img2label_paths

    assert split in {"train", "val"}, f"split must be 'train' or 'val', not {split}"
    im_dir = Path(data_root) / "images" / split
    assert im_dir.exists(), f"Can't find {im_dir}, please check your data root."
    im_files = sorted(glob(str(im_dir / "*")))
    annos = []
    missing = 0
    for im_file, lb_file in zip(im_files, img2label_paths(im_files)):
        w, h = _exif_size(Image.open(im_file))
        if Path(lb_file).exists():
            txt = Path(lb_file).read_text(encoding="utf-8")
        else:
            # a missing label file in a labeled split is almost always a
            # misconfigured data_root (wrong labels dir name) — stay loud
            # rather than silently emitting all-background crops (ADVICE r3;
            # the reference errors here)
            txt = ""
            missing += 1
            if missing <= 5:
                LOGGER.warning(f"split_dota: no label file for {im_file} (expected {lb_file})")
        rows = [r.split() for r in txt.strip().splitlines() if r.strip()]
        lb = np.array(rows, dtype=np.float32) if rows else np.zeros((0, 9), np.float32)
        annos.append(dict(ori_size=(h, w), label=lb, filepath=im_file))
    if missing:
        LOGGER.warning(
            f"split_dota: {missing}/{len(im_files)} images in '{split}' have no label file — "
            f"check that {Path(data_root) / 'labels' / split} is the labels directory"
        )
    return annos


def get_windows(
    im_size: Tuple[int, int],
    crop_sizes: Tuple[int, ...] = (1024,),
    gaps: Tuple[int, ...] = (200,),
    im_rate_thr: float = 0.6,
    eps: float = 0.01,
) -> np.ndarray:
    """Sliding-window xyxy coords for (h, w), one grid per (crop, gap) pair
    (reference split_dota.py:101). Windows mostly hanging off the image
    (image-coverage rate <= im_rate_thr) are dropped; if ALL windows fail the
    rate test the best ones are force-kept so tiny images still crop."""
    h, w = im_size
    grids = []
    for crop, gap in zip(crop_sizes, gaps):
        assert crop > gap, f"invalid crop_size gap pair [{crop} {gap}]"
        step = crop - gap

        def starts(dim):
            n = 1 if dim <= crop else ceil((dim - crop) / step + 1)
            s = [step * i for i in range(n)]
            if len(s) > 1 and s[-1] + crop > dim:
                s[-1] = dim - crop
            return s

        xs, ys = starts(w), starts(h)
        start = np.array([(x, y) for x in xs for y in ys], dtype=np.int64)
        grids.append(np.concatenate([start, start + crop], axis=1))
    windows = np.concatenate(grids, axis=0)

    clipped = windows.copy().astype(np.float64)
    clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, w)
    clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, h)
    im_areas = (clipped[:, 2] - clipped[:, 0]) * (clipped[:, 3] - clipped[:, 1])
    win_areas = (windows[:, 2] - windows[:, 0]) * (windows[:, 3] - windows[:, 1])
    rates = im_areas / win_areas
    if not (rates > im_rate_thr).any():
        rates[np.abs(rates - rates.max()) < eps] = 1.0
    return windows[rates > im_rate_thr]


def get_window_obj(anno: Dict[str, Any], windows: np.ndarray, iof_thr: float = 0.7) -> List[np.ndarray]:
    """Per-window label subsets: a GT belongs to every window covering
    >= iof_thr of its polygon area (reference split_dota.py:153). Returned
    coords are UNNORMALIZED pixels, still in full-image frame."""
    h, w = anno["ori_size"]
    label = anno["label"]
    if not len(label):
        return [np.zeros((0, 9), dtype=np.float32) for _ in range(len(windows))]
    label = label.copy()
    label[:, 1::2] *= w
    label[:, 2::2] *= h
    iofs = bbox_iof(label[:, 1:], windows)
    return [label[iofs[:, i] >= iof_thr] for i in range(len(windows))]


def crop_and_save(
    anno: Dict[str, Any],
    windows: np.ndarray,
    window_objs: List[np.ndarray],
    im_dir: str,
    lb_dir: str,
    allow_background_images: bool = True,
) -> None:
    """Write each window's crop + rebased normalized label file. The
    ``{stem}__{crop}__{x}___{y}`` naming is the reference's contract
    (split_dota.py:199) — downstream merge tools parse it."""
    import cv2

    im = cv2.imread(anno["filepath"])
    name = Path(anno["filepath"]).stem
    for window, label in zip(windows, window_objs):
        x0, y0, x1, y1 = window.tolist()
        new_name = f"{name}__{x1 - x0}__{x0}___{y0}"
        patch = im[y0:y1, x0:x1]
        ph, pw = patch.shape[:2]
        if len(label) or allow_background_images:
            cv2.imwrite(str(Path(im_dir) / f"{new_name}.jpg"), patch)
        if len(label):
            label = label.copy()
            label[:, 1::2] = (label[:, 1::2] - x0) / pw
            label[:, 2::2] = (label[:, 2::2] - y0) / ph
            with open(Path(lb_dir) / f"{new_name}.txt", "w", encoding="utf-8") as f:
                for row in label:
                    coords = " ".join(f"{c:.6g}" for c in row[1:])
                    f.write(f"{int(row[0])} {coords}\n")


def split_images_and_labels(
    data_root: str,
    save_dir: str,
    split: str = "train",
    crop_sizes: Tuple[int, ...] = (1024,),
    gaps: Tuple[int, ...] = (200,),
) -> None:
    """Tile one split end-to-end (reference split_dota.py:218)."""
    im_dir = Path(save_dir) / "images" / split
    lb_dir = Path(save_dir) / "labels" / split
    im_dir.mkdir(parents=True, exist_ok=True)
    lb_dir.mkdir(parents=True, exist_ok=True)

    annos = load_yolo_dota(data_root, split=split)
    for anno in TQDM(annos, desc=split):
        windows = get_windows(anno["ori_size"], crop_sizes, gaps)
        window_objs = get_window_obj(anno, windows)
        crop_and_save(anno, windows, window_objs, str(im_dir), str(lb_dir))


def _scaled(crop_size: int, gap: int, rates) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    return (tuple(int(crop_size / r) for r in rates), tuple(int(gap / r) for r in rates))


def split_trainval(
    data_root: str, save_dir: str, crop_size: int = 1024, gap: int = 200, rates=(1.0,)
) -> None:
    """Tile train+val with multi-scale rates (reference split_dota.py:260)."""
    crop_sizes, gaps = _scaled(crop_size, gap, rates)
    for split in ("train", "val"):
        split_images_and_labels(data_root, save_dir, split, crop_sizes, gaps)


def split_test(
    data_root: str, save_dir: str, crop_size: int = 1024, gap: int = 200, rates=(1.0,)
) -> None:
    """Tile the unlabeled test split (reference split_dota.py:298)."""
    import cv2

    crop_sizes, gaps = _scaled(crop_size, gap, rates)
    out_dir = Path(save_dir) / "images" / "test"
    out_dir.mkdir(parents=True, exist_ok=True)
    im_dir = Path(data_root) / "images" / "test"
    assert im_dir.exists(), f"Can't find {im_dir}, please check your data root."
    for im_file in TQDM(sorted(glob(str(im_dir / "*"))), desc="test"):
        im = cv2.imread(im_file)
        h, w = im.shape[:2]
        name = Path(im_file).stem
        for x0, y0, x1, y1 in get_windows((h, w), crop_sizes, gaps).tolist():
            cv2.imwrite(str(out_dir / f"{name}__{x1 - x0}__{x0}___{y0}.jpg"), im[y0:y1, x0:x1])
