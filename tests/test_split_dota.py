"""DOTA sliding-window tiling (data/split_dota.py vs reference split_dota.py)."""

import numpy as np
import pytest

from ultralytics_pro_tpu.data.split_dota import (
    bbox_iof,
    crop_and_save,
    get_window_obj,
    get_windows,
    load_yolo_dota,
    split_test,
    split_trainval,
)


def square(cx, cy, half):
    return np.array([cx - half, cy - half, cx + half, cy - half,
                     cx + half, cy + half, cx - half, cy + half], np.float64)


def test_bbox_iof_analytic():
    polys = np.stack([
        square(50, 50, 10),   # fully inside window -> 1.0
        square(0, 50, 10),    # half inside (clipped at x=0 edge of [0,100]) -> 0.5
        square(200, 200, 10), # disjoint -> 0.0
    ])
    win = np.array([[0, 0, 100, 100]], np.float64)
    iof = bbox_iof(polys, win)
    assert iof.shape == (3, 1)
    np.testing.assert_allclose(iof[:, 0], [1.0, 0.5, 0.0], atol=1e-9)

    # rotated 45-degree diamond centered on a window corner: exactly half of
    # the diamond lies inside each of the two windows sharing that edge
    diamond = np.array([[100, 80, 120, 100, 100, 120, 80, 100]], np.float64)
    wins = np.array([[0, 0, 100, 200], [100, 0, 200, 200]], np.float64)
    np.testing.assert_allclose(bbox_iof(diamond, wins)[0], [0.5, 0.5], atol=1e-9)


def test_get_windows_grid():
    wins = get_windows((800, 1400), crop_sizes=(512,), gaps=(128,))
    # step=384: xs=[0,384,768,888(clamped)], ys=[0,288(clamped)]
    assert wins.shape == (8, 4)
    assert ((wins[:, 2] - wins[:, 0]) == 512).all() and ((wins[:, 3] - wins[:, 1]) == 512).all()
    assert wins[:, 0].min() == 0 and wins[:, 2].max() == 1400
    assert wins[:, 1].min() == 0 and wins[:, 3].max() == 800
    assert sorted(set(wins[:, 0].tolist())) == [0, 384, 768, 888]
    assert sorted(set(wins[:, 1].tolist())) == [0, 288]

    # image smaller than the crop: the rate fallback must keep the one window
    tiny = get_windows((100, 120), crop_sizes=(512,), gaps=(128,))
    assert len(tiny) == 1 and tiny[0].tolist() == [0, 0, 512, 512]


def _make_mini_dota(root, split="train"):
    import cv2

    (root / "images" / split).mkdir(parents=True)
    (root / "labels" / split).mkdir(parents=True)
    h, w = 700, 900
    img = np.full((h, w, 3), 64, np.uint8)
    cv2.imwrite(str(root / "images" / split / "scene.jpg"), img)
    # two OBBs: one inside the first window, one straddling windows
    rows = []
    for cx, cy, half, cls in ((150, 150, 40, 0), (480, 300, 30, 3)):
        q = square(cx, cy, half)
        q[0::2] /= w
        q[1::2] /= h
        rows.append(f"{cls} " + " ".join(f"{v:.6g}" for v in q))
    (root / "labels" / split / "scene.txt").write_text("\n".join(rows) + "\n")
    return h, w


def test_split_trainval_end_to_end(tmp_path):
    data_root = tmp_path / "dota"
    for split in ("train", "val"):
        _make_mini_dota(data_root, split)
    out = tmp_path / "out"
    split_trainval(str(data_root), str(out), crop_size=512, gap=128)

    for split in ("train", "val"):
        ims = sorted((out / "images" / split).glob("*.jpg"))
        lbs = sorted((out / "labels" / split).glob("*.txt"))
        assert ims and lbs
        # naming contract: stem__crop__x___y
        import re

        assert all(re.fullmatch(r"scene__512__\d+___\d+", im.stem) for im in ims)
        for lb in lbs:
            arr = np.array([r.split() for r in lb.read_text().strip().splitlines()], np.float64)
            assert arr.shape[1] == 9
            # rebased coords are normalized to the window
            assert (arr[:, 1:] >= -1e-6).all() and (arr[:, 1:] <= 1 + 1e-6).all()

    # every kept (window, label) pair really has iof >= 0.7
    annos = load_yolo_dota(str(data_root), "train")
    wins = get_windows(annos[0]["ori_size"], (512,), (128,))
    objs = get_window_obj(annos[0], wins)
    iofs = bbox_iof(np.concatenate([o[:, 1:] for o in objs if len(o)]) if any(len(o) for o in objs)
                    else np.zeros((0, 8)), wins)
    assert (iofs.max(axis=1) >= 0.7).all()
    # the GT centered at (150,150) appears in window (0,0) with ~full iof
    first = [o for win, o in zip(wins, objs) if win.tolist() == [0, 0, 512, 512]][0]
    assert len(first) == 2  # both GTs fully inside the first window


def test_split_test_unlabeled(tmp_path):
    import cv2

    data_root = tmp_path / "dota"
    (data_root / "images" / "test").mkdir(parents=True)
    cv2.imwrite(str(data_root / "images" / "test" / "t.jpg"),
                np.zeros((600, 600, 3), np.uint8))
    out = tmp_path / "out"
    split_test(str(data_root), str(out), crop_size=512, gap=128)
    crops = list((out / "images" / "test").glob("t__512__*.jpg"))
    assert len(crops) == 4  # 2x2 grid at step 384 clamped to 88
    im = cv2.imread(str(crops[0]))
    assert im.shape[:2] == (512, 512)


def test_bbox_iof_vectorized_matches_scalar_clip():
    """The batched Sutherland–Hodgman (r4, ADVICE perf fix) must reproduce the
    per-pair scalar clip exactly on random non-convex-free quads."""
    import numpy as np

    from ultralytics_pro_tpu.data.split_dota import _poly_rect_area, _shoelace, bbox_iof

    rng = np.random.default_rng(7)
    n, m = 60, 12
    centers = rng.uniform(0, 1000, (n, 1, 2))
    quads = centers + rng.uniform(-80, 80, (n, 4, 2))
    # sort each quad's vertices by angle so rings are simple polygons
    rel = quads - centers
    ang = np.arctan2(rel[..., 1], rel[..., 0])  # (n, 4)
    order = np.argsort(ang, axis=1)
    quads = np.take_along_axis(quads, order[..., None].repeat(2, -1), axis=1)
    wins = np.sort(rng.uniform(0, 1000, (m, 2, 2)), axis=1).reshape(m, 4)
    wins[:, 2:] = np.maximum(wins[:, 2:], wins[:, :2] + 5)

    got = bbox_iof(quads.reshape(n, 8), wins)
    want = np.zeros((n, m))
    for i in range(n):
        a = max(_shoelace(quads[i]), 1e-6)
        for j in range(m):
            want[i, j] = _poly_rect_area(quads[i], wins[j]) / a
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)
