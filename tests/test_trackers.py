"""Tracker behavior tests: identity persistence across frames for a moving box."""

import numpy as np

from ultralytics_pro_tpu.trackers import BOTSORT, BYTETracker


def synthetic_track(tracker, with_img=False):
    """Two objects moving right; verify stable IDs over 10 frames."""
    rng = np.random.default_rng(0)
    ids_per_frame = []
    for t in range(10):
        boxes = np.array([
            [50 + 5 * t, 50, 100 + 5 * t, 120],
            [200, 80 + 4 * t, 260, 160 + 4 * t],
        ], np.float32) + rng.normal(0, 0.5, (2, 4)).astype(np.float32)
        scores = np.array([0.9, 0.8], np.float32)
        classes = np.array([0, 1], np.float32)
        img = np.full((300, 400, 3), 100, np.uint8) if with_img else None
        out = tracker.update(boxes, scores, classes, img=img)
        if len(out):
            ids_per_frame.append(sorted(out[:, 4].astype(int).tolist()))
    return ids_per_frame


def test_bytetrack_identity():
    ids = synthetic_track(BYTETracker({}, frame_rate=30))
    assert len(ids) >= 8
    # after activation, IDs must stay constant
    assert all(f == ids[-1] for f in ids[2:])
    assert len(ids[-1]) == 2


def test_botsort_identity():
    ids = synthetic_track(BOTSORT({}, frame_rate=30), with_img=True)
    assert len(ids) >= 8
    assert all(f == ids[-1] for f in ids[2:])
    assert len(ids[-1]) == 2


def test_bytetrack_lost_and_recover():
    """Object disappears for 3 frames then returns: same ID via lost-track
    reactivation."""
    tracker = BYTETracker({}, frame_rate=30)
    box = np.array([[50, 50, 100, 120]], np.float32)
    scores = np.array([0.9], np.float32)
    classes = np.array([0], np.float32)
    first_id = None
    for t in range(12):
        if 4 <= t < 7:
            out = tracker.update(np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0))
        else:
            out = tracker.update(box + t, scores, classes)
            if len(out) and first_id is None and t >= 1:
                first_id = int(out[0, 4])
    assert len(out) == 1
    assert int(out[0, 4]) == first_id


def test_botsort_reid_appearance_branch(tmp_path):
    """BOTSORT with_reid: embeddings from the detector's own neck features
    (Model.embed) fuse into association costs (reference bot_sort.py:248)."""
    import numpy as np

    from ultralytics_pro_tpu.trackers.track import make_tracker

    tracker = make_tracker("botsort.yaml", args={"with_reid": True, "model": "yolov8n.yaml"})
    assert tracker.with_reid and tracker.encoder is not None
    img = np.full((160, 160, 3), 50, np.uint8)
    img[40:80, 40:80] = (200, 60, 60)
    scores = np.array([0.9])
    cls = np.array([0.0])
    ids = []
    for t in range(6):
        dets = np.array([[40.0 + 2 * t, 40.0, 80.0 + 2 * t, 80.0]], np.float32)
        out = tracker.update(dets, scores, cls, img=img)
        if len(out):
            ids.append(int(out[0, 4]))
    # the appearance branch must not break association: one stable track id
    assert len(ids) >= 4 and len(set(ids)) == 1


def test_model_embed_shape():
    import numpy as np

    from ultralytics_pro_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    rng = np.random.default_rng(0)
    e = m.embed([rng.integers(0, 255, (80, 64, 3)).astype(np.uint8),
                 rng.integers(0, 255, (64, 80, 3)).astype(np.uint8)], imgsz=64)
    assert e.shape[0] == 2 and e.ndim == 2 and e.shape[1] > 64
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-5)
