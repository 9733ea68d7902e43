"""Tracker wiring for predict streams (reference ultralytics/trackers/track.py:18
on_predict_start): instantiate a tracker per stream and rewrite Results boxes
with track ids."""

from __future__ import annotations

import numpy as np

from ultralytics_pro_tpu.trackers.bot_sort import BOTSORT
from ultralytics_pro_tpu.trackers.byte_tracker import BYTETracker

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}


def make_tracker(tracker_cfg="botsort.yaml", frame_rate=30, args=None):
    """args may carry with_reid/model to enable the BOTSORT appearance branch
    (reference trackers/track.py on_predict_start builds ReID from cfg)."""
    name = str(tracker_cfg).replace(".yaml", "").rsplit("/", 1)[-1]
    if name not in TRACKER_MAP:
        raise ValueError(f"unknown tracker '{tracker_cfg}'; choose from {list(TRACKER_MAP)}")
    # layer the bundled tracker yaml under any explicit args (reference loads
    # cfg/trackers/<name>.yaml in on_predict_start)
    from pathlib import Path

    from ultralytics_pro_tpu.utils import PKG_ROOT, yaml_load

    cfg_path = Path(str(tracker_cfg))
    if not cfg_path.exists():
        cfg_path = PKG_ROOT / "cfg" / "trackers" / f"{name}.yaml"
    base = yaml_load(cfg_path) if cfg_path.exists() else {}
    args = {**base, **dict(args or {})}
    encoder = None
    if name == "botsort" and args.get("with_reid"):
        from ultralytics_pro_tpu.trackers.bot_sort import ReID

        encoder = ReID(args.get("model") or "yolov8n.yaml")
        return TRACKER_MAP[name](args, frame_rate=frame_rate, encoder=encoder)
    return TRACKER_MAP[name](args, frame_rate=frame_rate)


def register_tracker(model, results, persist: bool = False, tracker_cfg="botsort.yaml"):
    """Run a tracker over an (iterable of) Results; returns updated list/generator."""
    tracker = getattr(model, "_tracker", None)
    if tracker is None or not persist:
        tracker = make_tracker(tracker_cfg)
        model._tracker = tracker

    def process(r):
        if r.boxes is None or len(r.boxes) == 0:
            return r
        det = r.boxes.data
        tracks = tracker.update(det[:, :4], det[:, 4], det[:, 5], img=r.orig_img)
        if len(tracks):
            from ultralytics_pro_tpu.engine.results import Boxes

            idx = tracks[:, -1].astype(int)
            # column layout: xyxy, track_id, conf, cls (7 cols => is_track)
            new = np.concatenate([tracks[:, :4], tracks[:, 4:5], det[idx, 4:5], det[idx, 5:6]], 1)
            r.boxes = Boxes(new, r.orig_shape)
        return r

    if hasattr(results, "__iter__") and not isinstance(results, list):
        return (process(r) for r in results)
    return [process(r) for r in results]
