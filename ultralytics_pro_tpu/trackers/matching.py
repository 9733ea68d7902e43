"""Track-detection assignment utilities.

Behavioral parity with the reference matching (ultralytics/trackers/utils/
matching.py: linear_assignment:20, iou_distance:63, embedding_distance:102,
fuse_score:131). scipy Hungarian instead of the optional `lap` dependency.
"""

from __future__ import annotations

import numpy as np
import scipy.optimize

from ultralytics_pro_tpu.utils.metrics import box_iou_np


def linear_assignment(cost_matrix: np.ndarray, thresh: float):
    """Hungarian assignment with cost threshold.

    Returns (matches (k,2), unmatched_a, unmatched_b).
    """
    if cost_matrix.size == 0:
        return (np.empty((0, 2), dtype=int), tuple(range(cost_matrix.shape[0])),
                tuple(range(cost_matrix.shape[1])))
    row, col = scipy.optimize.linear_sum_assignment(cost_matrix)
    keep = cost_matrix[row, col] <= thresh
    matches = np.stack([row[keep], col[keep]], 1) if keep.any() else np.empty((0, 2), dtype=int)
    unmatched_a = tuple(set(range(cost_matrix.shape[0])) - set(matches[:, 0].tolist()))
    unmatched_b = tuple(set(range(cost_matrix.shape[1])) - set(matches[:, 1].tolist()))
    return matches, unmatched_a, unmatched_b


def iou_distance(atracks, btracks) -> np.ndarray:
    """1 - IoU cost between two track/detection lists."""
    if atracks and not isinstance(atracks[0], np.ndarray):
        a = np.asarray([t.xyxy for t in atracks]) if atracks else np.zeros((0, 4))
    else:
        a = np.asarray(atracks) if len(atracks) else np.zeros((0, 4))
    if btracks and not isinstance(btracks[0], np.ndarray):
        b = np.asarray([t.xyxy for t in btracks]) if btracks else np.zeros((0, 4))
    else:
        b = np.asarray(btracks) if len(btracks) else np.zeros((0, 4))
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), dtype=np.float32)
    return 1.0 - box_iou_np(a, b).astype(np.float32)


def embedding_distance(tracks, detections, metric: str = "cosine") -> np.ndarray:
    """Appearance-feature cost (1 - cosine similarity)."""
    cost = np.zeros((len(tracks), len(detections)), dtype=np.float32)
    if cost.size == 0:
        return cost
    det_features = np.asarray([d.curr_feat for d in detections], dtype=np.float32)
    track_features = np.asarray([t.smooth_feat for t in tracks], dtype=np.float32)
    a = track_features / (np.linalg.norm(track_features, axis=1, keepdims=True) + 1e-9)
    b = det_features / (np.linalg.norm(det_features, axis=1, keepdims=True) + 1e-9)
    return np.maximum(0.0, 1.0 - a @ b.T)


def fuse_score(cost_matrix: np.ndarray, detections) -> np.ndarray:
    """Blend IoU similarity with detection confidence (reference :131)."""
    if cost_matrix.size == 0:
        return cost_matrix
    iou_sim = 1 - cost_matrix
    det_scores = np.array([d.score for d in detections])
    fuse_sim = iou_sim * det_scores[None, :]
    return 1 - fuse_sim
