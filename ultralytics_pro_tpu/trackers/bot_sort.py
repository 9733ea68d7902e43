"""BOT-SORT: ByteTrack + camera-motion compensation (+ optional ReID).

Behavioral parity with the reference (ultralytics/trackers/bot_sort.py:154
BOTSORT, gmc.py:13 GMC): XYWH Kalman state, GMC via sparse optical flow,
proximity+appearance fused costs when ReID is enabled.
"""

from __future__ import annotations

import cv2
import numpy as np

from ultralytics_pro_tpu.trackers.byte_tracker import BYTETracker, STrack, TrackState
from ultralytics_pro_tpu.trackers.kalman_filter import KalmanFilterXYWH
from ultralytics_pro_tpu.trackers.matching import embedding_distance, fuse_score, iou_distance


class GMC:
    """Global (camera) motion compensation via sparse optical flow
    (reference trackers/utils/gmc.py:13, method='sparseOptFlow')."""

    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, int(downscale))
        self.prevFrame = None
        self.prevKeyPoints = None
        self.initializedFirstFrame = False

    def apply(self, raw_frame: np.ndarray, detections=None) -> np.ndarray:
        if self.method in {"none", None}:
            return np.eye(2, 3)
        frame = cv2.cvtColor(raw_frame, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            frame = cv2.resize(frame, (frame.shape[1] // self.downscale, frame.shape[0] // self.downscale))
        H = np.eye(2, 3)
        keypoints = cv2.goodFeaturesToTrack(
            frame, maxCorners=1000, qualityLevel=0.01, minDistance=1, blockSize=3,
            useHarrisDetector=False, k=0.04,
        )
        if not self.initializedFirstFrame or keypoints is None:
            self.prevFrame = frame.copy()
            self.prevKeyPoints = keypoints
            self.initializedFirstFrame = True
            return H
        if self.prevKeyPoints is None:
            self.prevFrame = frame.copy()
            self.prevKeyPoints = keypoints
            return H
        matched, status, _ = cv2.calcOpticalFlowPyrLK(self.prevFrame, frame, self.prevKeyPoints, None)
        if matched is None:
            self.prevFrame = frame.copy()
            self.prevKeyPoints = keypoints
            return H
        prev_pts = self.prevKeyPoints[status.flatten() == 1]
        curr_pts = matched[status.flatten() == 1]
        if len(prev_pts) > 4:
            M, _ = cv2.estimateAffinePartial2D(prev_pts, curr_pts, method=cv2.RANSAC)
            if M is not None:
                H = M
                if self.downscale > 1:
                    H[0, 2] *= self.downscale
                    H[1, 2] *= self.downscale
        self.prevFrame = frame.copy()
        self.prevKeyPoints = keypoints
        return H


class BOTrack(STrack):
    """STrack with XYWH Kalman state and smoothed appearance features
    (reference bot_sort.py BOTrack)."""

    shared_kalman = KalmanFilterXYWH()

    def __init__(self, xywh, score, cls, feat=None, feat_history: int = 50):
        super().__init__(xywh, score, cls)
        self.smooth_feat = None
        self.curr_feat = None
        self.alpha = 0.9
        if feat is not None:
            self.update_features(feat)

    def update_features(self, feat):
        feat = feat / (np.linalg.norm(feat) + 1e-9)
        self.curr_feat = feat
        self.smooth_feat = feat if self.smooth_feat is None else self.alpha * self.smooth_feat + (1 - self.alpha) * feat
        self.smooth_feat /= np.linalg.norm(self.smooth_feat) + 1e-9

    @property
    def tlwh(self):
        if self.mean is None:
            return self._tlwh.copy()
        ret = self.mean[:4].copy()  # cx, cy, w, h
        ret[:2] -= ret[2:] / 2
        return ret

    @staticmethod
    def tlwh_to_xywh(tlwh):
        ret = np.asarray(tlwh, dtype=np.float32).copy()
        ret[:2] += ret[2:] / 2
        return ret

    def activate(self, kalman_filter, frame_id):
        self.kalman_filter = kalman_filter
        self.track_id = self.next_id()
        self.mean, self.covariance = kalman_filter.initiate(self.tlwh_to_xywh(self._tlwh))
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = frame_id == 1
        self.frame_id = frame_id
        self.start_frame = frame_id

    def re_activate(self, new_track, frame_id, new_id=False):
        if getattr(new_track, "curr_feat", None) is not None:
            self.update_features(new_track.curr_feat)
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, self.tlwh_to_xywh(new_track.tlwh)
        )
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = True
        self.frame_id = frame_id
        if new_id:
            self.track_id = self.next_id()
        self.score = new_track.score
        self.cls = new_track.cls
        self.idx = new_track.idx

    def update(self, new_track, frame_id):
        if getattr(new_track, "curr_feat", None) is not None:
            self.update_features(new_track.curr_feat)
        self.frame_id = frame_id
        self.tracklet_len += 1
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, self.tlwh_to_xywh(new_track.tlwh)
        )
        self.state = TrackState.Tracked
        self.is_activated = True
        self.score = new_track.score
        self.cls = new_track.cls
        self.idx = new_track.idx

    @staticmethod
    def multi_gmc(stracks, H=np.eye(2, 3)):
        """Warp track states by the camera-motion homography."""
        if not stracks:
            return
        R = H[:2, :2]
        R8x8 = np.kron(np.eye(4), R)
        t = H[:2, 2]
        for st in stracks:
            mean = R8x8 @ st.mean
            mean[:2] += t
            st.mean = mean
            st.covariance = R8x8 @ st.covariance @ R8x8.T


class BOTSORT(BYTETracker):
    """ByteTrack + GMC (+ReID when a feature extractor is supplied)
    (reference bot_sort.py:154)."""

    def __init__(self, args=None, frame_rate: int = 30, encoder=None):
        args = args or {}
        super().__init__(args, frame_rate)
        self.proximity_thresh = args.get("proximity_thresh", 0.5)
        self.appearance_thresh = args.get("appearance_thresh", 0.25)
        self.with_reid = bool(args.get("with_reid", False)) and encoder is not None
        self.encoder = encoder
        self.gmc = GMC(method=args.get("gmc_method", "sparseOptFlow"))

    def get_kalmanfilter(self):
        return KalmanFilterXYWH()

    def init_track(self, xywhs, scores, cls, img=None):
        if len(xywhs) == 0:
            return []
        if self.with_reid and img is not None:
            feats = self.encoder(img, xywhs[:, :4])
            return [BOTrack(x, s, c, f) for x, s, c, f in zip(xywhs, scores, cls, feats)]
        return [BOTrack(x, s, c) for x, s, c in zip(xywhs, scores, cls)]

    def get_dists(self, tracks, detections):
        dists = iou_distance(tracks, detections)
        dists_mask = dists > (1 - self.proximity_thresh)
        if self.fuse_score_flag:
            dists = fuse_score(dists, detections)
        if self.with_reid:
            emb = embedding_distance(tracks, detections) / 2.0
            emb[emb > self.appearance_thresh] = 1.0
            emb[dists_mask] = 1.0
            dists = np.minimum(dists, emb)
        return dists

    def multi_predict(self, tracks):
        BOTrack.multi_predict(tracks)

    def update(self, boxes_xyxy, scores, classes, img=None):
        if img is not None:
            H = self.gmc.apply(img)
            BOTrack.multi_gmc(self.tracked_stracks, H)
            BOTrack.multi_gmc(self.lost_stracks, H)
        return super().update(boxes_xyxy, scores, classes, img)


class ReID:
    """YOLO model as appearance encoder for re-identification (reference
    bot_sort.py:248 ReID: embeds per-detection crops through the detector's
    own neck features via Model.embed)."""

    def __init__(self, model="yolov8n.yaml", imgsz: int = 128):
        from ultralytics_pro_tpu.engine.model import YOLO

        self.model = model if not isinstance(model, str) else YOLO(model)
        self.imgsz = imgsz

    def __call__(self, img: np.ndarray, dets: np.ndarray):
        """img: BGR HWC frame; dets: (N, 4+) xywh. Returns list of (D,)."""
        h, w = img.shape[:2]
        crops = []
        for d in np.atleast_2d(np.asarray(dets, np.float32)):
            cx, cy, bw, bh = d[:4]
            x1 = int(max(cx - bw / 2, 0))
            y1 = int(max(cy - bh / 2, 0))
            x2 = int(min(cx + bw / 2, w - 1) + 1)
            y2 = int(min(cy + bh / 2, h - 1) + 1)
            crop = img[y1:max(y2, y1 + 1), x1:max(x2, x1 + 1)]
            crops.append(crop)
        feats = self.model.embed(crops, imgsz=self.imgsz)
        return [f for f in feats]
