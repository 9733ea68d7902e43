"""Native (C++) runtime components.

`fastloader`: multithreaded decode+letterbox batch loader (fastloader.cpp,
OpenCV C++), compiled on first use with g++ and bound via ctypes — the
TPU-native equivalent of the reference's torch-DataLoader C++ worker pool.
Falls back to the python cv2 path when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ultralytics_pro_tpu.utils import LOGGER

_SRC = Path(__file__).parent / "fastloader.cpp"
_LIB = None
_LIB_FAILED = False


def _build_lib() -> Optional[Path]:
    """Compile fastloader.cpp into a cached .so keyed by source hash. The
    build writes to a temp path and renames atomically, so a killed g++ can
    never leave a truncated .so that poisons the cache."""
    try:
        tag = hashlib.sha1(_SRC.read_bytes()).hexdigest()[:12]
        cache = Path(os.environ.get("UPT_NATIVE_CACHE",
                                    Path.home() / ".cache" / "ultralytics_pro_tpu" / "native"))
        cache.mkdir(parents=True, exist_ok=True)
        so = cache / f"libfastloader_{tag}.so"
        if so.exists():
            return so
        tmp = so.with_suffix(f".tmp{os.getpid()}.so")
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               "-I/usr/include/opencv4", str(_SRC), "-o", str(tmp),
               "-lopencv_core", "-lopencv_imgcodecs", "-lopencv_imgproc"]
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        os.replace(tmp, so)  # atomic publish
        LOGGER.info(f"built native fastloader -> {so}")
        return so
    except Exception as e:
        LOGGER.info(f"native fastloader unavailable ({type(e).__name__}); using python loader")
        return None


def _get_lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so = _build_lib()
    if so is None:
        _LIB_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError as e:  # stale cache from another environment
        LOGGER.info(f"native fastloader .so unloadable ({e}); using python loader")
        _LIB_FAILED = True
        return None
    lib.fl_create.restype = ctypes.c_void_p
    lib.fl_create.argtypes = [ctypes.c_int] * 4
    lib.fl_load_batch.restype = ctypes.c_int
    lib.fl_load_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_float)]
    lib.fl_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _get_lib() is not None


class FastLoader:
    """Batch decode+letterbox in native threads.

    >>> fl = FastLoader(imgsz=640, scaleup=False)
    >>> imgs, meta = fl.load([p1, p2, ...])   # (N,640,640,3) u8 BGR, (N,5)
    meta rows: (h0, w0, ratio, dw, dh) — the same quantities LetterBox
    produces, so scale_boxes works unchanged.
    """

    def __init__(self, imgsz: int = 640, nthreads: int = 8, scaleup: bool = True,
                 pad_value: int = 114):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native fastloader unavailable (no g++/OpenCV dev)")
        self._lib = lib
        self.imgsz = imgsz
        self._h = lib.fl_create(imgsz, nthreads, int(scaleup), pad_value)

    def load(self, paths: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        n = len(paths)
        out = np.empty((n, self.imgsz, self.imgsz, 3), np.uint8)
        meta = np.empty((n, 5), np.float32)
        arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
        self._lib.fl_load_batch(
            self._h, arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out, meta

    def __del__(self):
        if getattr(self, "_h", None) and getattr(self, "_lib", None):
            self._lib.fl_destroy(self._h)
            self._h = None
