"""Unicode-safe cv2 IO wrappers (reference ultralytics/utils/patches.py:20-94
imread/imwrite/imshow — cv2's native paths choke on non-ASCII filenames, so
encode/decode through numpy buffers)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import cv2
import numpy as np


def imread(filename: str | Path, flags: int = cv2.IMREAD_COLOR) -> Optional[np.ndarray]:
    """Read an image from a (possibly non-ASCII) path."""
    try:
        return cv2.imdecode(np.fromfile(str(filename), np.uint8), flags)
    except Exception:
        return None


def imwrite(filename: str | Path, img: np.ndarray, params=None) -> bool:
    """Write an image to a (possibly non-ASCII) path."""
    try:
        buf = cv2.imencode(Path(str(filename)).suffix or ".jpg", img, params or [])[1]
        buf.tofile(str(filename))
        return True
    except Exception:
        return False


def imshow(winname: str, mat: np.ndarray) -> None:
    """Show an image (no-op in headless environments)."""
    try:
        cv2.imshow(winname.encode("unicode_escape").decode(), mat)
    except cv2.error:
        pass
