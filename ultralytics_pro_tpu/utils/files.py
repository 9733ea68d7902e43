"""File helpers (reference ultralytics/utils/files.py: WorkingDirectory:15,
spaces_in_path:57, increment_path:106 [lives in utils/__init__ here],
get_latest_run:177, file_size)."""

from __future__ import annotations

import contextlib
import glob
import os
import shutil
import tempfile
from pathlib import Path


class WorkingDirectory(contextlib.ContextDecorator):
    """cd context manager/decorator (reference files.py:15)."""

    def __init__(self, new_dir):
        self.dir = new_dir
        self.cwd = Path.cwd().resolve()

    def __enter__(self):
        os.chdir(self.dir)

    def __exit__(self, *exc):
        os.chdir(self.cwd)


@contextlib.contextmanager
def spaces_in_path(path):
    """Copy paths containing spaces to a temp path for tools that can't handle
    them (reference files.py:57)."""
    if " " not in str(path):
        yield path
        return
    path = Path(path)
    with tempfile.TemporaryDirectory() as tmp:
        tmp_path = Path(tmp) / path.name.replace(" ", "_")
        if path.is_dir():
            shutil.copytree(path, tmp_path)
        elif path.is_file():
            shutil.copy2(path, tmp_path)
        try:
            yield tmp_path
        finally:
            if tmp_path.is_dir():
                shutil.copytree(tmp_path, path, dirs_exist_ok=True)
            elif tmp_path.is_file():
                shutil.copy2(tmp_path, path)


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent last.ckpt under search_dir for --resume (reference files.py:177)."""
    paths = glob.glob(f"{search_dir}/**/last*.ckpt", recursive=True)
    return max(paths, key=os.path.getctime) if paths else ""


def file_size(path) -> float:
    """Size in MB."""
    p = Path(path)
    if p.is_file():
        return p.stat().st_size / 1e6
    if p.is_dir():
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file()) / 1e6
    return 0.0
