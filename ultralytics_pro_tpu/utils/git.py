"""Git metadata for checkpoint provenance (reference ultralytics/utils/git.py
GIT; embedded into ckpts at trainer.py:599-604)."""

from __future__ import annotations

import subprocess
from pathlib import Path


def _git(args, cwd=None) -> str:
    try:
        return subprocess.run(
            ["git", *args], cwd=cwd, capture_output=True, text=True, timeout=5
        ).stdout.strip()
    except Exception:
        return ""


class GIT:
    """Lazy snapshot of the current repo's git state."""

    def __init__(self, path: str | Path = "."):
        self.path = Path(path)
        root = _git(["rev-parse", "--show-toplevel"], self.path)
        self.is_repo = bool(root)
        self.root = Path(root) if root else None

    @property
    def branch(self) -> str:
        return _git(["rev-parse", "--abbrev-ref", "HEAD"], self.path) if self.is_repo else ""

    @property
    def commit(self) -> str:
        return _git(["rev-parse", "HEAD"], self.path) if self.is_repo else ""

    @property
    def origin(self) -> str:
        return _git(["remote", "get-url", "origin"], self.path) if self.is_repo else ""

    def as_dict(self) -> dict:
        return {"git_branch": self.branch, "git_commit": self.commit, "git_origin": self.origin}
