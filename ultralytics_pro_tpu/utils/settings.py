"""Persistent user settings (reference SettingsManager, ultralytics/utils/
__init__.py:1236): JSON at the user config dir with datasets/weights/runs
directories and integration toggles; version-migrated."""

from __future__ import annotations

import json
import os
from pathlib import Path

from ultralytics_pro_tpu.utils import LOGGER

SETTINGS_VERSION = "0.1.0"


def _config_dir() -> Path:
    env = os.getenv("UPT_CONFIG_DIR") or os.getenv("YOLO_CONFIG_DIR")
    if env:
        return Path(env)
    return Path.home() / ".config" / "ultralytics_pro_tpu"


class SettingsManager(dict):
    """Dict-backed settings persisted to settings.json."""

    def __init__(self, file=None):
        super().__init__()
        self.file = Path(file) if file else _config_dir() / "settings.json"
        root = Path.cwd()
        self.defaults = {
            "settings_version": SETTINGS_VERSION,
            "datasets_dir": str(root / "datasets"),
            "weights_dir": str(root / "weights"),
            "runs_dir": str(root / "runs"),
            "sync": False,  # telemetry off by default in this build
            "tensorboard": True,
            # third-party tracker toggles (reference SettingsManager keys);
            # integrations also require the package to be importable
            "wandb": False,
            "mlflow": False,
            "comet": False,
            "clearml": False,
            "dvc": False,
            "neptune": False,
            "raytune": False,
            "hub": False,
            "api_key": "",
        }
        self.update(self.defaults)
        if self.file.exists():
            try:
                loaded = json.loads(self.file.read_text())
                if loaded.get("settings_version") != SETTINGS_VERSION:
                    LOGGER.info("settings version changed; migrating to defaults where missing")
                self.update({k: loaded[k] for k in loaded if k in self.defaults})
            except json.JSONDecodeError:
                LOGGER.info(f"corrupt settings at {self.file}; resetting")
                self.save()
        else:
            self.save()

    def save(self):
        self.file.parent.mkdir(parents=True, exist_ok=True)
        self.file.write_text(json.dumps(dict(self), indent=2))

    def update_and_save(self, **kwargs):
        unknown = set(kwargs) - set(self.defaults)
        if unknown:
            raise KeyError(f"unknown settings: {sorted(unknown)}; valid: {sorted(self.defaults)}")
        self.update(kwargs)
        self.save()

    def reset(self):
        self.clear()
        self.update(self.defaults)
        self.save()


# Module-level singleton, lazily constructed on first attribute access so
# importing the package never touches the user config dir (reference exposes
# SETTINGS from utils/__init__.py:1236).
class _LazySettings(dict):
    _real = None

    def _resolve(self):
        if _LazySettings._real is None:
            _LazySettings._real = SettingsManager()
        return _LazySettings._real

    def __getitem__(self, k):
        return self._resolve()[k]

    def __setitem__(self, k, v):
        self._resolve()[k] = v

    def get(self, k, default=None):
        return self._resolve().get(k, default)

    def update_and_save(self, **kw):
        return self._resolve().update_and_save(**kw)

    def reset(self):
        return self._resolve().reset()

    def __contains__(self, k):
        return k in self._resolve()

    def __iter__(self):
        return iter(self._resolve())

    def keys(self):
        return self._resolve().keys()

    def items(self):
        return self._resolve().items()


SETTINGS = _LazySettings()
