"""Usage telemetry (reference ultralytics/utils/events.py:26 Events — GA4).

Disabled by default and NO-OP in this hermetic build: events are appended to a
local JSONL only when settings sync=True, never sent anywhere."""

import json
import time
from pathlib import Path


class Events:
    def __init__(self, enabled: bool = False, path: str = None):
        self.enabled = enabled
        self.path = Path(path or "runs/events.jsonl")
        self.queue = []

    def __call__(self, cfg=None):
        if not self.enabled:
            return
        self.queue.append({"t": time.time(), "cfg": {k: v for k, v in (cfg or {}).items()
                                                     if isinstance(v, (int, float, str, bool))}})
        if len(self.queue) >= 25:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            with open(self.path, "a") as f:
                for e in self.queue:
                    f.write(json.dumps(e) + "\n")
            self.queue = []


events = Events()
