"""Host CPU introspection (reference ultralytics/utils/cpu.py CPUInfo)."""

from __future__ import annotations

import platform
import re


class CPUInfo:
    """Best-effort CPU model name + core counts for system reports."""

    @staticmethod
    def name() -> str:
        try:
            if platform.system() == "Linux":
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        if "model name" in line:
                            return re.sub(r"\s+", " ", line.split(":", 1)[1]).strip()
            return platform.processor() or platform.machine()
        except Exception:
            return platform.machine()

    @staticmethod
    def cores() -> int:
        import os

        return os.cpu_count() or 1

    def __str__(self) -> str:
        return f"{self.name()} ({self.cores()} cores)"
