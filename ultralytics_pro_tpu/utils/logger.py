"""Console capture + system telemetry loggers.

Behavioral parity with the reference logger (ultralytics/utils/logger.py:
ConsoleLogger:21 stdout/stderr capture -> file with dedup, SystemLogger:227
CPU/memory/disk/network per-epoch telemetry)."""

from __future__ import annotations

import sys
import time
from pathlib import Path


class ConsoleLogger:
    """Tee stdout/stderr into a file, deduplicating repeated lines."""

    def __init__(self, destination):
        self.dest = Path(destination)
        self.dest.parent.mkdir(parents=True, exist_ok=True)
        self._orig_out = None
        self._orig_err = None
        self._last = None
        self._fh = None

    def start_capture(self):
        self._fh = open(self.dest, "a", encoding="utf-8")
        self._orig_out, self._orig_err = sys.stdout, sys.stderr
        sys.stdout = _Tee(self._orig_out, self)
        sys.stderr = _Tee(self._orig_err, self)

    def stop_capture(self):
        if self._orig_out:
            sys.stdout = self._orig_out
            sys.stderr = self._orig_err
        if self._fh:
            self._fh.close()
            self._fh = None

    def write_line(self, line: str):
        line = line.rstrip("\n")
        if not line or line == self._last:
            return
        self._last = line
        if self._fh:
            self._fh.write(f"{time.strftime('%H:%M:%S')} {line}\n")
            self._fh.flush()


class _Tee:
    def __init__(self, stream, logger):
        self.stream = stream
        self.logger = logger

    def write(self, data):
        self.stream.write(data)
        for line in data.splitlines():
            self.logger.write_line(line)

    def flush(self):
        self.stream.flush()


class SystemLogger:
    """Host + device telemetry snapshot per call (reference logger.py:227)."""

    def __init__(self):
        try:
            import psutil

            self.psutil = psutil
            self._net0 = psutil.net_io_counters()
        except ImportError:
            self.psutil = None

    def get_metrics(self) -> dict:
        out = {"time": time.time()}
        if self.psutil:
            p = self.psutil
            vm = p.virtual_memory()
            du = p.disk_usage("/")
            net = p.net_io_counters()
            out.update({
                "cpu_percent": p.cpu_percent(),
                "ram_percent": vm.percent,
                "ram_used_gb": round(vm.used / 1e9, 2),
                "disk_percent": du.percent,
                "net_sent_mb": round((net.bytes_sent - self._net0.bytes_sent) / 1e6, 2),
                "net_recv_mb": round((net.bytes_recv - self._net0.bytes_recv) / 1e6, 2),
            })
        try:
            import jax

            dev = jax.devices()[0]
            stats = getattr(dev, "memory_stats", lambda: None)()
            if stats:
                out["device_mem_used_gb"] = round(stats.get("bytes_in_use", 0) / 1e9, 2)
                out["device_mem_limit_gb"] = round(stats.get("bytes_limit", 0) / 1e9, 2)
        except Exception:
            pass
        return out
