"""Idle-device discovery and selection (reference `utils/autodevice.py:11`).

The reference's GPUInfo wraps pynvml to pick idle CUDA cards. The TPU-native
equivalent queries the live JAX backend instead: every addressable device
reports its HBM occupancy through ``device.memory_stats()`` (PJRT). Scope
caveat vs NVML: PJRT memory stats describe THIS process's allocator
(bytes_in_use of the current JAX client), not HBM held by other programs —
on TPU another process holding a chip typically prevents backend init
entirely rather than showing up as occupancy. So this module answers
*intra-process placement* ("which of my addressable devices carries the
least of my own state") — e.g. picking a spare chip after earlier models
were placed — not cross-process idleness. In a fresh process all devices
legitimately report idle and selection degrades to "first N devices",
which is the correct placement answer there. No NVML, no driver shellouts.

``GPUInfo`` stays as an alias so reference call sites
(``from ultralytics.utils.autodevice import GPUInfo``) port unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from ultralytics_pro_tpu.utils import LOGGER

__all__ = ["DeviceInfo", "GPUInfo"]


class DeviceInfo:
    """Stats + idle-selection over the addressable JAX devices.

    Mirrors the reference GPUInfo surface (reference autodevice.py:11):
    ``refresh_stats`` / ``print_status`` / ``select_idle_device`` with
    utilization defined as this-process HBM occupancy
    (bytes_in_use / bytes_limit) — an intra-process placement signal
    (see module docstring), not a cross-process busy indicator.
    """

    def __init__(self):
        self.device_stats: List[Dict[str, Any]] = []
        try:
            import jax

            self._devices = jax.devices()
        except Exception as e:  # backend init failure == no devices, not a crash
            LOGGER.warning(f"Failed to initialize JAX backend, device stats disabled: {e}")
            self._devices = []
        self.refresh_stats()

    @property
    def available(self) -> bool:
        return bool(self._devices)

    def refresh_stats(self) -> None:
        """Re-query memory_stats for every addressable device. Backends
        without PJRT memory stats (older CPU plugins) report -1 like the
        reference's safe_get defaults (autodevice.py:93)."""
        self.device_stats = []
        mib = 1 << 20
        for d in self._devices:
            try:
                ms = d.memory_stats() or {}
            except Exception:
                ms = {}
            total = int(ms.get("bytes_limit", -1))
            used = int(ms.get("bytes_in_use", -1))
            free = total - used if total > 0 and used >= 0 else -1
            self.device_stats.append({
                "index": d.id,
                "name": f"{d.platform}:{getattr(d, 'device_kind', '')}".rstrip(":"),
                "process_index": d.process_index,
                "coords": tuple(getattr(d, "coords", ()) or ()),
                "memory_total": total // mib if total > 0 else -1,
                "memory_used": used // mib if used >= 0 else -1,
                "memory_free": free // mib if free >= 0 else -1,
                "utilization": round(100.0 * used / total, 1) if total > 0 and used >= 0 else -1,
            })

    def print_status(self) -> None:
        """Compact per-device table (reference autodevice.py:114)."""
        self.refresh_stats()
        if not self.device_stats:
            LOGGER.warning("No devices found")
            return
        name_w = max(len(s["name"]) for s in self.device_stats)
        LOGGER.info(f"{'-' * (name_w + 42)}")
        LOGGER.info(f"{'Idx':<3} {'Name':<{name_w}} {'HBM%':>5} {'Mem (MiB)':>15} Coords")
        for s in self.device_stats:
            mem = f"{s['memory_used']}/{s['memory_total']}"
            LOGGER.info(f"{s['index']:<3d} {s['name']:<{name_w}} {s['utilization']:>5} {mem:>15} {s['coords']}")
        LOGGER.info(f"{'-' * (name_w + 42)}")

    def select_idle_device(self, count: int = 1, min_memory_fraction: float = 0.0,
                           min_util_fraction: float = 0.0) -> List[int]:
        """Pick the `count` most-idle devices (reference select_idle_gpu,
        autodevice.py:136): filter by free-HBM fraction and free-"utilization"
        fraction, sort by (occupancy, -free), return device ids. Devices whose
        backend reports no memory stats count as idle (nothing resident)."""
        assert min_memory_fraction <= 1.0, f"min_memory_fraction must be <= 1.0, got {min_memory_fraction}"
        assert min_util_fraction <= 1.0, f"min_util_fraction must be <= 1.0, got {min_util_fraction}"
        if count <= 0:
            return []
        self.refresh_stats()
        if not self.device_stats:
            LOGGER.warning("Device stats unavailable.")
            return []

        def occupancy(s):
            return s["utilization"] if s["utilization"] >= 0 else 0.0

        eligible = [
            s for s in self.device_stats
            # memory_free < 0 means the backend reported no usable stats
            # (e.g. bytes_limit without bytes_in_use): unknown counts as
            # idle, same as the total<=0 case — don't let -1/total fail
            # the fraction filter even at its 0.0 default
            if (s["memory_total"] <= 0 or s["memory_free"] < 0
                or s["memory_free"] / max(s["memory_total"], 1) >= min_memory_fraction)
            and (100 - occupancy(s)) >= min_util_fraction * 100
        ]
        eligible.sort(key=lambda s: (occupancy(s), -s["memory_free"]))
        selected = [s["index"] for s in eligible[:count]]
        if selected:
            LOGGER.info(f"Selected idle devices {selected}")
        else:
            LOGGER.warning(f"No devices met the criteria (need {count}).")
        return selected

    # reference-name compat
    select_idle_gpu = select_idle_device

    def shutdown(self) -> None:
        """No persistent handle to release (NVML-compat no-op)."""


GPUInfo = DeviceInfo


def autodevice(count: int = 1, min_memory_fraction: float = 0.0) -> Optional[List[int]]:
    """One-shot helper: ids of the most idle devices, or None if none qualify."""
    ids = DeviceInfo().select_idle_device(count=count, min_memory_fraction=min_memory_fraction)
    return ids or None
