"""Device discovery/selection (utils/autodevice.py vs reference autodevice.py)."""

from ultralytics_pro_tpu.utils.autodevice import DeviceInfo, GPUInfo, autodevice


def test_stats_shape_and_alias():
    info = DeviceInfo()
    assert info.available and len(info.device_stats) == 8  # conftest's virtual mesh
    s = info.device_stats[0]
    for key in ("index", "name", "memory_total", "memory_free", "utilization", "coords"):
        assert key in s
    assert GPUInfo is DeviceInfo
    info.print_status()  # must not raise
    info.shutdown()


def test_select_idle_orders_by_occupancy():
    info = DeviceInfo()
    # inject deterministic stats; refresh_stats is then stubbed out so the
    # selection logic (filter -> sort -> slice) is what's under test
    info.device_stats = [
        {"index": 0, "name": "tpu", "memory_total": 100, "memory_used": 90, "memory_free": 10, "utilization": 90.0, "coords": (), "process_index": 0},
        {"index": 1, "name": "tpu", "memory_total": 100, "memory_used": 10, "memory_free": 90, "utilization": 10.0, "coords": (), "process_index": 0},
        {"index": 2, "name": "tpu", "memory_total": 100, "memory_used": 50, "memory_free": 50, "utilization": 50.0, "coords": (), "process_index": 0},
    ]
    info.refresh_stats = lambda: None
    assert info.select_idle_device(count=2) == [1, 2]
    # min_memory_fraction filters the 90%-occupied card even for count=3
    assert info.select_idle_device(count=3, min_memory_fraction=0.25) == [1, 2]
    # min_util_fraction: only the 10%-occupied card has >= 80% free utilization
    assert info.select_idle_device(count=3, min_util_fraction=0.8) == [1]
    assert info.select_idle_device(count=0) == []
    # reference-name compat
    assert info.select_idle_gpu(count=1) == [1]


def test_autodevice_helper():
    ids = autodevice(count=2)
    assert ids is None or (isinstance(ids, list) and len(ids) <= 2)
