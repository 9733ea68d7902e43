"""Benchmark harness: export -> predict -> val across formats with assertions.

Behavioral parity with the reference harness (ultralytics/utils/benchmarks.py:54
benchmark(): per-format export, one predict, a val run, metric-floor assertions
when `verbose` is a float; :370 ProfileModels timing)."""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import numpy as np

from ultralytics_pro_tpu.utils import LOGGER


def benchmark(model="yolov8n.yaml", data=None, imgsz: int = 160, verbose=False,
              formats=("-", "stablehlo", "ckpt", "saved_model", "tflite", "pb", "onnx",
                       "torchscript")) -> list:
    """Run the export/predict/val matrix; returns rows of
    [format, status, size_mb, metric, inference_ms]."""
    from ultralytics_pro_tpu.engine.exporter import AutoBackend
    from ultralytics_pro_tpu.engine.model import Model

    m = model if isinstance(model, Model) else Model(model)
    if m.model.variables is None:
        m.model.init_params(imgsz=imgsz)

    rows = []
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    for fmt in formats:
        t0 = time.time()
        try:
            if fmt == "-":  # native flax path
                r = m.predict(img, imgsz=imgsz)[0]
                infer_ms = r.speed["inference"]
                size_mb = None
            else:
                out = m.export(format=fmt, imgsz=imgsz, batch=1, name=f"/tmp/upt_bench/{Path(str(model)).stem}")
                size_mb = Path(out).stat().st_size / 1e6
                backend = AutoBackend(out)
                x = rng.integers(0, 255, (1, imgsz, imgsz, 3), dtype=np.uint8)
                backend(x)  # warmup/compile
                t1 = time.perf_counter()
                backend(x)
                infer_ms = (time.perf_counter() - t1) * 1e3
            metric = None
            if data is not None:
                metrics = m.val(data=data, imgsz=imgsz, batch=4)
                metric = metrics.box.map50 if hasattr(metrics, "box") else metrics.fitness
                if isinstance(verbose, float):
                    assert metric >= verbose, f"{fmt}: metric {metric:.3f} < floor {verbose}"
            rows.append([fmt, "PASS", size_mb, metric, round(infer_ms, 2)])
        except Exception as e:
            if verbose is True:
                raise
            rows.append([fmt, f"FAIL: {type(e).__name__}", None, None, None])
        LOGGER.info(f"benchmark {fmt}: {rows[-1]} ({time.time() - t0:.1f}s)")
    header = ["format", "status", "size_MB", "metric", "inference_ms"]
    LOGGER.info(" | ".join(header))
    for r in rows:
        LOGGER.info(" | ".join(str(x) for x in r))
    return rows


class ProfileModels:
    """Timing profiles across model configs (reference ProfileModels:370)."""

    def __init__(self, paths, imgsz: int = 640, num_timed_runs: int = 20):
        self.paths = paths
        self.imgsz = imgsz
        self.num_timed_runs = num_timed_runs

    def run(self):
        import jax
        import jax.numpy as jnp

        from ultralytics_pro_tpu.nn.tasks import DetectionModel

        rows = []
        for p in self.paths:
            m = DetectionModel(p)
            v = m.init_params(imgsz=self.imgsz)
            n_params = sum(int(x.size) for x in jax.tree.leaves(v["params"]))
            fn = jax.jit(lambda v, x: m.apply(v, x, train=False)[0])
            x = jnp.zeros((1, self.imgsz, self.imgsz, 3))
            jax.block_until_ready(fn(v, x))
            t0 = time.perf_counter()
            for _ in range(self.num_timed_runs):
                out = fn(v, x)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / self.num_timed_runs * 1e3
            rows.append({"model": str(p), "params": n_params, "mean_ms": round(ms, 2)})
            LOGGER.info(str(rows[-1]))
        return rows
