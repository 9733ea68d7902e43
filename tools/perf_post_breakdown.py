"""Decompose the 5.7 ms postprocess: fused decode / top_k / pallas greedy /
final gather, cumulative over the same forward.

  python tools/perf_post_breakdown.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

from perf_stage_probe2 import timed  # noqa: E402

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", "640"))


def main():
    import jax
    import jax.numpy as jnp

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()

    from ultralytics_pro_tpu.nn.fuse import fold_preproc_into_stem
    from ultralytics_pro_tpu.nn.modules.head import decode_single_label
    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.ops.boxes import xywh2xyxy

    model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
    v = fold_preproc_into_stem(model.init_params(imgsz=IMGSZ))
    nc = model.nc

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))

    def base(x):
        y, aux = model.module.apply(v, x.astype(jnp.bfloat16), train=False)
        return aux["feats"]

    def s_raw(x):
        return sum(t.astype(jnp.float32).sum() for t in base(x))

    def s_decode(x):
        b4, cf, cl = decode_single_label(base(x), model.stride, nc)
        return b4.sum() + cf.sum() + cl.sum()

    def s_topk(x):
        b4, cf, cl = decode_single_label(base(x), model.stride, nc)
        masked = jnp.where(cf > 0.25, cf, -1.0)
        ts, ai = jax.lax.top_k(masked, 1024)
        return ts.sum() + ai.sum()

    def s_gather_cand(x):
        b4, cf, cl = decode_single_label(base(x), model.stride, nc)
        masked = jnp.where(cf > 0.25, cf, -1.0)
        ts, ai = jax.lax.top_k(masked, 1024)
        cb = xywh2xyxy(jnp.take_along_axis(b4, ai[..., None], axis=1))
        ci = jnp.take_along_axis(cl, ai, axis=1)
        return cb.sum() + ts.sum() + ci.astype(jnp.float32).sum()

    def s_pallas(x):
        from ultralytics_pro_tpu.kernels.nms_pallas import pallas_greedy_nms

        b4, cf, cl = decode_single_label(base(x), model.stride, nc)
        masked = jnp.where(cf > 0.25, cf, -1.0)
        ts, ai = jax.lax.top_k(masked, 1024)
        cb = xywh2xyxy(jnp.take_along_axis(b4, ai[..., None], axis=1))
        ci = jnp.take_along_axis(cl, ai, axis=1)
        off = ci.astype(cb.dtype)[..., None] * 7680.0
        ki, kv = pallas_greedy_nms(cb + off, ts, max_det=300, iou_thres=0.45)
        return ki.sum().astype(jnp.float32) + kv.sum().astype(jnp.float32)

    cases = [("raw", s_raw), ("decode", s_decode), ("topk", s_topk),
             ("gather_cand", s_gather_cand), ("pallas_nms", s_pallas)]
    prev = None
    for name, fn in cases:
        dt = timed(fn, u8)
        d = None if prev is None else round((dt - prev) * 1e3, 2)
        prev = dt
        print(json.dumps({"case": name, "ms": round(dt * 1e3, 2), "delta_ms": d}), flush=True)


if __name__ == "__main__" and os.environ.get("EXTRA") != "1":
    main()


def extra_cases():
    """Fusion-boundary isolation: materialize decode outputs (barrier) without
    topk/gather, and topk+gather WITHOUT the box branch."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.fuse import fold_preproc_into_stem
    from ultralytics_pro_tpu.nn.modules.head import decode_single_label
    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    import numpy as np

    model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
    v = fold_preproc_into_stem(model.init_params(imgsz=IMGSZ))
    nc = model.nc
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))

    def base(x):
        y, aux = model.module.apply(v, x.astype(jnp.bfloat16), train=False)
        return aux["feats"]

    def s_decode_barrier(x):
        b4, cf, cl = jax.lax.optimization_barrier(
            decode_single_label(base(x), model.stride, nc))
        return b4.sum() + cf.sum() + cl.astype(jnp.float32).sum()

    def s_topk_gather_confcls(x):
        b4, cf, cl = decode_single_label(base(x), model.stride, nc)
        masked = jnp.where(cf > 0.25, cf, -1.0)
        ts, ai = jax.lax.top_k(masked, 1024)
        ci = jnp.take_along_axis(cl, ai, axis=1)
        return ts.sum() + ci.astype(jnp.float32).sum()

    def s_gather_barrier(x):
        b4, cf, cl = jax.lax.optimization_barrier(
            decode_single_label(base(x), model.stride, nc))
        masked = jnp.where(cf > 0.25, cf, -1.0)
        ts, ai = jax.lax.top_k(masked, 1024)
        cb = jnp.take_along_axis(b4, ai[..., None], axis=1)
        ci = jnp.take_along_axis(cl, ai, axis=1)
        return cb.sum() + ts.sum() + ci.astype(jnp.float32).sum()

    for name, fn in [("decode_barrier", s_decode_barrier),
                     ("topk_gather_confcls", s_topk_gather_confcls),
                     ("gather_after_barrier", s_gather_barrier)]:
        dt = timed(fn, u8)
        print(json.dumps({"case": name, "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__" and os.environ.get("EXTRA") == "1":
    extra_cases()
