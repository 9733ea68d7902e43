"""Old concat-score NMS path vs fused single-label postprocess, same process.

  python tools/perf_fused_post_probe.py
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
    from ultralytics_pro_tpu.ops.nms import non_max_suppression, non_max_suppression_fused

    model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
    v = fold_preproc_into_stem(model.init_params(imgsz=IMGSZ))
    nc = model.nc

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))

    def fwd_only(x):
        y, aux = model.module.apply(v, x.astype(jnp.bfloat16), train=False)
        s = sum(t.astype(jnp.float32).sum() for t in aux["feats"])
        return s

    def old(x):
        y, _ = model.module.apply(v, x.astype(jnp.bfloat16), train=False)
        out = non_max_suppression(y[..., :4], y[..., 4:4 + nc], conf_thres=0.25,
                                  iou_thres=0.45, max_det=300, max_nms=1024)
        return out["scores"].sum().astype(jnp.float32)

    def fused(x):
        y, aux = model.module.apply(v, x.astype(jnp.bfloat16), train=False)
        b4, cf, cl = decode_single_label(aux["feats"], model.stride, nc)
        out = non_max_suppression_fused(b4, cf, cl, conf_thres=0.25,
                                        iou_thres=0.45, max_det=300, max_nms=1024)
        return out["scores"].sum().astype(jnp.float32)

    for name, fn in [("fwd_raw_only", fwd_only), ("old_concat_nms", old), ("fused_post", fused)]:
        dt = timed(fn, u8)
        print(json.dumps({"case": name, "ms": round(dt * 1e3, 2),
                          "imgs_per_sec": round(BATCH / dt, 1)}), flush=True)


if __name__ == "__main__" and os.environ.get("INT8") != "1":
    main()


def int8_case():
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()

    from ultralytics_pro_tpu.nn.fuse import fold_preproc_into_stem
    from ultralytics_pro_tpu.nn.modules.head import decode_single_label
    from ultralytics_pro_tpu.nn.quantize import (build_qtable, collect_conv_stats,
                                                 quantized_apply)
    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.ops.nms import non_max_suppression_fused

    model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
    v = fold_preproc_into_stem(model.init_params(imgsz=IMGSZ))
    nc = model.nc

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))
    calib = u8[:8].astype(jnp.bfloat16)
    stats = collect_conv_stats(model.module, v, [calib])
    qt = build_qtable(v, stats)
    print(json.dumps({"quantized_convs": len(qt)}), flush=True)
    qapply = quantized_apply(model.module, qt)

    def fused_q(x):
        y, aux = qapply(v, x.astype(jnp.bfloat16), train=False)
        b4, cf, cl = decode_single_label(aux["feats"], model.stride, nc)
        out = non_max_suppression_fused(b4, cf, cl, conf_thres=0.25,
                                        iou_thres=0.45, max_det=300, max_nms=1024)
        return out["scores"].sum().astype(jnp.float32)

    def raw_q(x):
        y, aux = qapply(v, x.astype(jnp.bfloat16), train=False)
        return sum(t.astype(jnp.float32).sum() for t in aux["feats"])

    for name, fn in [("int8_fwd_raw", raw_q), ("int8_fused_e2e", fused_q)]:
        dt = timed(fn, u8)
        print(json.dumps({"case": name, "ms": round(dt * 1e3, 2),
                          "imgs_per_sec": round(BATCH / dt, 1)}), flush=True)


if os.environ.get("INT8") == "1":
    int8_case()
