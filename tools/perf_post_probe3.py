"""NMS-stage optimization probe: exact top_k vs approx_max_k vs smaller K,
plus a batch-size sweep of the full e2e.

The round-3 stage table (BASELINE.md) attributes ~10% of e2e time to the NMS
stage and blames top_k+gather scheduling, not score traffic. Candidates:

  cur      top_k(8400 -> 1024) + Pallas greedy NMS        (bench.py today)
  k512     top_k(8400 -> 512)  + Pallas greedy NMS
  approx   lax.approx_max_k(recall ~0.95) -> 1024 + Pallas greedy NMS
  approx5  lax.approx_max_k -> 512

  python tools/perf_post_probe3.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

from perf_stage_probe2 import timed  # noqa: E402

IMGSZ = int(os.environ.get("BENCH_IMGSZ", "640"))


def main():
    import jax
    import jax.numpy as jnp

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()

    from ultralytics_pro_tpu.kernels.nms_pallas import pallas_greedy_nms
    from ultralytics_pro_tpu.nn.fuse import fold_preproc_into_stem
    from ultralytics_pro_tpu.nn.modules.head import decode_single_label
    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.ops.boxes import xywh2xyxy
    from ultralytics_pro_tpu.ops.nms import non_max_suppression_fused

    model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
    v = fold_preproc_into_stem(model.init_params(imgsz=IMGSZ))
    nc = model.nc
    rng = np.random.default_rng(0)

    def mk_e2e(k, approx):
        def e2e(x):
            y, aux = model.module.apply(v, x.astype(jnp.bfloat16), train=False)
            b4, cf, cl = decode_single_label(aux["feats"], model.stride, nc)

            def select(boxes_i, conf_i, cls_i):
                masked = jnp.where(conf_i > 0.25, conf_i, -1.0)
                if approx:
                    top_scores, anchor_idx = jax.lax.approx_max_k(masked, k)
                else:
                    top_scores, anchor_idx = jax.lax.top_k(masked, k)
                return (xywh2xyxy(boxes_i[anchor_idx]), top_scores,
                        cls_i[anchor_idx])

            cb, ts, ci = jax.vmap(select)(b4, cf, cl)
            off = ci.astype(cb.dtype)[..., None] * 7680.0
            keep_idx, keep_valid = pallas_greedy_nms(
                cb + off, ts, max_det=300, iou_thres=0.45)
            sc = jnp.take_along_axis(ts, keep_idx, 1)
            return jnp.where(keep_valid, sc, 0.0).sum().astype(jnp.float32)
        return e2e

    def fwd_only(x):
        y, aux = model.module.apply(v, x.astype(jnp.bfloat16), train=False)
        return sum(t.astype(jnp.float32).sum() for t in aux["feats"])

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    u8 = jnp.asarray(rng.integers(0, 255, (batch, IMGSZ, IMGSZ, 3), dtype=np.uint8))
    results = {}
    for name, fn in [
        ("fwd_only", fwd_only),
        ("cur_topk1024", mk_e2e(1024, False)),
        ("topk512", mk_e2e(512, False)),
        ("approx1024", mk_e2e(1024, True)),
        ("approx512", mk_e2e(512, True)),
    ]:
        dt = timed(fn, u8)
        results[name] = round(batch / dt, 1)
        print(json.dumps({"variant": name, "imgs_per_sec": results[name],
                          "ms_per_batch": round(dt * 1e3, 2)}), flush=True)

    # batch sweep on the current path
    for b in (64, 128, 192, 256):
        try:
            ub = jnp.asarray(rng.integers(0, 255, (b, IMGSZ, IMGSZ, 3), dtype=np.uint8))
            dt = timed(mk_e2e(1024, False), ub)
            print(json.dumps({"variant": f"cur@bs{b}", "imgs_per_sec": round(b / dt, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — OOM etc.
            print(json.dumps({"variant": f"cur@bs{b}", "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
