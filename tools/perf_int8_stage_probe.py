"""Round-5 probe: stage breakdown of the chain-int8 serving path.

After the head-tower extension (quantize_chain head plan) the e2e int8 path
is: folded-preproc stem -> 22-layer carried-int8 backbone+neck -> int8 Detect
towers -> f32 logits/decode -> fused select -> Pallas greedy NMS. This probe
times nested prefixes of that pipeline to locate the remaining cost:

  feats      chain apply through the head towers (raw maps summed)
  decode     + decode_single_label
  select     + conf-mask, top_k(1024), candidate gather
  nms        + pallas_greedy_nms + final gather (full e2e)

Usage: python tools/perf_int8_stage_probe.py   (real TPU)
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

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", "640"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def main():
    import jax
    import jax.numpy as jnp

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()

    from ultralytics_pro_tpu.nn.fuse import fold_preproc_into_stem
    from ultralytics_pro_tpu.nn.modules.head import decode_single_label
    from ultralytics_pro_tpu.nn.quantize_chain import (chain_quantized_apply,
                                                       quantize_model_chain)
    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.ops.boxes import xywh2xyxy
    from ultralytics_pro_tpu.ops.nms import non_max_suppression_fused

    model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
    v = fold_preproc_into_stem(model.init_params(imgsz=IMGSZ))
    nc = model.nc
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))

    plan, rest_qt = quantize_model_chain(model, v, [u8[:8].astype(jnp.bfloat16)])
    assert plan is not None and plan.get("head") is not None
    capply = chain_quantized_apply(model, plan, rest_qt)

    def feats(x):
        _, aux = capply(v, x.astype(jnp.bfloat16), train=False)
        return sum(t.astype(jnp.float32).sum() for t in aux["feats"])

    def decode(x):
        _, aux = capply(v, x.astype(jnp.bfloat16), train=False)
        b4, cf, cl = decode_single_label(aux["feats"], model.stride, nc)
        return b4.sum() + cf.sum() + cl.astype(jnp.float32).sum()

    def select(x):
        _, aux = capply(v, x.astype(jnp.bfloat16), train=False)
        b4, cf, cl = decode_single_label(aux["feats"], model.stride, nc)

        def sel(boxes_i, conf_i, cls_i):
            masked = jnp.where(conf_i > 0.25, conf_i, -1.0)
            ts, idx = jax.lax.top_k(masked, 1024)
            return xywh2xyxy(boxes_i[idx]).sum() + ts.sum() + cls_i[idx].astype(jnp.float32).sum()

        return jax.vmap(sel)(b4, cf, cl).sum()

    def nms(x):
        _, aux = capply(v, x.astype(jnp.bfloat16), train=False)
        b4, cf, cl = decode_single_label(aux["feats"], model.stride, nc)
        out = non_max_suppression_fused(b4, cf, cl, conf_thres=0.25,
                                        iou_thres=0.45, max_det=300, max_nms=1024)
        return out["scores"].sum().astype(jnp.float32)

    def timed(fn, x):
        chain = jax.jit(lambda xx: jax.lax.fori_loop(
            0, ITERS, lambda i, c: fn(xx + (c * 0).astype(jnp.uint8)) + c * 0,
            jnp.float32(0)))
        trivial = jax.jit(lambda t: t + 1.0)
        float(np.asarray(chain(x)))
        float(np.asarray(trivial(jnp.float32(1.0))))
        t0 = time.perf_counter()
        for _ in range(3):
            float(np.asarray(trivial(jnp.float32(2.0))))
        rtt = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        float(np.asarray(chain(x)))
        return max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS

    prev = 0.0
    for name, fn in [("feats", feats), ("decode", decode),
                     ("select", select), ("nms", nms)]:
        dt = timed(fn, u8)
        print(json.dumps({"stage": name, "ms_per_batch": round(dt * 1e3, 2),
                          "stage_delta_ms": round((dt - prev) * 1e3, 2),
                          "imgs_per_sec": round(BATCH / dt, 1)}), flush=True)
        prev = dt


if __name__ == "__main__":
    main()
