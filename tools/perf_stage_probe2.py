"""Stage probe v2 (round 3): fixes two measurement bugs in perf_stage_probe.py
that inflated the early-prefix rows of the round-2 stage table:

1. prefix models were terminated by a Classify head whose 1280-channel 1x1
   conv is NOT negligible at early-stage resolutions (at 160^2 it writes an
   8.4 GB/batch map — it WAS the "stem+P2 = 43%" row);
2. the rtt calibration timed the trivial fn's own compile (~1s/3 amortized),
   over-subtracting ~300 ms from every measurement.

v2: prefixes end in a cheap .sum() (or a 32-ch 1x1 per level), preprocessing
is the production folded path (raw uint8 in), trivial is warmed before rtt,
and per-iter cost comes from the (100-iter - 20-iter) difference so rtt
cancels exactly.

  python tools/perf_stage_probe2.py
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

V8 = {
    "backbone": [
        [-1, 1, "Conv", [64, 3, 2]], [-1, 1, "Conv", [128, 3, 2]],
        [-1, 3, "C2f", [128, True]], [-1, 1, "Conv", [256, 3, 2]],
        [-1, 6, "C2f", [256, True]], [-1, 1, "Conv", [512, 3, 2]],
        [-1, 6, "C2f", [512, True]], [-1, 1, "Conv", [1024, 3, 2]],
        [-1, 3, "C2f", [1024, True]], [-1, 1, "SPPF", [1024, 5]],
    ],
    "neck": [
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 6], 1, "Concat", [1]], [-1, 3, "C2f", [512]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 4], 1, "Concat", [1]], [-1, 3, "C2f", [256]],
        [-1, 1, "Conv", [256, 3, 2]], [[-1, 12], 1, "Concat", [1]],
        [-1, 3, "C2f", [512]], [-1, 1, "Conv", [512, 3, 2]],
        [[-1, 9], 1, "Concat", [1]], [-1, 3, "C2f", [1024]],
    ],
}


def timed(fn, x):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def mk(iters):
        @jax.jit
        def chain(x):
            def body(i, carry):
                return fn(x + (carry > 1e30).astype(x.dtype)) + carry * 0
            return lax.fori_loop(0, iters, body, jnp.float32(0))
        return chain

    c20, c100 = mk(20), mk(100)
    float(np.asarray(c20(x)))
    float(np.asarray(c100(x)))

    def one(c):
        t0 = time.perf_counter()
        float(np.asarray(c(x)))
        return time.perf_counter() - t0

    t20 = min(one(c20) for _ in range(2))
    t100 = min(one(c100) for _ in range(2))
    return (t100 - t20) / 80


def main():
    import jax
    import jax.numpy as jnp

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()

    from ultralytics_pro_tpu.nn.fuse import fold_preproc_into_stem
    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.ops.nms import non_max_suppression

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))

    scales = {"s": [0.33, 0.50, 1024]}

    def prefix_model(layers, outs):
        """Build a DetectionModel-style trunk ended by 32-ch 1x1 convs."""
        head = [[o, 1, "Conv", [64, 1, 1]] for o in outs]
        cfg = {"nc": 80, "scale": "s", "scales": scales,
               "backbone": layers, "head": head}
        m = DetectionModel(cfg, dtype=jnp.bfloat16)
        v = fold_preproc_into_stem(m.init_params(imgsz=IMGSZ))

        def fwd(x, m=m, v=v):
            y = m.module.apply(v, x.astype(jnp.bfloat16), train=False)
            y = y[0] if isinstance(y, tuple) else y
            ys = y if isinstance(y, (list, tuple)) else [y]
            return sum(t.astype(jnp.float32).sum() for t in ys)
        return fwd

    rows = {}
    specs = {
        "stem_p2": (V8["backbone"][:2], [-1]),
        "backbone_p3": (V8["backbone"][:5], [-1]),
        "backbone_full": (V8["backbone"], [-1]),
        "backbone_neck": (V8["backbone"] + V8["neck"], [15, 18, 21]),
    }
    for name, (layers, outs) in specs.items():
        dt = timed(prefix_model(layers, outs), u8)
        rows[name] = dt
        print(json.dumps({"stage": name, "ms_per_batch": round(dt * 1e3, 2),
                          "imgs_per_sec": round(BATCH / dt, 1)}), flush=True)

    model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
    v = fold_preproc_into_stem(model.init_params(imgsz=IMGSZ))
    nc = model.nc

    def full_fwd(x):
        y, _ = model.module.apply(v, x.astype(jnp.bfloat16), train=False)
        return y.astype(jnp.float32).sum()

    def full_nms(x):
        y, _ = model.module.apply(v, x.astype(jnp.bfloat16), train=False)
        out = non_max_suppression(y[..., :4], y[..., 4:4 + nc], conf_thres=0.25,
                                  iou_thres=0.45, max_det=300, max_nms=1024)
        return out["scores"].sum().astype(jnp.float32)

    for name, fn in [("full_fwd_decode", full_fwd), ("full_e2e_nms", full_nms)]:
        dt = timed(fn, u8)
        rows[name] = dt
        print(json.dumps({"stage": name, "ms_per_batch": round(dt * 1e3, 2),
                          "imgs_per_sec": round(BATCH / dt, 1)}), flush=True)

    total = rows["full_e2e_nms"]
    deltas = {
        "stem+p2": rows["stem_p2"],
        "p2->p3": rows["backbone_p3"] - rows["stem_p2"],
        "p3->sppf": rows["backbone_full"] - rows["backbone_p3"],
        "neck": rows["backbone_neck"] - rows["backbone_full"],
        "head towers+decode": rows["full_fwd_decode"] - rows["backbone_neck"],
        "nms": rows["full_e2e_nms"] - rows["full_fwd_decode"],
    }
    for k, dt in deltas.items():
        print(json.dumps({"delta": k, "ms": round(dt * 1e3, 2),
                          "share_pct": round(100 * dt / total, 1)}), flush=True)


if __name__ == "__main__":
    main()
