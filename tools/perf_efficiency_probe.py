"""Per-stage MXU efficiency: measured ms (perf_stage_probe2 deltas) vs the
stage's XLA cost-analysis FLOPs and HBM bytes, so the perf push targets the
stage with the worst achieved-vs-peak ratio rather than the biggest share.

v5e peak used: 197 bf16 TFLOP/s, 819 GB/s HBM.

  python tools/perf_efficiency_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", "640"))

from perf_stage_probe2 import V8, timed  # noqa: E402


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

    def cost(fn):
        an = jax.jit(fn).lower(u8).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0)), float(an.get("bytes accessed", 0))

    specs = {
        "stem_p2": (V8["backbone"][:2], [-1]),
        "backbone_p3": (V8["backbone"][:5], [-1]),
        "backbone_full": (V8["backbone"], [-1]),
        "backbone_neck": (V8["backbone"] + V8["neck"], [15, 18, 21]),
    }
    rows = {}
    for name, (layers, outs) in specs.items():
        fn = prefix_model(layers, outs)
        f, b = cost(fn)
        dt = timed(fn, u8)
        rows[name] = (dt, f, b)
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2),
                          "gflops": round(f / 1e9, 1), "gbytes": round(b / 1e9, 2)}), flush=True)

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
        f, b = cost(fn)
        dt = timed(fn, u8)
        rows[name] = (dt, f, b)
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2),
                          "gflops": round(f / 1e9, 1), "gbytes": round(b / 1e9, 2)}), flush=True)

    order = ["stem_p2", "backbone_p3", "backbone_full", "backbone_neck",
             "full_fwd_decode", "full_e2e_nms"]
    prev = (0.0, 0.0, 0.0)
    names = ["stem+p2", "p2->p3", "p3->sppf", "neck", "head+decode", "nms"]
    for nm, key in zip(names, order):
        dt, f, b = rows[key]
        ddt, df, db = dt - prev[0], f - prev[1], b - prev[2]
        prev = rows[key]
        flop_eff = (df / max(ddt, 1e-9)) / 197e12
        bw_eff = (db / max(ddt, 1e-9)) / 819e9
        print(json.dumps({"delta": nm, "ms": round(ddt * 1e3, 2),
                          "gflops": round(df / 1e9, 1),
                          "gbytes": round(db / 1e9, 2),
                          "pct_flop_peak": round(100 * flop_eff, 1),
                          "pct_hbm_peak": round(100 * bw_eff, 1)}), flush=True)


if __name__ == "__main__":
    main()
