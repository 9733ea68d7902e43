"""Per-stage timing of yolov8s @640 bs128 on the real chip (round 2 perf push).

DEPRECATED — superseded by perf_stage_probe2.py. Two measurement bugs inflate
this probe's early-prefix rows: (1) the Classify-head termination is NOT
negligible at early-stage resolutions (its 1280-ch 1x1 conv at 160^2 writes
an 8.4 GB/batch map and dominated the "stem+p2 = 43%" row); (2) the rtt
calibration timed the trivial fn's own compile. Kept for history.

Builds prefix models (backbone truncations terminated by a 1x1 Classify head)
and times them with the chained-fori method from
bench.py. Stage time = difference between successive prefixes. Also times the
full model with and without decode+NMS.

  PYTHONPATH=/root/repo python tools/perf_stage_probe.py
"""

import json
import os
import sys
import time

# NOTE: do NOT launch with PYTHONPATH — ANY PYTHONPATH value breaks the axon
# TPU plugin init (falls back to CPU silently); scripts self-insert the repo
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", "640"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))

V8_BACKBONE = [
    [-1, 1, "Conv", [64, 3, 2]],     # 0 P1/2
    [-1, 1, "Conv", [128, 3, 2]],    # 1 P2/4
    [-1, 3, "C2f", [128, True]],
    [-1, 1, "Conv", [256, 3, 2]],    # 3 P3/8
    [-1, 6, "C2f", [256, True]],
    [-1, 1, "Conv", [512, 3, 2]],    # 5 P4/16
    [-1, 6, "C2f", [512, True]],
    [-1, 1, "Conv", [1024, 3, 2]],   # 7 P5/32
    [-1, 3, "C2f", [1024, True]],
    [-1, 1, "SPPF", [1024, 5]],      # 9
]


def timed(fn, variables, img, iters=ITERS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(variables, img):
        def body(i, carry):
            x = img + (carry * 0).astype(img.dtype)
            return fn(variables, x) + carry * 0
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    @jax.jit
    def trivial(x):
        return x + 1.0

    float(np.asarray(chain(variables, img)))
    float(np.asarray(trivial(jnp.float32(1.0))))
    t0 = time.perf_counter()
    for _ in range(3):
        float(np.asarray(trivial(jnp.float32(2.0))))
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    float(np.asarray(chain(variables, img)))
    return max(time.perf_counter() - t0 - rtt, 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp

    assert any("TPU" in str(d) for d in jax.devices()), (
        f"probe requires the TPU backend, got {jax.devices()}")

    from ultralytics_pro_tpu.nn.tasks import ClassificationModel, DetectionModel
    from ultralytics_pro_tpu.ops.nms import non_max_suppression

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))

    results = {}
    prefixes = {"stem_p2": 2, "to_p3": 5, "to_p4": 7, "backbone": 10}
    for name, k in prefixes.items():
        cfg = {"nc": 2, "scale": "s",
               "scales": {"s": [0.33, 0.50, 1024]},
               "backbone": V8_BACKBONE[:k],
               "head": [[-1, 1, "Classify", [2]]]}
        m = ClassificationModel(cfg, dtype=jnp.bfloat16)
        v = m.init_params(imgsz=IMGSZ)

        def fwd(v, u8, m=m):
            x = u8[..., ::-1].astype(jnp.float32) / 255.0
            y = m.module.apply(v, x, train=False)
            y = y[0] if isinstance(y, tuple) else y
            return y.astype(jnp.float32).sum()

        dt = timed(fwd, v, img)
        results[name] = dt
        print(json.dumps({"stage": name, "ms_per_batch": round(dt * 1e3, 2),
                          "imgs_per_sec": round(BATCH / dt, 1)}), flush=True)

    m = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
    v = m.init_params(imgsz=IMGSZ)
    nc = m.nc

    def fwd_only(v, u8):
        x = u8[..., ::-1].astype(jnp.float32) / 255.0
        y, _ = m.module.apply(v, x, train=False)
        return y.astype(jnp.float32).sum()

    def fwd_nms(v, u8):
        x = u8[..., ::-1].astype(jnp.float32) / 255.0
        y, _ = m.module.apply(v, x, train=False)
        out = non_max_suppression(y[..., :4], y[..., 4:4 + nc], conf_thres=0.25,
                                  iou_thres=0.45, max_det=300, max_nms=1024)
        return out["scores"].sum().astype(jnp.float32)

    for name, fn in [("full_forward", fwd_only), ("full_e2e_nms", fwd_nms)]:
        dt = timed(fn, v, img)
        results[name] = dt
        print(json.dumps({"stage": name, "ms_per_batch": round(dt * 1e3, 2),
                          "imgs_per_sec": round(BATCH / dt, 1)}), flush=True)

    # stage deltas
    deltas = {
        "stem+p2 (L0-1)": results["stem_p2"],
        "p2->p3 (L2-4)": results["to_p3"] - results["stem_p2"],
        "p3->p4 (L5-6)": results["to_p4"] - results["to_p3"],
        "p4->sppf (L7-9)": results["backbone"] - results["to_p4"],
        "neck+head": results["full_forward"] - results["backbone"],
        "decode+nms": results["full_e2e_nms"] - results["full_forward"],
    }
    total = results["full_e2e_nms"]
    for k, dt in deltas.items():
        print(json.dumps({"delta": k, "ms": round(dt * 1e3, 2),
                          "share_pct": round(100 * dt / total, 1)}), flush=True)


if __name__ == "__main__":
    main()
