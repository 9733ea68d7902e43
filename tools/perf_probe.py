"""TPU perf probes (round 2): RT-DETR MSDA kernel paths + preproc dtype.

Runs on the real chip (axon). Uses the chained-fori_loop timing method from
bench.py (block_until_ready is a no-op through the tunnel).

  PYTHONPATH=/root/.axon_site:/root/repo python tools/perf_probe.py [probe...]
  probes: rtdetr yolov8s_preproc
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def timed_chain(fn, variables, img, iters):
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
    return max(time.perf_counter() - t0 - rtt, 1e-9)


def probe_rtdetr():
    """rtdetr-l e2e forward: Pallas MSDA kernel vs XLA gather."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    batch, imgsz, iters = 16, 640, 10
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))
    for flag in ("0", "1"):
        os.environ["MSDA_PALLAS"] = flag
        model = DetectionModel("rtdetr-l.yaml", dtype=jnp.bfloat16)
        variables = model.init_params(imgsz=imgsz)

        def fwd(v, x):
            xf = x[..., ::-1].astype(jnp.float32) / 255.0
            y, _ = model.module.apply(v, xf, train=False)
            return y.sum().astype(jnp.float32)

        dt = timed_chain(fwd, variables, img, iters)
        print(json.dumps({"probe": "rtdetr-l-640 fwd", "msda_pallas": flag,
                          "imgs_per_sec": round(batch * iters / dt, 1)}))


def probe_yolov8s_preproc():
    """yolov8s e2e: f32 vs bf16 preprocess intermediate (HBM traffic)."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.ops.nms import non_max_suppression

    batch, imgsz, iters = 128, 640, 12
    model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
    variables = model.init_params(imgsz=imgsz)
    nc = model.nc
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))

    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        def e2e(v, x, dt=dt):
            xf = x[..., ::-1].astype(dt) / dt(255.0)
            y, _ = model.module.apply(v, xf, train=False)
            out = non_max_suppression(y[..., :4], y[..., 4:4 + nc], conf_thres=0.25,
                                      iou_thres=0.45, max_det=300, max_nms=1024)
            return out["scores"].sum().astype(jnp.float32)

        t = timed_chain(e2e, variables, img, iters)
        print(json.dumps({"probe": "yolov8s-640 e2e", "preproc": dt_name,
                          "imgs_per_sec": round(batch * iters / t, 1)}))


if __name__ == "__main__":
    which = sys.argv[1:] or ["rtdetr", "yolov8s_preproc"]
    if "rtdetr" in which:
        probe_rtdetr()
    if "yolov8s_preproc" in which:
        probe_yolov8s_preproc()
