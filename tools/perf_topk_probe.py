"""Round-3 perf probe: NMS candidate-selection top_k vs approx_max_k.

The corrected stage table (tools/perf_stage_probe2.py) attributes the 4.4 ms
NMS stage (~10% of e2e at bs128) mostly to top_k+gather scheduling, not score
traffic. TPU has a hardware-accelerated partial-reduction top-k
(jax.lax.approx_max_k, the MIPS paper op) that avoids the full sort
lax.top_k lowers to. This probe measures the e2e pipeline with:

  A) lax.top_k (current)
  B) lax.approx_max_k recall_target=0.95
  C) lax.approx_max_k recall_target=0.99

Candidate-selection recall below rank ~300 (max_det) is irrelevant to the
final detections in practice; B/C only reorder/miss tail candidates of the
1024-candidate pool. tests/test_nms.py::test_approx_topk_agreement checks the
kept top-300 detections agree on realistic score distributions.

Usage: python tools/perf_topk_probe.py   (requires the real TPU chip)
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

    assert any("TPU" in str(d) for d in jax.devices()), (
        f"probe requires the TPU backend, got {jax.devices()}")
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.fuse import fold_preproc_into_stem
    from ultralytics_pro_tpu.nn.modules.head import decode_single_label
    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.ops.nms import non_max_suppression_fused

    model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
    variables = model.init_params(imgsz=IMGSZ)
    variables = fold_preproc_into_stem(variables)
    nc = model.nc

    def make_e2e(approx):
        def e2e(variables, img_u8):
            x = img_u8.astype(jnp.bfloat16)
            y, aux = model.module.apply(variables, x, train=False)
            b4, cf, cl = decode_single_label(aux["feats"], model.stride, nc)
            return non_max_suppression_fused(
                b4, cf, cl, conf_thres=0.25, iou_thres=0.45, max_det=300,
                max_nms=1024, approx_topk=approx)

        @jax.jit
        def chain(variables, img_u8):
            def body(i, carry):
                x = img_u8 + (carry * 0).astype(jnp.uint8)
                out = e2e(variables, x)
                return out["scores"].sum().astype(jnp.float32) + carry * 0

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        return chain

    @jax.jit
    def trivial(x):
        return x + 1.0

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))

    float(np.asarray(trivial(jnp.float32(1.0))))
    t0 = time.perf_counter()
    for _ in range(3):
        float(np.asarray(trivial(jnp.float32(2.0))))
    rtt = (time.perf_counter() - t0) / 3

    results = {}
    for label, approx in (("top_k", None), ("approx_0.95", 0.95), ("approx_0.99", 0.99)):
        chain = make_e2e(approx)
        float(np.asarray(chain(variables, img)))  # compile+warm
        t0 = time.perf_counter()
        s = float(np.asarray(chain(variables, img)))
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        results[label] = round(BATCH * ITERS / dt, 1)
        print(f"{label}: {results[label]} imgs/s (checksum {s:.1f})")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
