"""Round-3 perf probe: per-level NHWC decode vs the concat-then-decode seam.

The round-2 stage breakdown blamed ~49% of e2e time on neck+head+decode. The
current Detect._decode flattens all three levels to one (B, 8400, 144) tensor
and runs DFL + sigmoid in f32 — at bs128 that materializes ~1 GB of f32
intermediates purely for decode. Variant B decodes EACH level in its native
NHWC layout (DFL softmax-expectation + dist2bbox fused into the tower's conv
epilogue by XLA) and keeps the class sigmoid in bf16, concatenating only the
final (B, A, 4+nc) result.

Usage: PYTHONPATH=/root/repo python tools/perf_decode_probe.py
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
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def main():
    import jax

    assert any("TPU" in str(d) for d in jax.devices()), (
        f"probe requires the TPU backend, got {jax.devices()}")
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.fuse import fold_preproc_into_stem
    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.ops.nms import non_max_suppression
    from ultralytics_pro_tpu.ops.anchors import dist2bbox, make_anchors

    model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
    variables = model.init_params(imgsz=IMGSZ)
    variables = fold_preproc_into_stem(variables)
    nc = model.nc
    reg_max = 16
    strides = (8, 16, 32)

    def fwd_raw(variables, img_u8):
        """Forward returning (decoded, raw per-level maps). The consumer picks
        one; XLA dead-code-eliminates the other path."""
        x = img_u8.astype(jnp.bfloat16)
        y, aux = model.module.apply(variables, x, train=False)
        return y, aux["feats"]

    def decode_A(raw):
        """Current: concat levels -> f32 DFL -> dist2bbox (head.py:_decode)."""
        b = raw[0].shape[0]
        shapes = [(r.shape[1], r.shape[2]) for r in raw]
        anchors, stride_t = make_anchors(shapes, strides, 0.5, dtype=jnp.float32)
        flat = jnp.concatenate([r.reshape(b, -1, 4 * reg_max + nc) for r in raw], 1)
        box, cls = jnp.split(flat, [4 * reg_max], axis=-1)
        x = box.astype(jnp.float32).reshape(b, -1, 4, reg_max)
        dist = (jax.nn.softmax(x, -1) @ jnp.arange(reg_max, dtype=jnp.float32))
        dbox = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
        return jnp.concatenate([dbox, jax.nn.sigmoid(cls.astype(jnp.float32))], -1)

    def decode_B(raw):
        """Per-level NHWC decode, bf16 sigmoid, late concat of small outputs."""
        b = raw[0].shape[0]
        outs = []
        for r, s in zip(raw, strides):
            h, w = r.shape[1], r.shape[2]
            box = r[..., :4 * reg_max].reshape(b, h, w, 4, reg_max)
            probs = jax.nn.softmax(box.astype(jnp.float32), -1)
            dist = probs @ jnp.arange(reg_max, dtype=jnp.float32)  # (B,H,W,4)
            ax = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, None, :]
            ay = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None, :, None]
            x1 = ax - dist[..., 0]
            y1 = ay - dist[..., 1]
            x2 = ax + dist[..., 2]
            y2 = ay + dist[..., 3]
            dbox = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1) * s
            cls = jax.nn.sigmoid(r[..., 4 * reg_max:])  # bf16
            outs.append(jnp.concatenate(
                [dbox.reshape(b, h * w, 4),
                 cls.reshape(b, h * w, nc).astype(jnp.float32)], -1))
        return jnp.concatenate(outs, 1)

    def e2e(decode):
        def run(variables, img_u8):
            y0, raw = fwd_raw(variables, img_u8)
            y = y0 if decode is None else decode(raw)
            return non_max_suppression(y[..., :4], y[..., 4:4 + nc], conf_thres=0.25,
                                       iou_thres=0.45, max_det=300, max_nms=1024)
        return run

    def timed(run):
        @jax.jit
        def chain(variables, img_u8):
            def body(i, carry):
                x = img_u8 + (carry * 0).astype(jnp.uint8)
                out = run(variables, x)
                return out["scores"].sum().astype(jnp.float32) + carry * 0
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        @jax.jit
        def trivial(x):
            return x + 1.0

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))
        float(np.asarray(chain(variables, img)))
        float(np.asarray(trivial(jnp.float32(1.0))))
        t0 = time.perf_counter()
        for _ in range(3):
            float(np.asarray(trivial(jnp.float32(2.0))))
        rtt = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        float(np.asarray(chain(variables, img)))
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        return BATCH * ITERS / dt

    # numeric agreement first (tiny batch)
    rng = np.random.default_rng(1)
    small = jnp.asarray(rng.integers(0, 255, (2, IMGSZ, IMGSZ, 3), dtype=np.uint8))
    _, raw = fwd_raw(variables, small)
    ya = np.asarray(decode_A(raw))
    yb = np.asarray(decode_B(raw))
    err = np.abs(ya - yb).max()
    print(json.dumps({"check": "decode A vs B max abs err", "value": float(err)}))

    for name, dec in (("A_model_builtin", None), ("B_per_level_nhwc", decode_B)):
        r = timed(e2e(dec))
        print(json.dumps({"variant": name, "imgs_per_sec": round(r, 1)}))


if __name__ == "__main__":
    main()
