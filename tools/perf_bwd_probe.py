"""Locate the backward-pass cost: model-only grad vs loss grad vs BN variance.

After the one-hot gather fix the train step is backward-bound (bs128:
fwd+loss 1409 imgs/s vs fwd+bwd 331). This probe isolates:
  (a) grad of sum(feats)      — model backward only, no criterion
  (b) grad of loss            — + criterion backward
  (c) both with use_fast_variance=True (one-pass BN statistics)

Run: python tools/perf_bwd_probe.py
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

IMGSZ = int(os.environ.get("BENCH_IMGSZ", "640"))
ITERS = int(os.environ.get("BENCH_TRAIN_ITERS", "8"))
BATCH = int(os.environ.get("BENCH_BATCH", "128"))


def main():
    import jax
    import jax.numpy as jnp

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()

    from ultralytics_pro_tpu.engine.trainer import DetectionTrainer
    from ultralytics_pro_tpu.nn.modules.conv import BN_FAST_VARIANCE
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    rng = np.random.default_rng(0)
    batch = BATCH
    max_gt, n_gt = 32, 8
    cls = np.zeros((batch, max_gt), np.float32)
    cls[:, :n_gt] = rng.integers(0, 80, (batch, n_gt))
    wh = rng.uniform(0.05, 0.4, (batch, max_gt, 2)).astype(np.float32)
    cxy = rng.uniform(0.2, 0.8, (batch, max_gt, 2)).astype(np.float32)
    db = {
        "img": jnp.asarray(rng.integers(0, 255, (batch, IMGSZ, IMGSZ, 3), dtype=np.uint8)),
        "cls": jnp.asarray(cls),
        "bboxes": jnp.asarray(np.concatenate([cxy, wh], -1)),
        "mask_gt": jnp.asarray(np.arange(max_gt)[None] < n_gt).repeat(batch, 0),
    }

    def timed(run, *args):
        float(np.asarray(run(*args)))
        t0 = time.perf_counter()
        float(np.asarray(run(*args)))
        dt = time.perf_counter() - t0
        return round(batch * ITERS / dt, 1)

    for fast_bn in (False, True):
        BN_FAST_VARIANCE[0] = fast_bn
        model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
        model.init_params(imgsz=IMGSZ)
        tr = DetectionTrainer(model, {"batch": batch, "imgsz": IMGSZ,
                                      "save_dir": "/tmp/train_probe"})
        criterion = tr.criterion()
        module = model.module
        params = model.variables["params"]
        bstats = model.variables["batch_stats"]

        def feats_loss(params, img):
            x = img[..., ::-1].astype(jnp.float32) / 255.0
            preds, upd = module.apply({"params": params, "batch_stats": bstats},
                                      x, train=True, mutable=["batch_stats"])
            return sum(f.astype(jnp.float32).sum() for f in preds["feats"])

        def full_loss(params, img):
            x = img[..., ::-1].astype(jnp.float32) / 255.0
            preds, upd = module.apply({"params": params, "batch_stats": bstats},
                                      x, train=True, mutable=["batch_stats"])
            total, _ = criterion(preds, db, (IMGSZ, IMGSZ))
            return total

        def chain_grad(loss_fn):
            @jax.jit
            def run(params, img):
                def body(i, carry):
                    g = jax.grad(loss_fn)(params, img + (carry * 0).astype(jnp.uint8))
                    return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                               for l in jax.tree.leaves(g)) * 0 + carry * 0 + 1
                return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
            return run

        r_model = timed(chain_grad(feats_loss), params, db["img"])
        r_full = timed(chain_grad(full_loss), params, db["img"])
        print(json.dumps({"fast_bn": fast_bn, "batch": batch,
                          "grad_model_only_imgs_s": r_model,
                          "grad_full_loss_imgs_s": r_full}), flush=True)
    BN_FAST_VARIANCE[0] = False


if __name__ == "__main__":
    main()
