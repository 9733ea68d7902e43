"""Decompose the train-step forward cost: module fwd vs criterion vs TAL.

perf_train_probe (round 4) showed fwd+loss at bs32 = 169 img/s while the
same model's inference forward runs ~1,100 img/s — the gap lives in
train-mode forward (BN stats) and/or the loss/assigner. This probe times
each in isolation on the chip:

  (a) eval-mode forward            (baseline)
  (b) train-mode forward, no loss  (BN batch-stats cost)
  (c) criterion on frozen preds    (loss + TAL cost)
  (d) TAL assigner alone           (assignment cost)

Run from /root/repo (axon plugin rides the default PYTHONPATH):
    python tools/perf_loss_probe.py
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
BATCH = int(os.environ.get("BENCH_BATCH", "32"))


def main():
    import jax
    import jax.numpy as jnp

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()

    from ultralytics_pro_tpu.engine.trainer import DetectionTrainer
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    batch = BATCH
    model = DetectionModel("yolov8s.yaml", dtype=jnp.bfloat16)
    model.init_params(imgsz=IMGSZ)
    tr = DetectionTrainer(model, {"batch": batch, "imgsz": IMGSZ,
                                  "save_dir": "/tmp/train_probe"})
    criterion = tr.criterion()
    module = model.module
    params = model.variables["params"]
    bstats = model.variables["batch_stats"]

    rng = np.random.default_rng(0)
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

    def chain(fn, *args):
        """fori_loop-chained timing: forces ITERS sequential executions."""
        @jax.jit
        def run(*a):
            def body(i, carry):
                out = fn(carry, *a)
                return out.astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
        return run

    def timed(run, *args):
        float(np.asarray(run(*args)))  # compile
        t0 = time.perf_counter()
        float(np.asarray(run(*args)))
        dt = time.perf_counter() - t0
        return batch * ITERS / dt

    # (a) eval forward
    def eval_fwd(carry, params, bstats, img):
        x = (img + (carry * 0).astype(jnp.uint8))[..., ::-1].astype(jnp.float32) / 255.0
        y, _ = module.apply({"params": params, "batch_stats": bstats}, x, train=False)
        return y.astype(jnp.float32).sum() * 0 + carry * 0

    r_eval = timed(chain(eval_fwd), params, bstats, db["img"])

    # (b) train-mode forward only (BN batch stats, no loss)
    def train_fwd(carry, params, bstats, img):
        x = (img + (carry * 0).astype(jnp.uint8))[..., ::-1].astype(jnp.float32) / 255.0
        preds, upd = module.apply({"params": params, "batch_stats": bstats}, x,
                                  train=True, mutable=["batch_stats"])
        s = sum(f.astype(jnp.float32).sum() for f in preds["feats"])
        return s * 0 + carry * 0

    r_train_fwd = timed(chain(train_fwd), params, bstats, db["img"])

    # frozen preds for (c)/(d)
    x0 = db["img"][..., ::-1].astype(jnp.float32) / 255.0
    preds0, _ = jax.jit(lambda p, b, x: module.apply(
        {"params": p, "batch_stats": b}, x, train=True, mutable=["batch_stats"]))(
        params, bstats, x0)
    feats0 = [jax.device_put(f) for f in preds0["feats"]]

    # (c) criterion alone
    def loss_only(carry, f0, f1, f2):
        feats = [f0 + carry.astype(f0.dtype) * 0, f1, f2]
        total, parts = criterion({"feats": feats}, db, (IMGSZ, IMGSZ))
        return total.astype(jnp.float32) + carry * 0

    r_loss = timed(chain(loss_only), *feats0)

    # (d) TAL alone on frozen scores/boxes
    from ultralytics_pro_tpu.ops.anchors import make_anchors

    pred_distri, pred_scores = criterion.flatten_preds(feats0)
    anchor_points, stride_tensor = make_anchors(
        [(f.shape[1], f.shape[2]) for f in feats0], criterion.strides, 0.5)
    pred_bboxes = criterion.bbox_decode(anchor_points, pred_distri)
    scores_sig = jax.nn.sigmoid(pred_scores)
    gt_labels, gt_bboxes, mask_gt = jax.jit(criterion.gt_to_pixels, static_argnums=1)(
        db, (IMGSZ, IMGSZ))

    def tal_only(carry, scores, boxes):
        assign = criterion.assigner(
            scores + carry.astype(scores.dtype) * 0, boxes * stride_tensor,
            anchor_points * stride_tensor, gt_labels, gt_bboxes, mask_gt)
        return assign.target_scores.astype(jnp.float32).sum() + carry * 0

    r_tal = timed(chain(tal_only), scores_sig, pred_bboxes)

    print(json.dumps({
        "batch": batch, "imgsz": IMGSZ,
        "eval_fwd_imgs_s": round(r_eval, 1),
        "train_fwd_imgs_s": round(r_train_fwd, 1),
        "criterion_imgs_s": round(r_loss, 1),
        "tal_imgs_s": round(r_tal, 1),
    }))


if __name__ == "__main__":
    main()
