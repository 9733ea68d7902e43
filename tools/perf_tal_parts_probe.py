"""Microbench TAL + criterion sub-ops on the chip to find the pathological op.

perf_loss_probe (round 4) pinned the train-step gap to the criterion:
187 ms/batch at bs32 (TAL 128 ms) vs 31.6 ms for the whole eval forward.
This times each TAL stage and each non-TAL criterion piece in isolation.

Run: python tools/perf_tal_parts_probe.py
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

B, G, A, NC, RM = 32, 32, 8400, 80, 16
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    assert any("TPU" in str(d) for d in jax.devices()), jax.devices()

    from ultralytics_pro_tpu.ops.iou import bbox_iou
    from ultralytics_pro_tpu.utils.loss import bce_logits, df_loss
    from ultralytics_pro_tpu.utils.tal import TaskAlignedAssigner, _gather_gt_class_scores

    assigner = TaskAlignedAssigner(topk=10, num_classes=NC, alpha=0.5, beta=6.0)

    rng = np.random.default_rng(0)
    pd_scores = jnp.asarray(rng.uniform(0, 1, (B, A, NC)).astype(np.float32))
    pd_bboxes = jnp.asarray(rng.uniform(0, 640, (B, A, 4)).astype(np.float32))
    gt_labels = jnp.asarray(rng.integers(0, NC, (B, G)).astype(np.int32))
    gt_bboxes = jnp.asarray(rng.uniform(0, 640, (B, G, 4)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (B, G, A)) > 0.5)
    metrics = jnp.asarray(rng.uniform(0, 1, (B, G, A)).astype(np.float32))
    anc = jnp.asarray(rng.uniform(0, 640, (A, 2)).astype(np.float32))
    pred_dist = jnp.asarray(rng.normal(size=(B, A, 4, RM)).astype(np.float32))
    tgt_ltrb = jnp.asarray(rng.uniform(0, RM - 1.01, (B, A, 4)).astype(np.float32))
    tgt_scores = jnp.asarray(rng.uniform(0, 1, (B, A, NC)).astype(np.float32))
    tgi = jnp.asarray(rng.integers(0, G, (B, A)).astype(np.int32))

    def timed(name, fn, *args):
        run = jax.jit(lambda *a: sum_all(fn(*a)))
        float(np.asarray(run(*args)))  # compile
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = run(*args)
        float(np.asarray(r))
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(json.dumps({"op": name, "ms": round(dt, 2)}), flush=True)

    def sum_all(x):
        if isinstance(x, (tuple, list)):
            return sum(jnp.sum(v.astype(jnp.float32)) for v in x)
        if hasattr(x, "_fields"):  # NamedTuple
            return sum(jnp.sum(jnp.asarray(v).astype(jnp.float32)) for v in x)
        return jnp.sum(x.astype(jnp.float32))

    timed("gather_gt_class_scores", _gather_gt_class_scores, pd_scores, gt_labels)
    timed("ciou_bGA", lambda g, p: assigner.iou_calculation(
        g[:, :, None, :], p[:, None, :, :]), gt_bboxes, pd_bboxes)
    timed("candidates_in_gts", assigner.select_candidates_in_gts, anc, gt_bboxes)
    timed("topk_10xargmax", assigner.select_topk_candidates, metrics,
          mask[..., :1])
    timed("highest_overlaps", assigner.select_highest_overlaps,
          metrics * mask, metrics)
    timed("get_targets", assigner.get_targets, gt_labels, gt_bboxes, tgi,
          (metrics.sum(1) > 1).astype(jnp.float32))
    timed("full_assigner", assigner, pd_scores, pd_bboxes, anc, gt_labels,
          gt_bboxes, jnp.ones((B, G), bool))
    timed("bce_bAnc", bce_logits, pd_scores, tgt_scores)
    timed("df_loss", lambda pd, t: df_loss(pd, t, RM), pred_dist, tgt_ltrb)
    timed("ciou_loss_bA", lambda p, t: bbox_iou(p, t, xywh=False, CIoU=True),
          pd_bboxes, pd_bboxes + 1.0)
    timed("softmax_decode", lambda d: jax.nn.softmax(d, -1) @ jnp.arange(
        RM, dtype=jnp.float32), pred_dist)


if __name__ == "__main__":
    main()
