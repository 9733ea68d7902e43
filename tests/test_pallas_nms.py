"""Pallas NMS kernel: interpret-mode exact agreement with the XLA greedy loop."""

import numpy as np


def test_pallas_nms_matches_xla():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.kernels.nms_pallas import pallas_greedy_nms
    from ultralytics_pro_tpu.ops.nms import _greedy_nms_scores

    rng = np.random.default_rng(0)
    B, K, MD = 3, 256, 64
    boxes = rng.uniform(0, 200, (B, K, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 60, (B, K, 2)).astype(np.float32)
    scores = np.where(rng.uniform(0, 1, (B, K)) > 0.3,
                      rng.uniform(0, 1, (B, K)), -1).astype(np.float32)
    ki, kv = pallas_greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                               max_det=MD, iou_thres=0.5, interpret=True)
    for i in range(B):
        ri, rv = _greedy_nms_scores(jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.5, MD)
        np.testing.assert_array_equal(np.asarray(ki[i]), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(kv[i]), np.asarray(rv))
