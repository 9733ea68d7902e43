"""RT-DETR: build, forward shapes, matcher behavior, loss step."""

import numpy as np
import pytest


def test_hungarian_matcher_prefers_overlap():
    import jax.numpy as jnp

    from ultralytics_pro_tpu.utils.detr_loss import HungarianMatcher

    # 2 gts, 4 queries; queries 1 and 3 sit exactly on the gts
    gt = jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]]])
    pred = jnp.asarray([[[0.1, 0.1, 0.1, 0.1], [0.3, 0.3, 0.2, 0.2],
                         [0.9, 0.1, 0.1, 0.1], [0.7, 0.7, 0.2, 0.2]]])
    scores = jnp.zeros((1, 4, 3))
    rows = HungarianMatcher()(pred, scores, gt, jnp.zeros((1, 2)), jnp.ones((1, 2)))
    assert rows.shape == (1, 2)
    assert int(rows[0, 0]) == 1 and int(rows[0, 1]) == 3


def test_rtdetr_build_and_forward():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("rtdetr-l.yaml")
    v = m.init_params(imgsz=96)
    x = jnp.zeros((1, 96, 96, 3))
    y, aux = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    nq = y.shape[1]
    assert y.shape == (1, nq, 4 + 80)
    assert aux["dec_bboxes"].shape[0] == 6  # decoder layers
    b = np.asarray(y[..., :4])
    assert (b >= 0).all() and (b <= 1).all()  # normalized cxcywh


def test_detr_loss_finite():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.utils.detr_loss import RTDETRDetectionLoss

    rng = np.random.default_rng(0)
    L, b, q, nc, g = 2, 2, 16, 3, 4
    preds = {
        "dec_bboxes": jnp.asarray(rng.uniform(0.2, 0.8, (L, b, q, 4)), jnp.float32),
        "dec_scores": jnp.asarray(rng.normal(0, 1, (L, b, q, nc)), jnp.float32),
        "enc_bboxes": jnp.asarray(rng.uniform(0.2, 0.8, (b, q, 4)), jnp.float32),
        "enc_scores": jnp.asarray(rng.normal(0, 1, (b, q, nc)), jnp.float32),
    }
    batch = {
        "bboxes": jnp.asarray(rng.uniform(0.3, 0.6, (b, g, 4)), jnp.float32),
        "cls": jnp.asarray(rng.integers(0, nc, (b, g)), jnp.float32),
        "mask_gt": jnp.asarray([[True, True, False, False], [True, False, False, False]]),
    }
    crit = RTDETRDetectionLoss(nc=nc)
    total, parts = jax.jit(lambda p, bt: crit(p, bt, (96, 96)))(preds, batch)
    assert np.isfinite(float(total))
    assert all(np.isfinite(float(v)) for v in parts.values())
