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


@pytest.mark.slow
def test_cdn_denoising_train_path():
    """CDN queries (reference get_cdn_group models/utils/ops.py): construction,
    prepended decoder pass, known-matching dn loss, gradient to the dn embed."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.utils.detr_loss import RTDETRDetectionLoss, make_cdn_batch

    rng = np.random.default_rng(0)
    m = DetectionModel("rtdetr-l.yaml", nc=5)
    v = m.init_params(imgsz=96)
    b, G = 2, 4
    cls = rng.integers(0, 5, (b, G)).astype(np.float32)
    bboxes = rng.uniform(0.3, 0.6, (b, G, 4)).astype(np.float32)
    mask = np.array([[1, 1, 0, 0], [1, 0, 0, 0]], np.float32)
    dn = make_cdn_batch(cls, bboxes, mask, nc=5, num_dn=8)
    assert dn["cls"].shape == (b, 2, 8)  # 2 groups of 2*G
    assert (dn["cls"][1, :, 1:G] == 5).all()  # padding -> no-object row

    x = jnp.asarray(rng.uniform(0, 1, (b, 96, 96, 3)), jnp.float32)
    dnj = {k: jnp.asarray(val) for k, val in dn.items()}
    preds = jax.jit(lambda v, x, dn: m.module.apply(
        v, x, train=True, dn=dn, mutable=["batch_stats"])[0])(v, x, dnj)
    assert preds["dn_bboxes"].shape[2] == 16 and "dn_scores" in preds
    batch = {"bboxes": jnp.asarray(bboxes), "cls": jnp.asarray(cls), "mask_gt": jnp.asarray(mask)}
    crit = RTDETRDetectionLoss(nc=5)
    total, parts = jax.jit(lambda p, bt: crit(p, bt, (96, 96)))(preds, batch)
    assert np.isfinite(float(total)) and "dn_cls" in parts and "dn_giou" in parts

    # eval path emits no dn keys
    y, aux = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert "dn_bboxes" not in aux
