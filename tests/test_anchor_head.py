"""True anchor-based v5/v7 lineage: AnchorDetect decode + v5AnchorLoss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _batch(b=2, g=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "img": rng.integers(0, 255, (b, 64, 64, 3), dtype=np.uint8),
        "cls": rng.integers(0, 3, (b, g)).astype(np.float32),
        "bboxes": np.stack([np.tile([0.5, 0.5, 0.3, 0.3], (g, 1)),
                            np.tile([0.25, 0.25, 0.2, 0.4], (g, 1))]).astype(np.float32),
        "mask_gt": np.tile(np.array([1, 1, 0, 0], bool), (b, 1)),
    }


def test_anchor_detect_eval_decode_contract():
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov5-anchor.yaml", nc=3)
    v = m.init_params(imgsz=64)
    y, aux = m.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    na, a = 3, (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    assert y.shape == (1, na * a, 4 + 3)
    yy = np.asarray(y)
    # scores are sig(obj)*sig(cls) in [0, 1]; xy within image bounds
    assert 0.0 <= yy[..., 4:].min() and yy[..., 4:].max() <= 1.0
    assert yy[..., 0].min() >= -8 and yy[..., 0].max() <= 72  # grid+offset*stride


def test_anchor_detect_decode_matches_formula():
    """Zero logits -> sig=0.5: xy = grid*stride + 0.5*stride... verify the
    v5 formulas directly on a tiny handmade head call."""
    from ultralytics_pro_tpu.nn.modules.head import V5_ANCHORS, AnchorDetect

    head = AnchorDetect(nc=1, strides=(8,))

    class OneLevel(AnchorDetect):
        pass

    feats = [jnp.zeros((1, 4, 4, 8))]
    v = head.init(jax.random.PRNGKey(0), feats, train=False)
    # force the conv to output zeros
    z = jax.tree.map(jnp.zeros_like, v["params"])
    y, _ = head.apply({"params": z}, feats, train=False)
    y = np.asarray(y).reshape(-1, 5)  # 4 + nc with nc=1
    # with zero logits: sig=0.5 -> xy = (0.5*2-0.5+g)*8 = (g+0.5)*8
    xs = np.asarray(sorted(set(np.round(y[:, 0], 3))))
    np.testing.assert_allclose(xs, (np.arange(4) + 0.5) * 8, atol=1e-4)
    # wh = (1)^2 * anchor
    whs = sorted(set(np.round(y[:, 2], 3)))
    assert set(whs) == {10.0, 16.0, 33.0}  # P3 anchors (V5_ANCHORS[0]) widths


def test_v5_anchor_loss_finite_and_grads():
    from ultralytics_pro_tpu.engine.trainer import DetectionTrainer
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov5-anchor.yaml", nc=3)
    m.init_params(imgsz=64)
    tr = DetectionTrainer(m, {"epochs": 1, "batch": 2, "imgsz": 64,
                              "project": "/tmp/upt_anchor", "name": "a"})
    crit = tr.criterion()
    from ultralytics_pro_tpu.utils.loss import v5AnchorLoss

    assert isinstance(crit, v5AnchorLoss)
    step = tr.build_train_step()
    variables = m.variables
    params = variables["params"]
    state = (params, variables["batch_stats"],
             jax.tree.map(jnp.zeros_like, params),
             jax.tree.map(jnp.copy, params),
             jnp.zeros((), jnp.int32),
             jax.tree.map(jnp.zeros_like, params))
    db = tr.put_batch(_batch())
    state, total, parts = step(state, db, jnp.asarray([0.01] * 3, jnp.float32),
                               jnp.float32(0.9), jnp.asarray(True))
    assert np.isfinite(float(total)), parts
    assert float(parts["box"]) > 0 and float(parts["obj"]) > 0


def test_v5_anchor_loss_decreases_on_repeat():
    """A few optimizer steps on one batch must reduce the loss (the
    assignment must actually connect preds to GTs)."""
    from ultralytics_pro_tpu.engine.trainer import DetectionTrainer
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov5-anchor.yaml", nc=3)
    m.init_params(imgsz=64)
    tr = DetectionTrainer(m, {"epochs": 1, "batch": 2, "imgsz": 64,
                              "project": "/tmp/upt_anchor", "name": "b"})
    step = tr.build_train_step()
    variables = m.variables
    params = variables["params"]
    state = (params, variables["batch_stats"],
             jax.tree.map(jnp.zeros_like, params),
             jax.tree.map(jnp.copy, params),
             jnp.zeros((), jnp.int32),
             jax.tree.map(jnp.zeros_like, params))
    db = tr.put_batch(_batch())
    losses = []
    for _ in range(8):
        state, total, _ = step(state, db, jnp.asarray([0.05] * 3, jnp.float32),
                               jnp.float32(0.9), jnp.asarray(True))
        losses.append(float(total))
    assert losses[-1] < losses[0], losses


def test_yolov7_anchor_builds_with_implicit():
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov7-anchor.yaml", nc=3)
    v = m.init_params(imgsz=64)
    # implicit layers present in the head params
    head_key = [k for k in v["params"] if "ia_0" in str(v["params"][k].keys())]
    y, _ = m.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert bool(jnp.isfinite(y).all())


def test_anchor_model_e2e_train_val(tmp_path):
    """Facade-level: yolov5-anchor trains one epoch on coco8 and produces a
    finite mAP through the standard validator/NMS path."""
    from ultralytics_pro_tpu.engine.model import Model

    m = Model("yolov5-anchor.yaml", task="detect")
    m.train(data="coco8.yaml", epochs=1, imgsz=64, batch=4,
            project=str(tmp_path), name="anchor_e2e", workers=0,
            warmup_epochs=0.0, val=False, plots=False)
    metrics = m.val(data="coco8.yaml", imgsz=64, batch=4)
    fit = metrics.fitness if hasattr(metrics, "fitness") else metrics
    assert np.isfinite(float(fit))


def test_v5_anchor_neighbor_cell_assignment():
    """The 3-cell cross-grid rule must select the CORRECT neighbor: a GT at
    fractional x=0.3 (fx<0.5) assigns its center cell AND the left cell."""
    import jax.numpy as jnp

    from ultralytics_pro_tpu.utils.loss import v5AnchorLoss

    wid = hgt = 8
    # gt centered at grid (4.3, 4.6) normalized on an 8x8 level at stride 8
    bboxes = np.array([[[4.3 / wid, 4.6 / hgt, 0.25, 0.25]]], np.float32)
    gxy = bboxes[..., :2] * np.array([wid, hgt], np.float32)
    gx, gy = gxy[..., 0], gxy[..., 1]
    fx, fy = gx % 1.0, gy % 1.0
    off = np.array([[0, 0], [1, 0], [-1, 0], [0, 1], [0, -1]], np.float32) * 0.5
    cell = np.floor(gxy[:, :, None, :] - off[None, None])
    cx = cell[..., 0].astype(int)[0, 0]
    cy = cell[..., 1].astype(int)[0, 0]
    # offset 0: center (4,4); offset 1 (fx<0.5 -> left): (3,4);
    # offset 4 (fy>=0.5 -> down... ): y-neighbor cell 5
    assert (cx[0], cy[0]) == (4, 4)
    assert (cx[1], cy[1]) == (3, 4)      # left neighbor for fx=0.3
    assert (cx[4], cy[4]) == (4, 5)      # lower neighbor for fy=0.6
