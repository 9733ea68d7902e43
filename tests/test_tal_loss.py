"""TAL assigner + v8 detection loss parity vs recorded reference outputs."""

import numpy as np
import pytest

from tests.conftest import load_fixture


def test_tal_parity():
    from ultralytics_pro_tpu.utils.tal import TaskAlignedAssigner

    import jax

    fx = load_fixture("tal.npz")
    assigner = TaskAlignedAssigner(topk=10, num_classes=5, alpha=0.5, beta=6.0)
    res = jax.jit(assigner.__call__)(
        fx["pd_scores"], fx["pd_bboxes"], fx["anc_points"],
        fx["gt_labels"][..., 0], fx["gt_bboxes"], fx["mask_gt"][..., 0],
    )
    # Tie-breaking at top-k boundaries differs between torch and XLA for
    # exactly-equal metrics; allow <1% of anchors to disagree and require
    # exact agreement on the rest.
    got_fg = np.asarray(res.fg_mask)
    ref_fg = fx["fg_mask"].astype(bool)
    disagree = got_fg != ref_fg
    assert disagree.mean() < 0.01, f"fg_mask disagreement {disagree.mean():.3f}"
    fg = ref_fg & got_fg
    np.testing.assert_array_equal(np.asarray(res.target_gt_idx)[fg], fx["target_gt_idx"][fg])
    np.testing.assert_array_equal(np.asarray(res.target_labels)[fg], fx["target_labels"][fg])
    np.testing.assert_allclose(np.asarray(res.target_bboxes)[fg], fx["target_bboxes"][fg], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.target_scores)[fg], fx["target_scores"][fg], atol=1e-3, rtol=1e-3
    )


def test_topk_candidates_matches_lax_topk():
    """The unrolled argmax top-k (TPU perf path) selects the same set as lax.top_k.

    Covers ties (integer-quantized metrics) because padded/zero rows tie often.
    """
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.utils.tal import TaskAlignedAssigner

    rng = np.random.default_rng(0)
    assigner = TaskAlignedAssigner(topk=10, num_classes=3)
    mask_gt = jnp.asarray((rng.random((4, 16, 1)) > 0.2).astype(np.float32))
    for metrics in (
        jnp.asarray(rng.random((4, 16, 840)).astype(np.float32)),
        jnp.asarray((rng.random((4, 16, 840)) * 4).astype(np.int32).astype(np.float32)),  # heavy ties
    ):
        got = assigner.select_topk_candidates(metrics, mask_gt)
        _, idx = jax.lax.top_k(metrics, assigner.topk)
        want = jnp.where(mask_gt, jax.nn.one_hot(idx, metrics.shape[-1], dtype=metrics.dtype).sum(-2), 0.0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert np.all(np.asarray(got).sum(-1) <= assigner.topk)


def test_detect_loss_parity():
    """Model train-forward feats parity + full loss parity on a real batch."""
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.utils.loss import v8DetectionLoss
    from ultralytics_pro_tpu.utils.torch_import import load_torch_state_dict

    model_fx = load_fixture("model_yolov8n.npz")
    fx = load_fixture("detect_loss.npz")

    model = DetectionModel("yolov8n.yaml")
    variables = model.init_params(imgsz=64)
    sd = {k[4:]: v for k, v in model_fx.items() if k.startswith("sd::")}
    variables = load_torch_state_dict(variables, sd, strict=True)

    import jax

    x = jnp.asarray(fx["input"].transpose(0, 2, 3, 1))
    preds, _ = jax.jit(lambda v, xx: model.apply(v, xx, train=True, mutable=["batch_stats"]))(variables, x)

    # Train-mode per-level raw maps track the reference (NCHW -> NHWC).
    # Batch-stat BN normalization amplifies cross-framework float drift, so the
    # tolerance is looser than the eval-mode parity test.
    for i in range(3):
        ref = fx[f"feat{i}"].transpose(0, 2, 3, 1)
        got = np.asarray(preds["feats"][i])
        err = np.abs(got - ref) / (np.abs(ref) + 1e-2)
        assert np.median(err) < 5e-3, f"level {i} median rel err {np.median(err):.4f}"
        assert np.quantile(err, 0.99) < 0.1, f"level {i} p99 rel err {np.quantile(err, 0.99):.3f}"

    # Dense padded batch from the flat (batch_idx, cls, bboxes) lists.
    G = 8
    b = x.shape[0]
    cls = np.zeros((b, G), np.float32)
    bboxes = np.zeros((b, G, 4), np.float32)
    mask = np.zeros((b, G), bool)
    for bi in range(b):
        sel = fx["batch_idx"] == bi
        n = int(sel.sum())
        cls[bi, :n] = fx["cls"][sel]
        bboxes[bi, :n] = fx["bboxes"][sel]
        mask[bi, :n] = True
    batch = {"cls": jnp.asarray(cls), "bboxes": jnp.asarray(bboxes), "mask_gt": jnp.asarray(mask)}

    criterion = v8DetectionLoss(nc=80, reg_max=16, strides=model.stride)
    total, parts = jax.jit(lambda p, b: criterion(p, b, (64, 64)))(preds, batch)

    ref_items = fx["items"]  # [box, cls, dfl] per-image-average components
    np.testing.assert_allclose(float(parts["box"]), ref_items[0], rtol=0.05, atol=5e-3)
    np.testing.assert_allclose(float(parts["cls"]), ref_items[1], rtol=0.05, atol=5e-3)
    np.testing.assert_allclose(float(parts["dfl"]), ref_items[2], rtol=0.05, atol=5e-3)
    np.testing.assert_allclose(float(total), fx["total"].sum(), rtol=0.05)
