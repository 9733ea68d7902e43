"""Model-zoo build+forward smokes across families (v3/v5/v8/v9/v10/v11/v12,
rtdetr, task variants)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("cfg,nc_extra", [
    ("yolov3-tiny.yaml", 0),
    ("yolov5n.yaml", 0),
    ("yolov6n.yaml", 0),
    ("yolov4-csp.yaml", 0),
    ("yolov7.yaml", 0),  # anchor-free af variant; E-ELAN inline stages
    ("yolov5n-p6.yaml", 0),
    ("yolov3-spp.yaml", 0),
    ("yoloX.yaml", 0),  # fork formulation: decoupled towers -> 6-map Detect
    ("yolov8n.yaml", 0),
    ("yolov9c.yaml", 0),
    ("yolo11n.yaml", 0),
    ("yolo12n.yaml", 0),
])
def test_detect_family_forward(cfg, nc_extra):
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel(cfg)
    v = m.init_params(imgsz=64)
    y, aux = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, jnp.zeros((1, 64, 64, 3)))
    assert y.shape[-1] == 84 + nc_extra
    assert np.isfinite(np.asarray(y)).all()


def test_yolov10_end2end_forward_and_loss():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.utils.loss import E2EDetectLoss

    m = DetectionModel("yolov10n.yaml")
    v = m.init_params(imgsz=64)
    x = jnp.zeros((2, 64, 64, 3))
    # eval: NMS-free (B, max_det, 6)
    y, aux = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert y.shape == (2, 84, 6) or y.shape[2] == 6  # max_det capped by anchors
    # train: dual branches + E2E loss finite
    preds, _ = jax.jit(lambda v, x: m.apply(v, x, train=True, mutable=["batch_stats"]))(v, x)
    assert "one2one" in preds
    batch = {
        "bboxes": jnp.asarray([[[0.5, 0.5, 0.4, 0.4]]] * 2),
        "cls": jnp.zeros((2, 1)),
        "mask_gt": jnp.ones((2, 1), bool),
    }
    crit = E2EDetectLoss(nc=80, reg_max=16, strides=m.stride)
    total, parts = jax.jit(lambda p, b: crit(p, b, (64, 64)))(preds, batch)
    assert np.isfinite(float(total))
    assert "o2m_box" in parts and "o2o_box" in parts


def test_v9_elan_modules_forward():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.v9v10v12 import ADown, ELAN1, RepNCSPELAN4, SPPELAN

    x = jnp.zeros((1, 16, 16, 32))
    for mod, kw in [
        (RepNCSPELAN4, dict(c2=64, c3=32, c4=16, n=1)),
        (ELAN1, dict(c2=64, c3=32, c4=16)),
        (SPPELAN, dict(c2=64, c3=16)),
        (ADown, dict(c2=32)),
    ]:
        m = mod(**kw)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        y = m.apply(v, x, train=False)
        assert y.shape[-1] == kw["c2"]


def test_activation_override_pinned_per_model():
    """YAML `activation:` key (reference tasks.py:2436): v6 uses ReLU and keeps
    it even after another model without the key is parsed."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m6 = DetectionModel("yolov6n.yaml")
    assert m6.meta["activation"] == "nn.ReLU()"
    v = m6.init_params(imgsz=64)
    DetectionModel("yolov8n.yaml")  # parses without the key -> resets global
    y, _ = jax.jit(lambda v, x: m6.apply(v, x, train=False))(v, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(y)).all()


def test_repconv_and_convbn_fusion_exact():
    """Deploy re-parameterization (reference RepConv.fuse_convs conv.py:587,
    fuse_conv_and_bn torch_utils.py:236): fused single conv reproduces the
    multi-branch eval forward to float32 precision."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.fuse import apply_fused_conv, fuse_conv_bn, repconv_fuse
    from ultralytics_pro_tpu.nn.modules.conv import Conv, RepConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 8)).astype(np.float32))

    def perturb(d):
        for k, val in d.items():
            if isinstance(val, dict):
                perturb(val)
            elif k == "mean":
                d[k] = jnp.asarray(rng.normal(0, 0.3, val.shape), jnp.float32)
            elif k == "var":
                d[k] = jnp.asarray(rng.uniform(0.5, 2.0, val.shape), jnp.float32)
            elif k == "scale":
                d[k] = jnp.asarray(rng.uniform(0.5, 1.5, val.shape), jnp.float32)
            elif k == "bias":
                d[k] = jnp.asarray(rng.normal(0, 0.2, val.shape), jnp.float32)

    m = RepConv(c2=8, bn_identity=True)
    v = dict(m.init(jax.random.PRNGKey(0), x, train=True))
    perturb(v["batch_stats"])
    perturb({"p": v["params"]})
    y_ref = m.apply(v, x, train=False)
    k, b = repconv_fuse(v["params"], v["batch_stats"])
    y_fused = apply_fused_conv(x, k, b, act=jax.nn.silu)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused), atol=1e-4)

    cm = Conv(c2=16, k=3)
    cv = dict(cm.init(jax.random.PRNGKey(1), x, train=True))
    perturb(cv["batch_stats"])
    perturb({"p": cv["params"]})
    y2 = cm.apply(cv, x, train=False)
    k2, b2 = fuse_conv_bn(cv["params"]["conv"]["kernel"], cv["params"]["bn"],
                          cv["batch_stats"]["bn"])
    y2f = apply_fused_conv(x, k2, b2, act=jax.nn.silu)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y2f), atol=1e-4)
