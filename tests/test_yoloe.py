"""YOLOE family tests (reference: nn/modules/head.py YOLOEDetect:1653,
YOLOESegment:1839, block.py SAVPE:2307/SwiGLUFFN:2263, utils/loss.py
TVPDetectLoss:1018, data/augment.py LoadVisualPrompt:2231)."""

import numpy as np
import pytest

from tests.make_synth_dataset import make_synth_dataset


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_yoloe")
    return str(make_synth_dataset(root, n_images=8, imgsz=160, nc=3))


def test_savpe_shapes_and_norm():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.yoloe import SAVPE

    feats = [jnp.ones((2, 16, 16, 32)), jnp.ones((2, 8, 8, 64)), jnp.ones((2, 4, 4, 128))]
    vp = jnp.zeros((2, 3, 16, 16)).at[:, 0, 2:6, 2:6].set(1.0).at[:, 1, 8:12, 8:12].set(1.0)
    m = SAVPE(c3=32, embed=64)
    v = m.init(jax.random.PRNGKey(0), feats, vp, train=False)
    e = m.apply(v, feats, vp, train=False)
    assert e.shape == (2, 3, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=-1), 1.0, atol=1e-4)


def test_swiglu_residual_identity_at_init():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.yoloe import Residual

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 64))
    m = Residual(ec=64)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    # zero-init w3 -> residual branch contributes nothing at init
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


@pytest.mark.slow
def test_yoloe_text_and_visual_forward():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import YOLOEModel

    m = YOLOEModel("yoloe-v8n.yaml")
    m.set_classes(["cat", "dog"])
    v = m.init_params(imgsz=64)
    x = jnp.zeros((1, 64, 64, 3))
    y, aux = m.apply(v, x, train=False)
    assert y.shape[-1] == 4 + 2  # nc follows the prompt count
    # visual prompts: two mask prompts -> two classes
    vp = jnp.zeros((1, 2, 8, 8)).at[:, 0, :4, :4].set(1.0).at[:, 1, 4:, 4:].set(1.0)
    y2, _ = m.apply(v, x, train=False, txt_feats={"vp": vp})
    assert y2.shape[-1] == 4 + 2
    assert np.isfinite(np.asarray(y2)).all()
    # text + visual concatenated (TVP layout: [box | text cls | vp cls])
    tpe = jnp.asarray(m.prompts["tpe"])
    y3, _ = m.apply(v, x, train=False, txt_feats={"tpe": tpe, "vp": vp})
    assert y3.shape[-1] == 4 + 4


def test_tvp_loss_slices_vp_classes():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.utils.loss import TVPDetectLoss

    crit = TVPDetectLoss(nc_text=3, vnc=3, reg_max=16, strides=(8, 16, 32))
    feats = [jnp.zeros((2, s, s, 64 + 3 + 3)) for s in (8, 4, 2)]
    batch = {
        "bboxes": jnp.asarray([[[0.5, 0.5, 0.4, 0.4]]] * 2),
        "cls": jnp.zeros((2, 1)),
        "mask_gt": jnp.ones((2, 1), bool),
    }
    total, parts = jax.jit(lambda f, b: crit({"feats": f}, b, (64, 64)))(feats, batch)
    assert np.isfinite(float(total))


def test_make_visual_prompts():
    from ultralytics_pro_tpu.engine.trainer import make_visual_prompts

    bboxes = np.array([[[0.25, 0.25, 0.5, 0.5], [0.75, 0.75, 0.2, 0.2]]], np.float32)
    cls = np.array([[0, 2]], np.float32)
    mask = np.array([[True, True]])
    vp = make_visual_prompts(bboxes, cls, mask, (64, 64), nc=3)
    assert vp.shape == (1, 3, 8, 8)
    assert vp[0, 0].sum() > 0 and vp[0, 2].sum() > 0 and vp[0, 1].sum() == 0
    assert vp[0, 0, 1, 1] == 1.0  # box center region covered


@pytest.mark.slow
def test_yoloe_train_smoke_text(synth_data, tmp_path):
    """Text-prompt YOLOE e2e train smoke + val produces finite mAP."""
    from ultralytics_pro_tpu import YOLO

    model = YOLO("yoloe-v8n.yaml")
    model.train(data=synth_data, epochs=1, imgsz=96, batch=4, workers=2, val=False,
                close_mosaic=0, mosaic=0.0, project=str(tmp_path), name="ye",
                max_gt=16, warmup_epochs=0.0, device=1)
    losses = model.trainer.epoch_losses
    assert all(np.isfinite(v) for v in losses.values()), losses
    from ultralytics_pro_tpu.engine.trainer import YOLOETrainer

    assert isinstance(model.trainer, YOLOETrainer)
    metrics = model.val(data=synth_data, imgsz=96, batch=4)
    assert np.isfinite(metrics.box.map50)


def test_yoloe_train_smoke_visual(synth_data, tmp_path):
    """Visual-prompt (TVP) YOLOE train smoke: TVPDetectLoss over vp slice."""
    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.engine.trainer import YOLOEVPTrainer

    model = YOLO("yoloe-v8n.yaml")
    model.train(data=synth_data, epochs=1, imgsz=96, batch=4, workers=2, val=False,
                close_mosaic=0, mosaic=0.0, project=str(tmp_path), name="yevp",
                max_gt=16, warmup_epochs=0.0, device=1, visual_prompt=True)
    assert isinstance(model.trainer, YOLOEVPTrainer)
    losses = model.trainer.epoch_losses
    assert all(np.isfinite(v) for v in losses.values()), losses
