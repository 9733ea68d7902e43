"""Whole-backbone zoo tests (reference nn/modules/: convnextv2.py,
SwinTransformer.py, pvt_v2.py, efficientViT.py; parse_model backbone
mechanism tasks.py:3112 — 4 stage maps occupy 5 y-cache slots)."""

import numpy as np
import pytest


@pytest.mark.parametrize("name,dims", [
    ("convnext_tiny", (96, 192, 384, 768)),
    ("pvt_v2_b0", (32, 64, 160, 256)),
    ("efficientvit_backbone_b0", (16, 32, 64, 128)),
    ("SwinTransformer_Tiny", (96, 192, 384, 768)),
])
def test_backbone_stage_contract(name, dims):
    """Each backbone returns 4 maps at strides 4/8/16/32 with its widths."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.backbones import BACKBONE_VARIANTS

    cls, kw = BACKBONE_VARIANTS[name]
    m = cls(**dict(kw))
    x = jnp.zeros((1, 128, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(v, x, train=False)
    assert len(outs) == 4
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4]
    assert [o.shape[-1] for o in outs] == list(dims)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


@pytest.mark.parametrize("cfg", ["yolo11n-convnext.yaml", "yolo11n-pvtv2.yaml"])
def test_backbone_in_model(cfg):
    """parse_model multi-output slots: head Concats index backbone stages."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel(cfg)
    assert m.specs[0].multi == 4 and m.specs[0].i == 4
    v = m.init_params(imgsz=64)
    y, aux = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, jnp.zeros((1, 64, 64, 3)))
    assert y.shape[-1] == 84
    assert m.stride == (8, 16, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_swin_shifted_window_mask():
    """Shifted block differs from unshifted on the same input (mask works)."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.backbones import SwinBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 14, 14, 32))
    b0 = SwinBlock(dim=32, heads=2, window=7, shift=0)
    b1 = SwinBlock(dim=32, heads=2, window=7, shift=3)
    v = b0.init(jax.random.PRNGKey(1), x)
    y0 = b0.apply(v, x)
    y1 = b1.apply(v, x)  # same params, shifted windows
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    assert np.isfinite(np.asarray(y1)).all()
