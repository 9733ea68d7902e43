"""Backbone zoo tranche 2: each backbone emits 4 pyramid maps and the swap
yamls build + forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultralytics_pro_tpu.nn.modules import backbones2 as B

X = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 64, 64, 3)).astype(np.float32))


@pytest.mark.parametrize("cls,kw", [
    (B.GhostNetV2, {}),
    (B.FasterNet, {}),
    (B.RepViT, {}),
    (B.StarNet, {}),
    (B.LSKNet, {}),
    (B.MobileNetV4, {}),
    (B.EfficientNetV2, {}),
])
def test_backbone_four_stages(cls, kw):
    mod = cls(**kw)
    variables = mod.init(jax.random.PRNGKey(0), X, train=False)
    outs = mod.apply(variables, X, train=False)
    assert len(outs) == 4, cls.__name__
    hs = [o.shape[1] for o in outs]
    assert hs == sorted(hs, reverse=True), f"{cls.__name__}: {hs} not a pyramid"
    assert all(bool(jnp.isfinite(o).all()) for o in outs), cls.__name__


def test_fastkan_conv_shapes_and_grad():
    mod = B.FastKANConv2D(c2=16, k=3, s=2)
    variables = mod.init(jax.random.PRNGKey(0), X, train=False)
    y = mod.apply(variables, X, train=False)
    assert y.shape == (1, 32, 32, 16)

    def loss(p):
        return (mod.apply({"params": p}, X, train=False) ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    assert float(jnp.abs(g["spline_conv"]["kernel"]).sum()) > 0  # spline path trains


@pytest.mark.parametrize("yaml_name", [
    "yolo11n-ghostnetv2.yaml",
    "yolo11n-fasternet.yaml",
    "yolo11n-repvit.yaml",
    "yolo11n-starnet.yaml",
    "yolo11n-lsknet.yaml",
    "yolo11n-mobilenetv4.yaml",
    "yolo11n-efficientnetv2.yaml",
    "yolov8n-kan.yaml",
])
def test_swap_yaml_builds(yaml_name):
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel(yaml_name)
    v = m.init_params(imgsz=64)
    y, _ = m.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.shape[-1] == 4 + m.nc and bool(jnp.isfinite(y).all()), yaml_name


@pytest.mark.slow
def test_ssm_backbones_four_stages():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.backbones2 import MambaVision, VSSDNet

    x = jnp.zeros((1, 64, 64, 3))
    for cls in (MambaVision, VSSDNet):
        mod = cls()
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        outs = mod.apply(v, x, train=False)
        assert len(outs) == 4, cls.__name__
        hs = [o.shape[1] for o in outs]
        assert hs == sorted(hs, reverse=True), (cls.__name__, hs)

    from ultralytics_pro_tpu.nn.tasks import BUILDERS

    for nm in ("mamba_vision_T", "MambaVision", "VSSD", "GroupMamba"):
        assert nm in BUILDERS


@pytest.mark.parametrize("name", [
    "MobileViT", "HorNet", "InceptionNext", "MogaNet", "VanillaNet",
    "CSWin", "MaxViT", "WTConvNeXt",
])
def test_tranche3_backbones_four_stages(name):
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.backbones3 import BACKBONE_VARIANTS3

    cls, kw = BACKBONE_VARIANTS3[name]
    mod = cls(**dict(kw))
    x = jnp.zeros((1, 64, 64, 3))
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    outs = mod.apply(v, x, train=False)
    assert len(outs) == 4, name
    hs = [o.shape[1] for o in outs]
    assert hs == sorted(hs, reverse=True), (name, hs)
    assert all(bool(jnp.isfinite(o).all()) for o in outs), name

    from ultralytics_pro_tpu.nn.tasks import BUILDERS

    assert name in BUILDERS


@pytest.mark.parametrize("name", ["FocalNet", "Conv2Former", "UniRepLKNet"])
def test_tranche3b_assembled_backbones(name):
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.backbones3 import BACKBONE_VARIANTS3

    cls, kw = BACKBONE_VARIANTS3[name]
    mod = cls(**dict(kw))
    x = jnp.zeros((1, 64, 64, 3))
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    outs = mod.apply(v, x, train=False)
    assert len(outs) == 4 and all(bool(jnp.isfinite(o).all()) for o in outs), name


def test_tranche3_backbones_non_divisible_size():
    """52x52 (13x13 at stride 4) exercises the pad-and-crop paths in
    MobileViT/CSWin/MaxViT/WTConvNeXt (regression: hard reshapes crashed)."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.backbones3 import BACKBONE_VARIANTS3

    x = jnp.zeros((1, 104, 104, 3))  # stage maps 26/13/6|7... odd sizes
    for name in ("MobileViT", "CSWin", "MaxViT", "WTConvNeXt"):
        cls, kw = BACKBONE_VARIANTS3[name]
        mod = cls(**dict(kw))
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        outs = mod.apply(v, x, train=False)
        assert len(outs) == 4 and all(bool(jnp.isfinite(o).all()) for o in outs), name


@pytest.mark.parametrize("name", ["EfficientFormer", "EdgeViT"])
def test_tranche3c_backbones(name):
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.backbones3 import BACKBONE_VARIANTS3

    cls, kw = BACKBONE_VARIANTS3[name]
    mod = cls(**dict(kw))
    for size in (64, 104):  # divisible and odd-stage sizes
        x = jnp.zeros((1, size, size, 3))
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        outs = mod.apply(v, x, train=False)
        assert len(outs) == 4 and all(bool(jnp.isfinite(o).all()) for o in outs), (name, size)
