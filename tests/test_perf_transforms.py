"""Perf transforms: preproc folding exactness, P7 config, multi-scale range."""

import jax.numpy as jnp
import numpy as np


def test_fold_preproc_into_stem_exact():
    from ultralytics_pro_tpu.nn.fuse import fold_preproc_into_stem
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    v = m.init_params(imgsz=64)
    u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3),
                                                       dtype=np.uint8))
    y0, _ = m.apply(v, u8[..., ::-1].astype(jnp.float32) / 255.0, train=False)
    y1, _ = m.apply(fold_preproc_into_stem(v), u8.astype(jnp.float32), train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-3)


def test_p7_model_builds():
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n-p7.yaml")
    v = m.init_params(imgsz=128)
    y, _ = m.apply(v, jnp.zeros((1, 128, 128, 3)), train=False)
    assert tuple(m.stride) == (8, 16, 32, 64, 128)
    assert y.shape[-1] == 4 + m.nc


def test_multi_scale_ladder_spans_reference_range():
    """Ladder must span [0.5, 1.5] x imgsz (reference detect/train.py:120)."""
    import inspect

    from ultralytics_pro_tpu.engine.trainer import BaseTrainer

    src = inspect.getsource(BaseTrainer._multi_scale)
    assert "0.5" in src and "1.5" in src
    ladder = sorted({max(32, round(640 * f / 32) * 32)
                     for f in (0.5, 0.667, 0.833, 1.0, 1.167, 1.333, 1.5)})
    assert min(ladder) == 320 and max(ladder) == 960 and len(ladder) == 7
