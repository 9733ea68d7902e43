"""Export round-trips: stablehlo serialize/deserialize and ckpt reload produce
the same predictions as the live model."""

import numpy as np
import pytest


def test_stablehlo_roundtrip(tmp_path):
    import jax.numpy as jnp

    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.engine.exporter import AutoBackend

    m = YOLO("yolov8n.yaml")
    m.model.init_params(imgsz=64)
    out = m.export(format="stablehlo", imgsz=64, batch=1, name=str(tmp_path / "m"))
    assert out.endswith(".stablehlo")

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    backend = AutoBackend(out).warmup((1, 64, 64, 3))
    y_exported = backend(img)

    x = jnp.asarray(img)
    y_live, _ = m.model.apply(m.model.variables, x[..., ::-1].astype(jnp.float32) / 255.0, train=False)
    np.testing.assert_allclose(y_exported, np.asarray(y_live), atol=1e-4, rtol=1e-4)
    assert backend.metadata["nc"] == 80


def test_export_ckpt_and_reload(tmp_path):
    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.engine.exporter import AutoBackend

    m = YOLO("yolov8n.yaml")
    m.model.init_params(imgsz=64)
    out = m.export(format="ckpt", imgsz=64, name=str(tmp_path / "m"))
    backend = AutoBackend(out)
    y = backend(np.zeros((1, 64, 64, 3), np.uint8))
    assert y.shape[-1] == 84


def test_unsupported_format_message():
    from ultralytics_pro_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    # onnx became a native format in round 3; tensorrt-style engines remain
    # gated with a pointer at the supported set
    with pytest.raises(NotImplementedError, match="stablehlo"):
        m.export(format="engine")


def test_saved_model_and_tflite_roundtrip(tmp_path):
    """jax2tf edge path (VERDICT #9): saved_model + tflite agree with the live
    model — a benchmark()-style agreement across 4 export formats total."""
    tf = pytest.importorskip("tensorflow")
    import jax.numpy as jnp

    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.engine.exporter import AutoBackend

    m = YOLO("yolov8n.yaml")
    m.model.init_params(imgsz=64)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    x = jnp.asarray(img)
    y_live, _ = m.model.apply(m.model.variables,
                              x[..., ::-1].astype(jnp.float32) / 255.0, train=False)
    y_live = np.asarray(y_live)

    sm = m.export(format="saved_model", imgsz=64, batch=1, name=str(tmp_path / "m"))
    assert sm.endswith("_saved_model")
    y_sm = AutoBackend(sm)(img)
    np.testing.assert_allclose(y_sm, y_live, atol=2e-3, rtol=1e-3)

    tfl = m.export(format="tflite", imgsz=64, batch=1, name=str(tmp_path / "m"))
    assert tfl.endswith(".tflite")
    y_tfl = AutoBackend(tfl)(img)
    np.testing.assert_allclose(y_tfl, y_live, atol=5e-3, rtol=5e-3)


def test_pb_frozen_graph_roundtrip(tmp_path):
    """Frozen GraphDef (reference export_pb): weights fold to constants and
    AutoBackend's pruned wrap_function agrees with the live model."""
    pytest.importorskip("tensorflow")
    import jax.numpy as jnp

    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.engine.exporter import AutoBackend

    m = YOLO("yolov8n.yaml")
    m.model.init_params(imgsz=64)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    x = jnp.asarray(img)
    y_live, _ = m.model.apply(m.model.variables,
                              x[..., ::-1].astype(jnp.float32) / 255.0, train=False)

    pb = m.export(format="pb", imgsz=64, batch=1, name=str(tmp_path / "m"))
    assert pb.endswith(".pb")
    backend = AutoBackend(pb)
    y_pb = backend(img)
    np.testing.assert_allclose(y_pb, np.asarray(y_live), atol=2e-3, rtol=1e-3)
    assert backend.names  # metadata sidecar round-trips class names


def test_tflite_int8_quantized_export(tmp_path):
    """INT8 post-training quantization with the coco8 calibration stream:
    artifact converts and is materially smaller than fp32."""
    from ultralytics_pro_tpu.engine.model import Model

    m = Model("yolov8n.yaml")
    m.model.init_params(imgsz=64)
    fp = m.export(format="tflite", imgsz=64, batch=1, name=str(tmp_path / "fp"))
    q = m.export(format="tflite", imgsz=64, batch=1, int8=True,
                 data="coco8.yaml", name=str(tmp_path / "q"))
    import pathlib

    assert pathlib.Path(q).stat().st_size < pathlib.Path(fp).stat().st_size * 0.55
