"""Native ONNX export round-trip (VERDICT r2 Next #6).

No ONNX toolchain exists in this environment, so the exporter serializes the
inference jaxpr to ModelProto with the in-repo protobuf writer and the test
re-parses + re-evaluates the graph with the native runner — numeric
equivalence to the live model proves the bytes encode the real computation.
"""

import numpy as np
import pytest

from ultralytics_pro_tpu.utils.onnx_proto import parse_model


def test_onnx_roundtrip_yolov8n(tmp_path):
    import jax.numpy as jnp

    from ultralytics_pro_tpu.engine.onnx_export import export_model_onnx
    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.utils.onnx_run import run_onnx

    m = DetectionModel("yolov8n.yaml")
    m.init_params(imgsz=64)
    path = export_model_onnx(m, tmp_path / "y8n.onnx", imgsz=64)
    blob = open(path, "rb").read()

    parsed = parse_model(blob)
    assert parsed["opset"] == 17
    assert parsed["inputs"] == ["images"]
    assert parsed["outputs"] == ["output0"]
    ops = {n["op_type"] for n in parsed["nodes"]}
    assert "Conv" in ops and "Sigmoid" in ops and "Concat" in ops

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    out = run_onnx(blob, {"images": x})[0]
    y_ref, _ = m.apply(m.variables, jnp.asarray(x), train=False)
    y_ref = np.swapaxes(np.asarray(y_ref), 1, 2)
    assert out.shape == y_ref.shape  # (B, 4+nc, A) reference layout
    assert np.abs(out - y_ref).max() < 1e-4 * max(np.abs(y_ref).max(), 1.0)


def test_onnx_via_exporter_and_autobackend(tmp_path):
    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.engine.exporter import AutoBackend

    model = YOLO("yolov8n.yaml")
    model.model.init_params(imgsz=64)
    out = model.export(format="onnx", imgsz=64, name=str(tmp_path / "model"))
    assert out.endswith(".onnx")
    ab = AutoBackend(out)
    assert ab.format in ("onnx", "onnx_native")
    y = ab(np.zeros((1, 64, 64, 3), np.uint8))
    assert y.shape == (1, 84, 84)
    assert np.isfinite(y).all()


def test_onnx_with_onnxruntime(tmp_path):
    """Gated: when onnxruntime is installed, the exported graph must load and
    run through it (AutoBackend prefers it over the native runner)."""
    ort = pytest.importorskip("onnxruntime")
    from ultralytics_pro_tpu.engine.onnx_export import export_model_onnx
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    m.init_params(imgsz=64)
    path = export_model_onnx(m, tmp_path / "y8n.onnx", imgsz=64)
    sess = ort.InferenceSession(str(path), providers=["CPUExecutionProvider"])
    y = sess.run(None, {"images": np.zeros((1, 64, 64, 3), np.float32)})[0]
    assert y.shape == (1, 84, 84)


def test_onnx_segment_two_outputs(tmp_path):
    """Segment export carries protos as output1 (reference seg ONNX layout)."""
    import jax.numpy as jnp

    from ultralytics_pro_tpu.engine.onnx_export import export_model_onnx
    from ultralytics_pro_tpu.nn.tasks import SegmentationModel
    from ultralytics_pro_tpu.utils.onnx_run import run_onnx

    m = SegmentationModel("yolov8n-seg.yaml")
    m.init_params(imgsz=64)
    path = export_model_onnx(m, tmp_path / "seg.onnx", imgsz=64)
    blob = open(path, "rb").read()
    parsed = parse_model(blob)
    assert parsed["outputs"] == ["output0", "output_1"]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    o0, o1 = run_onnx(blob, {"images": x})
    y, aux = m.apply(m.variables, jnp.asarray(x), train=False)
    assert np.abs(o0 - np.swapaxes(np.asarray(y), 1, 2)).max() < 1e-4
    assert np.abs(o1 - np.transpose(np.asarray(aux["protos"]), (0, 3, 1, 2))).max() < 1e-4


def test_onnx_pose_and_obb(tmp_path):
    import jax.numpy as jnp

    from ultralytics_pro_tpu.engine.onnx_export import export_model_onnx
    from ultralytics_pro_tpu.nn.tasks import OBBModel, PoseModel
    from ultralytics_pro_tpu.utils.onnx_run import run_onnx

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    for cls, yaml_name in ((PoseModel, "yolov8n-pose.yaml"), (OBBModel, "yolov8n-obb.yaml")):
        m = cls(yaml_name)
        m.init_params(imgsz=64)
        path = export_model_onnx(m, tmp_path / f"{cls.__name__}.onnx", imgsz=64)
        out = run_onnx(open(path, "rb").read(), {"images": x})[0]
        y, _ = m.apply(m.variables, jnp.asarray(x), train=False)
        y = np.swapaxes(np.asarray(y), 1, 2)
        assert out.shape == y.shape, (cls.__name__, out.shape, y.shape)
        assert np.abs(out - y).max() < 1e-4 * max(np.abs(y).max(), 1.0), cls.__name__
