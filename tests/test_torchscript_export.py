"""TorchScript export round-trip (reference exporter.py export_torchscript:614).

The artifact must be a REAL standalone TorchScript program: the tests load it
with plain torch.jit.load (no package imports) and compare against the live
jax model, proving the aten graph encodes the same computation.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_torchscript_roundtrip_yolov8n(tmp_path):
    import jax.numpy as jnp

    from ultralytics_pro_tpu.engine.torch_export import export_model_torchscript
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    m.init_params(imgsz=64)
    path = export_model_torchscript(m, tmp_path / "y8n.torchscript", imgsz=64,
                                    metadata={"names": {0: "person"}, "imgsz": 64})

    extra = {"config.txt": ""}
    ts = torch.jit.load(str(path), _extra_files=extra)
    meta = json.loads(extra["config.txt"])
    assert meta["imgsz"] == 64

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out = ts(torch.from_numpy(x)).numpy()

    y_ref, _ = m.apply(m.variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       train=False)
    y_ref = np.swapaxes(np.asarray(y_ref), 1, 2)
    assert out.shape == y_ref.shape  # (B, 4+nc, A) reference layout
    assert np.abs(out - y_ref).max() < 1e-3 * max(np.abs(y_ref).max(), 1.0)


def test_torchscript_is_standalone_aten_graph(tmp_path):
    """The saved artifact must contain only aten/prim ops — no python fallback,
    no custom ops — so libtorch can execute it without this package."""
    from ultralytics_pro_tpu.engine.torch_export import export_model_torchscript
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    m.init_params(imgsz=64)
    path = export_model_torchscript(m, tmp_path / "y8n.torchscript", imgsz=64)
    ts = torch.jit.load(str(path))
    kinds = {n.kind() for n in ts.graph.nodes()}
    assert any(k.startswith("aten::") for k in kinds)
    assert all(k.split("::")[0] in ("aten", "prim") for k in kinds), kinds


def test_torchscript_via_exporter_and_autobackend(tmp_path):
    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.engine.exporter import AutoBackend

    model = YOLO("yolov8n.yaml")
    model.model.init_params(imgsz=64)
    out = model.export(format="torchscript", imgsz=64, name=str(tmp_path / "model"))
    assert out.endswith(".torchscript")
    ab = AutoBackend(out)
    assert ab.format == "torchscript"
    y = ab(np.zeros((1, 64, 64, 3), np.uint8))
    assert y.shape == (1, 84, 84)
    assert np.isfinite(y).all()
    assert ab.names  # metadata round-trips through _extra_files


def test_torchscript_segment_two_outputs(tmp_path):
    import jax.numpy as jnp

    from ultralytics_pro_tpu.engine.torch_export import export_model_torchscript
    from ultralytics_pro_tpu.nn.tasks import SegmentationModel

    m = SegmentationModel("yolov8n-seg.yaml")
    m.init_params(imgsz=64)
    path = export_model_torchscript(m, tmp_path / "seg.torchscript", imgsz=64)
    ts = torch.jit.load(str(path))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        o0, o1 = ts(torch.from_numpy(x))
    y, aux = m.apply(m.variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                     train=False)
    assert np.abs(o0.numpy() - np.swapaxes(np.asarray(y), 1, 2)).max() < 1e-3
    assert np.abs(o1.numpy()
                  - np.transpose(np.asarray(aux["protos"]), (0, 3, 1, 2))).max() < 1e-3
