"""Utility tranche: downloads, Triton HTTP client, NAS facade, tracker
integrations."""

import http.server
import json
import threading
import zipfile
from pathlib import Path

import numpy as np
import pytest


# --------------------------------------------------------------------- downloads

def test_safe_download_local_and_zip(tmp_path):
    from ultralytics_pro_tpu.utils.downloads import safe_download, zip_directory, unzip_file

    src = tmp_path / "srcdir"
    src.mkdir()
    (src / "a.txt").write_text("hello")
    (src / "sub").mkdir()
    (src / "sub" / "b.txt").write_text("world")
    zf = zip_directory(src)
    assert zf.exists() and zipfile.is_zipfile(zf)

    out = safe_download(f"file://{zf}", dir=tmp_path / "dl", unzip=True)
    assert out.is_dir()
    assert (out / "a.txt").read_text() == "hello"
    assert (out / "sub" / "b.txt").read_text() == "world"

    # plain local path copy, no unzip
    got = safe_download(str(src / "a.txt"), dir=tmp_path / "dl2", unzip=False)
    assert got.read_text() == "hello"


def test_safe_download_missing_raises(tmp_path):
    from ultralytics_pro_tpu.utils.downloads import safe_download

    with pytest.raises(FileNotFoundError):
        safe_download(str(tmp_path / "nope.bin"), dir=tmp_path)


def test_unzip_single_topdir_rule(tmp_path):
    from ultralytics_pro_tpu.utils.downloads import unzip_file

    zf = tmp_path / "pack.zip"
    with zipfile.ZipFile(zf, "w") as z:
        z.writestr("pack/x.txt", "1")
        z.writestr("pack/y.txt", "2")
    out = unzip_file(zf)
    assert out == tmp_path / "pack" and (out / "x.txt").exists()


def test_attempt_download_asset_errors_helpfully(tmp_path, monkeypatch):
    from ultralytics_pro_tpu.utils import downloads

    with pytest.raises(FileNotFoundError, match="github.com"):
        downloads.attempt_download_asset("yolov8n.pt")


def test_is_url():
    from ultralytics_pro_tpu.utils.downloads import is_url

    assert is_url("https://example.com/x.zip")
    assert is_url("file:///tmp/x.zip")
    assert not is_url("not a url")


# --------------------------------------------------------------------- triton

class _TritonHandler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _send(self, obj):
        body = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        assert self.path == "/v2/models/yolov8n"
        self._send({"name": "yolov8n",
                    "inputs": [{"name": "images", "datatype": "FP32",
                                "shape": [1, 3, 640, 640]}],
                    "outputs": [{"name": "output0", "datatype": "FP32",
                                 "shape": [1, 84, 8400]}]})

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        req = json.loads(self.rfile.read(n))
        x = np.asarray(req["inputs"][0]["data"], np.float32).reshape(
            req["inputs"][0]["shape"])
        y = (x * 2.0).reshape(x.shape[0], -1)
        self._send({"outputs": [{"name": "output0", "datatype": "FP32",
                                 "shape": list(y.shape),
                                 "data": y.reshape(-1).tolist()}]})


@pytest.fixture()
def triton_server():
    srv = http.server.HTTPServer(("127.0.0.1", 0), _TritonHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_triton_client_roundtrip(triton_server):
    from ultralytics_pro_tpu.utils.triton import TritonRemoteModel

    m = TritonRemoteModel(f"triton://{triton_server}/yolov8n")
    assert m.input_names == ["images"]
    assert m.output_names == ["output0"]
    x = np.arange(12, dtype=np.float64).reshape(1, 3, 2, 2)  # wrong dtype on purpose
    (out,) = m(x)
    np.testing.assert_allclose(out, (x * 2).reshape(1, -1).astype(np.float32))


def test_triton_grpc_raises():
    from ultralytics_pro_tpu.utils.triton import TritonRemoteModel

    with pytest.raises(ImportError):
        TritonRemoteModel("host:8001", endpoint="m", scheme="grpc")


# --------------------------------------------------------------------- NAS

def test_nas_yaml_builds_and_forwards():
    import jax.numpy as jnp

    from ultralytics_pro_tpu.models.nas import NAS

    m = NAS("yolo_nas_s.yaml")
    assert m.task == "detect"
    v = m.model.init_params(imgsz=64)
    y, _ = m.model.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.shape[-1] == 4 + m.model.nc


def test_nas_pt_guidance():
    from ultralytics_pro_tpu.models.nas import NAS

    with pytest.raises(NotImplementedError):
        NAS("yolo_nas_s.pt")


# --------------------------------------------------------------------- integrations

def test_integration_callbacks_gated_and_logging(monkeypatch, tmp_path):
    import sys
    import types

    calls = {"init": 0, "log": [], "finish": 0}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls.__setitem__("init", calls["init"] + 1)
    fake.log = lambda d, step=None: calls["log"].append((d, step))
    fake.finish = lambda: calls.__setitem__("finish", calls["finish"] + 1)
    fake.Artifact = lambda *a, **k: types.SimpleNamespace(add_file=lambda p: None)
    fake.log_artifact = lambda a: None
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from ultralytics_pro_tpu.utils import callbacks as C
    from ultralytics_pro_tpu.utils.settings import SETTINGS

    monkeypatch.setitem(SETTINGS, "wandb", True)
    merged = C.integration_callbacks()
    assert merged["on_fit_epoch_end"], "wandb hook not registered"

    trainer = types.SimpleNamespace(epoch_losses={"box": 1.5}, last_fitness=0.4,
                                    _epoch=3, args={}, save_dir="run", best=None)
    for fn in merged["on_pretrain_routine_start"]:
        fn(trainer)
    for fn in merged["on_fit_epoch_end"]:
        fn(trainer)
    for fn in merged["on_train_end"]:
        fn(trainer)
    assert calls["init"] == 1 and calls["finish"] == 1
    assert calls["log"] == [({"train/box": 1.5, "metrics/fitness": 0.4}, 3)]


def test_integrations_absent_package_is_silent(monkeypatch):
    from ultralytics_pro_tpu.utils import callbacks as C
    from ultralytics_pro_tpu.utils.settings import SETTINGS

    monkeypatch.setitem(SETTINGS, "neptune", True)  # not installed
    merged = C.integration_callbacks()  # must not raise
    assert isinstance(merged, dict)
