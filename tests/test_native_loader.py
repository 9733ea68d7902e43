"""Native C++ fastloader: bitwise agreement with the python LetterBox path
and a throughput sanity check."""

import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(480, 640), (640, 480), (320, 320), (720, 1280)]):
        im = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = d / f"im{i}.png"  # png: lossless, so decode is bit-identical
        cv2.imwrite(str(p), im)
        paths.append(str(p))
    return paths


def test_fastloader_matches_python_letterbox(img_dir):
    from ultralytics_pro_tpu.data.augment import LetterBox
    from ultralytics_pro_tpu.native import FastLoader, available

    if not available():
        pytest.skip("no native toolchain")
    fl = FastLoader(imgsz=320, scaleup=False)
    imgs, meta = fl.load(img_dir)
    lb = LetterBox((320, 320), scaleup=False)
    for i, p in enumerate(img_dir):
        ref = lb(image=cv2.imread(p))
        ref_img = ref["img"] if isinstance(ref, dict) else ref
        np.testing.assert_array_equal(imgs[i], ref_img)
        h0, w0 = cv2.imread(p).shape[:2]
        assert meta[i, 0] == h0 and meta[i, 1] == w0
        r = min(320 / h0, 320 / w0, 1.0)
        np.testing.assert_allclose(meta[i, 2], r, rtol=1e-6)


def test_fastloader_bad_path_zero_image(img_dir):
    from ultralytics_pro_tpu.native import FastLoader, available

    if not available():
        pytest.skip("no native toolchain")
    fl = FastLoader(imgsz=64)
    imgs, meta = fl.load([img_dir[0], "/nonexistent/xx.jpg"])
    assert meta[0, 0] > 0 and meta[1, 0] == 0
    assert imgs[1].sum() == 0


def test_fastloader_parallel_faster_or_equal(img_dir):
    from ultralytics_pro_tpu.native import FastLoader, available

    if not available():
        pytest.skip("no native toolchain")
    paths = img_dir * 16  # 64 decodes
    fl = FastLoader(imgsz=320, nthreads=8)
    fl.load(paths[:4])  # warm
    t0 = time.perf_counter()
    imgs, meta = fl.load(paths)
    native = time.perf_counter() - t0
    from ultralytics_pro_tpu.data.augment import LetterBox

    lb = LetterBox((320, 320))
    t0 = time.perf_counter()
    for p in paths:
        lb(image=cv2.imread(p))
    python = time.perf_counter() - t0
    assert len(imgs) == 64 and (meta[:, 0] > 0).all()
    # same work in parallel native threads must not be slower than the serial
    # python loop (loose 2x bound: CI boxes run other jobs concurrently)
    assert native < python * 2.0, (native, python)


def test_predict_files_matches_standard_path(img_dir, tmp_path):
    """Native batched predict_files: boxes in the ORIGINAL frame must agree
    with the standard per-image python predict path."""
    import numpy as np

    from ultralytics_pro_tpu.engine.model import Model
    from ultralytics_pro_tpu.native import available

    if not available():
        pytest.skip("no native toolchain")
    m = Model("yolov8n.yaml")
    m.model.init_params(imgsz=320)
    fast = m.predict_files(img_dir, imgsz=320, conf=0.01, batch=4)
    slow = m.predict(list(img_dir), imgsz=320, conf=0.01)
    assert len(fast) == len(slow) == len(img_dir)
    for rf, rs in zip(fast, slow):
        bf = np.asarray(rf.boxes.xyxy) if rf.boxes is not None else np.zeros((0, 4))
        bs = np.asarray(rs.boxes.xyxy) if rs.boxes is not None else np.zeros((0, 4))
        assert len(bf) == len(bs)
        if len(bf):
            np.testing.assert_allclose(bf, bs, atol=1.0)  # decode identical; fp tolerance
