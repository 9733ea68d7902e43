"""End-to-end smoke tests on a synthetic coco8-style dataset (SURVEY.md §4:
the reference ecosystem verifies with tiny-dataset train/val/predict runs).

Small imgsz (128) keeps compile costs manageable in this environment.
"""

import numpy as np
import pytest

from tests.make_synth_dataset import make_synth_dataset


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return str(make_synth_dataset(root, n_images=8, imgsz=160, nc=3))


@pytest.fixture(scope="module")
def tiny_model():
    from ultralytics_pro_tpu import YOLO

    return YOLO("yolov8n.yaml")


def test_predict_e2e(synth_data, tiny_model):
    import cv2

    from ultralytics_pro_tpu.data.utils import check_det_dataset

    d = check_det_dataset(synth_data)
    results = tiny_model.predict(d["val"], imgsz=128, conf=0.01)
    assert len(results) == 8
    r = results[0]
    assert r.boxes is not None
    assert r.speed["inference"] is not None
    im = r.plot()
    assert im.shape == r.orig_img.shape
    assert isinstance(r.to_json(), str)


def test_val_e2e(synth_data, tiny_model):
    metrics = tiny_model.val(data=synth_data, imgsz=128, batch=4)
    # random weights -> tiny mAP, but the pipeline must produce finite stats
    assert np.isfinite(metrics.box.map50)
    assert "metrics/mAP50-95(B)" in metrics.results_dict


def test_train_e2e(synth_data, tmp_path):
    """Two epochs on synthetic shapes: loss must be finite and decrease."""
    from ultralytics_pro_tpu import YOLO

    model = YOLO("yolov8n.yaml")
    # device=1: this box has a single CPU core, so multi-partition collectives
    # trip XLA's 40s rendezvous timeout; the sharded path is covered by
    # __graft_entry__.dryrun_multichip on tiny shapes
    model.train(
        data=synth_data, epochs=2, imgsz=128, batch=4, workers=2, val=False,
        close_mosaic=0, mosaic=0.0, project=str(tmp_path), name="t", max_gt=32,
        warmup_epochs=0.5, device=1,
    )
    losses = model.trainer.epoch_losses
    assert all(np.isfinite(v) for v in losses.values()), losses
    assert (tmp_path / "t" / "weights" / "last.ckpt").exists()


def test_checkpoint_roundtrip(synth_data, tmp_path):
    from ultralytics_pro_tpu import YOLO

    model = YOLO("yolov8n.yaml")
    model.model.init_params(imgsz=128)
    p = model.save(str(tmp_path / "m.ckpt"))
    model2 = YOLO(p)
    assert model2.task == "detect"
    import jax

    n1 = sum(x.size for x in jax.tree.leaves(model.model.variables["params"]))
    n2 = sum(x.size for x in jax.tree.leaves(model2.model.variables["params"]))
    assert n1 == n2


def test_rect_val_buckets(synth_data, tmp_path):
    """rect=True (reference base.py set_rectangle): aspect-sorted batches get
    per-bucket stride-multiple shapes; one jit specialization per bucket."""
    import cv2
    from pathlib import Path

    from ultralytics_pro_tpu.data.dataset import YOLODataset
    from ultralytics_pro_tpu.data.utils import check_det_dataset

    d = check_det_dataset(synth_data)
    # clone train images with diverse aspect ratios
    src = sorted(Path(d["train"]).glob("*.jpg"))
    root = tmp_path / "rect"; root.mkdir()
    for i, f in enumerate(src[:8]):
        im = cv2.imread(str(f))
        im = cv2.resize(im, (320, 128) if i % 2 == 0 else (120, 288))
        cv2.imwrite(str(root / f.name), im)
        lbl = Path(str(f).replace("images", "labels")).with_suffix(".txt")
        if lbl.exists():
            (root / lbl.name).write_text(lbl.read_text())

    ds = YOLODataset(str(root), imgsz=128, data=d, rect=True, batch_size=4)
    assert len({ds[i]["img"].shape for i in range(4)}) == 1  # intra-batch uniform
    assert ds[0]["img"].shape != ds[7]["img"].shape  # buckets differ
    assert all(s % 32 == 0 for s in ds[0]["img"].shape[:2])  # stride multiples
