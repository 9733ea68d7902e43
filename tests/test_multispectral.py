"""Multispectral (channels > 3) end-to-end path (VERDICT r2 Next #10;
reference cfg/datasets/coco8-multispectral.yaml): 10-band .npy stacks through
the loader, letterbox, mosaic/affine (channel-chunked warps), a re-stemmed
10-channel model, one train epoch, and val."""

import numpy as np
import pytest

from ultralytics_pro_tpu import YOLO

pytestmark = pytest.mark.slow


def test_multispectral_train_val(tmp_path):
    from ultralytics_pro_tpu.data.synth import make_synth_dataset

    data_yaml = make_synth_dataset(tmp_path / "ms", n_images=8, imgsz=96, nc=3,
                                   seed=3, channels=10)
    model = YOLO("yolov8n.yaml")
    model.train(data=str(data_yaml), epochs=1, imgsz=96, batch=4, workers=2,
                mosaic=1.0, warmup_epochs=0.0, val=False, plots=False,
                project=str(tmp_path / "runs"))
    # the model was re-stemmed for 10 input channels
    assert model.model.ch == 10
    k = model.model.variables["params"]["layers_0"]["conv"]["kernel"]
    assert k.shape[2] == 10, k.shape
    losses = model.trainer.loss_history[-1]
    assert all(np.isfinite(v) for v in losses.values()), losses

    metrics = model.val(data=str(data_yaml), imgsz=96, batch=4)
    assert np.isfinite(metrics.box.map50)


def test_multispectral_loader_shapes(tmp_path):
    import yaml

    from ultralytics_pro_tpu.data.build import DataLoader
    from ultralytics_pro_tpu.data.dataset import YOLODataset
    from ultralytics_pro_tpu.data.synth import make_synth_dataset

    data_yaml = make_synth_dataset(tmp_path / "ms", n_images=8, imgsz=96, nc=3,
                                   seed=3, channels=10)
    d = yaml.safe_load(open(data_yaml))
    d["names"] = {int(k): v for k, v in d["names"].items()}
    import os

    root = os.path.dirname(str(data_yaml))
    ds = YOLODataset(os.path.join(root, "images/train"), imgsz=96, augment=True,
                     hyp={"mosaic": 1.0}, data=d, task="detect")
    loader = DataLoader(ds, batch_size=4, shuffle=False, drop_last=True, max_gt=16,
                        workers=2)
    batch = next(iter(loader))
    assert batch["img"].shape == (4, 96, 96, 10), batch["img"].shape
    assert batch["img"].dtype == np.uint8
    # bands differ (not replicated RGB)
    assert not np.array_equal(batch["img"][..., 0], batch["img"][..., 5])
