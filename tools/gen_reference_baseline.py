"""Measure the torch reference (at /root/reference) on a shared synthetic
dataset and export its weights + val metrics for the mAP-parity test.

Run once offline:  python tools/gen_reference_baseline.py

Outputs (consumed by tests/test_val_parity.py and BASELINE.md):
- tests/fixtures/val_parity_model.npz  — reference-trained yolov8n state_dict
- tests/fixtures/val_parity_ref.json   — reference validator metrics on the
  shared val split (mAP50, mAP50-95, P, R) + the exact val() arguments

The reference tree is EXECUTED here to record expected numerics — no code is
copied from it. The dataset is regenerated deterministically on both sides
(tests/make_synth_dataset.py, same seed/args), so nothing large is committed.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# dataset args shared with tests/test_val_parity.py — keep in sync
DATASET_ARGS = dict(n_images=16, imgsz=160, nc=3, seed=7, max_objects=4, size_jitter=True)
VAL_ARGS = dict(imgsz=160, rect=False, conf=0.001, iou=0.7, max_det=300)
TRAIN_EPOCHS = 200

# task -> (model yaml, fixture stem); detect keeps round-2's legacy filenames
TASKS = {
    "detect": ("yolov8n.yaml", "val_parity"),
    "segment": ("yolov8n-seg.yaml", "val_parity_segment"),
    "pose": ("yolov8n-pose.yaml", "val_parity_pose"),
    "obb": ("yolov8n-obb.yaml", "val_parity_obb"),
}


def main(task: str = "detect"):
    from tests.make_synth_dataset import make_synth_dataset

    model_yaml, stem = TASKS[task]
    ds_args = dict(DATASET_ARGS)
    if task != "detect":
        ds_args["task"] = task
    data_yaml = make_synth_dataset(f"/tmp/{stem}_synth", **ds_args)

    # pre-import torch._dynamo (pulls sympy) BEFORE the catch-all stub finder
    # lands: its optional `flint`/`triton` imports must fail cleanly —
    # stubbing them breaks dynamo at reference-train time
    try:
        import torch._dynamo  # noqa: F401
    except Exception:
        pass
    # installs the torchvision/optional-deps stubs and /root/reference on path
    import tests.fixtures.gen_fixtures  # noqa: F401
    import torch

    # the stub torchvision raises on ops.nms, but the reference prefers
    # torchvision when the module is imported (utils/nms.py:151) — point the
    # stub at the reference's OWN exact-match TorchNMS implementation
    from ultralytics.utils.nms import TorchNMS

    sys.modules["torchvision"].ops.nms = TorchNMS.nms
    sys.modules["torchvision.ops"].nms = TorchNMS.nms

    torch.manual_seed(0)
    from ultralytics import YOLO

    model = YOLO(model_yaml)
    t0 = time.time()
    model.train(
        data=str(data_yaml), epochs=TRAIN_EPOCHS, imgsz=160, batch=8, workers=0,
        device="cpu", seed=0, deterministic=True, val=False, plots=False,
        mosaic=0.0, scale=0.0, translate=0.0, fliplr=0.0, hsv_h=0.0, hsv_s=0.0,
        hsv_v=0.0, erasing=0.0, close_mosaic=0, amp=False,
        warmup_epochs=0.0, nbs=8,  # tiny set: no warmup floor, accumulate=1 -> real optimizer steps
        project="/tmp/val_parity_ref_runs", name="train", exist_ok=True,
    )
    train_s = time.time() - t0
    print(f"reference train: {TRAIN_EPOCHS} epochs in {train_s:.1f}s CPU")

    # capture the UNFUSED state dict now: val() fuses Conv+BN in place via
    # AutoBackend, and the importer expects the conv(no-bias)+BN layout
    sd = {f"sd::{k}": v.detach().cpu().numpy()
          for k, v in model.model.state_dict().items()}
    np.savez_compressed(REPO / f"tests/fixtures/{stem}_model.npz", **sd)

    t0 = time.time()
    metrics = model.val(data=str(data_yaml), plots=False, device="cpu",
                        project="/tmp/val_parity_ref_runs", name="val",
                        exist_ok=True, **VAL_ARGS)
    val_s = time.time() - t0
    rd = {k: float(v) for k, v in metrics.results_dict.items()}
    print("reference val:", rd, f"({val_s:.1f}s CPU)")

    out = {
        "task": task,
        "model_yaml": model_yaml,
        "dataset_args": ds_args,
        "val_args": VAL_ARGS,
        "train_epochs": TRAIN_EPOCHS,
        "results": rd,
        "speed_ms_per_img": {k: float(v) for k, v in metrics.speed.items()},
        "train_seconds_cpu": round(train_s, 1),
        "torch": torch.__version__,
    }
    with open(REPO / f"tests/fixtures/{stem}_ref.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {stem}_model.npz + {stem}_ref.json")


if __name__ == "__main__":
    for t in (sys.argv[1:] or ["detect"]):
        main(t)
