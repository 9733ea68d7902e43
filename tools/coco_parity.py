"""One-command COCO mAP parity: reference stack vs this framework.

The headline claim (yolov8s 44.9 mAP50-95 on COCO) is unverifiable in this
sandbox — no egress, no COCO, no official .pt. This tool makes the claim
provable the day the artifacts exist (VERDICT r3 Next #7): given a local
dataset YAML and a torch checkpoint it runs BOTH validators end-to-end and
diffs mAP50 / mAP50-95 / speed:

    python tools/coco_parity.py --data /data/coco.yaml --weights yolov8s.pt
    python tools/coco_parity.py --dryrun        # proves the flow today on
                                                # the committed 16-img synth
                                                # parity set + fixture weights

Results append to tools/.coco_parity.json; the printed table is the
BASELINE.md row. Reference entrypoint: /root/reference ultralytics
models/yolo/detect/val.py:447 (executed, never copied).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def run_reference_val(data_yaml: str, weights, imgsz: int, conf: float,
                      iou: float, max_det: int, nc=None) -> dict:
    """Execute the torch reference validator. `weights` is a .pt path or an
    already-built state_dict (the dryrun path injects fixture weights)."""
    try:
        import torch._dynamo  # noqa: F401  (pre-import before stub finder)
    except Exception:  # noqa: BLE001
        pass
    import tests.fixtures.gen_fixtures  # noqa: F401  (stubs + ref on path)
    import torch

    from ultralytics import YOLO as RefYOLO  # reference package

    if isinstance(weights, (str, Path)):
        model = RefYOLO(str(weights))
    else:
        yaml_name, sd = weights
        model = RefYOLO(yaml_name)
        if nc is not None:
            from ultralytics.nn.tasks import DetectionModel as RefDet

            y = dict(model.model.yaml)
            y["nc"] = nc
            model.model = RefDet(y, verbose=False)
        tensors = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
        missing, unexpected = model.model.load_state_dict(tensors, strict=False)
        assert not unexpected, unexpected[:5]
    t0 = time.time()
    m = model.val(data=str(data_yaml), imgsz=imgsz, conf=conf, iou=iou,
                  max_det=max_det, plots=False, verbose=False, device="cpu")
    dt = time.time() - t0
    return {"mAP50": float(m.box.map50), "mAP50-95": float(m.box.map),
            "precision": float(m.box.mp), "recall": float(m.box.mr),
            "wall_s": round(dt, 1)}


def run_ours_val(data_yaml: str, weights, model_yaml: str, imgsz: int,
                 conf: float, iou: float, max_det: int, nc=None) -> dict:
    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.nn.tasks import yaml_model_load
    from ultralytics_pro_tpu.utils.torch_import import load_torch_state_dict

    y = yaml_model_load(model_yaml)
    if nc is not None:
        y["nc"] = nc
    model = YOLO(y)
    variables = model.model.init_params(imgsz=imgsz)
    if isinstance(weights, (str, Path)):
        sd = load_pt_state_dict(str(weights))
    else:
        sd = weights
    model.model.variables = load_torch_state_dict(variables, sd, strict=True)
    t0 = time.time()
    m = model.val(data=str(data_yaml), imgsz=imgsz, batch=8, conf=conf,
                  iou=iou, max_det=max_det)
    dt = time.time() - t0
    return {"mAP50": float(m.box.map50), "mAP50-95": float(m.box.map),
            "precision": float(m.box.mp), "recall": float(m.box.mr),
            "wall_s": round(dt, 1)}


def load_pt_state_dict(path: str) -> dict:
    """Official ultralytics .pt -> float numpy state_dict (unpickling the
    checkpoint requires the reference package importable, which the
    gen_fixtures stub layer provides)."""
    import tests.fixtures.gen_fixtures  # noqa: F401
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    model = ck.get("ema") or ck["model"]
    return {k: v.float().numpy() for k, v in model.float().state_dict().items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", help="dataset YAML (e.g. a local coco.yaml)")
    ap.add_argument("--weights", help="official .pt checkpoint")
    ap.add_argument("--model", default=None,
                    help="model YAML for our stack (default: weights stem)")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--iou", type=float, default=0.7)
    ap.add_argument("--max-det", type=int, default=300)
    ap.add_argument("--skip-reference", action="store_true",
                    help="only run our stack (e.g. torch unavailable)")
    ap.add_argument("--dryrun", action="store_true",
                    help="run the full two-stack flow on the committed "
                         "synthetic parity set + fixture weights")
    args = ap.parse_args()

    if args.dryrun:
        from tests.make_synth_dataset import make_synth_dataset

        fx_npz = REPO / "tests" / "fixtures" / "val_parity_model.npz"
        fx_ref = json.loads((REPO / "tests" / "fixtures" / "val_parity_ref.json")
                            .read_text())
        data_yaml = make_synth_dataset("/tmp/coco_parity_dryrun",
                                       **fx_ref["dataset_args"])
        fx = dict(np.load(fx_npz))
        sd = {k[4:]: v for k, v in fx.items() if k.startswith("sd::")}
        imgsz = fx_ref["val_args"]["imgsz"]
        nc = fx_ref["dataset_args"]["nc"]
        ours = run_ours_val(data_yaml, sd, "yolov8n.yaml", imgsz,
                            args.conf, args.iou, args.max_det, nc=nc)
        ref = (None if args.skip_reference else run_reference_val(
            data_yaml, ("yolov8n.yaml", sd), imgsz, args.conf, args.iou,
            args.max_det, nc=nc))
        tag = "dryrun-synth16"
    else:
        if not (args.data and args.weights):
            ap.error("--data and --weights are required (or --dryrun)")
        model_yaml = args.model or (Path(args.weights).stem + ".yaml")
        ours = run_ours_val(args.data, args.weights, model_yaml, args.imgsz,
                            args.conf, args.iou, args.max_det)
        ref = (None if args.skip_reference else run_reference_val(
            args.data, args.weights, args.imgsz, args.conf, args.iou,
            args.max_det))
        tag = f"{Path(args.weights).stem}@{Path(args.data).stem}"

    row = {"tag": tag, "ours": ours, "reference": ref,
           "date": time.strftime("%Y-%m-%d %H:%M")}
    print(f"\n== COCO parity [{tag}] ==")
    hdr = f"{'stack':<12} {'mAP50':>8} {'mAP50-95':>9} {'P':>7} {'R':>7} {'wall_s':>8}"
    print(hdr)
    for name, r in (("ours", ours), ("reference", ref)):
        if r:
            print(f"{name:<12} {r['mAP50']:>8.4f} {r['mAP50-95']:>9.4f} "
                  f"{r['precision']:>7.4f} {r['recall']:>7.4f} {r['wall_s']:>8}")
    if ref:
        d50 = ours["mAP50"] - ref["mAP50"]
        d95 = ours["mAP50-95"] - ref["mAP50-95"]
        print(f"{'delta':<12} {d50:>+8.4f} {d95:>+9.4f}")
        row["delta"] = {"mAP50": round(d50, 4), "mAP50-95": round(d95, 4)}

    out = Path(__file__).parent / ".coco_parity.json"
    hist = json.loads(out.read_text()) if out.exists() else []
    hist.append(row)
    out.write_text(json.dumps(hist, indent=1))
    print(f"recorded -> {out}")


if __name__ == "__main__":
    main()
