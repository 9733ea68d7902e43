"""Family zoo tranche 3: every new family yaml builds and forwards.

Covers RTMDet, PicoDet, HEYDet, LeYOLO, hyper-yolo, MAF-YOLOv2, PST,
RCS-YOLO, S-YOLO, yolor-R, ALSS, CST, FBRT, BGF (detect) and YOLACT
(segment)."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ultralytics_pro_tpu.nn.tasks import DetectionModel, SegmentationModel

DETECT_YAMLS = [
    "rtmdet-s.yaml",
    "picodet-s.yaml",
    "heydet-n.yaml",
    "leyolo-n.yaml",
    "hyper-yolo-n.yaml",
    "maf-yolov2-n.yaml",
    "r18-pst-n.yaml",
    "rcs-yolo.yaml",
    "syolo.yaml",
    "yolor-csp.yaml",
    "alss-yolo-n.yaml",
    "cst-yolo.yaml",
    "fbrt-yolo-n.yaml",
    "bgf-yolo-n.yaml",
]

X = jnp.asarray(np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3)) / 255.0,
                jnp.float32)


@pytest.mark.parametrize("yaml_name", DETECT_YAMLS)
def test_family_detect_builds_and_forwards(yaml_name):
    m = DetectionModel(yaml_name)
    variables = m.init_params(imgsz=64)
    y, _ = m.apply(variables, X, train=False)
    # standard heads: (B, A, 4+nc); end2end (v10Detect): (B, max_det, 6)
    assert y.ndim == 3 and y.shape[-1] in (4 + m.nc, 6), yaml_name
    assert bool(jnp.isfinite(y).all()), yaml_name


def test_yolact_segment_builds_and_forwards():
    m = SegmentationModel("yolact-r50.yaml")
    variables = m.init_params(imgsz=64)
    out, aux = m.apply(variables, X, train=False)
    assert bool(jnp.isfinite(out).all())


def test_family_train_mode_smoke():
    """One family runs a mutable train-mode forward (BN updates)."""
    m = DetectionModel("rtmdet-s.yaml")
    variables = m.init_params(imgsz=64)
    out, mut = m.module.apply(variables, X, train=True, mutable=["batch_stats"])
    assert mut["batch_stats"]


@pytest.mark.parametrize("yaml_name", [
    "rtmdet-s-seg.yaml", "hyper-yolo-n-seg.yaml", "picodet-s-seg.yaml",
    "heydet-n-seg.yaml",
])
def test_family_seg_variants(yaml_name):
    from ultralytics_pro_tpu.nn.tasks import SegmentationModel

    m = SegmentationModel(yaml_name)
    v = m.init_params(imgsz=64)
    out, aux = m.apply(v, X, train=False)
    assert bool(jnp.isfinite(out).all()), yaml_name


def test_channel_variants_build():
    """Grayscale (ch=1) and multispectral (ch=10) model builds (reference
    coco8-grayscale / coco8-multispectral dataset lineage)."""
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    for ch in (1, 10):
        m = DetectionModel("yolov8n.yaml", ch=ch)
        v = m.init_params(imgsz=64)
        y, _ = m.apply(v, jnp.zeros((1, 64, 64, ch)), train=False)
        assert y.shape[-1] == 4 + m.nc, ch


def test_profile_layers_table():
    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.utils.jax_utils import profile_layers

    m = DetectionModel("yolov8n.yaml")
    m.init_params(imgsz=64)
    rows = profile_layers(m, imgsz=64, repeats=1)
    assert len(rows) == 23 and rows[-1]["type"] == "Detect"
    assert all(r["ms"] >= 0 and r["params"] >= 0 for r in rows)


@pytest.mark.parametrize("yaml_name", ["yolov8n-asf.yaml", "yolov8n-afpn.yaml"])
def test_asf_afpn_yamls(yaml_name):
    m = DetectionModel(yaml_name)
    v = m.init_params(imgsz=64)
    y, _ = m.apply(v, X, train=False)
    assert y.shape[-1] == 4 + m.nc and bool(jnp.isfinite(y).all()), yaml_name


@pytest.mark.parametrize("yaml_name", ["rtmdet-s-pose.yaml", "hyper-yolo-n-pose.yaml"])
def test_family_pose_variants(yaml_name):
    from ultralytics_pro_tpu.nn.tasks import PoseModel

    m = PoseModel(yaml_name)
    v = m.init_params(imgsz=64)
    out, aux = m.apply(v, X, train=False)
    assert bool(jnp.isfinite(out).all()), yaml_name


def test_hyper_yolo_train_step(tmp_path):
    """HyperComputeModule (hypergraph message passing) under grad: one
    jitted train step stays finite."""
    import jax

    from ultralytics_pro_tpu.engine.trainer import DetectionTrainer

    m = DetectionModel("hyper-yolo-n.yaml", nc=3)
    m.init_params(imgsz=64)
    tr = DetectionTrainer(m, {"epochs": 1, "batch": 2, "imgsz": 64,
                              "project": str(tmp_path), "name": "h"})
    step = tr.build_train_step()
    variables = m.variables
    params = variables["params"]
    state = (params, variables["batch_stats"],
             jax.tree.map(jnp.zeros_like, params),
             jax.tree.map(jnp.copy, params),
             jnp.zeros((), jnp.int32),
             jax.tree.map(jnp.zeros_like, params))
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8),
        "cls": rng.integers(0, 3, (2, 4)).astype(np.float32),
        "bboxes": np.tile(np.array([[0.5, 0.5, 0.4, 0.4]], np.float32), (2, 4, 1)),
        "mask_gt": np.tile(np.array([1, 1, 0, 0], bool), (2, 1)),
    }
    db = tr.put_batch(batch)
    state, total, parts = step(state, db, jnp.asarray([0.01] * 3, jnp.float32),
                               jnp.float32(0.9), jnp.asarray(True))
    assert np.isfinite(float(total)), parts
