"""Attention-variant YAML tree: every yolov5-<att>/yolov8-<att> variant
builds and forwards (mirrors the reference's per-module config lineage)."""

import glob
from pathlib import Path

import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

ROOT = Path(__file__).parents[1] / "ultralytics_pro_tpu" / "cfg" / "models"

VARIANTS = sorted(
    p.name for v in ("v5", "v8") for p in (ROOT / v).glob(f"yolo{v}-*.yaml")
    if p.name.split("-", 1)[1][0].isupper()  # module-swap variants only
)


def test_variant_inventory_nonempty():
    assert len(VARIANTS) >= 40


@pytest.mark.parametrize("yaml_name", VARIANTS[::4])  # sample every 4th (10 builds)
def test_variant_builds_and_forwards(yaml_name):
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    stem = yaml_name.replace(".yaml", "")
    m = DetectionModel(f"{stem}.yaml")
    v = m.init_params(imgsz=64)
    y, _ = m.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.shape[-1] == 4 + m.nc and bool(jnp.isfinite(y).all()), yaml_name


def test_all_variants_parse():
    """Every variant yaml at least parses + builds specs (no forward)."""
    from ultralytics_pro_tpu.nn.tasks import parse_model, yaml_model_load

    for name in VARIANTS:
        d = yaml_model_load(name)
        specs, save, meta = parse_model(d, ch=3, nc=80, scale=d.get("scale") or "n")
        assert len(specs) > 20, name
