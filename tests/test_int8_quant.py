"""PTQ int8 serving path (nn/quantize.py): quantized-conv numerics, qtable
eligibility, end-to-end agreement with the f32 model, and the BaseModel
routing. Reference analog: TRT-INT8 deployment / exporter int8 args."""

import numpy as np
import pytest


def test_quantized_conv_matches_float_within_quant_noise():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ultralytics_pro_tpu.nn.quantize import (build_qtable, collect_conv_stats,
                                                 quantized_apply)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Conv(32, (3, 3), use_bias=False, name="c")(x)

    m = M()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 16)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)

    stats = collect_conv_stats(m, v, [x])
    assert ("c",) in stats and stats[("c",)] > 0
    qt = build_qtable(v, stats, min_ch=8, min_k=1)
    assert "c" in qt and qt["c"]["kernel"].dtype == jnp.int8
    assert qt["c"]["w_scale"].shape == (32,)

    ref = m.apply(v, x)
    qy = quantized_apply(m, qt)(v, x)
    denom = float(jnp.abs(ref).max())
    rel = float(jnp.abs(qy - ref).max()) / denom
    assert rel < 0.03, rel  # int8 symmetric PTQ noise, well under 3%


def test_bias_and_grouped_convs_stay_float():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ultralytics_pro_tpu.nn.quantize import build_qtable, collect_conv_stats

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(16, (3, 3), use_bias=False, name="q")(x)
            x = nn.Conv(16, (3, 3), use_bias=True, name="logits")(x)
            return x

    m = M()
    x = jnp.ones((1, 8, 8, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    qt = build_qtable(v, collect_conv_stats(m, v, [x]), min_ch=8, min_k=1)
    assert "q" in qt
    assert "logits" not in qt  # bias conv == final layer: stays f32


def test_model_e2e_int8_agrees_with_float():
    """yolov8n quantized: decoded boxes/conf agree with f32 closely enough
    that the top-k candidate sets overlap heavily."""
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.head import decode_single_label
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    v = m.init_params(imgsz=64)
    rng = np.random.default_rng(1)
    xs = [jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)) for _ in range(2)]

    y32, aux32 = m.apply(v, xs[0], train=False)
    qt = m.quantize_int8(xs, min_ch=8, min_k=1)  # max-coverage mode: worst-case noise
    # Conv+BN stacks of the model got quantized (stem, C2f, towers)
    assert len(qt) >= 30, len(qt)
    y8, aux8 = m.apply(v, xs[0], train=False)

    b32, c32, _ = decode_single_label(aux32["feats"], m.stride, m.nc)
    b8, c8, _ = decode_single_label(aux8["feats"], m.stride, m.nc)
    # confidences shift by quant noise but stay correlated
    c32n, c8n = np.asarray(c32).ravel(), np.asarray(c8).ravel()
    corr = np.corrcoef(c32n, c8n)[0, 1]
    assert corr > 0.98, corr
    # box centers at the mutual top-50 candidates stay within a few pixels
    top = np.argsort(-c32n)[:50]
    d = np.abs(np.asarray(b32).reshape(-1, 4)[top] - np.asarray(b8).reshape(-1, 4)[top])
    assert float(np.median(d)) < 3.0, float(np.median(d))


@pytest.mark.slow
def test_trained_model_int8_map_delta(tmp_path):
    """int8-quantize the reference-trained parity model (tests/fixtures:
    mAP50 0.905 on the shared synthetic set) with calibration on real val
    images and require the PTQ mAP drop stays small — the TRT-INT8 analog
    accuracy check."""
    import glob
    import json
    import os

    from PIL import Image

    from tests.conftest import FIXTURES
    from tests.make_synth_dataset import make_synth_dataset

    ref_json = os.path.join(FIXTURES, "val_parity_ref.json")
    ref_npz = os.path.join(FIXTURES, "val_parity_model.npz")
    if not os.path.exists(ref_json):
        pytest.skip("reference baseline not generated")

    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.nn.tasks import yaml_model_load
    from ultralytics_pro_tpu.utils.torch_import import load_torch_state_dict

    with open(ref_json) as f:
        ref = json.load(f)
    data_yaml = make_synth_dataset(tmp_path / "synth", **ref["dataset_args"])
    imgsz = ref["val_args"]["imgsz"]

    ycfg = yaml_model_load("yolov8n.yaml")
    ycfg["nc"] = ref["dataset_args"]["nc"]
    model = YOLO(ycfg)
    variables = model.model.init_params(imgsz=imgsz)
    fx = dict(np.load(ref_npz))
    sd = {k[4:]: v for k, v in fx.items() if k.startswith("sd::")}
    model.model.variables = load_torch_state_dict(variables, sd, strict=True)

    m32 = model.val(data=str(data_yaml), imgsz=imgsz, batch=8)
    base50, base = float(m32.box.map50), float(m32.box.map)
    assert base50 > 0.5, base50

    import jax.numpy as jnp

    paths = sorted(glob.glob(os.path.join(tmp_path / "synth", "images", "val", "*")))[:8]
    if not paths:
        paths = sorted(glob.glob(str(tmp_path / "synth" / "images" / "*" / "*")))[:8]
    imgs = np.stack([np.asarray(Image.open(p).convert("RGB").resize((imgsz, imgsz)))
                     for p in paths]).astype(np.float32) / 255.0
    qt = model.model.quantize_int8([jnp.asarray(imgs)], min_ch=8, min_k=1)
    assert len(qt) >= 30, len(qt)
    m8 = model.val(data=str(data_yaml), imgsz=imgsz, batch=8)
    q50, q = float(m8.box.map50), float(m8.box.map)
    print(f"f32 mAP50={base50:.4f}/{base:.4f}  int8 mAP50={q50:.4f}/{q:.4f}")
    assert q50 > base50 - 0.05, (base50, q50)
    assert q > base - 0.08, (base, q)
