"""Round-5 advisor-finding regressions (ADVICE.md round 4).

1. high   — registry closure: covered by test_registry_closure.py after the
   generator fixes (EMO/EMO2/iformer reference configs, MLLA head divisor).
2. medium — TransformerEncoderLayer builder must construct AIFI with its real
   field names (cm/num_heads), not hidden=/heads=.
3. medium — MSDeformAttn / DeformableTransformerDecoder(Layer) /
   ContrastiveHead / BNContrastiveHead as plain YAML rows must not crash with
   an opaque positional TypeError: they ride grid-reference adapters
   (zoo_r4.GridDeformAttn/GridDeformDecoderLayer/ContrastiveAdapter).
4. low    — the fft global-filter mixer stores its spectral filter on a fixed
   base grid so one checkpoint serves every input resolution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _build_forward(rows, ch=3, imgsz=64):
    """Build a tiny detect model from explicit YAML rows and forward it."""
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    cfg = {
        "nc": 4,
        "backbone": rows,
        "head": [
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [[-3, -2, -1], 1, "Detect", ["nc"]],
        ],
    }
    m = DetectionModel(cfg)
    m.init_params(imgsz=imgsz)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, imgsz, imgsz, 3)),
                    jnp.float32)
    out = m.module.apply(m.variables, x, train=False)
    y = out[0] if isinstance(out, tuple) else out
    assert np.all(np.isfinite(np.asarray(y, np.float32)))
    return m


def test_transformer_encoder_layer_builds_aifi():
    _build_forward([
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "TransformerEncoderLayer", [64, 128, 4]],
    ])


@pytest.mark.parametrize("name,args", [
    ("MSDeformAttn", [64]),
    ("DeformableTransformerDecoderLayer", [64]),
    ("DeformableTransformerDecoder", [64]),
])
def test_deformable_rows_forward(name, args):
    _build_forward([
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, name, args],
    ])


def test_contrastive_head_clean_error_on_single_input():
    from ultralytics_pro_tpu.nn.modules.zoo_r4 import ContrastiveAdapter

    m = ContrastiveAdapter()
    x = jnp.ones((1, 8, 8, 32))
    with pytest.raises(ValueError, match="two YAML inputs"):
        m.init_with_output(jax.random.PRNGKey(0), x, train=False)
    # two-input form works
    w = jnp.ones((1, 5, 32))
    y, _ = m.init_with_output(jax.random.PRNGKey(0), [x, w], train=False)
    assert y.shape == (1, 8, 8, 5)


def test_fft_mixer_resolution_independent_params():
    """cdfformer/gfformer filters live at a fixed base grid: params from a
    64px trace must apply unchanged at 128px (ADVICE r4 low)."""
    from ultralytics_pro_tpu.nn.modules.backbones4 import StageBackbone

    m = StageBackbone(dims=(16, 32, 64, 128), depths=(1, 1, 1, 1),
                      mixers="fft")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    flat = jax.tree_util.tree_leaves_with_path(v["params"])
    filt_shapes = [l.shape for p, l in flat if "filt_re" in str(p)]
    assert filt_shapes and all(s[:2] == (16, 9) for s in filt_shapes), filt_shapes
    outs = m.apply(v, jnp.zeros((1, 128, 128, 3)), train=False)
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o, np.float32)))


def test_mlla_heads_divide_channels():
    """MLLABlock must pick a head count dividing c (c=224 previously crashed
    reshaping 224 -> 3 heads)."""
    from ultralytics_pro_tpu.nn.modules.zoo_r3 import MLLABlock

    m = MLLABlock()
    x = jnp.ones((1, 8, 8, 224))
    y, _ = m.init_with_output(jax.random.PRNGKey(0), x, train=False)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y, np.float32)))
