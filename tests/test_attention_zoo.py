"""Attention-zoo modules: deformable sampling correctness + module forwards +
the yolov8-att model build (BASELINE config #5)."""

import numpy as np
import pytest


def test_deform_conv2d_zero_offsets_equals_conv():
    """With zero offsets and all-ones mask, deformable conv == standard conv."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.ops.deform import deform_conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 9, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4)), jnp.float32)
    offsets = jnp.zeros((2, 9, 9, 18))
    mask = jnp.ones((2, 9, 9, 9))
    got = jax.jit(lambda x, w: deform_conv2d(x, offsets, w, mask=mask, padding=1))(x, w)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_deform_conv2d_shift_offsets():
    """A constant integer offset shifts the sampled field exactly."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.ops.deform import deform_conv2d

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    w = jnp.zeros((3, 3, 3, 3))
    w = w.at[1, 1].set(jnp.eye(3))  # identity 1-tap kernel
    # shift by (dy=0, dx=1): output(y, x) = input(y, x+1)
    offsets = jnp.zeros((1, 8, 8, 18)).at[..., 2 * 4 + 1].set(1.0)  # tap 4 = center
    got = deform_conv2d(x, offsets, w, padding=1)
    want = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    np.testing.assert_allclose(np.asarray(got)[:, :, :-1], np.asarray(want)[:, :, :-1], atol=1e-5)


@pytest.mark.parametrize("name", [
    "MHSA", "BoT3", "CoordAtt", "DCNv2", "C2f_DCN", "C3_DCN", "deformable_LKA",
    "deformable_LKA_Attention", "C2f_DLKA", "SEAttention", "ECAAttention", "SimAM", "EMA",
    "GAMAttention", "CrissCrossAttention", "SKAttention", "TripletAttention",
    "ShuffleAttention", "LSKblock", "ASPP", "EffectiveSE", "CoordConv", "DSConv",
    "SegNext_Attention", "DAttention",
])
def test_attention_module_forward(name):
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules import attention as A

    cls = getattr(A, name)
    kwargs = {}
    if hasattr(cls, "c2"):
        kwargs["c2"] = 32
    m = cls(**kwargs)
    x = jnp.zeros((1, 16, 16, 32))
    v = jax.jit(lambda x: m.init(jax.random.PRNGKey(0), x, train=False))(x)
    y = m.apply(v, x, train=False)
    assert y.shape[0] == 1 and y.shape[1] == 16 and y.shape[2] == 16


def test_yolov8_att_model_builds():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n-att.yaml")
    assert tuple(m.stride) == (8, 16, 32)
    v = m.init_params(imgsz=64)
    x = jnp.zeros((1, 64, 64, 3))
    y, aux = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert y.shape[-1] == 84


def test_carafe_upsamples_2x():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.attention import CARAFE

    m = CARAFE()
    x = jnp.zeros((1, 16, 16, 32))
    v = jax.jit(lambda x: m.init(jax.random.PRNGKey(0), x, train=False))(x)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 32, 32, 32)


def test_attention_stragglers_forward():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ultralytics_pro_tpu.nn.modules import attention as A

    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 16, 16, 32)).astype(np.float32))
    for cls, kw, shape in [
        (A.LSKA, dict(k=11), (1, 16, 16, 32)),
        (A.CPCA, dict(), (1, 16, 16, 32)),
        (A.FocusedLinearAttention, dict(num_heads=4), (1, 16, 16, 32)),
        (A.Yolov7_Tiny_E_ELAN, dict(c2=32), (1, 16, 16, 32)),
        (A.Yolov7_E_ELAN, dict(c2=32, in_c=16), (1, 16, 16, 32)),
        (A.V7DownSampling, dict(c2=32), (1, 8, 8, 32)),
    ]:
        mod = cls(**kw)
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        y = mod.apply(v, x, train=False)
        assert y.shape == shape, cls.__name__
        assert bool(jnp.isfinite(y).all()), cls.__name__

    from ultralytics_pro_tpu.nn.tasks import BUILDERS

    for nm in ("LSKA", "CPCA", "FocusedLinearAttention", "Yolov7_Tiny_E_ELAN",
               "Yolov7_E_ELAN", "V7DownSampling"):
        assert nm in BUILDERS


def test_asf_afpn_modules():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ultralytics_pro_tpu.nn.modules import asf_afpn as M

    rng = np.random.default_rng(0)
    p3 = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 32)).astype(np.float32))
    p4 = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 64)).astype(np.float32))
    p5 = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 128)).astype(np.float32))

    zc = M.Zoom_cat()
    v = zc.init(jax.random.PRNGKey(0), [p3, p4, p5], train=False)
    y = zc.apply(v, [p3, p4, p5], train=False)
    assert y.shape == (1, 8, 8, 32 + 64 + 128)

    ss = M.ScalSeq(channel=64)
    v = ss.init(jax.random.PRNGKey(0), [p3, p4, p5], train=False)
    y = ss.apply(v, [p3, p4, p5], train=False)
    assert y.shape == (1, 16, 16, 64)

    am = M.attention_model()
    v = am.init(jax.random.PRNGKey(0), p3, train=False)
    assert am.apply(v, p3, train=False).shape == p3.shape

    a2 = M.ASFF_2()
    v = a2.init(jax.random.PRNGKey(0), [p3, p3], train=False)
    assert a2.apply(v, [p3, p3], train=False).shape == p3.shape

    afpn = M.AFPN(c2=64, n=1)
    v = afpn.init(jax.random.PRNGKey(0), [p3, p4, p5], train=False)
    outs = afpn.apply(v, [p3, p4, p5], train=False)
    assert [o.shape for o in outs] == [(1, 16, 16, 64), (1, 8, 8, 64), (1, 4, 4, 64)]

    from ultralytics_pro_tpu.nn.tasks import BUILDERS

    for nm in ("Zoom_cat", "ScalSeq", "Add", "attention_model", "ASFF_2",
               "ASFF_3", "AFPN"):
        assert nm in BUILDERS


def test_misc_blocks_forward():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ultralytics_pro_tpu.nn.modules import misc_blocks as M

    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 16, 16, 32)).astype(np.float32))
    for cls, kw, shape in [
        (M.DySample, dict(scale=2, groups=4), (1, 32, 32, 32)),
        (M.ContextGuidedBlock, dict(c2=32), (1, 16, 16, 32)),
        (M.C2f_Context, dict(c2=32, n=1), (1, 16, 16, 32)),
        (M.DWR, dict(c2=32), (1, 16, 16, 32)),
        (M.C2f_DWRSeg, dict(c2=32, n=1), (1, 16, 16, 32)),
        (M.EVCBlock, dict(c2=32), (1, 16, 16, 32)),
        (M.Conv2FormerBlock, dict(), (1, 16, 16, 32)),
        (M.EPSA, dict(c2=32), (1, 16, 16, 32)),
        (M.FocalModulation, dict(), (1, 16, 16, 32)),
    ]:
        mod = cls(**kw)
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        y = mod.apply(v, x, train=False)
        assert y.shape == shape, cls.__name__
        assert bool(jnp.isfinite(y).all()), cls.__name__


def test_dysample_zero_offsets_is_nearest_like():
    """Zero offsets: each 2x2 output block samples inside its source pixel's
    neighborhood — upsampled map must interpolate the source smoothly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ultralytics_pro_tpu.nn.modules.misc_blocks import DySample

    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    mod = DySample(scale=2, groups=1)
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    v = jax.tree.map(jnp.zeros_like, v)  # zero the offset conv entirely
    y = np.asarray(mod.apply(v, x, train=False))[0, :, :, 0]
    assert y.shape == (8, 8)
    # means preserved under bilinear resampling of the interior
    assert abs(y[2:6, 2:6].mean() - np.asarray(x)[0, 1:3, 1:3, 0].mean()) < 0.6


def test_c3x_c3tr_blocks():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.block import C3TR, C3x

    x = jnp.zeros((1, 16, 16, 32))
    for cls in (C3x, C3TR):
        m = cls(c2=32, n=1)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        assert m.apply(v, x, train=False).shape == (1, 16, 16, 32)


def test_generic_csp_wrappers():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ultralytics_pro_tpu.nn.modules.csp_wrappers import INNER_REGISTRY, GenericC2f, GenericC3
    from ultralytics_pro_tpu.nn.tasks import BUILDERS

    # every registry entry produced 3 builders
    for suffix in INNER_REGISTRY:
        for topo in ("C2f", "C3", "C3k2"):
            assert f"{topo}_{suffix}" in BUILDERS, f"{topo}_{suffix}"

    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 16, 16, 32)).astype(np.float32))
    # forward a representative sample of inners across all three modes
    for suffix in ("ODConv", "TripletAt", "Star", "UniRepLKNetBlock", "RepVGG", "WTConv"):
        for cls in (GenericC2f, GenericC3):
            m = cls(c2=32, suffix=suffix, n=1)
            v = m.init(jax.random.PRNGKey(0), x, train=False)
            y = m.apply(v, x, train=False)
            assert y.shape == (1, 16, 16, 32), (cls.__name__, suffix)
            assert bool(jnp.isfinite(y).all()), (cls.__name__, suffix)
