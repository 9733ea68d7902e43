"""Module-zoo tranche 2 build+forward smokes: gold-yolo gather-and-distribute,
damo-yolo GFPN (CSPStage + MobileNetV3 backbone), PPYOLOE CSPResNet, Slim-Neck
(GSConv/VoVGSCSP) and Bi_FPN variants (reference: nn/modules/block.py
goldyolo:2960-3238, damoyolo.py, ppyolo.py, Slimneck.py, BiFPN.py)."""

import numpy as np
import pytest


@pytest.mark.parametrize("cfg", [
    "goldyolo-n.yaml",
    "damoyolo-m.yaml",
    "ppyoloe.yaml",
    "yolo11n-slimneck.yaml",
    "yolo11n-bifpn.yaml",
])
@pytest.mark.slow
def test_tranche2_families_forward(cfg):
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel(cfg)
    v = m.init_params(imgsz=64)
    y, aux = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, jnp.zeros((1, 64, 64, 3)))
    assert y.shape[-1] == 84
    assert np.isfinite(np.asarray(y)).all()


def test_gsconv_shuffle_semantics():
    """GSConv output must interleave dense/cheap halves like the torch
    reshape-permute shuffle (even channels then odd channels)."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.necks import GSConv

    x = jnp.ones((1, 8, 8, 16))
    m = GSConv(c2=16)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 8, 8, 16)


def test_bifpn_weighted_sum():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.necks import Bi_FPN

    xs = [jnp.ones((1, 4, 4, 8)), 3 * jnp.ones((1, 4, 4, 8))]
    m = Bi_FPN(length=2)
    v = m.init(jax.random.PRNGKey(0), xs)
    y = m.apply(v, xs)
    # init weights are ones -> w_norm = 1/(2*silu(1)) each; sum = 4*w
    expect = 4.0 / (2 * float(jax.nn.silu(jnp.array(1.0))) + 1e-4)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4)


def test_cspstage_dense_aggregation():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.necks import CSPStage

    x = jnp.ones((1, 8, 8, 32))
    m = CSPStage(c2=64, n=2)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 8, 8, 64)


@pytest.mark.slow
def test_yolov13_hyperace_forward():
    """v13: HyperACE hypergraph enhancement + FullPAD gated distribution
    (reference block.py:7356,7445; cfg/models/v13/Detect/yolov13.yaml)."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov13n.yaml")
    v = m.init_params(imgsz=64)
    y, aux = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, jnp.zeros((1, 64, 64, 3)))
    assert y.shape[-1] == 84
    assert m.stride == (8, 16, 32)
    assert np.isfinite(np.asarray(y)).all()
