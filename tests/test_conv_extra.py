"""Conv family tranche 2: shapes, invariants, and ODConv batch-grouped conv
equivalence with a per-sample loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultralytics_pro_tpu.nn.modules import conv_extra as C

X = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 12, 12, 8)).astype(np.float32))


@pytest.mark.parametrize("cls,kw,shape", [
    (C.Conv2, dict(c2=16, k=3, s=1), (2, 12, 12, 16)),
    (C.Conv2, dict(c2=16, k=3, s=2), (2, 6, 6, 16)),
    (C.AConv, dict(c2=16), (2, 6, 6, 16)),
    (C.AKConv, dict(c2=16, num_param=5), (2, 12, 12, 16)),
    (C.AKConv, dict(c2=16, num_param=7, s=2), (2, 6, 6, 16)),
    (C.LDConv, dict(c2=16, num_param=6), (2, 12, 12, 16)),
    (C.ODConv2d, dict(c2=16, k=3), (2, 12, 12, 16)),
    (C.RFAConv, dict(c2=16, k=3), (2, 12, 12, 16)),
    (C.RFCBAMConv, dict(c2=16, k=3), (2, 12, 12, 16)),
    (C.RFCAConv, dict(c2=16, k=3), (2, 12, 12, 16)),
    (C.FCM, dict(c2=8), (2, 12, 12, 8)),
    (C.BatchChannelNorm, dict(), (2, 12, 12, 8)),
    (C.DynamicTanh, dict(), (2, 12, 12, 8)),
])
def test_forward_shapes(cls, kw, shape):
    mod = cls(**kw)
    variables = mod.init(jax.random.PRNGKey(0), X, train=False)
    y = mod.apply(variables, X, train=False)
    assert y.shape == shape, cls.__name__
    assert bool(jnp.isfinite(y).all()), cls.__name__


def test_akconv_zero_offsets_matches_fixed_taps():
    """p_conv is zero-init: AKConv == gather at the static near-square grid."""
    mod = C.AKConv(c2=4, num_param=4)
    variables = mod.init(jax.random.PRNGKey(0), X, train=False)
    by, bx = C._akconv_base_offsets(4)
    np.testing.assert_array_equal(by, [0, 0, 1, 1])
    np.testing.assert_array_equal(bx, [0, 1, 0, 1])
    y = mod.apply(variables, X, train=False)
    assert y.shape == (2, 12, 12, 4)


def test_odconv_batch_grouping_matches_loop():
    """The single grouped conv over B*g groups == per-sample convs."""
    mod = C.ODConv2d(c2=6, k=3, act=False)
    variables = mod.init(jax.random.PRNGKey(1), X, train=False)
    y = mod.apply(variables, X, train=False)
    y0 = mod.apply(variables, X[:1], train=False)
    y1 = mod.apply(variables, X[1:], train=False)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y0[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(y[1]), np.asarray(y1[0]), atol=1e-4)


def test_batchchannelnorm_train_updates_stats():
    mod = C.BatchChannelNorm()
    variables = mod.init(jax.random.PRNGKey(0), X, train=True)
    y, mut = mod.apply(variables, X, train=True, mutable=["batch_stats"])
    assert y.shape == X.shape
    before = np.asarray(jax.tree.leaves(variables["batch_stats"])[0])
    after = np.asarray(jax.tree.leaves(mut["batch_stats"])[0])
    assert not np.allclose(before, after)


def test_dynamictanh_bounded():
    mod = C.DynamicTanh()
    variables = mod.init(jax.random.PRNGKey(0), X, train=False)
    y = mod.apply(variables, 100.0 * X, train=False)
    assert float(jnp.abs(y).max()) <= 1.0 + 1e-5  # weight=1, bias=0 at init


def test_yaml_builders_resolve():
    from ultralytics_pro_tpu.nn.tasks import BUILDERS

    for name in ("Conv2", "AConv", "AKConv", "LDConv", "ODConv2d_3rd", "ODConv_3rd",
                 "RFAConv", "RFCBAMConv", "RFCAConv", "FCM", "FCM_1", "FCM_2",
                 "FCM_3", "BatchChannelNorm", "DynamicTanh"):
        assert name in BUILDERS
