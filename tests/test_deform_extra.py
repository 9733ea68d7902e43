"""Deform family tranche 2: DCNv3 / DySnakeConv / SAConv / ARConv.

Shape + finiteness + key invariants (zero-offset DCNv3 == masked local
average; SAConv switch=1 at init == pure d=1 branch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultralytics_pro_tpu.nn.modules import deform_extra as D
from ultralytics_pro_tpu.ops.deform import bilinear_gather, dcnv3_sample

X = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 12, 12, 8)).astype(np.float32))


def test_bilinear_gather_integer_coords_identity():
    sy, sx = jnp.meshgrid(jnp.arange(12.0), jnp.arange(12.0), indexing="ij")
    sy = jnp.broadcast_to(sy[None, ..., None], (2, 12, 12, 1))
    sx = jnp.broadcast_to(sx[None, ..., None], (2, 12, 12, 1))
    out = bilinear_gather(X, sy, sx)
    np.testing.assert_allclose(np.asarray(out[:, :, :, 0]), np.asarray(X), atol=1e-6)


def test_dcnv3_sample_zero_offsets_is_masked_window():
    """Zero offsets + uniform mask == plain k*k box average (interior)."""
    g, k = 2, 3
    off = jnp.zeros((2, 12, 12, g * k * k * 2))
    mask = jnp.full((2, 12, 12, g * k * k), 1.0 / (k * k))
    out = dcnv3_sample(X, off, mask, k=k, padding=1, groups=g)
    ref = jax.lax.reduce_window(X, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)]) / 9.0
    np.testing.assert_allclose(np.asarray(out[:, 2:-2, 2:-2]),
                               np.asarray(ref[:, 2:-2, 2:-2]), atol=1e-5)


@pytest.mark.parametrize("cls,kw,co", [
    (D.DCNv3, dict(g=4), 8),
    (D.DCNV3_YoLo, dict(c2=16, g=4), 16),
    (D.C2f_DCNV3, dict(c2=16, n=1), 16),
    (D.DySnakeConv, dict(c2=16), 16),
    (D.C3k_DSConv, dict(c2=16, n=1), 16),
    (D.C3k2_DSConv, dict(c2=16, n=1, c3k=True), 16),
    (D.SAConv2d, dict(c2=16), 16),
    (D.C2f_SAConv, dict(c2=16, n=1), 16),
    (D.C3k2_SAConv, dict(c2=16, n=1), 16),
    (D.ARConv, dict(c2=16), 16),
])
def test_forward_shapes(cls, kw, co):
    mod = cls(**kw)
    variables = mod.init(jax.random.PRNGKey(0), X, train=False)
    y = mod.apply(variables, X, train=False)
    assert y.shape == (2, 12, 12, co), cls.__name__
    assert bool(jnp.isfinite(y).all()), cls.__name__


def test_saconv_init_switch_selects_d1_branch():
    """switch conv init (w=0, b=1) -> out == weight-standardized d=1 conv."""
    mod = D.SAConv2d(c2=8, act=False)
    variables = mod.init(jax.random.PRNGKey(1), X, train=False)
    y = mod.apply(variables, X, train=False)
    # weight_diff starts at zero, switch==1: d=1 and d=3 paths share weights
    # so blending weight should not matter at interior pixels even if perturbed
    p2 = jax.tree.map(lambda v: v, variables["params"])
    p2["switch"]["bias"] = jnp.asarray([0.0])  # switch=0 -> d=3 branch only
    y3 = mod.apply({**variables, "params": p2}, X, train=False)
    assert y.shape == y3.shape
    assert not np.allclose(np.asarray(y), np.asarray(y3))  # dilation changes output


def test_dcnv3_grad_flows_to_offsets():
    mod = D.DCNv3(g=2)
    variables = mod.init(jax.random.PRNGKey(0), X, train=False)

    def loss(p):
        return (mod.apply({**variables, "params": p}, X, train=False) ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    assert all(bool(jnp.isfinite(v).all()) for v in jax.tree.leaves(g))


def test_snake_cumulative_centered():
    off = jnp.asarray(np.random.default_rng(1).normal(0, 1, (1, 4, 4, 5)).astype(np.float32))
    cum = D._snake_cumulative(off)
    assert cum.shape == off.shape
    np.testing.assert_allclose(np.asarray(cum[..., 2]), 0.0)  # center tap fixed
    np.testing.assert_allclose(np.asarray(cum[..., 3]), np.asarray(off[..., 3]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cum[..., 4]),
                               np.asarray(off[..., 3] + off[..., 4]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cum[..., 0]),
                               np.asarray(off[..., 0] + off[..., 1]), atol=1e-6)


def test_yaml_builders_resolve():
    from ultralytics_pro_tpu.nn.tasks import BUILDERS

    for name in ("DCNv3", "DCNV3_YoLo", "C2f_DCNV3", "DCNV3RepNCSPELAN4",
                 "DySnakeConv", "C3k_DSConv", "C3k2_DSConv", "SAConv2d",
                 "C2f_SAConv", "C3k2_SAConv", "ARConv"):
        assert name in BUILDERS
