"""Re-parameterization family: train-form forward == deploy-fused forward.

Each block's multi-branch eval-mode output must equal one fused conv
(reference switch_to_deploy semantics: QARepVGG.py:303, DiverseBranch.py:268,
mobileone.py:193, DilatedReparam.py:178)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultralytics_pro_tpu.nn.fuse import apply_fused_conv
from ultralytics_pro_tpu.nn.modules import reparam as R


def _init_eval(mod, x, seed=0):
    variables = mod.init(jax.random.PRNGKey(seed), x, train=False)
    # randomize BN stats so fusion exactness is non-trivial
    rng = np.random.default_rng(seed + 1)
    stats = jax.tree.map(
        lambda v: jnp.asarray(rng.normal(0.3, 0.2, v.shape).astype(np.float32) ** 2 + 0.05),
        variables.get("batch_stats", {}))
    params = jax.tree.map(
        lambda v: jnp.asarray(rng.normal(0, 0.4, v.shape).astype(np.float32)), variables["params"])
    variables = {"params": params, **({"batch_stats": stats} if stats else {})}
    y = mod.apply(variables, x, train=False)
    return variables, y


X = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 16, 16, 8)).astype(np.float32))


def test_qarepvgg_fuse_exact():
    mod = R.QARepVGGBlockV2(c2=8, k=3, s=1, act=False)
    variables, y = _init_eval(mod, X)
    k, b = R.qarepvgg_fuse(variables["params"], variables["batch_stats"])
    yf = apply_fused_conv(X, k, b, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yf), atol=2e-4)


def test_qarepvgg_stride2_no_identity():
    mod = R.QARepVGGBlockV2(c2=12, k=3, s=2, act=False)
    x = X
    variables, y = _init_eval(mod, x)
    assert y.shape == (2, 8, 8, 12)
    k, b = R.qarepvgg_fuse(variables["params"], variables["batch_stats"])
    yf = apply_fused_conv(x, k, b, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yf), atol=2e-4)


@pytest.mark.parametrize("c2,g,s", [(8, 1, 1), (12, 1, 2), (8, 2, 1)])
def test_dbb_fuse_exact(c2, g, s):
    mod = R.DiverseBranchBlock(c2=c2, k=3, s=s, g=g, act=False)
    variables, y = _init_eval(mod, X)
    k, b = R.dbb_fuse(variables["params"], variables["batch_stats"], k=3, g=g)
    yf = apply_fused_conv(X, k, b, stride=s, padding=1, groups=g)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yf), atol=3e-4)


def test_dbb_depthwise_branchless():
    """groups == c2: no 1x1 branch, plain avg-pool branch."""
    mod = R.DiverseBranchBlock(c2=8, k=3, s=1, g=8, act=False)
    variables, y = _init_eval(mod, X)
    k, b = R.dbb_fuse(variables["params"], variables["batch_stats"], k=3, g=8)
    yf = apply_fused_conv(X, k, b, stride=1, padding=1, groups=8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yf), atol=3e-4)


@pytest.mark.parametrize("num_convs,s", [(1, 1), (2, 1), (1, 2)])
def test_mobileone_fuse_exact(num_convs, s):
    mod = R.MobileOneBlock(c2=8, k=3, s=s, num_convs=num_convs, act=False)
    variables, y = _init_eval(mod, X)
    k, b = R.mobileone_fuse(variables["params"], variables["batch_stats"],
                            k=3, num_convs=num_convs)
    yf = apply_fused_conv(X, k, b, stride=s, padding=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yf), atol=2e-4)


@pytest.mark.parametrize("k", [5, 7, 9])
def test_dilated_reparam_fuse_exact(k):
    mod = R.DilatedReparamBlock(k=k)
    variables, y = _init_eval(mod, X)
    ker, b = R.dilated_reparam_fuse(variables["params"], variables["batch_stats"], k=k)
    yf = apply_fused_conv(X, ker, b, stride=1, padding=k // 2, groups=X.shape[-1])
    np.testing.assert_allclose(np.asarray(y), np.asarray(yf), atol=3e-4)


def test_unireplknet_block_shapes():
    mod = R.UniRepLKNetBlock(k=7)
    variables = mod.init(jax.random.PRNGKey(0), X, train=False)
    y = mod.apply(variables, X, train=False)
    assert y.shape == X.shape and bool(jnp.isfinite(y).all())


def test_orepa_forward_and_grad():
    mod = R.OREPA(c2=16, k=3, s=2)
    variables = mod.init(jax.random.PRNGKey(0), X, train=False)
    y = mod.apply(variables, X, train=False)
    assert y.shape == (2, 8, 8, 16)

    def loss(p):
        out, _ = mod.apply({**variables, "params": p}, X, train=True,
                           mutable=["batch_stats"])
        return (out ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in flat)
    # every branch weight receives gradient (online reparam trains all)
    assert float(jnp.abs(g["w_exp_1x1"]).sum()) > 0


def test_csp_wrappers_build():
    for cls, kw in [(R.C2f_DBB, dict(c2=16, n=1)), (R.C3_DBB, dict(c2=16, n=1)),
                    (R.C2f_DRB, dict(c2=16, n=1)), (R.C3_DRB, dict(c2=16, n=1)),
                    (R.C2f_UniRepLKNetBlock, dict(c2=16, n=1))]:
        mod = cls(**kw)
        variables = mod.init(jax.random.PRNGKey(0), X, train=False)
        y = mod.apply(variables, X, train=False)
        assert y.shape == (2, 16, 16, 16), cls.__name__


def test_yaml_builders_resolve():
    from ultralytics_pro_tpu.nn.tasks import BUILDERS

    for name in ("QARepVGGBlockV2", "DiverseBranchBlock", "C2f_DBB", "C3_DBB",
                 "MobileOneBlock", "DilatedReparamBlock", "UniRepLKNetBlock",
                 "C2f_DRB", "C3_DRB", "C2f_UniRepLKNetBlock", "OREPA"):
        assert name in BUILDERS


def test_qarepvgg_stride2_same_width_fuse_exact():
    """Regression: s=2 with c1 == c2 has NO identity branch in the forward;
    the fuse must mirror that (pass s=2)."""
    mod = R.QARepVGGBlockV2(c2=8, k=3, s=2, act=False)
    variables, y = _init_eval(mod, X)
    k, b = R.qarepvgg_fuse(variables["params"], variables["batch_stats"], s=2)
    yf = apply_fused_conv(X, k, b, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yf), atol=2e-4)
