"""Selective-scan / mamba-yolo tests (reference mamba_yolo.py; the
`selective_scan` CUDA ext becomes jax.lax.associative_scan — SURVEY.md §2.9)."""

import numpy as np
import pytest


def test_selective_scan_matches_sequential():
    """Parallel associative scan must equal the sequential recurrence."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.mamba import selective_scan

    rng = np.random.default_rng(0)
    B, L, d, n = 2, 17, 4, 3
    u = jnp.asarray(rng.normal(size=(B, L, d)).astype(np.float32))
    delta = jnp.asarray(rng.uniform(0.01, 0.5, (B, L, d)).astype(np.float32))
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (d, n)).astype(np.float32))
    Bm = jnp.asarray(rng.normal(size=(B, L, n)).astype(np.float32))
    Cm = jnp.asarray(rng.normal(size=(B, L, n)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    got = np.asarray(selective_scan(u, delta, A, Bm, Cm, D))

    # sequential reference
    h = np.zeros((B, d, n), np.float32)
    want = np.zeros((B, L, d), np.float32)
    un, dn, An, Bn, Cn, Dn = (np.asarray(t) for t in (u, delta, A, Bm, Cm, D))
    for t in range(L):
        da = np.exp(dn[:, t, :, None] * An[None])  # (B, d, n)
        h = da * h + dn[:, t, :, None] * Bn[:, t, None, :] * un[:, t, :, None]
        want[:, t] = (h * Cn[:, t, None, :]).sum(-1) + un[:, t] * Dn
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ss2d_and_blocks_forward():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.mamba import SS2D, VSSBlock, XSSBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 32)) * 0.1
    for mod, kw in [(SS2D, dict(d_model=32)), (VSSBlock, dict(c2=32)),
                    (XSSBlock, dict(c2=32, n=2))]:
        m = mod(**kw)
        v = m.init(jax.random.PRNGKey(1), x, train=False)
        y = m.apply(v, x, train=False)
        assert y.shape[-1] == 32
        assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_mamba_yolo_model():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    m = DetectionModel("mamba-yolo-n.yaml")
    v = m.init_params(imgsz=64)
    y, aux = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, jnp.zeros((1, 64, 64, 3)))
    assert y.shape[-1] == 84
    assert m.stride == (8, 16, 32)
    assert np.isfinite(np.asarray(y)).all()
