"""YOLO-World: open-vocabulary build + text-conditioned forward."""

import numpy as np


def test_world_model_open_vocab():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import WorldModel

    m = WorldModel("yolov8n-world.yaml")
    m.set_classes(["person", "car", "dog"])
    v = m.init_params(imgsz=96)
    y, aux = m.apply(v, jnp.zeros((1, 96, 96, 3)))
    assert y.shape[-1] == 4 + 3  # nc follows the text list
    assert np.isfinite(np.asarray(y)).all()
    # different vocabulary, same weights
    m.set_classes(["cat", "bus"])
    y2, _ = m.apply(v, jnp.zeros((1, 96, 96, 3)))
    assert y2.shape[-1] == 4 + 2


def test_encode_text_deterministic():
    from ultralytics_pro_tpu.nn.modules.world import encode_text

    a = encode_text(["person", "car"])
    b = encode_text(["person", "car"])
    np.testing.assert_allclose(a, b)
    assert a.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(a, axis=-1), 1.0, atol=1e-5)
