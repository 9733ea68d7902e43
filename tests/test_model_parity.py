"""Full-model forward parity: our flax yolov8n vs the recorded reference forward.

The fixture holds the reference DetectionModel('yolov8n.yaml') state_dict
(random but seeded weights), an input image batch, and the eval-mode decoded
output (B, 4+nc, A). We import the weights via the name-mapped converter and
require the decoded predictions to match.
"""

import numpy as np
import pytest

from tests.conftest import load_fixture


@pytest.mark.parametrize(
    "cfg,fixture",
    [
        ("yolov8n.yaml", "model_yolov8n.npz"),
        ("yolov5s.yaml", "model_yolov5s.npz"),  # exercises C3 + Repeat stacking
        ("yolov3-tiny.yaml", "model_yolov3tiny.npz"),  # MaxPool/ZeroPad, 2-scale head
    ],
)
def test_forward_parity(cfg, fixture):
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.utils.torch_import import load_torch_state_dict

    fx = load_fixture(fixture)
    model = DetectionModel(cfg)
    assert tuple(model.stride) == tuple(int(s) for s in fx["stride"])

    variables = model.init_params(imgsz=64)
    sd = {k[4:]: v for k, v in fx.items() if k.startswith("sd::")}
    variables = load_torch_state_dict(variables, sd, strict=True)

    x = jnp.asarray(fx["input"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    y, aux = model.apply(variables, x, train=False)
    got = np.asarray(y).transpose(0, 2, 1)  # (B, A, no) -> (B, no, A)
    ref = fx["output"]
    assert got.shape == ref.shape
    # boxes are in pixels (<=64 here); class scores are post-sigmoid in [0, 1]
    np.testing.assert_allclose(got[:, :4], ref[:, :4], atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(got[:, 4:], ref[:, 4:], atol=2e-3, rtol=1e-3)
