"""SAM2 + MobileSAM tests (reference models/sam/modules/sam.py:98 SAM2Model,
memory_attention.py, tiny_encoder.py:979 TinyViT, predict.py:875
SAM2VideoPredictor). Small img_size keeps CPU compiles manageable."""

import numpy as np
import pytest


def _toy_frames(n=3, size=96):
    rng = np.random.RandomState(0)
    frames = []
    for t in range(n):
        im = np.full((size, size, 3), 40, np.uint8)
        x = 20 + 6 * t
        im[30:70, x:x + 30] = (200, 80, 80)  # moving box
        frames.append(im)
    return frames


def test_hiera_stage_shapes():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.models.sam.sam2 import Hiera

    m = Hiera(embed_dim=32, stages=(1, 1, 2, 1))
    x = jnp.zeros((1, 128, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4]  # strides 4/8/16/32
    assert [o.shape[-1] for o in outs] == [32, 64, 128, 256]


@pytest.mark.slow
def test_sam2_image_prompt_smoke():
    from ultralytics_pro_tpu.models.sam.predict import SAM2Predictor

    p = SAM2Predictor(variant="sam2_t", args={"imgsz": 128})
    im = _toy_frames(1, 96)[0]
    masks, scores = p.inference(im, points=[[35, 50]], labels=[1])
    assert masks.shape[1:] == (96, 96)
    assert masks.dtype == bool
    assert np.isfinite(scores).all()


def test_sam2_video_propagation():
    """3-frame propagation: prompted frame 0, memory-conditioned 1-2."""
    from ultralytics_pro_tpu.models.sam.predict import SAM2VideoPredictor

    p = SAM2VideoPredictor(variant="sam2_t", args={"imgsz": 128})
    frames = _toy_frames(3, 96)
    outs = list(p.propagate(frames, points=[[35, 50]], labels=[1]))
    assert len(outs) == 3
    for masks, score in outs:
        assert masks.shape == (1, 96, 96)
        assert np.isfinite(score)


def test_mobile_sam_tinyvit():
    from ultralytics_pro_tpu.models.sam.build import build_sam
    from ultralytics_pro_tpu.models.sam.predict import SAMPredictor

    model = build_sam("mobile_sam.pt", img_size=128)
    assert type(model).__name__ == "MobileSAMModel"
    p = SAMPredictor(model)
    im = _toy_frames(1, 96)[0]
    masks, scores = p.inference(im, bboxes=[[20, 30, 50, 70]])
    assert masks.shape[1:] == (96, 96)


def test_build_sam_dispatch():
    from ultralytics_pro_tpu.models.sam.build import build_sam
    from ultralytics_pro_tpu.models.sam.sam2 import SAM2Model

    assert isinstance(build_sam("sam2_t.pt", img_size=128), SAM2Model)
    assert isinstance(build_sam("sam2.1_t.pt", img_size=128), SAM2Model)
    assert type(build_sam("sam_b.pt", img_size=128)).__name__ == "SAMModel"
