"""SAM promptable-segmentation smoke tests (reference models/sam/predict.py:40)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_sam_predictor():
    from ultralytics_pro_tpu.models.sam import SAMModel
    from ultralytics_pro_tpu.models.sam.predict import SAMPredictor

    model = SAMModel(encoder_embed_dim=64, encoder_depth=2, encoder_num_heads=2,
                     encoder_global_attn_indexes=(1,), img_size=256)
    return SAMPredictor(model)


@pytest.fixture(scope="module")
def image():
    return np.random.default_rng(0).integers(0, 255, (200, 300, 3), np.uint8)


def test_point_prompt_multimask(tiny_sam_predictor, image):
    masks, scores = tiny_sam_predictor.inference(
        image, points=[[150, 100]], labels=[1], multimask_output=True)
    assert masks.shape == (3, 200, 300) and masks.dtype == bool
    assert scores.shape == (3,) and np.isfinite(scores).all()


def test_box_prompts_batched(tiny_sam_predictor, image):
    tiny_sam_predictor.set_image(image)
    masks, scores = tiny_sam_predictor.prompt_inference(
        bboxes=[[10, 10, 100, 100], [120, 30, 280, 180]])
    assert masks.shape == (2, 200, 300) and scores.shape == (2,)


def test_mixed_prompts_and_errors(tiny_sam_predictor, image):
    tiny_sam_predictor.set_image(image)
    masks, _ = tiny_sam_predictor.prompt_inference(
        bboxes=[[50, 40, 250, 160]], points=[[150, 100], [20, 20]], labels=[1, 0])
    assert masks.shape == (1, 200, 300)
    with pytest.raises(ValueError):
        tiny_sam_predictor.prompt_inference()  # no prompts


def test_generate_everything(tiny_sam_predictor, image):
    masks, scores = tiny_sam_predictor.generate(
        image, points_per_side=4, conf_thres=-10.0, stability_score_thresh=0.0)
    assert masks.ndim == 3 and masks.shape[1:] == (200, 300)
    assert len(masks) == len(scores) >= 1  # NMS keeps at least the best


def test_results_surface(tiny_sam_predictor, image):
    r = tiny_sam_predictor(image, points=[[150, 100]])[0]
    assert r.boxes.data.shape[1] == 6 and r.masks is not None


def test_build_registry():
    from ultralytics_pro_tpu.models.sam import build_sam

    m = build_sam("sam_b.pt")
    assert (m.encoder_embed_dim, m.encoder_depth) == (768, 12)
    m = build_sam("sam_l")
    assert (m.encoder_embed_dim, m.encoder_depth) == (1024, 24)
    with pytest.raises(ValueError):
        build_sam("sam_q")
