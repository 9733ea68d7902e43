"""Bboxes/Instances container behavior (reference utils/instance.py:35,181)."""

import numpy as np

from ultralytics_pro_tpu.utils.instance import Bboxes, Instances


def test_bboxes_convert_roundtrip_and_mutability():
    b = Bboxes(np.array([10, 10, 50, 50], np.float32))  # 1-D promoted to (1, 4)
    b.convert("xywh")
    b.convert("ltwh")
    b.convert("xyxy")
    np.testing.assert_allclose(b.bboxes, [[10, 10, 50, 50]], atol=1e-5)
    assert b.areas().tolist() == [1600.0]
    # buffer must stay writable after convert (fliplr/clip mutate in place)
    b.bboxes[:, 0] = 0.0
    assert b.bboxes[0, 0] == 0.0


def test_instances_geometry_flow():
    inst = Instances(
        np.array([[0.1, 0.1, 0.2, 0.2], [0.5, 0.5, 0.0, 0.1]], np.float32),
        segments=[np.array([[0.1, 0.1], [0.2, 0.2]], np.float32)] * 2,
        keypoints=np.full((2, 3, 3), 0.3, np.float32),
        bbox_format="xywh",
        normalized=True,
    )
    inst.denormalize(500, 400)
    inst.convert_bbox("xyxy")
    inst.fliplr(500)
    inst.clip(500, 400)
    good = inst.remove_zero_area_boxes()
    assert good.tolist() == [True, False] and len(inst) == 1
    np.testing.assert_allclose(inst.bboxes, [[400, 0, 500, 80]], atol=1e-4)
    np.testing.assert_allclose(inst.segments[0], [[450, 40], [400, 80]], atol=1e-4)
    assert abs(float(inst.keypoints[0, 0, 0]) - 350.0) < 1e-4
    sub = inst[0]
    assert sub.bboxes.shape == (1, 4) and len(sub.segments) == 1


def test_instances_add_padding_requires_absolute():
    inst = Instances(np.array([[0.1, 0.1, 0.2, 0.2]], np.float32))
    try:
        inst.add_padding(2, 2)
        raise AssertionError("expected AssertionError on normalized coords")
    except AssertionError as e:
        assert "absolute" in str(e)
