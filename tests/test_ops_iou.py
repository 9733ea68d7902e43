"""IoU family parity vs recorded reference outputs."""

import numpy as np
import pytest

from tests.conftest import load_fixture
from ultralytics_pro_tpu import ops


@pytest.fixture(scope="module")
def fx():
    return load_fixture("iou.npz")


def assert_close(a, b, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), b, atol=atol, rtol=1e-4)


def test_box_iou(fx):
    assert_close(ops.box_iou(fx["b1"], fx["b2"]), fx["box_iou"])


def test_bbox_iou_variants(fx):
    assert_close(ops.bbox_iou(fx["p1"], fx["p2"], xywh=True), fx["iou"])
    assert_close(ops.bbox_iou(fx["p1"], fx["p2"], xywh=True, GIoU=True), fx["giou"])
    assert_close(ops.bbox_iou(fx["p1"], fx["p2"], xywh=True, DIoU=True), fx["diou"])
    assert_close(ops.bbox_iou(fx["p1"], fx["p2"], xywh=True, CIoU=True), fx["ciou"])
    assert_close(ops.bbox_iou(fx["b1"][:32], fx["b2"][:32], xywh=False), fx["iou_xyxy"])


def test_probiou(fx):
    assert_close(ops.probiou(fx["obb1"], fx["obb2"]), fx["probiou"].squeeze(-1), atol=1e-4)
    assert_close(ops.batch_probiou(fx["obb1"][:16], fx["obb2"][:24]), fx["batch_probiou"], atol=1e-4)


def test_kpt_iou(fx):
    assert_close(ops.kpt_iou(fx["kpt1"], fx["kpt2"], fx["area"], fx["sigma"]), fx["kpt_iou"], atol=1e-4)


def test_mask_iou(fx):
    assert_close(ops.mask_iou(fx["m1"], fx["m2"]), fx["mask_iou"], atol=1e-3)
