"""Anchor geometry parity vs recorded reference outputs."""

import numpy as np
import pytest

from tests.conftest import load_fixture
from ultralytics_pro_tpu import ops


@pytest.fixture(scope="module")
def fx():
    return load_fixture("anchors.npz")


def assert_close(a, b, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), b, atol=atol, rtol=1e-5)


def test_make_anchors(fx):
    pts, st = ops.make_anchors([(80, 80), (40, 40), (20, 20)], [8, 16, 32], 0.5)
    assert_close(pts, fx["anchor_points"])
    assert_close(st, fx["stride_tensor"])


def test_dist2bbox(fx):
    pts = fx["anchor_points"]
    assert_close(ops.dist2bbox(fx["dist"], pts, xywh=True), fx["dist2bbox_xywh"], atol=1e-4)
    assert_close(ops.dist2bbox(fx["dist"], pts, xywh=False), fx["dist2bbox_xyxy"], atol=1e-4)


def test_bbox2dist(fx):
    assert_close(ops.bbox2dist(fx["anchor_points"], fx["dist2bbox_xyxy"], 16), fx["bbox2dist"], atol=1e-4)


def test_dist2rbox(fx):
    assert_close(ops.dist2rbox(fx["dist"], fx["angle"], fx["anchor_points"]), fx["dist2rbox"], atol=1e-3)
