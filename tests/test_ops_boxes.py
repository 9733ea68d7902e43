"""Box conversion / clip / scale parity vs recorded reference outputs."""

import numpy as np
import pytest

from tests.conftest import load_fixture
from ultralytics_pro_tpu import ops


@pytest.fixture(scope="module")
def fx():
    return load_fixture("boxes.npz")


def assert_close(a, b, atol=1e-4):
    np.testing.assert_allclose(np.asarray(a), b, atol=atol, rtol=1e-5)


def test_xyxy2xywh_roundtrip(fx):
    assert_close(ops.xyxy2xywh(fx["xyxy"]), fx["xyxy2xywh"])
    assert_close(ops.xywh2xyxy(fx["xyxy2xywh"]), fx["xywh2xyxy"])


def test_ltwh_family(fx):
    assert_close(ops.xyxy2ltwh(fx["xyxy"]), fx["xyxy2ltwh"])
    assert_close(ops.xywh2ltwh(fx["xyxy2xywh"]), fx["xywh2ltwh"])
    assert_close(ops.ltwh2xyxy(fx["xyxy2ltwh"]), fx["ltwh2xyxy"])
    assert_close(ops.ltwh2xywh(fx["xyxy2ltwh"]), fx["ltwh2xywh"])


def test_normalized(fx):
    assert_close(ops.xywhn2xyxy(fx["xyxy2xywh"] / 640.0, w=640, h=480, padw=3, padh=5), fx["xywhn2xyxy"])
    assert_close(ops.xyxy2xywhn(fx["xyxy"], w=640, h=480, clip=True), fx["xyxy2xywhn"], atol=1e-5)


def test_clip_boxes(fx):
    assert_close(ops.clip_boxes(fx["xyxy"], (480, 640)), fx["clip_boxes"])


def test_scale_boxes(fx):
    import jax.numpy as jnp

    got = ops.scale_boxes((640, 640), jnp.asarray(fx["xyxy"]), (480, 640))
    assert_close(got, fx["scale_boxes_640_to_480x640"], atol=1e-3)


def test_xywhr_corners(fx):
    assert_close(ops.xywhr2xyxyxyxy(fx["xywhr"]), fx["xywhr2xyxyxyxy"], atol=1e-3)
