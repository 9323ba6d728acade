"""Native C++ rotated IoU / NMS (native/rotated_nms.cpp) vs the numpy
oracle: identical IoU values (double-precision clipper both sides) and
identical greedy pick order, including degenerate geometry."""
import numpy as np
import pytest

from hmvit_tpu.utils import boxes as box_utils
from hmvit_tpu.utils.iou import rotated_iou_matrix
from hmvit_tpu.utils.nms import nms_rotated
from hmvit_tpu.utils.nms_native import (
    nms_rotated_native,
    rotated_iou_matrix_native,
)


def _random_corners(rng, n):
    boxes = np.zeros((n, 7))
    boxes[:, 0] = rng.uniform(-30, 30, n)
    boxes[:, 1] = rng.uniform(-30, 30, n)
    boxes[:, 3] = rng.uniform(2.5, 5.0, n)
    boxes[:, 4] = rng.uniform(1.2, 2.2, n)
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return box_utils.boxes_to_corners_2d(boxes, "lwh")[..., :2]


@pytest.fixture(scope="module")
def native_available():
    if rotated_iou_matrix_native(np.zeros((1, 4, 2), np.float32),
                                 np.zeros((1, 4, 2), np.float32)) is None:
        pytest.skip("native rotated_nms library unavailable")


def test_native_iou_matches_numpy(native_available):
    rng = np.random.default_rng(0)
    a = _random_corners(rng, 40)
    b = _random_corners(rng, 30)
    got = rotated_iou_matrix_native(a, b)
    want = np.asarray(rotated_iou_matrix(a, b, np))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_native_iou_degenerate_overlaps(native_available):
    # identical, contained, disjoint, axis-aligned touching
    sq = np.array([[[-1, -1], [1, -1], [1, 1], [-1, 1]]], np.float32)
    small = 0.5 * sq
    shifted = sq + np.array([5.0, 0.0], np.float32)
    touching = sq + np.array([2.0, 0.0], np.float32)
    a = np.concatenate([sq, sq, sq, sq])
    b = np.concatenate([sq, small, shifted, touching])
    got = np.diag(rotated_iou_matrix_native(a, b))
    np.testing.assert_allclose(got, [1.0, 0.25, 0.0, 0.0], atol=1e-6)


def test_native_nms_matches_numpy_pick_order(native_available):
    rng = np.random.default_rng(1)
    for trial in range(5):
        n = 120
        corners = _random_corners(rng, n)
        # distinct scores: the numpy argsort tie order is unspecified
        scores = rng.permutation(n).astype(np.float32) / n + 0.01
        want = nms_rotated(corners, scores, 0.15, backend="numpy")
        got = nms_rotated_native(corners, scores, 0.15)
        np.testing.assert_array_equal(got, want)
        # the public entrypoint's auto backend agrees too
        auto = nms_rotated(corners, scores, 0.15)
        np.testing.assert_array_equal(auto, want)


def test_native_nms_respects_top_cap(native_available):
    rng = np.random.default_rng(2)
    corners = _random_corners(rng, 50)
    scores = rng.permutation(50).astype(np.float32) + 1.0
    want = nms_rotated(corners, scores, 0.15, top=10, backend="numpy")
    got = nms_rotated_native(corners, scores, 0.15, top=10)
    np.testing.assert_array_equal(got, want)
