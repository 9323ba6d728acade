"""Geometry/box core: round trips, IoU, NMS, AP — numpy vs jnp parity."""
import numpy as np
import pytest

from hmvit_tpu.utils import boxes as B
from hmvit_tpu.utils import transforms as T
from hmvit_tpu.utils import iou as IoU
from hmvit_tpu.utils.nms import nms_rotated, nms_rotated_device
from hmvit_tpu.utils import evaluation as E

rng = np.random.default_rng(0)


def random_boxes(n, order="lwh"):
    xyz = rng.uniform(-50, 50, (n, 3))
    lwh = rng.uniform([2.0, 1.0, 1.0], [6.0, 3.0, 3.0], (n, 3))
    yaw = rng.uniform(-np.pi, np.pi, (n, 1))
    if order == "hwl":
        lwh = lwh[:, ::-1]
    return np.concatenate([xyz, lwh, yaw], axis=1)


def test_pose_roundtrip():
    pose = [10.0, -5.0, 1.2, 2.0, 35.0, -1.0]
    m = T.pose_to_world(pose)
    # rotation orthonormal, det 1
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(r), 1.0)
    # pose_to_pose(x, x) == identity
    np.testing.assert_allclose(T.pose_to_pose(pose, pose), np.eye(4),
                               atol=1e-9)


def test_pairwise_transform_consistency():
    poses = [[0, 0, 0, 0, 0, 0], [10, 5, 0, 0, 30, 0], [-3, 8, 0.5, 1, -60, 0]]
    pw = T.pairwise_transforms(poses, max_agents=5)
    # T[i->j] @ T[j->i] == I
    for i in range(3):
        for j in range(3):
            np.testing.assert_allclose(pw[i, j] @ pw[j, i], np.eye(4),
                                       atol=1e-9)
    # unused slots identity
    np.testing.assert_allclose(pw[4, 4], np.eye(4))


@pytest.mark.parametrize("order", ["lwh", "hwl"])
def test_corner_center_roundtrip(order):
    boxes = random_boxes(64, order)
    corners = B.boxes_to_corners_3d(boxes, order)
    back = B.corners_to_boxes(corners, order)
    # yaw is identified modulo pi relative to arctan branch; compare sin/cos
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-9)
    np.testing.assert_allclose(np.sin(back[:, 6]), np.sin(boxes[:, 6]),
                               atol=1e-9)


def test_project_corners_inverse():
    boxes = random_boxes(16)
    corners = B.boxes_to_corners_3d(boxes, "lwh")
    m = T.pose_to_world([3, -2, 0.3, 0.5, 77, -0.2])
    fwd = B.project_corners(corners, m)
    back = B.project_corners(fwd, np.linalg.inv(m))
    np.testing.assert_allclose(back, corners, atol=1e-8)


def test_aligned_iou_matches_bruteforce():
    boxes = rng.uniform(0, 50, (40, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]  # ensure x2>x1, y2>y1
    query = rng.uniform(0, 50, (17, 4)).astype(np.float32)
    query[:, 2:] += query[:, :2]
    got = np.asarray(IoU.aligned_iou(boxes, query, np))

    # brute force with the +1 convention
    want = np.zeros((40, 17))
    for k in range(17):
        qa = (query[k, 2] - query[k, 0] + 1) * (query[k, 3] - query[k, 1] + 1)
        for n in range(40):
            iw = min(boxes[n, 2], query[k, 2]) - max(boxes[n, 0],
                                                     query[k, 0]) + 1
            ih = min(boxes[n, 3], query[k, 3]) - max(boxes[n, 1],
                                                     query[k, 1]) + 1
            if iw > 0 and ih > 0:
                ba = (boxes[n, 2] - boxes[n, 0] + 1) * (
                    boxes[n, 3] - boxes[n, 1] + 1)
                want[n, k] = iw * ih / (ba + qa - iw * ih)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotated_iou_identity_and_disjoint():
    boxes = random_boxes(8)
    corners = B.boxes_to_corners_3d(boxes, "lwh")[:, :4, :2]
    iou = np.asarray(IoU.rotated_iou_matrix(corners, corners, np))
    np.testing.assert_allclose(np.diag(iou), np.ones(8), atol=1e-6)

    far = corners + np.array([1000.0, 0.0])
    iou2 = np.asarray(IoU.rotated_iou_matrix(corners, far, np))
    np.testing.assert_allclose(iou2, 0.0, atol=1e-9)


def test_rotated_iou_analytic_cases():
    # unit squares overlapping by half, one rotated 90 degrees (same shape)
    a = np.array([[0.5, 0, 0, 1, 1, 1, 0.0]])
    b = np.array([[0.0, 0, 0, 1, 1, 1, np.pi / 2]])
    ca = B.boxes_to_corners_3d(a, "lwh")[:, :4, :2]
    cb = B.boxes_to_corners_3d(b, "lwh")[:, :4, :2]
    iou = float(np.asarray(IoU.rotated_iou_matrix(ca, cb, np))[0, 0])
    assert np.isclose(iou, 0.5 / 1.5, atol=1e-6)

    # 45-degree rotated square centered on an identical axis-aligned one:
    # intersection is a regular octagon with area 2*(sqrt(2)-1)*s^2
    c = np.array([[0.0, 0, 0, 1, 1, 1, np.pi / 4]])
    cc = B.boxes_to_corners_3d(c, "lwh")[:, :4, :2]
    ci = B.boxes_to_corners_3d(np.array([[0.0, 0, 0, 1, 1, 1, 0.0]]),
                               "lwh")[:, :4, :2]
    inter = float(np.asarray(IoU.quad_intersection_area(cc, ci, np))[0])
    assert np.isclose(inter, 2 * (np.sqrt(2) - 1), atol=1e-6)


def test_rotated_iou_jnp_matches_numpy():
    import jax.numpy as jnp

    boxes_a = random_boxes(12)
    boxes_b = random_boxes(9)
    # pull them together so some overlap
    boxes_b[:, :2] = boxes_a[:9, :2] + rng.uniform(-2, 2, (9, 2))
    ca = B.boxes_to_corners_3d(boxes_a, "lwh")[:, :4, :2]
    cb = B.boxes_to_corners_3d(boxes_b, "lwh")[:, :4, :2]
    got_np = np.asarray(IoU.rotated_iou_matrix(ca, cb, np))
    got_jnp = np.asarray(IoU.rotated_iou_matrix(jnp.asarray(ca),
                                                jnp.asarray(cb), jnp))
    np.testing.assert_allclose(got_np, got_jnp, atol=1e-4)


def test_nms_host_and_device_agree():
    import jax
    import jax.numpy as jnp

    n = 60
    boxes = random_boxes(n)
    # create clusters of overlapping boxes
    boxes[n // 2:, :2] = boxes[: n // 2, :2] + rng.uniform(-0.5, 0.5,
                                                           (n - n // 2, 2))
    boxes[n // 2:, 6] = boxes[: n // 2, 6]
    corners = B.boxes_to_corners_3d(boxes, "lwh")
    scores = rng.uniform(0.1, 1.0, n)

    keep_host = set(nms_rotated(corners, scores, 0.15).tolist())

    fn = jax.jit(lambda c, s: nms_rotated_device(c, s, 0.15))
    keep_mask, _ = fn(jnp.asarray(corners[:, :4, :2]), jnp.asarray(scores))
    keep_dev = set(np.nonzero(np.asarray(keep_mask))[0].tolist())
    assert keep_host == keep_dev


def test_voc_ap_perfect_detector():
    stat = E.new_result_stat("both")
    boxes = random_boxes(10)
    corners = B.boxes_to_corners_3d(boxes, "lwh")
    scores = np.linspace(1.0, 0.5, 10)
    for _ in range(3):
        E.accumulate_frame(corners, scores, corners, stat)
    res = E.final_results(stat)
    assert np.isclose(res["iou"]["ap_70"], 1.0)
    assert np.isclose(res["distance"]["map"], 1.0)


def test_voc_ap_with_false_positives():
    stat = E.new_result_stat("iou")
    boxes = random_boxes(10)
    corners = B.boxes_to_corners_3d(boxes, "lwh")
    fakes = B.boxes_to_corners_3d(random_boxes(10) + 500.0, "lwh")
    det = np.concatenate([corners, fakes])
    scores = np.concatenate([np.full(10, 0.9), np.full(10, 0.1)])
    E.accumulate_frame(det, scores, corners, stat)
    res = E.final_results(stat)
    # all gt found first -> AP still 1.0 under VOC interpolation
    assert np.isclose(res["iou"]["ap_50"], 1.0)

    # now fakes score higher -> precision degraded
    stat2 = E.new_result_stat("iou")
    scores2 = np.concatenate([np.full(10, 0.1), np.full(10, 0.9)])
    E.accumulate_frame(det, scores2, corners, stat2)
    res2 = E.final_results(stat2)
    assert res2["iou"]["ap_50"] < 0.6
