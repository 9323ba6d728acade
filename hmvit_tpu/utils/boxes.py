"""Box geometry (host side, numpy).

Box parameterisation: ``(x, y, z, dims..., yaw)`` with dims ordered either
``lwh`` (length-x, width-y, height-z) or ``hwl``.  Corner numbering follows
the reference convention (reference: opencood/utils/box_utils.py:139-184):

        4 -------- 5
       /|         /|
      7 -------- 6 .
      | |        | |
      . 0 -------- 1
      |/         |/
      3 -------- 2

corners 0-3 are the bottom face walked as a closed ring; 4-7 the top face.
"""
from __future__ import annotations

import numpy as np

# (8, 3) half-extent multipliers for the corner numbering above.
CORNER_TEMPLATE = np.array(
    [
        [1, -1, -1], [1, 1, -1], [-1, 1, -1], [-1, -1, -1],
        [1, -1, 1], [1, 1, 1], [-1, 1, 1], [-1, -1, 1],
    ],
    dtype=np.float64,
) / 2.0


def _dims_to_lwh(boxes, order: str):
    if order == "lwh":
        return boxes[:, 3:6]
    if order == "hwl":
        return boxes[:, [5, 4, 3]]
    raise ValueError(f"unknown box order {order!r}")


def rotate_points_z(points, angles, xp=np):
    """Rotate (N, P, 3) point sets around z by per-set angles (N,) radians.

    Written elementwise (no matmul) on purpose: on TPU a 3x3 matmul would be
    routed to the MXU at default precision and quantize box coordinates;
    the VPU path keeps geometry exact in fp32.
    """
    c = xp.cos(angles)[:, None]
    s = xp.sin(angles)[:, None]
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    return xp.stack([x * c - y * s, x * s + y * c, z], axis=-1)


def boxes_to_corners_3d(boxes, order: str = "lwh", xp=np):
    """(N, 7) center boxes -> (N, 8, 3) corners. Works under numpy or jnp."""
    boxes = xp.asarray(boxes, dtype=np.float64 if xp is np else None)
    dims = _dims_to_lwh(boxes, order)
    corners = dims[:, None, :] * xp.asarray(CORNER_TEMPLATE,
                                            dtype=boxes.dtype)[None, :, :]
    corners = rotate_points_z(corners, boxes[:, 6], xp)
    return corners + boxes[:, None, 0:3]


def boxes_to_corners_2d(boxes: np.ndarray, order: str = "lwh") -> np.ndarray:
    """(N, 7) center boxes -> (N, 4, 3) bottom-face corners."""
    return boxes_to_corners_3d(boxes, order)[:, :4, :]


def corners_to_boxes(corners: np.ndarray, order: str = "lwh") -> np.ndarray:
    """(N, 8, 3) corners -> (N, 7) center boxes.

    Averages the redundant edge measurements, so it is the exact inverse of
    :func:`boxes_to_corners_3d` for well-formed boxes and a least-squares
    estimate for noisy ones (reference: opencood/utils/box_utils.py:14-73).
    """
    corners = np.asarray(corners, dtype=np.float64)
    assert corners.ndim == 3

    xyz = np.mean(corners[:, [0, 3, 5, 6], :], axis=1)
    h = np.abs(np.mean(corners[:, 4:, 2] - corners[:, :4, 2], axis=1))

    def edge(a, b):
        return np.linalg.norm(corners[:, a, :2] - corners[:, b, :2], axis=1)

    l = (edge(0, 3) + edge(2, 1) + edge(4, 7) + edge(5, 6)) / 4.0
    w = (edge(0, 1) + edge(2, 3) + edge(4, 5) + edge(6, 7)) / 4.0

    def yaw(a, b):
        d = corners[:, a, :2] - corners[:, b, :2]
        return np.arctan2(d[:, 1], d[:, 0])

    theta = (yaw(1, 2) + yaw(0, 3) + yaw(5, 6) + yaw(4, 7)) / 4.0

    if order == "lwh":
        dims = np.stack([l, w, h], axis=1)
    elif order == "hwl":
        dims = np.stack([h, w, l], axis=1)
    else:
        raise ValueError(f"unknown box order {order!r}")
    return np.concatenate([xyz, dims, theta[:, None]], axis=1)


def corners_to_standup(corners, xp=np):
    """(N, K, 2+) corners -> (N, 4) axis-aligned [x1, y1, x2, y2]."""
    return xp.stack(
        [
            corners[..., 0].min(axis=1),
            corners[..., 1].min(axis=1),
            corners[..., 0].max(axis=1),
            corners[..., 1].max(axis=1),
        ],
        axis=1,
    )


def project_corners(corners, transform, xp=np):
    """Transform (N, 8, 3) corners by a 4x4 matrix.

    Elementwise broadcast-and-sum instead of matmul for the same TPU
    precision reason as :func:`rotate_points_z`.
    """
    n = corners.shape[0]
    pts = corners.reshape(-1, 3)
    pts = xp.concatenate([pts, xp.ones((pts.shape[0], 1), pts.dtype)], axis=1)
    t = xp.asarray(transform, dtype=pts.dtype)
    out = xp.sum(pts[:, None, :] * t[None, :3, :], axis=-1)
    return out.reshape(n, 8, 3)


def mask_corners_in_range(corners, limit_range, xp=np):
    """True where every corner's xy lies inside [minx,miny,...,maxx,maxy,...].

    Matches the eval-range clip (reference: opencood/utils/box_utils.py:326-369).
    """
    lo = xp.asarray(limit_range[:2])[None, None]
    hi = xp.asarray(limit_range[3:5])[None, None]
    ok = xp.all(corners[:, :, :2] >= lo, axis=-1) & xp.all(
        corners[:, :, :2] <= hi, axis=-1
    )
    return xp.all(ok, axis=-1)


def mask_boxes_outside_range(boxes, limit_range, order,
                             min_num_corners: int = 8):
    """Keep boxes with >= min_num_corners corners inside the xy range."""
    corners = boxes_to_corners_3d(np.asarray(boxes), order)
    lo = np.asarray(limit_range[:2])[None, None]
    hi = np.asarray(limit_range[3:5])[None, None]
    inside = np.all((corners[:, :, :2] >= lo) & (corners[:, :, :2] <= hi),
                    axis=-1)
    return inside.sum(axis=1) >= min_num_corners


def sane_size_mask(corners, max_len: float = 6.0):
    """Drop degenerate oversized predictions (x/y extent > max_len).

    Mirrors the post-process sanity filter (reference:
    opencood/utils/box_utils.py:722-751) including its use of the y extent
    for the z check.
    """
    x_len = corners[:, :, 0].max(axis=1) - corners[:, :, 0].min(axis=1)
    y_len = corners[:, :, 1].max(axis=1) - corners[:, :, 1].min(axis=1)
    return (x_len <= max_len) & (y_len <= max_len) & (y_len > 0)


def sane_z_mask(corners, z_min: float = -3.0, z_max: float = 1.0):
    """Keep boxes fully inside the vertical band [z_min, z_max]."""
    return (corners[:, :, 2].min(axis=1) >= z_min) & (
        corners[:, :, 2].max(axis=1) <= z_max
    )


def points_in_rotated_box_mask(points: np.ndarray,
                               box_corners: np.ndarray) -> np.ndarray:
    """Boolean mask of 2D points inside one rotated rectangle (4, 2)."""
    p1, p2, p4 = box_corners[0], box_corners[1], box_corners[3]
    e12, e14 = p2 - p1, p4 - p1
    rel = points[:, :2] - p1[None, :]
    t = rel @ e12 / np.dot(e12, e12)
    u = rel @ e14 / np.dot(e14, e14)
    return (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
