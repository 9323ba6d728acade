"""Rotated and axis-aligned IoU, implemented once for numpy and jax.numpy.

Replaces the reference's two native dependencies:
  * the Cython ``bbox_overlaps`` (reference: opencood/utils/box_overlaps.pyx:17)
    used for anchor<->GT matching — including its Pascal-VOC ``+1``
    convention which the reference applies even though the boxes live in
    metric space; bit-for-bit parity of label generation requires keeping it;
  * shapely polygon intersection (reference: opencood/utils/common_utils.py:
    119-157) used by rotated NMS and AP matching — replaced by an analytic
    convex-quad intersection (candidate-vertex + angle-sort shoelace) that is
    fully vectorized and jit-able, so NMS can run on-device.

Every public function takes ``xp`` (numpy or jax.numpy); the jnp variant is
safe to wrap in ``jax.jit``.
"""
from __future__ import annotations

import numpy as np

_EPS = 1e-8


def aligned_iou(boxes, query, xp=np):
    """Axis-aligned IoU matrix with the Pascal `+1` extent convention.

    boxes: (N, 4) [x1, y1, x2, y2];  query: (K, 4).  Returns (N, K).
    """
    boxes = xp.asarray(boxes)
    query = xp.asarray(query)
    area_q = (query[:, 2] - query[:, 0] + 1) * (query[:, 3] - query[:, 1] + 1)
    area_b = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    iw = (
        xp.minimum(boxes[:, None, 2], query[None, :, 2])
        - xp.maximum(boxes[:, None, 0], query[None, :, 0])
        + 1
    )
    ih = (
        xp.minimum(boxes[:, None, 3], query[None, :, 3])
        - xp.maximum(boxes[:, None, 1], query[None, :, 1])
        + 1
    )
    inter = xp.clip(iw, 0, None) * xp.clip(ih, 0, None)
    union = area_b[:, None] + area_q[None, :] - inter
    return xp.where(inter > 0, inter / union, xp.zeros_like(inter))


def _ccw(quads, xp):
    """Force counter-clockwise vertex order on (..., 4, 2) quads."""
    x, y = quads[..., 0], quads[..., 1]
    area2 = xp.sum(
        x * xp.roll(y, -1, axis=-1) - xp.roll(x, -1, axis=-1) * y, axis=-1
    )
    return xp.where(area2[..., None, None] < 0, quads[..., ::-1, :], quads)


def _points_in_quad(points, quad, xp):
    """points: (..., P, 2), quad: (..., 4, 2) CCW  ->  (..., P) bool."""
    a = quad[..., None, :, :]                       # (..., 1, 4, 2)
    b = xp.roll(quad, -1, axis=-2)[..., None, :, :]
    p = points[..., :, None, :]                     # (..., P, 1, 2)
    cross = (b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (p[..., 0] - a[..., 0])
    return xp.all(cross >= -1e-6, axis=-1)


def _segment_intersections(qa, qb, xp):
    """All 16 edge-edge intersection points of two quads.

    qa, qb: (..., 4, 2).  Returns points (..., 16, 2) and validity (..., 16).
    """
    a0 = qa[..., :, None, :]                        # (..., 4, 1, 2)
    a1 = xp.roll(qa, -1, axis=-2)[..., :, None, :]
    b0 = qb[..., None, :, :]                        # (..., 1, 4, 2)
    b1 = xp.roll(qb, -1, axis=-2)[..., None, :, :]

    da = a1 - a0
    db = b1 - b0
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    ok = xp.abs(denom) > _EPS
    denom = xp.where(ok, denom, 1.0)

    d0 = b0 - a0
    t = (d0[..., 0] * db[..., 1] - d0[..., 1] * db[..., 0]) / denom
    u = (d0[..., 0] * da[..., 1] - d0[..., 1] * da[..., 0]) / denom
    hit = ok & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)

    pts = a0 + t[..., None] * da
    batch = pts.shape[:-3]
    return pts.reshape(*batch, 16, 2), hit.reshape(*batch, 16)


def quad_intersection_area(qa, qb, xp=np):
    """Intersection area of convex quads, vectorized over leading dims.

    qa, qb: (..., 4, 2).  Returns (...,).  Both convex; orientation free.
    """
    qa = _ccw(xp.asarray(qa, dtype=xp.float64 if xp is np else None), xp)
    qb = _ccw(xp.asarray(qb), xp)

    # Candidate vertices of the intersection polygon: corners of each quad
    # inside the other, plus all edge-edge crossings (<= 24 candidates).
    in_b = _points_in_quad(qa, qb, xp)              # (..., 4)
    in_a = _points_in_quad(qb, qa, xp)              # (..., 4)
    cross_pts, cross_ok = _segment_intersections(qa, qb, xp)

    pts = xp.concatenate([qa, qb, cross_pts], axis=-2)     # (..., 24, 2)
    valid = xp.concatenate([in_b, in_a, cross_ok], axis=-1)  # (..., 24)

    num_valid = valid.sum(axis=-1)
    any_valid = num_valid > 0

    # Replace invalid candidates by the first valid one so that, after the
    # angle sort, duplicates sit adjacent and contribute zero shoelace area.
    first_idx = xp.argmax(valid, axis=-1)
    first_pt = xp.take_along_axis(pts, first_idx[..., None, None].repeat(2, -1)
                                  if xp is np else
                                  xp.broadcast_to(first_idx[..., None, None],
                                                  (*first_idx.shape, 1, 2)),
                                  axis=-2)
    pts = xp.where(valid[..., None], pts, first_pt)

    center = xp.sum(pts * valid[..., None], axis=-2) / xp.maximum(
        num_valid[..., None], 1
    )
    rel = pts - center[..., None, :]
    ang = xp.arctan2(rel[..., 1], rel[..., 0])
    # Invalid entries share coords with a valid vertex -> same angle; sorting
    # keeps them adjacent regardless of tie order.
    order = xp.argsort(ang, axis=-1)
    sorted_rel = xp.take_along_axis(
        rel, order[..., None] if xp is np else
        xp.broadcast_to(order[..., None], (*order.shape, 2)), axis=-2
    )
    nxt = xp.roll(sorted_rel, -1, axis=-2)
    area = 0.5 * xp.abs(
        xp.sum(
            sorted_rel[..., 0] * nxt[..., 1] - nxt[..., 0] * sorted_rel[..., 1],
            axis=-1,
        )
    )
    return xp.where(any_valid & (num_valid >= 3), area, xp.zeros_like(area))


def quad_area(q, xp=np):
    """Shoelace area of (..., 4, 2) quads."""
    x, y = q[..., 0], q[..., 1]
    return 0.5 * xp.abs(
        xp.sum(x * xp.roll(y, -1, axis=-1) - xp.roll(x, -1, axis=-1) * y,
               axis=-1)
    )


def rotated_iou_matrix(corners_a, corners_b, xp=np):
    """BEV IoU of rotated boxes given bottom-face corners.

    corners_a: (N, 4, 2) (or (N, 8, 3): first 4 corners' xy are used),
    corners_b: (M, 4, 2).  Returns (N, M).
    """
    corners_a = xp.asarray(corners_a)[..., :4, :2]
    corners_b = xp.asarray(corners_b)[..., :4, :2]
    n, m = corners_a.shape[0], corners_b.shape[0]
    if n == 0 or m == 0:
        return xp.zeros((n, m))
    qa = xp.broadcast_to(corners_a[:, None], (n, m, 4, 2))
    qb = xp.broadcast_to(corners_b[None, :], (n, m, 4, 2))
    inter = quad_intersection_area(qa, qb, xp)
    union = quad_area(qa, xp) + quad_area(qb, xp) - inter
    return xp.where(union > _EPS, inter / xp.maximum(union, _EPS),
                    xp.zeros_like(inter))
