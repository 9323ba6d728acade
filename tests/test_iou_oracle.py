"""Independent oracle for rotated IoU and greedy NMS.

The production path (`utils/iou.py::quad_intersection_area`) computes
convex-quad intersection by candidate-vertex enumeration + angle-sorted
shoelace, chosen because it vectorizes/jits.  Until now it was only
cross-checked against its own host/device twins.  This file pins it
against a genuinely different algorithm: a scalar Sutherland–Hodgman
polygon clipper (the textbook method shapely effectively performs for
convex inputs — reference usage: opencood/utils/box_utils.py:575-620 and
common_utils.py:119-157), plus an independent greedy NMS that recomputes
suppression from oracle IoUs.

Cases include the degenerate geometry the analytic method is most likely
to get wrong: identical boxes, shared edges, near-parallel edges
(sliver intersections), containment, single-point touching.
"""
import numpy as np
import pytest

from hmvit_tpu.utils.iou import quad_area, rotated_iou_matrix
from hmvit_tpu.utils.nms import nms_rotated


# ---------------------------------------------------------------- oracle

def clip_polygon(subject, clip):
    """Sutherland–Hodgman: clip `subject` polygon by convex `clip`.

    subject: (N, 2) list-like CCW; clip: (M, 2) CCW convex.
    Returns list of vertices (possibly empty).  Pure scalar python —
    slow, simple, independent.
    """
    def inside(p, a, b):
        return ((b[0] - a[0]) * (p[1] - a[1])
                - (b[1] - a[1]) * (p[0] - a[0])) >= -1e-12

    def line_intersect(p1, p2, a, b):
        # intersection of segment p1p2 with infinite line ab
        dx, dy = p2[0] - p1[0], p2[1] - p1[1]
        ex, ey = b[0] - a[0], b[1] - a[1]
        denom = dx * ey - dy * ex
        if abs(denom) < 1e-30:
            return p2
        t = ((a[0] - p1[0]) * ey - (a[1] - p1[1]) * ex) / denom
        return (p1[0] + t * dx, p1[1] + t * dy)

    output = [tuple(p) for p in subject]
    m = len(clip)
    for i in range(m):
        a, b = tuple(clip[i]), tuple(clip[(i + 1) % m])
        input_list, output = output, []
        if not input_list:
            break
        s = input_list[-1]
        for e in input_list:
            if inside(e, a, b):
                if not inside(s, a, b):
                    output.append(line_intersect(s, e, a, b))
                output.append(e)
            elif inside(s, a, b):
                output.append(line_intersect(s, e, a, b))
            s = e
    return output


def poly_area(pts):
    if len(pts) < 3:
        return 0.0
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def ccw(quad):
    quad = np.asarray(quad, dtype=np.float64)
    x, y = quad[:, 0], quad[:, 1]
    if np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0:
        quad = quad[::-1]
    return quad


def oracle_iou_matrix(qa, qb):
    qa = [ccw(q) for q in np.asarray(qa)[..., :4, :2]]
    qb = [ccw(q) for q in np.asarray(qb)[..., :4, :2]]
    out = np.zeros((len(qa), len(qb)))
    for i, a in enumerate(qa):
        for j, b in enumerate(qb):
            inter = poly_area(clip_polygon(a, b))
            union = poly_area(a) + poly_area(b) - inter
            out[i, j] = inter / union if union > 1e-12 else 0.0
    return out


def oracle_nms(corners, scores, threshold, top=1000):
    """Greedy NMS recomputed from oracle IoUs — mirrors the reference's
    loop (box_utils.py:575-620) but shares no code with utils/nms.py."""
    iou = oracle_iou_matrix(corners, corners)
    ixs = list(np.asarray(scores).argsort()[::-1][:top])
    pick = []
    while ixs:
        i = ixs.pop(0)
        pick.append(i)
        ixs = [j for j in ixs if iou[i, j] <= threshold]
    return np.array(pick, dtype=np.int32)


# ------------------------------------------------------------- box maker

def box_corners(cx, cy, l, w, yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    dx = np.array([l, l, -l, -l]) / 2
    dy = np.array([w, -w, -w, w]) / 2
    return np.stack([cx + c * dx - s * dy, cy + s * dx + c * dy], -1)


def random_boxes(rng, n, spread=10.0):
    return np.stack([
        box_corners(rng.uniform(-spread, spread),
                    rng.uniform(-spread, spread),
                    rng.uniform(2.0, 6.0), rng.uniform(1.0, 3.0),
                    rng.uniform(-np.pi, np.pi))
        for _ in range(n)])


# ----------------------------------------------------------------- tests

def test_oracle_sanity():
    """The oracle itself on hand-computable cases."""
    unit = box_corners(0, 0, 2, 2, 0.0)
    # identical
    assert oracle_iou_matrix([unit], [unit])[0, 0] == pytest.approx(1.0)
    # half overlap: [−1,1]² vs [0,2]x[−1,1] -> inter 2, union 6
    shifted = box_corners(1.0, 0, 2, 2, 0.0)
    assert oracle_iou_matrix([unit], [shifted])[0, 0] == pytest.approx(
        2.0 / 6.0)
    # 45° rotated square of the same size: intersection is the octagon
    # |x|<=1, |y|<=1, |x|+|y|<=sqrt(2); inter = 4 - 2(2-sqrt2)^2
    rot = box_corners(0, 0, 2, 2, np.pi / 4)
    inter = 4.0 - 2.0 * (2.0 - np.sqrt(2.0)) ** 2
    assert oracle_iou_matrix([unit], [rot])[0, 0] == pytest.approx(
        inter / (8.0 - inter))
    # disjoint
    far = box_corners(10, 10, 2, 2, 0.3)
    assert oracle_iou_matrix([unit], [far])[0, 0] == 0.0


def test_random_boxes_match_oracle():
    rng = np.random.default_rng(0)
    a = random_boxes(rng, 24)
    b = random_boxes(rng, 24)
    got = np.asarray(rotated_iou_matrix(a, b, np))
    want = oracle_iou_matrix(a, b)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dense_cluster_match_oracle():
    """Boxes packed into a small area: many partial overlaps."""
    rng = np.random.default_rng(1)
    a = random_boxes(rng, 32, spread=3.0)
    got = np.asarray(rotated_iou_matrix(a, a, np))
    want = oracle_iou_matrix(a, a)
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-9)


def test_degenerate_geometry_match_oracle():
    """Shared edges, near-parallel slivers, containment, point touch."""
    base = box_corners(0, 0, 4, 2, 0.0)
    cases = [
        base,                                    # identical
        box_corners(4, 0, 4, 2, 0.0),            # shares full edge x=2
        box_corners(0, 0, 4, 2, 1e-7),           # near-parallel (sliver)
        box_corners(0, 0, 4, 2, np.pi + 1e-7),   # reversed near-parallel
        box_corners(0.1, 0.05, 2, 1, 0.0),       # fully contained
        box_corners(4.0, 2.0, 4, 2, 0.0),        # single-corner touch
        box_corners(0, 0, 4, 2, np.pi / 2),      # cross shape
        box_corners(2.0, 1.0, 4, 2, np.pi / 4),  # corner overlap
        box_corners(0, 1.999999, 4, 2, 0.0),     # sliver strip overlap
    ]
    qs = np.stack(cases)
    got = np.asarray(rotated_iou_matrix(qs, np.stack([base] * len(cases)),
                                        np))[:, 0]
    want = oracle_iou_matrix(qs, [base])[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_nms_keep_order_matches_oracle():
    """Greedy suppression pick ORDER (not just the kept set) must match
    the independent oracle over random crowded scenes."""
    for seed in range(6):
        rng = np.random.default_rng(seed)
        n = 40
        boxes = random_boxes(rng, n, spread=6.0)
        scores = rng.uniform(0.01, 1.0, size=n)
        for thr in (0.15, 0.5):
            got = nms_rotated(boxes, scores, thr)
            want = oracle_nms(boxes, scores, thr)
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"seed={seed} thr={thr}")


def test_nms_device_matches_oracle_set():
    """Device NMS (fixed-shape, fori_loop) keep SET == oracle keep set."""
    from hmvit_tpu.utils.nms import nms_rotated_device
    rng = np.random.default_rng(11)
    n = 32
    boxes = random_boxes(rng, n, spread=5.0)
    scores = rng.uniform(0.01, 1.0, size=n)
    keep_mask, _ = nms_rotated_device(boxes, scores, 0.15)
    got = set(np.where(np.asarray(keep_mask))[0].tolist())
    want = set(oracle_nms(boxes, scores, 0.15).tolist())
    assert got == want


def test_quad_area_vs_oracle():
    rng = np.random.default_rng(3)
    qs = random_boxes(rng, 16)
    got = np.asarray(quad_area(qs, np))
    want = np.array([poly_area([tuple(p) for p in ccw(q)]) for q in qs])
    np.testing.assert_allclose(got, want, atol=1e-9)
