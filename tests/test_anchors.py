"""Anchor grid, label generation, delta decode: round-trip properties."""
import numpy as np

from hmvit_tpu.data.anchors import (
    decode_deltas,
    generate_anchor_grid,
    generate_labels,
)

ANCHOR_ARGS = {
    "cav_lidar_range": [-102.4, -102.4, -3, 102.4, 102.4, 1],
    "l": 3.9,
    "w": 1.6,
    "h": 1.56,
    "r": [0, 90],
    "feature_stride": 4,
    "num": 2,
    "vw": 0.4,
    "vh": 0.4,
    "vd": 4,
    "W": 512,
    "H": 512,
    "D": 1,
}


def make_gt(n=5, seed=0, max_num=100):
    rng = np.random.default_rng(seed)
    gt = np.zeros((max_num, 7))
    gt[:n, 0] = rng.uniform(-80, 80, n)
    gt[:n, 1] = rng.uniform(-80, 80, n)
    gt[:n, 2] = rng.uniform(-1.5, -0.5, n)
    gt[:n, 3] = rng.uniform(1.4, 1.8, n)  # h
    gt[:n, 4] = rng.uniform(1.5, 2.1, n)  # w
    gt[:n, 5] = rng.uniform(3.5, 5.0, n)  # l
    gt[:n, 6] = rng.uniform(-np.pi, np.pi, n)
    mask = np.zeros(max_num)
    mask[:n] = 1
    return gt, mask


def test_anchor_grid_shape_and_spacing():
    anchors = generate_anchor_grid(ANCHOR_ARGS, "hwl")
    assert anchors.shape == (128, 128, 2, 7)
    # x varies along axis 1, y along axis 0 (meshgrid layout)
    assert np.allclose(anchors[0, 1, 0, 0] - anchors[0, 0, 0, 0],
                       (204.8 - 0.8) / 127)
    assert np.allclose(anchors[1, 0, 0, 1] - anchors[0, 0, 0, 1],
                       (204.8 - 0.8) / 127)
    np.testing.assert_allclose(anchors[..., 2], -1.0)
    np.testing.assert_allclose(anchors[..., 3], 1.56)  # h first (hwl)
    np.testing.assert_allclose(anchors[..., 0, 6], 0.0)
    np.testing.assert_allclose(anchors[..., 1, 6], np.pi / 2)


def test_label_roundtrip_recovers_gt():
    anchors = generate_anchor_grid(ANCHOR_ARGS, "hwl")
    gt, mask = make_gt(6)
    labels = generate_labels(gt, mask, anchors, 0.6, 0.45)

    pos = labels["pos_equal_one"]
    assert pos.sum() >= 6  # every GT got at least its best anchor

    # decode the targets as if they were a perfect regression output
    rm = labels["targets"].transpose(2, 0, 1)[None]  # (1, 14, H, W)
    decoded = np.asarray(decode_deltas(rm, anchors, np))[0]
    pos_idx = np.nonzero(pos.reshape(-1))[0]

    # every positive anchor decodes to one of the GT boxes
    gt_real = gt[mask == 1]
    for i in pos_idx:
        box = decoded[i]
        d = np.linalg.norm(gt_real[:, :3] - box[:3], axis=1)
        j = np.argmin(d)
        np.testing.assert_allclose(box[:6], gt_real[j, :6], atol=1e-6)
        np.testing.assert_allclose(
            np.sin(box[6] - gt_real[j, 6]), 0.0, atol=1e-6
        )


def test_pos_neg_disjoint_and_neg_dominates_empty():
    anchors = generate_anchor_grid(ANCHOR_ARGS, "hwl")
    gt, mask = make_gt(4, seed=3)
    labels = generate_labels(gt, mask, anchors, 0.6, 0.45)
    overlap = labels["pos_equal_one"] * labels["neg_equal_one"]
    assert overlap.sum() == 0

    # empty frame: everything negative
    empty = generate_labels(np.zeros((100, 7)), np.zeros(100), anchors,
                            0.6, 0.45)
    assert empty["pos_equal_one"].sum() == 0
    assert empty["neg_equal_one"].sum() == 128 * 128 * 2


def test_decode_deltas_jnp_matches_numpy():
    import jax.numpy as jnp

    anchors = generate_anchor_grid(ANCHOR_ARGS, "hwl")
    rng = np.random.default_rng(1)
    rm = rng.normal(0, 0.1, (1, 14, 128, 128)).astype(np.float32)
    a32 = anchors.astype(np.float32)
    out_np = np.asarray(decode_deltas(rm, a32, np))
    out_jnp = np.asarray(decode_deltas(jnp.asarray(rm), jnp.asarray(a32),
                                       jnp))
    np.testing.assert_allclose(out_np, out_jnp, rtol=2e-4, atol=2e-4)


def test_device_postprocess_end_to_end():
    """Encode GT into a synthetic (psm, rm), decode through the full jitted
    device pipeline, and check the GT boxes come back out."""
    from hmvit_tpu.postprocess import AnchorPostprocessor
    from hmvit_tpu.utils import boxes as B

    pp = AnchorPostprocessor(
        {
            "anchor_args": ANCHOR_ARGS,
            "target_args": {
                "pos_threshold": 0.6,
                "neg_threshold": 0.45,
                "score_threshold": 0.27,
            },
            "order": "hwl",
            "nms_thresh": 0.15,
            "max_num": 100,
        },
        train=False,
    )
    anchors = pp.generate_anchor_box()
    gt, mask = make_gt(5, seed=7)
    labels = pp.generate_label(gt, anchors, mask)

    rm = labels["targets"].transpose(2, 0, 1)[None].astype(np.float32)
    psm = np.where(
        labels["pos_equal_one"].transpose(2, 0, 1)[None] > 0, 8.0, -8.0
    ).astype(np.float32)

    data = {"ego": {"transformation_matrix": np.eye(4),
                    "anchor_box": anchors,
                    "no_post_projection": True}}
    out = {"ego": {"psm": psm, "rm": rm}}
    corners, scores = pp.post_process(data, out)

    assert corners is not None and corners.shape[0] == 5
    centers = B.corners_to_boxes(corners, "hwl")[:, :2]
    gt_real = gt[mask == 1]
    for c in centers:
        assert np.min(np.linalg.norm(gt_real[:, :2] - c, axis=1)) < 1e-4
