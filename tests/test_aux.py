"""Augmentation, visualization, segmentation head/loss/rasterizer."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from hmvit_tpu.data.augment import DataAugmentor
from hmvit_tpu.models.seg_head import (
    BevSegHead,
    rasterize_boxes_to_mask,
    seg_iou,
    seg_loss,
)
from hmvit_tpu.utils import boxes as B
from hmvit_tpu.visualization.vis import visualize_bev, visualize_seg


def test_augmentor_consistency():
    """Augmented points must stay on the augmented boxes: points that were
    inside a box remain inside after any world transform."""
    rng = np.random.default_rng(0)
    box = np.array([[5.0, -3.0, 0.0, 4.0, 2.0, 1.5, 0.4]])  # lwh order
    corners = B.boxes_to_corners_3d(box, "lwh")[0]
    inner = corners[:4, :2].mean(0)
    pts = np.concatenate(
        [inner + rng.uniform(-0.3, 0.3, (50, 2)),
         np.zeros((50, 1)), np.ones((50, 1))], axis=1)

    aug = DataAugmentor(
        [{"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x", "y"]},
         {"NAME": "random_world_rotation"},
         {"NAME": "random_world_scaling"}],
        train=True, seed=3)
    for _ in range(5):
        p2, b2 = aug(pts, box)
        c2 = B.boxes_to_corners_3d(b2, "lwh")[0]
        inside = B.points_in_rotated_box_mask(p2[:, :2], c2[:4, :2])
        assert inside.mean() > 0.9


def test_augmentor_disabled_when_eval():
    aug = DataAugmentor([{"NAME": "random_world_rotation"}], train=False)
    pts = np.random.default_rng(0).normal(size=(10, 4))
    box = np.zeros((2, 7))
    p2, b2 = aug(pts, box)
    np.testing.assert_array_equal(p2, pts)


def test_visualization_writes_png(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (1000, 3))
    boxes = np.array([[0, 0, 0, 1.5, 2.0, 4.5, 0.3]])
    corners = B.boxes_to_corners_3d(boxes, "hwl")
    out = str(tmp_path / "frame.png")
    visualize_bev(pts, corners, corners, [-50, -50, -3, 50, 50, 1],
                  save_path=out)
    assert os.path.getsize(out) > 1000

    seg_out = str(tmp_path / "seg.png")
    visualize_seg(rng.integers(0, 2, (64, 64)), save_path=seg_out)
    assert os.path.getsize(seg_out) > 500


def test_seg_head_and_loss():
    head = BevSegHead("both")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 8)),
                    jnp.float32)
    variables = head.init(jax.random.key(0), x)
    out = head.apply(variables, x)
    assert out["dynamic_seg"].shape == (2, 16, 16, 2)
    assert out["static_seg"].shape == (2, 16, 16, 3)

    labels = {
        "dynamic_seg": jnp.zeros((2, 16, 16), jnp.int32),
        "static_seg": jnp.zeros((2, 16, 16), jnp.int32),
    }
    total, parts = seg_loss(out, labels)
    assert np.isfinite(float(total))


def test_rasterizer_marks_box_cells():
    boxes = np.array([[0.0, 0.0, 0.0, 1.5, 2.0, 4.0, 0.0]])  # hwl
    mask = rasterize_boxes_to_mask(boxes, [-10, -10, -3, 10, 10, 1],
                                   (64, 64))
    # center cell inside, far corner outside
    assert mask[32, 32] == 1
    assert mask[0, 0] == 0
    # roughly the box area fraction: 8 m^2 of 400 m^2 -> ~2% of cells
    frac = mask.mean()
    assert 0.01 < frac < 0.05

    iou = seg_iou(mask, mask)
    assert iou["miou"] == 1.0


def test_camera_box_drawing(tmp_path):
    """3D boxes project into the image and draw (reference
    camera_utils.py:142-224 twin)."""
    import numpy as np
    from hmvit_tpu.utils import boxes as B
    from hmvit_tpu.utils.camera import (
        corners_to_camera,
        draw_2d_boxes,
        draw_3d_boxes,
        filter_boxes_in_image,
    )

    box = np.array([[8.0, 0.0, 0.0, 1.6, 1.8, 4.2, 0.3]])
    corners = B.boxes_to_corners_3d(box, "hwl")
    f, s = 64.0, 128
    intr = np.array([[f, 0, s / 2], [0, f, s / 2], [0, 0, 1.0]])
    cam_pose = np.eye(4)
    cam_pose[2, 3] = 1.5  # camera 1.5 m up, looking +x
    cam = corners_to_camera(corners, intr, cam_pose)
    assert cam.shape == (1, 8, 3)
    assert (cam[0, :, 2] > 0).all()  # in front
    kept = filter_boxes_in_image(cam, s, s)
    assert len(kept) == 1

    img = np.zeros((s, s, 3), np.uint8)
    out2 = draw_2d_boxes(img, cam)
    out3 = draw_3d_boxes(img, cam)
    assert out2.sum() > 0 and out3.sum() > 0
    # a box behind the camera draws nothing
    behind = B.boxes_to_corners_3d(
        np.array([[-8.0, 0.0, 0.0, 1.6, 1.8, 4.2, 0.0]]), "hwl")
    camb = corners_to_camera(behind, intr, cam_pose)
    assert draw_3d_boxes(img, camb).sum() == 0


def test_sequence_renderer(tmp_path):
    from hmvit_tpu.data.fixture import write_mini_opv2v
    from hmvit_tpu.data.opv2v import HeteroCooperativeDataset
    from hmvit_tpu.visualization.sequence import render_sequence, vis_frame

    root = str(tmp_path / "mini")
    write_mini_opv2v(root, num_scenarios=1, num_cavs=2, num_frames=2,
                     image_size=32, max_points=512)
    params = {
        "train_params": {"max_cav": 2},
        "camera_to_lidar_ratio": 0.0, "ego_mode": "lidar",
        "preprocess": {
            "cav_lidar_range": [-50, -50, -3, 50, 50, 1],
            "args": {"camera_preprocess": {"args": {"resize_x": 32,
                                                    "resize_y": 32}}}},
        "postprocess": {"max_num": 30, "order": "hwl"},
        "root_dir": root, "validate_dir": root,
    }
    ds = HeteroCooperativeDataset(params, train=False, max_points=512)
    data = vis_frame(ds, 0)
    assert data["points"].shape[0] > 0
    paths = render_sequence(ds, str(tmp_path / "seq"), indices=[0, 1],
                            gif=True)
    import os
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)


def test_viewer3d_export(tmp_path):
    """Interactive HTML viewer: sequence export embeds every frame's
    points and boxes as JSON in a self-contained document."""
    from hmvit_tpu.visualization.viewer3d import (
        export_scene_html,
        export_sequence_html,
    )

    rng = np.random.default_rng(0)
    frames = []
    for _ in range(3):
        box = np.array([[5.0, -3.0, 0.0, 4.0, 2.0, 1.5, 0.4]])
        frames.append({
            "points": rng.uniform(-20, 20, (100, 4)).astype(np.float32),
            "gt_corners": B.boxes_to_corners_3d(box, "lwh"),
            "pred_corners": B.boxes_to_corners_3d(box + 0.5, "lwh"),
            "scores": np.array([0.9]),
        })
    path = export_sequence_html(str(tmp_path / "seq.html"), frames)
    doc = open(path).read()
    assert doc.count('"pts"') == 3 and '"scores"' in doc
    assert "<canvas" in doc and "FRAMES.length" in doc

    # single-scene wrapper + point downsampling cap
    p2 = export_scene_html(str(tmp_path / "one.html"),
                           np.zeros((200000, 3), np.float32))
    import json as _json
    payload = _json.loads(
        open(p2).read().split("FRAMES=")[1].split(", EDGES=")[0])
    assert len(payload[0]["pts"]) == 3 * 120000


def test_seg_post_process():
    """softmax+argmax maps mirror the reference's camera-bev
    post_process_train (camera_bev_postprocessor.py:55-89)."""
    from hmvit_tpu.models.seg_head import seg_post_process

    rng = np.random.default_rng(2)
    out = seg_post_process({
        "dynamic_seg": jnp.asarray(rng.normal(size=(1, 8, 8, 2))),
        "static_seg": jnp.asarray(rng.normal(size=(1, 8, 8, 3))),
    })
    assert out["dynamic_map"].shape == (1, 8, 8)
    assert int(out["static_map"].max()) <= 2
    np.testing.assert_allclose(
        np.asarray(out["dynamic_prob"]).sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["dynamic_map"]),
        np.asarray(out["dynamic_seg"]).argmax(-1))


def test_vis_npy_renderer(tmp_path):
    """vis_npy twin (reference: visualization/vis_npy.py): renders the
    inference --save_npy dumps to pngs + an HTML sequence."""
    from hmvit_tpu.visualization.vis_npy import render_npy_dir

    box = np.array([[5.0, -3.0, 0.0, 4.0, 2.0, 1.5, 0.4]])
    corners = B.boxes_to_corners_3d(box, "lwh")
    npy_dir = tmp_path / "npy"
    npy_dir.mkdir()
    for i in range(2):
        np.save(npy_dir / f"{i:04d}_pred.npy", corners + 0.3)
        np.save(npy_dir / f"{i:04d}_gt.npy", corners)
    paths = render_npy_dir(str(npy_dir))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    assert os.path.exists(str(npy_dir / "vis" / "sequence.html"))
