"""Binary pcd parsing, native parser agreement, wild-setting impairments."""
import numpy as np
import pytest

from hmvit_tpu.data.pcd_io import read_pcd
from hmvit_tpu.data.pcd_native import read_pcd_padded


def write_binary_pcd(path, pts):
    n = len(pts)
    header = (
        "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
        "TYPE F F F F\nCOUNT 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA binary\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(pts.astype("<f4").tobytes())


def write_rgb_pcd(path, xyz, intensity):
    """Packed-rgb layout (open3d-style intensity-in-red)."""
    n = len(xyz)
    red = (intensity * 255).astype(np.uint32) << 16
    rgb = red.view(np.float32)
    data = np.concatenate([xyz.astype("<f4"), rgb[:, None]], axis=1)
    header = (
        "VERSION 0.7\nFIELDS x y z rgb\nSIZE 4 4 4 4\n"
        "TYPE F F F F\nCOUNT 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nPOINTS {n}\nDATA binary\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(data.astype("<f4").tobytes())


def test_binary_pcd_python_and_native(tmp_path):
    pts = np.random.default_rng(0).uniform(-50, 50, (500, 4)).astype(
        np.float32)
    path = str(tmp_path / "b.pcd")
    write_binary_pcd(path, pts)
    got = read_pcd(path)
    np.testing.assert_allclose(got, pts, atol=1e-5)

    out, mask = read_pcd_padded(path, 600)
    assert int(mask.sum()) == 500
    np.testing.assert_allclose(out[:500], pts, atol=1e-5)


def test_rgb_packed_intensity(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.uniform(-10, 10, (100, 3)).astype(np.float32)
    inten = rng.uniform(0, 1, 100).astype(np.float32)
    path = str(tmp_path / "rgb.pcd")
    write_rgb_pcd(path, xyz, inten)
    got = read_pcd(path)
    np.testing.assert_allclose(got[:, :3], xyz, atol=1e-5)
    np.testing.assert_allclose(got[:, 3], np.floor(inten * 255) / 255,
                               atol=1e-6)
    out, mask = read_pcd_padded(path, 200)
    np.testing.assert_allclose(out[:100, 3], got[:, 3], atol=1e-6)


def test_wild_settings(tmp_path):
    from hmvit_tpu.data.fixture import write_mini_opv2v
    from hmvit_tpu.data.opv2v import HeteroCooperativeDataset

    root = str(tmp_path / "mini")
    write_mini_opv2v(root, num_scenarios=1, num_cavs=2, num_frames=4,
                     image_size=32, max_points=1024)
    base_params = {
        "train_params": {"max_cav": 2},
        "camera_to_lidar_ratio": 0.0,
        "ego_mode": "lidar",
        "preprocess": {
            "cav_lidar_range": [-102.4, -102.4, -3, 102.4, 102.4, 1],
            "args": {"camera_preprocess": {"args": {"resize_x": 32,
                                                    "resize_y": 32}}},
        },
        "postprocess": {"max_num": 30, "order": "hwl"},
        "root_dir": root, "validate_dir": root,
    }

    clean = HeteroCooperativeDataset(base_params, train=False,
                                     max_points=1024)
    frame_clean = clean[3]

    # 'sim' async: non-ego agents send older frames
    p = dict(base_params,
             wild_setting={"async": True, "async_mode": "sim",
                           "async_overhead": 2})
    delayed = HeteroCooperativeDataset(p, train=False, max_points=1024)
    assert delayed.async_frames == 2
    frame_delayed = delayed[3]
    # non-ego transform differs because its pose comes from an older frame
    assert not np.allclose(frame_clean["transformation_matrix"][1],
                           frame_delayed["transformation_matrix"][1])

    # prior_encoding carries (v/30, dt frames, infra) per CAV
    np.testing.assert_allclose(frame_clean["prior_encoding"][:2, 0],
                               5.0 / 30.0)
    assert frame_clean["prior_encoding"][1, 1] == 0.0
    assert frame_delayed["prior_encoding"][1, 1] == 2.0  # delayed frames
    assert frame_delayed["prior_encoding"][0, 1] == 0.0  # ego never lags
    np.testing.assert_allclose(frame_clean["prior_encoding"][:, 2], 0.0)

    # 'real' async: latency derived from payload/bandwidth
    p = dict(base_params,
             wild_setting={"async": True, "async_mode": "real",
                           "data_size": 1.06, "transmission_speed": 27,
                           "backbone_delay": 10})
    real = HeteroCooperativeDataset(p, train=False, max_points=1024)
    assert real.async_frames >= 3  # ~324 ms -> 4 frames

    # localization noise perturbs non-ego transforms only
    p = dict(base_params,
             wild_setting={"loc_err": True, "xyz_std": 0.5,
                           "ryp_std": 0.5})
    noisy = HeteroCooperativeDataset(p, train=False, max_points=1024)
    frame_noisy = noisy[3]
    assert not np.allclose(frame_clean["transformation_matrix"][1],
                           frame_noisy["transformation_matrix"][1])
    np.testing.assert_allclose(frame_noisy["transformation_matrix"][0],
                               np.eye(4), atol=1e-5)


def test_bev_map_gt_loading(tmp_path):
    """Map-raster seg GT: fixture pngs -> loader gt_dynamic/gt_static
    (road=1, lane=2) -> seg_labels dict at the head grid
    (reference: camera_only/intermediate_fusion_dataset.py:176-197,
    camera_bev_postprocessor.py generate_label/merge_label)."""
    from hmvit_tpu.data.fixture import write_mini_opv2v
    from hmvit_tpu.data.opv2v import HeteroCooperativeDataset

    root = str(tmp_path / "mini")
    write_mini_opv2v(root, num_scenarios=1, num_cavs=2, num_frames=2,
                     image_size=32, max_points=1024, num_vehicles=5)
    params = {
        "train_params": {"max_cav": 2},
        "camera_to_lidar_ratio": 1.0,
        "ego_mode": "camera",
        "add_data_extension": ["bev_dynamic.png", "bev_static.png",
                               "bev_lane.png", "bev_visibility_corp.png"],
        "preprocess": {
            "cav_lidar_range": [-50, -50, -3, 50, 50, 1],
            "args": {"camera_preprocess": {"args": {"resize_x": 32,
                                                    "resize_y": 32}}},
        },
        "postprocess": {"max_num": 30, "order": "hwl",
                        "seg_gt_size": 64},
        "root_dir": root, "validate_dir": root,
    }
    ds = HeteroCooperativeDataset(params, train=False, max_points=1024)
    frame = ds[0]
    assert frame["has_map_gt"] == 1.0
    assert frame["gt_dynamic"].shape == (64, 64)
    assert set(np.unique(frame["gt_static"])) <= {0, 1, 2}
    assert (frame["gt_static"] == 1).any(), "road band missing"
    assert (frame["gt_static"] == 2).any(), "lane line missing"
    assert frame["gt_dynamic"].sum() > 0, "vehicles missing from map"

    labels = ds.seg_labels(frame, (16, 16))
    assert labels["dynamic_seg"].shape == (16, 16)
    assert labels["static_seg"].shape == (16, 16)
    assert (labels["static_seg"] > 0).any()

    # without the extension config, detection frames stay map-free
    params2 = {k: v for k, v in params.items()
               if k != "add_data_extension"}
    ds2 = HeteroCooperativeDataset(params2, train=False, max_points=1024)
    assert "gt_dynamic" not in ds2[0]
    # and box-raster fallback still provides dynamic labels
    lab2 = ds2.seg_labels(ds2[0], (16, 16))
    assert "dynamic_seg" in lab2 and "static_seg" not in lab2


def test_spatial_correction_matrix(tmp_path):
    """cur_ego_pose_flag=False: transforms target the DELAYED ego pose
    and spatial_correction_matrix carries the ego's motion over the
    delay — composing them recovers the current-ego transform
    (reference: basedataset.py:565-635)."""
    from hmvit_tpu.data.fixture import write_mini_opv2v
    from hmvit_tpu.data.opv2v import HeteroCooperativeDataset

    root = str(tmp_path / "mini")
    write_mini_opv2v(root, num_scenarios=1, num_cavs=2, num_frames=4,
                     image_size=32, max_points=512)
    params = {
        "train_params": {"max_cav": 2},
        "camera_to_lidar_ratio": 0.0,
        "ego_mode": "lidar",
        "wild_setting": {"async": True, "async_mode": "sim",
                         "async_overhead": 2},
        "preprocess": {
            "cav_lidar_range": [-102.4, -102.4, -3, 102.4, 102.4, 1],
            "args": {"camera_preprocess": {"args": {"resize_x": 32,
                                                    "resize_y": 32}}},
        },
        "postprocess": {"max_num": 30, "order": "hwl"},
        "root_dir": root, "validate_dir": root,
    }
    cur = HeteroCooperativeDataset(params, train=False, max_points=512)
    f_cur = cur[3]
    np.testing.assert_allclose(f_cur["spatial_correction_matrix"][1],
                               np.eye(4), atol=1e-6)

    delayed = HeteroCooperativeDataset(
        dict(params, cur_ego_pose_flag=False), train=False,
        max_points=512)
    f_del = delayed[3]
    corr = f_del["spatial_correction_matrix"][1]
    assert not np.allclose(corr, np.eye(4), atol=1e-6)
    composed = corr @ f_del["transformation_matrix"][1]
    np.testing.assert_allclose(composed,
                               f_cur["transformation_matrix"][1],
                               atol=1e-4)
