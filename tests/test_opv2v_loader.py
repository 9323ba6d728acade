"""OPV2V loader driven by an on-disk synthetic mini dataset."""
import os

import numpy as np
import pytest

from hmvit_tpu.data.fixture import write_mini_opv2v
from hmvit_tpu.data.opv2v import (
    HeteroCooperativeDataset,
    load_frame_yaml,
    project_world_objects,
    scan_scenarios,
)
from hmvit_tpu.data.pcd_io import read_pcd, write_pcd

PARAMS = {
    "train_params": {"max_cav": 3},
    "camera_to_lidar_ratio": 0.5,
    "ego_mode": "lidar",
    "preprocess": {
        "cav_lidar_range": [-102.4, -102.4, -3.0, 102.4, 102.4, 1.0],
        "args": {"camera_preprocess": {"args": {"resize_x": 64,
                                                "resize_y": 64}}},
    },
    "postprocess": {"max_num": 50, "order": "hwl"},
}


@pytest.fixture(scope="module")
def mini_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini_opv2v"))
    write_mini_opv2v(root, num_scenarios=2, num_cavs=2, num_frames=2,
                     image_size=64, max_points=2048)
    return root


def test_pcd_roundtrip(tmp_path):
    pts = np.random.default_rng(0).uniform(-10, 10, (100, 4)).astype(
        np.float32)
    path = str(tmp_path / "x.pcd")
    write_pcd(path, pts)
    back = read_pcd(path)
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_scan_layout(mini_root):
    scen = scan_scenarios(mini_root)
    assert len(scen) == 2
    name, cavs = scen[0]
    assert len(cavs) == 2
    frames = next(iter(cavs.values()))
    assert len(frames) == 2
    f = next(iter(frames.values()))
    assert os.path.exists(f["yaml"]) and os.path.exists(f["pcd"])


def test_project_world_objects_consistency(mini_root):
    scen = scan_scenarios(mini_root)
    _, cavs = scen[0]
    frames = next(iter(cavs.values()))
    meta = load_frame_yaml(next(iter(frames.values()))["yaml"])
    pose = meta["lidar_pose"]
    objs = project_world_objects(meta["vehicles"], pose,
                                 [-102.4, -102.4, -3, 102.4, 102.4, 1],
                                 "hwl")
    assert len(objs) > 0
    # the yaml stores the true world corners; verify one projects back
    from hmvit_tpu.utils import transforms as T
    from hmvit_tpu.utils import boxes as B

    for obj_id, box in objs.items():
        world_corners = np.asarray(
            meta["vehicles"][obj_id]["_corners_world"])
        expect = T.project_points(
            world_corners, np.linalg.inv(T.pose_to_world(pose)))
        got = B.boxes_to_corners_3d(box[None], "hwl")[0]
        np.testing.assert_allclose(np.sort(got, axis=0),
                                   np.sort(expect, axis=0), atol=1e-4)
        break


def test_dataset_getitem_and_collate(mini_root):
    params = dict(PARAMS, root_dir=mini_root, validate_dir=mini_root)
    ds = HeteroCooperativeDataset(params, train=False, max_points=2048)
    assert len(ds) == 4  # 2 scenarios x 2 frames
    frame = ds[0]
    assert frame["points"].shape == (3, 2048, 4)
    assert frame["camera"].shape == (3, 4, 64, 64, 3)
    assert frame["mode"][0] == 1  # ego forced lidar
    assert frame["agent_mask"].sum() == frame["record_len"]
    assert frame["object_bbx_mask"].sum() > 0
    # pairwise transforms consistent: T[i,j] @ T[j,i] == I for live agents
    n = int(frame["record_len"])
    pw = frame["pairwise_t_matrix"]
    for i in range(n):
        for j in range(n):
            np.testing.assert_allclose(pw[i, j] @ pw[j, i], np.eye(4),
                                       atol=1e-4)

    batch = ds.collate_batch([ds[0], ds[1]])
    assert batch["points"].shape == (2, 3, 2048, 4)
    assert batch["record_len"].shape == (2,)


def test_eval_determinism(mini_root):
    params = dict(PARAMS, root_dir=mini_root, validate_dir=mini_root,
                  camera_to_lidar_ratio=0.5, ego_mode="mixed")
    ds1 = HeteroCooperativeDataset(params, train=False, max_points=512)
    ds2 = HeteroCooperativeDataset(params, train=False, max_points=512)
    for a, b in zip(ds1.modalities, ds2.modalities):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_loader_feeds_model(mini_root):
    """Mini-dataset -> collate -> HMViT forward: the real data path."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.hmvit import HMViT
    from tiny_cfg import TINY_CFG, RANGE

    params = dict(PARAMS, root_dir=mini_root, validate_dir=mini_root)
    params["preprocess"] = dict(params["preprocess"],
                                cav_lidar_range=RANGE)
    ds = HeteroCooperativeDataset(params, train=False, max_points=1024)
    batch = ds.collate_batch([ds[0]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k != "object_ids"}

    model = HMViT(TINY_CFG)
    variables = model.init(jax.random.key(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert out["psm"].shape == (1, 2, 16, 16)
    assert np.all(np.isfinite(np.asarray(out["psm"])))


def test_tutorial_camera_api(mini_root, tmp_path):
    """Tutorial-twin flow (reference tutorial/camera_api.ipynb):
    get_sample raw access -> per-agent GT box drawing on camera images
    -> plot_all_agents grid."""
    from hmvit_tpu.utils.camera import corners_to_camera, plot_all_agents

    params = dict(PARAMS, root_dir=mini_root, validate_dir=mini_root)
    ds = HeteroCooperativeDataset(params, train=False, max_points=512)

    sample = ds.get_sample(0, 1)
    assert len(sample) == 2  # fixture writes 2 CAVs
    first = next(iter(sample.values()))
    assert first["ego"] is True
    cam0 = first["camera_params"]["camera0"]
    assert cam0["camera_intrinsic"].shape == (3, 3)
    assert cam0["camera_extrinsic"].shape == (4, 4)
    assert cam0["image"].shape == (64, 64, 3)  # raw, unresized
    assert first["vehicles"], "fixture frames carry GT vehicles"

    # every GT box lands in at least one of the 4 yaw-offset cameras
    from hmvit_tpu.data.opv2v import project_world_objects
    from hmvit_tpu.utils import boxes as box_utils

    boxes = project_world_objects(first["vehicles"], first["lidar_pose"],
                                  params["preprocess"]["cav_lidar_range"],
                                  "hwl")
    corners = box_utils.boxes_to_corners_3d(
        np.stack(list(boxes.values())), "hwl")
    hit = np.zeros(len(corners), bool)
    for cam in first["camera_params"].values():
        uvd = corners_to_camera(corners, cam["camera_intrinsic"],
                                cam["camera_extrinsic"])
        inside = ((uvd[..., 0] > 0) & (uvd[..., 0] < 64)
                  & (uvd[..., 1] > 0) & (uvd[..., 1] < 64)
                  & (uvd[..., 2] > 0))
        hit |= inside.any(axis=1)
    assert hit.any(), "no GT box projects into any camera"

    draw_list, cav_ids = ds.visualize_all_agents_bbx(sample)
    assert len(draw_list) == len(cav_ids) == 2
    assert all(len(images) == 4 for images in draw_list)
    # entries are (camera_key, image) pairs so missing cameras can't
    # shift later images into the wrong titled column
    assert draw_list[0][0][0] == "camera0"
    assert draw_list[0][0][1].shape == (64, 64, 3)
    # drawing must have changed at least one drawn camera image
    changed = any(
        not np.array_equal(img, sample[cid]["camera_params"][key]["image"])
        for imgs, cid in zip(draw_list, cav_ids)
        for key, img in imgs)
    assert changed, "wireframes drawn nowhere"

    out_png = str(tmp_path / "agents.png")
    fig = plot_all_agents(draw_list, cav_ids, save_path=out_png)
    assert fig is not None and os.path.exists(out_png)
