"""Write a synthetic mini-OPV2V dataset to disk (same layout as the real
release) so the full loader/trainer path can run without the dataset."""
from __future__ import annotations

import os

import numpy as np
import yaml

from ..utils import boxes as box_utils
from . import synthetic
from .pcd_io import write_pcd


def write_mini_opv2v(
    root: str,
    num_scenarios: int = 1,
    num_cavs: int = 2,
    num_frames: int = 2,
    num_vehicles: int = 6,
    image_size: int = 64,
    max_points: int = 4096,
    seed: int = 0,
    min_separation: float = 0.0,
    area: float = 30.0,
) -> None:
    rng = np.random.default_rng(seed)
    try:
        import cv2
    except ImportError:
        cv2 = None

    for s in range(num_scenarios):
        vehicles, poses = synthetic.make_scene(
            rng, num_agents=num_cavs, num_vehicles=num_vehicles, area=area,
            min_separation=min_separation,
        )
        scen_dir = os.path.join(root, f"scenario_{s:02d}")
        for ci in range(num_cavs):
            cav_dir = os.path.join(scen_dir, str(641 + ci))
            os.makedirs(cav_dir, exist_ok=True)
            for t in range(num_frames):
                ts = f"{68 + 2 * t:06d}"
                # drift in x/y only: shifting z (or roll/pitch) levitates
                # the ego and pushes GT box bottoms past the reference's
                # abnormal-z post-process filter (z < -3), silently
                # zeroing recall on later frames
                pose = np.asarray(poses[ci], dtype=float).copy()
                pose[0] += t * 0.5
                pose[1] += t * 0.5
                pose = list(pose)
                meta = {
                    "lidar_pose": [float(x) for x in pose],
                    "true_ego_pos": [float(x) for x in pose],
                    "predicted_ego_pos": [float(x) for x in pose],
                    "ego_speed": 5.0,
                    "vehicles": {},
                }
                for mi in range(4):
                    f = image_size / 2.0
                    cam_pose = list(pose)
                    cam_pose[4] = float(pose[4] + 90.0 * mi)
                    meta[f"camera{mi}"] = {
                        "cords": [float(x) for x in cam_pose],
                        "intrinsic": [
                            [f, 0.0, image_size / 2],
                            [0.0, f, image_size / 2],
                            [0.0, 0.0, 1.0],
                        ],
                        "extrinsic": np.eye(4).tolist(),
                    }
                for vi, v in enumerate(vehicles):
                    corners = box_utils.boxes_to_corners_3d(v[None],
                                                            "hwl")[0]
                    center_z = float(v[2])
                    meta["vehicles"][int(100 + vi)] = {
                        "location": [float(v[0]), float(v[1]),
                                     center_z - float(v[3]) / 2],
                        "center": [0.0, 0.0, float(v[3]) / 2],
                        "angle": [0.0, float(np.degrees(v[6])), 0.0],
                        "extent": [float(v[5]) / 2, float(v[4]) / 2,
                                   float(v[3]) / 2],
                        "_corners_world": corners.tolist(),
                    }
                with open(os.path.join(cav_dir, f"{ts}.yaml"), "w") as fh:
                    yaml.safe_dump(meta, fh)

                pts, mask = synthetic.lidar_from_boxes(
                    rng, vehicles, pose, max_points=max_points,
                    max_range=60.0)
                write_pcd(os.path.join(cav_dir, f"{ts}.pcd"),
                          pts[mask > 0])

                if cv2 is not None:
                    img = (rng.uniform(0, 255, (image_size, image_size, 3))
                           .astype(np.uint8))
                    for mi in range(4):
                        cv2.imwrite(
                            os.path.join(cav_dir, f"{ts}_camera{mi}.png"),
                            img)

                    # BEV map ground truth rasters (same per-frame file
                    # scheme as the real OPV2V release: reference
                    # basedataset.py add_data_extension handling).
                    # Dynamic = vehicle boxes in this cav's frame;
                    # static = road band; lane = center line.
                    from ..models.seg_head import rasterize_boxes_to_mask

                    map_range = [-50, -50, -3, 50, 50, 1]
                    msize = 128
                    in_frame = synthetic.vehicles_in_agent_frame(
                        vehicles, pose, map_range)
                    dyn = rasterize_boxes_to_mask(
                        in_frame, map_range, (msize, msize), "hwl") * 255
                    road = np.zeros((msize, msize), np.uint8)
                    road[msize // 4: 3 * msize // 4] = 255  # road band
                    lane = np.zeros((msize, msize), np.uint8)
                    lane[msize // 2 - 1: msize // 2 + 1] = 255
                    for name, m in (("bev_dynamic", dyn),
                                    ("bev_static", road),
                                    ("bev_lane", lane),
                                    ("bev_visibility_corp", dyn)):
                        cv2.imwrite(
                            os.path.join(cav_dir, f"{ts}_{name}.png"),
                            np.stack([m] * 3, -1))
