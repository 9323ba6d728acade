"""OPV2V on-disk dataset: scenario scan, hetero modality assignment,
pose reform, GT projection, fixed-shape frame assembly.

Host-side analogue of the reference's dataset stack (reference:
opencood/data_utils/datasets/basedataset.py:23-801 and
mixed/intermediate_fusion_dataset.py:15-463) with the key difference that
no voxelization happens here: frames carry raw padded point clouds and the
device voxelizes inside the jitted forward.  All outputs are statically
shaped (max_cav slots, max_points, max_objects) so one compiled program
serves every frame.

Layout expected: root/<scenario>/<cav_id>/<timestamp>.yaml / .pcd /
_camera{0..3}.png.  RSUs have negative cav ids and sort to the end; the
ego is the first CAV.
"""
from __future__ import annotations

import os
import re
from collections import OrderedDict

import threading

import numpy as np
import yaml

from .. import COM_RANGE
from ..utils import boxes as box_utils
from ..utils import transforms as T
from .pcd_native import read_pcd_padded


class _FrameLoader(yaml.SafeLoader):
    pass


_FrameLoader.add_constructor(
    "tag:yaml.org,2002:python/tuple",
    lambda loader, node: tuple(loader.construct_sequence(node)),
)


def load_frame_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.load(f, Loader=_FrameLoader)


def create_corner_template(extent) -> np.ndarray:
    """(8, 3) corners of a box with half-extents [ex, ey, ez], ordered to
    match the global corner convention."""
    ex, ey, ez = extent
    return np.array(
        [
            [ex, -ey, -ez], [ex, ey, -ez], [-ex, ey, -ez], [-ex, -ey, -ez],
            [ex, -ey, ez], [ex, ey, ez], [-ex, ey, ez], [-ex, -ey, ez],
        ]
    )


def project_world_objects(vehicles: dict, lidar_pose, lidar_range,
                          order: str = "hwl") -> "OrderedDict":
    """World-frame vehicle dicts -> {id: (7,) box in lidar frame}.

    Vehicle schema (per OPV2V frame yaml): location + center offset,
    angle [roll, yaw, pitch] degrees, extent = half dims [l/2, w/2, h/2].
    """
    out = OrderedDict()
    for obj_id, content in vehicles.items():
        loc = content["location"]
        center = content.get("center", [0, 0, 0])
        angle = content["angle"]
        extent = content["extent"]
        object_pose = [
            loc[0] + center[0], loc[1] + center[1], loc[2] + center[2],
            angle[0], angle[1], angle[2],
        ]
        obj_to_lidar = T.pose_to_pose(object_pose, lidar_pose)
        corners = create_corner_template(extent)
        corners = T.project_points(corners, obj_to_lidar)
        box = box_utils.corners_to_boxes(corners[None], order)[0]
        keep = box_utils.mask_boxes_outside_range(
            box[None], lidar_range, order
        )
        if keep[0]:
            out[obj_id] = box
    return out


def mask_ego_points(points: np.ndarray, x_half: float = 1.95,
                    y_half: float = 1.1) -> np.ndarray:
    """Remove the ego vehicle's own body returns."""
    hit = (np.abs(points[:, 0]) <= x_half) & (np.abs(points[:, 1]) <= y_half)
    return points[~hit]


def scan_scenarios(root: str) -> list:
    """[(scenario_name, OrderedDict{cav_id: {timestamp: file dict}})]."""
    scenarios = []
    for scen in sorted(os.listdir(root)):
        scen_dir = os.path.join(root, scen)
        if not os.path.isdir(scen_dir):
            continue
        cav_ids = [c for c in os.listdir(scen_dir)
                   if os.path.isdir(os.path.join(scen_dir, c))]
        # RSUs (negative ids) go last; ego is the first CAV
        cav_ids = sorted(cav_ids, key=lambda c: (int(c) < 0, int(c)))
        cavs = OrderedDict()
        for cav in cav_ids:
            cav_dir = os.path.join(scen_dir, cav)
            stamps = sorted(
                {m.group(1) for fn in os.listdir(cav_dir)
                 if (m := re.match(r"(\d+)\.yaml$", fn))}
            )
            frames = OrderedDict()
            for ts in stamps:
                frames[ts] = {
                    "yaml": os.path.join(cav_dir, f"{ts}.yaml"),
                    "pcd": os.path.join(cav_dir, f"{ts}.pcd"),
                    "cameras": [
                        os.path.join(cav_dir, f"{ts}_camera{i}.png")
                        for i in range(4)
                    ],
                    # BEV map GT rasters (the real OPV2V release ships
                    # them per frame; reference basedataset.py:77-85
                    # loads them via add_data_extension)
                    "bev_maps": {
                        name: os.path.join(cav_dir, f"{ts}_{name}.png")
                        for name in ("bev_dynamic", "bev_static",
                                     "bev_lane", "bev_visibility_corp")
                    },
                }
            cavs[cav] = frames
        scenarios.append((scen, cavs))
    return scenarios


def preprocess_image(path: str, size: int, mean, std) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (size, size)).astype(np.float32) / 255.0
    return (img - np.asarray(mean)) / np.asarray(std)


class HeteroCooperativeDataset:
    """Intermediate-fusion hetero dataset producing padded frame pytrees.

    params keys used: root_dir/validate_dir, train_params.max_cav,
    camera_to_lidar_ratio, ego_mode, preprocess (camera size / lidar
    range), postprocess.max_num, wild_setting (async / loc_err).
    """

    IMAGE_MEAN = (0.485, 0.456, 0.406)
    IMAGE_STD = (0.229, 0.224, 0.225)

    def __init__(self, params: dict, train: bool = True,
                 max_points: int = 60000):
        self.params = params
        self.train = train
        root = params["root_dir"] if train else params["validate_dir"]
        self.scenarios = scan_scenarios(root)
        self.max_cav = params["train_params"]["max_cav"]
        self.max_objects = params["postprocess"].get("max_num", 100)
        self.max_points = max_points
        self.camera_ratio = params.get("camera_to_lidar_ratio", 0.0)
        self.ego_mode = params.get("ego_mode", "lidar")
        self.lidar_range = params["preprocess"]["cav_lidar_range"]
        cam_args = (params["preprocess"]["args"]
                    .get("camera_preprocess", {}).get("args", {}))
        self.image_size = cam_args.get("resize_x", 512)
        self.order = params["postprocess"].get("order", "hwl")
        # BEV-seg map GT (reference: camera_only/
        # intermediate_fusion_dataset.py:176-197): load the ego's
        # bev_{dynamic,static,lane,visibility_corp}.png rasters when the
        # config opts in via add_data_extension
        self.load_bev_maps = bool(params.get("add_data_extension"))
        self.visible = params["train_params"].get("visible", False)
        self.seg_gt_size = int(params["postprocess"].get("seg_gt_size",
                                                         128))

        # communication impairment simulator (reference:
        # opencood/data_utils/datasets/basedataset.py:453-507): 'sim'
        # mode uses a fixed frame overhead; 'real' derives the latency
        # from payload size / link speed + backbone compute time,
        # quantized to the 100 ms frame period.
        wild = params.get("wild_setting", {})
        self.async_frames = 0
        if wild.get("async", False):
            if wild.get("async_mode", "sim") == "real":
                data_size = float(wild.get("data_size", 1.06))  # MB
                speed = float(wild.get("transmission_speed", 27.0))  # Mbps
                backbone = float(wild.get("backbone_delay", 10.0))  # ms
                delay_ms = data_size * 8 / speed * 1000 + backbone
                self.async_frames = int(np.ceil(delay_ms / 100.0))
            else:
                self.async_frames = int(wild.get("async_overhead", 0))
        self.loc_err = wild.get("loc_err", False)
        self.xyz_std = float(wild.get("xyz_std", 0.2))
        self.ryp_std = float(wild.get("ryp_std", 0.2))
        # cur_ego_pose_flag=True (default): transforms map delayed CAV
        # -> CURRENT ego, correction = identity.  False: transforms map
        # to the DELAYED ego pose and spatial_correction_matrix carries
        # the ego's own motion over the delay for the model's STTF to
        # compensate (reference: basedataset.py:565-635).
        self.cur_ego_pose_flag = bool(params.get("cur_ego_pose_flag",
                                                 True))

        # flat index over (scenario, timestamp) using the ego's timeline
        self.index = []
        for si, (_, cavs) in enumerate(self.scenarios):
            ego_frames = next(iter(cavs.values()))
            for ts in ego_frames:
                self.index.append((si, ts))

        self._rng = np.random.default_rng(None if train else 0)
        # __getitem__ may run on loader worker threads; numpy Generators
        # are not thread-safe, so per-frame draws go through this lock
        self._rng_lock = threading.Lock()
        self.reinitialize()

    def reinitialize(self):
        """Re-roll per-(cav, frame) modalities; eval draws are seeded
        (reference: basedataset.py:140-141, 194-200)."""
        if not self.train:
            self._rng = np.random.default_rng(0)
        self.modalities = []
        for si, (_, cavs) in enumerate(self.scenarios):
            n_ts = len(next(iter(cavs.values())))
            draws = (
                self._rng.uniform(0, 1, (len(cavs), n_ts))
                >= self.camera_ratio
            ).astype(np.int32)  # 1 = lidar
            if self.ego_mode == "camera":
                draws[0, :] = 0
            elif self.ego_mode == "lidar":
                draws[0, :] = 1
            self.modalities.append(draws)

    def __len__(self):
        return len(self.index)

    def _noisy_pose(self, pose):
        if not self.loc_err:
            return pose
        pose = list(pose)
        with self._rng_lock:
            noise = self._rng.normal(0, 1.0, 3)
        pose[0] += float(noise[0]) * self.xyz_std
        pose[1] += float(noise[1]) * self.xyz_std
        pose[4] += float(noise[2]) * self.ryp_std
        return pose

    class _Now:
        """Immediate 'future' for the single-core serial fallback."""

        __slots__ = ("_v",)

        def __init__(self, fn, *a, **k):
            self._v = fn(*a, **k)

        def result(self):
            return self._v

    def _io_pool(self):
        """Lazy shared decode pool (pcd + PNG leaves of __getitem__).

        Threads, not processes: cv2/numpy/PIL release the GIL for the
        decode work.  Sized by the ``io_workers`` config key (default 8
        ~ one pcd + 4 cameras for two CAVs in flight).  On a single-core
        host (unless io_workers is set explicitly) decodes run inline —
        threads only add overhead there (~9% measured)."""
        pool = getattr(self, "_io_pool_obj", None)
        if pool is None:
            if (os.cpu_count() or 1) <= 1 and \
                    "io_workers" not in self.params:
                class _Serial:
                    submit = staticmethod(
                        lambda fn, *a, **k:
                        HeteroCooperativeDataset._Now(fn, *a, **k))

                pool = _Serial()
            else:
                from concurrent.futures import ThreadPoolExecutor

                pool = ThreadPoolExecutor(
                    max_workers=int(self.params.get("io_workers", 8)))
            self._io_pool_obj = pool
        return pool

    def __getitem__(self, idx: int) -> dict:
        si, ts = self.index[idx]
        _, cavs = self.scenarios[si]
        cav_list = list(cavs.keys())
        ts_index = list(cavs[cav_list[0]].keys()).index(ts)

        ego_meta = load_frame_yaml(cavs[cav_list[0]][ts]["yaml"])
        ego_pose = ego_meta["lidar_pose"]
        ego_stamps = list(cavs[cav_list[0]].keys())

        frame = _empty_frame(self.max_cav, self.max_points,
                             self.image_size, self.max_objects)
        objects = OrderedDict()
        # Two-phase per-CAV loading: phase 1 walks the fleet (cheap yaml
        # metadata, eligibility, geometry) and SUBMITS the heavy decodes
        # — one pcd read + up to 4 PNG preprocesses per CAV — to a
        # shared thread pool (cv2/numpy release the GIL); phase 2
        # resolves them into the frame arrays.  Measured at production
        # shapes (4 CAVs, 512^2 images, 16k-pt clouds): 350 ms/frame
        # serial.  Training hides that under the 591 ms device step via
        # the one-batch-ahead prefetch thread; the pool exists for
        # multi-core hosts and the serving path, where the device
        # forward is 34 ms/frame and host decode IS the wall-clock
        # bottleneck (PERF.md "Input pipeline", round 4).
        io_jobs = []
        slot = 0
        for ci, cav in enumerate(cav_list):
            if slot >= self.max_cav:
                break
            # communication delay: non-ego agents send an older frame
            cav_stamps = list(cavs[cav].keys())
            eff_ts = ts
            delay_frames = 0
            if ci > 0 and self.async_frames:
                cur = cav_stamps.index(ts) if ts in cav_stamps else 0
                pos = max(cur - self.async_frames, 0)
                eff_ts = cav_stamps[pos]
                delay_frames = cur - pos
            if eff_ts not in cavs[cav]:
                continue
            meta = load_frame_yaml(cavs[cav][eff_ts]["yaml"])
            pose = meta["lidar_pose"]
            dist = np.hypot(pose[0] - ego_pose[0], pose[1] - ego_pose[1])
            if ci > 0 and dist > COM_RANGE:
                continue
            noisy_pose = self._noisy_pose(pose) if ci > 0 else pose

            # GT always from true poses (gt_transformation semantics)
            objects.update(
                project_world_objects(meta.get("vehicles", {}), ego_pose,
                                      self.lidar_range, self.order)
            )

            with self._rng_lock:
                pcd_seed = int(self._rng.integers(1 << 31))
            pool = self._io_pool()
            pcd_fut = pool.submit(
                read_pcd_padded, cavs[cav][eff_ts]["pcd"],
                self.max_points + 4096, seed=pcd_seed,
                shuffle=self.train)
            cam_futs = []
            for mi, cam_path in enumerate(cavs[cav][eff_ts]["cameras"]):
                cam_key = f"camera{mi}"
                if cam_key in meta and os.path.exists(cam_path):
                    cam_futs.append((mi, pool.submit(
                        preprocess_image, cam_path, self.image_size,
                        self.IMAGE_MEAN, self.IMAGE_STD)))
                    frame["intrinsics"][slot, mi] = np.asarray(
                        meta[cam_key]["intrinsic"], np.float32)
                    cam_to_lidar = T.pose_to_pose(meta[cam_key]["cords"],
                                                  pose)
                    frame["extrinsics"][slot, mi] = cam_to_lidar.astype(
                        np.float32)
            io_jobs.append((slot, pcd_fut, cam_futs))

            frame["mode"][slot] = self.modalities[si][
                min(ci, self.modalities[si].shape[0] - 1), ts_index]
            frame["agent_mask"][slot] = 1
            # (v/30, dt frames, infra) — RSUs have negative cav ids
            frame["prior_encoding"][slot] = (
                float(meta.get("ego_speed", 0.0)) / 30.0,
                float(delay_frames),
                1.0 if int(cav) < 0 else 0.0,
            )
            if not self.cur_ego_pose_flag and delay_frames and ci > 0:
                # transform to the ego's DELAYED pose; the correction
                # matrix (delayed ego -> current ego) goes to the model
                d_pos = max(ego_stamps.index(ts) - delay_frames, 0)
                ego_delay_pose = load_frame_yaml(
                    cavs[cav_list[0]][ego_stamps[d_pos]]["yaml"]
                )["lidar_pose"]
                frame["transformation_matrix"][slot] = T.pose_to_pose(
                    noisy_pose, ego_delay_pose).astype(np.float32)
                frame["spatial_correction_matrix"][slot] = T.pose_to_pose(
                    ego_delay_pose, ego_pose).astype(np.float32)
                frame["_poses"].append(noisy_pose)
                slot += 1
                continue
            frame["transformation_matrix"][slot] = T.pose_to_pose(
                noisy_pose, ego_pose).astype(np.float32)
            frame["_poses"].append(noisy_pose)
            slot += 1

        # phase 2: resolve the parallel decodes into the frame arrays
        for slot_i, pcd_fut, cam_futs in io_jobs:
            raw, raw_mask = pcd_fut.result()
            pts = mask_ego_points(raw[raw_mask > 0])
            n = min(len(pts), self.max_points)
            frame["points"][slot_i, :n] = pts[:n]
            frame["points_mask"][slot_i, :n] = 1
            for mi, fut in cam_futs:
                frame["camera"][slot_i, mi] = fut.result()

        if self.load_bev_maps:
            frame.update(self._load_bev_gt(cavs[cav_list[0]][ts]))

        poses = frame.pop("_poses")
        frame["pairwise_t_matrix"][:] = T.pairwise_transforms(
            poses, self.max_cav).astype(np.float32)
        frame["record_len"] = np.int32(slot)

        boxes = list(objects.values())[: self.max_objects]
        for i, b in enumerate(boxes):
            frame["object_bbx_center"][i] = b
            frame["object_bbx_mask"][i] = 1
        frame["object_ids"] = list(objects.keys())[: self.max_objects]
        return frame

    def _load_bev_gt(self, files: dict) -> dict:
        """Ego-frame BEV map GT from the on-disk rasters (reference:
        camera_bev_postprocessor.py generate_label/merge_label): any
        nonzero pixel is class 1; static merges road (1) + lane (2).
        Resized to a fixed seg_gt_size for static shapes."""
        import cv2

        s = self.seg_gt_size

        def binarize(name):
            path = files["bev_maps"][name]
            if not os.path.exists(path):
                return None
            img = cv2.imread(path)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            img = cv2.resize(img, (s, s),
                             interpolation=cv2.INTER_NEAREST)
            return (img > 0).astype(np.uint8)

        dyn = binarize("bev_visibility_corp" if self.visible
                       else "bev_dynamic")
        road = binarize("bev_static")
        lane = binarize("bev_lane")
        out = {"gt_dynamic": np.zeros((s, s), np.uint8),
               "gt_static": np.zeros((s, s), np.uint8),
               "has_map_gt": np.float32(0.0)}
        if dyn is not None:
            out["gt_dynamic"] = dyn
            out["has_map_gt"] = np.float32(1.0)
        if road is not None:
            static = road.copy()
            if lane is not None:
                static[lane == 1] = 2
            out["gt_static"] = static
        return out

    def seg_labels(self, frame: dict, grid_hw) -> dict:
        """Seg GT dict at the head's grid: map rasters when the frame
        carries them, otherwise the dynamic map rasterized from boxes."""
        h, w = grid_hw
        if "gt_dynamic" in frame and float(
                np.asarray(frame.get("has_map_gt", 0))) > 0:
            def down(m):
                yi = (np.arange(h) * m.shape[0] // h)
                xi = (np.arange(w) * m.shape[1] // w)
                return m[np.ix_(yi, xi)]

            return {"dynamic_seg": down(np.asarray(frame["gt_dynamic"])),
                    "static_seg": down(np.asarray(frame["gt_static"]))}

        from ..models.seg_head import rasterize_boxes_to_mask

        boxes = frame["object_bbx_center"][frame["object_bbx_mask"] > 0]
        return {"dynamic_seg": rasterize_boxes_to_mask(
            boxes, self.lidar_range, grid_hw, self.order)}

    def early_fusion_frame(self, idx: int) -> dict:
        """Early fusion: every CAV's points projected into the ego frame
        and merged into one cloud on agent slot 0 (reference:
        opencood/data_utils/datasets/lidar_only/early_fusion_dataset.py)."""
        frame = self[idx]
        n_live = int(frame["record_len"])
        merged = []
        for i in range(n_live):
            m = frame["points_mask"][i] > 0
            pts = frame["points"][i][m]
            pts[:, :3] = T.project_points(
                pts[:, :3], frame["transformation_matrix"][i])
            merged.append(pts)
        merged = np.concatenate(merged) if merged else np.zeros((0, 4))
        out = dict(frame)
        out["points"] = np.zeros_like(frame["points"])
        out["points_mask"] = np.zeros_like(frame["points_mask"])
        n = min(len(merged), out["points"].shape[1])
        out["points"][0, :n] = merged[:n]
        out["points_mask"][0, :n] = 1
        out["agent_mask"] = np.zeros_like(frame["agent_mask"])
        out["agent_mask"][0] = 1
        out["record_len"] = np.int32(1)
        out["mode"] = np.array([1] * len(frame["mode"]), np.int32)
        return out

    def late_fusion_frame(self, idx: int) -> list:
        """Late fusion: one single-agent sub-frame per live CAV, each in
        its own frame, tagged with its modality and ego transform
        (reference: mixed/late_fusion_dataset.py:51-82)."""
        frame = self[idx]
        n_live = int(frame["record_len"])
        subs = []
        for i in range(n_live):
            sub = {k: np.array(v, copy=True) for k, v in frame.items()
                   if k != "object_ids"}
            for key in ("points", "points_mask", "camera", "intrinsics",
                        "extrinsics"):
                sub[key][0] = frame[key][i]
                sub[key][1:] = 0
            sub["agent_mask"] = np.zeros_like(frame["agent_mask"])
            sub["agent_mask"][0] = 1
            sub["mode"] = np.array(
                [frame["mode"][i]] * len(frame["mode"]), np.int32)
            sub["record_len"] = np.int32(1)
            sub["pairwise_t_matrix"] = np.tile(
                np.eye(4, dtype=np.float32),
                (*frame["pairwise_t_matrix"].shape[:2], 1, 1))
            sub["transformation_matrix"] = np.tile(
                np.eye(4, dtype=np.float32),
                (frame["transformation_matrix"].shape[0], 1, 1))
            sub["to_ego"] = frame["transformation_matrix"][i]
            sub["object_ids"] = frame.get("object_ids", [])
            subs.append(sub)
        return subs

    def get_sample(self, scenario_idx: int, timestamp_idx: int) -> dict:
        """Raw structured access to one (scenario, timestamp): the
        tutorial API (reference: tutorial/camera_api.ipynb via
        basedataset.py get_sample semantics).

        Returns OrderedDict keyed by cav_id string; each entry carries
        'ego' (first CAV), 'lidar_pose', 'vehicles' (the frame yaml's
        world-frame GT dicts), and 'camera_params' =
        {camera{0..3}: {'camera_coords' (world pose of the camera),
        'camera_extrinsic' (cam -> this agent's lidar frame, 4x4),
        'camera_intrinsic' (3x3), 'image_path', 'image' (raw uint8
        RGB, unresized)}}.  No padding, no preprocessing — this is the
        inspection surface, not the training path."""
        import cv2

        _, cavs = self.scenarios[scenario_idx]
        out = OrderedDict()
        # resolve the timestamp ONCE from the ego (first CAV) and reuse
        # it for every CAV, matching __getitem__ / the reference's
        # retrieve_base_data — per-CAV positional indexing would mix
        # physical timestamps when CAV frame sets differ (late join /
        # early leave in real OPV2V)
        ego_frames = next(iter(cavs.values()))
        ts = list(ego_frames.keys())[timestamp_idx]
        for ci, (cav, frames) in enumerate(cavs.items()):
            if ts not in frames:
                continue
            meta = load_frame_yaml(frames[ts]["yaml"])
            pose = meta["lidar_pose"]
            cam_params = OrderedDict()
            for mi, cam_path in enumerate(frames[ts]["cameras"]):
                cam_key = f"camera{mi}"
                if cam_key not in meta:
                    continue
                img = None
                if os.path.exists(cam_path):
                    img = cv2.cvtColor(cv2.imread(cam_path),
                                       cv2.COLOR_BGR2RGB)
                cam_params[cam_key] = {
                    "camera_coords": meta[cam_key]["cords"],
                    "camera_extrinsic": T.pose_to_pose(
                        meta[cam_key]["cords"], pose),
                    "camera_intrinsic": np.asarray(
                        meta[cam_key]["intrinsic"], np.float64),
                    "image_path": cam_path,
                    "image": img,
                }
            out[str(cav)] = {
                "ego": ci == 0,
                "lidar_pose": pose,
                "vehicles": meta.get("vehicles", {}),
                "camera_params": cam_params,
            }
        return out

    def visualize_all_agents_bbx(self, sample: dict):
        """Draw each agent's GT boxes (its own frame) as 3D wireframes
        onto its camera images (reference: BaseCameraDataset.
        visualize_all_agents_bbx used by tutorial/camera_api.ipynb).

        Returns (draw_image_list, cav_id_list): per CAV, a list of its
        drawn camera images in camera order."""
        from ..utils import camera as camera_utils

        draw_image_list, cav_id_list = [], []
        for cav_id, content in sample.items():
            boxes = project_world_objects(
                content["vehicles"], content["lidar_pose"],
                self.lidar_range, self.order)
            corners = (
                box_utils.boxes_to_corners_3d(
                    np.stack(list(boxes.values())), self.order)
                if boxes else np.zeros((0, 8, 3)))
            drawn = []
            # keep (camera_key, image) pairs so a missing camera file
            # can't shift later images into the wrong column/title
            for cam_key, cam in content["camera_params"].items():
                if cam["image"] is None:
                    drawn.append((cam_key, None))
                    continue
                uvd = camera_utils.corners_to_camera(
                    corners, cam["camera_intrinsic"],
                    cam["camera_extrinsic"])
                drawn.append(
                    (cam_key,
                     camera_utils.draw_3d_boxes(cam["image"], uvd)))
            draw_image_list.append(drawn)
            cav_id_list.append(cav_id)
        return draw_image_list, cav_id_list

    @staticmethod
    def collate_batch(frames: list) -> dict:
        keys = [k for k in frames[0] if not k.startswith("object_ids")]
        batch = {k: np.stack([f[k] for f in frames]) for k in keys}
        batch["object_ids"] = [f["object_ids"] for f in frames]
        return batch


def _empty_frame(max_cav, max_points, image_size, max_objects) -> dict:
    eye4 = np.eye(4, dtype=np.float32)
    return {
        "points": np.zeros((max_cav, max_points, 4), np.float32),
        "points_mask": np.zeros((max_cav, max_points), np.float32),
        "camera": np.zeros((max_cav, 4, image_size, image_size, 3),
                           np.float32),
        "intrinsics": np.tile(np.eye(3, dtype=np.float32),
                              (max_cav, 4, 1, 1)),
        "extrinsics": np.tile(eye4, (max_cav, 4, 1, 1)),
        # padded slots count as lidar: empty point sets are a cheap
        # all-masked pillar pass, and serving camera-buckets stay tight
        "mode": np.ones(max_cav, np.int32),
        "agent_mask": np.zeros(max_cav, np.float32),
        # (velocity/30, time-delay frames, is-infrastructure) per CAV
        # (reference: mixed/intermediate_fusion_dataset.py:386-388)
        "prior_encoding": np.zeros((max_cav, 3), np.float32),
        "pairwise_t_matrix": np.tile(eye4, (max_cav, max_cav, 1, 1)),
        "transformation_matrix": np.tile(eye4, (max_cav, 1, 1)),
        "spatial_correction_matrix": np.tile(eye4, (max_cav, 1, 1)),
        "object_bbx_center": np.zeros((max_objects, 7), np.float32),
        "object_bbx_mask": np.zeros(max_objects, np.float32),
        "_poses": [],
    }
