"""Evaluation CLI.

Mirrors the reference's inference surface (reference:
opencood/tools/inference_camera.py:17-265 and infrence_utils.py:12-185):
loads a run directory's config snapshot + last checkpoint, sweeps the
validation split at batch 1, decodes on-device, accumulates IoU +
distance AP, prints the table and dumps eval.yaml.

Fusion methods:
  intermediate  one cooperative model on the full agent batch;
  no            ego only (other agents masked out);
  early         all point clouds projected to ego and merged;
  late          per-CAV single-agent inference in each CAV's own frame,
                boxes projected to ego, joint NMS — with optional
                per-modality models (--camera_model_dir /
                --lidar_model_dir) for the mixed fleet.

Usage:
  python -m hmvit_tpu.tools.inference --model_dir runs/<run>
      [--fusion_method intermediate|no|early|late]
      [--camera_model_dir d --lidar_model_dir d]
      [--ap_mode iou|distance|both] [--camera_to_lidar_ratio R]
      [--ego_mode m] [--synthetic] [--save_npy] [--save_vis]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import yaml


def parse_args(argv=None):
    p = argparse.ArgumentParser("hmvit_tpu inference")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--camera_model_dir", default="")
    p.add_argument("--lidar_model_dir", default="")
    p.add_argument("--fusion_method", default="intermediate",
                   choices=["intermediate", "no", "early", "late"])
    p.add_argument("--ap_mode", default="both",
                   choices=["iou", "distance", "both"])
    p.add_argument("--camera_to_lidar_ratio", type=float, default=None)
    p.add_argument("--ego_mode", default=None)
    p.add_argument("--max_points", type=int, default=60000)
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_cavs", type=int, default=2,
                   help="fleet size of the generated mini-OPV2V fixture")
    p.add_argument("--synthetic_frames", type=int, default=4)
    p.add_argument("--bf16", action="store_true",
                   help="TPU-standard serving numerics: params and "
                        "camera pixels cast to bfloat16, geometry/"
                        "calibration and raw points stay fp32 (the "
                        "bench.py serving convention; psm scores agree "
                        "with fp32 to ~2e-4, PERF.md)")
    p.add_argument("--save_npy", action="store_true")
    p.add_argument("--save_vis", action="store_true")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the frame sweep over every visible "
                        "device (one jitted batched program, frames "
                        "split on the mesh's data axis; intermediate "
                        "fusion only — decode/AP stay on the host)")
    p.add_argument("--serving_buckets", action="store_true",
                   help="bucketed serving dispatch: one compiled "
                        "program per (camera count, fleet size, ego "
                        "modality); identical outputs, faster on TPU")
    p.add_argument("--save_3d", action="store_true",
                   help="export an interactive 3D HTML sequence viewer "
                        "(the reference's o3d sequence viewer twin)")
    return p.parse_args(argv)


def load_runnable(model_dir: str, example_batch):
    """(forward_fn, variables) for a run directory."""
    import jax
    import jax.numpy as jnp

    from ..config import load_config
    from ..models.zoo import build_model
    from ..train.checkpointing import restore_checkpoint

    params_cfg = load_config("", model_dir=model_dir)
    model = build_model(params_cfg["model"])
    jb = {k: jnp.asarray(v) for k, v in example_batch.items()
          if k not in ("object_ids", "to_ego")}
    variables = model.init(jax.random.key(0), jb, train=False)
    ckpt_dir = os.path.join(os.path.abspath(model_dir), "ckpt")
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
    )
    restored = restore_checkpoint(ckpt_dir, abstract)
    if restored is None:
        print(f"WARNING: no checkpoint in {model_dir}, random weights")
    else:
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
    forward = jax.jit(lambda v, b: model.apply(v, b, train=False))
    return forward, variables, model


def make_serving_forward(model):
    """Bucketed serving dispatch (HMViT only): one compiled program per
    (camera count, active agents, ego modality) bucket — the camera
    encoder runs on exactly the fleet's camera slots and only the ego's
    decoder branch runs.  Numerically identical to the plain forward
    (tested in tests/test_hetero_fusion.py)."""
    import functools

    import jax

    from ..models.hmvit import HMViT

    if not isinstance(model, HMViT):
        return None

    @functools.lru_cache(maxsize=None)
    def bucket(modes_t, n_active):
        # bucket key = the fleet's exact modality layout: enables the
        # static type-range hetero projections (half the projection
        # FLOPs) on top of the encoder bucketing.  Fleet layouts are
        # few (<= 2^max_cav) so the per-layout jit cache stays small.
        n_cam = sum(1 for m in modes_t if m == 0)
        return jax.jit(lambda v, b: model.apply(
            v, b, train=False, camera_bucket=n_cam,
            active_agents=n_active, static_ego_modality=modes_t[0],
            static_modes=modes_t))

    def forward(v, b, frame):
        n_active = max(int(np.asarray(frame["agent_mask"]).sum()), 1)
        modes = np.asarray(frame["mode"])[:n_active]
        return bucket(tuple(int(m) for m in modes), n_active)(v, b)

    return forward


def main(argv=None):
    args = parse_args(argv)

    import jax.numpy as jnp

    from ..config import load_config
    from ..data.opv2v import HeteroCooperativeDataset
    from ..postprocess import build_postprocessor
    from ..utils import boxes as box_utils
    from ..utils import evaluation as E

    params = load_config("", model_dir=args.model_dir)
    if args.camera_to_lidar_ratio is not None:
        params["camera_to_lidar_ratio"] = args.camera_to_lidar_ratio
    if args.ego_mode is not None:
        params["ego_mode"] = args.ego_mode

    if args.synthetic:
        import tempfile

        from ..data.fixture import write_mini_opv2v

        root = tempfile.mkdtemp(prefix="mini_opv2v_eval_")
        cam_args = (params["preprocess"]["args"]["camera_preprocess"]
                    ["args"])
        write_mini_opv2v(root, num_scenarios=1,
                         num_cavs=args.synthetic_cavs,
                         num_frames=args.synthetic_frames,
                         image_size=cam_args["resize_x"],
                         max_points=min(args.max_points, 8192))
        params["root_dir"] = params["validate_dir"] = root

    dataset = HeteroCooperativeDataset(params, train=False,
                                       max_points=args.max_points)
    pp = build_postprocessor(params["postprocess"], train=False)
    anchors = pp.generate_anchor_box()

    def to_jnp(batch):
        return {k: jnp.asarray(v) for k, v in batch.items()
                if k not in ("object_ids", "to_ego")}

    example = dataset.collate_batch([dataset[0]])
    forward, variables, model = load_runnable(args.model_dir, example)
    bf16_batch = None
    if args.bf16:
        import jax

        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables)
        # geometry/calibration and raw lidar points stay fp32 (bf16
        # coordinates quantize to ~0.4 m at 100 m range); the pillar
        # path casts its assembled features via lidar compute_dtype
        geom = {"pairwise_t_matrix", "transformation_matrix",
                "intrinsics", "extrinsics", "spatial_correction_matrix",
                "points"}

        def bf16_batch(jb):
            return {k: (v.astype(jnp.bfloat16)
                        if v.dtype == jnp.float32 and k not in geom
                        else v)
                    for k, v in jb.items()}
    serving_fwd = (make_serving_forward(model)
                   if args.serving_buckets else None)
    models = {"default": (forward, variables)}
    if args.fusion_method == "late":
        if args.camera_model_dir:
            models["camera"] = load_runnable(args.camera_model_dir,
                                             example)[:2]
        if args.lidar_model_dir:
            models["lidar"] = load_runnable(args.lidar_model_dir,
                                            example)[:2]

    stat = E.new_result_stat(args.ap_mode)
    n_frames = len(dataset) if not args.max_frames else min(
        len(dataset), args.max_frames)
    npy_dir = os.path.join(args.model_dir, "npy")
    vis_dir = os.path.join(args.model_dir, "vis")
    if args.save_npy:
        os.makedirs(npy_dir, exist_ok=True)
    if args.save_vis:
        os.makedirs(vis_dir, exist_ok=True)
    html_frames = []

    def to_host_output(out):
        """Decoder-family-agnostic output view (anchor psm/rm or
        anchor-free cls/reg)."""
        keys = ("psm", "rm") if "psm" in out else ("cls", "reg")
        return {k: np.asarray(out[k]) for k in keys}

    def lift_corners(corners):
        """(N, 4, 2) anchor-free BEV corners -> (N, 8, 3) box corners so
        eval/vis stay family-uniform (z spans a nominal 0..1.5 m)."""
        if corners is None or corners.ndim != 3 or corners.shape[1] == 8:
            return corners
        lo = np.concatenate(
            [corners, np.zeros_like(corners[..., :1])], axis=-1)
        hi = lo + np.array([0.0, 0.0, 1.5])
        return np.concatenate([lo, hi], axis=1)

    if args.data_parallel:
        # multi-device eval: the TPU-native replacement for the
        # reference's serial per-frame loop (reference:
        # opencood/tools/inference_camera.py:145-185) — frames ride the
        # mesh's data axis, one program, identical AP (pinned by
        # tests/test_trainer_sharding.py::
        # test_sharded_eval_matches_single_device_ap)
        if args.fusion_method != "intermediate":
            raise SystemExit("--data_parallel supports intermediate "
                             "fusion only")
        import jax

        from ..parallel import make_mesh, make_sharded_eval, shard_batch

        mesh = make_mesh()
        nd = jax.device_count()
        eval_fwd = make_sharded_eval(model, mesh)
        for start in range(0, n_frames, nd):
            idxs = list(range(start, min(start + nd, n_frames)))
            frames = [dataset[i] for i in idxs]
            while len(frames) < nd:
                frames.append(frames[-1])  # pad; padded outputs dropped
            jb = to_jnp(dataset.collate_batch(frames))
            out = eval_fwd(variables, shard_batch(jb, mesh))
            host = to_host_output(out)
            for k, i in enumerate(idxs):
                per = {kk: vv[k:k + 1] for kk, vv in host.items()}
                corners, scores = pp.post_process(
                    {"ego": {"transformation_matrix": np.eye(4),
                             "anchor_box": anchors,
                             "no_post_projection": True}},
                    {"ego": per},
                )
                corners = lift_corners(corners)
                fr = frames[k]
                gt_mask = fr["object_bbx_mask"] > 0
                gt_corners = box_utils.boxes_to_corners_3d(
                    fr["object_bbx_center"][gt_mask], pp.order)
                E.accumulate_frame(corners, scores, gt_corners, stat)
                if args.save_npy:
                    np.save(os.path.join(npy_dir, f"{i:04d}_pred.npy"),
                            corners if corners is not None
                            else np.zeros((0, 8, 3)))
                    np.save(os.path.join(npy_dir, f"{i:04d}_gt.npy"),
                            gt_corners)
        n_frames = 0  # skip the serial loop below

    # Pipelined serving: the per-frame host work (pcd/png decode,
    # collate, host->device transfer) runs one frame AHEAD on a
    # prefetch thread while the device computes the current frame —
    # the same one-batch-ahead scheme the trainer uses (tools/train.py)
    # and the analogue of the reference's worker-fed eval DataLoader
    # (reference: opencood/tools/inference_camera.py:145-185 fed by
    # train_camera.py:61-76 workers).  Without it, serving wall-clock
    # serializes ~350 ms of host decode in front of every ~34 ms device
    # forward at production scale (PERF.md input-pipeline share).
    from concurrent.futures import ThreadPoolExecutor

    def produce(i):
        """Host-side decode + assembly for frame i (no device compute;
        to_jnp's transfers are thread-safe)."""
        frame = dataset[i]
        if args.fusion_method == "late":
            subs = []
            for sub in dataset.late_fusion_frame(i):
                jb = to_jnp(dataset.collate_batch([sub]))
                if bf16_batch is not None:
                    jb = bf16_batch(jb)
                subs.append((sub, jb))
            return frame, subs
        if args.fusion_method == "early":
            frame = dataset.early_fusion_frame(i)
        elif args.fusion_method == "no":
            frame = dict(frame)
            frame["agent_mask"] = frame["agent_mask"].copy()
            frame["points_mask"] = frame["points_mask"].copy()
            frame["agent_mask"][1:] = 0
            frame["points_mask"][1:] = 0
            frame["record_len"] = np.int32(1)
        jb = to_jnp(dataset.collate_batch([frame]))
        if bf16_batch is not None:
            jb = bf16_batch(jb)
        return frame, jb

    prefetcher = ThreadPoolExecutor(max_workers=1)
    pending = prefetcher.submit(produce, 0) if n_frames else None
    t_e2e = None  # started after frame 0 (its forward pays the compile)
    frame_ms = []
    t_prev = None
    for i in range(n_frames):
        frame, payload = pending.result()
        if i + 1 < n_frames:
            pending = prefetcher.submit(produce, i + 1)
        if args.fusion_method == "late":
            data_dict, output_dict = {}, {}
            for ci, (sub, jb) in enumerate(payload):
                key = "camera" if sub["mode"][0] == 0 else "lidar"
                fwd, var = models.get(key, models["default"])
                out = fwd(var, jb)
                data_dict[ci] = {
                    "transformation_matrix": sub["to_ego"],
                    "anchor_box": anchors,
                }
                output_dict[ci] = to_host_output(out)
            corners, scores = pp.post_process(data_dict, output_dict)
        else:
            jb = payload
            if serving_fwd is not None and args.fusion_method == \
                    "intermediate":
                out = serving_fwd(variables, jb, frame)
            else:
                out = forward(variables, jb)
            corners, scores = pp.post_process(
                {"ego": {"transformation_matrix": np.eye(4),
                         "anchor_box": anchors,
                         "no_post_projection": True}},
                {"ego": to_host_output(out)},
            )
        if i == 0:
            t_e2e = t_prev = time.perf_counter()
        else:
            now = time.perf_counter()
            frame_ms.append((now - t_prev) * 1e3)
            t_prev = now

        corners = lift_corners(corners)
        gt_mask = frame["object_bbx_mask"] > 0
        gt_corners = box_utils.boxes_to_corners_3d(
            frame["object_bbx_center"][gt_mask], pp.order)
        E.accumulate_frame(corners, scores, gt_corners, stat)
        if args.save_npy:
            np.save(os.path.join(npy_dir, f"{i:04d}_pred.npy"),
                    corners if corners is not None else np.zeros((0, 8, 3)))
            np.save(os.path.join(npy_dir, f"{i:04d}_gt.npy"), gt_corners)
        if args.save_vis:
            from ..visualization.vis import visualize_bev

            pts = frame["points"][0][frame["points_mask"][0] > 0]
            visualize_bev(pts, corners, gt_corners,
                          params["preprocess"]["cav_lidar_range"],
                          save_path=os.path.join(vis_dir, f"{i:05d}.png"))
        if args.save_3d:
            html_frames.append({
                "points": frame["points"][0][frame["points_mask"][0] > 0],
                "pred_corners": corners, "gt_corners": gt_corners,
                "scores": scores,
            })

    if html_frames:
        from ..visualization.viewer3d import export_sequence_html

        export_sequence_html(
            os.path.join(args.model_dir, "sequence.html"), html_frames)

    results = E.final_results(stat)
    if t_e2e is not None and n_frames > 1:
        # steady-state END-TO-END throughput: decode + transfer +
        # device forward + rotated-NMS postprocess, overlapped by the
        # prefetch thread; frame 0 (compile) excluded.  This is the
        # honest serving number next to bench.py's device-only fps —
        # on few-core hosts the decode share bounds it (PERF.md).
        wall = time.perf_counter() - t_e2e
        results["e2e"] = {"fps": round((n_frames - 1) / wall, 3),
                          "frames": n_frames - 1,
                          "wall_s": round(wall, 3)}
        if frame_ms:
            results["e2e"]["p50_ms"] = round(
                float(np.percentile(frame_ms, 50)), 1)
            results["e2e"]["p95_ms"] = round(
                float(np.percentile(frame_ms, 95)), 1)
        print(json.dumps({"e2e_fps": results["e2e"]["fps"],
                          "frames": n_frames - 1,
                          "p50_ms": results["e2e"].get("p50_ms"),
                          "p95_ms": results["e2e"].get("p95_ms")}))
    if "iou" in results:
        print("AP@0.3 is %.3f\nAP@0.5 is %.3f\nAP@0.7 is %.3f"
              % (results["iou"]["ap_30"], results["iou"]["ap_50"],
                 results["iou"]["ap_70"]))
    if "distance" in results:
        for k, v in results["distance"].items():
            print(f"d{k} is {v:.3f}")
    with open(os.path.join(args.model_dir, "eval.yaml"), "w") as f:
        yaml.safe_dump(results, f)
    return results


if __name__ == "__main__":
    main()
