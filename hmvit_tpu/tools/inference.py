"""Evaluation CLI.

Mirrors the reference's inference surface (reference:
opencood/tools/inference_camera.py:17-265): loads a run directory's config
snapshot + last checkpoint, sweeps the validation split at batch 1,
decodes on-device, accumulates IoU + distance AP, prints the table and
dumps eval.yaml.

Usage:
  python -m hmvit_tpu.tools.inference --model_dir runs/<run>
      [--fusion_method intermediate|no] [--ap_mode iou|distance|both]
      [--camera_to_lidar_ratio R] [--ego_mode m] [--synthetic]
      [--save_npy]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import yaml


def parse_args(argv=None):
    p = argparse.ArgumentParser("hmvit_tpu inference")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--fusion_method", default="intermediate",
                   choices=["intermediate", "no"])
    p.add_argument("--ap_mode", default="both",
                   choices=["iou", "distance", "both"])
    p.add_argument("--camera_to_lidar_ratio", type=float, default=None)
    p.add_argument("--ego_mode", default=None)
    p.add_argument("--max_points", type=int, default=60000)
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--save_npy", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import load_config
    from ..data.opv2v import HeteroCooperativeDataset
    from ..models.zoo import build_model
    from ..postprocess import AnchorPostprocessor
    from ..train.checkpointing import restore_checkpoint
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
        write_mini_opv2v(root, num_scenarios=1, num_cavs=2, num_frames=4,
                         image_size=cam_args["resize_x"],
                         max_points=min(args.max_points, 8192))
        params["root_dir"] = params["validate_dir"] = root

    dataset = HeteroCooperativeDataset(params, train=False,
                                       max_points=args.max_points)
    pp = AnchorPostprocessor(params["postprocess"], train=False)
    anchors = pp.generate_anchor_box()

    model = build_model(params["model"])
    example = dataset.collate_batch([dataset[0]])
    example = {k: jnp.asarray(v) for k, v in example.items()
               if k != "object_ids"}
    variables = model.init(jax.random.key(0), example, train=False)

    ckpt_dir = os.path.join(os.path.abspath(args.model_dir), "ckpt")
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
    )
    restored = restore_checkpoint(ckpt_dir, abstract)
    if restored is None:
        print("WARNING: no checkpoint found, evaluating random weights")
    else:
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}

    forward = jax.jit(lambda v, b: model.apply(v, b, train=False))

    stat = E.new_result_stat(args.ap_mode)
    n_frames = len(dataset) if not args.max_frames else min(
        len(dataset), args.max_frames)
    npy_dir = os.path.join(args.model_dir, "npy")
    if args.save_npy:
        os.makedirs(npy_dir, exist_ok=True)

    for i in range(n_frames):
        frame = dataset[i]
        if args.fusion_method == "no":
            # ego only: zero out the other agents
            frame["agent_mask"][1:] = 0
            frame["points_mask"][1:] = 0
            frame["record_len"] = np.int32(1)
        batch = dataset.collate_batch([frame])
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k != "object_ids"}
        out = forward(variables, jb)

        corners, scores = pp.post_process(
            {"ego": {"transformation_matrix": np.eye(4),
                     "anchor_box": anchors,
                     "no_post_projection": True}},
            {"ego": {"psm": np.asarray(out["psm"]),
                     "rm": np.asarray(out["rm"])}},
        )
        gt_mask = frame["object_bbx_mask"] > 0
        gt_corners = box_utils.boxes_to_corners_3d(
            frame["object_bbx_center"][gt_mask], pp.order)
        E.accumulate_frame(corners, scores, gt_corners, stat)
        if args.save_npy:
            np.save(os.path.join(npy_dir, f"{i:04d}_pred.npy"),
                    corners if corners is not None else np.zeros((0, 8, 3)))
            np.save(os.path.join(npy_dir, f"{i:04d}_gt.npy"), gt_corners)

    results = E.final_results(stat)
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
