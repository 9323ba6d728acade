"""Sequence visualization: render a scenario's frames to numbered BEV
pngs and an animated gif — the headless twin of the reference's open3d
sequence viewer (reference: opencood/visualization/vis_utils.py:246-673
+ vis_data_sequence.py); TPU pods have no display, so frames go to disk.
"""
from __future__ import annotations

import os

import numpy as np

from ..utils import boxes as box_utils
from .vis import visualize_bev


def vis_frame(dataset, idx: int) -> dict:
    """EarlyFusionVisDataset twin (reference: lidar_only/
    early_fusion_vis_dataset.py): the merged multi-agent cloud in the
    ego frame + ego-frame GT boxes, no voxelization."""
    frame = dataset.early_fusion_frame(idx)
    pts = frame["points"][0][frame["points_mask"][0] > 0]
    boxes = frame["object_bbx_center"][frame["object_bbx_mask"] > 0]
    corners = (box_utils.boxes_to_corners_3d(boxes, dataset.order)
               if len(boxes) else np.zeros((0, 8, 3)))
    return {"points": pts, "gt_corners": corners}


def render_sequence(dataset, out_dir: str, indices=None,
                    pred_fn=None, gif: bool = True,
                    gif_name: str = "sequence.gif",
                    html: bool = True) -> list:
    """Render frames to ``out_dir/frame_%05d.png`` (+ optional gif and
    an interactive 3D HTML viewer, ``out_dir/sequence.html``).

    pred_fn: optional ``idx -> (pred_corners, scores)`` callback so an
    inference loop can overlay detections.  Returns the png paths."""
    os.makedirs(out_dir, exist_ok=True)
    indices = range(len(dataset)) if indices is None else indices
    paths = []
    html_frames = []
    for i in indices:
        data = vis_frame(dataset, int(i))
        pred, scores = (pred_fn(int(i)) if pred_fn is not None
                        else (None, None))
        path = os.path.join(out_dir, f"frame_{int(i):05d}.png")
        visualize_bev(data["points"], pred, data["gt_corners"],
                      dataset.lidar_range, save_path=path)
        paths.append(path)
        if html:
            html_frames.append({"points": data["points"],
                                "pred_corners": pred,
                                "gt_corners": data["gt_corners"],
                                "scores": scores})

    if html and html_frames:
        from .viewer3d import export_sequence_html

        export_sequence_html(os.path.join(out_dir, "sequence.html"),
                             html_frames)

    if gif and paths:
        try:
            from PIL import Image

            frames = [Image.open(p) for p in paths]
            frames[0].save(os.path.join(out_dir, gif_name),
                           save_all=True, append_images=frames[1:],
                           duration=200, loop=0)
        except ImportError:
            pass  # PIL optional; numbered pngs remain
    return paths
