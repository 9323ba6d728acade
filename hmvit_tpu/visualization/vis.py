"""BEV visualization (matplotlib, host-side).

Capability-equivalent of the reference's default visualize path
(reference: opencood/visualization/vis_utils.py:367-451
visualize_single_sample_output_bev): point cloud + prediction (red) and
ground-truth (green) bottom-face polygons rendered to a BEV image.
The open3d interactive viewer is intentionally not replicated (headless
TPU pods); sequences are written as numbered pngs instead.
"""
from __future__ import annotations

import numpy as np


def visualize_bev(points, pred_corners, gt_corners, pc_range,
                  save_path: str | None = None, show: bool = False):
    """Render one frame.

    points: (N, >=2) or None; pred/gt corners: (K, 8, 3) / (K, 4, 2) or
    None; pc_range: [x0, y0, z0, x1, y1, z1].
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    ax.set_facecolor("black")
    fig.patch.set_facecolor("black")

    if points is not None and len(points):
        ax.scatter(points[:, 0], points[:, 1], s=0.05, c="white",
                   linewidths=0)

    def draw(corners, color):
        if corners is None:
            return
        for box in np.asarray(corners):
            ring = box[:4, :2]
            ring = np.vstack([ring, ring[:1]])
            ax.plot(ring[:, 0], ring[:, 1], color=color, linewidth=1.0)

    draw(gt_corners, "lime")
    draw(pred_corners, "red")

    ax.set_xlim(pc_range[0], pc_range[3])
    ax.set_ylim(pc_range[1], pc_range[4])
    ax.set_aspect("equal")
    ax.axis("off")
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight",
                    facecolor="black")
    if show:  # pragma: no cover - interactive only
        plt.show()
    plt.close(fig)


def visualize_sequence(frames, pc_range, out_dir: str):
    """frames: iterable of (points, pred_corners, gt_corners)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    for i, (pts, pred, gt) in enumerate(frames):
        visualize_bev(pts, pred, gt, pc_range,
                      save_path=os.path.join(out_dir, f"{i:05d}.png"))


def visualize_seg(seg_logits, save_path: str | None = None):
    """Render a (H, W) or (C, H, W) BEV segmentation map."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    seg = np.asarray(seg_logits)
    if seg.ndim == 3:
        seg = seg.argmax(0)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(seg, cmap="viridis")
    ax.axis("off")
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
