"""Camera-space utilities: 3D box projection into images and 2D/3D box
drawing (capability twin of reference opencood/utils/camera_utils.py:
33-224)."""
from __future__ import annotations

import numpy as np

# CARLA/UE4 agent frame (x fwd, y right, z up) -> OpenCV camera axes
_UE4_TO_CV = np.array(
    [[0.0, 1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]], np.float64)

# corner connectivity of the global 8-corner convention
BOX_EDGES = ((0, 1), (1, 2), (2, 3), (3, 0),
             (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7))


def corners_to_camera(corners, intrinsic, cam_to_agent):
    """Project agent-frame box corners into camera pixel+depth coords.

    corners: (N, 8, 3) agent frame; intrinsic (3, 3); cam_to_agent
    (4, 4) camera pose in the agent frame.  Returns (N, 8, 3) =
    (u, v, depth)."""
    corners = np.asarray(corners, np.float64)
    rt = np.linalg.inv(np.asarray(cam_to_agent, np.float64))  # agent->cam
    cam = corners @ rt[:3, :3].T + rt[:3, 3]
    cv = cam @ _UE4_TO_CV.T
    uvw = cv @ np.asarray(intrinsic, np.float64).T
    depth = uvw[..., 2:3]
    uv = uvw[..., :2] / np.where(np.abs(depth) < 1e-6, 1e-6, depth)
    return np.concatenate([uv, depth], axis=-1)


def filter_boxes_in_image(cam_corners, image_w: int, image_h: int):
    """Keep boxes with at least one corner inside the image and in
    front of the camera (reference: camera_utils.py:113-139)."""
    c = np.asarray(cam_corners)
    inside = ((c[..., 0] > 0) & (c[..., 0] < image_w)
              & (c[..., 1] > 0) & (c[..., 1] < image_h)
              & (c[..., 2] > 0))
    return c[inside.any(axis=1)]


def draw_2d_boxes(image, cam_corners, color=(255, 0, 0), thickness=2):
    """Axis-aligned 2D boxes from projected corners (reference:
    camera_utils.py:142-182)."""
    import cv2

    out = np.ascontiguousarray(image).copy()
    kept = filter_boxes_in_image(cam_corners, out.shape[1], out.shape[0])
    for box in kept:
        x0, y0 = box[:, 0].min(), box[:, 1].min()
        x1, y1 = box[:, 0].max(), box[:, 1].max()
        cv2.rectangle(out, (int(x0), int(y0)), (int(x1), int(y1)),
                      color, thickness)
    return out


def plot_all_agents(draw_image_list, cav_id_list, save_path=None):
    """Grid of every agent's (drawn) camera images: one row per CAV,
    one column per camera (reference: camera_utils.plot_all_agents,
    the tutorial notebook's display step).

    Each row's entries may be plain images or ``(camera_key, image)``
    pairs (what ``visualize_all_agents_bbx`` returns) — pairs keep
    column titles tracking the actual camera id even when a camera's
    image is missing (``None`` leaves the cell blank).

    Returns the matplotlib figure and optionally saves a png.  Only
    switches to the Agg backend when no display is available, so an
    interactive session's ``plt.show()`` keeps working."""
    import os

    import matplotlib

    if not os.environ.get("DISPLAY") and not os.environ.get(
            "MPLBACKEND"):
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def norm(entry, c):
        if isinstance(entry, tuple):
            return entry
        return (f"camera{c}", entry)

    rows = len(draw_image_list)
    cols = max((len(r) for r in draw_image_list), default=1)
    fig, axes = plt.subplots(rows, cols,
                             figsize=(3 * cols, 3 * rows), squeeze=False)
    for r, (images, cav_id) in enumerate(
            zip(draw_image_list, cav_id_list)):
        for c in range(cols):
            ax = axes[r][c]
            ax.axis("off")
            if c < len(images):
                cam_key, img = norm(images[c], c)
                if img is not None:
                    ax.imshow(img)
                ax.set_title(f"agent {cav_id} {cam_key}", fontsize=8)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=80)
    return fig


def draw_3d_boxes(image, cam_corners, color=(0, 255, 0), thickness=2):
    """Wireframe 3D boxes (reference: camera_utils.py:185-224)."""
    import cv2

    out = np.ascontiguousarray(image).copy()
    kept = filter_boxes_in_image(cam_corners, out.shape[1], out.shape[0])
    for box in kept:
        pts = box[:, :2].astype(int)
        for a, b in BOX_EDGES:
            cv2.line(out, tuple(pts[a]), tuple(pts[b]), color, thickness,
                     cv2.LINE_AA)
    return out
