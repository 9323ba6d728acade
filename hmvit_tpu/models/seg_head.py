"""BEV segmentation head + rasterized GT for the camera-only map task.

Capability-equivalent of the reference's BevSegHead and seg pipeline
(reference: opencood/models/sub_modules/bev_seg_head.py:10-63, loss
opencood/loss/vanilla_seg_loss.py:7-107): 1x1 conv heads for the dynamic
(vehicles) and/or static (road) maps, cross-entropy loss with class
weighting, and a host-side box -> BEV-mask rasterizer for the dynamic GT.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BevSegHead(nn.Module):
    """target: 'dynamic', 'static', or 'both'."""
    target: str = "dynamic"
    dynamic_classes: int = 2
    static_classes: int = 3

    @nn.compact
    def __call__(self, x):
        out = {}
        if self.target in ("dynamic", "both"):
            out["dynamic_seg"] = nn.Conv(self.dynamic_classes, (1, 1))(x)
        if self.target in ("static", "both"):
            out["static_seg"] = nn.Conv(self.static_classes, (1, 1))(x)
        return out


def seg_loss(output: dict, labels: dict, d_weights: float = 75.0,
             s_weights: float = 15.0):
    """Weighted pixel CE for dynamic/static maps; labels are int maps."""
    total = 0.0
    parts = {}
    for key, pos_w in (("dynamic_seg", d_weights), ("static_seg",
                                                    s_weights)):
        if key not in output or key not in labels:
            continue
        logits = output[key]  # (B, H, W, C)
        target = labels[key]  # (B, H, W) int
        logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(target, logits.shape[-1])
        weights = jnp.where(target > 0, pos_w, 1.0)
        ce = -(onehot * logp).sum(-1) * weights
        loss = ce.mean()
        parts[key] = loss
        total = total + loss
    parts["total_loss"] = total
    return total, parts


def rasterize_boxes_to_mask(boxes, pc_range, grid_hw, order="hwl"):
    """Host-side dynamic-map GT: boxes (N, 7) -> (H, W) uint8 mask."""
    from ..utils import boxes as box_utils

    h, w = grid_hw
    mask = np.zeros((h, w), np.uint8)
    if boxes is None or len(boxes) == 0:
        return mask
    xs = np.linspace(pc_range[0], pc_range[3], w)
    ys = np.linspace(pc_range[1], pc_range[4], h)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    corners = box_utils.boxes_to_corners_3d(np.asarray(boxes), order)
    for c in corners:
        inside = box_utils.points_in_rotated_box_mask(pts, c[:4, :2])
        mask |= inside.reshape(h, w).astype(np.uint8)
    return mask


def seg_iou(pred, target, num_classes: int = 2) -> dict:
    """Mean IoU over classes (reference: opencood/utils/seg_utils.py)."""
    ious = {}
    pred = np.asarray(pred)
    target = np.asarray(target)
    for c in range(num_classes):
        inter = ((pred == c) & (target == c)).sum()
        union = ((pred == c) | (target == c)).sum()
        ious[c] = float(inter) / max(float(union), 1.0)
    ious["miou"] = float(np.mean([ious[c] for c in range(num_classes)]))
    return ious


def seg_post_process(output: dict) -> dict:
    """Softmax probabilities + argmax class maps for the seg heads
    (reference: camera_bev_postprocessor.py:55-89 post_process_train).

    output: dict with 'dynamic_seg' / 'static_seg' logits (..., H, W, C);
    returns the dict extended with '<name>_prob' and '<name>_map'."""
    import jax
    import jax.numpy as jnp

    out = dict(output)
    for key, name in (("dynamic_seg", "dynamic"),
                      ("static_seg", "static")):
        if key in output:
            prob = jax.nn.softmax(output[key], axis=-1)
            out[f"{name}_prob"] = prob
            out[f"{name}_map"] = jnp.argmax(prob, axis=-1)
    return out
