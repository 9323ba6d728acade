"""Detection post-processing: decode -> filter -> rotated NMS -> range clip.

The entire per-CAV pipeline runs on-device as one jitted, fixed-shape
function (:func:`decode_detections_device`); the host wrapper
(:class:`AnchorPostprocessor`) orchestrates multi-CAV merging and converts
to ragged numpy for evaluation.  Semantics follow the reference pipeline
(reference: opencood/data_utils/post_processor/voxel_postprocessor.py:
232-348): sigmoid score threshold, delta decode, oversize/z sanity filters,
greedy rotated NMS at ``nms_thresh``, GT-range clip.
"""
from __future__ import annotations

import functools

import jax
import numpy as np

from . import GT_RANGE
from .data.anchors import decode_deltas, generate_anchor_grid
from .utils import boxes as box_utils
from .utils.nms import nms_rotated, nms_rotated_device


@functools.partial(
    jax.jit, static_argnames=("score_threshold", "nms_threshold", "max_boxes")
)
def decode_detections_device(
    psm,
    rm,
    anchors,
    transform,
    score_threshold: float = 0.27,
    nms_threshold: float = 0.15,
    max_boxes: int = 512,
):
    """Full single-frame decode on the accelerator.

    Parameters
    ----------
    psm : (1, num_anchor, H, W) classification logits.
    rm : (1, num_anchor*7, H, W) regression map.
    anchors : (H, W, num_anchor, 7) hwl anchor grid.
    transform : (4, 4) projection to ego frame (identity for
        intermediate fusion, matching ``no_post_projection``).

    Returns fixed-shape (corners (K, 8, 3), scores (K,), valid (K,) bool).
    """
    import jax.numpy as jnp

    prob = jnp.transpose(psm, (0, 2, 3, 1)).reshape(-1)
    prob = 1.0 / (1.0 + jnp.exp(-prob))

    boxes = decode_deltas(rm, anchors, jnp)[0]  # (A, 7)

    score = jnp.where(prob > score_threshold, prob, 0.0)
    k = min(max_boxes, score.shape[0])
    top_score, top_idx = jax.lax.top_k(score, k)
    top_boxes = boxes[top_idx]

    corners = box_utils.boxes_to_corners_3d(top_boxes, "hwl", jnp)
    corners = box_utils.project_corners(corners, transform, jnp)

    valid = top_score > 0
    valid &= box_utils.sane_size_mask(corners)
    valid &= box_utils.sane_z_mask(corners)

    masked_score = jnp.where(valid, top_score, 0.0)
    keep, _ = nms_rotated_device(corners[:, :4, :2], masked_score,
                                 nms_threshold)
    valid &= keep
    valid &= box_utils.mask_corners_in_range(corners, jnp.asarray(GT_RANGE),
                                             jnp)
    return corners, masked_score, valid


class AnchorPostprocessor:
    """Host orchestration mirroring the reference postprocessor API."""

    def __init__(self, params: dict, train: bool = True):
        self.params = params
        self.train = train
        self.anchor_num = params["anchor_args"]["num"]
        self.order = params.get("order", "hwl")

    def generate_anchor_box(self) -> np.ndarray:
        return generate_anchor_grid(self.params["anchor_args"], self.order)

    def generate_label(self, gt_box_center, anchors, mask) -> dict:
        from .data.anchors import generate_labels

        return generate_labels(
            gt_box_center,
            mask,
            anchors,
            self.params["target_args"]["pos_threshold"],
            self.params["target_args"]["neg_threshold"],
        )

    def post_process(self, data_dict: dict, output_dict: dict):
        """Multi-CAV late/no-fusion post-process.

        data_dict maps cav_id -> {'transformation_matrix', 'anchor_box',
        optional 'no_post_projection'}; output_dict maps cav_id ->
        {'psm', 'rm'} device arrays.  Returns (corners (N, 8, 3) numpy,
        scores (N,)) after joint NMS over all CAVs, or (None, None).
        """
        all_corners, all_scores = [], []
        for cav_id, content in data_dict.items():
            if cav_id not in output_dict:
                continue
            tf = (
                np.eye(4)
                if content.get("no_post_projection")
                else np.asarray(content["transformation_matrix"])
            )
            corners, scores, valid = decode_detections_device(
                output_dict[cav_id]["psm"],
                output_dict[cav_id]["rm"],
                np.asarray(content["anchor_box"]),
                tf,
                score_threshold=float(
                    self.params["target_args"]["score_threshold"]
                ),
                nms_threshold=float(self.params["nms_thresh"]),
            )
            valid = np.asarray(valid)
            all_corners.append(np.asarray(corners)[valid])
            all_scores.append(np.asarray(scores)[valid])

        if not all_corners:
            return None, None
        corners = np.concatenate(all_corners)
        scores = np.concatenate(all_scores)
        if corners.shape[0] == 0:
            return None, None

        if len(all_corners) > 1:  # joint NMS across CAVs (late fusion)
            keep = nms_rotated(corners, scores,
                               float(self.params["nms_thresh"]))
            corners, scores = corners[keep], scores[keep]
        return corners, scores


def build_postprocessor(params: dict, train: bool = True):
    """Postprocessor factory keyed on ``postprocess.core_method``
    (reference registry: opencood/data_utils/post_processor/__init__.py:
    14-21).  VoxelPostprocessor -> anchor head decode; BevPostprocessor
    -> anchor-free PIXOR decode."""
    name = params.get("core_method", "VoxelPostprocessor")
    if name == "BevPostprocessor":
        from .postprocess_bev import BevPostprocessor

        return BevPostprocessor(params, train=train)
    return AnchorPostprocessor(params, train=train)
