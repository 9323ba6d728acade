"""Rotated non-maximum suppression.

Two implementations with identical greedy semantics (reference:
opencood/utils/box_utils.py:575-620):

* :func:`nms_rotated` — host numpy, exact reference ordering (descending
  score, top-1000 cap), used for parity tests and CPU eval.
* :func:`nms_rotated_device` — jit-able fixed-shape version: top-K by score,
  precomputed K x K rotated IoU, greedy suppression via ``lax.fori_loop``.
  Runs entirely on the accelerator so the inference inner loop never leaves
  the device.
"""
from __future__ import annotations

import numpy as np

from .iou import rotated_iou_matrix


def nms_rotated(corners: np.ndarray, scores: np.ndarray,
                threshold: float, top: int = 1000,
                backend: str = "auto") -> np.ndarray:
    """Greedy rotated NMS on the host.

    corners: (N, 4, 2) or (N, 8, 3) box corners; scores: (N,).
    Returns indices of kept boxes in pick order.

    backend='auto' uses the native C++ clipper (native/rotated_nms.cpp,
    ~50x the numpy path on large late-fusion sweeps, identical pick
    order — tests/test_native_nms.py) when it builds, else numpy;
    'numpy' forces the reference-ordering numpy oracle.
    """
    corners = np.asarray(corners)
    scores = np.asarray(scores)
    if corners.shape[0] == 0:
        return np.array([], dtype=np.int32)

    if backend == "auto":
        from .nms_native import nms_rotated_native

        keep = nms_rotated_native(corners, scores, threshold, top)
        if keep is not None:
            return keep

    iou = np.asarray(rotated_iou_matrix(corners, corners, np))
    ixs = scores.argsort()[::-1][:top]

    pick = []
    while len(ixs) > 0:
        i = ixs[0]
        pick.append(i)
        overlap = iou[i, ixs[1:]]
        remove = np.where(overlap > threshold)[0] + 1
        ixs = np.delete(ixs, remove)
        ixs = np.delete(ixs, 0)
    return np.array(pick, dtype=np.int32)


def nms_rotated_device(corners, scores, threshold: float, max_keep: int = 256):
    """Fixed-shape greedy rotated NMS for use inside ``jax.jit``.

    corners: (K, 4, 2) jnp array (already truncated/padded to static K; pad
    entries should carry score 0).  scores: (K,).

    Returns
    -------
    keep_mask : (K,) bool — True for surviving boxes.
    order : (K,) int32 — indices sorted by descending score (for stable
        downstream selection; combine with ``keep_mask[order]``).
    """
    import jax
    import jax.numpy as jnp

    corners = jnp.asarray(corners)[..., :4, :2]
    scores = jnp.asarray(scores)
    k = corners.shape[0]

    order = jnp.argsort(-scores)
    sorted_corners = corners[order]
    iou = rotated_iou_matrix(sorted_corners, sorted_corners, jnp)

    suppress_next = iou > threshold  # row i suppresses j (j ranked lower)

    def body(i, alive):
        is_kept = alive[i]
        later = jnp.arange(k) > i
        kill = suppress_next[i] & later & is_kept
        return alive & ~kill

    alive0 = scores[order] > 0  # padded slots (score<=0) never kept
    alive = jax.lax.fori_loop(0, min(k, max_keep), body, alive0)

    keep_mask = jnp.zeros((k,), bool).at[order].set(alive)
    return keep_mask, order
