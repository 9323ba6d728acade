"""Detection losses.

Numerics match the reference PointPillarLoss (reference:
opencood/loss/point_pillar_loss.py:68-208): sigmoid focal classification
(alpha 0.25, gamma 2) normalized by positive count, weighted smooth-L1
regression (beta 1/9) with sin-difference angle encoding.
Pure jnp — composable under jit/grad/pjit.
"""
from __future__ import annotations

import jax.numpy as jnp


def sigmoid_focal_loss(logits, targets, weights, alpha=0.25, gamma=2.0):
    """Elementwise focal loss on logits; weights broadcast over classes."""
    pred = 1.0 / (1.0 + jnp.exp(-logits))
    alpha_w = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    pt = targets * (1.0 - pred) + (1.0 - targets) * pred
    focal_w = alpha_w * jnp.power(pt, gamma)
    bce = (
        jnp.clip(logits, 0, None)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return focal_w * bce * weights


def weighted_smooth_l1(pred, target, weights, beta=1.0 / 9.0):
    target = jnp.where(jnp.isnan(target), pred, target)
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    return loss * weights[..., None]


def add_sin_difference(pred, target, dim=6):
    """Replace the raw angle channel with sin(a-b) factorization."""
    sin_enc = jnp.sin(pred[..., dim:dim + 1]) * jnp.cos(
        target[..., dim:dim + 1]
    )
    cos_enc = jnp.cos(pred[..., dim:dim + 1]) * jnp.sin(
        target[..., dim:dim + 1]
    )
    pred = jnp.concatenate(
        [pred[..., :dim], sin_enc, pred[..., dim + 1:]], axis=-1
    )
    target = jnp.concatenate(
        [target[..., :dim], cos_enc, target[..., dim + 1:]], axis=-1
    )
    return pred, target


def voxel_net_loss(output, labels, alpha=1.5, beta=1.0):
    """VoxelNet-style loss: weighted BCE on the score map + smooth-L1
    regression on positives (reference: opencood/loss/voxel_net_loss.py).
    Shares the label contract with :func:`point_pillar_loss`."""
    psm, rm = output["psm"], output["rm"]
    b = psm.shape[0]
    pos = labels["pos_equal_one"].reshape(b, -1)
    neg = labels["neg_equal_one"].reshape(b, -1)
    logits = jnp.transpose(psm, (0, 2, 3, 1)).reshape(b, -1)
    prob = 1.0 / (1.0 + jnp.exp(-logits))
    eps = 1e-6
    pos_loss = -jnp.log(prob + eps) * pos
    neg_loss = -jnp.log(1.0 - prob + eps) * neg
    conf = (
        alpha * pos_loss.sum() / jnp.clip(pos.sum(), 1.0, None)
        + beta * neg_loss.sum() / jnp.clip(neg.sum(), 1.0, None)
    ) / b
    rm_flat = jnp.transpose(rm, (0, 2, 3, 1)).reshape(b, -1, 7)
    targets = labels["targets"].reshape(b, -1, 7)
    reg = weighted_smooth_l1(rm_flat, targets,
                             pos / jnp.clip(pos.sum(), 1.0, None))
    reg_loss = reg.sum() / b
    total = conf + reg_loss
    return total, {"conf_loss": conf, "reg_loss": reg_loss,
                   "total_loss": total}


def pixor_loss(output, labels, alpha=1.0, beta=1.0):
    """Anchor-free PIXOR loss (reference: opencood/loss/pixor_loss.py:
    15-62): mean BCE-with-logits over the dense objectness map plus
    positive-masked smooth-L1 over the 6-channel regression map,
    sum-normalized by the positive-cell count.

    output: {'cls': (B, 1, H, W), 'reg': (B, 6, H, W)} logits;
    labels: {'label_map': (B, 7, H, W)} from
    :func:`hmvit_tpu.postprocess_bev.bev_label_map`.
    """
    label_map = labels["label_map"]
    cls_t, loc_t = label_map[:, :1], label_map[:, 1:]
    cls_p, loc_p = output["cls"], output["reg"]

    # mean BCE with logits, numerically stable form
    z = cls_p
    bce = jnp.maximum(z, 0.0) - z * cls_t + jnp.log1p(jnp.exp(-jnp.abs(z)))
    cls_loss = bce.mean()

    pos = cls_t.sum()
    diff = cls_t * (loc_p - loc_t)
    ad = jnp.abs(diff)
    sl1 = jnp.where(ad < 1.0, 0.5 * ad * ad, ad - 0.5).sum()
    reg_loss = jnp.where(pos > 0, sl1 / jnp.maximum(pos, 1.0), sl1)

    total = alpha * cls_loss + beta * reg_loss
    return total, {"conf_loss": cls_loss, "reg_loss": reg_loss,
                   "total_loss": total}


def point_pillar_loss(output, labels, cls_weight=1.0, reg_weight=2.0):
    """Total detection loss.

    output: {'psm': (B, A, H, W), 'rm': (B, 7A, H, W)} logits;
    labels: {'pos_equal_one': (B, H, W, A), 'targets': (B, H, W, 7A)}.
    Returns (total, {'conf_loss', 'reg_loss'}).
    """
    psm, rm = output["psm"], output["rm"]
    b = psm.shape[0]

    cls_labels = labels["pos_equal_one"].reshape(b, -1)
    positives = cls_labels > 0
    pos_normalizer = jnp.clip(positives.sum(axis=1, keepdims=True), 1.0,
                              None).astype(jnp.float32)
    cls_weights = jnp.ones_like(cls_labels) / pos_normalizer
    reg_weights = positives.astype(jnp.float32) / pos_normalizer

    cls_preds = jnp.transpose(psm, (0, 2, 3, 1)).reshape(b, -1, 1)
    one_hot = cls_labels[..., None]
    conf = sigmoid_focal_loss(cls_preds, one_hot, cls_weights[..., None])
    conf_loss = conf.sum() / b * cls_weight

    rm_flat = jnp.transpose(rm, (0, 2, 3, 1)).reshape(b, -1, 7)
    targets = labels["targets"].reshape(b, -1, 7)
    rm_sin, tgt_sin = add_sin_difference(rm_flat, targets)
    reg = weighted_smooth_l1(rm_sin, tgt_sin, reg_weights)
    reg_loss = reg.sum() / b * reg_weight

    total = conf_loss + reg_loss
    return total, {"conf_loss": conf_loss, "reg_loss": reg_loss,
                   "total_loss": total}


LOSS_REGISTRY = {
    "point_pillar_loss": point_pillar_loss,
    "voxel_net_loss": voxel_net_loss,
    "pixor_loss": pixor_loss,
}


def build_loss(loss_cfg: dict):
    """Loss callable + kwargs from the hypes loss block."""
    name = loss_cfg.get("core_method", "point_pillar_loss").lower()
    fn = LOSS_REGISTRY[name]
    args = loss_cfg.get("args", {})
    if name == "point_pillar_loss":
        kwargs = {"cls_weight": float(args.get("cls_weight", 1.0)),
                  "reg_weight": float(args.get("reg", 2.0))}
    elif name == "pixor_loss":
        kwargs = {"alpha": float(args.get("alpha", 1.0)),
                  "beta": float(args.get("beta", 1.0))}
    else:
        kwargs = {}
    return fn, kwargs
