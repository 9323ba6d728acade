"""Bilinear feature sampling at arbitrary continuous coordinates.

The TPU replacement for the reference's CUDA ``ms_deform_attn`` kernel
(reference: opencood/models/mmdet3d_plugin/bevformer/modules/
multi_scale_deformable_attn_function.py:10-84): deformable attention's
irregular reads become XLA gathers of 4 neighbors + lerp, vectorized over
(batch, query, head, point).
"""
from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(feats, coords):
    """Sample (B, H, W, C) features at continuous pixel coords.

    coords: (B, Q, 2) as (x, y) in pixel units; out-of-bounds -> 0.
    Returns (B, Q, C).
    """
    b, h, w, c = feats.shape
    x, y = coords[..., 0], coords[..., 1]

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = (x - x0).astype(feats.dtype)
    wy = (y - y0).astype(feats.dtype)

    flat = feats.reshape(b, h * w, c)

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        vals = jnp.take_along_axis(
            flat, jnp.broadcast_to(idx[..., None], (*idx.shape, c)), axis=1
        )
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]
