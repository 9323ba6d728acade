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


def ms_deform_attn(value, spatial_shapes, sampling_locations,
                   attention_weights):
    """Multi-scale deformable attention, mmcv calling contract.

    The jnp equivalent of the CUDA ``ms_deform_attn_forward`` kernel /
    its pure-torch ``multi_scale_deformable_attn_pytorch`` fallback
    (referenced at opencood/models/mmdet3d_plugin/bevformer/modules/
    multi_scale_deformable_attn_function.py:74-84); pinned bit-close to
    the transcribed torch fallback in tests/test_deformable_oracle.py.

    Args:
      value: (B, K, H, D) with K = sum(h*w) over levels; each head
        reads only its own D-channel slice.
      spatial_shapes: sequence of (h, w) per level (static).
      sampling_locations: (B, Q, H, L, P, 2) as (x, y) in [0, 1],
        ``grid_sample(align_corners=False)`` convention — 0 and 1 are
        the image EDGES, so pixel centers sit at (i + 0.5) / size.
      attention_weights: (B, Q, H, L, P), already normalized over the
        (L, P) axes by the caller.

    Returns (B, Q, H*D).
    """
    b, _, h, d = value.shape
    q, _, num_l, p = sampling_locations.shape[1:5]
    outs = []
    start = 0
    for lvl in range(num_l):
        hh, ww = (int(s) for s in spatial_shapes[lvl])
        v = value[:, start:start + hh * ww]
        start += hh * ww
        v = jnp.moveaxis(v.reshape(b, hh, ww, h, d), 3, 1)
        v = v.reshape(b * h, hh, ww, d)
        loc = sampling_locations[:, :, :, lvl]  # (B, Q, H, P, 2)
        pix = loc * jnp.asarray([ww, hh], loc.dtype) - 0.5
        pix = jnp.moveaxis(pix, 2, 1).reshape(b * h, q * p, 2)
        outs.append(bilinear_sample(v, pix).reshape(b, h, q, p, d))
    stacked = jnp.stack(outs, 3)  # (B, H, Q, L, P, D)
    w = jnp.moveaxis(attention_weights, 2, 1)  # (B, H, Q, L, P)
    out = jnp.einsum("bhqlp,bhqlpd->bhqd", w, stacked)
    return jnp.moveaxis(out, 1, 2).reshape(b, q, h * d)
