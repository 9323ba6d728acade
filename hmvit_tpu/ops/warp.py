"""BEV affine warp between agent frames — the core spatial transform.

Replaces the reference's cuDNN ``F.affine_grid``/``F.grid_sample`` chain
(reference: opencood/models/sub_modules/torch_transformation_utils.py:
108-355) with a jit-able XLA gather.  The coordinate conventions
(align_corners=True, zero padding, center-pivot rotation, translation
normalized by voxel_size * downsample_rate) are matched exactly so warped
features agree with the reference to fp32 tolerance.

All 3x3 matrix algebra is done at HIGHEST precision (tiny matrices; MXU
default precision would quantize the transforms).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def discretize_transform(matrix, discrete_ratio: float, downsample_rate: float):
    """(..., 4, 4) frame transform -> (..., 2, 3) BEV-pixel affine.

    Keeps the xy rotation block and scales the xy translation into feature
    pixels.
    """
    matrix = jnp.asarray(matrix)
    m = matrix[..., :2, :][..., :, (0, 1, 3)]
    scale = discrete_ratio * downsample_rate
    return m.at[..., -1].divide(scale)


def _mat3(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _affine_to_homography(m):
    """(..., 2, 3) -> (..., 3, 3) with last row [0, 0, 1]."""
    batch = m.shape[:-2]
    last = jnp.zeros((*batch, 1, 3), m.dtype).at[..., 0, 2].set(1.0)
    return jnp.concatenate([m, last], axis=-2)


def _normal_transform_pixel(h: int, w: int, dtype):
    """Pixel -> [-1, 1] normalization matrix (align_corners=True)."""
    wd = 1.0 if w == 1 else w - 1.0
    hd = 1.0 if h == 1 else h - 1.0
    return jnp.array(
        [[2.0 / wd, 0.0, -1.0], [0.0, 2.0 / hd, -1.0], [0.0, 0.0, 1.0]],
        dtype=dtype,
    )


def _inv_affine3(m):
    """Closed-form inverse of (..., 3, 3) affine homographies."""
    a, b, tx = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    c, d, ty = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    zeros, ones = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([ia, ib, itx], -1),
            jnp.stack([ic, id_, ity], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )


def centered_affine(m, dsize):
    """Rotate around the image center, then translate.

    m: (N, 2, 3) pixel-space affine whose rotation should pivot on the BEV
    center.  Returns (N, 2, 3) for direct use with :func:`warp_affine`.
    """
    h, w = dsize
    n = m.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=m.dtype), (n, 3, 3))
    center = jnp.array([w / 2.0, h / 2.0], m.dtype)
    shift = eye.at[:, :2, 2].set(center)
    shift_inv = eye.at[:, :2, 2].set(-center)
    rot = eye.at[:, :2, :2].set(m[:, :2, :2])
    out = _mat3(shift, _mat3(rot, shift_inv))[:, :2, :]
    return out.at[:, :, 2].add(m[:, :, 2])


def warp_affine(src, m, dsize, mode: str = "bilinear"):
    """Warp (N, C, H, W) features by pixel-space affines m (N, 2, 3).

    Equivalent to affine_grid(align_corners=True) + grid_sample with zero
    padding: ``m`` maps source pixels to destination pixels; sampling uses
    its inverse.  Internally channel-last (row-contiguous gathers).
    """
    out = warp_affine_nhwc(jnp.moveaxis(src, 1, -1), m, dsize, mode)
    return jnp.moveaxis(out, -1, 1)


def warp_affine_nhwc(src, m, dsize, mode: str = "bilinear"):
    """Channel-last variant of :func:`warp_affine` (src: (N, H, W, C)).

    Gathers whole contiguous C-rows per output pixel (one gather of
    slice size C instead of per-element gathers) — the layout the TPU
    memory system wants."""
    n, h, w, c = src.shape
    out_h, out_w = dsize
    dtype = src.dtype
    px, py = _source_coords(m, (h, w), dsize)

    flat = src.reshape(n, h * w, c)

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        vals = jnp.take_along_axis(
            flat, idx.reshape(n, -1, 1), axis=1
        ).reshape(n, out_h, out_w, c)
        return jnp.where(valid[..., None], vals, jnp.zeros((), dtype))

    if mode == "nearest":
        return gather(jnp.round(py).astype(jnp.int32),
                      jnp.round(px).astype(jnp.int32))

    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    wx = (px - x0.astype(px.dtype)).astype(dtype)[..., None]
    wy = (py - y0.astype(py.dtype)).astype(dtype)[..., None]
    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _source_coords(m, src_hw, dsize):
    """Normalized-chain source pixel coordinates for each output pixel.

    Shared between the NCHW and NHWC warps; matches
    affine_grid(align_corners=True) + grid_sample conventions.
    """
    h, w = src_hw
    out_h, out_w = dsize
    m33 = _affine_to_homography(m.astype(jnp.float32))
    src_norm = _normal_transform_pixel(h, w, jnp.float32)
    dst_norm = _normal_transform_pixel(out_h, out_w, jnp.float32)
    chain = _mat3(dst_norm[None], _mat3(m33, _inv_affine3(src_norm)[None]))
    theta = _inv_affine3(chain)[:, :2, :]

    xs = jnp.linspace(-1.0, 1.0, out_w, dtype=jnp.float32)
    ys = jnp.linspace(-1.0, 1.0, out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
    coords = jnp.einsum("nij,hwj->nhwi", theta, grid, precision=_HI)
    px = (coords[..., 0] + 1.0) * (w - 1) / 2.0
    py = (coords[..., 1] + 1.0) * (h - 1) / 2.0
    return px, py


def warp_bev_nhwc(features, transform, discrete_ratio: float,
                  downsample_rate: float, mode: str = "bilinear"):
    """Warp (..., H, W, C) BEV maps by (..., 4, 4) per-map transforms."""
    *batch, h, w, c = features.shape
    m = discretize_transform(transform, discrete_ratio, downsample_rate)
    t = centered_affine(m.reshape(-1, 2, 3).astype(jnp.float32), (h, w))
    flat = features.reshape(-1, h, w, c)
    out = warp_affine_nhwc(flat, t, (h, w), mode)
    return out.reshape(*batch, h, w, c)


def warp_bev(features, transform, discrete_ratio: float,
             downsample_rate: float, mode: str = "bilinear"):
    """Warp (B, L, C, H, W) BEV maps by per-agent (B, L, 4, 4) transforms.

    The TPU analogue of the reference's SpatialTransformation (reference:
    opencood/models/sub_modules/spatial_transformation.py:10-44).
    """
    b, l, c, h, w = features.shape
    m = discretize_transform(transform, discrete_ratio, downsample_rate)
    t = centered_affine(m.reshape(-1, 2, 3), (h, w))
    out = warp_affine(features.reshape(-1, c, h, w), t, (h, w), mode)
    return out.reshape(b, l, c, h, w)


def roi_mask(shape, transform, discrete_ratio: float, downsample_rate: float):
    """Valid-region mask after warping. shape: (B, L, H, W) ->
    (B, L, 1, H, W) in {0, 1}.

    Closed form: a nearest-warped all-ones map is 1 exactly where the
    source coordinate rounds inside the map, so the mask is four
    half-plane tests on the per-pixel source coordinates — no ones
    tensor, no gather (the gather formulation cost ~2.7 ms/frame at
    production scale; this fuses into neighboring elementwise work)."""
    b, l, h, w = shape
    m = discretize_transform(transform, discrete_ratio, downsample_rate)
    t = centered_affine(m.reshape(-1, 2, 3), (h, w))
    px, py = _source_coords(t, (h, w), (h, w))
    xx = jnp.round(px).astype(jnp.int32)
    yy = jnp.round(py).astype(jnp.int32)
    valid = ((xx >= 0) & (xx < w) & (yy >= 0) & (yy < h))
    return valid.astype(jnp.float32).reshape(b, l, 1, h, w)


def roi_and_agent_mask(b, l, h, w, agent_mask, transform,
                       discrete_ratio: float, downsample_rate: float):
    """Combined warped-ROI and agent-validity mask -> (B, H, W, 1, L).

    agent_mask: (B, L) 1 for real agents; transform: (B, L, 4, 4) to the
    receiver's frame (reference: torch_transformation_utils.py:11-49).
    """
    roi = roi_mask((b, l, h, w), transform, discrete_ratio, downsample_rate)
    com = roi * agent_mask[:, :, None, None, None]
    return jnp.transpose(com, (0, 3, 4, 2, 1))
