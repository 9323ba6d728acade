"""MXU-friendly affine warp: separable 2-pass resampling as matmuls.

The direct bilinear warp is a 4-tap gather per output pixel — gathers run
far below HBM speed on TPU and dominated the fusion stage's cost.  This
module factors the (rigid) dst->src pixel affine into a per-column
y-resample followed by a per-row x-resample (Catmull–Smith 2-pass), each
expressed as a banded interpolation matrix contracted on the MXU:

    tmp[n, y', x, c] = sum_y  Sy[n, x, y', y]  * src[n, y, x, c]
    out[n, y', x', c] = sum_x Sx[n, y', x', x] * tmp[n, y', x, c]

A predicated transpose keeps the x-row x-dominant (|M00| >= |M01|), so the
factorization stays well-conditioned for any rotation.  Zero padding falls
out of the interpolation matrices (out-of-range taps get zero rows).

Exactness: pure translations/flips are exact; rotations differ from the
direct 4-tap bilinear only by the sub-pixel difference between sampling
the bilinear surface along slanted lines vs at points (smaller than the
interpolation error itself).  The direct gather path
(ops.warp.warp_affine_nhwc) remains the oracle for geometry tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _pixel_affine(m, src_hw, dst_hw):
    """Pixel-space dst->src affine (N, 2, 3) for the warp chain used by
    ops.warp (centered pivot + align_corners normalization)."""
    from .warp import (
        _affine_to_homography,
        _inv_affine3,
        _mat3,
        _normal_transform_pixel,
    )

    h, w = src_hw
    oh, ow = dst_hw
    m33 = _affine_to_homography(m.astype(jnp.float32))
    src_norm = _normal_transform_pixel(h, w, jnp.float32)
    dst_norm = _normal_transform_pixel(oh, ow, jnp.float32)
    chain = _mat3(dst_norm[None], _mat3(m33, _inv_affine3(src_norm)[None]))
    theta = _inv_affine3(chain)  # normalized dst -> src
    # pixel = denorm(src) o theta o norm(dst)
    px = _mat3(_inv_affine3(src_norm)[None], _mat3(theta, dst_norm[None]))
    return px[:, :2, :]


def _interp_matrix(coords, size: int, dtype):
    """coords (..., K) of target positions -> (..., K, size) linear
    interpolation weights with zero padding outside [0, size)."""
    x0 = jnp.floor(coords)
    frac = (coords - x0).astype(dtype)
    x0i = x0.astype(jnp.int32)
    w0 = jax.nn.one_hot(x0i, size, dtype=dtype) * (1.0 - frac)[..., None]
    w1 = jax.nn.one_hot(x0i + 1, size, dtype=dtype) * frac[..., None]
    return w0 + w1  # out-of-range indices one_hot to zeros


def warp_affine_mxu(src, m, dsize):
    """Bilinear affine warp of (N, H, W, C) via two MXU contractions.

    m: (N, 2, 3) pixel-space affines (same convention as
    :func:`hmvit_tpu.ops.warp.warp_affine_nhwc`); dsize: (H', W').
    Requires H == W == H' == W' (BEV maps are square).
    """
    n, h, w, c = src.shape
    oh, ow = dsize
    assert h == w == oh == ow, "MXU warp assumes square equal-size maps"
    dtype = src.dtype

    a = _pixel_affine(m, (h, w), dsize)  # (N, 2, 3)
    # rows: [x_src] = a[0] . (x', y', 1); [y_src] = a[1] . (x', y', 1)
    m00, m01, tx = a[:, 0, 0], a[:, 0, 1], a[:, 0, 2]
    m10, m11, ty = a[:, 1, 0], a[:, 1, 1], a[:, 1, 2]

    # Keep pass 2 well-conditioned (|m00| large): when the map is
    # y-dominant, transpose the SOURCE, which swaps the affine's rows
    # (src[y_src, x_src] == src_T[x_src, y_src]).
    swap = jnp.abs(m00) < jnp.abs(m10)
    src_t = jnp.swapaxes(src, 1, 2)
    src_in = jnp.where(swap[:, None, None, None], src_t, src)

    def pick(p, q):
        return jnp.where(swap, p, q)

    m00, m01, tx, m10, m11, ty = (
        pick(m10, m00), pick(m11, m01), pick(ty, tx),
        pick(m00, m10), pick(m01, m11), pick(tx, ty),
    )

    det = m00 * m11 - m01 * m10
    safe_m00 = jnp.where(jnp.abs(m00) < 1e-6, 1e-6, m00)
    v0 = m10 / safe_m00
    v1 = det / safe_m00
    ty_adj = ty - v0 * tx

    xs = jnp.arange(ow, dtype=jnp.float32)
    ys = jnp.arange(oh, dtype=jnp.float32)
    xu = jnp.arange(w, dtype=jnp.float32)

    # pass 1 (y-resample): y(x_u, y') = v1*y' + v0*x_u + ty_adj
    y_coords = (
        v1[:, None, None] * ys[None, :, None]
        + v0[:, None, None] * xu[None, None, :]
        + ty_adj[:, None, None]
    )  # (N, H', W)
    sy = _interp_matrix(jnp.moveaxis(y_coords, 2, 1), h, dtype)
    # sy: (N, W, H', H); src_in: (N, H, W, C)
    tmp = jnp.einsum("nxYy,nyxc->nYxc", sy, src_in,
                     preferred_element_type=jnp.float32)

    # pass 2 (x-resample): x_u(y', x') = m00*x' + m01*y' + tx
    x_coords = (
        m00[:, None, None] * xs[None, None, :]
        + m01[:, None, None] * ys[None, :, None]
        + tx[:, None, None]
    )  # (N, H', W')
    sx = _interp_matrix(x_coords, w, dtype)  # (N, H', W', W)
    out = jnp.einsum("nYXx,nYxc->nYXc", sx, tmp.astype(dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def warp_bev_mxu(features, transform, discrete_ratio: float,
                 downsample_rate: float):
    """Drop-in MXU variant of ops.warp.warp_bev_nhwc (bilinear only)."""
    from .warp import centered_affine, discretize_transform

    *batch, h, w, c = features.shape
    m = discretize_transform(transform, discrete_ratio, downsample_rate)
    t = centered_affine(m.reshape(-1, 2, 3).astype(jnp.float32), (h, w))
    flat = features.reshape(-1, h, w, c)
    out = warp_affine_mxu(flat, t, (h, w))
    return out.reshape(*batch, h, w, c)
