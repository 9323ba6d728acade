"""MXU-friendly PROJECTIVE (homography) warp: separable 2-pass
resampling as matmuls — the dense TPU replacement for per-query
deformable sampling in the BEVFormer camera branch.

For a fixed height plane z=z_k, the mapping from BEV grid pixels to
image pixels is a homography H (3x3).  Sampling every BEV query's
projected reference point (the reference's ms_deform_attn gathers,
mmdet3d_plugin/.../multi_scale_deformable_attn_function.py) is then ONE
dense warp of the camera feature map onto the BEV grid.  Gathers run at
~30 ns/row on TPU (millions of rows per frame at 128^2 queries); this
formulation runs the same resampling as two banded-matrix contractions
on the MXU, like ops/shear_warp.py does for the rigid agent warp:

  pass 1 (rows):  tmp(y', u)  = sum_v S1[u](y', v)  src(v, u)
  pass 2 (cols):  out(y', x') = sum_u S2[y'](x', u) tmp(y', u)

with the per-pass coordinates in closed form:
  u(y', x') = (h00 x' + h01 y' + h02) / w,  w = h20 x' + h21 y' + h22
  x'(y', u) = (u (h21 y' + h22) - h01 y' - h02) / (h00 - u h20)
  v(y', u)  = (h10 x' + h11 y' + h12) / w  evaluated at x'(y', u)

Conditioning: when |h00| < |h10| the roles of the image axes swap
(transpose source + swap H rows), exactly like the affine warp's
predicated pick.  Pixels behind the camera (w <= 0) and off-image taps
come out exactly zero (hat weights + final w-mask).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _hat_matrix(coords, size: int, dtype):
    """coords (..., K) -> (..., K, size) bilinear hat weights over
    absolute cells [0, size); non-finite coords contribute zero."""
    coords = jnp.nan_to_num(coords, nan=-1e9, posinf=1e9, neginf=-1e9)
    cells = jnp.arange(size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - cells))
    return w.astype(dtype)


def _projective_passes(src_in, h, dsize, dtype):
    """One factorization order, split at the pass boundary: returns
    (tmp (N, Y', U, C), s2 (N, Y', X', U)) so callers can either finish
    the contraction directly or fold per-destination-pixel weights into
    s2 first (``warp_projective_reduce``)."""
    rdim, cdim = src_in.shape[1:3]
    s1, s2 = _projective_matrices(h, (rdim, cdim), dsize, dtype)
    # s1: (N, U, Y', V); src_in: (N, V, U, C)
    tmp = jnp.einsum("nuyv,nvuc->nyuc", s1, src_in,
                     preferred_element_type=jnp.float32).astype(dtype)
    return tmp, s2


def _warp_projective_one(src_in, h, dsize, dtype):
    """One factorization order: pass 1 resamples src_in ROWS (v) per
    column u, pass 2 resamples columns (u) per dst row."""
    tmp, s2 = _projective_passes(src_in, h, dsize, dtype)
    out = jnp.einsum("nyxu,nyuc->nyxc", s2, tmp,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def warp_projective_mxu(src, h33, dsize):
    """Warp (N, Hs, Ws, C) by homographies h33 (N, 3, 3) mapping DST
    pixel (x', y') -> SRC pixel (u, v): [u*w, v*w, w] = H @ [x', y', 1].
    Returns (N, Hd, Wd, C), zero outside the source or behind the
    camera (w <= 0).

    A projective 2-pass warp's conditioning varies PER PIXEL (the
    classic bottleneck: pass 2's source parametrization du/dx' can
    collapse locally even when it is fine globally), so both
    factorization orders run and each destination pixel takes the
    better-conditioned one — |du/dx'| vs |dv/dx'|, both = |h.0 - s*h20|
    / |w| with the shared w."""
    n, hs, ws, c = src.shape
    assert hs == ws, "projective MXU warp assumes square feature maps"
    hd, wd = dsize
    dtype = src.dtype
    h = h33.astype(jnp.float32)
    h_sw = jnp.stack([h[:, 1], h[:, 0], h[:, 2]], axis=1)

    out_a = _warp_projective_one(src, h, dsize, dtype)
    out_b = _warp_projective_one(jnp.swapaxes(src, 1, 2), h_sw, dsize,
                                 dtype)

    ys = jnp.arange(hd, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(wd, dtype=jnp.float32)[None, None, :]

    def bc(a):
        return a[:, None, None]

    w = bc(h[:, 2, 0]) * xs + bc(h[:, 2, 1]) * ys + bc(h[:, 2, 2])
    safe_w = jnp.where(jnp.abs(w) < 1e-6, 1e-6, w)
    u = (bc(h[:, 0, 0]) * xs + bc(h[:, 0, 1]) * ys
         + bc(h[:, 0, 2])) / safe_w
    v = (bc(h[:, 1, 0]) * xs + bc(h[:, 1, 1]) * ys
         + bc(h[:, 1, 2])) / safe_w
    q_a = jnp.abs(bc(h[:, 0, 0]) - u * bc(h[:, 2, 0]))
    q_b = jnp.abs(bc(h[:, 1, 0]) - v * bc(h[:, 2, 0]))
    pick_a = (q_a >= q_b)[..., None]
    return jnp.where(pick_a, out_a, out_b)


def _order_pick(h, dsize):
    """Per-destination-pixel factorization-order choice (see
    ``warp_projective_mxu``): True where order A (row-major) is at least
    as well conditioned.  h: (N, 3, 3) -> (N, Hd, Wd) bool."""
    hd, wd = dsize
    ys = jnp.arange(hd, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(wd, dtype=jnp.float32)[None, None, :]

    def bc(a):
        return a[:, None, None]

    w = bc(h[:, 2, 0]) * xs + bc(h[:, 2, 1]) * ys + bc(h[:, 2, 2])
    safe_w = jnp.where(jnp.abs(w) < 1e-6, 1e-6, w)
    u = (bc(h[:, 0, 0]) * xs + bc(h[:, 0, 1]) * ys
         + bc(h[:, 0, 2])) / safe_w
    v = (bc(h[:, 1, 0]) * xs + bc(h[:, 1, 1]) * ys
         + bc(h[:, 1, 2])) / safe_w
    q_a = jnp.abs(bc(h[:, 0, 0]) - u * bc(h[:, 2, 0]))
    q_b = jnp.abs(bc(h[:, 1, 0]) - v * bc(h[:, 2, 0]))
    return q_a >= q_b


def projective_reduce_prepare(src, h33, dsize):
    """Weight-INDEPENDENT half of :func:`warp_projective_reduce`:
    pass-1 contractions + pass-2 banded matrices + the conditioning
    order pick.  Callers that apply several different per-pixel weight
    sets to the same (src, homographies) — e.g. the BEVFormer planar
    lift's per-layer hypothesis weights — compute this ONCE and call
    :func:`projective_reduce_apply` per weight set (the warp is linear
    in src, so per-layer value projections commute to after the
    reduce)."""
    n, ks, hs, ws, c = src.shape
    k = h33.shape[1]
    rep = k // ks
    hd, wd = dsize
    assert hs == ws and k % ks == 0
    dtype = src.dtype

    hf = h33.reshape(n * k, 3, 3).astype(jnp.float32)
    h_sw = jnp.stack([hf[:, 1], hf[:, 0], hf[:, 2]], axis=1)
    srcf = src.reshape(n * ks, hs, ws, c)

    tmp_a, s2_a = _projective_passes_rep(srcf, hf, dsize, dtype, rep)
    tmp_b, s2_b = _projective_passes_rep(
        jnp.swapaxes(srcf, 1, 2), h_sw, dsize, dtype, rep)
    pick_a = _order_pick(hf, dsize).reshape(n, k, hd, wd)

    u_cnt = s2_a.shape[-1]
    return {
        "tmp_a": tmp_a.reshape(n, k, hd, u_cnt, c),
        "tmp_b": tmp_b.reshape(n, k, hd, u_cnt, c),
        "s2_a": s2_a.reshape(n, k, hd, wd, u_cnt),
        "s2_b": s2_b.reshape(n, k, hd, wd, u_cnt),
        "pick_a": pick_a,
        "dtype": dtype,
    }


def projective_reduce_apply(state, weights):
    """Finish the reduction for one per-destination-pixel weight set:
    fold (weights x order pick) into pass 2 and contract."""
    dtype = state["dtype"]
    wgt = weights.astype(jnp.float32)
    w_a = (wgt * state["pick_a"]).astype(dtype)[..., None]
    w_b = (wgt * (1.0 - state["pick_a"])).astype(dtype)[..., None]
    s2_a = state["s2_a"] * w_a
    s2_b = state["s2_b"] * w_b
    out = (jnp.einsum("nkyxu,nkyuc->nyxc", s2_a, state["tmp_a"],
                      preferred_element_type=jnp.float32)
           + jnp.einsum("nkyxu,nkyuc->nyxc", s2_b, state["tmp_b"],
                        preferred_element_type=jnp.float32))
    return out.astype(dtype)


def warp_projective_reduce(src, h33, dsize, weights):
    """Fused weighted reduction over warp hypotheses:

        out[n] = sum_k weights[n, k] * warp_projective_mxu(src_k, H_nk)

    src: (N, Ks, Hs, Ws, C) source maps; h33: (N, K, 3, 3) with
    K % Ks == 0 — each source map serves K // Ks consecutive hypotheses
    (e.g. one camera feature map warped at several height planes);
    weights: (N, K, Hd, Wd) per-destination-pixel hypothesis weights.
    Returns (N, Hd, Wd, C).

    Numerically equal to materializing every per-hypothesis warp and
    weighted-summing (the oracle path in PlanarLiftCrossAttention /
    tests), but the (N, K, Hd, Wd, C) destination tensors never exist:
    the weights — and the per-pixel conditioning order pick — are folded
    into pass 2's banded matrix, and (hypothesis, source-column) contract
    jointly in one batched MXU matmul per order."""
    return projective_reduce_apply(
        projective_reduce_prepare(src, h33, dsize), weights)


def _projective_passes_rep(src_in, h, dsize, dtype, rep):
    """_projective_passes with h covering ``rep`` hypotheses per source
    map (src_in: (N, V, U, C), h: (N*rep, 3, 3)); the source broadcast
    happens inside the pass-1 einsum, never materialized."""
    if rep == 1:
        return _projective_passes(src_in, h, dsize, dtype)
    n = src_in.shape[0]
    # build s1/s2 for all N*rep homographies against a dummy src shape
    rdim, cdim = src_in.shape[1:3]
    hd, wd = dsize
    s1, s2 = _projective_matrices(h, (rdim, cdim), dsize, dtype)
    tmp = jnp.einsum("nruyv,nvuc->nryuc",
                     s1.reshape(n, rep, *s1.shape[1:]), src_in,
                     preferred_element_type=jnp.float32).astype(dtype)
    return tmp.reshape(n * rep, hd, cdim, -1), s2


def _projective_matrices(h, ssize, dsize, dtype):
    """The two banded interpolation matrices of ``_projective_passes``
    without the contraction: s1 (N, U, Y', V), s2 (N, Y', X', U)."""
    rdim, cdim = ssize
    hd, wd = dsize
    h00, h01, h02 = h[:, 0, 0], h[:, 0, 1], h[:, 0, 2]
    h10, h11, h12 = h[:, 1, 0], h[:, 1, 1], h[:, 1, 2]
    h20, h21, h22 = h[:, 2, 0], h[:, 2, 1], h[:, 2, 2]
    ys = jnp.arange(hd, dtype=jnp.float32)
    xs = jnp.arange(wd, dtype=jnp.float32)
    us = jnp.arange(cdim, dtype=jnp.float32)

    def bc(a):
        return a[:, None, None]

    denom_x = bc(h00) - us[None, None, :] * bc(h20)
    safe_dx = jnp.where(jnp.abs(denom_x) < 1e-6,
                        jnp.where(denom_x < 0, -1e-6, 1e-6), denom_x)
    num_x = (us[None, None, :] * (bc(h21) * ys[None, :, None] + bc(h22))
             - bc(h01) * ys[None, :, None] - bc(h02))
    xprime = num_x / safe_dx
    wproj = (bc(h20) * xprime + bc(h21) * ys[None, :, None] + bc(h22))
    safe_w = jnp.where(jnp.abs(wproj) < 1e-6, 1e-6, wproj)
    vcoord = (bc(h10) * xprime + bc(h11) * ys[None, :, None]
              + bc(h12)) / safe_w
    vcoord = jnp.where(wproj > 1e-6, vcoord, -1e9)
    s1 = _hat_matrix(jnp.swapaxes(vcoord, 1, 2), rdim, dtype)

    w2 = (bc(h20) * xs[None, None, :] + bc(h21) * ys[None, :, None]
          + bc(h22))
    safe_w2 = jnp.where(jnp.abs(w2) < 1e-6, 1e-6, w2)
    ucoord = (bc(h00) * xs[None, None, :] + bc(h01) * ys[None, :, None]
              + bc(h02)) / safe_w2
    ucoord = jnp.where(w2 > 1e-6, ucoord, -1e9)
    s2 = _hat_matrix(ucoord, cdim, dtype)
    return s1, s2


def warp_projective_gather(src, h33, dsize):
    """Gather-based oracle (exact bilinear at point samples)."""
    n, hs, ws, c = src.shape
    hd, wd = dsize
    h = h33.astype(jnp.float32)
    ys, xs = jnp.meshgrid(jnp.arange(hd, dtype=jnp.float32),
                          jnp.arange(wd, dtype=jnp.float32),
                          indexing="ij")
    ones = jnp.ones_like(xs)
    pix = jnp.stack([xs, ys, ones], -1).reshape(-1, 3)  # (Q, 3)
    uvw = jnp.einsum("nij,qj->nqi", h, pix, precision=_HI)
    w = uvw[..., 2]
    valid = w > 1e-6
    uv = uvw[..., :2] / jnp.where(jnp.abs(w[..., None]) < 1e-6, 1e-6,
                                  w[..., None])
    u, v = uv[..., 0], uv[..., 1]

    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = (u - u0).astype(src.dtype)
    fv = (v - v0).astype(src.dtype)
    flat = src.reshape(n, hs * ws, c)

    def tap(vv, uu):
        ok = (uu >= 0) & (uu < ws) & (vv >= 0) & (vv < hs) & valid
        idx = jnp.clip(vv, 0, hs - 1) * ws + jnp.clip(uu, 0, ws - 1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.where(ok[..., None], vals, 0)

    out = (tap(v0, u0) * ((1 - fu) * (1 - fv))[..., None]
           + tap(v0, u0 + 1) * (fu * (1 - fv))[..., None]
           + tap(v0 + 1, u0) * ((1 - fu) * fv)[..., None]
           + tap(v0 + 1, u0 + 1) * (fu * fv)[..., None])
    return out.reshape(n, hd, wd, c)
