"""Fused per-pair BEV warp — Pallas TPU kernel.

The H3GAT phase warps every sender j's (typed) K/V map into every
receiver i's frame.  Done in XLA this materializes the (B, I, J, H, W,
2C) pair tensor twice over (type-gather output + warp output) and runs
the separable-matmul warp through HBM.  This kernel fuses, per (i, j,
32x32 destination tile):

  1. the receiver-TYPE gather (the relation-fold produces one typed K/V
     variant per receiver type; the DMA indexes the right one),
  2. a 56x56 source-tile fetch — a RIGID BEV transform maps a 32x32
     tile into a <=46-cell-wide support, so the whole warp input for
     the tile lives in VMEM,
  3. the two-pass separable bilinear resample (ops/shear_warp.py math:
     banded interpolation matrices contracted on the MXU, built on the
     VPU from the affine coefficients), with the same predicated
     row-swap for conditioning under near-90-degree rotations.

Zero padding falls out of the hat-function weights: the source tile is
clamped inside the map, so out-of-map taps are never present in the
tile and contribute exactly zero — matching grid_sample zero padding.

XLA fallback / oracle: jnp.take_along_axis + ops.shear_warp.warp_bev_mxu
(tests compare both; the backward pass recomputes through it).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shear_warp import _pixel_affine
from .warp import centered_affine, discretize_transform

# destination tile edge / source tile edge (>= (TILE-1)*sqrt(2) + interp
# taps + 8-alignment slack).  One tiling for all map sizes — see
# _tiling's measurements for why the 64/104 + channel-chunk variant lost.
TILE = 32
TS = 56
# resident-map variant support edge: (TILE-1)*sqrt(2) + 2 interp taps +
# 16-alignment slack (bf16 VMEM sublane tiles are 16 rows; a 16-aligned
# dynamic slice is a layout no-op, an 8-aligned one is a repack shuffle)
TS_RES = 64
# resident variant gate: two double-buffered full-map slots must fit
# VMEM comfortably (v5e has 128 MB; leave room for out blocks + temps)
RES_VMEM_CAP = 70 * 1024 * 1024


def _tiling(h: int, ck: int):
    """(tile, ts, ckc) for a map of edge h with ck channels.

    Measured on v5e at production shapes (16 pairs, 128^2, 512 ch,
    bf16): 32/56 whole-channel 5.4 ms; 64/104 with 128-ch chunks 9.1 ms;
    a full-map per-pair variant 10.5 ms.  Round-3 retest at bigger
    chunks (standalone, same shapes): 32/56/512 3.07 ms, 64/104/256
    4.21 ms, 64/104/512 7.03 ms — the larger tile loses at EVERY chunk
    width despite 2x the per-issue MXU occupancy.  The cost is dominated
    by the NUMBER of batched-matmul issues (one per source column / dest
    row) and the larger scratch DMAs — so the small tile with the full
    channel width (large matmul N) wins and is used everywhere."""
    return TILE, TS, ck


def _prep_affines(pairwise, mode, hw, discrete_ratio, downsample_rate,
                  tile=TILE, ts=TS, align=8):
    """Host/XLA-side geometry: per (b, i, j) post-swap affine coefficients
    and per-tile PHYSICAL source-tile origins.

    Returns (coef (N, J, 8) f32, origins (N, J, XT, YT, 3) i32, rtype
    (N,) i32) with N = B*I. coef rows: [m00, m01, tx, v0, v1, ty_adj,
    swap, 0] — the warp_affine_mxu quantities after the conditioning
    row swap.  origins are (oH, oW, valid) in map axes regardless of
    swap; valid=0 marks tiles whose source support misses the map (the
    kernel skips their fetch + matmuls and writes exact zeros)."""
    h, w = hw
    b, l = pairwise.shape[:2]
    t_ij = jnp.swapaxes(pairwise, 1, 2).reshape(b * l * l, 4, 4)
    m23 = discretize_transform(t_ij, discrete_ratio, downsample_rate)
    t = centered_affine(m23.astype(jnp.float32), (h, w))
    a = _pixel_affine(t, (h, w), (h, w))  # (N*J, 2, 3) dst->src pixels
    m00, m01, tx = a[:, 0, 0], a[:, 0, 1], a[:, 0, 2]
    m10, m11, ty = a[:, 1, 0], a[:, 1, 1], a[:, 1, 2]

    swap = jnp.abs(m00) < jnp.abs(m10)

    def pick(p, q):
        return jnp.where(swap, p, q)

    # post-pick: "col" = src_in col coordinate, "row" = src_in row, where
    # src_in is the transposed map when swapped (warp_affine_mxu:83-93)
    m00, m01, tx, m10, m11, ty = (
        pick(m10, m00), pick(m11, m01), pick(ty, tx),
        pick(m00, m10), pick(m01, m11), pick(tx, ty),
    )
    det = m00 * m11 - m01 * m10
    safe = jnp.where(jnp.abs(m00) < 1e-6, 1e-6, m00)
    v0 = m10 / safe
    v1 = det / safe
    ty_adj = ty - v0 * tx

    # identity transforms (every i==j pair, plus co-located agents) take
    # a copy fast path in the kernel — no interpolation matmuls
    ident = ((jnp.abs(m00 - 1.0) + jnp.abs(m01) + jnp.abs(tx)
              + jnp.abs(v0) + jnp.abs(v1 - 1.0) + jnp.abs(ty_adj)
              < 1e-4) & jnp.logical_not(swap))
    coef = jnp.stack(
        [m00, m01, tx, v0, v1, ty_adj,
         swap.astype(jnp.float32), ident.astype(jnp.float32)], axis=-1)
    bad = jnp.logical_not(jnp.all(jnp.isfinite(coef), axis=-1))  # (N*J,)
    coef = jnp.where(jnp.isfinite(coef), coef, 0.0)  # invalid pads
    coef = coef.reshape(b * l, l, 8)

    # per-tile src_in-space mins from the dst tile corner extremes
    xt, yt = w // tile, h // tile
    x0 = (jnp.arange(xt, dtype=jnp.float32) * tile)[None, :, None]
    y0 = (jnp.arange(yt, dtype=jnp.float32) * tile)[None, None, :]

    def lin_min(c_x, c_y, c_0):
        cx = c_x[:, None, None]
        cy = c_y[:, None, None]
        return (c_0[:, None, None]
                + jnp.minimum(cx * x0, cx * (x0 + tile - 1))
                + jnp.minimum(cy * y0, cy * (y0 + tile - 1)))

    def lin_max(c_x, c_y, c_0):
        cx = c_x[:, None, None]
        cy = c_y[:, None, None]
        return (c_0[:, None, None]
                + jnp.maximum(cx * x0, cx * (x0 + tile - 1))
                + jnp.maximum(cy * y0, cy * (y0 + tile - 1)))

    mf = coef.reshape(-1, 8)
    min_col = lin_min(mf[:, 0], mf[:, 1], mf[:, 2])
    max_col = lin_max(mf[:, 0], mf[:, 1], mf[:, 2])
    # post-pick row coefficients: row = m10 x' + m11 y' + ty with
    # m10 = v0*m00, m11 = v0*m01 + v1, ty = ty_adj + v0*tx
    m10p = mf[:, 3] * mf[:, 0]
    m11p = mf[:, 3] * mf[:, 1] + mf[:, 4]
    typ_ = mf[:, 5] + mf[:, 3] * mf[:, 2]
    min_row = lin_min(m10p, m11p, typ_)
    max_row = lin_max(m10p, m11p, typ_)

    # ROI tile skip: a destination tile whose source support (the affine
    # image of its corner extremes, +-1 bilinear tap) misses the source
    # map entirely produces EXACT zeros through the hat weights — the
    # kernel skips its DMA fetch and both matmuls and writes zeros.
    # Rigid transforms are affine, so corner extremes bound the support
    # exactly.  Non-finite coefficients (padded/invalid pairs) are
    # marked invalid too (their output is masked downstream either way).
    valid = (jnp.logical_not(bad)[:, None, None]
             & (max_row >= -1.0) & (min_row <= h)
             & (max_col >= -1.0) & (min_col <= w))
    min_col = jnp.where(jnp.isfinite(min_col), min_col, 0.0)
    min_row = jnp.where(jnp.isfinite(min_row), min_row, 0.0)

    # origins align-aligned (TPU sublane tiling constrains dynamic DMA /
    # VMEM-slice offsets); ts absorbs support + interp taps + alignment
    # slack (<= align-1)
    orow_in = jnp.clip(
        ((jnp.floor(min_row).astype(jnp.int32) - 2) // align) * align,
        0, h - ts)
    ocol_in = jnp.clip(
        ((jnp.floor(min_col).astype(jnp.int32) - 2) // align) * align,
        0, w - ts)
    # physical map origins: when swapped, src_in rows are the map's W
    # axis, so (oH, oW) = (ocol_in, orow_in)
    sw = swap.reshape(-1)[:, None, None]
    o_h = jnp.where(sw, ocol_in, orow_in)
    o_w = jnp.where(sw, orow_in, ocol_in)
    origins = jnp.stack([o_h, o_w, valid.astype(jnp.int32)],
                        axis=-1).reshape(b * l, l, xt, yt, 3)

    rtype = jnp.broadcast_to(mode.astype(jnp.int32)[:, :, None],
                             (b, l, 1)).reshape(b * l)
    return coef, origins, rtype


def _two_pass_tile(tile_cr, orow_in, ocol_in, *, m00, m01, tx, v0, v1,
                   tya, xs_row, ys_row, ys_col, cells, cells_row, dtype,
                   precision):
    """tile_cr: (C=TS, R=TS, Ck) — src_in tile with its COLUMN axis
    leading (Mosaic batched matmuls want batch at dim 0 on both
    operands).  Returns dst (y', x', Ck)."""
    # pass 1 along src_in rows: row(c, y') = v1 y' + v0 c + tya
    ccol = ocol_in.astype(jnp.float32) + cells  # (C, 1)
    rcoord = v1 * ys_row + v0 * ccol + tya      # (C, T)
    # hat weights over absolute rows [orow_in, orow_in + TS)
    rcell = orow_in.astype(jnp.float32) + cells_row  # (1, TS)
    s1 = jnp.maximum(
        0.0, 1.0 - jnp.abs(rcoord[:, :, None] - rcell[None])
    ).astype(dtype)  # (C, T, R)
    tmp = jax.lax.dot_general(
        s1, tile_cr, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision).astype(dtype)
    # tmp: (C, y', ch) -> (y', C, ch) for the batched pass 2
    tmp_t = jnp.swapaxes(tmp, 0, 1)

    # pass 2 along src_in cols: col(y', x') = m00 x' + m01 y' + tx
    ccoord = m00 * xs_row + m01 * ys_col + tx
    ccell = ocol_in.astype(jnp.float32) + cells_row  # (1, TS)
    s2 = jnp.maximum(
        0.0, 1.0 - jnp.abs(ccoord[:, :, None] - ccell[None])
    ).astype(dtype)  # (y', x', C)
    out = jax.lax.dot_general(
        s2, tmp_t, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision).astype(dtype)
    return out  # (y', x', ch)


def _warp_kernel(coef_ref, orig_ref, rtype_ref, rt0_ref, src_ref, out_ref,
                 scratch, sem, *, big_l, precision, tile_e, ts_e, ckc):
    n = pl.program_id(0)
    j = pl.program_id(1)
    txi = pl.program_id(2)
    tyi = pl.program_id(3)
    cki = pl.program_id(4)
    # SP: absolute destination row tile = local tile + shard offset
    # (origins are pre-sliced to the local row window host-side)
    tyi_abs = tyi + rt0_ref[0]
    # linear program index; rightmost grid dim iterates fastest
    nn, nj = pl.num_programs(0), pl.num_programs(1)
    nx, ny = pl.num_programs(2), pl.num_programs(3)
    nck = pl.num_programs(4)
    lin = (((n * nj + j) * nx + txi) * ny + tyi) * nck + cki
    total = nn * nj * nx * ny * nck
    slot = jax.lax.rem(lin, 2)

    def start_fetch(lin_idx, slot_idx):
        ck_ = jax.lax.rem(lin_idx, nck)
        r = lin_idx // nck
        ty_ = jax.lax.rem(r, ny)
        r = r // ny
        tx_ = jax.lax.rem(r, nx)
        r = r // nx
        j_ = jax.lax.rem(r, nj)
        n_ = r // nj
        o_h = orig_ref[n_, j_, tx_, ty_, 0]
        o_w = orig_ref[n_, j_, tx_, ty_, 1]

        # ROI tile skip: no fetch for tiles whose source support misses
        # the map (the owning program skips the wait symmetrically)
        @pl.when(orig_ref[n_, j_, tx_, ty_, 2] > 0)
        def _():
            pltpu.make_async_copy(
                src_ref.at[n_ // big_l, rtype_ref[n_], j_,
                           pl.ds(pl.multiple_of(o_h, 8), ts_e),
                           pl.ds(pl.multiple_of(o_w, 8), ts_e),
                           pl.ds(pl.multiple_of(ck_ * ckc, ckc), ckc)],
                scratch.at[slot_idx], sem.at[slot_idx]).start()

    # cross-program double buffering: program 0 fetches its own tile;
    # every program prefetches the NEXT program's tile into the other
    # slot, so the fetch overlaps this program's compute
    @pl.when(lin == 0)
    def _():
        start_fetch(0, 0)

    @pl.when(lin + 1 < total)
    def _():
        start_fetch(lin + 1, 1 - slot)

    o_h = orig_ref[n, j, txi, tyi, 0]
    o_w = orig_ref[n, j, txi, tyi, 1]
    swap = coef_ref[n, j, 6] > 0.5

    m00, m01, tx = coef_ref[n, j, 0], coef_ref[n, j, 1], coef_ref[n, j, 2]
    v0, v1, tya = coef_ref[n, j, 3], coef_ref[n, j, 4], coef_ref[n, j, 5]

    dtype = out_ref.dtype
    # dst coordinates (2D iotas: TPU requires >=2D)
    xs_row = ((txi * tile_e).astype(jnp.float32)
              + jax.lax.broadcasted_iota(jnp.int32, (1, tile_e), 1).astype(jnp.float32))
    ys_row = ((tyi_abs * tile_e).astype(jnp.float32)
              + jax.lax.broadcasted_iota(jnp.int32, (1, tile_e), 1).astype(jnp.float32))
    ys_col = ((tyi_abs * tile_e).astype(jnp.float32)
              + jax.lax.broadcasted_iota(jnp.int32, (tile_e, 1), 0).astype(jnp.float32))
    cells = jax.lax.broadcasted_iota(jnp.int32, (ts_e, 1), 0).astype(jnp.float32)
    cells_row = jax.lax.broadcasted_iota(jnp.int32, (1, ts_e), 1).astype(jnp.float32)

    valid = orig_ref[n, j, txi, tyi, 2] > 0

    @pl.when(valid)
    def _():
        pltpu.make_async_copy(src_ref.at[0, 0, 0, pl.ds(0, ts_e),
                                         pl.ds(0, ts_e), pl.ds(0, ckc)],
                              scratch.at[slot], sem.at[slot]).wait()

    tile = scratch[slot]

    def two_pass(tile_cr, orow_in, ocol_in):
        return _two_pass_tile(
            tile_cr, orow_in, ocol_in, m00=m00, m01=m01, tx=tx, v0=v0,
            v1=v1, tya=tya, xs_row=xs_row, ys_row=ys_row, ys_col=ys_col,
            cells=cells, cells_row=cells_row, dtype=dtype,
            precision=precision)

    ident = coef_ref[n, j, 7] > 0.5

    @pl.when(jnp.logical_not(valid))
    def _():
        # skipped tile: source support misses the map — exact zeros
        # (identical to what the hat weights would produce)
        out_ref[0, 0] = jnp.zeros(out_ref.shape[2:], out_ref.dtype)

    @pl.when(valid & ident)
    def _():
        # identity pair (i == j and co-located agents): the destination
        # tile IS a source sub-tile — one VMEM copy, no matmuls.
        # dy/dx are 8-aligned (origins are 8-aligned, tile edges are 32)
        dy = tyi_abs * tile_e - o_h
        dx = txi * tile_e - o_w
        out_ref[0, 0] = scratch[slot,
                                pl.ds(pl.multiple_of(dy, 8), tile_e),
                                pl.ds(pl.multiple_of(dx, 8), tile_e), :]

    @pl.when(valid & jnp.logical_not(ident) & jnp.logical_not(swap))
    def _():
        # src_in = map orientation: rows are H, cols are W; the
        # column-leading operand is the transposed tile
        out_ref[0, 0] = two_pass(jnp.swapaxes(tile, 0, 1), o_h, o_w)

    @pl.when(valid & jnp.logical_not(ident) & swap)
    def _():
        # conditioning swap: src_in is the transposed map (rows = W,
        # cols = H) — column-leading src_in IS the tile as fetched
        out_ref[0, 0] = two_pass(tile, o_w, o_h)


def _warp_kernel_resident(coef_ref, orig_ref, rtype_ref, pvalid_ref,
                          rt0_ref, src_ref, out_ref, scratch, sem, *,
                          big_l, precision, tile_e, ts_e):
    """Resident-map variant: one full-source-map DMA per (receiver,
    sender) PAIR (double-buffered across pairs), every destination tile
    slices its ts_e x ts_e support from the resident VMEM map at
    16-aligned offsets.  Cuts fetch traffic 3x vs the per-tile variant
    (each 32x32 dst tile re-fetched a 56x56 source tile -> 3.06x read
    amplification; the whole map is read ONCE per pair here), at the
    cost of holding two map slots in VMEM — see RES_VMEM_CAP gate."""
    n = pl.program_id(0)
    j = pl.program_id(1)
    txi = pl.program_id(2)
    tyi = pl.program_id(3)
    tyi_abs = tyi + rt0_ref[0]
    nj = pl.num_programs(1)
    pair = n * nj + j
    npairs = pl.num_programs(0) * nj
    slot = jax.lax.rem(pair, 2)
    first_tile = jnp.logical_and(txi == 0, tyi == 0)

    def start_fetch(pair_idx, slot_idx):
        j_ = jax.lax.rem(pair_idx, nj)
        n_ = pair_idx // nj

        # whole-pair ROI skip: no fetch when every tile's support
        # misses the map (the wait below is skipped symmetrically)
        @pl.when(pvalid_ref[n_, j_] > 0)
        def _():
            pltpu.make_async_copy(
                src_ref.at[n_ // big_l, rtype_ref[n_], j_],
                scratch.at[slot_idx], sem.at[slot_idx]).start()

    # pair-level double buffering: the first tile of pair p prefetches
    # pair p+1's map into the other slot, overlapping p's 16 tiles of
    # compute; grid programs execute sequentially, so later tiles of p
    # read the resident slot without re-waiting
    @pl.when(jnp.logical_and(first_tile, pair == 0))
    def _():
        start_fetch(0, 0)

    @pl.when(jnp.logical_and(first_tile, pair + 1 < npairs))
    def _():
        start_fetch(pair + 1, 1 - slot)

    @pl.when(jnp.logical_and(first_tile, pvalid_ref[n, j] > 0))
    def _():
        pltpu.make_async_copy(src_ref.at[0, 0, 0], scratch.at[slot],
                              sem.at[slot]).wait()

    o_h = orig_ref[n, j, txi, tyi, 0]
    o_w = orig_ref[n, j, txi, tyi, 1]
    swap = coef_ref[n, j, 6] > 0.5

    m00, m01, tx = coef_ref[n, j, 0], coef_ref[n, j, 1], coef_ref[n, j, 2]
    v0, v1, tya = coef_ref[n, j, 3], coef_ref[n, j, 4], coef_ref[n, j, 5]

    dtype = out_ref.dtype
    xs_row = ((txi * tile_e).astype(jnp.float32)
              + jax.lax.broadcasted_iota(jnp.int32, (1, tile_e), 1)
              .astype(jnp.float32))
    ys_row = ((tyi_abs * tile_e).astype(jnp.float32)
              + jax.lax.broadcasted_iota(jnp.int32, (1, tile_e), 1)
              .astype(jnp.float32))
    ys_col = ((tyi_abs * tile_e).astype(jnp.float32)
              + jax.lax.broadcasted_iota(jnp.int32, (tile_e, 1), 0)
              .astype(jnp.float32))
    cells = jax.lax.broadcasted_iota(jnp.int32, (ts_e, 1), 0).astype(
        jnp.float32)
    cells_row = jax.lax.broadcasted_iota(jnp.int32, (1, ts_e), 1).astype(
        jnp.float32)

    valid = orig_ref[n, j, txi, tyi, 2] > 0
    ident = coef_ref[n, j, 7] > 0.5

    def two_pass(tile_cr, orow_in, ocol_in):
        return _two_pass_tile(
            tile_cr, orow_in, ocol_in, m00=m00, m01=m01, tx=tx, v0=v0,
            v1=v1, tya=tya, xs_row=xs_row, ys_row=ys_row, ys_col=ys_col,
            cells=cells, cells_row=cells_row, dtype=dtype,
            precision=precision)

    @pl.when(jnp.logical_not(valid))
    def _():
        out_ref[0, 0] = jnp.zeros(out_ref.shape[2:], out_ref.dtype)

    @pl.when(valid & ident)
    def _():
        # identity pair: the destination tile IS a source sub-tile at
        # 32-aligned (hence 16-aligned) map coordinates
        out_ref[0, 0] = scratch[
            slot,
            pl.ds(pl.multiple_of(tyi_abs * tile_e, 16), tile_e),
            pl.ds(pl.multiple_of(txi * tile_e, 16), tile_e), :]

    @pl.when(valid & jnp.logical_not(ident) & jnp.logical_not(swap))
    def _():
        # src_in = map orientation (rows H, cols W): the column-leading
        # operand is the transposed support slice
        sub = scratch[slot,
                      pl.ds(pl.multiple_of(o_h, 16), ts_e),
                      pl.ds(pl.multiple_of(o_w, 16), ts_e), :]
        out_ref[0, 0] = two_pass(jnp.swapaxes(sub, 0, 1), o_h, o_w)

    @pl.when(valid & jnp.logical_not(ident) & swap)
    def _():
        # conditioning swap: src_in is the transposed map — the slice
        # as stored IS column-leading
        sub = scratch[slot,
                      pl.ds(pl.multiple_of(o_h, 16), ts_e),
                      pl.ds(pl.multiple_of(o_w, 16), ts_e), :]
        out_ref[0, 0] = two_pass(sub, o_w, o_h)


@partial(jax.jit, static_argnames=("discrete_ratio", "downsample_rate",
                                   "interpret", "num_receivers",
                                   "dest_row_tiles", "variant"))
def pallas_pair_warp(src_typed, pairwise, mode,
                     discrete_ratio: float, downsample_rate: float,
                     interpret: bool = False,
                     num_receivers: int | None = None,
                     dest_row_start=None,
                     dest_row_tiles: int | None = None,
                     variant: str = "auto"):
    """Warp typed sender maps into every receiver's frame.

    src_typed: (B, TY, J, H, W, Ck) — per-receiver-type sender maps
    (TY=1 for untyped); pairwise: (B, L, L, 4, 4) with pairwise[b, j, i]
    mapping j's frame into i's; mode: (B, L) receiver type in [0, TY).
    Returns (B, I, J, H, W, Ck) = for each receiver i, sender j's map
    warped into i's frame, reading the variant src_typed[b, mode_i].

    num_receivers restricts the receiver axis to the first I agents
    (e.g. I=1 for the ego-only final fusion phase); senders stay full.

    dest_row_start/dest_row_tiles restrict the DESTINATION to a window
    of row tiles [start, start + tiles) of the full map — the SP
    (spatial partitioning) hook: inside a shard_map each shard computes
    only its local H slice of the warped output while reading the full
    (all-gathered) source.  start is a traced (1,) int32 array (e.g.
    ``axis_index * tiles``); tiles is static.  Output H = tiles * 32.

    variant: 'tile' = per-dst-tile 56x56 source fetches; 'resident' =
    one full-map DMA per (receiver, sender) pair, dst tiles slice VMEM
    (3x less fetch traffic, needs the map to fit two VMEM slots).
    'auto' = tile: the round-4 v5e A/B measured resident SLOWER at
    production shapes (4.81 vs 4.56 ms standalone, bit-identical
    outputs) — the kernel is matmul-ISSUE-bound (~12 us/valid tile vs
    ~4 us of DMA), so cutting fetch bytes 3x bought nothing and the
    big-buffer dynamic slices + 64-wide supports cost ~5%.  Kept as a
    validated experiment + record (PERF.md round-4 verdict).
    """
    bsz, ty_count, l, h, w, ck = src_typed.shape
    tile_e, ts_e, ckc = _tiling(h, ck)
    if variant == "auto":
        variant = "tile"
    if variant == "resident":
        fits = 2 * h * w * ck * src_typed.dtype.itemsize <= RES_VMEM_CAP
        if not (fits and h == w and h >= TS_RES and h % tile_e == 0):
            variant = "tile"
    if variant == "resident":
        ts_e = TS_RES
    assert h == w and h % tile_e == 0 and h >= ts_e, (h, w)
    coef, origins, rtype = _prep_affines(
        pairwise, mode, (h, w), discrete_ratio, downsample_rate,
        tile_e, ts_e, align=16 if variant == "resident" else 8)
    xt, yt = w // tile_e, h // tile_e
    n_recv = l if num_receivers is None else num_receivers
    if n_recv != l:
        # receiver-major first axis: (B*L, ...) -> (B, L, ...) slice
        coef = coef.reshape(bsz, l, l, 8)[:, :n_recv].reshape(
            bsz * n_recv, l, 8)
        origins = origins.reshape(bsz, l, l, xt, yt, 3)[:, :n_recv]
        origins = origins.reshape(bsz * n_recv, l, xt, yt, 3)
        rtype = rtype.reshape(bsz, l)[:, :n_recv].reshape(-1)
    n = bsz * n_recv

    if dest_row_tiles is None:
        yt_out = yt
        rt0 = jnp.zeros((1,), jnp.int32)
    else:
        yt_out = int(dest_row_tiles)
        rt0 = jnp.asarray(dest_row_start, jnp.int32).reshape(1)
        origins = jax.lax.dynamic_slice_in_dim(origins, rt0[0], yt_out,
                                               axis=3)
    h_out = yt_out * tile_e

    precision = (jax.lax.Precision.HIGHEST
                 if src_typed.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    if variant == "resident":
        pvalid = (origins[..., 2].sum(axis=(2, 3)) > 0).astype(jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,  # coef, origins, rtype, pvalid, rt0
            grid=(n, l, xt, yt_out),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 1, tile_e, tile_e, ck),
                lambda n, j, txi, tyi, *_: (n, j, tyi, txi, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, h, w, ck), src_typed.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = partial(_warp_kernel_resident, big_l=n_recv,
                         precision=precision, tile_e=tile_e, ts_e=ts_e)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, l, h_out, w, ck),
                                           src_typed.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
            interpret=interpret,
        )(coef, origins, rtype, pvalid, rt0, src_typed)
        return out.reshape(bsz, n_recv, l, h_out, w, ck)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # coef, origins, rtype, rt0
        grid=(n, l, xt, yt_out, ck // ckc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, tile_e, tile_e, ckc),
            lambda n, j, txi, tyi, cki, *_: (n, j, tyi, txi, cki),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ts_e, ts_e, ckc), src_typed.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(_warp_kernel, big_l=n_recv, precision=precision,
                     tile_e=tile_e, ts_e=ts_e, ckc=ckc)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, l, h_out, w, ck),
                                       src_typed.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(coef, origins, rtype, rt0, src_typed)
    return out.reshape(bsz, n_recv, l, h_out, w, ck)


def pair_warp_xla(src_typed, pairwise, mode, discrete_ratio,
                  downsample_rate, num_receivers=None):
    """Oracle / grad path: type-gather + MXU separable warp."""
    from .shear_warp import warp_bev_mxu

    bsz, ty_count, l, h, w, ck = src_typed.shape
    r = l if num_receivers is None else num_receivers
    ridx = mode[:, :r, None, None, None, None].astype(jnp.int32)
    typed = jnp.take_along_axis(src_typed, ridx, axis=1)  # (B, I, J, ...)
    t_ij = jnp.swapaxes(pairwise, 1, 2)[:, :r]
    return warp_bev_mxu(
        typed.reshape(bsz * r, l, h, w, ck),
        t_ij.reshape(bsz * r, l, 4, 4),
        discrete_ratio, downsample_rate,
    ).reshape(bsz, r, l, h, w, ck)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_pair_warp(src_typed, pairwise, mode, discrete_ratio,
                    downsample_rate, num_receivers=None):
    """Pallas forward, XLA-recompute backward."""
    return pallas_pair_warp(src_typed, pairwise, mode, discrete_ratio,
                            downsample_rate,
                            num_receivers=num_receivers)


def _fpw_fwd(src_typed, pairwise, mode, dr, ds, nr):
    return (pallas_pair_warp(src_typed, pairwise, mode, dr, ds,
                             num_receivers=nr),
            (src_typed, pairwise, mode))


def _fpw_bwd(dr, ds, nr, res, g):
    src_typed, pairwise, mode = res
    _, vjp = jax.vjp(
        lambda s: pair_warp_xla(s, pairwise, mode, dr, ds, nr), src_typed)
    return (*vjp(g), None, None)


fused_pair_warp.defvjp(_fpw_fwd, _fpw_bwd)
