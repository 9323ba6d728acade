"""Fused pair-warp + hetero window attention — one Pallas TPU kernel.

Round-3 profile (PERF.md): the warped ``kv_pair`` tensor
(B·I, J, H, W, 2C) makes a full HBM round trip between the pair-warp
kernel (ops/fused_warp.py) and the stripe attention kernel
(ops/window_attention.py) — at production shapes that is ~134 MB
written and re-read per fusion phase, plus a second kernel launch and
its pipeline fill.  This kernel computes the attention output directly
from the TYPED sender maps: the warped K/V never leaves VMEM.

Per program (receiver n, 32-column destination band):
  1. warp phase — for each sender j and each 32x32 destination tile of
     the band, the exact ops/fused_warp.py machinery (receiver-type
     gather DMA, 56x56 source fetch, two-pass separable bilinear warp
     on the MXU, identity fast path, ROI tile skip) writes the warped
     (32, 32, 2C) tile into a per-sender VMEM band buffer;
  2. attention phase — the band holds ``32/win`` complete window
     stripes, so the stripe-kernel math (ops/window_attention.py
     ``_stripe_kernel``) runs unchanged on the VMEM-resident band:
     free row-major window regroup after the fp32 upcast, per-head
     concat-over-senders softmax, masked windows exactly zero.

Numerics are IDENTICAL to pallas_pair_warp + stripe_window_attention
(same op order, same dtypes) — tests assert bit-equality in interpret
mode and the TPU A/B is recorded in PERF.md.

Replaces the reference's fused hot loop (reference:
opencood/models/sub_modules/hetero_fusion.py:363-444) at the
warp->attend junction.  XLA oracle / backward: pair_warp_xla +
plain_window_attention_xla recompute (same pattern as the split
kernels' custom VJPs).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_warp import TILE, TS, _prep_affines, pair_warp_xla
from .window_attention import plain_window_attention_xla


def _fused_kernel(coef_ref, orig_ref, rtype_ref, q_ref, mask_ref, bias_ref,
                  src_ref, out_ref, kv_band, scratch, sem, *,
                  big_l, precision, tile_e, ts_e, ck2,
                  heads, dim_head, win, n_senders):
    n = pl.program_id(0)
    txi = pl.program_id(1)
    nn, nx = pl.num_programs(0), pl.num_programs(1)
    h = q_ref.shape[1]
    ny = h // tile_e
    nj = n_senders
    steps = nj * ny
    total = nn * nx * steps

    def start_fetch(gstep, slot_idx):
        # gstep = ((n * nx) + txi) * steps + (j * ny + tyi)
        s = jax.lax.rem(gstep, steps)
        p = gstep // steps
        tyi_ = jax.lax.rem(s, ny)
        j_ = s // ny
        txi_ = jax.lax.rem(p, nx)
        n_ = p // nx
        o_h = orig_ref[n_, j_, txi_, tyi_, 0]
        o_w = orig_ref[n_, j_, txi_, tyi_, 1]

        @pl.when(orig_ref[n_, j_, txi_, tyi_, 2] > 0)
        def _():
            pltpu.make_async_copy(
                src_ref.at[n_ // big_l, rtype_ref[n_], j_,
                           pl.ds(pl.multiple_of(o_h, 8), ts_e),
                           pl.ds(pl.multiple_of(o_w, 8), ts_e),
                           pl.ds(0, ck2)],
                scratch.at[slot_idx], sem.at[slot_idx]).start()

    prog = n * nx + txi
    gbase = prog * steps

    @pl.when(prog == 0)
    def _():
        start_fetch(0, 0)

    dtype = out_ref.dtype
    cells = jax.lax.broadcasted_iota(
        jnp.int32, (ts_e, 1), 0).astype(jnp.float32)
    cells_row = jax.lax.broadcasted_iota(
        jnp.int32, (1, ts_e), 1).astype(jnp.float32)
    iota_t = jax.lax.broadcasted_iota(
        jnp.int32, (1, tile_e), 1).astype(jnp.float32)

    # ---- warp phase: fill kv_band[j, :, :, :] ----
    for s in range(steps):
        j, tyi = s // ny, s % ny
        gstep = gbase + s
        slot = gstep % 2

        @pl.when(gstep + 1 < total)
        def _(s=s, slot=slot):
            start_fetch(gbase + s + 1, 1 - slot)

        valid = orig_ref[n, j, txi, tyi, 2] > 0
        o_h = orig_ref[n, j, txi, tyi, 0]
        o_w = orig_ref[n, j, txi, tyi, 1]
        swap = coef_ref[n, j, 6] > 0.5
        ident = coef_ref[n, j, 7] > 0.5
        m00, m01, tx = (coef_ref[n, j, 0], coef_ref[n, j, 1],
                        coef_ref[n, j, 2])
        v0, v1, tya = (coef_ref[n, j, 3], coef_ref[n, j, 4],
                       coef_ref[n, j, 5])

        @pl.when(valid)
        def _(slot=slot):
            pltpu.make_async_copy(
                src_ref.at[0, 0, 0, pl.ds(0, ts_e), pl.ds(0, ts_e),
                           pl.ds(0, ck2)],
                scratch.at[slot], sem.at[slot]).wait()

        tile = scratch[slot]
        xs_row = (txi * tile_e).astype(jnp.float32) + iota_t
        ys_row = jnp.asarray(tyi * tile_e, jnp.float32) + iota_t
        ys_col = jnp.asarray(tyi * tile_e, jnp.float32) + jnp.swapaxes(
            iota_t, 0, 1)

        def two_pass(tile_cr, orow_in, ocol_in):
            ccol = ocol_in.astype(jnp.float32) + cells
            rcoord = v1 * ys_row + v0 * ccol + tya
            rcell = orow_in.astype(jnp.float32) + cells_row
            s1 = jnp.maximum(
                0.0, 1.0 - jnp.abs(rcoord[:, :, None] - rcell[None])
            ).astype(dtype)
            tmp = jax.lax.dot_general(
                s1, tile_cr, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=precision).astype(dtype)
            tmp_t = jnp.swapaxes(tmp, 0, 1)
            ccoord = m00 * xs_row + m01 * ys_col + tx
            ccell = ocol_in.astype(jnp.float32) + cells_row
            s2 = jnp.maximum(
                0.0, 1.0 - jnp.abs(ccoord[:, :, None] - ccell[None])
            ).astype(dtype)
            return jax.lax.dot_general(
                s2, tmp_t, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=precision).astype(dtype)

        row = pl.ds(tyi * tile_e, tile_e)

        @pl.when(jnp.logical_not(valid))
        def _(j=j, row=row):
            kv_band[j, row] = jnp.zeros(
                (tile_e, tile_e, ck2), kv_band.dtype)

        @pl.when(valid & ident)
        def _(j=j, row=row, slot=slot, tyi=tyi):
            dy = tyi * tile_e - o_h
            dx = txi * tile_e - o_w
            kv_band[j, row] = scratch[slot,
                                      pl.ds(pl.multiple_of(dy, 8), tile_e),
                                      pl.ds(pl.multiple_of(dx, 8), tile_e),
                                      :]

        @pl.when(valid & jnp.logical_not(ident) & jnp.logical_not(swap))
        def _(j=j, row=row):
            kv_band[j, row] = two_pass(jnp.swapaxes(tile, 0, 1), o_h, o_w)

        @pl.when(valid & jnp.logical_not(ident) & swap)
        def _(j=j, row=row):
            kv_band[j, row] = two_pass(tile, o_w, o_h)

    # ---- attention phase: stripe math on the VMEM band ----
    d = dim_head
    c = heads * d
    t = win * win
    neg = jnp.asarray(-1e9, jnp.float32)
    nw = h // win
    spb = tile_e // win  # stripes per band

    for si in range(spb):
        col = slice(si * win, (si + 1) * win)
        q = q_ref[0, :, col, :].astype(jnp.float32).reshape(nw, t, c)
        for hh in range(heads):
            qh = q[:, :, hh * d:(hh + 1) * d]
            bias_h = bias_ref[hh].astype(jnp.float32)
            sims = []
            vs = []
            for jj in range(nj):
                kvj = kv_band[jj, :, col, :].astype(jnp.float32).reshape(
                    nw, t, 2 * c)
                kh = kvj[:, :, hh * d:(hh + 1) * d]
                sim = jax.lax.dot_general(
                    qh, kh, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                m = mask_ref[0, jj, 0, si].astype(jnp.float32)  # (nw, T)
                sim = jnp.where(m[:, None, :] > 0, sim + bias_h[None], neg)
                sims.append(sim)
                vs.append(kvj[:, :, c + hh * d:c + (hh + 1) * d])
            sim = jnp.concatenate(sims, axis=-1)
            v_cat = jnp.concatenate(vs, axis=1)
            mx = jnp.max(sim, axis=-1, keepdims=True)
            ex = jnp.exp(sim - mx)
            den = jnp.sum(ex, axis=-1, keepdims=True)
            attn = ex / den
            attn = jnp.where(mx <= neg / 2, jnp.zeros_like(attn), attn)
            out = jax.lax.dot_general(
                attn, v_cat, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out_ref[0, :, col, hh * d:(hh + 1) * d] = out.reshape(
                h, win, d).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=(
    "win", "heads", "dim_head", "discrete_ratio", "downsample_rate",
    "num_receivers", "interpret"))
def warp_window_attention(q, src_typed, pairwise, mode, mask, bias,
                          win: int, heads: int, dim_head: int,
                          discrete_ratio: float, downsample_rate: float,
                          num_receivers: int | None = None,
                          interpret: bool = False):
    """q: (B*R, H, W, C) pre-scaled queries (compute dtype);
    src_typed: (B, TY, J, H, W, 2C) typed sender K/V maps;
    pairwise: (B, L, L, 4, 4); mode: (B, L) receiver types;
    mask: (B*R, J, H, W); bias: (heads, T, T).
    Returns (B*R, H, W, C) — numerically identical to
    fused_pair_warp -> fused_stripe_window_attention.
    """
    bsz, ty_count, l, h, w, ck2 = src_typed.shape
    c = heads * dim_head
    assert ck2 == 2 * c, (ck2, c)
    assert h == w and h % TILE == 0 and h >= TS and TILE % win == 0
    n, hq, wq, cq = q.shape
    assert (hq, wq, cq) == (h, w, c), (q.shape, (h, w, c))
    coef, origins, rtype = _prep_affines(
        pairwise, mode, (h, w), discrete_ratio, downsample_rate, TILE, TS)
    xt, yt = w // TILE, h // TILE
    n_recv = l if num_receivers is None else num_receivers
    if n_recv != l:
        coef = coef.reshape(bsz, l, l, 8)[:, :n_recv].reshape(
            bsz * n_recv, l, 8)
        origins = origins.reshape(bsz, l, l, xt, yt, 3)[:, :n_recv]
        origins = origins.reshape(bsz * n_recv, l, xt, yt, 3)
        rtype = rtype.reshape(bsz, l)[:, :n_recv].reshape(-1)
    assert n == bsz * n_recv, (n, bsz, n_recv)

    # mask (N, J, H, W) -> (N, J, XT, SPB, nw, T): band txi's stripe si
    # in token order, so the kernel reads each (nw, T) mask directly
    nw, t = h // win, win * win
    spb = TILE // win
    mask_s = mask.reshape(n, l, nw, win, xt, spb, win)
    mask_s = jnp.moveaxis(jnp.moveaxis(mask_s, 4, 2), 5, 3)
    mask_s = mask_s.reshape(n, l, xt, spb, nw, t)

    precision = (jax.lax.Precision.HIGHEST
                 if src_typed.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    kernel = partial(
        _fused_kernel, big_l=n_recv, precision=precision, tile_e=TILE,
        ts_e=TS, ck2=ck2, heads=heads, dim_head=dim_head, win=win,
        n_senders=l)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # coef, origins, rtype
        grid=(n, xt),
        in_specs=[
            pl.BlockSpec((1, h, TILE, c), lambda ni, txi, *_: (ni, 0, txi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, 1, spb, nw, t),
                         lambda ni, txi, *_: (ni, 0, txi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, t, t), lambda ni, txi, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, h, TILE, c), lambda ni, txi, *_: (ni, 0, txi, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((l, h, TILE, ck2), src_typed.dtype),
            pltpu.VMEM((2, TS, TS, ck2), src_typed.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(coef, origins, rtype, q, mask_s, bias, src_typed)


def warp_window_attention_xla(q, src_typed, pairwise, mode, mask, bias,
                              win, heads, dim_head, discrete_ratio,
                              downsample_rate, num_receivers=None):
    """Oracle / grad path: XLA pair warp + split window attention."""
    bsz, ty_count, l, h, w, ck2 = src_typed.shape
    c = heads * dim_head
    n = q.shape[0]
    t = win * win
    kv_pair = pair_warp_xla(src_typed, pairwise, mode, discrete_ratio,
                            downsample_rate, num_receivers).reshape(
        n, l, h, w, ck2)

    def split(z, ch):
        lead = z.shape[:-3]
        z = z.reshape(*lead, h // win, win, w // win, win, ch)
        z = jnp.moveaxis(z, -3, -4)
        return z.reshape(*lead, (h // win) * (w // win), t, ch)

    qw = split(q, c)
    kvw = split(kv_pair, ck2)
    mw = split(mask[..., None], 1)[..., 0]
    out = plain_window_attention_xla(
        qw, kvw[..., :c], kvw[..., c:], bias, mw,
        heads=heads, dim_head=dim_head)
    nwx, nwy = h // win, w // win
    out = out.reshape(n, nwx, nwy, win, win, c)
    out = jnp.moveaxis(out, 2, 3)
    return out.reshape(n, h, w, c)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def fused_warp_window_attention(q, src_typed, pairwise, mode, mask, bias,
                                win, heads, dim_head, discrete_ratio,
                                downsample_rate, num_receivers=None):
    """Pallas forward, XLA-recompute backward (grads for q, src_typed,
    bias; the geometry inputs and the 0/1 mask carry no gradient —
    same convention as fused_pair_warp / fused_stripe_window_attention).
    """
    return warp_window_attention(q, src_typed, pairwise, mode, mask, bias,
                                 win, heads, dim_head, discrete_ratio,
                                 downsample_rate, num_receivers)


def _fwwa_fwd(q, src_typed, pairwise, mode, mask, bias,
              win, heads, dim_head, dr, ds, nr):
    out = warp_window_attention(q, src_typed, pairwise, mode, mask, bias,
                                win, heads, dim_head, dr, ds, nr)
    return out, (q, src_typed, pairwise, mode, mask, bias)


def _fwwa_bwd(win, heads, dim_head, dr, ds, nr, res, g):
    q, src_typed, pairwise, mode, mask, bias = res
    _, vjp = jax.vjp(
        lambda q_, s_, b_: warp_window_attention_xla(
            q_, s_, pairwise, mode, mask, b_, win, heads, dim_head,
            dr, ds, nr),
        q, src_typed, bias)
    gq, gs, gb = vjp(g)
    return (gq, gs, None, None, jnp.zeros_like(mask), gb)


fused_warp_window_attention.defvjp(_fwwa_fwd, _fwwa_bwd)
