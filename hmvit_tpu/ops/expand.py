"""Dense-grid expansion of compacted per-pillar rows — Pallas TPU kernel.

The pillar path reduces points to one row per non-empty pillar (sorted
by cell id).  Materializing the dense (cells, C) BEV grid from that is
an EXPANSION — XLA expresses it as a row gather (~5 ns/row at 1.3M rows
= ~7 ms) plus a dense segment_max for the index map (~4 ms).  This
kernel exploits the monotone structure instead: cell block b's source
rows live in the compacted array at [r0[b], r0[b] + BLOCK) (at most one
row per cell), so each program reads a 2*BLOCK-row slab via BlockSpec
index maps driven by a prefetched searchsorted table and expands with a
one-hot equality matmul on the MXU — ids outside the block match no
cell, so no dynamic slicing is needed and empty cells come out zero.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 4096


SUB = 128        # cells per sub-block (one matmul each)
SUBK = SUB + 8   # slab rows per sub-block (alignment slack)


def _expand_kernel(r0_ref, ids_lo_ref, ids_hi_ref, comp_lo_ref,
                   comp_hi_ref, out_ref, ids_sc, slab_sc):
    del r0_ref  # slab selection happens in the index maps
    # stage the 2-block slab in scratch so sub-blocks can take dynamic
    # ref reads (dynamic_slice on VALUES is not lowered on TPU)
    ids_sc[:BLOCK, :] = ids_lo_ref[:, :]
    ids_sc[BLOCK:, :] = ids_hi_ref[:, :]
    slab_sc[:BLOCK, :] = comp_lo_ref[:, :]
    slab_sc[BLOCK:, :] = comp_hi_ref[:, :]
    ids = ids_sc[:, :]  # (2B, 1)
    cell0 = pl.program_id(0) * BLOCK
    # per 128-cell sub-block: locate its slab rows by counting ids
    # below the sub-block start (ids are sorted), then a thin one-hot
    # matmul places them — 15x fewer MAC ops than one BLOCK-wide one-hot
    for s in range(BLOCK // SUB):
        start_s = cell0 + s * SUB
        r0_s = jnp.sum((ids < start_s).astype(jnp.int32))
        off = pl.multiple_of(
            jnp.clip((r0_s // 8) * 8, 0, 2 * BLOCK - SUBK), 8)
        ids_s = ids_sc[pl.ds(off, SUBK), :]          # (SUBK, 1)
        slab_s = slab_sc[pl.ds(off, SUBK), :]        # (SUBK, C)
        cells_row = start_s + jax.lax.broadcasted_iota(
            jnp.int32, (1, SUB), 1)
        oh_t = (ids_s == cells_row).astype(slab_s.dtype)  # (SUBK, SUB)
        out_s = jax.lax.dot_general(
            oh_t, slab_s, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if slab_s.dtype == jnp.float32
                       else jax.lax.Precision.DEFAULT))  # (SUB, C)
        out_ref[s * SUB:(s + 1) * SUB, :] = out_s.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("num_cells", "interpret"))
def expand_rows_to_dense(comp, comp_ids, num_cells: int,
                         interpret: bool = False):
    """comp: (M, C) one row per non-empty cell, sorted by comp_ids;
    comp_ids: (M,) int32 cell ids (fill rows carry id >= num_cells).
    Returns (num_cells, C) with comp rows placed and zeros elsewhere.
    """
    m, c = comp.shape
    assert num_cells % BLOCK == 0
    num_blocks = num_cells // BLOCK
    # pad the compacted array to a whole number of blocks + one spare
    # block so the hi slab never overruns
    m_pad = ((m + BLOCK - 1) // BLOCK + 1) * BLOCK
    pad = m_pad - m
    comp = jnp.pad(comp, ((0, pad), (0, 0)))
    comp_ids = jnp.pad(comp_ids, (0, pad),
                       constant_values=jnp.int32(num_cells))

    starts = jnp.arange(num_blocks, dtype=jnp.int32) * BLOCK
    r0 = jnp.searchsorted(comp_ids, starts, side="left").astype(jnp.int32)
    r0 = jnp.minimum(r0, jnp.int32(m_pad - 2 * BLOCK))
    lo = r0 // BLOCK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lo block indices
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK, 1), lambda b, lo: (lo[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda b, lo: (lo[b] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, c), lambda b, lo: (lo[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, c), lambda b, lo: (lo[b] + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, c), lambda b, lo: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * BLOCK, 1), jnp.int32),
            pltpu.VMEM((2 * BLOCK, c), comp.dtype),
        ],
    )
    return pl.pallas_call(
        _expand_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_cells, c), comp.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lo, comp_ids[:, None], comp_ids[:, None], comp, comp)


CHUNK = 256          # rows per conditional DMA
K_MAX = BLOCK // CHUNK + 2   # worst case: every cell occupied + slack
SUBK2 = SUB + 16     # v2 window: <=128 matches + 8 align + 8 slack
LANES = 128          # packed row width = one full lane tile


def _expand_v2_kernel(r0_ref, r0s_ref, packed_ref, out_ref,
                      packed_sc, sem, *, c, precision):
    """Demand-sized expansion: fetch ONLY the block's compacted rows.

    v1 fetches a fixed 2*BLOCK-row slab per 4096-cell block (~17x HBM
    overfetch at production occupancy, which is why it lost to the XLA
    gather).  Here each program issues ceil(rows_b / CHUNK) conditional
    chunk DMAs — total traffic ~= the compacted array once — and places
    each 128-cell sub-block with a thin one-hot matmul, locating its
    rows via the prefetched per-sub-block searchsorted table (no
    in-kernel compare-reductions).

    Manual HBM->VMEM copies must be full lane tiles (Mosaic rejects
    sub-128-lane slices of an HBM memref), so the caller packs features
    AND byte-split cell ids into one (rows, 128) buffer; the ids are
    recovered in-kernel by an exact thin matmul against a
    [1, 256, 65536] decode column (byte values are exact in bf16)."""
    b = pl.program_id(0)
    base = pl.multiple_of((r0_ref[b] // 8) * 8, 8)
    need = r0_ref[b + 1] - base + SUBK2
    nchunks = (need + CHUNK - 1) // CHUNK

    for k in range(K_MAX):
        @pl.when(k < nchunks)
        def _(k=k):
            pltpu.make_async_copy(
                packed_ref.at[pl.ds(base + k * CHUNK, CHUNK)],
                packed_sc.at[pl.ds(k * CHUNK, CHUNK)],
                sem.at[k]).start()

    for k in range(K_MAX):
        @pl.when(k < nchunks)
        def _(k=k):
            pltpu.make_async_copy(
                packed_ref.at[pl.ds(0, CHUNK)],
                packed_sc.at[pl.ds(0, CHUNK)], sem.at[k]).wait()

    # decode column: lanes [c, c+1, c+2] hold the id bytes (lo..hi)
    lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)
    dec = (jnp.where(lane == c, 1.0, 0.0)
           + jnp.where(lane == c + 1, 256.0, 0.0)
           + jnp.where(lane == c + 2, 65536.0, 0.0)
           ).astype(packed_sc.dtype)

    cell0 = b * BLOCK
    nsub = BLOCK // SUB
    for s in range(nsub):
        g = b * nsub + s
        start_s = cell0 + s * SUB
        off = jnp.clip((r0s_ref[g] // 8) * 8 - base, 0,
                       K_MAX * CHUNK - SUBK2)
        w_rows = packed_sc[pl.ds(pl.multiple_of(off, 8), SUBK2), :]
        # byte values (<=255) and power-of-2 multipliers make the decode
        # exact under native bf16 MXU precision (fp32 accumulation);
        # fp32 operands need HIGHEST (default fp32 is bf16-split passes).
        # Mosaic rejects HIGHEST on bf16 lhs ("Bad lhs type").
        ids_f = jax.lax.dot_general(
            w_rows, dec, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if w_rows.dtype == jnp.float32
                       else jax.lax.Precision.DEFAULT))  # (SUBK2, 1)
        ids_w = ids_f.astype(jnp.int32)
        cells_row = start_s + jax.lax.broadcasted_iota(
            jnp.int32, (1, SUB), 1)
        oh = (ids_w == cells_row).astype(w_rows.dtype)  # (SUBK2, SUB)
        out_s = jax.lax.dot_general(
            oh, w_rows, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)  # (SUB, LANES)
        out_ref[s * SUB:(s + 1) * SUB, :] = \
            out_s[:, :c].astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("num_cells", "interpret"))
def expand_rows_to_dense_v2(comp, comp_ids, num_cells: int,
                            interpret: bool = False):
    """Same contract as :func:`expand_rows_to_dense`, demand-sized DMAs."""
    m, c = comp.shape
    assert num_cells % BLOCK == 0
    assert c <= LANES - 3, "features + 3 id-byte lanes must fit 128"
    num_blocks = num_cells // BLOCK
    pad = K_MAX * CHUNK
    ids = jnp.pad(comp_ids, (0, pad),
                  constant_values=jnp.int32(num_cells))
    # pack features + byte-split ids into one full-lane-tile buffer
    # (bytes are exact in bf16; ids < 2^24)
    b0 = (ids & 0xFF).astype(comp.dtype)
    b1 = ((ids >> 8) & 0xFF).astype(comp.dtype)
    b2 = (ids >> 16).astype(comp.dtype)
    packed = jnp.concatenate(
        [jnp.pad(comp, ((0, pad), (0, 0))),
         jnp.stack([b0, b1, b2], axis=1),
         jnp.zeros((m + pad, LANES - c - 3), comp.dtype)], axis=1)

    starts = jnp.arange(num_blocks + 1, dtype=jnp.int32) * BLOCK
    r0 = jnp.searchsorted(ids, starts, side="left").astype(jnp.int32)
    sub_starts = jnp.arange(num_cells // SUB, dtype=jnp.int32) * SUB
    r0s = jnp.searchsorted(ids, sub_starts,
                           side="left").astype(jnp.int32)

    precision = (jax.lax.Precision.HIGHEST if comp.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # r0, r0s
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK, c), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K_MAX * CHUNK, LANES), comp.dtype),
            pltpu.SemaphoreType.DMA((K_MAX,)),
        ],
    )
    return pl.pallas_call(
        partial(_expand_v2_kernel, c=c, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_cells, c), comp.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(r0, r0s, packed)


def expand_rows_to_dense_xla(comp, comp_ids, num_cells: int):
    """Oracle: scatter-free XLA reference (searchsorted + gather)."""
    cells = jnp.arange(num_cells, dtype=comp_ids.dtype)
    pos = jnp.searchsorted(comp_ids, cells, side="left")
    pos = jnp.minimum(pos, comp_ids.shape[0] - 1)
    hit = comp_ids[pos] == cells
    return jnp.where(hit[:, None], comp[pos], 0).astype(comp.dtype)
