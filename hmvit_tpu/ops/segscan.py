"""Fused segmented max-scan Pallas kernel for the pillar scatter.

The XLA log-shift segmented scan (ops/voxelize.py::segmented_scan) makes
``steps`` full HBM passes over the (P, C) point-feature array — ~5x the
traffic actually needed.  This kernel performs the whole inclusive
segmented max-scan in ONE pass: each grid step loads a row-block into
VMEM, runs the 5 shift/compare steps in-registers, and carries the last
run's (segment id, running max) to the next block through scratch
(TPU grid steps execute sequentially, so the carry is exact).

Contract matches ``segmented_scan(vals, seg_id, steps, max, -inf)`` on
SORTED ids with run length <= 2**steps: the last row of each run holds
the run's max (tests/test_segscan.py pins equality, including runs that
straddle block boundaries).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # finite stand-in for -inf (bf16/f32 safe)


def _kernel(pid_ref, val_ref, out_ref, carry_val, carry_pid, *,
            steps: int):
    b = pl.program_id(0)
    r = val_ref.shape[0]
    c = val_ref.shape[1]

    @pl.when(b == 0)
    def _init():
        carry_val[...] = jnp.full((1, c), _NEG, jnp.float32)
        carry_pid[0] = jnp.int32(-2147483647)

    x = val_ref[...].astype(jnp.float32)
    pid = pid_ref[...]  # (R, 1) int32

    for k in range(steps):
        s = 1 << k
        # int32 sentinel-shift, then full-array compare — Mosaic cannot
        # concatenate boolean vregs
        pid_sh = jnp.concatenate(
            [jnp.full((s, 1), -2147483647, jnp.int32), pid[:-s]], axis=0)
        shifted = jnp.concatenate(
            [jnp.full((s, c), _NEG, jnp.float32), x[:-s]], axis=0)
        x = jnp.where(pid == pid_sh, jnp.maximum(x, shifted), x)

    # splice the previous block's tail run into this block's head run
    head = (pid == pid[0, 0]) & (pid[0, 0] == carry_pid[0])
    x = jnp.where(head, jnp.maximum(x, carry_val[...]), x)

    out_ref[...] = x.astype(out_ref.dtype)
    carry_val[...] = x[r - 1:r]
    carry_pid[0] = pid[r - 1, 0]


def pick_block_rows(p: int, cap: int = 2048) -> int:
    """Largest multiple-of-8 divisor of ``p`` up to ``cap`` (0 if none
    — the caller falls back to the XLA scan).  The cap is VMEM-bound:
    6000-row blocks at C=64 f32 exceeded the 16 MB scoped limit (24.4 MB
    with double buffering + unrolled shift temps)."""
    for cand in range(min(cap, p), 7, -8):
        if p % cand == 0:
            return cand
    return 0


@partial(jax.jit, static_argnames=("steps", "block_rows", "interpret"))
def fused_segmented_max_scan(vals, seg_id, steps: int = 5,
                             block_rows: int = 4096,
                             interpret: bool = False):
    """One-pass inclusive segmented max-scan over sorted ids.

    vals: (P, C); seg_id: (P,) int32 sorted (any interleaved "dropped"
    id like -1 forms its own runs — their outputs are garbage-but-
    unused, same as the XLA scan).  Requires run length <= 2**steps and
    P % block_rows == 0 (pad upstream; the pillar path's P = N*30000 is
    padded static anyway).
    """
    p, c = vals.shape
    assert p % block_rows == 0, (p, block_rows)
    grid = (p // block_rows,)
    pid2d = seg_id.astype(jnp.int32).reshape(p, 1)
    return pl.pallas_call(
        partial(_kernel, steps=steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, c), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, c), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c), vals.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(pid2d, vals)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segmented_max_scan_tpu(vals, seg_id, steps: int, block_rows: int):
    """Differentiable wrapper: Pallas forward, XLA-recompute backward
    (gradient of max-scan = argmax routing; cotangents only land on the
    consumed last-of-run rows, where both implementations agree)."""
    return fused_segmented_max_scan(vals, seg_id, steps=steps,
                                    block_rows=block_rows)


def _sms_fwd(vals, seg_id, steps, block_rows):
    return (fused_segmented_max_scan(vals, seg_id, steps=steps,
                                     block_rows=block_rows),
            (vals, seg_id))


def _sms_bwd(steps, block_rows, res, g):
    from .voxelize import segmented_scan

    vals, seg_id = res
    _, vjp = jax.vjp(
        lambda v: segmented_scan(v, seg_id, steps, jnp.maximum,
                                 jnp.asarray(-jnp.inf, v.dtype)), vals)
    return (*vjp(g), None)


segmented_max_scan_tpu.defvjp(_sms_fwd, _sms_bwd)
