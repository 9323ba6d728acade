"""Fused pillar voxelization for PointPillars — on-device, static shapes.

Replaces the reference's CPU spconv ``Point2VoxelCPU3d`` voxelizer
(reference: opencood/data_utils/pre_processor/sp_voxel_preprocessor.py:34-58)
plus the per-sample dense scatter loop of PointPillarScatter (reference:
opencood/models/sub_modules/point_pillar_scatter.py:20-44).  Instead of
materializing a ragged (V, 32, 4) voxel tensor on the host, raw padded
points go to the device and the whole pillarize -> featurize -> scatter
chain is one jitted segment-op program:

  1. per-point pillar id (or an overflow slot for out-of-range/pad points);
  2. rank-within-pillar via one sort, to honor the max-points-per-pillar
     cap with the same keep-first-K-in-order semantics as spconv;
  3. per-pillar sums/counts via log-shift segmented scans over the sorted
     point array (pure VPU shifts — no scatter) for the cluster-mean
     features;
  4. after the PFN point MLP, the dense (ny*nx, C) BEV grid is produced
     by a segmented max-scan + one scalar ``segment_max`` of point
     indices + a row-contiguous gather — the wide multi-channel scatter
     into the million-cell grid (XLA's slowest path on TPU) never
     happens.  Voxelizer + VFE + scatter fused, nothing ragged ever
     exists.

Deviation from spconv (documented): no max_voxels cap — the dense grid
holds every non-empty pillar, so points the reference would drop once its
32k/70k voxel budget fills are kept here.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _shifted(x, s: int, fill):
    """x shifted DOWN by s (x[i] -> x[i-s]), front-filled with ``fill``."""
    pad = jnp.full((s, *x.shape[1:]), fill, x.dtype)
    return jnp.concatenate([pad, x[:-s]], axis=0)


def segmented_scan(vals, seg_id, steps: int, op, identity):
    """Inclusive Hillis–Steele scan of ``op`` within consecutive runs of
    equal ``seg_id`` (the TPU-friendly replacement for a segment op on
    sorted ids: ``steps`` log-shift passes of pure VPU compare/selects).

    vals: (P, C); seg_id: (P,) — after the scan the LAST element of each
    run holds the run's reduction.  ``steps`` must satisfy
    2**steps >= max run length."""
    fill = jnp.asarray(-1, seg_id.dtype)
    for k in range(steps):
        s = 1 << k
        same = (seg_id == _shifted(seg_id, s, fill))[:, None]
        prev = _shifted(vals, s, identity)
        vals = jnp.where(same, op(vals, prev), vals)
    return vals


def segmented_run_totals(vals, seg_id, steps: int, op, identity):
    """Every element receives its full run's ``op``-reduction: inclusive
    forward scan combined with an exclusive backward scan."""
    fwd = segmented_scan(vals, seg_id, steps, op, identity)
    bwd_inc = segmented_scan(vals[::-1], seg_id[::-1], steps, op,
                             identity)[::-1]
    # exclusive backward = inclusive backward of the NEXT element (when
    # the next element is still in the same run)
    same_next = jnp.concatenate(
        [seg_id[1:] == seg_id[:-1], jnp.zeros((1,), bool)])[:, None]
    nxt = jnp.concatenate([bwd_inc[1:], bwd_inc[:1]])
    bwd_exc = jnp.where(same_next, nxt, jnp.asarray(identity, vals.dtype))
    return op(fwd, bwd_exc)


def scan_steps(max_run: int | None, p: int) -> int:
    return max(1, math.ceil(math.log2(max(2, min(max_run or p, p)))))


@partial(jax.jit, static_argnames=("grid_size", "max_points_per_pillar",
                                   "enforce_cap"))
def pillarize(points, points_mask, voxel_size, pc_range, grid_size,
              max_points_per_pillar: int = 32, enforce_cap: bool = True):
    """Assign points to pillars and compute pillar statistics.

    Parameters
    ----------
    points : (P, 4) or (N, P, 4) padded xyz+intensity.  With a leading
        cloud axis, pillar ids are globally offset by cloud index so the
        whole fleet shares ONE set of segment ops (no vmap, no loop).
    points_mask : (P,) / (N, P) 1.0 for real points.
    voxel_size : (3,) [vx, vy, vz].
    pc_range : (6,) [x0, y0, z0, x1, y1, z1].
    grid_size : static (nx, ny) pillar grid extents.

    Returns dict with flat per-point ``pillar_id`` ((N*P,), global;
    N*nx*ny = overflow), ``keep`` ((N*P,) bool, in-range and under the
    per-pillar cap), ``mean_xyz`` ((N*P, 3) cluster mean of the point's
    pillar), ``center_offset`` ((N*P, 3) offset from the pillar center),
    ``num_clouds``, and per-pillar ``count`` ((N*nx*ny,)).
    """
    nx, ny = grid_size[0], grid_size[1]
    nz = grid_size[2] if len(grid_size) > 2 else 1
    if points.ndim == 3:
        n_clouds, pts_per = points.shape[:2]
        cloud_idx = jnp.repeat(jnp.arange(n_clouds, dtype=jnp.int32),
                               pts_per)
        points = points.reshape(-1, points.shape[-1])
        points_mask = points_mask.reshape(-1)
    else:
        n_clouds = 1
        cloud_idx = jnp.zeros((points.shape[0],), jnp.int32)

    num_pillars = n_clouds * nx * ny * nz
    voxel_size = jnp.asarray(voxel_size, jnp.float32)
    pc_range = jnp.asarray(pc_range, jnp.float32)

    xyz = points[:, :3]
    gi = jnp.floor((xyz - pc_range[:3]) / voxel_size).astype(jnp.int32)
    in_range = (
        (gi[:, 0] >= 0) & (gi[:, 0] < nx)
        & (gi[:, 1] >= 0) & (gi[:, 1] < ny)
        & (gi[:, 2] >= 0) & (gi[:, 2] < nz)
        & (points_mask > 0)
    )
    pid = jnp.where(
        in_range,
        ((cloud_idx * nz + gi[:, 2]) * ny + gi[:, 1]) * nx + gi[:, 0],
        num_pillars,
    )

    if enforce_cap:
        # Sort points by pillar id once (stable: preserves within-pillar
        # input order for the spconv-parity cap).  Everything downstream
        # stays sorted so segment ops and the scatter get sorted-indices
        # fast paths.  TPU row-gathers cost per ROW, not per byte — so
        # gather ONE packed (points | mask) array and recompute gi /
        # in_range from it (bit-identical floor math, pure VPU) instead
        # of three separate gathers (~0.3 ms each at 60k rows).
        order = jnp.argsort(pid, stable=True)
        sorted_pid = pid[order]
        packed = jnp.concatenate(
            [points, points_mask.astype(points.dtype)[:, None]], axis=1)
        packed_s = packed[order]
        points_s = packed_s[:, :points.shape[1]]
        mask_s = packed_s[:, points.shape[1]]
        gi_s = jnp.floor(
            (points_s[:, :3] - pc_range[:3]) / voxel_size
        ).astype(jnp.int32)
        in_range_s = (
            (gi_s[:, 0] >= 0) & (gi_s[:, 0] < nx)
            & (gi_s[:, 1] >= 0) & (gi_s[:, 1] < ny)
            & (gi_s[:, 2] >= 0) & (gi_s[:, 2] < nz)
            & (mask_s > 0)
        )

        p = pid.shape[0]
        is_new = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_pid[1:] != sorted_pid[:-1]]
        )
        idx = jnp.arange(p)
        seg_start = jax.lax.associative_scan(jnp.maximum,
                                             jnp.where(is_new, idx, 0))
        rank_sorted = idx - seg_start
        keep = in_range_s & (rank_sorted < max_points_per_pillar)
        sorted_hint = True
    else:
        # cap-free fast path: no global sort; every in-range point
        # participates (a quality superset of the spconv behavior)
        sorted_pid = pid
        points_s = points
        gi_s = gi
        keep = in_range
        order = None
        sorted_hint = False

    keep_f = keep.astype(jnp.float32)
    xyz_s = points_s[:, :3]
    p = sorted_pid.shape[0]

    if sorted_hint:
        # Per-pillar statistics WITHOUT scattering into the dense grid:
        # kept points of a pillar are consecutive (sorted + cap keeps the
        # first K), so log-shift segmented scans over the point array
        # compute per-point cluster sums/counts on the VPU.  No dense
        # segment op anywhere — the dense grid only materializes in
        # scatter_max_to_bev's compaction + expansion.
        steps = scan_steps(max_points_per_pillar if enforce_cap else None,
                           p)
        pid2 = jnp.where(keep, sorted_pid, -1)
        vals = jnp.concatenate([xyz_s * keep_f[:, None], keep_f[:, None]],
                               axis=1)
        tot = segmented_run_totals(vals, pid2, steps, jnp.add, 0.0)
        count_pt = tot[:, 3]
        mean_xyz = tot[:, :3] / jnp.maximum(count_pt[:, None], 1.0)
    else:
        count = jax.ops.segment_sum(keep_f, sorted_pid,
                                    num_segments=num_pillars + 1,
                                    indices_are_sorted=False)
        sums = jax.ops.segment_sum(xyz_s * keep_f[:, None], sorted_pid,
                                   num_segments=num_pillars + 1,
                                   indices_are_sorted=False)
        mean_per_pillar = sums / jnp.maximum(count[:, None], 1.0)
        mean_xyz = mean_per_pillar[sorted_pid]
        count_pt = count[sorted_pid]

    del order
    centers = (gi_s.astype(jnp.float32) + 0.5) * voxel_size + pc_range[:3]
    return {
        "points": points_s,
        "pillar_id": sorted_pid,
        "keep": keep,
        "mean_xyz": mean_xyz,
        "center_offset": xyz_s - centers,
        "count_per_point": count_pt,
        "num_clouds": n_clouds,
    }


def pillar_point_features(pillar_info, use_absolute_xyz: bool = True,
                          with_distance: bool = False):
    """Per-point 10-dim (or 7/11-dim) pillar features (pillar-sorted order).

    [xyz, intensity, xyz - cluster_mean, xyz - pillar_center(, |xyz|)],
    zeroed for dropped points — matching the PFN input layout (reference:
    opencood/models/sub_modules/pillar_vfe.py:105-143).
    """
    points = pillar_info["points"]
    xyz = points[:, :3]
    f_cluster = xyz - pillar_info["mean_xyz"]
    f_center = pillar_info["center_offset"]
    feats = [points if use_absolute_xyz else points[:, 3:],
             f_cluster, f_center]
    if with_distance:
        feats.append(jnp.linalg.norm(xyz, axis=1, keepdims=True))
    out = jnp.concatenate(feats, axis=1)
    return out * pillar_info["keep"][:, None].astype(out.dtype)


def scatter_max_to_bev(point_features, pillar_id, keep, grid_size,
                       num_clouds: int = 1, sorted_ids: bool = True,
                       max_run: int | None = None,
                       use_expand_kernel: bool = False,
                       use_scan_kernel: bool = False):
    """Max-pool per-point features into the dense BEV grid.

    point_features: (P, C) flat over all clouds; returns
    (num_clouds, ny, nx, C), or (num_clouds, nz, ny, nx, C) for a 3-axis
    grid.  Empty cells are 0 (identical to the reference's
    zero-initialized scatter since the PFN output is post-ReLU, i.e.
    non-negative).

    With sorted ids the wide multi-channel scatter never happens: a
    segmented max-scan leaves each pillar's reduction at its last kept
    point, one scalar ``segment_max`` of point indices locates those
    points, and the dense grid is a row-contiguous gather.  (An
    alternative scatter-free path — compaction + the block-local
    one-hot expansion kernel in ops/expand.py — is available via
    ``use_expand_kernel``; measured slower than the gather on v5e at
    production shapes, kept for larger-C workloads.)
    """
    nx, ny = grid_size[0], grid_size[1]
    nz = grid_size[2] if len(grid_size) > 2 else 1
    num_pillars = num_clouds * nx * ny * nz
    p = point_features.shape[0]

    if not sorted_ids:
        neg = jnp.where(keep[:, None], point_features,
                        jnp.full_like(point_features, -jnp.inf))
        dense = jax.ops.segment_max(neg, pillar_id,
                                    num_segments=num_pillars + 1,
                                    indices_are_sorted=False)
        dense = jnp.where(jnp.isfinite(dense), dense, 0.0)[:-1]
    else:
        steps = scan_steps(max_run, p)
        pid2 = jnp.where(keep, pillar_id, -1)
        c = point_features.shape[-1]
        block = 0
        if (use_scan_kernel and jax.default_backend() == "tpu"
                and c % 8 == 0):
            from .segscan import pick_block_rows

            block = pick_block_rows(p)
        if block >= 512:
            # one-pass Pallas scan (ops/segscan.py, oracle-pinned in
            # tests/test_segscan.py).  EXPERIMENT, off by default:
            # measured 6.51 ms vs 6.27 ms for the XLA log-shift scan at
            # production shapes — the scan is latency- not bandwidth-
            # bound there (XLA already fuses the 5 passes with the
            # upstream PFN elementwise work), so the single-pass win
            # never materializes.  Kept for larger-C workloads.
            from .segscan import segmented_max_scan_tpu

            scanned = segmented_max_scan_tpu(point_features, pid2,
                                             steps, block)
        else:
            scanned = segmented_scan(point_features, pid2, steps,
                                     jnp.maximum,
                                     jnp.asarray(-jnp.inf,
                                                 point_features.dtype))
        scanned = scanned * keep[:, None].astype(scanned.dtype)
        if use_expand_kernel:
            from .expand import (
                BLOCK,
                expand_rows_to_dense,
                expand_rows_to_dense_v2,
                expand_rows_to_dense_xla,
            )

            # compact: one row per non-empty pillar, in cell order
            nxt = jnp.concatenate(
                [pid2[1:], jnp.full((1,), -1, pid2.dtype)])
            is_last = keep & (pid2 != nxt)
            nz_idx = jnp.nonzero(is_last, size=p, fill_value=p - 1)[0]
            comp = jnp.take(scanned, nz_idx, axis=0)
            n_nz = jnp.sum(is_last.astype(jnp.int32))
            comp_ids = jnp.where(
                jnp.arange(p, dtype=jnp.int32) < n_nz,
                jnp.take(pillar_id, nz_idx).astype(jnp.int32),
                jnp.int32(num_pillars))
            if (jax.default_backend() == "tpu"
                    and num_pillars % BLOCK == 0):
                fn = (expand_rows_to_dense_v2
                      if use_expand_kernel == "v2"
                      else expand_rows_to_dense)
                dense = fn(comp, comp_ids, num_pillars)
            else:
                dense = expand_rows_to_dense_xla(comp, comp_ids,
                                                 num_pillars)
        else:
            iota = jnp.arange(1, p + 1, dtype=jnp.int32)
            last_kept = jax.ops.segment_max(
                jnp.where(keep, iota, 0), pillar_id,
                num_segments=num_pillars + 1,
                indices_are_sorted=True)[:-1]
            feat = jnp.take(scanned, jnp.maximum(last_kept - 1, 0),
                            axis=0)
            dense = jnp.where((last_kept > 0)[:, None], feat,
                              jnp.zeros((), point_features.dtype))

    if nz > 1:
        return dense.reshape(num_clouds, nz, ny, nx, -1)
    return dense.reshape(num_clouds, ny, nx, -1)
