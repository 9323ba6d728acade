"""Pillarization (sorted-order contract): assignment, cap, stats, scatter."""
import numpy as np
import jax.numpy as jnp

import pytest

from hmvit_tpu.ops.voxelize import (
    pillar_point_features,
    pillarize,
    scatter_max_to_bev,
)

VOXEL = (0.4, 0.4, 4.0)
RANGE = (-102.4, -102.4, -3.0, 102.4, 102.4, 1.0)
GRID = (512, 512)


def pad_points(pts, p=256):
    out = np.zeros((p, 4), np.float32)
    out[: len(pts)] = pts
    mask = np.zeros(p, np.float32)
    mask[: len(pts)] = 1
    return out, mask


def find_rows(sorted_pts, originals):
    """Indices of original points inside the sorted array."""
    idxs = []
    for o in originals:
        d = np.abs(sorted_pts - o).sum(1)
        idxs.append(int(d.argmin()))
        assert d.min() < 1e-5
    return idxs


def test_pillar_assignment_and_count():
    pts = np.array(
        [
            [0.1, 0.1, 0.0, 0.5],    # pillar (256, 256)
            [0.3, 0.1, 0.0, 0.7],    # same pillar
            [0.5, 0.1, 0.0, 0.9],    # next pillar in x
            [-200.0, 0.0, 0.0, 0.5],  # out of range
            [0.0, 0.0, 5.0, 0.5],    # z out of range
        ],
        np.float32,
    )
    points, mask = pad_points(pts)
    info = pillarize(jnp.asarray(points), jnp.asarray(mask), VOXEL, RANGE,
                     GRID)
    pid = np.asarray(info["pillar_id"])
    keep = np.asarray(info["keep"])
    sorted_pts = np.asarray(info["points"])

    assert keep.sum() == 3  # two out-of-range dropped, padding dropped
    # the sorted ids are non-decreasing
    assert np.all(np.diff(pid) >= 0)
    i0, i1, i2 = find_rows(sorted_pts, pts[:3])
    assert pid[i0] == pid[i1] != pid[i2]
    assert pid[i0] == 256 * 512 + 256
    count = np.asarray(info["count_per_point"])
    assert count[i0] == 2 and count[i1] == 2 and count[i2] == 1
    assert count[~keep].sum() == 0


def test_per_pillar_cap_keeps_first_k():
    # 40 points in one pillar; cap 32 keeps the first 32 in input order
    pts = np.tile(np.array([[0.05, 0.05, 0.0, 0.0]], np.float32), (40, 1))
    pts[:, 3] = np.arange(40)  # tag by intensity
    points, mask = pad_points(pts)
    info = pillarize(jnp.asarray(points), jnp.asarray(mask), VOXEL, RANGE,
                     GRID, max_points_per_pillar=32)
    keep = np.asarray(info["keep"])
    kept_tags = np.asarray(info["points"])[keep][:, 3]
    assert keep.sum() == 32
    # stable sort keeps input order within the pillar -> tags 0..31
    assert set(kept_tags.astype(int)) == set(range(32))
    assert np.all(np.asarray(info["count_per_point"])[keep] == 32)
    # dropped (over-cap) points do not receive run totals
    over_cap = (~keep) & (np.asarray(info["pillar_id"]) < 512 * 512)
    assert np.all(np.asarray(info["count_per_point"])[over_cap] == 0)


def test_cluster_mean_and_center_offsets():
    pts = np.array(
        [[0.1, 0.1, -1.0, 0.25], [0.3, 0.3, 0.0, 0.75]], np.float32
    )
    points, mask = pad_points(pts)
    info = pillarize(jnp.asarray(points), jnp.asarray(mask), VOXEL, RANGE,
                     GRID)
    sorted_pts = np.asarray(info["points"])
    i0, i1 = find_rows(sorted_pts, pts)
    mean = np.asarray(info["mean_xyz"])
    np.testing.assert_allclose(mean[[i0, i1]], [[0.2, 0.2, -0.5]] * 2,
                               atol=1e-6)
    off = np.asarray(info["center_offset"])
    np.testing.assert_allclose(off[i0], [-0.1, -0.1, 0.0], atol=1e-5)
    np.testing.assert_allclose(off[i1], [0.1, 0.1, 1.0], atol=1e-5)

    feats = np.asarray(pillar_point_features(info))
    assert feats.shape == (256, 10)
    np.testing.assert_allclose(feats[i0, 4:7], [-0.1, -0.1, -0.5],
                               atol=1e-5)
    drop = ~np.asarray(info["keep"])
    np.testing.assert_allclose(feats[drop], 0.0)  # padding zeroed


def test_scatter_max_places_features():
    pts = np.array(
        [[0.1, 0.1, 0.0, 1.0], [0.1, 0.1, 0.0, 3.0], [10.0, -5.0, 0.0, 7.0]],
        np.float32,
    )
    points, mask = pad_points(pts)
    info = pillarize(jnp.asarray(points), jnp.asarray(mask), VOXEL, RANGE,
                     GRID)
    feats = info["points"]  # raw sorted points as "features" (C=4)
    bev = np.asarray(
        scatter_max_to_bev(feats, info["pillar_id"], info["keep"], GRID)
    )[0]
    assert bev.shape == (512, 512, 4)
    assert bev[256, 256, 3] == 3.0
    yi = int(np.floor((-5.0 + 102.4) / 0.4))
    xi = int(np.floor((10.0 + 102.4) / 0.4))
    assert bev[yi, xi, 3] == 7.0
    assert np.count_nonzero(bev[..., 3]) == 2


@pytest.mark.compile
def test_scan_scatter_matches_segment_max_oracle():
    """The scan+gather dense path == jax.ops.segment_max, randomized."""
    import jax

    rng = np.random.default_rng(7)
    grid = (32, 32)
    pts = rng.uniform(-6.3, 6.3, size=(2, 500, 3)).astype(np.float32)
    pts = np.concatenate([pts, rng.random((2, 500, 1), np.float32)], -1)
    mask = (rng.random((2, 500)) > 0.1).astype(np.float32)
    info = pillarize(jnp.asarray(pts), jnp.asarray(mask), VOXEL,
                     (-6.4, -6.4, -3.0, 6.4, 6.4, 1.0), grid,
                     max_points_per_pillar=8)
    feats = jax.random.normal(jax.random.key(0),
                              (info["points"].shape[0], 16))
    got = np.asarray(scatter_max_to_bev(
        feats, info["pillar_id"], info["keep"], grid, 2, max_run=8))

    neg = jnp.where(info["keep"][:, None], feats, -jnp.inf)
    oracle = jax.ops.segment_max(neg, info["pillar_id"],
                                 num_segments=2 * 32 * 32 + 1)
    oracle = np.asarray(
        jnp.where(jnp.isfinite(oracle), oracle, 0.0))[:-1].reshape(
            2, 32, 32, 16)
    np.testing.assert_allclose(got, oracle, atol=1e-6)

    # per-point mean stats against a numpy oracle
    pid = np.asarray(info["pillar_id"])
    keep = np.asarray(info["keep"])
    mean = np.asarray(info["mean_xyz"])
    cnt = np.asarray(info["count_per_point"])
    spts = np.asarray(info["points"])
    for i in np.flatnonzero(keep)[::37]:
        members = keep & (pid == pid[i])
        np.testing.assert_allclose(mean[i], spts[members, :3].mean(0),
                                   atol=1e-5)
        assert cnt[i] == members.sum()


def test_expand_kernel_matches_xla_twin():
    """Pallas expansion kernel vs the searchsorted+gather reference,
    interpret mode, including fully-empty and fully-dense blocks."""
    import jax
    from hmvit_tpu.ops.expand import (
        BLOCK,
        expand_rows_to_dense,
        expand_rows_to_dense_xla,
    )

    rng = np.random.default_rng(11)
    num_cells = 4 * BLOCK
    # dense run inside block 1, empty block 2, scattered elsewhere
    ids = np.unique(np.concatenate([
        rng.integers(0, BLOCK, 60),
        np.arange(BLOCK, 2 * BLOCK),              # fully dense block
        rng.integers(3 * BLOCK, 4 * BLOCK, 40),
    ])).astype(np.int32)
    m = len(ids)
    comp = rng.normal(size=(m, 64)).astype(np.float32)
    want = np.asarray(expand_rows_to_dense_xla(
        jnp.asarray(comp), jnp.asarray(ids), num_cells))
    got = np.asarray(expand_rows_to_dense(
        jnp.asarray(comp), jnp.asarray(ids), num_cells, interpret=True))
    np.testing.assert_allclose(got, want, atol=0)
    # spot semantics: placed rows and zero elsewhere
    assert np.all(got[ids] == comp)
    empty = np.setdiff1d(np.arange(num_cells), ids)
    assert np.all(got[empty] == 0)


@pytest.mark.compile
def test_expand_v2_kernel_matches_xla_twin():
    """Demand-sized-DMA expansion (v2) vs the searchsorted+gather
    reference, interpret mode: empty blocks, a fully-dense block, a
    block-boundary-straddling run, and bf16."""
    from hmvit_tpu.ops.expand import (
        BLOCK,
        expand_rows_to_dense_v2,
        expand_rows_to_dense_xla,
    )

    rng = np.random.default_rng(13)
    num_cells = 4 * BLOCK
    ids = np.unique(np.concatenate([
        rng.integers(0, BLOCK, 60),
        np.arange(BLOCK, 2 * BLOCK),               # fully dense block
        np.arange(3 * BLOCK - 70, 3 * BLOCK + 70),  # boundary straddle
    ])).astype(np.int32)
    m = len(ids)
    for dtype in (np.float32, jnp.bfloat16):
        comp = jnp.asarray(
            rng.normal(size=(m, 64)).astype(np.float32)).astype(dtype)
        want = np.asarray(expand_rows_to_dense_xla(
            comp, jnp.asarray(ids), num_cells).astype(jnp.float32))
        got = np.asarray(expand_rows_to_dense_v2(
            comp, jnp.asarray(ids), num_cells,
            interpret=True).astype(jnp.float32))
        np.testing.assert_allclose(got, want, atol=0)
    empty = np.setdiff1d(np.arange(num_cells), ids)
    assert np.all(got[empty] == 0)
