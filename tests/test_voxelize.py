"""Pillarization: assignment, cap semantics, stats, scatter."""
import numpy as np
import jax.numpy as jnp

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


def test_pillar_assignment_and_count():
    pts = np.array(
        [
            [0.1, 0.1, 0.0, 0.5],    # pillar (256+0, 256+0)
            [0.3, 0.1, 0.0, 0.5],    # same pillar
            [0.5, 0.1, 0.0, 0.5],    # next pillar in x
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
    assert pid[0] == pid[1] != pid[2]
    assert pid[0] == 256 * 512 + 256
    assert not keep[3] and not keep[4]
    assert keep[:3].all() and not keep[5:].any()
    count = np.asarray(info["count"])
    assert count[pid[0]] == 2 and count[pid[2]] == 1
    assert count.sum() == 3


def test_per_pillar_cap_keeps_first_k():
    # 40 points in one pillar; cap 32 keeps the first 32 in input order
    pts = np.tile(np.array([[0.05, 0.05, 0.0, 0.0]], np.float32), (40, 1))
    pts[:, 3] = np.arange(40)  # tag by intensity
    points, mask = pad_points(pts)
    info = pillarize(jnp.asarray(points), jnp.asarray(mask), VOXEL, RANGE,
                     GRID, max_points_per_pillar=32)
    keep = np.asarray(info["keep"])
    assert keep[:32].all() and not keep[32:40].any()
    assert np.asarray(info["count"])[np.asarray(info["pillar_id"])[0]] == 32


def test_cluster_mean_and_center_offsets():
    pts = np.array(
        [[0.1, 0.1, -1.0, 0.0], [0.3, 0.3, 0.0, 0.0]], np.float32
    )
    points, mask = pad_points(pts)
    info = pillarize(jnp.asarray(points), jnp.asarray(mask), VOXEL, RANGE,
                     GRID)
    mean = np.asarray(info["mean_xyz"])[:2]
    np.testing.assert_allclose(mean, [[0.2, 0.2, -0.5]] * 2, atol=1e-6)
    # pillar center of cell (256, 256) is (0.2, 0.2), z center -1.0
    off = np.asarray(info["center_offset"])[:2]
    np.testing.assert_allclose(off[0], [-0.1, -0.1, 0.0], atol=1e-5)
    np.testing.assert_allclose(off[1], [0.1, 0.1, 1.0], atol=1e-5)

    feats = np.asarray(
        pillar_point_features(jnp.asarray(points), info)
    )
    assert feats.shape == (256, 10)
    np.testing.assert_allclose(feats[0, 4:7], [-0.1, -0.1, -0.5], atol=1e-5)
    np.testing.assert_allclose(feats[2:], 0.0)  # padding zeroed


def test_scatter_max_places_features():
    pts = np.array(
        [[0.1, 0.1, 0.0, 1.0], [0.1, 0.1, 0.0, 3.0], [10.0, -5.0, 0.0, 7.0]],
        np.float32,
    )
    points, mask = pad_points(pts)
    info = pillarize(jnp.asarray(points), jnp.asarray(mask), VOXEL, RANGE,
                     GRID)
    feats = jnp.asarray(points)  # use raw points as "features" (C=4)
    bev = np.asarray(
        scatter_max_to_bev(feats, info["pillar_id"], info["keep"], GRID)
    )[0]
    assert bev.shape == (512, 512, 4)
    # pillar of first two points: max intensity 3
    assert bev[256, 256, 3] == 3.0
    yi = int(np.floor((-5.0 + 102.4) / 0.4))
    xi = int(np.floor((10.0 + 102.4) / 0.4))
    assert bev[yi, xi, 3] == 7.0
    assert np.count_nonzero(bev[..., 3]) == 2
