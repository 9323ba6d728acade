"""Separable projective warp vs the gather oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmvit_tpu.ops.projective_warp import (
    warp_projective_gather,
    warp_projective_mxu,
)


def smooth_map(rng, n, h, w, c):
    base = rng.normal(size=(n, h // 4, w // 4, c)).astype(np.float32)
    return np.asarray(jax.image.resize(jnp.asarray(base), (n, h, w, c),
                                       "linear"))


@pytest.mark.compile
def test_affine_case_matches_gather_exactly():
    """With h20=h21=0 the homography is affine — both paths sample the
    same bilinear surface on straight axis-parallel paths."""
    rng = np.random.default_rng(0)
    src = jnp.asarray(smooth_map(rng, 2, 32, 32, 8))
    h = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    h[0, 0, 2], h[0, 1, 2] = 3.25, -2.5          # translation
    h[1, 0, 0], h[1, 1, 1] = 0.8, 1.3            # scale
    got = warp_projective_mxu(src, jnp.asarray(h), (32, 32))
    want = warp_projective_gather(src, jnp.asarray(h), (32, 32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.compile
def test_90deg_swap_branch():
    rng = np.random.default_rng(1)
    src = jnp.asarray(smooth_map(rng, 1, 32, 32, 8))
    h = np.zeros((1, 3, 3), np.float32)
    h[0, 0, 1], h[0, 1, 0], h[0, 2, 2] = 1.0, -1.0, 1.0
    h[0, 1, 2] = 31.0  # keep in range
    got = warp_projective_mxu(src, jnp.asarray(h), (32, 32))
    want = warp_projective_gather(src, jnp.asarray(h), (32, 32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_camera_like_homographies(seed):
    """Ground-plane homographies from synthetic pinhole cameras: the
    2-pass result matches point sampling away from the horizon."""
    rng = np.random.default_rng(seed)
    n, s = 3, 48
    src = jnp.asarray(smooth_map(rng, n, s, s, 8))
    hs = []
    for _ in range(n):
        f = rng.uniform(30, 60)
        yaw = rng.uniform(-np.pi, np.pi)
        cam_h = rng.uniform(1.5, 2.5)
        k = np.array([[f, 0, s / 2], [0, f, s / 2], [0, 0, 1.0]])
        c, si = np.cos(yaw), np.sin(yaw)
        r = np.array([[c, -si, 0], [si, c, 0], [0, 0, 1.0]])
        # world ground plane -> camera (x right, y down, z fwd)
        flip = np.array([[0, 1, 0], [0, 0, -1], [1, 0, 0.0]])
        rt = flip @ r
        t = flip @ np.array([0.0, 0.0, -cam_h])
        # BEV pixel -> metric: 0.5 m cells centered, z = 0 plane
        a = np.array([[0.5, 0, -0.25 * s], [0, 0.5, -0.25 * s],
                      [0, 0, 1.0]])
        hmat = k @ np.concatenate([rt[:, :2], t[:, None]], 1) @ a
        hs.append(hmat)
    h = jnp.asarray(np.stack(hs).astype(np.float32))
    got = np.asarray(warp_projective_mxu(src, h, (s, s)))
    want = np.asarray(warp_projective_gather(src, h, (s, s)))
    # near-identical zero-sets (visibility) and close values; the
    # 2-pass interpolation differs from point samples at sub-pixel
    # level, concentrated on source-boundary pixels
    zero_mismatch = ((np.abs(got).sum(-1) > 0)
                     != (np.abs(want).sum(-1) > 0)).sum()
    assert zero_mismatch <= 3, zero_mismatch
    diff = np.abs(got - want)
    assert diff.max() < 0.25, diff.max()
    assert diff.mean() < 2e-3


def _camera_homographies(rng, n, k):
    """Plausible BEV->image homographies: perspective rows + rotation."""
    hs = []
    for _ in range(n * k):
        ang = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(ang), np.sin(ang)
        h = np.array([[c * 2.0, -s * 2.0, rng.uniform(-5, 5)],
                      [s * 2.0, c * 2.0, rng.uniform(-5, 5)],
                      [rng.uniform(-0.02, 0.02),
                       rng.uniform(-0.02, 0.02),
                       rng.uniform(0.8, 1.2)]], np.float32)
        hs.append(h)
    return np.stack(hs).reshape(n, k, 3, 3)


@pytest.mark.compile
def test_weighted_reduce_matches_per_hypothesis_warps():
    """warp_projective_reduce == sum_k w_k * warp_projective_mxu_k,
    including the shared-source (rep > 1) layout and fully-invisible
    pixels (zero weights)."""
    from hmvit_tpu.ops.projective_warp import warp_projective_reduce

    rng = np.random.default_rng(1)
    n, ks, rep, hs_, c = 2, 3, 2, 24, 8
    k = ks * rep
    dsize = (16, 16)
    src = jnp.asarray(smooth_map(rng, n * ks, hs_, hs_, c)).reshape(
        n, ks, hs_, hs_, c)
    h = jnp.asarray(_camera_homographies(rng, n, k))
    w = rng.uniform(0, 1, (n, k, *dsize)).astype(np.float32)
    w[:, :, :2] = 0.0  # fully-unweighted rows
    w = jnp.asarray(w)

    got = warp_projective_reduce(src, h, dsize, w)

    want = 0.0
    for kk in range(k):
        per = warp_projective_mxu(src[:, kk // rep], h[:, kk], dsize)
        want = want + w[:, kk, :, :, None] * per
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
