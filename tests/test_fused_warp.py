"""Pallas fused pair-warp kernel vs the XLA type-gather + MXU warp
oracle (interpret mode), over rotations incl. near-90-degree (the
conditioning-swap branch), large translations, and map-edge clipping."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmvit_tpu.ops.fused_warp import pair_warp_xla, pallas_pair_warp

pytestmark = pytest.mark.compile  # compile-heavy: full lane only

B, L, H, W, CK = 1, 3, 64, 64, 128


def rigid_pairwise(rng, b=B, l=L, max_t=8.0):
    ang = rng.uniform(-np.pi, np.pi, (b, l))
    pos = rng.uniform(-max_t, max_t, (b, l, 2))
    m = np.tile(np.eye(4, dtype=np.float64), (b, l, 1, 1))
    m[:, :, 0, 0] = np.cos(ang)
    m[:, :, 0, 1] = -np.sin(ang)
    m[:, :, 1, 0] = np.sin(ang)
    m[:, :, 1, 1] = np.cos(ang)
    m[:, :, :2, 3] = pos
    minv = np.linalg.inv(m)
    return np.einsum("bixy,bjyz->bjixz", minv, m).astype(np.float32)


@pytest.mark.parametrize("variant", ["tile", "resident"])
@pytest.mark.parametrize("seed,max_t", [(0, 5.0), (1, 20.0), (2, 2.0)])
def test_kernel_matches_xla_oracle(seed, max_t, variant):
    rng = np.random.default_rng(seed)
    src = jnp.asarray(rng.normal(size=(B, 2, L, H, W, CK))
                      .astype(np.float32))
    pair = jnp.asarray(rigid_pairwise(rng, max_t=max_t))
    mode = jnp.asarray(rng.integers(0, 2, (B, L)))
    want = np.asarray(pair_warp_xla(src, pair, mode, 1.0, 1.0))
    got = np.asarray(pallas_pair_warp(src, pair, mode, 1.0, 1.0,
                                      interpret=True, variant=variant))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_kernel_exact_angles_and_identity():
    """Axis-aligned angles exercise both swap branches exactly."""
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.normal(size=(B, 2, 4, H, W, CK))
                      .astype(np.float32))
    m = np.tile(np.eye(4, dtype=np.float64), (1, 4, 1, 1))
    for i, ang in enumerate([0.0, np.pi / 2, np.pi, -np.pi / 2]):
        c, s = np.cos(ang), np.sin(ang)
        m[0, i, :2, :2] = [[c, -s], [s, c]]
        m[0, i, :2, 3] = [3.0 * i, -2.0 * i]
    minv = np.linalg.inv(m)
    pair = jnp.asarray(
        np.einsum("bixy,bjyz->bjixz", minv, m).astype(np.float32))
    mode = jnp.asarray([[0, 1, 1, 0]])
    want = np.asarray(pair_warp_xla(src, pair, mode, 1.0, 1.0))
    got = np.asarray(pallas_pair_warp(src, pair, mode, 1.0, 1.0,
                                      interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
    # identity diagonal: receiver i, sender i must be the src itself
    for i in range(4):
        np.testing.assert_allclose(
            got[0, i, i], np.asarray(src[0, mode[0, i], i]), atol=2e-4)


def test_kernel_receiver_subset():
    """num_receivers=1 (the ego-only final fusion phase) must equal the
    full warp's first receiver row, in both the kernel and the oracle."""
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.normal(size=(B, 2, L, H, W, CK))
                      .astype(np.float32))
    pair = rigid_pairwise(rng)
    mode = jnp.asarray(rng.integers(0, 2, (B, L)))

    full = np.asarray(pallas_pair_warp(src, pair, mode, 0.4, 2.0,
                                       interpret=True))
    ego = np.asarray(pallas_pair_warp(src, pair, mode, 0.4, 2.0,
                                      interpret=True, num_receivers=1))
    assert ego.shape == (B, 1, L, H, W, CK)
    np.testing.assert_allclose(ego, full[:, :1], atol=1e-5)

    ego_xla = np.asarray(pair_warp_xla(src, pair, mode, 0.4, 2.0,
                                       num_receivers=1))
    full_xla = np.asarray(pair_warp_xla(src, pair, mode, 0.4, 2.0))
    np.testing.assert_allclose(ego_xla, full_xla[:, :1], atol=1e-5)


def test_kernel_large_map():
    """Large maps (128^2, 256 ch) at the production 32/56 tiling: many
    tiles per map + multi-chunk DMA plumbing must match the XLA oracle.
    (A 64/104 channel-chunked tiling was measured and dropped — see
    ops/fused_warp.py::_tiling — so this covers the one real path.)"""
    rng = np.random.default_rng(7)
    l2, h2, ck2 = 2, 128, 256
    src = jnp.asarray(rng.normal(size=(1, 2, l2, h2, h2, ck2))
                      .astype(np.float32))
    pair = rigid_pairwise(rng, l=l2, max_t=20.0)
    mode = jnp.asarray([[0, 1]])
    want = np.asarray(pair_warp_xla(src, pair, mode, 0.4, 4.0))
    got = np.asarray(pallas_pair_warp(src, pair, mode, 0.4, 4.0,
                                      interpret=True, variant="tile"))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
    # resident-map variant: same tiles computed from a whole-map VMEM
    # fetch per pair must be BIT-identical to the per-tile fetches
    res = np.asarray(pallas_pair_warp(src, pair, mode, 0.4, 4.0,
                                      interpret=True, variant="resident"))
    np.testing.assert_array_equal(res, got)


def test_kernel_roi_tile_skip():
    """Tiles whose source support misses the sender's map are skipped
    (no fetch, no matmuls) and must come out EXACTLY zero — identical
    to what the hat weights produce.  Covers partial overlap (40 of 64
    cells) and fully disjoint maps (translation >> map extent)."""
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.normal(size=(B, 2, 3, H, W, CK))
                      .astype(np.float32))
    m = np.tile(np.eye(4, dtype=np.float64), (1, 3, 1, 1))
    m[0, 1, :2, 3] = [40.0, -40.0]     # partial overlap
    m[0, 2, :2, 3] = [200.0, 200.0]    # fully disjoint
    minv = np.linalg.inv(m)
    pair = jnp.asarray(
        np.einsum("bixy,bjyz->bjixz", minv, m).astype(np.float32))
    mode = jnp.asarray([[0, 1, 0]])
    want = np.asarray(pair_warp_xla(src, pair, mode, 1.0, 1.0))
    got = np.asarray(pallas_pair_warp(src, pair, mode, 1.0, 1.0,
                                      interpret=True, variant="tile"))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
    # resident variant: the fully-disjoint pair takes the WHOLE-PAIR
    # fetch skip (pvalid=0) and must still be bit-identical
    res = np.asarray(pallas_pair_warp(src, pair, mode, 1.0, 1.0,
                                      interpret=True, variant="resident"))
    np.testing.assert_array_equal(res, got)
    # receiver 0 <- sender 2: disjoint, every tile skipped -> all zero
    assert np.all(got[0, 0, 2] == 0.0)
    # receiver 0 <- sender 1: the far corner quadrant is out of support
    assert np.all(got[0, 0, 1][:16, :16] == 0.0)
    assert np.abs(got[0, 0, 1]).max() > 0.0
