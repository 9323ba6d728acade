"""MXU separable warp vs the direct gather warp (oracle).

The 2-pass factorization samples the bilinear surface along slanted tap
lines, so on white-noise inputs it legitimately differs from the direct
4-tap warp by O(slant x local gradient); on smooth signals (real
features) both agree to interpolation accuracy.  Geometry (where content
lands) must always match.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hmvit_tpu.ops.shear_warp import warp_affine_mxu
from hmvit_tpu.ops.warp import centered_affine, warp_affine_nhwc


def make_transform(angle_deg, tx, ty):
    a = np.radians(angle_deg)
    return np.array(
        [[np.cos(a), -np.sin(a), tx], [np.sin(a), np.cos(a), ty]],
        dtype=np.float32,
    )[None]


def smooth_image(n=1, hw=32, c=4, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(hw), np.arange(hw), indexing="ij")
    img = np.zeros((n, hw, hw, c), np.float32)
    for i in range(c):
        fx, fy = rng.uniform(0.02, 0.07, 2)
        ph = rng.uniform(0, np.pi)
        img[..., i] = np.sin(2 * np.pi * (fx * xx + fy * yy) + ph)
    return img


# tolerance grows with the pass slant |tan(residual angle)| — the 2-pass
# samples the bilinear surface along slanted lines (see module docstring)
@pytest.mark.parametrize("angle,tx,ty,tol", [
    (0, 0, 0, 1e-5),
    (0, 7.25, -3.5, 1e-5),       # pure translation: exact
    (30, 5, -3, 0.15),
    (-75, -10.5, 2.2, 0.12),
    (90, 0, 0, 1e-4),            # axis-aligned rotation: exact
    (180, 2, 1, 1e-4),
    (135, -4, 6, 0.30),          # 45-degree residual: worst slant
    (-120, 3, 3, 0.18),
])
def test_matches_gather_warp_on_smooth_signal(angle, tx, ty, tol):
    src = smooth_image()
    m = make_transform(angle, tx, ty)
    t = centered_affine(jnp.asarray(m), (32, 32))

    want = np.asarray(warp_affine_nhwc(jnp.asarray(src), t, (32, 32)))
    got = np.asarray(warp_affine_mxu(jnp.asarray(src), t, (32, 32)))
    diff = np.abs(got - want)[:, 2:-2, 2:-2]
    assert diff.max() < tol, diff.max()


def test_noise_consistency_and_energy():
    """On noise the two warps must still agree strongly (correlation) and
    preserve in-ROI energy."""
    rng = np.random.default_rng(1)
    src = rng.normal(size=(6, 32, 32, 4)).astype(np.float32)
    ms = np.concatenate([
        make_transform(a, t, -t)
        for a, t in [(0, 0), (20, 3), (80, -2), (100, 1), (-170, 4),
                     (-45, 0)]
    ])
    t = centered_affine(jnp.asarray(ms), (32, 32))
    want = np.asarray(warp_affine_nhwc(jnp.asarray(src), t, (32, 32)))
    got = np.asarray(warp_affine_mxu(jnp.asarray(src), t, (32, 32)))
    for i in range(6):
        a, b = got[i].ravel(), want[i].ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.85, (i, corr)
        assert abs(a.std() - b.std()) < 0.15 * b.std() + 1e-3


def test_batched_mixed_angles_geometry():
    """A delta spike must land at the same place as the oracle for angles
    in every quadrant (exercises the predicated transpose)."""
    for angle in (0, 33, 90, 117, 180, -140, -60):
        src = np.zeros((1, 32, 32, 1), np.float32)
        src[0, 20, 9, 0] = 1.0
        t = centered_affine(jnp.asarray(make_transform(angle, 2.0, -1.0)),
                            (32, 32))
        want = np.asarray(warp_affine_nhwc(jnp.asarray(src), t, (32, 32)))
        got = np.asarray(warp_affine_mxu(jnp.asarray(src), t, (32, 32)))
        if want.max() < 0.1:  # spike warped out of frame
            assert got.max() < 0.2
            continue
        py, px = np.unravel_index(want[0, ..., 0].argmax(), (32, 32))
        gy, gx = np.unravel_index(got[0, ..., 0].argmax(), (32, 32))
        assert abs(int(py) - int(gy)) <= 1 and abs(int(px) - int(gx)) <= 1, \
            (angle, (py, px), (gy, gx))
        assert got.sum() == pytest.approx(want.sum(), rel=0.2)
