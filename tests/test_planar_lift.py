"""PlanarLift cross-attention: geometric sanity + lift-mode parity.

The homography-warp lift must place image evidence at the right BEV
cells: a pinhole camera looking along +x sees a ground marker at
(d, 0); the warped hypothesis maps it near BEV cell x=d, y=0.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmvit_tpu.models.bevformer import (
    PlanarLiftCrossAttention,
    lidar2img,
)


def pinhole(img, yaw_deg=0.0, height=1.9):
    """OPV2V-style camera: intrinsic + cam->lidar extrinsic (UE4 axes:
    x fwd, y right, z up; camera at (0, 0, height) looking along yaw)."""
    f = img / 2.0
    k = np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1.0]])
    yaw = np.radians(yaw_deg)
    c, s = np.cos(yaw), np.sin(yaw)
    ext = np.eye(4)
    ext[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    ext[:3, 3] = [0.0, 0.0, height]
    return k.astype(np.float32), ext.astype(np.float32)


@pytest.mark.slow
def test_ground_marker_lands_at_correct_bev_cell():
    img, fdim = 64, 64
    bev, rng_half = 32, 16.0  # 1 m cells
    k, ext = pinhole(img)
    intr = jnp.asarray(k)[None, None]
    extr = jnp.asarray(ext)[None, None]
    proj = lidar2img(intr, extr)  # (1, 1, 3, 4)

    # marker at ground point (8, 0, -1.9+0=z0...) project z=-1.9 plane?
    # use z plane -1.9 (ground relative to the lidar at camera height)
    z_values = jnp.asarray([-1.9])
    d = 8.0
    uvw = np.asarray(proj)[0, 0] @ np.array([d, 0.0, -1.9, 1.0])
    u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
    assert 0 <= u < img and 0 <= v < img

    feats = np.zeros((1, 1, fdim, fdim, 8), np.float32)
    uf, vf = int(round(u * fdim / img)), int(round(v * fdim / img))
    # a blob, not an impulse: point resampling of a single pixel can
    # alias away under minification
    feats[0, 0, vf - 2: vf + 3, uf - 2: uf + 3, :] = 10.0

    mod = PlanarLiftCrossAttention(dim=8, z_points=1)
    q = jnp.zeros((1, bev, bev, 8))
    params = mod.init(jax.random.key(0), q, jnp.asarray(feats), proj,
                      rng_half, z_values, (img, img))
    # identity value/out projections isolate the geometry (the value
    # projection is bias-free so it commutes past the linear warp)
    p = dict(params["params"])
    eye = jnp.eye(8)
    p["value"] = {"kernel": eye}
    p["out"] = {"kernel": eye, "bias": jnp.zeros(8)}
    out = np.asarray(mod.apply({"params": p}, q, jnp.asarray(feats),
                               proj, rng_half, z_values, (img, img)))

    mag = np.abs(out[0]).sum(-1)
    iy, ix = np.unravel_index(mag.argmax(), mag.shape)
    # BEV cell of (x=8, y=0): x' = (x + R - step/2)/step = (8+16-0.5)/1
    ex = (d + rng_half) / (2 * rng_half / bev) - 0.5
    ey = (0.0 + rng_half) / (2 * rng_half / bev) - 0.5
    assert abs(ix - ex) <= 1.5, (ix, ex)
    assert abs(iy - ey) <= 1.5, (iy, ey)
    # cells behind the camera see nothing from this forward camera
    assert mag[:, : bev // 2 - 2].max() < 1e-4


@pytest.mark.slow
def test_lift_modes_share_interface():
    from hmvit_tpu.models.bevformer import BEVFormerEncoder

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 3))
                       .astype(np.float32))
    k, ext = pinhole(32)
    intr = jnp.asarray(np.stack([k, k])[None])
    extr = jnp.asarray(np.stack([ext, ext])[None])
    for lift in ("planar", "deformable"):
        cfg = {"encoder": "bevformer", "lift": lift, "dim": 16,
               "bev_size": 8, "out_dim": 24, "num_layers": 1,
               "heads": 2, "window": 4, "decoder_layers": 0,
               "encoder_channels": [8, 8, 16, 16]}
        mod = BEVFormerEncoder(cfg)
        v = mod.init(jax.random.key(0), imgs, intr, extr, train=False)
        out = mod.apply(v, imgs, intr, extr, train=False)
        assert out.shape[0] == 1 and out.shape[-1] == 24
        assert np.isfinite(np.asarray(out)).all(), lift
