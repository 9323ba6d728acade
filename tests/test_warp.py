"""BEV warp parity against torch's affine_grid/grid_sample (CPU oracle)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def torch_warp(src, m, dsize, mode="bilinear"):
    """Reference semantics: center-pivot affine + align_corners grid sample."""
    import torch.nn.functional as F

    src_t = torch.from_numpy(src)
    m_t = torch.from_numpy(m).float()
    B, C, H, W = src.shape

    # centered affine (pivot on image center), then add translation
    center = torch.tensor([dsize[1] / 2, dsize[0] / 2]).unsqueeze(0)
    shift = torch.eye(3).unsqueeze(0).repeat(B, 1, 1)
    shift[:, :2, 2] = center
    shift_inv = torch.eye(3).unsqueeze(0).repeat(B, 1, 1)
    shift_inv[:, :2, 2] = -center
    rot = torch.eye(3).unsqueeze(0).repeat(B, 1, 1)
    rot[:, :2, :2] = m_t[:, :2, :2]
    T = (shift @ rot @ shift_inv)[:, :2, :]
    T[..., 2] += m_t[..., 2]

    M33 = torch.nn.functional.pad(T, [0, 0, 0, 1], value=0.0)
    M33[..., -1, -1] += 1.0

    def normal_transform(h, w):
        tr = torch.tensor([[1.0, 0, -1], [0, 1, -1], [0, 0, 1]])
        tr[0, 0] *= 2.0 / (w - 1)
        tr[1, 1] *= 2.0 / (h - 1)
        return tr.unsqueeze(0)

    src_norm = normal_transform(H, W)
    dst_norm = normal_transform(*dsize)
    dst_t_src = dst_norm @ (M33 @ torch.inverse(src_norm))
    theta = torch.inverse(dst_t_src)
    grid = F.affine_grid(theta[:, :2, :], [B, C, dsize[0], dsize[1]],
                         align_corners=True)
    return F.grid_sample(src_t, grid, align_corners=True, mode=mode,
                         padding_mode="zeros").numpy()


def make_transform(angle_deg, tx, ty):
    a = np.radians(angle_deg)
    return np.array(
        [[np.cos(a), -np.sin(a), tx], [np.sin(a), np.cos(a), ty]],
        dtype=np.float32,
    )[None]


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("angle,tx,ty", [(0, 0, 0), (30, 5, -3),
                                         (-75, -10.5, 2.2), (180, 0, 7)])
def test_warp_matches_torch(mode, angle, tx, ty):
    from hmvit_tpu.ops.warp import centered_affine, warp_affine
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    src = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    m = make_transform(angle, tx, ty)

    want = torch_warp(src, m, (32, 32), mode)
    t = centered_affine(jnp.asarray(m), (32, 32))
    got = np.asarray(warp_affine(jnp.asarray(src), t, (32, 32), mode))

    if mode == "nearest":
        # rounding ties may fall either way on exact half-pixels; compare
        # where both agree on the source pixel via a generous match rate
        match = np.isclose(got, want, atol=1e-5).mean()
        assert match > 0.97, match
    else:
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_warp_bev_identity_and_mask():
    import jax.numpy as jnp
    from hmvit_tpu.ops.warp import roi_and_agent_mask, warp_bev

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 4, 16, 16)).astype(np.float32)
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 3, 4, 4)).copy()
    out = np.asarray(warp_bev(jnp.asarray(x), jnp.asarray(eye), 0.4, 4))
    np.testing.assert_allclose(out, x, atol=1e-5)

    agent_mask = np.array([[1, 1, 0], [1, 0, 0]], np.float32)
    mask = np.asarray(
        roi_and_agent_mask(2, 3, 16, 16, jnp.asarray(agent_mask),
                           jnp.asarray(eye), 0.4, 4)
    )
    assert mask.shape == (2, 16, 16, 1, 3)
    np.testing.assert_allclose(mask[0, ..., 0, :2], 1.0)
    np.testing.assert_allclose(mask[0, ..., 0, 2], 0.0)
    np.testing.assert_allclose(mask[1, ..., 0, 1:], 0.0)


def test_warp_translation_shifts_content():
    """A pure +16-pixel x translation must move content right by 16 px."""
    import jax.numpy as jnp
    from hmvit_tpu.ops.warp import centered_affine, warp_affine

    src = np.zeros((1, 1, 32, 32), np.float32)
    src[0, 0, 10, 4] = 1.0
    m = make_transform(0, 16, 0)
    t = centered_affine(jnp.asarray(m), (32, 32))
    out = np.asarray(warp_affine(jnp.asarray(src), t, (32, 32)))
    assert out[0, 0, 10, 20] == pytest.approx(1.0, abs=1e-5)
    assert out.sum() == pytest.approx(1.0, abs=1e-4)
