"""Secondary LiDAR families: VoxelNet/SECOND/PIXOR forward + grads."""
import jax
import numpy as np
import pytest

from hmvit_tpu.models.lidar_zoo import (
    PIXORDetector,
    SecondDetector,
    VoxelNetDetector,
)

pytestmark = pytest.mark.slow

RANGE = [-20.48, -20.48, -3.0, 20.48, 20.48, 1.0]
CFG = {
    "voxel_size": [0.64, 0.64, 0.5],
    "lidar_range": RANGE,
    "grid_size": (64, 64, 8),
    "anchor_number": 2,
    "vfe_filters": 16,
}


def make_points(seed=0, n=2, p=2048):
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, p, 4), np.float32)
    pts[..., 0] = rng.uniform(-20, 20, (n, p))
    pts[..., 1] = rng.uniform(-20, 20, (n, p))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (n, p))
    pts[..., 3] = rng.uniform(0, 1, (n, p))
    mask = np.ones((n, p), np.float32)
    mask[:, p // 2:] = 0
    return pts, mask


@pytest.mark.parametrize("cls,stride", [
    (VoxelNetDetector, 4),
    (SecondDetector, 8),
    (PIXORDetector, 4),
])
def test_forward_and_grad(cls, stride):
    points, mask = make_points()
    model = cls(CFG)
    variables = model.init(jax.random.key(0), points, mask, train=False)
    out = model.apply(variables, points, mask, train=False)
    hw = 64 // stride
    assert out["psm"].shape == (2, 2, hw, hw)
    assert out["rm"].shape == (2, 14, hw, hw)
    assert np.all(np.isfinite(np.asarray(out["psm"])))

    def loss(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            points, mask, train=True, mutable=["batch_stats"])
        return (o["psm"] ** 2).mean() + (o["rm"] ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(x)) for x in leaves)
    assert any(np.abs(x).max() > 0 for x in leaves)
