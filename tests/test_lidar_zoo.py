"""Secondary LiDAR families: VoxelNet/SECOND/PIXOR forward + grads."""
import jax
import numpy as np
import pytest

from hmvit_tpu.models.lidar_zoo import SecondDetector, VoxelNetDetector
from hmvit_tpu.models.pixor import PIXORDetector

pytestmark = pytest.mark.slow

RANGE = [-20.48, -20.48, -3.0, 20.48, 20.48, 1.0]
CFG = {
    "voxel_size": [0.64, 0.64, 0.5],
    "lidar_range": RANGE,
    "grid_size": (64, 64, 8),
    "anchor_number": 2,
    "vfe_filters": 16,
}
# SECOND needs nz >= 24 to keep the faithful VoxelBackbone8x z chain
# alive (25 -> 13 -> 7 -> 3 -> 1; lidar_zoo.py docstring) — the round-4
# faithful-twin rewrite made nz=8 collapse to ZERO z cells at conv_out,
# which the round-5 full slow-lane rerun caught
SECOND_CFG = dict(CFG, voxel_size=[0.64, 0.64, 4.0 / 24],
                  grid_size=(64, 64, 24))


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


def _check_grads(model, variables, points, mask):
    def loss(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            points, mask, train=True, mutable=["batch_stats"])
        return sum((v ** 2).mean() for v in o.values())

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(x)) for x in leaves)
    assert any(np.abs(x).max() > 0 for x in leaves)


@pytest.mark.parametrize("cls,stride", [
    # faithful VoxelNet RPN emits at input/2 (3 stride-2 blocks, deconvs
    # x4/x2/x1 land on the first block's plane)
    (VoxelNetDetector, 2),
    (SecondDetector, 8),
])
def test_anchor_families_forward_and_grad(cls, stride):
    points, mask = make_points()
    model = cls(SECOND_CFG if cls is SecondDetector else CFG)
    variables = model.init(jax.random.key(0), points, mask, train=False)
    out = model.apply(variables, points, mask, train=False)
    hw = 64 // stride
    assert out["psm"].shape == (2, 2, hw, hw)
    assert out["rm"].shape == (2, 14, hw, hw)
    assert np.all(np.isfinite(np.asarray(out["psm"])))
    _check_grads(model, variables, points, mask)


def test_pixor_anchor_free_forward_and_grad():
    points, mask = make_points()
    cfg = {"res": 0.64, "downsample_rate": 4, "lidar_range": RANGE,
           "use_bn": True}
    model = PIXORDetector(cfg)
    variables = model.init(jax.random.key(0), points, mask, train=False)
    out = model.apply(variables, points, mask, train=False)
    assert out["cls"].shape == (2, 1, 16, 16)
    assert out["reg"].shape == (2, 6, 16, 16)
    assert np.all(np.isfinite(np.asarray(out["cls"])))
    _check_grads(model, variables, points, mask)
