"""Secondary LiDAR detector families: VoxelNet, SECOND, PIXOR.

TPU redesigns of the reference baselines (reference:
opencood/models/voxel_net.py, second.py +
sub_modules/sparse_backbone_3d.py, pixor.py): the CUDA sparse-conv
backbones become dense 3D convolutions over the small-z voxel grid (nz is
4-10 cells — dense 3D conv tiles fine on the MXU and needs no spconv),
and the PIXOR BEV rasterizer is an on-device occupancy scatter.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.voxelize import (
    pillar_point_features,
    pillarize,
    scatter_max_to_bev,
)
from .layers import ConvBNReLU, DetectionHead, MaskedBatchNorm


class Conv3DBNReLU(nn.Module):
    features: int
    kernel: tuple = (3, 3, 3)
    stride: tuple = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.99)(x)
        return nn.relu(x)


class VoxelFeatureNet(nn.Module):
    """Point MLP + max per voxel into a dense (N, nz, ny, nx, C) grid."""
    num_filters: int
    voxel_size: tuple
    pc_range: tuple
    grid_size: tuple  # (nx, ny, nz)

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        grid = tuple(int(g) for g in self.grid_size)
        info = pillarize(points, points_mask, tuple(self.voxel_size),
                         tuple(self.pc_range), grid)
        feats = pillar_point_features(info)
        feats = nn.Dense(self.num_filters, use_bias=False)(feats)
        feats = MaskedBatchNorm()(feats, info["keep"], train)
        feats = nn.relu(feats) * info["keep"][:, None]
        return scatter_max_to_bev(feats, info["pillar_id"], info["keep"],
                                  grid, points.shape[0], max_run=32)


class VoxelNetDetector(nn.Module):
    """VoxelNet: SVFE -> dense 3D conv middle layers -> BEV RPN."""
    config: dict
    return_features: bool = False

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        cfg = self.config
        grid = cfg["grid_size"]  # (nx, ny, nz)
        vox = VoxelFeatureNet(cfg.get("vfe_filters", 64),
                              cfg["voxel_size"], cfg["lidar_range"],
                              grid)(points, points_mask, train)
        # (N, nz, ny, nx, C): conv middle layers compress z
        x = Conv3DBNReLU(64, stride=(2, 1, 1))(vox, train)
        x = Conv3DBNReLU(64)(x, train)
        x = Conv3DBNReLU(64, stride=(2, 1, 1))(x, train)
        n, nz, ny, nx, c = x.shape
        bev = x.transpose(0, 2, 3, 1, 4).reshape(n, ny, nx, nz * c)
        for ch, stride in ((128, 2), (128, 1), (256, 2)):
            bev = ConvBNReLU(ch, stride=stride)(bev, train)
        if self.return_features:
            return bev
        psm, rm = DetectionHead(cfg.get("anchor_number", 2))(bev)
        return {"psm": psm.transpose(0, 3, 1, 2),
                "rm": rm.transpose(0, 3, 1, 2)}


class SecondDetector(nn.Module):
    """SECOND: mean-VFE -> dense 3D backbone (8x) -> height compression
    -> BEV head."""
    config: dict
    return_features: bool = False

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        cfg = self.config
        grid = cfg["grid_size"]
        vox = VoxelFeatureNet(cfg.get("vfe_filters", 16),
                              cfg["voxel_size"], cfg["lidar_range"],
                              grid)(points, points_mask, train)
        x = Conv3DBNReLU(16)(vox, train)
        x = Conv3DBNReLU(32, stride=(2, 2, 2))(x, train)
        x = Conv3DBNReLU(64, stride=(2, 2, 2))(x, train)
        x = Conv3DBNReLU(64, stride=(2, 2, 2))(x, train)
        n, nz, ny, nx, c = x.shape
        bev = x.transpose(0, 2, 3, 1, 4).reshape(n, ny, nx, nz * c)
        bev = ConvBNReLU(256)(bev, train)
        bev = ConvBNReLU(256)(bev, train)
        if self.return_features:
            return bev
        psm, rm = DetectionHead(cfg.get("anchor_number", 2))(bev)
        return {"psm": psm.transpose(0, 3, 1, 2),
                "rm": rm.transpose(0, 3, 1, 2)}


class PIXORDetector(nn.Module):
    """PIXOR: on-device BEV occupancy raster -> 2D conv backbone -> head.

    The input raster is nz occupancy channels + 1 mean-intensity channel,
    built with the same fused segment ops as the pillar path.
    """
    config: dict
    return_features: bool = False

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        cfg = self.config
        grid = cfg["grid_size"]  # (nx, ny, nz)
        info = pillarize(points, points_mask, tuple(cfg["voxel_size"]),
                         tuple(cfg["lidar_range"]), tuple(grid))
        flat = info["points"]
        occ_int = jnp.stack(
            [jnp.ones_like(flat[:, 3]), flat[:, 3]], axis=1)
        vox = scatter_max_to_bev(occ_int, info["pillar_id"], info["keep"],
                                 tuple(grid), points.shape[0], max_run=32)
        # (N, nz, ny, nx, 2) -> occupancy per z + intensity folded to BEV
        n, nz, ny, nx, _ = vox.shape
        occ = vox[..., 0].transpose(0, 2, 3, 1)  # (N, ny, nx, nz)
        inten = vox[..., 1].max(axis=1)[..., None]
        x = jnp.concatenate([occ, inten], axis=-1)

        for ch, stride in ((32, 1), (64, 2), (128, 2), (196, 1)):
            x = ConvBNReLU(ch, stride=stride)(x, train)
        if self.return_features:
            return x
        psm, rm = DetectionHead(cfg.get("anchor_number", 2))(x)
        return {"psm": psm.transpose(0, 3, 1, 2),
                "rm": rm.transpose(0, 3, 1, 2)}
