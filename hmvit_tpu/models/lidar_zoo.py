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
    padding: object = "SAME"
    use_bias: bool = True  # torch nn.Conv3d default, for weight parity

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=self.padding, use_bias=self.use_bias)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9)(x)
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


class VoxelCML(nn.Module):
    """Convolutional middle layers, torch-aligned strides/padding
    (reference: opencood/models/voxel_net.py:114-125 — z compressed by
    s2/p1, VALID-z, s2/p1)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        p1 = ((1, 1), (1, 1), (1, 1))
        x = Conv3DBNReLU(64, stride=(2, 1, 1), padding=p1)(x, train)
        x = Conv3DBNReLU(64, padding=((0, 0), (1, 1), (1, 1)))(x, train)
        x = Conv3DBNReLU(64, stride=(2, 1, 1), padding=p1)(x, train)
        return x


def fold_z_to_channels(x):
    """(N, nz, ny, nx, C) -> (N, ny, nx, C*nz) matching the torch
    ``view(N, C*D, H, W)`` channel order (C outer, z inner) so RPN weights
    interchange with the reference."""
    n, nz, ny, nx, c = x.shape
    return x.transpose(0, 2, 3, 4, 1).reshape(n, ny, nx, c * nz)


class VoxelRPN(nn.Module):
    """3-block multiscale RPN with deconv-concat skip fusion (reference:
    opencood/models/voxel_net.py:129-169).  Faithful quirks kept: block 3's
    five trailing convs are raw (no BN/ReLU), deconvs carry BN but no
    activation, heads are bare 1x1 convs on the 768-ch concat."""
    anchor_num: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .pixor import _TorchConvT

        def cbr(y, ch, stride=1):
            y = nn.Conv(ch, (3, 3), strides=(stride, stride),
                        padding=((1, 1), (1, 1)))(y)
            y = nn.BatchNorm(use_running_average=not train,
                             epsilon=1e-5, momentum=0.9)(y)
            return nn.relu(y)

        b1 = cbr(x, 128, 2)
        for _ in range(3):
            b1 = cbr(b1, 128)
        b2 = cbr(b1, 128, 2)
        for _ in range(5):
            b2 = cbr(b2, 128)
        b3 = cbr(b2, 256, 2)
        for _ in range(5):
            b3 = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)))(b3)

        def up(y, k, s):
            y = _TorchConvT(256, k, s, 0)(y)
            return nn.BatchNorm(use_running_average=not train,
                                epsilon=1e-5, momentum=0.9)(y)

        cat = jnp.concatenate(
            [up(b3, 4, 4), up(b2, 2, 2), up(b1, 1, 1)], axis=-1)
        psm = nn.Conv(self.anchor_num, (1, 1))(cat)
        rm = nn.Conv(7 * self.anchor_num, (1, 1))(cat)
        return psm, rm


class VoxelNetDetector(nn.Module):
    """VoxelNet: pillar-style VFE -> dense 3D CML -> multiscale RPN
    (reference: opencood/models/voxel_net.py:172-232; the reference also
    swaps its SVFE for PillarVFE at :175-180)."""
    config: dict
    return_features: bool = False

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        cfg = self.config
        grid = cfg["grid_size"]  # (nx, ny, nz)
        vox = VoxelFeatureNet(cfg.get("vfe_filters", 64),
                              cfg["voxel_size"], cfg["lidar_range"],
                              grid)(points, points_mask, train)
        bev = fold_z_to_channels(VoxelCML()(vox, train))
        if self.return_features:
            return bev
        psm, rm = VoxelRPN(cfg.get("anchor_number", 2))(bev, train)
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


class VoxelNetIntermediate(nn.Module):
    """Cooperative VoxelNet: per-agent VFE+CML, AttFusion on the folded
    128-ch BEV, shared RPN (reference:
    opencood/models/voxel_net_intermediate.py:196-264 — fusion sits
    between the middle layers and the RPN)."""
    config: dict

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        from .fusion.basic import AttFusion

        cfg = self.config
        grid = cfg["grid_size"]
        points, pmask = batch["points"], batch["points_mask"]
        b, l = points.shape[:2]
        vox = VoxelFeatureNet(cfg.get("vfe_filters", 64),
                              cfg["voxel_size"], cfg["lidar_range"],
                              grid)(points.reshape(b * l, *points.shape[2:]),
                                    pmask.reshape(b * l, -1), train)
        bev = fold_z_to_channels(VoxelCML()(vox, train))
        bev = bev.reshape(b, l, *bev.shape[1:])
        bev = bev * batch["agent_mask"][:, :, None, None, None]
        fused = AttFusion(bev.shape[-1],
                          discrete_ratio=float(cfg["voxel_size"][0]),
                          downsample_rate=1.0)(
            bev, batch.get("mode"), batch["pairwise_t_matrix"],
            batch["agent_mask"])
        psm, rm = VoxelRPN(cfg.get("anchor_number", 2))(fused, train)
        return {"psm": psm.transpose(0, 3, 1, 2),
                "rm": rm.transpose(0, 3, 1, 2)}
