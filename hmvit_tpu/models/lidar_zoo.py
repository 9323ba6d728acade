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


def mean_voxel_grid(points, points_mask, voxel_size, pc_range, grid,
                    max_points_per_voxel: int = 5):
    """MeanVFE scattered dense: per-voxel MEAN of the raw point features
    (reference: opencood/models/sub_modules/mean_vfe.py:8-30, fed by the
    SpVoxelPreprocessor with its max_points_per_voxel cap) ->
    (N, nz, ny, nx, 4).  The cap keeps spconv parity: only the first K
    points per voxel (input order) enter the mean."""
    import jax

    grid = tuple(int(g) for g in grid)
    n_clouds = points.shape[0]
    info = pillarize(points, points_mask, tuple(voxel_size),
                     tuple(pc_range), grid,
                     max_points_per_pillar=max_points_per_voxel)
    feats = info["points"][:, :4] * info["keep"][:, None]
    num_cells = n_clouds * grid[0] * grid[1] * (grid[2] if len(grid) > 2
                                                else 1)
    sums = jax.ops.segment_sum(feats, info["pillar_id"],
                               num_segments=num_cells + 1,
                               indices_are_sorted=True)
    cnt = jax.ops.segment_sum(info["keep"].astype(feats.dtype),
                              info["pillar_id"],
                              num_segments=num_cells + 1,
                              indices_are_sorted=True)
    mean = sums[:-1] / jnp.maximum(cnt[:-1, None], 1.0)
    nx, ny = grid[0], grid[1]
    nz = grid[2] if len(grid) > 2 else 1
    return mean.reshape(n_clouds, nz, ny, nx, 4)


class VoxelBackbone8x(nn.Module):
    """Dense analogue of the reference's sparse ``VoxelBackBone8x``
    (reference: opencood/models/sub_modules/sparse_backbone_3d.py:33-141)
    with the faithful per-stage conv counts and paddings:

      conv_input (16, k3, p1) -> conv1 (1x subm 16) ->
      conv2 (spconv s2 p1 -> 32, 2x subm 32) ->
      conv3 (spconv s2 p1 -> 64, 2x subm 64) ->
      conv4 (spconv s2, z-pad (0,1,1) -> 64, 2x subm 64) ->
      conv_out (128, kernel (3,1,1), stride (2,1,1), pad 0)

    spconv's SubMConv3d computes only at active sites; the dense twin
    computes everywhere (a quality superset — zero cells stay zero
    through conv_input only until the first BN bias).  Golden sparse-vs-
    dense parity is therefore impossible without spconv — recorded in
    PARITY.md.  BN follows spconv blocks: eps 1e-3, momentum 0.01 torch
    (= 0.99 flax), convs bias-free.  The caller pre-pads z by one cell
    (the reference's ``sparse_shape = grid[::-1] + [1, 0, 0]``)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        def blk(y, ch, stride=(1, 1, 1), pad=1):
            if isinstance(pad, int):
                pad = ((pad, pad),) * 3
            y = nn.Conv(ch, (3, 3, 3), strides=stride, padding=pad,
                        use_bias=False)(y)
            y = nn.BatchNorm(use_running_average=not train,
                             epsilon=1e-3, momentum=0.99)(y)
            return nn.relu(y)

        x = blk(x, 16)                          # conv_input
        x = blk(x, 16)                          # conv1
        x = blk(x, 32, stride=(2, 2, 2))        # conv2
        x = blk(x, 32)
        x = blk(x, 32)
        x = blk(x, 64, stride=(2, 2, 2))        # conv3
        x = blk(x, 64)
        x = blk(x, 64)
        x = blk(x, 64, stride=(2, 2, 2),        # conv4 (z unpadded)
                pad=((0, 0), (1, 1), (1, 1)))
        x = blk(x, 64)
        x = blk(x, 64)
        # conv_out: z-only downsample to the final 2 z-cells
        x = nn.Conv(128, (3, 1, 1), strides=(2, 1, 1),
                    padding=((0, 0), (0, 0), (0, 0)),
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         epsilon=1e-3, momentum=0.99)(x)
        return nn.relu(x)


class SecondDetector(nn.Module):
    """SECOND (reference: opencood/models/second.py:10-54): MeanVFE ->
    VoxelBackBone8x (faithful dense analogue) -> HeightCompression
    (z folded into channels; reference sub_modules/height_compression.py)
    -> BaseBEVBackbone -> 1x1 anchor heads.

    Config keys: grid_size (nx, ny, nz) with nz sized so the z chain
    41 -> 21 -> 11 -> 5 -> 2 stays positive (the reference's voxel z is
    0.1 over the 4 m range -> nz 40); base_bev_backbone mirrors the
    reference hypes (layer_nums [5, 5], input 256 = 128 x 2 z-cells)."""
    config: dict
    return_features: bool = False

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        from .pillar_encoder import BEVBackbone

        cfg = self.config
        grid = cfg["grid_size"]
        # the faithful z chain (conv2/3 padded s2, conv4 unpadded s2,
        # conv_out VALID (3,1,1) s2) needs nz+1 >= 25 to keep at least
        # one z cell; fail loudly instead of a zero-channel BEV deep in
        # the backbone (reference nz is 40: voxel z 0.1 over 4 m)
        z = grid[2] + 1
        for pad, k in ((2, 3), (2, 3), (0, 3), (0, 3)):
            z = (z + pad - k) // 2 + 1
        if z < 1:
            raise ValueError(
                f"grid_size z={grid[2]} collapses VoxelBackbone8x's z "
                "chain to zero cells; use nz >= 24 (reference: 40)")
        vox = mean_voxel_grid(points, points_mask, cfg["voxel_size"],
                              cfg["lidar_range"], grid,
                              cfg.get("max_points_per_voxel", 5))
        # the reference's sparse_shape appends one z cell
        vox = jnp.pad(vox, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        x = VoxelBackbone8x()(vox, train)
        bev = fold_z_to_channels(x)
        bb = cfg.get("base_bev_backbone", {
            "layer_nums": [5, 5], "layer_strides": [1, 2],
            "num_filters": [128, 256], "upsample_strides": [1, 2],
            "num_upsample_filter": [256, 256]})
        bev = BEVBackbone(
            layer_nums=bb["layer_nums"],
            layer_strides=bb["layer_strides"],
            num_filters=bb["num_filters"],
            upsample_strides=bb["upsample_strides"],
            num_upsample_filters=bb["num_upsample_filter"])(bev, train)
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
