"""LiDAR branch: fused PointPillars encoder -> dense BEV features.

Pipeline (all on-device, one jitted program):
  raw padded points (L, P, 4)
    -> pillarize (rank-capped pillar assignment, cluster stats)
    -> per-point PFN MLP (Dense + masked BN + ReLU)
    -> segment_max scatter into the dense (ny, nx, C) grid
    -> 2D BEV backbone (3 strided stages + transposed-conv up-fusion)
    -> shrink conv to the fusion width.

Capability-equivalent to the reference chain PillarVFE ->
PointPillarScatter -> BaseBEVBackbone -> DownsampleConv (reference:
opencood/models/point_pillar.py:9-62, sub_modules/pillar_vfe.py:10-146,
sub_modules/point_pillar_scatter.py:5-48, backbones/base_bev_backbone.py),
but with the voxelizer on the device and no ragged tensors.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.voxelize import (
    pillar_point_features,
    pillarize,
    scan_steps,
    scatter_max_to_bev,
    segmented_run_totals,
)
from .layers import ConvBNReLU, DownsampleConv, MaskedBatchNorm


class PillarFeatureNet(nn.Module):
    """Per-point MLP + max-pool scatter (PFN fused with the scatter).

    Processes the whole fleet's clouds in ONE set of segment ops via
    globally-offset pillar ids — no per-cloud loop or vmap."""
    num_filters: Sequence[int]
    voxel_size: Sequence[float]
    pc_range: Sequence[float]
    grid_size: Sequence[int]  # (nx, ny)
    max_points_per_pillar: int = 32
    use_absolute_xyz: bool = True
    with_distance: bool = False
    # spconv-parity per-pillar point cap requires a global sort; without
    # it every in-range point participates (quality superset, no sort)
    enforce_cap: bool = True
    # serving mixed precision: the voxelizer's coordinate math stays in
    # the points dtype (keep points fp32 — bf16 coordinates quantize to
    # ~0.4 m at 100 m range), and the assembled per-point FEATURES are
    # cast here so the PFN/scatter/backbone run at this dtype
    compute_dtype: str | None = None
    # dense-grid build: False = scan + row gather (default), "v2" = the
    # demand-sized-DMA expansion kernel (ops/expand.py) — config key
    # lidar.scatter_variant
    scatter_variant: bool | str = False

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        """points: (N, P, 4), points_mask: (N, P) -> BEV (N, ny, nx, C)."""
        grid = (int(self.grid_size[0]), int(self.grid_size[1]))
        n_clouds = points.shape[0]
        info = pillarize(points, points_mask, tuple(self.voxel_size),
                         tuple(self.pc_range), grid,
                         self.max_points_per_pillar,
                         enforce_cap=self.enforce_cap)
        feats = pillar_point_features(info, self.use_absolute_xyz,
                                      self.with_distance)
        if self.compute_dtype is not None:
            feats = feats.astype(jnp.dtype(self.compute_dtype))
        keep = info["keep"]

        n_layers = len(self.num_filters)
        for i, out_ch in enumerate(self.num_filters):
            last = i == n_layers - 1
            units = out_ch if last else out_ch // 2
            feats = nn.Dense(units, use_bias=False)(feats)
            feats = MaskedBatchNorm()(feats, keep, train)
            feats = nn.relu(feats)
            feats = feats * keep[:, None].astype(feats.dtype)
            if not last:
                # concat per-pillar max back onto each point
                if self.enforce_cap:
                    # sorted runs: per-point propagation, no scatter
                    steps = scan_steps(self.max_points_per_pillar,
                                       feats.shape[0])
                    pid2 = jnp.where(keep, info["pillar_id"], -1)
                    neg = jnp.where(keep[:, None], feats, -jnp.inf)
                    pmax = segmented_run_totals(
                        neg, pid2, steps, jnp.maximum,
                        jnp.asarray(-jnp.inf, feats.dtype))
                    pmax = jnp.where(jnp.isfinite(pmax), pmax, 0.0)
                    pmax = pmax * keep[:, None].astype(pmax.dtype)
                else:
                    num_pillars = n_clouds * grid[0] * grid[1]
                    neg = jnp.where(keep[:, None], feats, -jnp.inf)
                    pm = jax.ops.segment_max(
                        neg, info["pillar_id"],
                        num_segments=num_pillars + 1,
                        indices_are_sorted=False)
                    pm = jnp.where(jnp.isfinite(pm), pm, 0.0)
                    pmax = pm[info["pillar_id"]]
                feats = jnp.concatenate([feats, pmax], axis=-1)

        return scatter_max_to_bev(
            feats, info["pillar_id"], keep, grid, n_clouds,
            sorted_ids=self.enforce_cap,
            max_run=self.max_points_per_pillar if self.enforce_cap
            else None,
            use_expand_kernel=self.scatter_variant)


class BEVBackbone(nn.Module):
    """Multi-scale 2D conv backbone with transposed-conv up-fusion."""
    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int]
    num_upsample_filters: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        ups = []
        for i, n_layers in enumerate(self.layer_nums):
            x = ConvBNReLU(self.num_filters[i],
                           stride=self.layer_strides[i])(x, train)
            for _ in range(n_layers):
                x = ConvBNReLU(self.num_filters[i])(x, train)
            s = self.upsample_strides[i]
            if s >= 1:
                u = nn.ConvTranspose(self.num_upsample_filters[i], (s, s),
                                     strides=(s, s), use_bias=False)(x)
            else:
                inv = int(round(1 / s))
                u = nn.Conv(self.num_upsample_filters[i], (inv, inv),
                            strides=(inv, inv), use_bias=False)(x)
            u = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             momentum=0.99)(u)
            ups.append(nn.relu(u))
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]


def pixel_agent_attention(x, agent_mask):
    """Per-pixel scaled-dot-product attention across agents, returning
    the ego row (reference: opencood/models/fusion_modules/
    self_attn.py:36-52 — no learned projections, query = every agent,
    agent 0's row kept).  x: (B, L, H, W, C), agent_mask: (B, L)."""
    c = x.shape[-1]
    sim = jnp.einsum("bihwc,bjhwc->bhwij", x[:, :1], x,
                     preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(c, jnp.float32))
    sim = jnp.where(agent_mask[:, None, None, None, :] > 0, sim, -1e9)
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhwij,bjhwc->bihwc", attn.astype(x.dtype), x)
    return out[:, 0]


class AttBEVBackbone(nn.Module):
    """BEV backbone with PER-STAGE agent fusion (reference:
    opencood/models/backbones/att_bev_backbone.py:40-145): each conv
    stage's output is fused across agents by per-pixel attention and
    the FUSED map feeds that stage's upsample branch, while the
    unfused multi-agent maps continue through the next stage.  Inputs
    must already be ego-aligned (the reference's intermediate lidar
    datasets project raw points into the ego frame before voxelizing).
    Output is single-agent (the ego's fused multi-scale concat)."""
    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int]
    num_upsample_filters: Sequence[int]

    @nn.compact
    def __call__(self, x, agent_mask, train: bool = False):
        # x: (B, L, H, W, C) ego-aligned per-agent BEV maps
        b, l = x.shape[:2]
        flat = x.reshape(b * l, *x.shape[2:])
        ups = []
        for i, n_layers in enumerate(self.layer_nums):
            flat = ConvBNReLU(self.num_filters[i],
                              stride=self.layer_strides[i])(flat, train)
            for _ in range(n_layers):
                flat = ConvBNReLU(self.num_filters[i])(flat, train)
            stage = flat.reshape(b, l, *flat.shape[1:])
            fused = pixel_agent_attention(stage, agent_mask)
            s = self.upsample_strides[i]
            if s >= 1:
                u = nn.ConvTranspose(self.num_upsample_filters[i], (s, s),
                                     strides=(s, s), use_bias=False)(fused)
            else:
                inv = int(round(1 / s))
                u = nn.Conv(self.num_upsample_filters[i], (inv, inv),
                            strides=(inv, inv), use_bias=False)(fused)
            u = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             momentum=0.99)(u)
            ups.append(nn.relu(u))
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]


class PointPillarEncoder(nn.Module):
    """points (N, P, 4) + mask (N, P) -> BEV features (N, H', W', C)."""
    config: dict

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        cfg = self.config
        bev = PillarFeatureNet(
            num_filters=cfg["pillar_vfe"]["num_filters"],
            voxel_size=cfg["voxel_size"],
            pc_range=cfg["lidar_range"],
            grid_size=cfg["point_pillar_scatter"]["grid_size"][:2],
            use_absolute_xyz=cfg["pillar_vfe"].get("use_absolute_xyz", True),
            with_distance=cfg["pillar_vfe"].get("with_distance", False),
            enforce_cap=cfg["pillar_vfe"].get("enforce_point_cap", True),
            compute_dtype=cfg.get("compute_dtype"),
            scatter_variant=cfg.get("scatter_variant", False),
        )(points, points_mask, train)

        bb = cfg["base_bev_backbone"]
        x = BEVBackbone(
            layer_nums=bb["layer_nums"],
            layer_strides=bb["layer_strides"],
            num_filters=bb["num_filters"],
            upsample_strides=bb["upsample_strides"],
            num_upsample_filters=bb["num_upsample_filter"],
        )(bev, train)

        if "shrink_header" in cfg:
            sh = cfg["shrink_header"]
            x = DownsampleConv(
                kernel_sizes=sh["kernal_size"],
                dims=sh["dim"],
                strides=sh["stride"],
            )(x)
        return x
