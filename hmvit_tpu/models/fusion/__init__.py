"""Cooperative BEV fusion zoo.

Every module shares one interface:
    __call__(x, mode, pairwise, agent_mask) -> fused ego BEV (B, H, W, C)
with x: (B, L, H, W, C) per-agent features in their own frames,
pairwise[b, j, i]: agent j -> agent i frame transform, agent_mask: (B, L).

Each is an alternative to H3GAT above the same warped-feature interface
(reference: opencood/models/fusion_modules/*)."""
from .basic import AttFusion, DiscoNetFusion, SpatialFusion  # noqa: F401
from .v2vnet import V2VNetFusion  # noqa: F401
from .swap import SwapFusionEncoder  # noqa: F401
