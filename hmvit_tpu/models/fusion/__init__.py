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
from .v2xvit import V2XTransformer  # noqa: F401


def _dim_head(dim: int) -> int:
    for d in (32, 16, 8, 4, 2, 1):
        if dim % d == 0:
            return d
    return 1


def make_fusion(name: str, dim: int, spatial: dict, args: dict = None):
    """Instantiate a fusion module by its registry name.  ``args`` is
    the model config's fusion sub-block for modules with extra knobs
    (e.g. disconet_fusion's num_iteration/use_mask)."""
    args = args or {}
    ratio = spatial.get("voxel_size", [0.4])[0]
    ds = spatial.get("downsample_rate", 4)
    if name == "fcooper":
        return SpatialFusion(discrete_ratio=ratio, downsample_rate=ds)
    if name in ("att", "self_att"):
        return AttFusion(dim, discrete_ratio=ratio, downsample_rate=ds)
    if name == "disconet":
        return DiscoNetFusion(
            dim, discrete_ratio=ratio, downsample_rate=ds,
            num_iteration=int(args.get("num_iteration", 1)),
            use_mask=bool(args.get("use_mask", True)))
    if name == "v2vnet":
        return V2VNetFusion(dim, discrete_ratio=ratio, downsample_rate=ds)
    if name in ("swap", "fax", "cobevt"):
        return SwapFusionEncoder(dim, dim_head=_dim_head(dim),
                                 discrete_ratio=ratio,
                                 downsample_rate=ds)
    if name in ("v2xvit", "v2xt"):
        return V2XTransformer(dim, discrete_ratio=ratio, downsample_rate=ds)
    raise ValueError(f"unknown fusion {name!r}")
