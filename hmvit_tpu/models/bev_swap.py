"""BevSwap camera->BEV encoder: per-view conv features fused across the
camera views by swap (local-window + grid) attention, then upsampled to
the BEV plane.

Capability-equivalent of the reference BevSwap (reference:
opencood/models/bev_swap.py:12-80: ResnetEncoderConcat per view ->
SwapFusionEncoder across views -> NaiveDecoder -> seg heads).  Here the
view-fusion reuses the same swap attention blocks as the cooperative
SwapFusion (models/fusion/swap.py) with the VIEW axis in the agent slot
and identity geometry — a learned view-to-BEV transform, like the
reference.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .cvt import make_image_backbone
from .fusion.swap import SwapAttention


class BEVSwapEncoder(nn.Module):
    """images (N, M, H, W, 3) -> BEV (N, S, S, out_dim)."""
    config: dict

    @nn.compact
    def __call__(self, images, intrinsics, extrinsics,
                 train: bool = False):
        cfg = self.config
        dim = cfg.get("dim", 128)
        bev = cfg.get("bev_size", 32)
        out_dim = cfg.get("out_dim", 256)
        depth = cfg.get("num_blocks", 2)
        window = cfg.get("window", 4)

        n, m = images.shape[:2]
        feats = make_image_backbone(cfg)(
            images.reshape(n * m, *images.shape[2:]), train)
        if isinstance(feats, (list, tuple)):
            feats = feats[-1]
        # resize per-view features onto the BEV token grid and embed a
        # per-view positional code (the "parse" of frontal views)
        import jax

        feats = jax.image.resize(
            feats, (feats.shape[0], bev, bev, feats.shape[-1]), "bilinear")
        feats = nn.Dense(dim)(feats).reshape(n, m, bev, bev, dim)
        view_emb = self.param("view_embedding",
                              nn.initializers.normal(0.02),
                              (1, m, 1, 1, dim))
        x = feats + view_emb

        mask = jnp.ones((n, m, bev, bev), x.dtype)
        dh = cfg.get("dim_head", min(32, dim))
        for _ in range(depth):
            a = SwapAttention(dim, dim_head=dh, window=window,
                              style="local")(nn.LayerNorm()(x), mask)
            x = x + a
            a = SwapAttention(dim, dim_head=dh, window=window,
                              style="grid")(nn.LayerNorm()(x), mask)
            x = x + a
            ff = nn.Dense(dim)(nn.gelu(nn.Dense(2 * dim)(
                nn.LayerNorm()(x))))
            x = x + ff

        x = x.mean(axis=1)  # fuse views
        # upsample to the output BEV resolution
        up = cfg.get("upsample", 2)
        for _ in range(up):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            x = nn.Conv(dim, (3, 3))(x)
            x = nn.relu(x)
        return nn.Conv(out_dim, (1, 1))(x)
