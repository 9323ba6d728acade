"""VPN (View Parsing Network) camera -> BEV baseline.

Capability-equivalent of the reference family (reference:
opencood/models/view_parse_network.py:11-275): each camera's feature map
is flattened and pushed through a learned MLP "view transform" into BEV
token space, per-camera BEVs are averaged, and a conv decoder refines.
The simplest camera baseline — no geometry, pure learned mapping.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .cvt import make_image_backbone
from .layers import NaiveDecoder


class ViewParseNetwork(nn.Module):
    config: dict

    @nn.compact
    def __call__(self, images, intrinsics, extrinsics, train: bool = False):
        cfg = self.config
        dim = cfg.get("dim", 128)
        bev_hw = cfg.get("bev_size", 32)
        out_dim = cfg.get("out_dim", 256)
        n, m, img_h, img_w, _ = images.shape

        feats = make_image_backbone(cfg)(
            images.reshape(n * m, img_h, img_w, 3), train)
        fh, fw = feats.shape[1:3]
        feats = nn.Dense(dim)(feats)

        # learned view transform: image tokens -> BEV tokens (per camera)
        tokens = feats.reshape(n * m, fh * fw, dim)
        tokens = jnp.swapaxes(tokens, 1, 2)  # (NM, dim, S)
        bev_tokens = nn.Dense(bev_hw * bev_hw, name="view_transform")(
            nn.relu(nn.Dense(fh * fw, name="view_hidden")(tokens)))
        bev = jnp.swapaxes(bev_tokens, 1, 2).reshape(
            n, m, bev_hw, bev_hw, dim)
        bev = bev.mean(axis=1)  # fuse cameras

        bev = nn.Dense(out_dim)(bev)
        up = cfg.get("decoder_layers", 2)
        return NaiveDecoder(num_layer=up, num_ch_dec=[out_dim] * up,
                            use_upsample=True)(bev, train)
