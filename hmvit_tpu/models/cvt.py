"""Cross-view transformer: multi-camera images -> BEV features.

Capability-equivalent of the reference's CVT camera branch (reference:
opencood/models/sub_modules/cvt_modules.py:44-330, wrapper
opencood/models/cross_view_transformer.py:14-77): a learned BEV query grid
cross-attends over all cameras' image tokens, with camera-aware positional
embeddings built from unprojected pixel rays (K^-1, E^-1) and camera
centers; a conv decoder upsamples the fused BEV to the detection
resolution.  Everything is dense attention over static token counts — one
XLA fusion, no per-camera Python loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNReLU, NaiveDecoder


class ImageEncoder(nn.Module):
    """Small strided conv backbone: (N, H, W, 3) -> (N, H/2^depth, ..., C)."""
    channels: tuple = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        for ch in self.channels:
            x = ConvBNReLU(ch, stride=2)(x, train)
            x = ConvBNReLU(ch)(x, train)
        return x


def make_image_backbone(cfg: dict):
    """Image backbone by config: 'backbone' names a ResNet or VoVNet
    (stride-16 stage 3 output), otherwise the plain strided conv
    encoder."""
    backbone = cfg.get("backbone")
    if backbone:
        if backbone.startswith("vovnet"):
            from .vovnet import VoVNet

            return VoVNet(arch=backbone,
                          id_pick=tuple(cfg.get("id_pick", (3,))))
        from .resnet import ResNetEncoder

        return ResNetEncoder(arch=backbone,
                             id_pick=tuple(cfg.get("id_pick", (3,))),
                             stem_s2d=cfg.get("stem_s2d", False))
    return ImageEncoder(tuple(cfg.get("encoder_channels",
                                      (32, 64, 128, cfg.get("dim", 128)))))


def pixel_rays(intrinsics, h: int, w: int, img_h: int, img_w: int):
    """Unprojected pixel directions K^-1 [u, v, 1] at feature resolution.

    intrinsics: (..., 3, 3) for images of (img_h, img_w); returns
    (..., h, w, 3) un-normalized camera-frame rays.
    """
    sx, sy = img_w / w, img_h / h
    us = (jnp.arange(w, dtype=jnp.float32) + 0.5) * sx
    vs = (jnp.arange(h, dtype=jnp.float32) + 0.5) * sy
    uu, vv = jnp.meshgrid(us, vs)
    pix = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1)  # (h, w, 3)
    k_inv = jnp.linalg.inv(intrinsics.astype(jnp.float32))
    return jnp.einsum("...ij,hwj->...hwi", k_inv, pix,
                      precision=jax.lax.Precision.HIGHEST)


class CrossViewAttention(nn.Module):
    """BEV queries attend over all cameras' image tokens (global)."""
    dim: int
    heads: int = 4
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, bev_q, img_tokens):
        # bev_q: (N, Q, C); img_tokens: (N, S, C)
        d = self.dim // self.heads
        q = nn.Dense(self.dim, use_bias=self.qkv_bias)(bev_q)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias)(img_tokens)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias)(img_tokens)

        def split(x):
            return x.reshape(*x.shape[:-1], self.heads, d)

        q, k, v = split(q) * d ** -0.5, split(k), split(v)
        sim = jnp.einsum("nqhd,nshd->nhqs", q, k,
                         preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("nhqs,nshd->nqhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(*out.shape[:-2], self.dim)
        return nn.Dense(self.dim)(out)


class CVTBlock(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, bev_q, img_tokens):
        x = bev_q + CrossViewAttention(self.dim, self.heads)(
            nn.LayerNorm()(bev_q), img_tokens
        )
        h = nn.Dense(self.dim * 2)(nn.LayerNorm()(x))
        return x + nn.Dense(self.dim)(nn.gelu(h))


class CrossViewTransformer(nn.Module):
    """(N, M, H, W, 3) images + calib -> (N, bev_out, bev_out, out_dim)."""
    config: dict

    @nn.compact
    def __call__(self, images, intrinsics, extrinsics, train: bool = False):
        cfg = self.config
        dim = cfg.get("dim", 128)
        bev_hw = cfg.get("bev_size", 32)
        out_dim = cfg.get("out_dim", 256)
        num_blocks = cfg.get("num_blocks", 2)
        n, m, img_h, img_w, _ = images.shape

        feats = make_image_backbone(cfg)(
            images.reshape(n * m, img_h, img_w, 3), train
        )
        fh, fw = feats.shape[1:3]
        feats = nn.Dense(dim)(feats)

        # camera-aware positional embedding: rotate pixel rays into the
        # agent frame with E^-1 and embed; embed camera centers for queries
        rays = pixel_rays(intrinsics.reshape(n * m, 3, 3), fh, fw,
                          img_h, img_w)
        rot = jnp.linalg.inv(
            extrinsics.reshape(n * m, 4, 4).astype(jnp.float32)
        )
        dirs = jnp.einsum("bij,bhwj->bhwi", rot[:, :3, :3], rays,
                          precision=jax.lax.Precision.HIGHEST)
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-6)
        img_embed = nn.Dense(dim)(nn.gelu(nn.Dense(dim)(dirs)))
        cam_center = rot[:, :3, 3]
        cam_embed = nn.Dense(dim)(nn.gelu(nn.Dense(dim)(cam_center)))

        tokens = (feats + img_embed + cam_embed[:, None, None]).reshape(
            n, m * fh * fw, dim
        )

        bev_embed = self.param(
            "bev_embedding", nn.initializers.normal(0.02),
            (bev_hw, bev_hw, dim),
        )
        bev_q = jnp.broadcast_to(
            bev_embed.reshape(1, -1, dim), (n, bev_hw * bev_hw, dim)
        )
        for _ in range(num_blocks):
            bev_q = CVTBlock(dim)(bev_q, tokens)

        bev = bev_q.reshape(n, bev_hw, bev_hw, dim)
        bev = nn.Dense(out_dim)(bev)

        up = cfg.get("decoder_layers", 2)
        bev = NaiveDecoder(num_layer=up, num_ch_dec=[out_dim] * up,
                           use_upsample=True)(bev, train)
        return bev
