"""FAX / SinBEVT camera -> BEV encoder: windowed cross-view attention.

Capability-equivalent of the reference's FAXModule (reference:
opencood/models/sub_modules/fax_modules.py:41-525): a learned BEV prior is
refined per image scale by (a) local-window cross-attention where each BEV
window attends to the co-located window of every camera's features, and
(b) a grid (local-to-global) variant, both with camera-geometry embeddings
built from K^-1/E^-1 rays; windows use the same (x w1)(y w2) vs
(w1 x)(w2 y) factorization as the fusion stage.  Redesigned TPU-first: the
camera axis is folded into the attention key/value token axis (one einsum,
no per-camera loops).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .cvt import make_image_backbone, pixel_rays
from .hetero_fusion import _window_merge, _window_split
from .layers import NaiveDecoder


class CrossWinAttention(nn.Module):
    """BEV window queries x per-window image tokens from all cameras."""
    dim: int
    heads: int = 4
    dim_head: int = 32
    style: str = "local"
    bev_win: int = 4
    img_win: int = 4

    @nn.compact
    def __call__(self, bev_q, img_kv):
        # bev_q: (N, Hb, Wb, C); img_kv: (N, M, Hi, Wi, C)
        n, hb, wb, c = bev_q.shape
        m = img_kv.shape[1]
        inner = self.heads * self.dim_head

        q = nn.Dense(inner, use_bias=False)(bev_q)
        k = nn.Dense(inner, use_bias=False)(img_kv)
        v = nn.Dense(inner, use_bias=False)(img_kv)

        qw = _window_split(q, self.bev_win, self.style)
        # (N, X, Y, Tq, C') with X = hb/win ...
        kw = _window_split(k, self.img_win, self.style)
        vw = _window_split(v, self.img_win, self.style)
        # (N, M, Xi, Yi, Tk, C'): require Xi == X (same window grid count)
        x_w, y_w, tq = qw.shape[1], qw.shape[2], qw.shape[3]
        tk = kw.shape[4]

        def split_heads(t, tok):
            return t.reshape(*t.shape[:-2], tok, self.heads, self.dim_head)

        qh = split_heads(qw, tq) * self.dim_head ** -0.5
        kh = split_heads(kw, tk)
        vh = split_heads(vw, tk)

        # fold cameras into the key token axis per window
        sim = jnp.einsum("nxyqhd,nmxykhd->nxyhqmk", qh, kh,
                         preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(
            sim.reshape(n, x_w, y_w, self.heads, tq, m * tk), axis=-1
        ).reshape(sim.shape)
        out = jnp.einsum("nxyhqmk,nmxykhd->nxyqhd", attn, vh,
                         preferred_element_type=jnp.float32)
        out = out.reshape(n, x_w, y_w, tq, inner)
        out = _window_merge(out, self.bev_win, self.style, hb, wb)
        return nn.Dense(self.dim)(out)


class FAXBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    bev_win: int
    img_win: int

    @nn.compact
    def __call__(self, bev, img_feats):
        for style in ("local", "grid"):
            a = CrossWinAttention(
                self.dim, self.heads, self.dim_head, style,
                self.bev_win, self.img_win,
            )(nn.LayerNorm()(bev), img_feats)
            bev = bev + a
            ff = nn.Dense(self.dim)(
                nn.gelu(nn.Dense(2 * self.dim)(nn.LayerNorm()(bev)))
            )
            bev = bev + ff
        return bev


class FAXCameraEncoder(nn.Module):
    """(N, M, H, W, 3) images + calib -> (N, out, out, out_dim) BEV."""
    config: dict

    @nn.compact
    def __call__(self, images, intrinsics, extrinsics, train: bool = False):
        cfg = self.config
        dim = cfg.get("dim", 128)
        bev_hw = cfg.get("bev_size", 32)
        out_dim = cfg.get("out_dim", 256)
        heads = cfg.get("heads", 4)
        dim_head = cfg.get("dim_head", 32)
        bev_win = cfg.get("bev_window", 4)
        depth = cfg.get("depth", 2)
        n, m, img_h, img_w, _ = images.shape

        feats = make_image_backbone(cfg)(
            images.reshape(n * m, img_h, img_w, 3), train
        )
        fh, fw = feats.shape[1:3]
        feats = nn.Dense(dim)(feats)

        # camera-aware embedding (rays rotated into the agent frame)
        rays = pixel_rays(intrinsics.reshape(n * m, 3, 3), fh, fw,
                          img_h, img_w)
        rot = jnp.linalg.inv(
            extrinsics.reshape(n * m, 4, 4).astype(jnp.float32))
        dirs = jnp.einsum("bij,bhwj->bhwi", rot[:, :3, :3], rays,
                          precision=jax.lax.Precision.HIGHEST)
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-6)
        feats = feats + nn.Dense(dim)(nn.gelu(nn.Dense(dim)(dirs)))
        feats = feats.reshape(n, m, fh, fw, dim)

        # learned BEV prior (SinBEVT's sinusoidal/learned BEV embedding)
        bev_embed = self.param("bev_embedding",
                               nn.initializers.normal(0.02),
                               (bev_hw, bev_hw, dim))
        bev = jnp.broadcast_to(bev_embed[None], (n, bev_hw, bev_hw, dim))

        # window-grid compatibility: image windows must tile fh the same
        # number of times as bev windows tile bev_hw
        img_win = fh // (bev_hw // bev_win)
        for _ in range(depth):
            bev = FAXBlock(dim, heads, dim_head, bev_win, img_win)(
                bev, feats)

        bev = nn.Dense(out_dim)(bev)
        up = cfg.get("decoder_layers", 2)
        return NaiveDecoder(num_layer=up, num_ch_dec=[out_dim] * up,
                            use_upsample=True)(bev, train)
