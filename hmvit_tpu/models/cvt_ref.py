"""Reference-faithful CVT (Cross-View Transformer) blocks.

Exact JAX transcriptions of the reference CVT camera->BEV stack
(reference: opencood/models/sub_modules/cvt_modules.py): single-grid
BEVEmbedding, global CrossAttention (per-camera queries, camera axis
folded into the key token axis), CrossViewAttention with the same
I^-1/E^-1 geometry embeddings as FAX, and CrossViewModule (per-scale
attention + ResNet bottleneck refinement) — parameter-for-parameter so
reference checkpoints port (weight-copy parity in
tests/test_fax_ref_parity.py).  The production path stays the TPU
redesign in :mod:`hmvit_tpu.models.cvt`.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .fax_ref import RefBottleneck, generate_grid, get_view_matrix


def cvt_bev_grid(bev_height, bev_width, h_meters, w_meters, offset,
                 num_decoder_blocks):
    """Single egocentric BEV grid at 1/2^blocks resolution
    (cvt_modules.py:66-88)."""
    h = bev_height // (2 ** num_decoder_blocks)
    w = bev_width // (2 ** num_decoder_blocks)
    grid = generate_grid(h, w)[0].copy()
    grid[0] = bev_width * grid[0]
    grid[1] = bev_height * grid[1]
    v = get_view_matrix(bev_height, bev_width, h_meters, w_meters, offset)
    v_inv = np.linalg.inv(v)
    flat = v_inv @ grid.reshape(3, -1)
    return flat.reshape(3, *grid.shape[1:])


class RefCrossAttention(nn.Module):
    """Global cross attention (cvt_modules.py:95-166): per-camera BEV
    queries, softmax over every camera's image tokens, built-in
    prenorm-MLP-postnorm tail."""
    dim: int
    heads: int
    dim_head: int
    qkv_bias: bool

    @nn.compact
    def __call__(self, q, k, v, skip=None):
        # q: (b, n, d, H, W); k/v: (b, n, d, h, w)
        b, n, _, big_h, big_w = q.shape
        h, w = k.shape[3], k.shape[4]
        inner = self.heads * self.dim_head
        scale = self.dim_head ** -0.5

        qf = q.transpose(0, 1, 3, 4, 2).reshape(b, n, big_h * big_w,
                                                self.dim)
        kf = k.transpose(0, 1, 3, 4, 2).reshape(b, n, h * w, self.dim)
        vf = v.transpose(0, 1, 3, 4, 2).reshape(b, n * h * w, self.dim)

        def proj(t, name):
            t = nn.LayerNorm(name=f"{name}_norm")(t)
            return nn.Dense(inner, use_bias=self.qkv_bias, name=name)(t)

        qp, kp, vp = proj(qf, "to_q"), proj(kf, "to_k"), proj(vf, "to_v")

        def heads_to_batch(t):
            t2 = t.reshape(*t.shape[:-1], self.heads, self.dim_head)
            # 'b ... (m d) -> (b m) ... d'
            perm = (0, t2.ndim - 2) + tuple(range(1, t2.ndim - 2)) \
                + (t2.ndim - 1,)
            t2 = t2.transpose(perm)
            return t2.reshape(b * self.heads, *t2.shape[2:])

        qh = heads_to_batch(qp)  # (bm, n, Q, d)
        kh = heads_to_batch(kp)  # (bm, n, K, d)
        vh = heads_to_batch(vp)  # (bm, nK, d)

        dot = scale * jnp.einsum("bnqd,bnkd->bnqk", qh, kh,
                                 preferred_element_type=jnp.float32)
        dot = dot.transpose(0, 2, 1, 3).reshape(
            b * self.heads, big_h * big_w, n * h * w)
        att = jax.nn.softmax(dot, axis=-1)
        a = jnp.einsum("bqk,bkd->bqd", att, vh,
                       preferred_element_type=jnp.float32)
        a = a.reshape(b, self.heads, big_h * big_w, self.dim_head)
        a = a.transpose(0, 2, 1, 3).reshape(b, big_h * big_w, inner)

        z = nn.Dense(self.dim, name="proj")(a)
        if skip is not None:
            z = z + skip.transpose(0, 2, 3, 1).reshape(
                b, big_h * big_w, self.dim)
        z = nn.LayerNorm(name="prenorm")(z)
        h1 = nn.Dense(2 * self.dim, name="mlp_fc1")(z)
        h1 = nn.gelu(h1, approximate=False)
        z = z + nn.Dense(self.dim, name="mlp_fc2")(h1)
        z = nn.LayerNorm(name="postnorm")(z)
        return z.reshape(b, big_h, big_w, self.dim).transpose(0, 3, 1, 2)


class RefCrossViewAttention(nn.Module):
    """CrossViewAttention (cvt_modules.py:169-283): camera-geometry
    key/query embeddings + global cross attention."""
    feat_height: int
    feat_width: int
    feat_dim: int
    dim: int
    image_height: int
    image_width: int
    qkv_bias: bool
    heads: int
    dim_head: int
    skip: bool = True
    no_image_features: bool = False

    @nn.compact
    def __call__(self, x, bev_grid, feature, i_inv, e_inv,
                 train: bool = False):
        """x: (bl, d, H, W); bev_grid: (3, H, W); feature:
        (bl, n, feat_dim, h, w).  Returns (bl, d, H, W)."""
        bl, n = feature.shape[:2]
        big_h, big_w = x.shape[2], x.shape[3]
        fh, fw = feature.shape[3], feature.shape[4]

        pixel = jnp.asarray(
            generate_grid(self.feat_height, self.feat_width))
        pixel = pixel.at[:, 0].multiply(self.image_width)
        pixel = pixel.at[:, 1].multiply(self.image_height)
        ph, pw = pixel.shape[2], pixel.shape[3]

        c = e_inv[..., -1:]
        c_flat = c.reshape(bl * n, 1, 1, 4)
        c_embed = nn.Conv(self.dim, (1, 1), use_bias=False,
                          name="cam_embed")(c_flat)

        pixel_flat = pixel.reshape(1, 1, 3, ph * pw)
        cam = i_inv @ pixel_flat
        cam = jnp.concatenate(
            [cam, jnp.ones_like(cam[:, :, :1])], axis=2)
        d_ray = e_inv @ cam
        d_flat = d_ray.reshape(bl * n, 4, ph, pw).transpose(0, 2, 3, 1)
        d_embed = nn.Conv(self.dim, (1, 1), use_bias=False,
                          name="img_embed")(d_flat)
        img_embed = d_embed - c_embed
        img_embed = img_embed / (
            jnp.linalg.norm(img_embed, axis=-1, keepdims=True) + 1e-7)

        world = bev_grid[:2]
        w_in = world.transpose(1, 2, 0)[None]
        w_embed = nn.Conv(self.dim, (1, 1), name="bev_embed")(w_in)
        bev_embed = w_embed - c_embed.reshape(bl * n, 1, 1, self.dim)
        bev_embed = bev_embed / (
            jnp.linalg.norm(bev_embed, axis=-1, keepdims=True) + 1e-7)
        query_pos = bev_embed.reshape(bl, n, big_h, big_w, self.dim)

        def bn_relu_conv(t, name):
            t = nn.BatchNorm(use_running_average=not train,
                             epsilon=1e-5, momentum=0.9,
                             name=f"{name}_bn")(t)
            t = nn.relu(t)
            return nn.Conv(self.dim, (1, 1), use_bias=False, name=name)(t)

        feature_flat = feature.reshape(
            bl * n, self.feat_dim, fh, fw).transpose(0, 2, 3, 1)
        if self.no_image_features:
            key_flat = img_embed
        else:
            key_flat = img_embed + bn_relu_conv(feature_flat,
                                                "feature_proj")
        val_flat = bn_relu_conv(feature_flat, "feature_linear")

        query = query_pos.transpose(0, 1, 4, 2, 3) + x[:, None]
        key = key_flat.transpose(0, 3, 1, 2).reshape(
            bl, n, self.dim, ph, pw)
        val = val_flat.transpose(0, 3, 1, 2).reshape(
            bl, n, self.dim, ph, pw)

        return RefCrossAttention(
            self.dim, self.heads, self.dim_head, self.qkv_bias,
            name="cross_attend")(query, key, val,
                                 skip=x if self.skip else None)


class RefCrossViewModule(nn.Module):
    """CrossViewModule (cvt_modules.py:286-330): learned BEV prior
    refined per scale by CrossViewAttention + bottlenecks; all scales
    share the single BEV grid."""
    config: dict

    @nn.compact
    def __call__(self, features, i_inv, e_inv, train: bool = False):
        """features: list of (bl, n, c_i, h_i, w_i).  Returns
        (bl, d, H, W)."""
        cfg = self.config
        dim = cfg["dim"]
        middle = cfg["middle"]
        cv = cfg["cross_view"]
        be = cfg["bev_embedding"]
        shapes = cfg["backbone_output_shape"]

        grid = cvt_bev_grid(be["bev_height"], be["bev_width"],
                            be["h_meters"], be["w_meters"], be["offset"],
                            len(be["decoder_blocks"]))
        h0, w0 = grid.shape[1], grid.shape[2]
        prior = self.param(
            "bev_embedding_learned_features",
            lambda key, shape: be["sigma"] * jax.random.normal(key, shape),
            (dim, h0, w0))

        bl = features[0].shape[0]
        x = jnp.broadcast_to(prior[None], (bl,) + prior.shape)
        for i, feature in enumerate(features):
            _, _, _, feat_dim, fh, fw = shapes[i]
            x = RefCrossViewAttention(
                feat_height=fh, feat_width=fw, feat_dim=feat_dim,
                dim=dim, image_height=cv["image_height"],
                image_width=cv["image_width"],
                qkv_bias=cv["qkv_bias"], heads=cv["heads"],
                dim_head=cv["dim_head"], skip=cv.get("skip", True),
                no_image_features=cv.get("no_image_features", False),
                name=f"cross_views_{i}")(
                x, jnp.asarray(grid), feature, i_inv, e_inv, train)
            for j in range(middle[i]):
                x = RefBottleneck(dim, name=f"layers_{i}_{j}")(x, train)
        return x


class CVTRefCameraEncoder(nn.Module):
    """Opt-in faithful CVT camera->BEV encoder (camera config
    ``encoder: cvt_ref``): multi-scale ResNet trunk + the exact
    reference CrossViewModule, adapted to the repo encoder interface
    ((N, M, H, W, 3) images + calib -> (N, H', W', out_dim) NHWC BEV)."""
    config: dict

    @nn.compact
    def __call__(self, images, intrinsics, extrinsics,
                 train: bool = False):
        from .layers import NaiveDecoder
        from .resnet import ResNetEncoder

        cfg = self.config
        n, m, img_h, img_w, _ = images.shape
        id_pick = tuple(cfg.get("id_pick", (2, 3)))
        trunk = ResNetEncoder(arch=cfg.get("backbone", "resnet34"),
                              id_pick=id_pick, name="trunk")
        feats = trunk(images.reshape(n * m, img_h, img_w, 3), train)
        if not isinstance(feats, (list, tuple)):
            feats = [feats]
        features = [f.reshape(n, m, *f.shape[1:]).transpose(0, 1, 4, 2, 3)
                    for f in feats]
        shapes = [(1, 1, 1, f.shape[2], f.shape[3], f.shape[4])
                  for f in features]

        n_scales = len(features)
        dim = int(cfg.get("dim", 128))
        bev = int(cfg.get("bev_size", 32))
        n_blocks = int(cfg.get("decoder_blocks", 1))
        cvm_cfg = {
            "dim": dim,
            "middle": list(cfg.get("middle", [2] * n_scales)),
            "backbone_output_shape": shapes,
            "bev_embedding": {
                "sigma": 1.0,
                # single shared grid at bev resolution: bev_height /
                # 2**decoder_blocks == bev_size
                "bev_height": bev * (2 ** n_blocks),
                "bev_width": bev * (2 ** n_blocks),
                "h_meters": float(cfg.get("bev_range", 100.0)),
                "w_meters": float(cfg.get("bev_range", 100.0)),
                "offset": 0.0,
                "decoder_blocks": list(range(n_blocks)),
            },
            "cross_view": {
                "image_height": img_h, "image_width": img_w,
                "qkv_bias": True, "heads": int(cfg.get("heads", 4)),
                "dim_head": int(cfg.get("dim_head", 32)),
                "no_image_features": False, "skip": True,
            },
        }
        i_inv = jnp.linalg.inv(
            intrinsics.reshape(n, m, 3, 3).astype(jnp.float32))
        e_inv = jnp.linalg.inv(
            extrinsics.reshape(n, m, 4, 4).astype(jnp.float32))
        x = RefCrossViewModule(cvm_cfg, name="cvt")(features, i_inv,
                                                    e_inv, train)
        x = x.transpose(0, 2, 3, 1)
        out_dim = int(cfg.get("out_dim", 256))
        x = nn.Dense(out_dim, name="out_proj")(x)
        up = int(cfg.get("decoder_layers", 2))
        if up:
            x = NaiveDecoder(num_layer=up, num_ch_dec=[out_dim] * up,
                             use_upsample=True)(x, train)
        return x
