"""Reference-faithful FAX / SinBEVT blocks (structural twins).

Exact JAX transcriptions of the reference camera->BEV cross-view stack
(reference: opencood/models/sub_modules/fax_modules.py): BEVEmbedding
grids, CrossWinAttention, CrossViewSwapAttention (local-window then
local-to-global window image->BEV cross attention with camera-geometry
embeddings from I^-1/E^-1 rays), the MaxViT-style full-map self
Attention, the per-scale ResNet bottleneck refinement, and the
pixel-unshuffle downsample — parameter-for-parameter so reference
checkpoints port (weight-copy parity in tests/test_fax_ref_parity.py).

The production serving path stays the TPU redesign in
:mod:`hmvit_tpu.models.fax` (camera axis folded into attention tokens);
these twins are the accuracy oracle and an opt-in faithful encoder
(camera config ``encoder: fax_ref``), the same twin pattern as the
deformable BEVFormer branch in :mod:`hmvit_tpu.models.bevformer`.

Layout note: public ``__call__`` signatures take the reference's NCHW /
(B, N, C, H, W) tensors to keep the transcription auditable; internals
convert to NHWC for TPU-friendly convs.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def generate_grid(height: int, width: int) -> np.ndarray:
    """Verbatim transcription of the reference ``generate_grid``
    (fax_modules.py:13-24) including its swapped meshgrid naming."""
    xs = np.linspace(0, 1, width, dtype=np.float32)
    ys = np.linspace(0, 1, height, dtype=np.float32)
    # torch: yy, xx = torch.meshgrid((xs, ys))  [default 'ij']
    yy, xx = np.meshgrid(xs, ys, indexing="ij")  # each (W, H)
    indices = np.stack([xx, yy], 0)  # (2, W, H)
    ones = np.ones((1,) + indices.shape[1:], np.float32)
    return np.concatenate([indices, ones], 0)[None]  # (1, 3, W, H)


def get_view_matrix(h=200, w=200, h_meters=100.0, w_meters=100.0,
                    offset=0.0) -> np.ndarray:
    """BEV-pixel -> ego-meters map (fax_modules.py:27-38)."""
    sh = h / h_meters
    sw = w / w_meters
    return np.array([
        [0.0, -sw, w / 2.0],
        [-sh, 0.0, h * offset + h / 2.0],
        [0.0, 0.0, 1.0],
    ], np.float32)


def bev_grids(bev_height, bev_width, h_meters, w_meters, offset,
              upsample_scales):
    """Per-scale egocentric BEV coordinate grids
    (fax_modules.py:70-84).  Returns list of (3, h, w) arrays."""
    v = get_view_matrix(bev_height, bev_width, h_meters, w_meters, offset)
    v_inv = np.linalg.inv(v)
    grids = []
    for scale in upsample_scales:
        h, w = bev_height // scale, bev_width // scale
        grid = generate_grid(h, w)[0].copy()  # (3, ?, ?)
        grid[0] = bev_width * grid[0]
        grid[1] = bev_height * grid[1]
        flat = v_inv @ grid.reshape(3, -1)
        grids.append(flat.reshape(3, *grid.shape[1:]))
    return grids


class BEVEmbedding(nn.Module):
    """Learned BEV prior + per-scale coordinate grids
    (fax_modules.py:41-92)."""
    dim: int
    sigma: float
    bev_height: int
    bev_width: int
    h_meters: float
    w_meters: float
    offset: float
    upsample_scales: tuple

    def setup(self):
        self.grids = bev_grids(self.bev_height, self.bev_width,
                               self.h_meters, self.w_meters, self.offset,
                               tuple(self.upsample_scales))
        h0 = self.bev_height // self.upsample_scales[0]
        w0 = self.bev_width // self.upsample_scales[0]
        self.learned_features = self.param(
            "learned_features",
            lambda key, shape: self.sigma * jax.random.normal(key, shape),
            (self.dim, h0, w0))

    def get_prior(self):
        return self.learned_features  # (d, H, W)


def _rearrange_windows(t, w1, w2):
    """(B, N, D, (x w1), (y w2)) -> (B, N, x, y, w1, w2, D)."""
    b, n, d, h, w = t.shape
    x, y = h // w1, w // w2
    t = t.reshape(b, n, d, x, w1, y, w2)
    return t.transpose(0, 1, 3, 5, 4, 6, 2)


def _merge_windows(t):
    """(B, x, y, w1, w2, D) -> (B, (x w1), (y w2), D)."""
    b, x, y, w1, w2, d = t.shape
    return t.transpose(0, 1, 3, 2, 4, 5).reshape(b, x * w1, y * w2, d)


class RefCrossWinAttention(nn.Module):
    """CrossWinAttention (fax_modules.py:184-246): per-window cross
    attention, BEV window queries x all cameras' window tokens, heads
    folded into batch, camera axis reduced by MEAN after projection."""
    dim: int
    heads: int
    dim_head: int
    qkv_bias: bool

    @nn.compact
    def __call__(self, q, k, v, skip=None):
        # q: (b, n, x, y, w1, w2, d); k/v: (b, n, x', y', w1', w2', d)
        b, n, qx, qy, qw1, qw2, _ = q.shape
        kw1, kw2 = k.shape[4], k.shape[5]
        inner = self.heads * self.dim_head
        scale = self.dim_head ** -0.5

        def flat(t, w1, w2):
            bb, nn_, x, y = t.shape[:4]
            t = t.transpose(0, 2, 3, 1, 4, 5, 6)  # b x y n w1 w2 d
            return t.reshape(bb, x * y, nn_ * w1 * w2, t.shape[-1])

        qf = flat(q, qw1, qw2)
        kf = flat(k, kw1, kw2)
        vf = flat(v, kw1, kw2)

        def proj(t, name):
            t = nn.LayerNorm(name=f"{name}_norm")(t)
            return nn.Dense(inner, use_bias=self.qkv_bias, name=name)(t)

        qp, kp, vp = proj(qf, "to_q"), proj(kf, "to_k"), proj(vf, "to_v")

        def heads_to_batch(t):
            bb, l, tok, _ = t.shape
            t = t.reshape(bb, l, tok, self.heads, self.dim_head)
            return t.transpose(0, 3, 1, 2, 4).reshape(
                bb * self.heads, l, tok, self.dim_head)

        qh, kh, vh = map(heads_to_batch, (qp, kp, vp))
        dot = scale * jnp.einsum("blqd,blkd->blqk", qh, kh,
                                 preferred_element_type=jnp.float32)
        att = jax.nn.softmax(dot, axis=-1)
        a = jnp.einsum("blqk,blkd->blqd", att, vh,
                       preferred_element_type=jnp.float32)
        a = a.reshape(b, self.heads, qx * qy, n * qw1 * qw2,
                      self.dim_head)
        a = a.transpose(0, 2, 3, 1, 4).reshape(
            b, qx * qy, n * qw1 * qw2, inner)
        z = nn.Dense(self.dim, name="proj")(a)
        z = z.reshape(b, qx, qy, n, qw1, qw2, self.dim)
        z = z.transpose(0, 3, 1, 2, 4, 5, 6)  # b n x y w1 w2 d
        z = z.mean(axis=1)  # reduce cameras
        if skip is not None:
            z = z + skip
        return z  # (b, x, y, w1, w2, d)


class RefCrossViewSwapAttention(nn.Module):
    """CrossViewSwapAttention (fax_modules.py:251-448): camera-geometry
    key embeddings, optional BEV positional embedding, local-window then
    local-to-global window cross attention with skips, two MLPs, final
    LayerNorm."""
    feat_height: int
    feat_width: int
    feat_dim: int
    dim: int
    index: int
    image_height: int
    image_width: int
    qkv_bias: bool
    q_win_size: tuple
    feat_win_size: tuple
    heads: int
    dim_head: int
    bev_embed_flag: bool
    skip: bool = True

    @nn.compact
    def __call__(self, x, bev_grid, feature, i_inv, e_inv,
                 train: bool = False):
        """x: (bl, d, H, W); bev_grid: (3, H, W) for this scale;
        feature: (bl, n, feat_dim, h, w); i_inv: (bl, n, 3, 3);
        e_inv: (bl, n, 4, 4).  Returns (bl, d, H, W)."""
        bl, n, _, fh, fw = feature.shape
        big_h, big_w = x.shape[2], x.shape[3]
        qw1, qw2 = self.q_win_size
        fw1, fw2 = self.feat_win_size

        pixel = jnp.asarray(
            generate_grid(self.feat_height, self.feat_width))  # 1 3 ? ?
        pixel = pixel.at[:, 0].multiply(self.image_width)
        pixel = pixel.at[:, 1].multiply(self.image_height)
        ph, pw = pixel.shape[2], pixel.shape[3]

        # camera-center embedding: E_inv translation column
        c = e_inv[..., -1:]  # (bl, n, 4, 1)
        c_flat = c.reshape(bl * n, 1, 1, 4)  # NHWC 1x1 "image"
        c_embed = nn.Conv(self.dim, (1, 1), use_bias=False,
                          name="cam_embed")(c_flat)  # (bln, 1, 1, d)

        # per-pixel ray embedding: E_inv @ pad(I_inv @ pixel)
        pixel_flat = pixel.reshape(1, 1, 3, ph * pw)
        cam = i_inv @ pixel_flat  # (bl, n, 3, hw)
        cam = jnp.concatenate(
            [cam, jnp.ones_like(cam[:, :, :1])], axis=2)  # (bl, n, 4, hw)
        d_ray = e_inv @ cam  # (bl, n, 4, hw)
        d_flat = d_ray.reshape(bl * n, 4, ph, pw).transpose(0, 2, 3, 1)
        d_embed = nn.Conv(self.dim, (1, 1), use_bias=False,
                          name="img_embed")(d_flat)  # (bln, ph, pw, d)

        img_embed = d_embed - c_embed
        img_embed = img_embed / (
            jnp.linalg.norm(img_embed, axis=-1, keepdims=True) + 1e-7)

        def bn_relu_conv(t, name):
            t = nn.BatchNorm(use_running_average=not train,
                             epsilon=1e-5, momentum=0.9,
                             name=f"{name}_bn")(t)
            t = nn.relu(t)
            return nn.Conv(self.dim, (1, 1), use_bias=False, name=name)(t)

        feature_flat = feature.reshape(
            bl * n, self.feat_dim, fh, fw).transpose(0, 2, 3, 1)
        key_flat = img_embed + bn_relu_conv(feature_flat, "feature_proj")
        val_flat = bn_relu_conv(feature_flat, "feature_linear")

        if self.bev_embed_flag:
            world = bev_grid[:2]  # (2, H, W)
            w_in = world.transpose(1, 2, 0)[None]  # (1, H, W, 2)
            w_embed = nn.Conv(self.dim, (1, 1), name="bev_embed")(w_in)
            # broadcast: (bln, H, W, d) = (1, H, W, d) - (bln, 1, 1, d)
            bev_embed = w_embed - c_embed.reshape(bl * n, 1, 1, self.dim)
            bev_embed = bev_embed / (
                jnp.linalg.norm(bev_embed, axis=-1, keepdims=True) + 1e-7)
            query_pos = bev_embed.reshape(bl, n, big_h, big_w, self.dim)
            query = query_pos.transpose(0, 1, 4, 2, 3) + x[:, None]
        else:
            query = jnp.broadcast_to(
                x[:, None], (bl, n, self.dim, big_h, big_w))

        key = key_flat.transpose(0, 3, 1, 2).reshape(
            bl, n, self.dim, ph, pw)
        val = val_flat.transpose(0, 3, 1, 2).reshape(
            bl, n, self.dim, ph, pw)

        # pad divisible by the feature window (reference pad_divisble)
        def pad_div(t, w1, w2):
            h, w = t.shape[-2], t.shape[-1]
            padh = (w1 - h % w1) % w1
            padw = (w2 - w % w2) % w2
            if padh or padw:
                t = jnp.pad(t, ((0, 0),) * (t.ndim - 2)
                            + ((0, padh), (0, padw)))
            return t

        key = pad_div(key, fw1, fw2)
        val = pad_div(val, fw1, fw2)

        attend_1 = RefCrossWinAttention(self.dim, self.heads,
                                        self.dim_head, self.qkv_bias,
                                        name="cross_win_attend_1")
        attend_2 = RefCrossWinAttention(self.dim, self.heads,
                                        self.dim_head, self.qkv_bias,
                                        name="cross_win_attend_2")

        # --- local-to-local: (x w1)(y w2) windows on both sides
        qw = _rearrange_windows(query, qw1, qw2)
        kw = _rearrange_windows(key, fw1, fw2)
        vw = _rearrange_windows(val, fw1, fw2)
        skip1 = None
        if self.skip:
            skip1 = _rearrange_windows(
                x[:, None], qw1, qw2)[:, 0]  # (bl, x, y, w1, w2, d)
        q1 = attend_1(qw, kw, vw, skip=skip1)
        q1 = _merge_windows(q1)  # (bl, H, W, d)

        def mlp(t, name):
            h = nn.Dense(2 * self.dim, name=f"{name}_fc1")(t)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(self.dim, name=f"{name}_fc2")(h)

        q1 = q1 + mlp(nn.LayerNorm(name="prenorm_1")(q1), "mlp_1")

        x_skip = q1  # (bl, H, W, d)
        q2_in = jnp.broadcast_to(
            q1[:, None], (bl, n, big_h, big_w, self.dim))
        q2_in = q2_in.transpose(0, 1, 4, 2, 3)  # (bl, n, d, H, W)

        # --- local-to-global: queries windowed, keys/vals GRID
        # partitioned (w1 x)(w2 y)
        qg = _rearrange_windows(q2_in, qw1, qw2)

        def grid_partition(t, w1, w2):
            # (b, n, d, (w1 x), (w2 y)) -> (b, n, x, y, w1, w2, d)
            b_, n_, d_, h, w = t.shape
            x_, y_ = h // w1, w // w2
            t = t.reshape(b_, n_, d_, w1, x_, w2, y_)
            return t.transpose(0, 1, 4, 6, 3, 5, 2)

        kg = grid_partition(key, fw1, fw2)
        vg = grid_partition(val, fw1, fw2)
        skip2 = None
        if self.skip:
            skip2 = _rearrange_windows(
                x_skip.transpose(0, 3, 1, 2)[:, None], qw1, qw2)[:, 0]
        q2 = attend_2(qg, kg, vg, skip=skip2)
        q2 = _merge_windows(q2)

        q2 = q2 + mlp(nn.LayerNorm(name="prenorm_2")(q2), "mlp_2")
        q2 = nn.LayerNorm(name="postnorm")(q2)
        return q2.transpose(0, 3, 1, 2)  # (bl, d, H, W)


class RefAttention(nn.Module):
    """MaxViT-style full-map self attention with relative position bias
    (fax_modules.py:95-181); window_size must equal the map side."""
    dim: int
    dim_head: int = 32
    window_size: int = 25

    @nn.compact
    def __call__(self, x):
        # x: (b, d, h, w)
        b, d, h, w = x.shape
        heads = self.dim // self.dim_head
        scale = self.dim_head ** -0.5
        t = x.transpose(0, 2, 3, 1).reshape(b, h * w, d)
        qkv = nn.Dense(self.dim * 3, use_bias=False, name="to_qkv")(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(u):
            return u.reshape(b, h * w, heads, self.dim_head).transpose(
                0, 2, 1, 3)

        qh, kh, vh = map(split_heads, (q, k, v))
        sim = jnp.einsum("bhid,bhjd->bhij", qh * scale, kh,
                         preferred_element_type=jnp.float32)

        ws = self.window_size
        table = self.param("rel_pos_bias", nn.initializers.normal(1.0),
                           ((2 * ws - 1) ** 2, heads))
        pos = np.arange(ws)
        grid = np.stack(np.meshgrid(pos, pos, indexing="ij"))
        grid = grid.reshape(2, -1).T  # (ws*ws, 2)
        rel = grid[:, None] - grid[None]
        rel += ws - 1
        idx = (rel * np.array([2 * ws - 1, 1])).sum(-1)
        bias = table[jnp.asarray(idx)]  # (T, T, heads)
        sim = sim + bias.transpose(2, 0, 1)[None]

        att = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", att, vh,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, self.dim)
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        return out.reshape(b, h, w, self.dim).transpose(0, 3, 1, 2)


class RefBottleneck(nn.Module):
    """torchvision ResNet Bottleneck(c, c//4) as used by
    ``ResNetBottleNeck`` (fax_modules.py:10): 1x1 -> 3x3 -> 1x1 with
    BN+ReLU, identity residual (no downsample)."""
    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (b, c, h, w) -> NHWC internally
        t = x.transpose(0, 2, 3, 1)
        width = self.channels // 4

        def bn(u, name):
            return nn.BatchNorm(use_running_average=not train,
                                epsilon=1e-5, momentum=0.9, name=name)(u)

        h = nn.relu(bn(nn.Conv(width, (1, 1), use_bias=False,
                               name="conv1")(t), "bn1"))
        h = nn.relu(bn(nn.Conv(width, (3, 3),
                               padding=((1, 1), (1, 1)), use_bias=False,
                               name="conv2")(h), "bn2"))
        h = bn(nn.Conv(self.channels, (1, 1), use_bias=False,
                       name="conv3")(h), "bn3")
        return nn.relu(t + h).transpose(0, 3, 1, 2)


class RefDownsample(nn.Module):
    """Between-scale downsample: conv(d -> d/4) -> PixelUnshuffle(2) ->
    conv3x3 -> BN -> ReLU -> conv1x1 -> BN (fax_modules.py:478-493)."""
    dim_in: int
    dim_out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = x.transpose(0, 2, 3, 1)
        t = nn.Conv(self.dim_in // 4, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv_pre")(t)
        # torch PixelUnshuffle(2): channel index = c*4 + i*2 + j
        b, h, w, c = t.shape
        t = t.reshape(b, h // 2, 2, w // 2, 2, c)
        t = t.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2,
                                                  c * 4)
        t = nn.Conv(self.dim_out, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv_mid")(t)
        t = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="bn_mid")(t)
        t = nn.relu(t)
        t = nn.Conv(self.dim_out, (1, 1), use_bias=False,
                    name="conv_post")(t)
        t = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="bn_post")(t)
        return t.transpose(0, 3, 1, 2)


class RefFAXModule(nn.Module):
    """Full FAXModule (fax_modules.py:451-525): learned BEV prior
    refined per image scale by CrossViewSwapAttention + bottleneck
    layers + pixel-unshuffle downsample, then full-map self attention.

    config keys mirror the reference: dim (per scale), middle (per
    scale bottleneck count), bev_embedding {sigma, bev_height,
    bev_width, h_meters, w_meters, offset, upsample_scales},
    cross_view {image_height, image_width, qkv_bias, heads, dim_head,
    no_image_features?}, cross_view_swap {q_win_size, feat_win_size,
    bev_embedding_flag, rel_pos_emb?, skip?}, self_attn {dim_head,
    window_size}, backbone_output_shape (list of (_, _, _, c, h, w)).
    """
    config: dict

    @nn.compact
    def __call__(self, features, i_inv, e_inv, train: bool = False):
        """features: list of per-scale (bl, n, c_i, h_i, w_i); i_inv:
        (bl, n, 3, 3); e_inv: (bl, n, 4, 4).  Returns (bl, d, H, W)."""
        cfg = self.config
        dims = cfg["dim"]
        middle = cfg["middle"]
        cv = cfg["cross_view"]
        cvs = cfg["cross_view_swap"]
        be = cfg["bev_embedding"]
        shapes = cfg["backbone_output_shape"]

        bev = BEVEmbedding(dims[0], be["sigma"], be["bev_height"],
                           be["bev_width"], be["h_meters"],
                           be["w_meters"], be["offset"],
                           tuple(be["upsample_scales"]),
                           name="bev_embedding")
        grids = bev.grids
        bl = features[0].shape[0]
        x = jnp.broadcast_to(bev.get_prior()[None],
                             (bl,) + bev.get_prior().shape)

        for i, feature in enumerate(features):
            _, _, _, feat_dim, fh, fw = shapes[i]
            cva = RefCrossViewSwapAttention(
                feat_height=fh, feat_width=fw, feat_dim=feat_dim,
                dim=dims[i], index=i,
                image_height=cv["image_height"],
                image_width=cv["image_width"],
                qkv_bias=cv["qkv_bias"],
                q_win_size=tuple(cvs["q_win_size"][i]),
                feat_win_size=tuple(cvs["feat_win_size"][i]),
                heads=cv["heads"][i], dim_head=cv["dim_head"][i],
                bev_embed_flag=cvs["bev_embedding_flag"][i],
                name=f"cross_views_{i}")
            x = cva(x, jnp.asarray(grids[i]), feature, i_inv, e_inv,
                    train)
            for j in range(middle[i]):
                x = RefBottleneck(dims[i],
                                  name=f"layers_{i}_{j}")(x, train)
            if i < len(features) - 1:
                x = RefDownsample(dims[i], dims[i + 1],
                                  name=f"downsample_layers_{i}")(x, train)

        sa = cfg.get("self_attn", {})
        x = RefAttention(dims[-1], dim_head=sa.get("dim_head", 32),
                         window_size=sa.get("window_size", x.shape[-1]),
                         name="self_attn")(x)
        return x


class FAXRefCameraEncoder(nn.Module):
    """Opt-in faithful FAX camera->BEV encoder (camera config
    ``encoder: fax_ref``): multi-scale ResNet trunk + the exact
    reference FAXModule stack, adapted to the repo's encoder interface
    ((N, M, H, W, 3) images + calib -> (N, H', W', out_dim) NHWC BEV).
    Structure-parity path for porting reference checkpoints; the TPU
    redesign in :mod:`hmvit_tpu.models.fax` remains the serving
    default."""
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
        # NHWC per (n*m) -> reference layout (n, m, c, h, w)
        features = [f.reshape(n, m, *f.shape[1:]).transpose(0, 1, 4, 2, 3)
                    for f in feats]
        shapes = [(1, 1, 1, f.shape[2], f.shape[3], f.shape[4])
                  for f in features]

        n_scales = len(features)
        dim = int(cfg.get("dim", 128))
        bev = int(cfg.get("bev_size", 32))
        win = int(cfg.get("window", 4))
        fax_cfg = {
            "dim": [dim] * n_scales,
            "middle": list(cfg.get("middle", [2] * n_scales)),
            "backbone_output_shape": shapes,
            "bev_embedding": {
                "sigma": 1.0,
                # prior lives at the first scale; later scales halve it
                "bev_height": bev * (2 ** (n_scales - 1)),
                "bev_width": bev * (2 ** (n_scales - 1)),
                "h_meters": float(cfg.get("bev_range", 100.0)),
                "w_meters": float(cfg.get("bev_range", 100.0)),
                "offset": 0.0,
                "upsample_scales": [2 ** (n_scales - 1 - i)
                                    for i in range(n_scales)][::-1],
            },
            "cross_view": {
                "image_height": img_h, "image_width": img_w,
                "qkv_bias": True,
                "heads": list(cfg.get("heads_list",
                                      [cfg.get("heads", 4)] * n_scales)),
                "dim_head": list(cfg.get("dim_head_list",
                                         [cfg.get("dim_head", 32)]
                                         * n_scales)),
            },
            "cross_view_swap": {
                "q_win_size": [[win, win]] * n_scales,
                # CrossWinAttention needs equal window COUNTS on both
                # sides: feat_win = fh * win / x_size per scale
                "feat_win_size": [
                    [max(1, shapes[i][4] * win
                         // (bev * (2 ** (n_scales - 1 - i))))] * 2
                    for i in range(n_scales)],
                "bev_embedding_flag": [i == 0 for i in range(n_scales)],
            },
            "self_attn": {"dim_head": cfg.get("dim_head", 32),
                          "window_size": bev},
        }
        i_inv = jnp.linalg.inv(
            intrinsics.reshape(n, m, 3, 3).astype(jnp.float32))
        e_inv = jnp.linalg.inv(
            extrinsics.reshape(n, m, 4, 4).astype(jnp.float32))
        x = RefFAXModule(fax_cfg, name="fax")(features, i_inv, e_inv,
                                              train)
        x = x.transpose(0, 2, 3, 1)  # NHWC
        out_dim = int(cfg.get("out_dim", 256))
        x = nn.Dense(out_dim, name="out_proj")(x)
        up = int(cfg.get("decoder_layers", 2))
        if up:
            x = NaiveDecoder(num_layer=up, num_ch_dec=[out_dim] * up,
                             use_upsample=True)(x, train)
        return x
