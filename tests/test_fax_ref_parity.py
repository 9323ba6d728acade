"""GOLDEN weight-copy parity for the reference-faithful FAX twins
(hmvit_tpu/models/fax_ref.py) vs the reference torch modules executed
directly (reference: opencood/models/sub_modules/fax_modules.py):
CrossViewSwapAttention (both window phases, geometry embeddings, skips)
and the full FAXModule (BEV prior, per-scale bottlenecks,
pixel-unshuffle downsample, final self attention)."""
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.compile  # compile-heavy: full lane only

torch = pytest.importorskip("torch")

from test_reference_parity import (  # noqa: E402
    _bn_params,
    _conv_kernel,
    _install_reference,
)


def _install_torchvision_stub():
    """fax/cvt modules only need torchvision's ResNet Bottleneck; this
    is a faithful transcription of torchvision.models.resnet.Bottleneck
    (test-only oracle, torchvision is absent in this env)."""
    if "torchvision" in sys.modules:
        return
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or tnn.BatchNorm2d
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
            self.bn1 = norm_layer(width)
            self.conv2 = tnn.Conv2d(width, width, 3, stride=stride,
                                    padding=dilation, groups=groups,
                                    dilation=dilation, bias=False)
            self.bn2 = norm_layer(width)
            self.conv3 = tnn.Conv2d(width, planes * self.expansion, 1,
                                    bias=False)
            self.bn3 = norm_layer(planes * self.expansion)
            self.relu = tnn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_resnet = types.ModuleType("torchvision.models.resnet")
    tv_resnet.Bottleneck = Bottleneck
    tv_models.resnet = tv_resnet
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.models.resnet"] = tv_resnet


def _ln(m):
    import jax.numpy as jnp

    return {"scale": jnp.asarray(m.weight.detach().numpy()),
            "bias": jnp.asarray(m.bias.detach().numpy())}


def _lin(m):
    import jax.numpy as jnp

    out = {"kernel": jnp.asarray(m.weight.detach().numpy().T)}
    if m.bias is not None:
        out["bias"] = jnp.asarray(m.bias.detach().numpy())
    return out


def _conv(m):
    import jax.numpy as jnp

    out = {"kernel": _conv_kernel(m)}
    if m.bias is not None:
        out["bias"] = jnp.asarray(m.bias.detach().numpy())
    return out


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)


def _attend_params(ref):
    return {
        "to_q_norm": _ln(ref.to_q[0]), "to_q": _lin(ref.to_q[1]),
        "to_k_norm": _ln(ref.to_k[0]), "to_k": _lin(ref.to_k[1]),
        "to_v_norm": _ln(ref.to_v[0]), "to_v": _lin(ref.to_v[1]),
        "proj": _lin(ref.proj),
    }


def _cva_variables(ref):
    """Reference CrossViewSwapAttention -> flax param/stat trees."""
    params = {
        "cam_embed": _conv(ref.cam_embed),
        "img_embed": _conv(ref.img_embed),
        "feature_proj": _conv(ref.feature_proj[2]),
        "feature_linear": _conv(ref.feature_linear[2]),
        "cross_win_attend_1": _attend_params(ref.cross_win_attend_1),
        "cross_win_attend_2": _attend_params(ref.cross_win_attend_2),
        "prenorm_1": _ln(ref.prenorm_1),
        "prenorm_2": _ln(ref.prenorm_2),
        "postnorm": _ln(ref.postnorm),
        "mlp_1_fc1": _lin(ref.mlp_1[0]), "mlp_1_fc2": _lin(ref.mlp_1[2]),
        "mlp_2_fc1": _lin(ref.mlp_2[0]), "mlp_2_fc2": _lin(ref.mlp_2[2]),
    }
    if ref.bev_embed_flag:
        params["bev_embed"] = _conv(ref.bev_embed)
    stats = {}
    for name, seq in (("feature_proj", ref.feature_proj),
                      ("feature_linear", ref.feature_linear)):
        bnp, bns = _bn_params(seq[0])
        params[f"{name}_bn"] = bnp
        stats[f"{name}_bn"] = bns
    return params, stats


def _make_calib(bl, n, seed):
    rng = np.random.default_rng(seed)
    intrinsic = np.tile(np.eye(3, dtype=np.float32), (bl, n, 1, 1))
    intrinsic[:, :, 0, 0] = rng.uniform(50, 60, (bl, n))
    intrinsic[:, :, 1, 1] = rng.uniform(50, 60, (bl, n))
    intrinsic[:, :, 0, 2] = 32.0
    intrinsic[:, :, 1, 2] = 32.0
    extrinsic = np.tile(np.eye(4, dtype=np.float32), (bl, n, 1, 1))
    ang = rng.uniform(-0.5, 0.5, (bl, n))
    extrinsic[:, :, 0, 0] = np.cos(ang)
    extrinsic[:, :, 0, 1] = -np.sin(ang)
    extrinsic[:, :, 1, 0] = np.sin(ang)
    extrinsic[:, :, 1, 1] = np.cos(ang)
    extrinsic[:, :, :3, 3] = rng.uniform(-2, 2, (bl, n, 3))
    i_inv = np.linalg.inv(intrinsic)
    e_inv = np.linalg.inv(extrinsic)
    return i_inv.astype(np.float32), e_inv.astype(np.float32)


def test_cross_view_swap_attention_matches_reference():
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.fax_ref import (
        RefCrossViewSwapAttention,
        bev_grids,
    )

    _install_reference()
    _install_torchvision_stub()
    from opencood.models.sub_modules.fax_modules import (
        BEVEmbedding as RefBEVEmbedding,
        CrossViewSwapAttention as RefCVA,
    )

    torch.manual_seed(3)
    bl, n, dim, feat_dim, fh = 2, 2, 32, 24, 16
    big = 16
    ref_bev = RefBEVEmbedding(dim, sigma=1.0, bev_height=big,
                              bev_width=big, h_meters=100.0,
                              w_meters=100.0, offset=0.0,
                              upsample_scales=[1, 2])
    ref = RefCVA(fh, fh, feat_dim, dim, 0, 64, 64, qkv_bias=True,
                 q_win_size=[[4, 4], [4, 4]],
                 feat_win_size=[[4, 4], [4, 4]],
                 heads=[2, 2], dim_head=[16, 16],
                 bev_embedding_flag=[True, False]).eval()
    _randomize_bn(ref)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(bl, dim, big, big)).astype(np.float32)
    feature = rng.normal(size=(bl, n, feat_dim, fh, fh)).astype(
        np.float32)
    i_inv, e_inv = _make_calib(bl, n, 3)

    with torch.no_grad():
        want = ref(0, torch.from_numpy(x), ref_bev,
                   torch.from_numpy(feature), torch.from_numpy(i_inv),
                   torch.from_numpy(e_inv)).numpy()

    ours = RefCrossViewSwapAttention(
        feat_height=fh, feat_width=fh, feat_dim=feat_dim, dim=dim,
        index=0, image_height=64, image_width=64, qkv_bias=True,
        q_win_size=(4, 4), feat_win_size=(4, 4), heads=2, dim_head=16,
        bev_embed_flag=True)
    grid0 = bev_grids(big, big, 100.0, 100.0, 0.0, (1, 2))[0]
    args = (jnp.asarray(x), jnp.asarray(grid0), jnp.asarray(feature),
            jnp.asarray(i_inv), jnp.asarray(e_inv))
    ours.init(jax.random.key(0), *args)
    params, stats = _cva_variables(ref)
    got = np.asarray(ours.apply(
        {"params": params, "batch_stats": stats}, *args))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_full_fax_module_matches_reference():
    """FAXModule end-to-end over 2 scales: CVSA -> bottlenecks ->
    pixel-unshuffle downsample -> CVSA -> bottlenecks -> self attn."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.fax_ref import RefFAXModule

    _install_reference()
    _install_torchvision_stub()
    from opencood.models.sub_modules.fax_modules import (
        FAXModule as RefFAX,
    )

    torch.manual_seed(4)
    bl, n = 2, 2
    # the reference downsample block (conv d->d/4, unshuffle x4) only
    # type-checks when consecutive dims are equal
    dims = [16, 16]
    config = {
        "dim": dims,
        "middle": [1, 1],
        "backbone_output_shape": [(1, 1, 1, 12, 16, 16),
                                  (1, 1, 1, 20, 8, 8)],
        "bev_embedding": {"sigma": 1.0, "bev_height": 16,
                          "bev_width": 16, "h_meters": 100.0,
                          "w_meters": 100.0, "offset": 0.0,
                          "upsample_scales": [1, 2]},
        "cross_view": {"image_height": 64, "image_width": 64,
                       "qkv_bias": True, "heads": [2, 2],
                       "dim_head": [8, 8], "no_image_features": False,
                       "skip": True},
        "cross_view_swap": {"q_win_size": [[4, 4], [2, 2]],
                            "feat_win_size": [[4, 4], [2, 2]],
                            "bev_embedding_flag": [True, False],
                            "rel_pos_emb": False},
        "self_attn": {"dim_head": 8, "dropout": 0.0, "window_size": 8},
    }
    ref = RefFAX(config).eval()
    _randomize_bn(ref)

    rng = np.random.default_rng(4)
    feats = [rng.normal(size=(1, bl, n, c, h, w)).astype(np.float32)
             for (_, _, _, c, h, w) in config["backbone_output_shape"]]
    i_inv, e_inv = _make_calib(bl, n, 4)
    # reference forward takes NON-inverted intrinsics (it inverts I
    # itself) and already-inverted extrinsics; shapes (b=1, l, n, ...)
    intrinsic = np.linalg.inv(i_inv).astype(np.float32)
    batch = {
        "camera": torch.zeros(1, bl, n, 3, 64, 64),
        "intrinsic": torch.from_numpy(intrinsic)[None],
        "extrinsic": torch.from_numpy(e_inv)[None],
        "features": [torch.from_numpy(f) for f in feats],
    }
    with torch.no_grad():
        want = ref(batch).numpy()  # (1, bl, d, H, W)

    ours = RefFAXModule(config)
    args = ([jnp.asarray(f[0]) for f in feats], jnp.asarray(i_inv),
            jnp.asarray(e_inv))
    ours.init(jax.random.key(0), *args)

    params = {"bev_embedding": {"learned_features": jnp.asarray(
        ref.bev_embedding.learned_features.detach().numpy())}}
    stats = {}
    for i, cva in enumerate(ref.cross_views):
        p, s = _cva_variables(cva)
        params[f"cross_views_{i}"] = p
        stats[f"cross_views_{i}"] = s
    for i, layer in enumerate(ref.layers):
        for j, block in enumerate(layer):
            p, s = {}, {}
            for k in (1, 2, 3):
                p[f"conv{k}"] = _conv(getattr(block, f"conv{k}"))
                bnp, bns = _bn_params(getattr(block, f"bn{k}"))
                p[f"bn{k}"] = bnp
                s[f"bn{k}"] = bns
            params[f"layers_{i}_{j}"] = p
            stats[f"layers_{i}_{j}"] = s
    for i, ds in enumerate(ref.downsample_layers):
        seq = ds[0]
        p = {"conv_pre": _conv(seq[0]), "conv_mid": _conv(seq[2]),
             "conv_post": _conv(seq[5])}
        s = {}
        for name, bn in (("bn_mid", seq[3]), ("bn_post", seq[6])):
            bnp, bns = _bn_params(bn)
            p[name] = bnp
            s[name] = bns
        params[f"downsample_layers_{i}"] = p
        stats[f"downsample_layers_{i}"] = s
    params["self_attn"] = {
        "to_qkv": _lin(ref.self_attn.to_qkv),
        "to_out": _lin(ref.self_attn.to_out[0]),
        "rel_pos_bias": jnp.asarray(
            ref.self_attn.rel_pos_bias.weight.detach().numpy()),
    }
    got = np.asarray(ours.apply(
        {"params": params, "batch_stats": stats}, *args))
    np.testing.assert_allclose(got, want[0], atol=5e-4, rtol=5e-4)


def _cvt_cva_variables(ref):
    ca = ref.cross_attend
    params = {
        "cam_embed": _conv(ref.cam_embed),
        "img_embed": _conv(ref.img_embed),
        "bev_embed": _conv(ref.bev_embed),
        "feature_proj": _conv(ref.feature_proj[2]),
        "feature_linear": _conv(ref.feature_linear[2]),
        "cross_attend": {
            "to_q_norm": _ln(ca.to_q[0]), "to_q": _lin(ca.to_q[1]),
            "to_k_norm": _ln(ca.to_k[0]), "to_k": _lin(ca.to_k[1]),
            "to_v_norm": _ln(ca.to_v[0]), "to_v": _lin(ca.to_v[1]),
            "proj": _lin(ca.proj),
            "prenorm": _ln(ca.prenorm), "postnorm": _ln(ca.postnorm),
            "mlp_fc1": _lin(ca.mlp[0]), "mlp_fc2": _lin(ca.mlp[2]),
        },
    }
    stats = {}
    for name, seq in (("feature_proj", ref.feature_proj),
                      ("feature_linear", ref.feature_linear)):
        bnp, bns = _bn_params(seq[0])
        params[f"{name}_bn"] = bnp
        stats[f"{name}_bn"] = bns
    return params, stats


def test_cvt_cross_view_module_matches_reference():
    """Full CVT CrossViewModule over 2 scales (global cross attention,
    shared BEV grid, bottleneck refinement)."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.cvt_ref import RefCrossViewModule

    _install_reference()
    _install_torchvision_stub()
    from opencood.models.sub_modules.cvt_modules import (
        CrossViewModule as RefCVM,
    )

    torch.manual_seed(5)
    bl, n, dim = 2, 2, 16
    config = {
        "dim": dim,
        "middle": [1, 1],
        "backbone_output_shape": [(1, 1, 1, 12, 8, 8),
                                  (1, 1, 1, 20, 4, 4)],
        "bev_embedding": {"sigma": 1.0, "bev_height": 32,
                          "bev_width": 32, "h_meters": 100.0,
                          "w_meters": 100.0, "offset": 0.0,
                          "decoder_blocks": [1, 2]},
        "cross_view": {"image_height": 64, "image_width": 64,
                       "qkv_bias": True, "heads": 2, "dim_head": 8,
                       "no_image_features": False, "skip": True},
    }
    ref = RefCVM(config).eval()
    _randomize_bn(ref)

    rng = np.random.default_rng(5)
    feats = [rng.normal(size=(1, bl, n, c, h, w)).astype(np.float32)
             for (_, _, _, c, h, w) in config["backbone_output_shape"]]
    i_inv, e_inv = _make_calib(bl, n, 5)
    intrinsic = np.linalg.inv(i_inv).astype(np.float32)
    batch = {
        "inputs": torch.zeros(1, bl, n, 3, 64, 64),
        "intrinsic": torch.from_numpy(intrinsic)[None],
        "extrinsic": torch.from_numpy(e_inv)[None],
        "features": [torch.from_numpy(f) for f in feats],
    }
    with torch.no_grad():
        want = ref(batch).numpy()  # (1, bl, d, H, W)

    ours = RefCrossViewModule(config)
    args = ([jnp.asarray(f[0]) for f in feats], jnp.asarray(i_inv),
            jnp.asarray(e_inv))
    ours.init(jax.random.key(0), *args)

    params = {"bev_embedding_learned_features": __import__("jax").numpy
              .asarray(ref.bev_embedding.learned_features.detach()
                       .numpy())}
    stats = {}
    for i, cva in enumerate(ref.cross_views):
        p, s = _cvt_cva_variables(cva)
        params[f"cross_views_{i}"] = p
        stats[f"cross_views_{i}"] = s
    for i, layer in enumerate(ref.layers):
        for j, block in enumerate(layer):
            p, s = {}, {}
            for k in (1, 2, 3):
                p[f"conv{k}"] = _conv(getattr(block, f"conv{k}"))
                bnp, bns = _bn_params(getattr(block, f"bn{k}"))
                p[f"bn{k}"] = bnp
                s[f"bn{k}"] = bns
            params[f"layers_{i}_{j}"] = p
            stats[f"layers_{i}_{j}"] = s
    got = np.asarray(ours.apply(
        {"params": params, "batch_stats": stats}, *args))
    np.testing.assert_allclose(got, want[0], atol=5e-4, rtol=5e-4)


def test_fax_ref_camera_encoder_forwards():
    """The opt-in faithful encoder (camera config encoder: fax_ref)
    produces a finite BEV through make_camera_encoder."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.hmvit import make_camera_encoder

    cfg = {"encoder": "fax_ref", "backbone": "resnet18",
           "id_pick": (2, 3), "dim": 16, "bev_size": 8, "window": 4,
           "heads": 2, "dim_head": 8, "middle": [1, 1],
           "out_dim": 24, "decoder_layers": 1, "bev_range": 20.48}
    enc = make_camera_encoder(cfg)
    rng = np.random.default_rng(6)
    images = jnp.asarray(rng.normal(size=(1, 2, 64, 64, 3)).astype(
        np.float32))
    intr = np.tile(np.eye(3, dtype=np.float32), (1, 2, 1, 1))
    intr[..., 0, 0] = intr[..., 1, 1] = 50.0
    intr[..., 0, 2] = intr[..., 1, 2] = 32.0
    extr = np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))
    v = enc.init(jax.random.key(0), images, jnp.asarray(intr),
                 jnp.asarray(extr), False)
    out = enc.apply(v, images, jnp.asarray(intr), jnp.asarray(extr),
                    False)
    assert out.ndim == 4 and out.shape[-1] == 24
    assert np.isfinite(np.asarray(out)).all()


def test_cvt_ref_camera_encoder_forwards():
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.hmvit import make_camera_encoder

    cfg = {"encoder": "cvt_ref", "backbone": "resnet18",
           "id_pick": (2, 3), "dim": 16, "bev_size": 8,
           "decoder_blocks": 1, "heads": 2, "dim_head": 8,
           "middle": [1, 1], "out_dim": 24, "decoder_layers": 1,
           "bev_range": 20.48}
    enc = make_camera_encoder(cfg)
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.normal(size=(1, 2, 64, 64, 3)).astype(
        np.float32))
    intr = np.tile(np.eye(3, dtype=np.float32), (1, 2, 1, 1))
    intr[..., 0, 0] = intr[..., 1, 1] = 50.0
    intr[..., 0, 2] = intr[..., 1, 2] = 32.0
    extr = np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))
    v = enc.init(jax.random.key(0), images, jnp.asarray(intr),
                 jnp.asarray(extr), False)
    out = enc.apply(v, images, jnp.asarray(intr), jnp.asarray(extr),
                    False)
    assert out.ndim == 4 and out.shape[-1] == 24
    assert np.isfinite(np.asarray(out)).all()
