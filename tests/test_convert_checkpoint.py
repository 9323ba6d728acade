"""Round-trip tests for the reference-checkpoint importer
(hmvit_tpu/tools/convert_checkpoint.py): a reference torch model with
random weights is saved exactly the way the reference trainer saves it
(``torch.save(model.state_dict(), net_epoch%d.pth)``, reference:
opencood/tools/train_utils.py:26-74), converted, and the flax twin's
forward is compared against the torch model on random input."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.compile  # compile-heavy: full lane only

torch = pytest.importorskip("torch")

from test_fax_ref_parity import (  # noqa: E402
    _install_torchvision_stub,
    _make_calib,
    _randomize_bn,
)
from test_reference_parity import (  # noqa: E402
    _install_reference,
    _numpy_voxelize,
    _rand_cloud,
    _randomize_bn as _randomize_bn_stats,
)

from hmvit_tpu.tools.convert_checkpoint import (  # noqa: E402
    convert,
    find_reference_checkpoint,
)

_VOXEL = [0.4, 0.4, 4.0]
_RANGE = [-6.4, -6.4, -3.0, 6.4, 6.4, 1.0]
_GRID = [32, 32, 1]


def _save_reference_ckpt(model, tmp_path, epoch=3):
    path = os.path.join(str(tmp_path), f"net_epoch{epoch}.pth")
    torch.save(model.state_dict(), path)
    return path


def test_find_reference_checkpoint_picks_last_epoch(tmp_path):
    for e in (1, 4, 2):
        torch.save({}, os.path.join(str(tmp_path), f"net_epoch{e}.pth"))
    assert find_reference_checkpoint(str(tmp_path)).endswith(
        "net_epoch4.pth")


def test_point_pillar_checkpoint_round_trip(tmp_path):
    """Full reference PointPillar (VFE -> scatter -> 3-stage backbone ->
    shrink -> heads), saved as net_epoch3.pth, converted, forwards
    equal on the same cloud."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.point_pillar import PointPillarDetector

    _install_reference()
    from opencood.models.point_pillar import PointPillar

    torch.manual_seed(11)
    rng = np.random.default_rng(11)
    margs = {
        "voxel_size": _VOXEL,
        "lidar_range": _RANGE,
        "anchor_number": 2,
        "cls_head_dim": 16,
        "pillar_vfe": {"use_norm": True, "with_distance": False,
                       "use_absolute_xyz": True, "num_filters": [64]},
        "point_pillar_scatter": {"num_features": 64, "grid_size": _GRID},
        "base_bev_backbone": {
            "layer_nums": [1, 2], "layer_strides": [2, 2],
            "num_filters": [8, 12], "upsample_strides": [1, 2],
            "num_upsample_filter": [8, 8],
        },
        "shrink_header": {"kernal_size": [3], "stride": [2],
                          "padding": [1], "dim": [16], "input_dim": 16},
    }
    ref = PointPillar(margs).eval()
    # padding neutrality: the reference max-pools over zero-padded point
    # slots (pillar_vfe.py:141-146) while the fused path masks them out;
    # relu(bn(0)) == 0 needs positive running means + zero biases (same
    # convention as test_pillar_vfe_scatter_matches_reference)
    _randomize_bn_stats(ref.pillar_vfe.pfn_layers[0].norm, rng,
                        positive_mean=True)
    for m in list(ref.backbone.modules()) + list(
            ref.shrink_conv.modules()):
        if isinstance(m, torch.nn.BatchNorm2d):
            _randomize_bn_stats(m, rng)

    ckpt = _save_reference_ckpt(ref, tmp_path)
    variables, unused = convert(ckpt, "point_pillar", margs)
    assert unused == [], unused

    pts, mask = _rand_cloud(rng)
    vf, vn, vc = _numpy_voxelize(pts, mask, _VOXEL, _RANGE, _GRID[:2])
    with torch.no_grad():
        want = ref({"processed_lidar": {
            "voxel_features": torch.from_numpy(vf),
            "voxel_coords": torch.from_numpy(vc),
            "voxel_num_points": torch.from_numpy(vn)}})
    model = PointPillarDetector({
        "anchor_number": 2,
        **{k: margs[k] for k in ("voxel_size", "lidar_range", "pillar_vfe",
                                 "point_pillar_scatter",
                                 "base_bev_backbone", "shrink_header")}})
    variables = {k: jax.tree_util.tree_map(jnp.asarray, v)
                 for k, v in variables.items()}
    # converted tree must be structurally identical to a fresh init
    init = model.init(jax.random.key(0), jnp.asarray(pts[None]),
                      jnp.asarray(mask[None]), train=False)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_equal_shapes(init["params"], variables["params"])
    got = model.apply(variables, jnp.asarray(pts[None]),
                      jnp.asarray(mask[None]), train=False)
    np.testing.assert_allclose(np.asarray(got["psm"]),
                               want["psm"].numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got["rm"]),
                               want["rm"].numpy(), atol=2e-4, rtol=2e-4)


def test_fax_module_checkpoint_round_trip(tmp_path):
    """corpbevt-style checkpoint (camera subtree under the ``fax.``
    prefix, fax_fused_transformer.py:21) -> RefFAXModule variables."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.fax_ref import RefFAXModule

    _install_reference()
    _install_torchvision_stub()
    from opencood.models.sub_modules.fax_modules import FAXModule as RefFAX

    torch.manual_seed(12)
    bl, n = 2, 2
    config = {
        "dim": [16, 16],
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

    class Container(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fax = RefFAX(config)

    ref = Container().eval()
    _randomize_bn(ref)
    ckpt = _save_reference_ckpt(ref, tmp_path, epoch=7)
    variables, unused = convert(ckpt, "fax", prefix="fax")
    assert unused == [], unused

    rng = np.random.default_rng(12)
    feats = [rng.normal(size=(1, bl, n, c, h, w)).astype(np.float32)
             for (_, _, _, c, h, w) in config["backbone_output_shape"]]
    i_inv, e_inv = _make_calib(bl, n, 12)
    intrinsic = np.linalg.inv(i_inv).astype(np.float32)
    with torch.no_grad():
        want = ref.fax({
            "camera": torch.zeros(1, bl, n, 3, 64, 64),
            "intrinsic": torch.from_numpy(intrinsic)[None],
            "extrinsic": torch.from_numpy(e_inv)[None],
            "features": [torch.from_numpy(f) for f in feats],
        }).numpy()

    ours = RefFAXModule(config)
    args = ([jnp.asarray(f[0]) for f in feats], jnp.asarray(i_inv),
            jnp.asarray(e_inv))
    variables = {k: jax.tree_util.tree_map(jnp.asarray, v)
                 for k, v in variables.items()}
    got = np.asarray(ours.apply(variables, *args))
    np.testing.assert_allclose(got, want[0], atol=5e-4, rtol=5e-4)


def test_cvt_module_checkpoint_round_trip(tmp_path):
    """cross_view_transformer-style checkpoint (``cvm.`` prefix,
    cross_view_transformer.py:23) -> RefCrossViewModule variables."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.cvt_ref import RefCrossViewModule

    _install_reference()
    _install_torchvision_stub()
    from opencood.models.sub_modules.cvt_modules import (
        CrossViewModule as RefCVM,
    )

    torch.manual_seed(13)
    bl, n = 2, 2
    config = {
        "dim": 16,
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

    class Container(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.cvm = RefCVM(config)

    ref = Container().eval()
    _randomize_bn(ref)
    ckpt = _save_reference_ckpt(ref, tmp_path, epoch=2)
    variables, unused = convert(ckpt, "cvt", prefix="cvm")
    assert unused == [], unused

    rng = np.random.default_rng(13)
    feats = [rng.normal(size=(1, bl, n, c, h, w)).astype(np.float32)
             for (_, _, _, c, h, w) in config["backbone_output_shape"]]
    i_inv, e_inv = _make_calib(bl, n, 13)
    intrinsic = np.linalg.inv(i_inv).astype(np.float32)
    with torch.no_grad():
        want = ref.cvm({
            "inputs": torch.zeros(1, bl, n, 3, 64, 64),
            "intrinsic": torch.from_numpy(intrinsic)[None],
            "extrinsic": torch.from_numpy(e_inv)[None],
            "features": [torch.from_numpy(f) for f in feats],
        }).numpy()

    ours = RefCrossViewModule(config)
    args = ([jnp.asarray(f[0]) for f in feats], jnp.asarray(i_inv),
            jnp.asarray(e_inv))
    variables = {k: jax.tree_util.tree_map(jnp.asarray, v)
                 for k, v in variables.items()}
    got = np.asarray(ours.apply(variables, *args))
    np.testing.assert_allclose(got, want[0], atol=5e-4, rtol=5e-4)


def test_cli_writes_restorable_orbax_checkpoint(tmp_path):
    """main(): --from_reference run_dir --core_method point_pillar
    --hypes cfg.yaml --output out -> orbax checkpoint that
    restore_checkpoint round-trips bit-exactly."""
    import jax
    import jax.numpy as jnp
    import yaml

    from hmvit_tpu.tools.convert_checkpoint import main
    from hmvit_tpu.train.checkpointing import restore_checkpoint

    _install_reference()
    from opencood.models.point_pillar import PointPillar

    torch.manual_seed(14)
    margs = {
        "voxel_size": _VOXEL, "lidar_range": _RANGE, "anchor_number": 2,
        "cls_head_dim": 16,
        "pillar_vfe": {"use_norm": True, "with_distance": False,
                       "use_absolute_xyz": True, "num_filters": [64]},
        "point_pillar_scatter": {"num_features": 64, "grid_size": _GRID},
        "base_bev_backbone": {
            "layer_nums": [1], "layer_strides": [2],
            "num_filters": [8], "upsample_strides": [1],
            "num_upsample_filter": [8]},
        "shrink_header": {"kernal_size": [3], "stride": [2],
                          "padding": [1], "dim": [16], "input_dim": 8},
    }
    ref = PointPillar(margs).eval()
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    _save_reference_ckpt(ref, run_dir, epoch=5)
    hypes = {"model": {"core_method": "point_pillar", "args": margs}}
    hypes_path = tmp_path / "cfg.yaml"
    hypes_path.write_text(yaml.safe_dump(hypes))

    out = tmp_path / "out_ckpt"
    report = main(["--from_reference", str(run_dir),
                   "--core_method", "point_pillar",
                   "--hypes", str(hypes_path), "--output", str(out)])
    assert report["converted_params"] > 0
    assert report["unconsumed_keys"] == []
    assert os.path.exists(out / "conversion_report.json")

    variables, _ = convert(str(run_dir), "point_pillar", margs)
    abstract = {k: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.asarray(x).shape, jnp.float32), v)
        for k, v in variables.items()}
    restored = restore_checkpoint(str(out), abstract)
    flat_r = jax.tree_util.tree_leaves(restored)
    flat_w = jax.tree_util.tree_leaves(
        {k: jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), v)
         for k, v in variables.items()})
    assert len(flat_r) == len(flat_w)
    for a, b in zip(flat_r, flat_w):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hetero_fusion_checkpoint_round_trip(tmp_path):
    """H3GAT trunk: the reference HeteroFusion (fusion_net.* keys of
    bevformer_point_pillar_hetero-style checkpoints) -> our stacked
    HeteroFusion variables; ego outputs equal on identity transforms
    (where the reference's warp and ours coincide exactly)."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.hetero_fusion import HeteroFusion

    _install_reference()
    from opencood.models.base_transformer import (
        HeteroFeedForward as RefHFF,
    )
    from opencood.models.sub_modules.hetero_fusion import (
        HeteroFusionBlock as RefBlock,
    )

    class RefHeteroFusion(torch.nn.Module):
        """Structural stand-in for the reference HeteroFusion wrapper
        (bevformer_point_pillar_hetero.py:22-49 — importing the real
        class pulls the whole BEVFormerWrapper dependency chain):
        IDENTICAL child names/state_dict keys (hetero_fusion_block,
        mlp_head) and the same iterate-then-ego-mlp forward."""

        def __init__(self, config):
            super().__init__()
            self.hetero_fusion_block = RefBlock(
                config["hetero_fusion_block"])
            self.num_iters = config["num_iters"]
            dim = config["hetero_fusion_block"]["input_dim"]
            self.mlp_head = RefHFF(dim, dim, 0)

        def forward(self, x, pairwise_t_matrix, mode, record_len, mask):
            for _ in range(self.num_iters):
                x = self.hetero_fusion_block(x, pairwise_t_matrix, mode,
                                             record_len, mask)
            x = x[:, 0, ...].permute(0, 2, 3, 1)
            x = self.mlp_head(x.unsqueeze(1), mode[:, :1]).squeeze(
                1).permute(0, 3, 1, 2)
            return x

    torch.manual_seed(15)
    B, L, H, W, C = 1, 3, 16, 16, 32
    WIN, DH = 4, 8
    ref_cfg = {
        "spatial_transform": {"downsample_rate": 1,
                              "voxel_size": [1.0, 1.0, 4.0]},
        "hetero_fusion_block": {
            "input_dim": C, "mlp_dim": C, "agent_size": L,
            "window_size": WIN, "drop_out": 0.0, "dim_head": DH,
            "architect_mode": "sequential",
            "spatial_transform": {"downsample_rate": 1,
                                  "voxel_size": [1.0, 1.0, 4.0]}},
        "num_iters": 2,
    }
    ref = RefHeteroFusion(ref_cfg).eval()

    class Container(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fusion_net = ref

    ckpt = _save_reference_ckpt(Container().eval(), tmp_path, epoch=9)
    variables, unused = convert(ckpt, "hetero_fusion")
    # aggregate_fc is parallel-architect-mode-only (dead weight in
    # sequential checkpoints) — the only keys allowed to stay
    assert all("aggregate_fc" in k for k in unused), unused

    rng = np.random.default_rng(15)
    x = rng.normal(size=(B, L, H, W, C)).astype(np.float32)
    mode = np.array([[1, 0, 1]])
    ident = np.tile(np.eye(4, dtype=np.float32), (B, L, L, 1, 1))
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(ident),
            torch.from_numpy(mode),
            torch.tensor([L]),
            torch.ones(B, L),
        ).numpy()  # (B, C, H, W)

    ours = HeteroFusion(ref_cfg)
    args = (jnp.asarray(x), jnp.asarray(mode), jnp.asarray(ident),
            jnp.ones((B, L)))
    ours.init(jax.random.key(5), *args)
    import jax as _jax

    variables = {k: _jax.tree_util.tree_map(jnp.asarray, v)
                 for k, v in variables.items()
                 if k in ("params", "batch_stats")}
    got = np.asarray(ours.apply(variables, *args))  # (B, H, W, C)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=2e-4)
