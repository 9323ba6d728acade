"""GOLDEN numeric parity for three more fusion-zoo members (VERDICT r2
Missing #3): the REFERENCE torch modules run directly with their weights
copied into the JAX twins, on identity transforms (so warping is a no-op
and only the fusion math differs).

  - SwapFusionEncoder (reference: opencood/models/fusion_modules/
    swap_fusion_modules.py:13-286, mask=True path)
  - V2VNetFusion + ConvGRU (reference: opencood/models/fusion_modules/
    v2v_fuse.py:18-137, sub_modules/convgru.py:48-70)
  - HGTCavAttention (reference: opencood/models/base_transformer.py:
    258-398)
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import _install_reference  # noqa: E402


def _lin(m):
    import jax.numpy as jnp

    out = {"kernel": jnp.asarray(m.weight.detach().numpy().T)}
    if m.bias is not None:
        out["bias"] = jnp.asarray(m.bias.detach().numpy())
    return out


def _conv(m):
    import jax.numpy as jnp

    out = {"kernel": jnp.asarray(
        m.weight.detach().numpy().transpose(2, 3, 1, 0))}
    if m.bias is not None:
        out["bias"] = jnp.asarray(m.bias.detach().numpy())
    return out


def _ln(m):
    import jax.numpy as jnp

    return {"scale": jnp.asarray(m.weight.detach().numpy()),
            "bias": jnp.asarray(m.bias.detach().numpy())}


def _stacked_lin(mods):
    import jax.numpy as jnp

    return {"kernel": jnp.asarray(
        np.stack([m.weight.detach().numpy().T for m in mods])),
        "bias": jnp.asarray(
            np.stack([m.bias.detach().numpy() for m in mods]))}


@pytest.mark.compile
def test_swap_fusion_matches_reference():
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.fusion.swap import SwapFusionEncoder

    _install_reference()
    from opencood.models.fusion_modules.swap_fusion_modules import (
        SwapFusionEncoder as RefSwap,
    )

    torch.manual_seed(0)
    b, l, c, hw, win, dh = 1, 3, 16, 8, 4, 8
    ref = RefSwap({"input_dim": c, "mlp_dim": 24, "agent_size": l,
                   "window_size": win, "dim_head": dh, "drop_out": 0.0,
                   "depth": 1, "mask": True}).eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, l, c, hw, hw)).astype(np.float32)
    mask = torch.ones(b, hw, hw, 1, l)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), mask).numpy()  # (B, C, H, W)

    ours = SwapFusionEncoder(dim=c, depth=1, window=win, dim_head=dh,
                             agent_size=l, mlp_dim=24,
                             discrete_ratio=1.0, downsample_rate=1.0)
    xj = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    pairwise = jnp.tile(jnp.eye(4), (b, l, l, 1, 1))
    amask = jnp.ones((b, l))
    variables = ours.init(jax.random.key(0), xj, None, pairwise, amask)

    blk = ref.layers[0]
    p = {}
    for style, attn_mod, ffd_mod in (
            ("local", blk.window_attention, blk.window_ffd),
            ("grid", blk.grid_attention, blk.grid_ffd)):
        att = attn_mod.fn
        p[f"attn_norm_{style}_0"] = _ln(attn_mod.norm)
        p[f"attn_{style}_0"] = {
            "to_qkv": _lin(att.to_qkv),
            "to_out": _lin(att.to_out[0]),
            "rel_pos_bias": jnp.asarray(
                att.relative_position_bias_table.weight.detach().numpy()),
        }
        p[f"ff_norm_{style}_0"] = _ln(ffd_mod.norm)
        p[f"ff_in_{style}_0"] = _lin(ffd_mod.fn.net[0])
        p[f"ff_out_{style}_0"] = _lin(ffd_mod.fn.net[3])
    p["head_norm"] = _ln(ref.mlp_head[2])
    p["head_linear"] = _lin(ref.mlp_head[3])

    got = np.asarray(ours.apply({"params": p}, xj, None, pairwise, amask))
    got = got.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-5)


@pytest.mark.compile
def test_v2vnet_matches_reference():
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.fusion.v2vnet import V2VNetFusion

    _install_reference()
    from opencood.models.fusion_modules.v2v_fuse import (
        V2VNetFusion as RefV2V,
    )

    torch.manual_seed(1)
    b, l, c, hw = 1, 3, 8, 8
    args = {"in_channels": c, "gru_flag": True, "agg_operator": "avg",
            "num_iteration": 2, "downsample_rate": 1,
            "voxel_size": [1.0, 1.0, 4],
            "spatial_transform": {"downsample_rate": 1,
                                  "voxel_size": [1.0, 1.0, 4]},
            "conv_gru": {"H": hw, "W": hw, "num_layers": 1,
                         "kernel_size": [[3, 3]]}}
    ref = RefV2V(args).eval()

    rng = np.random.default_rng(1)
    x = rng.normal(size=(l, c, hw, hw)).astype(np.float32)
    pairwise = torch.eye(4).expand(b, l, l, 4, 4).contiguous()
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.ones(b, l),
                   torch.tensor([l]), pairwise).numpy()  # (B, C, H, W)

    ours = V2VNetFusion(dim=c, num_rounds=2, discrete_ratio=1.0,
                        downsample_rate=1.0)
    xj = jnp.asarray(x[None].transpose(0, 1, 3, 4, 2))
    pj = jnp.tile(jnp.eye(4), (b, l, l, 1, 1))
    amask = jnp.ones((b, l))
    ours.init(jax.random.key(0), xj, None, pj, amask)

    cell = ref.conv_gru.cell_list[0]
    p = {"msg_conv": _conv(ref.msg_cnn),
         "conv_gru": {"conv_gates": _conv(cell.conv_gates),
                      "conv_can": _conv(cell.conv_can)},
         "out_mlp": _lin(ref.mlp)}
    got = np.asarray(ours.apply({"params": p}, xj, None, pj, amask))
    got = got.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-5)


@pytest.mark.compile
def test_hgt_cav_attention_matches_reference():
    """Per-pixel typed agent attention.  Weight convention: the
    reference applies relation_msg over its FIRST head-dim index
    (base_transformer.py:387, W^T v); ours applies W v — relation_msg is
    copied transposed, relation_att directly (q W k both sides)."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.fusion.v2xvit import HGTCavAttention

    _install_reference()
    from opencood.models.base_transformer import HGTCavAttention as RefHGT

    torch.manual_seed(2)
    b, l, c, hw, heads = 1, 3, 16, 4, 2
    ref = RefHGT(dim=c, heads=heads, num_types=2, num_relations=4,
                 dim_head=c // heads, dropout=0.0).eval()

    rng = np.random.default_rng(2)
    x = rng.normal(size=(b, l, hw, hw, c)).astype(np.float32)
    mode = np.array([[1, 0, 1]])
    mask = torch.ones(b, hw, hw, 1, l)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(mode),
                   mask).numpy()  # (B, L, H, W, C)

    ours = HGTCavAttention(dim=c, heads=heads, num_types=2)
    xj = jnp.asarray(x)
    mj = jnp.asarray(mode)
    maskj = jnp.ones((b, l, hw, hw))
    ours.init(jax.random.key(0), xj, mj, maskj)

    p = {"to_q": _stacked_lin(ref.q_linears),
         "to_k": _stacked_lin(ref.k_linears),
         "to_v": _stacked_lin(ref.v_linears),
         "to_out": _stacked_lin(ref.a_linears),
         "relation_att": jnp.asarray(ref.relation_att.detach().numpy()),
         "relation_msg": jnp.asarray(
             np.swapaxes(ref.relation_msg.detach().numpy(), -1, -2))}
    got = np.asarray(ours.apply({"params": p}, xj, mj, maskj))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_disconet_matches_reference():
    """DiscoNet pixel-weighted fusion, num_iteration=2 (exercises the
    all-receivers update loop), eval-mode BN, identity transforms."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.fusion.basic import DiscoNetFusion

    _install_reference()
    from opencood.models.fusion_modules.disconet_fuse import (
        DiscoNetFusion as RefDisco,
    )

    torch.manual_seed(2)
    b, l, c, hw = 1, 3, 8, 8
    args = {"in_channels": c, "gru_flag": True, "agg_operator": "avg",
            "num_iteration": 2, "downsample_rate": 1,
            "voxel_size": [1.0, 1.0, 4], "use_mask": True,
            "use_temporal_encoding": False,
            "spatial_transform": {"downsample_rate": 1,
                                  "voxel_size": [1.0, 1.0, 4]},
            "conv_gru": {"H": hw, "W": hw, "num_layers": 1,
                         "kernel_size": [[3, 3]]}}
    ref = RefDisco(args).eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(l, c, hw, hw)).astype(np.float32)
    pairwise = torch.eye(4).expand(b, l, l, 4, 4).contiguous()
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.ones(b, l),
                   torch.tensor([l]), pairwise).numpy()  # (B, C, H, W)

    ours = DiscoNetFusion(dim=c, discrete_ratio=1.0, downsample_rate=1.0,
                          num_iteration=2, use_mask=True)
    xj = jnp.asarray(x[None].transpose(0, 1, 3, 4, 2))
    pj = jnp.tile(jnp.eye(4), (b, l, l, 1, 1))
    amask = jnp.ones((b, l))
    ours.init(jax.random.key(0), xj, None, pj, amask)

    pwf = ref.pixel_weighted_fusion
    scorer_params, scorer_stats = {}, {}
    for i, (conv, bn) in enumerate([(pwf.conv1_1, pwf.bn1_1),
                                    (pwf.conv1_2, pwf.bn1_2),
                                    (pwf.conv1_3, pwf.bn1_3)]):
        scorer_params[f"Conv_{i}"] = _conv(conv)
        scorer_params[f"BatchNorm_{i}"] = {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy())}
        scorer_stats[f"BatchNorm_{i}"] = {
            "mean": jnp.asarray(bn.running_mean.detach().numpy()),
            "var": jnp.asarray(bn.running_var.detach().numpy())}
    scorer_params["Conv_3"] = _conv(pwf.conv1_4)
    variables = {
        "params": {"pixel_weighted_fusion": scorer_params,
                   "mlp": _lin(ref.mlp)},
        "batch_stats": {"pixel_weighted_fusion": scorer_stats},
    }
    got = np.asarray(ours.apply(variables, xj, None, pj, amask))
    got = got.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-5)


def test_base_window_attention_matches_reference():
    """Per-agent pyramid window self-attention (reference:
    opencood/models/mwin_tranformer.py:18-80) — incl. the head-shared
    2D relative position table mapped onto the per-head flat table (the
    reference indexes P[s - t]; ours indexes table[t - s])."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.fusion.v2xvit import WindowSelfAttention
    from hmvit_tpu.models.hetero_fusion import relative_position_index

    _install_reference()
    from opencood.models.mwin_tranformer import (
        BaseWindowAttention as RefBWA,
        get_relative_distances,
    )

    torch.manual_seed(6)
    b, l, hw, dim, heads, win = 1, 2, 8, 32, 2, 4
    ref = RefBWA(dim, heads=heads, dim_head=dim // heads, drop_out=0.0,
                 window_size=win, relative_pos_embedding=True).eval()
    rng = np.random.default_rng(6)
    x = rng.normal(size=(b, l, hw, hw, dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    ours = WindowSelfAttention(dim, win, heads)
    xj = jnp.asarray(x)
    ours.init(jax.random.key(0), xj)

    # map the reference (2w-1, 2w-1) shared table into our per-head
    # ((2w-1)^2, heads) flat table through both index conventions
    p_ref = ref.pos_embedding.detach().numpy()
    rel_ref = np.asarray(get_relative_distances(win)) + win - 1  # (T,T,2)
    idx_ours = relative_position_index(win)  # (T, T)
    flat = np.zeros(((2 * win - 1) ** 2,), np.float32)
    flat[idx_ours] = p_ref[rel_ref[..., 0], rel_ref[..., 1]]
    table = np.tile(flat[:, None], (1, heads))

    params = {
        "Dense_0": _lin(ref.to_qkv),
        "Dense_1": _lin(ref.to_out[0]),
        "rel_pos_bias": jnp.asarray(table),
    }
    got = np.asarray(ours.apply({"params": params}, xj))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_split_attn_matches_reference():
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.hetero_fusion import SplitAttn

    _install_reference()
    from opencood.models.fusion_modules.split_attn import (
        SplitAttn as RefSplit,
    )

    torch.manual_seed(7)
    dim, n = 16, 3
    ref = RefSplit(dim, num_windows=n).eval()
    rng = np.random.default_rng(7)
    branches = [rng.normal(size=(1, 2, 4, 4, dim)).astype(np.float32)
                for _ in range(n)]
    with torch.no_grad():
        want = ref([torch.from_numpy(br) for br in branches]).numpy()

    ours = SplitAttn(dim)
    jb = [jnp.asarray(br) for br in branches]
    ours.init(jax.random.key(0), jb)
    params = {"fc1": _lin(ref.fc1), "fc2": _lin(ref.fc2),
              "bn1": _ln(ref.bn1)}
    got = np.asarray(ours.apply({"params": params}, jb))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.compile
def test_pyramid_window_attention_matches_reference():
    """Full pyramid (2 window sizes + SplitAttn fuse; the reference
    hard-codes SplitAttn(256))."""
    import jax
    import jax.numpy as jnp

    from hmvit_tpu.models.fusion.v2xvit import PyramidWindowAttention
    from hmvit_tpu.models.hetero_fusion import relative_position_index

    _install_reference()
    from opencood.models.mwin_tranformer import (
        PyramidWindowAttention as RefPWA,
        get_relative_distances,
    )

    torch.manual_seed(8)
    b, l, hw, dim, heads = 1, 2, 16, 256, 8
    wins = [4, 8, 16]  # the reference v2xt pyramid (radix-3 SplitAttn)
    ref = RefPWA(dim, heads=[heads] * 3, dim_heads=[dim // heads] * 3,
                 drop_out=0.0, window_size=wins,
                 relative_pos_embedding=True,
                 fuse_method="split_attn").eval()
    rng = np.random.default_rng(8)
    x = rng.normal(size=(b, l, hw, hw, dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    ours = PyramidWindowAttention(dim, windows=tuple(wins), heads=heads)
    xj = jnp.asarray(x)
    ours.init(jax.random.key(0), xj)

    def bwa_params(m, win):
        p_ref = m.pos_embedding.detach().numpy()
        rel_ref = np.asarray(get_relative_distances(win)) + win - 1
        idx_ours = relative_position_index(win)
        flat = np.zeros(((2 * win - 1) ** 2,), np.float32)
        flat[idx_ours] = p_ref[rel_ref[..., 0], rel_ref[..., 1]]
        import jax.numpy as jnp

        return {"Dense_0": _lin(m.to_qkv), "Dense_1": _lin(m.to_out[0]),
                "rel_pos_bias": jnp.asarray(
                    np.tile(flat[:, None], (1, heads)))}

    params = {
        f"WindowSelfAttention_{i}": bwa_params(ref.pwmsa[i], wins[i])
        for i in range(3)
    }
    params["SplitAttn_0"] = {"fc1": _lin(ref.split_attn.fc1),
                             "fc2": _lin(ref.split_attn.fc2),
                             "bn1": _ln(ref.split_attn.bn1)}
    got = np.asarray(ours.apply({"params": params}, xj))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-5)
