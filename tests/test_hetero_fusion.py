"""H3GAT fusion block and full HM-ViT model: shapes, masking, mixing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmvit_tpu.models.hetero_fusion import (
    HeteroFusion,
    HeteroFusionBlock,
    _window_merge,
    _window_split,
)

B, L, H, W, C = 1, 3, 16, 16, 32
FUSION_CFG = {
    "num_iters": 2,
    "spatial_transform": {"downsample_rate": 1, "voxel_size": [1.0, 1.0, 4]},
    "hetero_fusion_block": {
        "spatial_transform": {"downsample_rate": 1,
                              "voxel_size": [1.0, 1.0, 4]},
        "architect_mode": "sequential",
        "input_dim": C,
        "mlp_dim": C,
        "agent_size": L,
        "window_size": 4,
        "dim_head": 8,
        "drop_out": 0.0,
        "mask": True,
    },
}


def make_inputs(seed=0, mode=None):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, L, H, W, C)).astype(np.float32)
    mode = np.array([[0, 1, 0]]) if mode is None else np.asarray(mode)
    pairwise = np.tile(np.eye(4, dtype=np.float32), (B, L, L, 1, 1))
    agent_mask = np.ones((B, L), np.float32)
    return (jnp.asarray(x), jnp.asarray(mode), jnp.asarray(pairwise),
            jnp.asarray(agent_mask))


def test_window_split_merge_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 8, 5)))
    for style in ("local", "grid"):
        sp = _window_split(x, 4, style)
        assert sp.shape == (2, 4, 2, 16, 5)
        back = _window_merge(sp, 4, style, 16, 8)
        np.testing.assert_allclose(back, x)


def test_fusion_block_shapes_and_finite():
    x, mode, pairwise, agent_mask = make_inputs()
    block = HeteroFusionBlock(input_dim=C, mlp_dim=C, window_size=4,
                              dim_head=8, discrete_ratio=1.0,
                              downsample_rate=1)
    variables = block.init(jax.random.key(0), x, mode, pairwise, agent_mask)
    out = block.apply(variables, x, mode, pairwise, agent_mask)
    assert out.shape == (B, L, H, W, C)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fusion_mixes_agents():
    """Changing a sender's features must change the ego's fused output."""
    x, mode, pairwise, agent_mask = make_inputs()
    fusion = HeteroFusion(FUSION_CFG)
    variables = fusion.init(jax.random.key(0), x, mode, pairwise, agent_mask)
    base = fusion.apply(variables, x, mode, pairwise, agent_mask)

    # perturb a single channel — a uniform shift would be invisible to the
    # block's pre-LayerNorm
    x2 = x.at[:, 2, :, :, 0].add(3.0)
    out2 = fusion.apply(variables, x2, mode, pairwise, agent_mask)
    assert np.abs(np.asarray(out2 - base)).max() > 1e-4


def test_padded_agents_do_not_leak():
    """Masked (padded) agent slots must not influence the ego output."""
    x, mode, pairwise, _ = make_inputs()
    agent_mask = jnp.asarray(np.array([[1, 1, 0]], np.float32))
    fusion = HeteroFusion(FUSION_CFG)
    variables = fusion.init(jax.random.key(0), x, mode, pairwise, agent_mask)
    base = fusion.apply(variables, x, mode, pairwise, agent_mask)

    x_garbage = x.at[:, 2].set(999.0)
    out = fusion.apply(variables, x_garbage, mode, pairwise, agent_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-4)


def test_hetero_type_weights_matter():
    """Flipping an agent's modality must reroute it through different
    typed weights and change the result."""
    x, _, pairwise, agent_mask = make_inputs()
    fusion = HeteroFusion(FUSION_CFG)
    mode_a = jnp.asarray(np.array([[0, 1, 0]]))
    mode_b = jnp.asarray(np.array([[0, 1, 1]]))
    variables = fusion.init(jax.random.key(0), x, mode_a, pairwise,
                            agent_mask)
    out_a = fusion.apply(variables, x, mode_a, pairwise, agent_mask)
    out_b = fusion.apply(variables, x, mode_b, pairwise, agent_mask)
    assert np.abs(np.asarray(out_a - out_b)).max() > 1e-4


@pytest.mark.slow
def test_hmvit_end_to_end_forward_and_grad():
    from hmvit_tpu.data.synthetic import make_hetero_batch
    from hmvit_tpu.models.hmvit import HMViT
    from hmvit_tpu.train.losses import point_pillar_loss
    from hmvit_tpu.data.anchors import generate_anchor_grid, generate_labels

    rng_range = [-20.48, -20.48, -3.0, 20.48, 20.48, 1.0]
    cfg = {
        "lidar": {
            "voxel_size": [0.64, 0.64, 4.0],
            "lidar_range": rng_range,
            "anchor_number": 2,
            "pillar_vfe": {"use_norm": True, "with_distance": False,
                           "use_absolute_xyz": True, "num_filters": [32]},
            "point_pillar_scatter": {"num_features": 32,
                                     "grid_size": [64, 64, 1]},
            "base_bev_backbone": {
                "layer_nums": [1, 1, 1],
                "layer_strides": [2, 2, 2],
                "num_filters": [32, 32, 32],
                "upsample_strides": [1, 2, 4],
                "num_upsample_filter": [32, 32, 32],
            },
            "shrink_header": {"kernal_size": [3], "stride": [2],
                              "padding": [1], "dim": [64], "input_dim": 96},
        },
        "camera": {"dim": 32, "bev_size": 4, "out_dim": 64,
                   "num_blocks": 1, "decoder_layers": 2,
                   "encoder_channels": (16, 32, 32, 32)},
        "compression": 0,
        "hetero_fusion": {
            "num_iters": 1,
            "hetero_fusion_block": {
                "spatial_transform": {"downsample_rate": 4,
                                      "voxel_size": [0.64, 0.64, 4]},
                "architect_mode": "sequential",
                "input_dim": 64,
                "mlp_dim": 64,
                "window_size": 4,
                "dim_head": 16,
                "drop_out": 0.0,
            },
        },
        "hetero_decoder": {"input_dim": 64, "num_layer": 1,
                           "num_ch_dec": [64], "anchor_number": 2},
    }
    batch, _ = make_hetero_batch(
        seed=3, batch_size=1, max_cav=3, num_agents=3, max_points=2048,
        image_size=64, camera_ratio=0.5, ego_mode="mixed",
        lidar_range=rng_range,
    )
    batch["mode"] = np.array([[1, 0, 1]])  # guarantee a mixed fleet
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = HMViT(cfg)
    variables = model.init(jax.random.key(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert out["psm"].shape == (1, 2, 16, 16)
    assert out["rm"].shape == (1, 14, 16, 16)
    assert np.all(np.isfinite(np.asarray(out["psm"])))

    anchor_args = {
        "cav_lidar_range": rng_range, "l": 3.9, "w": 1.6, "h": 1.56,
        "r": [0, 90], "feature_stride": 4, "num": 2,
        "vw": 0.64, "vh": 0.64, "vd": 4, "W": 64, "H": 64, "D": 1,
    }
    anchors = generate_anchor_grid(anchor_args, "hwl")
    labels = generate_labels(
        np.asarray(batch["object_bbx_center"][0]),
        np.asarray(batch["object_bbx_mask"][0]), anchors, 0.6, 0.45)
    batch_labels = {
        "pos_equal_one": jnp.asarray(labels["pos_equal_one"])[None],
        "targets": jnp.asarray(labels["targets"])[None],
    }

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        total, _ = point_pillar_loss(out, batch_labels)
        return total

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    # both branches and the fusion must receive gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    groups = {"lidar_encoder": 0.0, "camera_encoder": 0.0, "fusion": 0.0}
    for path, g in flat:
        top = path[0].key
        if top in groups:
            groups[top] = max(groups[top], float(np.abs(g).max()))
    assert all(v > 0 for v in groups.values()), groups


@pytest.mark.compile
def test_ego_only_last_iteration_identical():
    """The receiver-restricted final phase must not change the ego
    output: with the same params, ego_only_last True/False agree
    bit-for-bit (the other receivers' final updates are dead work)."""
    x, mode, pair, amask = make_inputs(seed=3, mode=[[1, 0, 1]])
    amask = amask.at[:, -1].set(0.0)
    c = x.shape[-1]
    for arch in ("sequential", "parallel"):
        def cfg(ego):
            return {"num_iters": 2, "ego_only_last": ego,
                    "hetero_fusion_block": {
                        "spatial_transform": {"downsample_rate": 2,
                                              "voxel_size": [0.4, 0.4, 4]},
                        "architect_mode": arch, "input_dim": c,
                        "mlp_dim": c, "window_size": 4, "dim_head": 16,
                        "drop_out": 0.0}}

        mod_full = HeteroFusion(cfg(False))
        mod_ego = HeteroFusion(cfg(True))
        v = mod_full.init(jax.random.key(0), x, mode, pair, amask)
        out_full = mod_full.apply(v, x, mode, pair, amask)
        out_ego = mod_ego.apply(v, x, mode, pair, amask)
        np.testing.assert_allclose(np.asarray(out_full),
                                   np.asarray(out_ego), atol=1e-6)


@pytest.mark.compile
def test_serving_bucket_matches_run_both():
    """camera_bucket + active_agents serving specialization must produce
    the same output as the run-both-encoders default."""
    from hmvit_tpu.data.synthetic import make_hetero_batch
    from hmvit_tpu.models.hmvit import HMViT

    from tiny_cfg import RANGE, TINY_CFG

    batch, _ = make_hetero_batch(
        seed=7, batch_size=1, max_cav=4, num_agents=3, max_points=2048,
        image_size=32, num_cams=4, camera_ratio=0.5, ego_mode="mixed",
        lidar_range=RANGE)
    batch["mode"][:, 0] = 1
    batch["mode"][:, 1] = 0
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    ncam = int((batch["mode"][0, :3] == 0).sum())

    model = HMViT(TINY_CFG)
    v = model.init(jax.random.key(0), jb, train=False)
    base = model.apply(v, jb, train=False)
    bucketed = model.apply(v, jb, train=False, camera_bucket=ncam,
                           active_agents=3,
                           static_ego_modality=int(batch["mode"][0, 0]))
    np.testing.assert_allclose(np.asarray(base["psm"]),
                               np.asarray(bucketed["psm"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(base["rm"]),
                               np.asarray(bucketed["rm"]),
                               atol=1e-5, rtol=1e-5)


def test_serving_bucket_debug_guard():
    """debug_checks: true installs a runtime guard that rejects a
    camera_bucket larger than the batch's true camera count (the
    documented silent-corruption mode: lidar agents inside the bucket
    would receive camera-encoded features)."""
    import pytest

    from hmvit_tpu.data.synthetic import make_hetero_batch
    from hmvit_tpu.models.hmvit import HMViT

    from tiny_cfg import RANGE, TINY_CFG

    batch, _ = make_hetero_batch(
        seed=7, batch_size=1, max_cav=4, num_agents=3, max_points=2048,
        image_size=32, num_cams=4, camera_ratio=0.5, ego_mode="mixed",
        lidar_range=RANGE)
    batch["mode"][:, 0] = 1
    batch["mode"][:, 1] = 0
    batch["mode"][:, 2] = 1
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    cfg = dict(TINY_CFG, debug_checks=True)
    model = HMViT(cfg)
    v = model.init(jax.random.key(0), jb, train=False)
    # exact count (1 camera agent): guard passes
    model.apply(v, jb, train=False, camera_bucket=1, active_agents=3)
    # rounded-up bucket: guard must raise, not corrupt
    with pytest.raises(Exception, match="camera count"):
        out = model.apply(v, jb, train=False, camera_bucket=2,
                          active_agents=3)
        jax.block_until_ready(out["psm"])


@pytest.mark.compile
def test_serving_bucket_degenerate_fleets():
    """All-lidar (camera_bucket=0) and all-camera (camera_bucket=L)
    fleets skip the unused encoder yet match the run-both outputs."""
    from hmvit_tpu.data.synthetic import make_hetero_batch
    from hmvit_tpu.models.hmvit import HMViT

    from tiny_cfg import RANGE, TINY_CFG

    batch, _ = make_hetero_batch(
        seed=11, batch_size=1, max_cav=3, num_agents=3, max_points=2048,
        image_size=32, num_cams=4, camera_ratio=0.5, ego_mode="mixed",
        lidar_range=RANGE)
    model = HMViT(TINY_CFG)

    for fleet_mode, bucket in ((1, 0), (0, 3)):
        batch["mode"][:] = fleet_mode
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        v = model.init(jax.random.key(0), jb, train=False)
        base = model.apply(v, jb, train=False)
        got = model.apply(v, jb, train=False, camera_bucket=bucket,
                          active_agents=3,
                          static_ego_modality=fleet_mode)
        np.testing.assert_allclose(np.asarray(base["psm"]),
                                   np.asarray(got["psm"]),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.compile
def test_static_modes_match_dynamic():
    """static_modes (trace-time fleet layout -> type-range hetero
    projections, half the FLOPs) must be numerically identical to the
    compute-both-and-select default, alone and stacked on the serving
    buckets."""
    from hmvit_tpu.data.synthetic import make_hetero_batch
    from hmvit_tpu.models.hmvit import HMViT

    from tiny_cfg import RANGE, TINY_CFG

    batch, _ = make_hetero_batch(
        seed=11, batch_size=1, max_cav=4, num_agents=3, max_points=2048,
        image_size=32, num_cams=4, camera_ratio=0.5, ego_mode="mixed",
        lidar_range=RANGE)
    batch["mode"][:, 0] = 1
    batch["mode"][:, 1] = 0
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    modes_full = tuple(int(m) for m in batch["mode"][0])
    ncam = int((batch["mode"][0, :3] == 0).sum())

    model = HMViT(TINY_CFG)
    v = model.init(jax.random.key(0), jb, train=False)
    base = model.apply(v, jb, train=False)
    static = model.apply(v, jb, train=False, static_modes=modes_full)
    np.testing.assert_allclose(np.asarray(base["psm"]),
                               np.asarray(static["psm"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(base["rm"]),
                               np.asarray(static["rm"]),
                               atol=1e-5, rtol=1e-5)

    stacked = model.apply(v, jb, train=False, camera_bucket=ncam,
                          active_agents=3,
                          static_ego_modality=int(batch["mode"][0, 0]),
                          static_modes=modes_full[:3])
    np.testing.assert_allclose(np.asarray(base["psm"]),
                               np.asarray(stacked["psm"]),
                               atol=1e-5, rtol=1e-5)


def test_hetero_dense_static_modes_identical():
    from hmvit_tpu.models.layers import HeteroDense

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 5, 8)).astype(np.float32))
    mode = jnp.asarray([[1, 0, 1], [0, 0, 1]])
    layer = HeteroDense(16)
    v = layer.init(jax.random.key(0), x, mode)
    base = layer.apply(v, x, mode)
    # static path requires a single layout for the whole batch
    x1, m1 = x[:1], mode[:1]
    np.testing.assert_allclose(
        np.asarray(layer.apply(v, x1, m1, (1, 0, 1))),
        np.asarray(layer.apply(v, x1, m1)), atol=1e-6, rtol=1e-6)
    assert base.shape == (2, 3, 5, 16)


def test_hetero_layernorm_single_pass_moments():
    """HeteroLayerNorm's one-pass E[x^2]-E[x]^2 variance must match a
    two-pass fp64 oracle, including under a large common offset (the
    worst case for one-pass cancellation at fp32)."""
    from hmvit_tpu.models.layers import HeteroLayerNorm

    rng = np.random.default_rng(3)
    base = rng.normal(size=(1, 3, 4, 4, 32)).astype(np.float32)
    mode = jnp.asarray([[0, 1, 0]])
    ln = HeteroLayerNorm(num_types=2)
    v = ln.init(jax.random.key(0), jnp.asarray(base), mode)
    # non-trivial affine params so the gather path is exercised too
    v = jax.tree_util.tree_map(
        lambda p: p + jnp.asarray(
            rng.normal(size=p.shape, scale=0.3).astype(np.float32)), v)

    for offset in (0.0, 30.0):
        x = base + offset
        got = np.asarray(ln.apply(v, jnp.asarray(x), mode))
        x64 = x.astype(np.float64)
        mean = x64.mean(-1, keepdims=True)
        var = ((x64 - mean) ** 2).mean(-1, keepdims=True)
        y = (x64 - mean) / np.sqrt(var + 1e-5)
        s = np.asarray(v["params"]["scale"])[np.asarray(mode)]
        b = np.asarray(v["params"]["bias"])[np.asarray(mode)]
        want = y * s[:, :, None, None, :] + b[:, :, None, None, :]
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)
