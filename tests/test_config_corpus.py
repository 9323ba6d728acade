"""Every shipped hypes config must load through the parser registry and
build its model; every unique model core_method must also FORWARD on a
tiny synthetic batch (shrunk dims, same topology)."""
import copy
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from hmvit_tpu.config.loader import _PARSERS
from hmvit_tpu.data.synthetic import make_hetero_batch
from hmvit_tpu.models.zoo import build_model

HYPES = os.path.join(os.path.dirname(__file__), "..", "hmvit_tpu",
                     "config", "hypes")
ALL_YAMLS = sorted(glob.glob(os.path.join(HYPES, "**", "*.yaml"),
                             recursive=True))
SMALL_RANGE = [-10.24, -10.24, -3.0, 10.24, 10.24, 1.0]


def load_raw(path):
    with open(path) as f:
        params = yaml.safe_load(f)
    for name in params.get("yaml_parser", []):
        params = _PARSERS[name](params)
    return params


def tiny_camera(enc):
    cam = {"encoder": enc, "dim": 32, "bev_size": 8, "out_dim": 48,
           "num_blocks": 1, "decoder_layers": 1, "img_size": 32,
           "encoder_channels": [16, 16, 32, 32], "window": 4,
           "dim_head": 8, "num_layers": 1, "upsample": 1}
    return cam


def shrink(params):
    """Scale a production config to CPU-testable dims, preserving the
    topology (same core_method, same block structure)."""
    p = copy.deepcopy(params)
    p["preprocess"]["cav_lidar_range"] = list(SMALL_RANGE)
    cam_args = p["preprocess"]["args"].get("camera_preprocess",
                                           {}).get("args", {})
    cam_args["resize_x"] = cam_args["resize_y"] = 32
    lp = p["preprocess"]["args"].get("lidar_preprocess", {}).get("args",
                                                                 {})
    core = p.get("model", {}).get("core_method", "")
    voxel = [0.64, 0.64, lp.get("voxel_size", [0, 0, 4])[2]]
    if voxel[2] < 4:
        # faithful VoxelNet CML (s2/VALID-z/s2) needs nz >= 5 to not
        # collapse; anchor-free pixor needs nx, ny divisible by 16
        voxel[2] = 0.4 if core.startswith("voxel_net") else 2.0
    if core.startswith("second"):
        # faithful VoxelBackbone8x z chain (25 -> 13 -> 7 -> 3 -> 1)
        # needs nz >= 24
        voxel[2] = 4.0 / 24.0
    lp["voxel_size"] = voxel
    if core.startswith("pixor"):
        p["preprocess"]["args"]["res"] = 0.64

    margs = p["model"]["args"]
    if "camera" in margs:
        margs["camera"] = tiny_camera(margs["camera"].get("encoder",
                                                          "cvt"))
    grid = [round((SMALL_RANGE[3] - SMALL_RANGE[0]) / voxel[0]),
            round((SMALL_RANGE[4] - SMALL_RANGE[1]) / voxel[1]),
            round((SMALL_RANGE[5] - SMALL_RANGE[2]) / voxel[2])]
    if "lidar" in margs:
        la = margs["lidar"]
        la["voxel_size"] = voxel
        la["lidar_range"] = list(SMALL_RANGE)
        la["pillar_vfe"]["num_filters"] = [16]
        la["point_pillar_scatter"] = {"num_features": 16,
                                      "grid_size": grid}
        la["base_bev_backbone"] = {
            "layer_nums": [1, 1, 1], "layer_strides": [2, 2, 2],
            "num_filters": [16, 16, 16], "upsample_strides": [1, 2, 4],
            "num_upsample_filter": [16, 16, 16]}
        la["shrink_header"] = {"kernal_size": [3], "stride": [1],
                               "padding": [1], "dim": [48],
                               "input_dim": 48}
        if "grid_size" in la:
            la["grid_size"] = grid
        if "vfe_filters" in la:
            la["vfe_filters"] = 8
        if core.startswith("second"):
            # the faithful SECOND trunk already downsamples 8x; its BEV
            # backbone keeps the reference's two-stage [1, 2] strides
            la["base_bev_backbone"] = {
                "layer_nums": [1, 1], "layer_strides": [1, 2],
                "num_filters": [16, 16], "upsample_strides": [1, 2],
                "num_upsample_filter": [16, 16]}
            la.pop("shrink_header", None)
    if "hetero_fusion" in margs:
        margs["hetero_fusion"] = {
            "num_iters": 1,
            "hetero_fusion_block": {
                "spatial_transform": {"downsample_rate": 4,
                                      "voxel_size": voxel},
                "architect_mode": "sequential",
                "input_dim": 48, "mlp_dim": 48, "window_size": 4,
                "dim_head": 8, "drop_out": 0.0},
        }
    if "hetero_decoder" in margs:
        margs["hetero_decoder"] = {"input_dim": 48, "num_layer": 1,
                                   "num_ch_dec": [48],
                                   "anchor_number": 2}
    if "spatial_transform" in margs:
        margs["spatial_transform"] = {"downsample_rate": 4,
                                      "voxel_size": voxel}
    # re-derive anchor grids for the shrunk geometry
    for name in params.get("yaml_parser", []):
        p = _PARSERS[name](p)
    return p


@pytest.mark.parametrize("path", ALL_YAMLS,
                         ids=[os.path.relpath(p, HYPES)
                              for p in ALL_YAMLS])
def test_config_loads_and_builds(path):
    params = load_raw(path)
    if "model" not in params:
        # model-less data-api / visualization configs (reference:
        # visualization.yaml, opcamera/base_camera.yaml)
        assert os.path.basename(path) in ("visualization.yaml",
                                          "base_camera.yaml")
        assert params["fusion"]["core_method"]
        assert params["postprocess"]["anchor_args"]["W"] > 0
        return
    model = build_model(params["model"])
    assert model is not None
    assert params["loss"]["core_method"]
    if params["postprocess"]["core_method"] == "BevPostprocessor":
        # anchor-free family: dense label grid instead of anchors
        assert params["postprocess"]["geometry_param"]["label_shape"][0] > 0
    else:
        assert params["postprocess"]["anchor_args"]["W"] > 0


def unique_core_methods():
    seen = {}
    for path in ALL_YAMLS:
        with open(path) as f:
            model = yaml.safe_load(f).get("model")
        if model is None:
            continue
        seen.setdefault(model["core_method"], path)
    return sorted(seen.items())


@pytest.mark.slow
@pytest.mark.parametrize("core_method,path",
                         unique_core_methods(),
                         ids=[c for c, _ in unique_core_methods()])
def test_every_core_method_forwards(core_method, path):
    params = shrink(load_raw(path))
    model = build_model(params["model"])
    batch, _ = make_hetero_batch(
        seed=0, batch_size=1, max_cav=2, num_agents=2, max_points=1024,
        image_size=32, camera_ratio=0.5, ego_mode="mixed",
        lidar_range=SMALL_RANGE)
    batch["mode"][:, 0] = 1
    batch["mode"][:, 1] = 0
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    single_lidar = {"point_pillar"}
    if core_method in single_lidar:
        # single-agent late/early-fusion models take the raw cloud
        args = (jb["points"][:, 0], jb["points_mask"][:, 0])
        variables = model.init(jax.random.key(0), *args, train=False)
        out = model.apply(variables, *args, train=False)
    else:
        variables = model.init(jax.random.key(0), jb, train=False)
        out = model.apply(variables, jb, train=False)
    assert isinstance(out, dict) and out
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), (core_method, k)
    if "psm" in out:
        assert out["psm"].shape[1] == 2
    elif "cls" in out:
        # anchor-free pixor head: 1 objectness + 6 regression channels
        assert out["cls"].shape[1] == 1 and out["reg"].shape[1] == 6
    else:
        assert any(k.endswith("_seg") for k in out)


def test_reference_core_method_aliases_build():
    """Verbatim reference core_methods that the shipped twins rename
    must still resolve (a reference yaml ported unchanged should build):
    bevformer_wrapper -> bevformer-encoder CameraDetector (reference:
    opencood/hypes_yaml/opcl/bevformer_late_fusion.yaml:77)."""
    from hmvit_tpu.config.loader import load_config
    from hmvit_tpu.models.zoo import build_model

    cfg = load_config(
        os.path.join(HYPES, "opcl", "bevformer_late_fusion.yaml"))
    mc = dict(cfg["model"], core_method="bevformer_wrapper")
    model = build_model(mc)
    assert type(model).__name__ == "CameraDetector"
