"""YAML config ("hypes") loading with a derived-parameter parser registry.

The public config surface mirrors the reference's hypes_yaml contract
(reference: opencood/hypes_yaml/yaml_utils.py:11-52): the YAML names its own
post-processors via a top-level ``yaml_parser`` key (string or list), and a
run directory's ``config.yaml`` snapshot can be reloaded for resume /
inference.  Differences by design:

* parsers are looked up in an explicit registry instead of ``eval()``;
* the mmcv py-config bridge is replaced by plain YAML sub-configs.
"""
from __future__ import annotations

import math
import os
import re
from typing import Callable

import numpy as np
import yaml

_PARSERS: dict[str, Callable[[dict], dict]] = {}


def register_parser(fn: Callable[[dict], dict]):
    _PARSERS[fn.__name__] = fn
    return fn


# PyYAML's default resolver misses floats like "2e-4"; extend it the same
# way the reference does (yaml_utils.py:32-41) so configs stay portable.
_FLOAT_TAG = re.compile(
    r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
    |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
    |\.[0-9_]+(?:[eE][-+][0-9]+)?
    |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\.[0-9_]*
    |[-+]?\.(?:inf|Inf|INF)
    |\.(?:nan|NaN|NAN))$""",
    re.X,
)


class _Loader(yaml.SafeLoader):
    pass


_Loader.add_implicit_resolver(
    "tag:yaml.org,2002:float", _FLOAT_TAG, list("-+0123456789.")
)


def load_config(path: str, model_dir: str | None = None) -> dict:
    """Load a hypes YAML; if ``model_dir`` is given, its config snapshot wins."""
    if model_dir:
        snap = os.path.join(model_dir, "config.yaml")
        if os.path.exists(snap):
            path = snap
    with open(path) as f:
        params = yaml.load(f, Loader=_Loader)
    params["fileDirname"] = os.path.dirname(os.path.abspath(path))

    parsers = params.get("yaml_parser")
    if parsers:
        if isinstance(parsers, str):
            parsers = [parsers]
        for name in parsers:
            if name not in _PARSERS:
                raise KeyError(
                    f"unknown yaml_parser {name!r}; known: {sorted(_PARSERS)}"
                )
            params = _PARSERS[name](params)
    return params


def save_config(params: dict, path: str) -> None:
    out = {k: v for k, v in params.items() if k != "fileDirname"}
    with open(path, "w") as f:
        yaml.dump(_plain(out), f, default_flow_style=False)


def _plain(obj):
    """Recursively convert numpy scalars/arrays so yaml.dump stays clean."""
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, np.generic):
        return obj.item()
    return obj


def _lidar_voxel_size(params: dict):
    args = params["preprocess"]["args"]
    if "voxel_size" in args:
        return args["voxel_size"]
    return args["lidar_preprocess"]["args"]["voxel_size"]


def _fill_anchor_grid(params: dict) -> dict:
    """Derive anchor grid extents W/H/D and voxel sizes from the lidar range."""
    rng = params["preprocess"]["cav_lidar_range"]
    vw, vh, vd = _lidar_voxel_size(params)
    anchor_args = params["postprocess"]["anchor_args"]
    anchor_args.update(
        vw=vw,
        vh=vh,
        vd=vd,
        W=math.ceil((rng[3] - rng[0]) / vw),
        H=math.ceil((rng[4] - rng[1]) / vh),
        D=math.ceil((rng[5] - rng[2]) / vd),
    )
    return params


def _grid_size(params: dict) -> list[int]:
    rng = np.array(params["preprocess"]["cav_lidar_range"])
    voxel = np.array(_lidar_voxel_size(params))
    return np.round((rng[3:6] - rng[0:3]) / voxel).astype(int).tolist()


@register_parser
def load_point_pillar_params(params: dict) -> dict:
    grid = _grid_size(params)
    margs = params["model"]["args"]
    margs.setdefault("point_pillar_scatter", {})["grid_size"] = grid
    if "lidar" in margs and "point_pillar_scatter" in margs["lidar"]:
        margs["lidar"]["point_pillar_scatter"]["grid_size"] = grid
    return _fill_anchor_grid(params)


@register_parser
def load_camera_point_pillar_params(params: dict) -> dict:
    grid = _grid_size(params)
    margs = params["model"]["args"]
    margs.setdefault("point_pillar_scatter", {})["grid_size"] = grid
    for branch in ("camera", "lidar"):
        if branch in margs and "point_pillar_scatter" in margs[branch]:
            margs[branch]["point_pillar_scatter"]["grid_size"] = grid
    return _fill_anchor_grid(params)


@register_parser
def load_voxel_params(params: dict) -> dict:
    params = _fill_anchor_grid(params)
    a = params["postprocess"]["anchor_args"]
    if "model" in params:
        params["model"]["args"].update(W=a["W"], H=a["H"], D=a["D"])
    return params


@register_parser
def load_bev_params(params: dict) -> dict:
    """BEV geometry for the anchor-free PIXOR family: derives the full
    ``geometry_param`` dict and injects it into preprocess, postprocess
    and model args (reference: opencood/hypes_yaml/yaml_utils.py:260-308;
    input z-channels are nz occupancy slices + 1 intensity)."""
    res = float(params["preprocess"]["args"]["res"])
    downsample = int(params["preprocess"]["args"]["downsample_rate"])
    rng = params["preprocess"]["cav_lidar_range"]
    l1, w1, h1, l2, w2, h2 = [float(v) for v in rng]
    nx, ny, nz = (int((l2 - l1) / res), int((w2 - w1) / res),
                  int((h2 - h1) / res))
    geometry = {
        "L1": l1, "L2": l2, "W1": w1, "W2": w2, "H1": h1, "H2": h2,
        "res": res, "downsample_rate": downsample,
        "input_shape": (nx, ny, nz + 1),
        "label_shape": (nx // downsample, ny // downsample, 7),
    }
    params["preprocess"]["geometry_param"] = geometry
    params["postprocess"]["geometry_param"] = geometry
    if "model" in params:
        params["model"]["args"]["geometry_param"] = geometry
    params["postprocess"]["anchor_args"] = params["postprocess"].get(
        "anchor_args", {}
    )
    params["postprocess"]["anchor_args"]["cav_lidar_range"] = rng
    return params


@register_parser
def load_camera_params(params: dict) -> dict:
    """Camera-only families: anchors still derived for detection eval."""
    return _fill_anchor_grid(params)
