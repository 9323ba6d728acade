"""Reference-checkpoint importer: torch ``net_epoch%d.pth`` -> orbax.

The reference saves plain ``model.state_dict()`` files named
``net_epoch%d.pth`` in the run directory (reference:
opencood/tools/train_utils.py:26-74, the ``findLastCheckpoint`` /
``load_saved_model`` pair).  This CLI loads such a state_dict and maps
it, key-by-key, into the flax param/batch_stats trees of this repo's
reference-faithful twins, then writes an orbax checkpoint that
``restore_checkpoint`` (train/checkpointing.py) and the inference CLI
can consume:

  python -m hmvit_tpu.tools.convert_checkpoint \
      --from_reference <run_dir | net_epochN.pth> \
      --core_method point_pillar --output out_ckpt/

Supported conversions (each golden-parity-tested in
tests/test_reference_parity.py / test_fax_ref_parity.py; the round-trip
through THIS module is tested in tests/test_convert_checkpoint.py):

  point_pillar   full detector: PillarVFE -> PointPillarScatter ->
                 BaseBEVBackbone -> DownsampleConv -> cls/reg heads
                 (reference: opencood/models/point_pillar.py:9-62)
  fax            the FAXModule camera->BEV subtree of corpbevt-style
                 models (reference: opencood/models/sub_modules/
                 fax_modules.py), into models/fax_ref.RefFAXModule
  cvt            the CVT CrossViewModule subtree (reference:
                 opencood/models/sub_modules/cvt_modules.py), into
                 models/cvt_ref.RefCrossViewModule

All array-layout conventions (conv NCHW->HWIO, deconv kernel flip,
linear transpose, BatchNorm weight/bias/running_* -> scale/bias +
mean/var) are the ones proven bit-accurate by the golden weight-copy
parity tests.  Keys the converter does not consume are reported so a
user can see exactly what was and wasn't ported.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re

import numpy as np


# ---------------------------------------------------------------------
# state_dict access + array-layout converters
# ---------------------------------------------------------------------
class StateDict:
    """A torch state_dict (name -> numpy) that records consumed keys."""

    def __init__(self, raw: dict):
        self.raw = {k: np.asarray(v) for k, v in raw.items()}
        self.used: set[str] = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.raw:
            raise KeyError(
                f"reference checkpoint is missing {key!r} — wrong "
                f"--core_method / --prefix, or a different model family")
        self.used.add(key)
        return self.raw[key]

    def has(self, key: str) -> bool:
        return key in self.raw

    def unused(self) -> list[str]:
        # num_batches_tracked / relative_position_index carry no
        # information (BN step counters; constant index tables we
        # recompute host-side)
        skip = ("num_batches_tracked", "relative_position_index")
        return sorted(
            k for k in self.raw
            if k not in self.used and not k.endswith(skip)
        )


def conv(sd: StateDict, p: str) -> dict:
    """torch Conv2d (out, in, kh, kw) -> flax Conv (kh, kw, in, out)."""
    out = {"kernel": sd.take(f"{p}.weight").transpose(2, 3, 1, 0)}
    if sd.has(f"{p}.bias"):
        out["bias"] = sd.take(f"{p}.bias")
    return out


def conv_transpose(sd: StateDict, p: str) -> dict:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose
    (kh, kw, in, out) with the spatial flip (flax's conv_transpose does
    not flip kernels; torch's adjoint-conv semantics do)."""
    w = sd.take(f"{p}.weight")[:, :, ::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1))}
    if sd.has(f"{p}.bias"):
        out["bias"] = sd.take(f"{p}.bias")
    return out


def linear(sd: StateDict, p: str) -> dict:
    out = {"kernel": sd.take(f"{p}.weight").T}
    if sd.has(f"{p}.bias"):
        out["bias"] = sd.take(f"{p}.bias")
    return out


def layernorm(sd: StateDict, p: str) -> dict:
    return {"scale": sd.take(f"{p}.weight"), "bias": sd.take(f"{p}.bias")}


def batchnorm(sd: StateDict, p: str) -> tuple[dict, dict]:
    """-> (params {scale, bias}, batch_stats {mean, var})."""
    return (
        {"scale": sd.take(f"{p}.weight"), "bias": sd.take(f"{p}.bias")},
        {"mean": sd.take(f"{p}.running_mean"),
         "var": sd.take(f"{p}.running_var")},
    )


# ---------------------------------------------------------------------
# point_pillar: the full lidar detector
# ---------------------------------------------------------------------
def convert_point_pillar(sd: StateDict, margs: dict) -> dict:
    """Reference PointPillar state_dict -> PointPillarDetector variables.

    Key layout being consumed (reference point_pillar.py:9-40):
      pillar_vfe.pfn_layers.{i}.linear / .norm
      backbone.blocks.{si}.{1,2,4,5,...} / backbone.deblocks.{si}.{0,1}
      shrink_conv.layers.{i}.double_conv.{0,2}
      cls_head / reg_head
    """
    enc_params: dict = {}
    enc_stats: dict = {}

    # PillarVFE -> PillarFeatureNet_0 (Dense_i + MaskedBatchNorm_i).
    # The flax module computes masked statistics; at inference both use
    # the stored running stats, so the mapping is exact.
    pfn_p, pfn_s = {}, {}
    i = 0
    while sd.has(f"pillar_vfe.pfn_layers.{i}.linear.weight"):
        pfn_p[f"Dense_{i}"] = linear(sd, f"pillar_vfe.pfn_layers.{i}.linear")
        bnp, bns = batchnorm(sd, f"pillar_vfe.pfn_layers.{i}.norm")
        pfn_p[f"MaskedBatchNorm_{i}"] = bnp
        pfn_s[f"MaskedBatchNorm_{i}"] = bns
        i += 1
    if i == 0:
        raise KeyError("no pillar_vfe.pfn_layers.* keys found")
    enc_params["PillarFeatureNet_0"] = pfn_p
    enc_stats["PillarFeatureNet_0"] = pfn_s

    # BaseBEVBackbone -> BEVBackbone_0.  Reference block layout
    # (base_bev_backbone.py:40-57): [ZeroPad, Conv, BN, ReLU] +
    # [Conv, BN, ReLU] * layer_nums[si]; deblocks: [ConvT|Conv, BN, ReLU].
    bb = margs["base_bev_backbone"]
    bb_p, bb_s = {}, {}
    ci = 0
    n_convT = n_conv = 0
    for si, n_layers in enumerate(bb["layer_nums"]):
        idxs = [1] + [4 + 3 * k for k in range(n_layers)]
        for idx in idxs:
            bb_p[f"ConvBNReLU_{ci}"] = {
                "Conv_0": conv(sd, f"backbone.blocks.{si}.{idx}")}
            bnp, bns = batchnorm(sd, f"backbone.blocks.{si}.{idx + 1}")
            bb_p[f"ConvBNReLU_{ci}"]["BatchNorm_0"] = bnp
            bb_s[f"ConvBNReLU_{ci}"] = {"BatchNorm_0": bns}
            ci += 1
        stride = bb["upsample_strides"][si]
        de = f"backbone.deblocks.{si}"
        if stride >= 1:
            bb_p[f"ConvTranspose_{n_convT}"] = conv_transpose(sd, f"{de}.0")
            n_convT += 1
        else:
            bb_p[f"Conv_{n_conv}"] = conv(sd, f"{de}.0")
            n_conv += 1
        bnp, bns = batchnorm(sd, f"{de}.1")
        bb_p[f"BatchNorm_{si}"] = bnp
        bb_s[f"BatchNorm_{si}"] = bns
    enc_params["BEVBackbone_0"] = bb_p
    enc_stats["BEVBackbone_0"] = bb_s

    # DownsampleConv (shrink header) -> DownsampleConv_0
    if "shrink_header" in margs:
        dc_p = {}
        for li in range(len(margs["shrink_header"]["dim"])):
            base = f"shrink_conv.layers.{li}.double_conv"
            dc_p[f"DoubleConv_{li}"] = {
                "Conv_0": conv(sd, f"{base}.0"),
                "Conv_1": conv(sd, f"{base}.2"),
            }
        enc_params["DownsampleConv_0"] = dc_p

    params = {"PointPillarEncoder_0": enc_params,
              "DetectionHead_0": {"Conv_0": conv(sd, "cls_head"),
                                  "Conv_1": conv(sd, "reg_head")}}
    stats = {"PointPillarEncoder_0": enc_stats}
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------
# FAX / CVT camera->BEV subtrees
# ---------------------------------------------------------------------
def _attend(sd: StateDict, p: str) -> dict:
    """Reference fax Attend block (to_q/to_k/to_v: [LN, Linear]) ->
    fax_ref attention params."""
    return {
        "to_q_norm": layernorm(sd, f"{p}.to_q.0"),
        "to_q": linear(sd, f"{p}.to_q.1"),
        "to_k_norm": layernorm(sd, f"{p}.to_k.0"),
        "to_k": linear(sd, f"{p}.to_k.1"),
        "to_v_norm": layernorm(sd, f"{p}.to_v.0"),
        "to_v": linear(sd, f"{p}.to_v.1"),
        "proj": linear(sd, f"{p}.proj"),
    }


def _fax_cva(sd: StateDict, p: str) -> tuple[dict, dict]:
    """Reference CrossViewSwapAttention subtree at prefix ``p`` ->
    (params, stats) for fax_ref.RefCrossViewSwapAttention."""
    params = {
        "cam_embed": conv(sd, f"{p}.cam_embed"),
        "img_embed": conv(sd, f"{p}.img_embed"),
        "feature_proj": conv(sd, f"{p}.feature_proj.2"),
        "feature_linear": conv(sd, f"{p}.feature_linear.2"),
        "cross_win_attend_1": _attend(sd, f"{p}.cross_win_attend_1"),
        "cross_win_attend_2": _attend(sd, f"{p}.cross_win_attend_2"),
        "prenorm_1": layernorm(sd, f"{p}.prenorm_1"),
        "prenorm_2": layernorm(sd, f"{p}.prenorm_2"),
        "postnorm": layernorm(sd, f"{p}.postnorm"),
        "mlp_1_fc1": linear(sd, f"{p}.mlp_1.0"),
        "mlp_1_fc2": linear(sd, f"{p}.mlp_1.2"),
        "mlp_2_fc1": linear(sd, f"{p}.mlp_2.0"),
        "mlp_2_fc2": linear(sd, f"{p}.mlp_2.2"),
    }
    if sd.has(f"{p}.bev_embed.weight"):
        params["bev_embed"] = conv(sd, f"{p}.bev_embed")
    stats = {}
    for name in ("feature_proj", "feature_linear"):
        bnp, bns = batchnorm(sd, f"{p}.{name}.0")
        params[f"{name}_bn"] = bnp
        stats[f"{name}_bn"] = bns
    return params, stats


def _bottlenecks(sd: StateDict, p: str, params: dict, stats: dict,
                 out_key: str) -> None:
    """layers.{i} = Sequential of torchvision Bottlenecks -> layers_{i}_{j}
    param groups (conv1..3 + bn1..3, optional downsample)."""
    j = 0
    while sd.has(f"{p}.{j}.conv1.weight"):
        bp, bs = {}, {}
        for k in (1, 2, 3):
            bp[f"conv{k}"] = conv(sd, f"{p}.{j}.conv{k}")
            bnp, bns = batchnorm(sd, f"{p}.{j}.bn{k}")
            bp[f"bn{k}"] = bnp
            bs[f"bn{k}"] = bns
        if sd.has(f"{p}.{j}.downsample.0.weight"):
            bp["downsample_conv"] = conv(sd, f"{p}.{j}.downsample.0")
            bnp, bns = batchnorm(sd, f"{p}.{j}.downsample.1")
            bp["downsample_bn"] = bnp
            bs["downsample_bn"] = bns
        params[f"{out_key}_{j}"] = bp
        stats[f"{out_key}_{j}"] = bs
        j += 1


def convert_fax_module(sd: StateDict, prefix: str = "fax") -> dict:
    """Reference FAXModule subtree -> fax_ref.RefFAXModule variables."""
    p, s = {}, {}
    p["bev_embedding"] = {"learned_features": sd.take(
        f"{prefix}.bev_embedding.learned_features")}
    i = 0
    while sd.has(f"{prefix}.cross_views.{i}.cam_embed.weight"):
        cp, cs = _fax_cva(sd, f"{prefix}.cross_views.{i}")
        p[f"cross_views_{i}"] = cp
        s[f"cross_views_{i}"] = cs
        _bottlenecks(sd, f"{prefix}.layers.{i}", p, s, f"layers_{i}")
        i += 1
    if i == 0:
        raise KeyError(f"no {prefix}.cross_views.* keys found")
    j = 0
    while sd.has(f"{prefix}.downsample_layers.{j}.0.0.weight"):
        base = f"{prefix}.downsample_layers.{j}.0"
        dp = {"conv_pre": conv(sd, f"{base}.0"),
              "conv_mid": conv(sd, f"{base}.2"),
              "conv_post": conv(sd, f"{base}.5")}
        ds = {}
        for name, idx in (("bn_mid", 3), ("bn_post", 6)):
            bnp, bns = batchnorm(sd, f"{base}.{idx}")
            dp[name] = bnp
            ds[name] = bns
        p[f"downsample_layers_{j}"] = dp
        s[f"downsample_layers_{j}"] = ds
        j += 1
    p["self_attn"] = {
        "to_qkv": linear(sd, f"{prefix}.self_attn.to_qkv"),
        "to_out": linear(sd, f"{prefix}.self_attn.to_out.0"),
        "rel_pos_bias": sd.take(f"{prefix}.self_attn.rel_pos_bias.weight"),
    }
    return {"params": p, "batch_stats": s}


def convert_cvt_module(sd: StateDict, prefix: str = "cvm") -> dict:
    """Reference CVT CrossViewModule subtree ->
    cvt_ref.RefCrossViewModule variables."""
    p: dict = {"bev_embedding_learned_features": sd.take(
        f"{prefix}.bev_embedding.learned_features")}
    s: dict = {}
    i = 0
    while sd.has(f"{prefix}.cross_views.{i}.cam_embed.weight"):
        base = f"{prefix}.cross_views.{i}"
        ca = f"{base}.cross_attend"
        cp = {
            "cam_embed": conv(sd, f"{base}.cam_embed"),
            "img_embed": conv(sd, f"{base}.img_embed"),
            "bev_embed": conv(sd, f"{base}.bev_embed"),
            "feature_proj": conv(sd, f"{base}.feature_proj.2"),
            "feature_linear": conv(sd, f"{base}.feature_linear.2"),
            "cross_attend": {
                "to_q_norm": layernorm(sd, f"{ca}.to_q.0"),
                "to_q": linear(sd, f"{ca}.to_q.1"),
                "to_k_norm": layernorm(sd, f"{ca}.to_k.0"),
                "to_k": linear(sd, f"{ca}.to_k.1"),
                "to_v_norm": layernorm(sd, f"{ca}.to_v.0"),
                "to_v": linear(sd, f"{ca}.to_v.1"),
                "proj": linear(sd, f"{ca}.proj"),
                "prenorm": layernorm(sd, f"{ca}.prenorm"),
                "postnorm": layernorm(sd, f"{ca}.postnorm"),
                "mlp_fc1": linear(sd, f"{ca}.mlp.0"),
                "mlp_fc2": linear(sd, f"{ca}.mlp.2"),
            },
        }
        cs = {}
        for name in ("feature_proj", "feature_linear"):
            bnp, bns = batchnorm(sd, f"{base}.{name}.0")
            cp[f"{name}_bn"] = bnp
            cs[f"{name}_bn"] = bns
        p[f"cross_views_{i}"] = cp
        s[f"cross_views_{i}"] = cs
        _bottlenecks(sd, f"{prefix}.layers.{i}", p, s, f"layers_{i}")
        i += 1
    if i == 0:
        raise KeyError(f"no {prefix}.cross_views.* keys found")
    return {"params": p, "batch_stats": s}


# ---------------------------------------------------------------------
# H3GAT hetero-fusion trunk
# ---------------------------------------------------------------------
def _stacked_linear(sd: StateDict, fmt: str, n_types: int = 2) -> dict:
    """Per-type torch Linears -> one stacked HeteroDense
    {kernel (T, din, dout), bias (T, dout)}."""
    ks = [sd.take(fmt.format(t) + ".weight").T for t in range(n_types)]
    bs = [sd.take(fmt.format(t) + ".bias") for t in range(n_types)]
    return {"kernel": np.stack(ks), "bias": np.stack(bs)}


def _hetero_ln(sd: StateDict, p: str, n_types: int = 2) -> dict:
    """Reference HeteroLayerNorm (per-type nn.LayerNorm under .net.{t})
    -> stacked {scale (T, c), bias (T, c)}."""
    return {"scale": np.stack([sd.take(f"{p}.net.{t}.weight")
                               for t in range(n_types)]),
            "bias": np.stack([sd.take(f"{p}.net.{t}.bias")
                              for t in range(n_types)])}


def _hetero_ffn(sd: StateDict, p: str, n_types: int = 2) -> dict:
    """Reference HeteroFeedForward (.net.{t} = Sequential[Linear, GELU,
    Dropout, Linear, Dropout]) -> {HeteroDense_0, HeteroDense_1}."""
    return {"HeteroDense_0": _stacked_linear(sd, p + ".net.{}.0", n_types),
            "HeteroDense_1": _stacked_linear(sd, p + ".net.{}.3", n_types)}


def _hetero_attn(sd: StateDict, p: str, n_types: int = 2) -> dict:
    """Reference HeteroAttention -> HeteroWindowAttention params.

    relation_msg convention: the reference applies W^T v
    (hetero_fusion.py:263); ours applies W v — transposed on import
    (same mapping the golden parity test uses)."""
    return {
        "to_q": _stacked_linear(sd, p + ".q_linears.{}", n_types),
        "to_k": _stacked_linear(sd, p + ".k_linears.{}", n_types),
        "to_v": _stacked_linear(sd, p + ".v_linears.{}", n_types),
        # a_linears are Sequential[Linear, Dropout]
        "to_out": _stacked_linear(sd, p + ".a_linears.{}.0", n_types),
        "relation_att": sd.take(f"{p}.relation_att"),
        "relation_msg": np.swapaxes(
            sd.take(f"{p}.relation_msg"), -1, -2),
        "rel_pos_bias": sd.take(
            f"{p}.relative_position_bias_table.weight"),
    }


def convert_hetero_fusion(sd: StateDict,
                          prefix: str = "fusion_net") -> dict:
    """Reference HeteroFusion trunk (the H3GAT core of
    bevformer_point_pillar_hetero.py:22-49: one shared
    HeteroFusionBlock iterated num_iters times + mlp_head) ->
    models/hetero_fusion.HeteroFusion variables.  Graft into a full
    HMViT tree at the 'fusion' key (train/checkpointing.graft_subtree).

    The reference's ``aggregate_fc`` is parallel-architect-mode-only
    and is left unconsumed for sequential checkpoints (reported)."""
    blk = f"{prefix}.hetero_fusion_block"
    params = {
        "HeteroFusionBlock_0": {
            "window_norm": _hetero_ln(sd, f"{blk}.window_norm"),
            "window_attn": _hetero_attn(sd, f"{blk}.window_attention"),
            "window_ffn_norm": _hetero_ln(sd, f"{blk}.window_ffd.norm"),
            "window_ffn": _hetero_ffn(sd, f"{blk}.window_ffd.fn"),
            "grid_norm": _hetero_ln(sd, f"{blk}.grid_norm"),
            "grid_attn": _hetero_attn(sd, f"{blk}.grid_attention"),
            "grid_ffn_norm": _hetero_ln(sd, f"{blk}.grid_ffd.norm"),
            "grid_ffn": _hetero_ffn(sd, f"{blk}.grid_ffd.fn"),
        },
        "mlp_head": _hetero_ffn(sd, f"{prefix}.mlp_head"),
    }
    return {"params": params, "batch_stats": {}}


CONVERTERS = {
    "point_pillar": lambda sd, margs, prefix: convert_point_pillar(sd, margs),
    "fax": lambda sd, margs, prefix: convert_fax_module(sd, prefix or "fax"),
    "cvt": lambda sd, margs, prefix: convert_cvt_module(sd, prefix or "cvm"),
    "hetero_fusion": lambda sd, margs, prefix: convert_hetero_fusion(
        sd, prefix or "fusion_net"),
}


# ---------------------------------------------------------------------
# checkpoint discovery + CLI
# ---------------------------------------------------------------------
def find_reference_checkpoint(path: str) -> str:
    """A file path is used as-is; a directory is searched for the
    highest ``net_epoch%d.pth`` (reference train_utils.py:26-36)."""
    if os.path.isfile(path):
        return path
    hits = []
    for f in glob.glob(os.path.join(path, "*epoch*.pth")):
        m = re.findall(r".*epoch(\d+).pth", f)
        if m:
            hits.append((int(m[0]), f))
    if not hits:
        raise FileNotFoundError(f"no net_epoch*.pth under {path!r}")
    return max(hits)[1]


def load_torch_state_dict(path: str) -> StateDict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(obj, dict):
        raise TypeError(f"{path!r} did not contain a state_dict")
    # some trainers wrap the state_dict one level down
    for key in ("model_state_dict", "state_dict", "model"):
        if key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    return StateDict({k: v.numpy() if hasattr(v, "numpy") else v
                      for k, v in obj.items()})


def convert(path: str, core_method: str, margs: dict | None = None,
            prefix: str | None = None) -> tuple[dict, list[str]]:
    """-> (variables {params, batch_stats}, unconsumed key names)."""
    if core_method not in CONVERTERS:
        raise ValueError(
            f"unsupported core_method {core_method!r}; "
            f"supported: {sorted(CONVERTERS)}")
    sd = load_torch_state_dict(find_reference_checkpoint(path))
    variables = CONVERTERS[core_method](sd, margs or {}, prefix)
    return variables, sd.unused()


def main(argv=None):
    ap = argparse.ArgumentParser(
        "convert a reference torch checkpoint to an orbax checkpoint")
    ap.add_argument("--from_reference", required=True,
                    help="reference run dir (picks the last net_epochN"
                         ".pth) or a .pth file")
    ap.add_argument("--core_method", required=True,
                    choices=sorted(CONVERTERS))
    ap.add_argument("--hypes", default=None,
                    help="yaml whose model.args parameterize structure-"
                         "dependent mappings (required for point_pillar)")
    ap.add_argument("--prefix", default=None,
                    help="state_dict prefix of the camera subtree "
                         "(fax: 'fax', cvt: 'cvm')")
    ap.add_argument("--output", required=True, help="orbax ckpt dir")
    args = ap.parse_args(argv)

    margs = None
    if args.hypes:
        from ..config.loader import load_config

        margs = load_config(args.hypes)["model"]["args"]
    if args.core_method == "point_pillar" and margs is None:
        ap.error("--hypes is required for point_pillar (backbone "
                 "layer_nums / upsample_strides shape the param tree)")

    variables, unused = convert(args.from_reference, args.core_method,
                                margs, args.prefix)

    import jax.numpy as jnp

    variables = {k: __import__("jax").tree_util.tree_map(jnp.asarray, v)
                 for k, v in variables.items()}
    from ..train.checkpointing import save_checkpoint

    save_checkpoint(args.output, 0, variables)
    n = sum(int(np.prod(x.shape)) for x in
            __import__("jax").tree_util.tree_leaves(variables["params"]))
    report = {"converted_params": n,
              "output": os.path.abspath(args.output),
              "unconsumed_keys": unused}
    with open(os.path.join(args.output, "conversion_report.json"),
              "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"converted_params": n,
                      "unconsumed_key_count": len(unused)}))
    if unused:
        print("unconsumed keys (not part of the converted subtree):")
        for k in unused[:40]:
            print(f"  {k}")
        if len(unused) > 40:
            print(f"  ... and {len(unused) - 40} more")
    return report


if __name__ == "__main__":
    main()
