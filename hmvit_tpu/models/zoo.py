"""Model registry: build any model family from its hypes config.

Replaces the reference's importlib reflection loading (reference:
opencood/tools/train_utils.py:110-143) with an explicit registry keyed by
``model.core_method``.  Reference model names map onto three assemblies:

* hetero (camera+lidar) -> :class:`hmvit_tpu.models.hmvit.HMViT`
  (H3GAT fusion) or :class:`CooperativeDetector` with another fusion;
* lidar-only -> :class:`PointPillarDetector` (single agent) or
  :class:`CooperativeDetector` (intermediate fusion);
* camera-only -> :class:`CameraDetector` / :class:`CooperativeDetector`.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .fusion import make_fusion
from .hetero_fusion import HeteroFusion
from .hmvit import HMViT, make_camera_encoder
from .layers import DetectionHead, NaiveDecoder
from .pillar_encoder import PointPillarEncoder
from .point_pillar import PointPillarDetector


class _SingleAgentLidar(nn.Module):
    """Adapter: single-agent lidar family driven by the batch dict
    (ego slot only)."""
    detector_cls: type
    lidar_cfg: dict

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        points = batch["points"][:, 0]
        pmask = batch["points_mask"][:, 0]
        return self.detector_cls(self.lidar_cfg)(points, pmask, train)


class CameraSegmentor(nn.Module):
    """Camera-only BEV segmentation (dynamic/static map task, the
    opcamera family's second output head)."""
    config: dict

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        from .seg_head import BevSegHead

        cams = batch["camera"]
        b, l = cams.shape[:2]
        bev = make_camera_encoder(self.config["camera"])(
            cams.reshape(b * l, *cams.shape[2:]),
            batch["intrinsics"].reshape(b * l, *batch["intrinsics"].shape[2:]),
            batch["extrinsics"].reshape(b * l, *batch["extrinsics"].shape[2:]),
            train,
        )
        bev = bev.reshape(b, l, *bev.shape[1:])[:, 0]
        return BevSegHead(self.config.get("target", "dynamic"))(bev)


class CameraDetector(nn.Module):
    """Single-agent camera detector (camera-only nofusion family)."""
    config: dict

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        cams = batch["camera"]
        b, l = cams.shape[:2]
        bev = make_camera_encoder(self.config["camera"])(
            cams.reshape(b * l, *cams.shape[2:]),
            batch["intrinsics"].reshape(b * l, *batch["intrinsics"].shape[2:]),
            batch["extrinsics"].reshape(b * l, *batch["extrinsics"].shape[2:]),
            train,
        )
        bev = bev.reshape(b, l, *bev.shape[1:])[:, 0]  # ego only
        psm, rm = DetectionHead(self.config["anchor_number"])(bev)
        return {"psm": psm.transpose(0, 3, 1, 2),
                "rm": rm.transpose(0, 3, 1, 2)}


class CooperativeDetector(nn.Module):
    """Generic intermediate-fusion detector: one modality's encoder on
    every agent slot, a pluggable fusion module, decoder + heads."""
    config: dict
    modality: str  # 'lidar' | 'camera'
    fusion_name: str

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        cfg = self.config
        mode = batch["mode"].astype(jnp.int32)
        agent_mask = batch["agent_mask"].astype(jnp.float32)
        pairwise = batch["pairwise_t_matrix"]
        b, l = mode.shape

        if self.modality == "lidar":
            points = batch["points"]
            if self.fusion_name == "att_bev":
                # reference intermediate-lidar semantics: raw points are
                # projected into the EGO frame before voxelization
                # (lidar_only/intermediate_fusion_dataset.py), so the
                # per-stage backbone fusion needs no feature warp
                t = batch["transformation_matrix"]  # (B, L, 4, 4)
                xyz1 = jnp.concatenate(
                    [points[..., :3], jnp.ones_like(points[..., :1])], -1)
                xyz = jnp.einsum("blij,blpj->blpi", t, xyz1)[..., :3]
                points = jnp.concatenate([xyz, points[..., 3:]], -1)
            points = points.reshape(b * l, *points.shape[2:])
            pmask = batch["points_mask"].reshape(b * l, -1)
            kind = cfg.get("lidar_encoder", "point_pillar")
            if self.fusion_name == "att_bev":
                from .pillar_encoder import (
                    AttBEVBackbone,
                    PillarFeatureNet,
                )

                lcfg = cfg["lidar"]
                bev = PillarFeatureNet(
                    num_filters=lcfg["pillar_vfe"]["num_filters"],
                    voxel_size=lcfg["voxel_size"],
                    pc_range=lcfg["lidar_range"],
                    grid_size=lcfg["point_pillar_scatter"]
                    ["grid_size"][:2],
                )(points, pmask, train)
                bb = lcfg["base_bev_backbone"]
                fused = AttBEVBackbone(
                    layer_nums=bb["layer_nums"],
                    layer_strides=bb["layer_strides"],
                    num_filters=bb["num_filters"],
                    upsample_strides=bb["upsample_strides"],
                    num_upsample_filters=bb["num_upsample_filter"],
                )(bev.reshape(b, l, *bev.shape[1:]), agent_mask, train)
                if "shrink_header" in lcfg:
                    from .layers import DownsampleConv

                    sh = lcfg["shrink_header"]
                    fused = DownsampleConv(
                        kernel_sizes=sh["kernal_size"], dims=sh["dim"],
                        strides=sh["stride"])(fused)
                dec = cfg.get("decoder")
                if dec:
                    fused = NaiveDecoder(dec["num_layer"],
                                         dec["num_ch_dec"],
                                         use_upsample=False)(fused, train)
                psm, rm = DetectionHead(cfg["anchor_number"])(fused)
                return {"psm": psm.transpose(0, 3, 1, 2),
                        "rm": rm.transpose(0, 3, 1, 2)}
            if kind == "point_pillar":
                x = PointPillarEncoder(cfg["lidar"])(points, pmask, train)
            else:
                from .lidar_zoo import SecondDetector, VoxelNetDetector
                from .pixor import PIXORDetector

                enc_cls = {"voxel_net": VoxelNetDetector,
                           "second": SecondDetector,
                           "pixor": PIXORDetector}[kind]
                x = enc_cls(cfg["lidar"], return_features=True)(
                    points, pmask, train)
        else:
            cams = batch["camera"]
            x = make_camera_encoder(cfg["camera"])(
                cams.reshape(b * l, *cams.shape[2:]),
                batch["intrinsics"].reshape(
                    b * l, *batch["intrinsics"].shape[2:]),
                batch["extrinsics"].reshape(
                    b * l, *batch["extrinsics"].shape[2:]),
                train,
            )
        h, w, c = x.shape[1:]
        x = x.reshape(b, l, h, w, c) * agent_mask[:, :, None, None, None]

        spatial = cfg.get("spatial_transform", {})
        if self.fusion_name == "hetero":
            fused = HeteroFusion(cfg["hetero_fusion"])(
                x, mode, pairwise, agent_mask, deterministic=not train)
        else:
            fused = make_fusion(
                self.fusion_name, c, spatial,
                cfg.get(f"{self.fusion_name}_fusion"))(
                x, mode, pairwise, agent_mask)

        dec = cfg.get("decoder")
        if dec:
            fused = NaiveDecoder(dec["num_layer"], dec["num_ch_dec"],
                                 use_upsample=False)(fused, train)
        if cfg.get("task") == "seg":
            # cooperative BEV segmentation (the reference opcamera
            # fusion families output map segmentation, not boxes)
            from .seg_head import BevSegHead

            return BevSegHead(cfg.get("target", "dynamic"))(fused)
        psm, rm = DetectionHead(cfg["anchor_number"])(fused)
        return {"psm": psm.transpose(0, 3, 1, 2),
                "rm": rm.transpose(0, 3, 1, 2)}


_HETERO_NAMES = {
    "hmvit", "hetero_hmvit", "bevformer_point_pillar_hetero",
    "fax_point_pillar_hetero",
}
_LIDAR_FUSIONS = {
    "point_pillar_fcooper": "fcooper",
    "point_pillar_opv2v": "att",
    # per-stage agent fusion inside the BEV backbone (reference:
    # point_pillar_intermediate.py + backbones/att_bev_backbone.py)
    "point_pillar_intermediate": "att_bev",
    "point_pillar_v2vnet": "v2vnet",
    "point_pillar_disconet": "disconet",
    "point_pillar_swap": "swap",
    "point_pillar_cobevt": "swap",
    "point_pillar_transformer": "v2xvit",
    "point_pillar_v2xt": "v2xvit",
}
_CAMERA_FUSIONS = {
    "cvt_fcooper": "fcooper",
    "cvt_att_fuse": "att",
    "cvt_v2vnet": "v2vnet",
    "cvt_disconet": "disconet",
    "corpbevt": "swap",
    "cvt_swap_fuse": "swap",
    # reference core_method spellings (opencood/models/*.py filenames)
    "cross_view_transformer_fcooper": "fcooper",
    "cross_view_transformer_att_fuse": "att",
    "cross_view_transformer_v2vnet": "v2vnet",
    "cross_view_transformer_disconet": "disconet",
    "cross_view_transformer_swap_fuse": "swap",
}
# VPN camera branch x cooperative fusion (reference:
# view_parse_network_{att_fuse,fcooper,swap_fuse,v2vnet}.py)
_VPN_FUSIONS = {
    "view_parse_network_att_fuse": "att",
    "view_parse_network_fcooper": "fcooper",
    "view_parse_network_swap_fuse": "swap",
    "view_parse_network_v2vnet": "v2vnet",
}
_MIXED_FUSIONS = {
    "fax_point_pillar_fcooper": "fcooper",
    "fax_point_pillar_att_fuse": "att",
    "fax_point_pillar_v2vnet": "v2vnet",
    "fax_point_pillar_disconet": "disconet",
    "fax_point_pillar_fax": "swap",
    "bevformer_point_pillar_fax": "swap",
    "fax_point_pillar_v2xt": "v2xvit",
    "bevformer_point_pillar_v2xt": "v2xvit",
    # remaining reference mixed wrappers
    "bevformer_point_pillar_att_fuse": "att",
    "bevformer_point_pillar_disconet": "disconet",
    "bevformer_point_pillar_v2vnet": "v2vnet",
    # CVT camera branch + pillar lidar branch + F-Cooper max fusion
    # (reference: point_pillar_cross_view_transformer_f_cooper.py)
    "point_pillar_cross_view_transformer_f_cooper": "fcooper",
    "cross_view_transformer_point_pillar_fcooper": "fcooper",
}
_CAMERA_FUSIONS.update({
    "cvt_v2xt": "v2xvit",
    "v2xt_camera": "v2xvit",
})


def build_model(model_cfg: dict) -> nn.Module:
    name = model_cfg["core_method"].lower()
    args = model_cfg["args"]
    # reference model names carry the camera branch as a prefix
    if name.startswith(("fax_", "bevformer_")) and "camera" in args:
        enc = name.split("_", 1)[0]
        args = dict(args, camera=dict(args["camera"]))
        args["camera"].setdefault("encoder", enc)
    if name in _HETERO_NAMES:
        return HMViT(args)
    if name in _MIXED_FUSIONS:
        camera = dict(args.get("camera", {}))
        if name.startswith(("point_pillar_cross_view_transformer",
                            "cross_view_transformer_point_pillar")):
            camera.setdefault("encoder", "cvt")
        args = dict(args, camera=camera) if camera else args
        return HMViT(dict(args, fusion_override=_MIXED_FUSIONS[name]))
    if name == "point_pillar":
        return PointPillarDetector(args.get("lidar", args))
    if name in ("cross_view_transformer", "cvt_nofusion", "fax"):
        return CameraDetector(args)
    if name == "bevformer_wrapper":
        # reference core_method of the single-vehicle BEVFormer late-
        # fusion model (reference: opencood/models/bevformer_wrapper.py;
        # hypes opcl/bevformer_late_fusion.yaml) — a verbatim config
        # port resolves here to the bevformer-encoder camera detector;
        # encoder 'bevformer_ref' selects the checkpoint-portable twin
        # (trunk + NaiveDecoder + heads, importable via
        # convert_checkpoint --core_method bevformer_wrapper)
        camera = dict(args.get("camera", {}))
        camera.setdefault("encoder", "bevformer")
        if camera["encoder"] == "bevformer_ref":
            from .bevformer_ref import RefBEVFormerDetector

            return RefBEVFormerDetector(dict(args, camera=camera))
        return CameraDetector(dict(args, camera=camera))
    if name in ("cvt_seg", "corpbevt_seg", "bev_seg",
                "fax_fused_transformer"):
        # fax_fused_transformer is the reference core_method for the
        # single-vehicle FAX seg models (opencood/models/
        # fax_fused_transformer.py; hypes opcamera/{fax,bevt_static}.yaml)
        if name == "fax_fused_transformer":
            camera = dict(args.get("camera", {}))
            camera.setdefault("encoder", "fax")
            args = dict(args, camera=camera)
        return CameraSegmentor(args)
    if name in ("view_parse_network", "view_parse_network_ms",
                "bev_swap"):
        # camera-only seg families (reference: view_parse_network*.py,
        # bev_swap.py); encoder selected through the camera config
        camera = dict(args.get("camera", {}))
        camera.setdefault(
            "encoder",
            "bev_swap" if name == "bev_swap"
            else ("vpn_ms" if name.endswith("_ms") else "vpn"))
        return CameraSegmentor(dict(args, camera=camera))
    if name in _VPN_FUSIONS:
        camera = dict(args.get("camera", {}))
        camera.setdefault("encoder", "vpn")
        return CooperativeDetector(dict(args, camera=camera), "camera",
                                   _VPN_FUSIONS[name])
    if name in _LIDAR_FUSIONS:
        return CooperativeDetector(args, "lidar", _LIDAR_FUSIONS[name])
    if name in _CAMERA_FUSIONS:
        return CooperativeDetector(args, "camera", _CAMERA_FUSIONS[name])
    if name in ("voxel_net", "second", "pixor"):
        from .lidar_zoo import SecondDetector, VoxelNetDetector
        from .pixor import PIXORDetector

        cls = {"voxel_net": VoxelNetDetector, "second": SecondDetector,
               "pixor": PIXORDetector}[name]
        return _SingleAgentLidar(cls, args.get("lidar", args))
    if name == "voxel_net_intermediate":
        from .lidar_zoo import VoxelNetIntermediate

        return VoxelNetIntermediate(args.get("lidar", args))
    if name == "pixor_intermediate":
        from .pixor import PixorIntermediate

        return PixorIntermediate(args.get("lidar", args))
    if name == "second_intermediate":
        return CooperativeDetector(
            dict(args, lidar_encoder="second"), "lidar", "att")
    raise ValueError(f"unknown model core_method {name!r}")
