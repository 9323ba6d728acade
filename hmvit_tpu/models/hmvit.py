"""HM-ViT flagship model: hetero-modal multi-agent cooperative detector.

Assembly (reference: opencood/models/bevformer_point_pillar_hetero.py:
52-133 and base_camera_lidar_intermediate.py:4-102), restructured for
static shapes: instead of boolean-masked row splits and Python
re-interleaving, BOTH encoders run on every agent slot and the per-agent
BEV is selected by modality with ``jnp.where`` — the trace is identical
for every camera/lidar mix, so one compiled program serves the whole
(camera_to_lidar_ratio, ego_mode) sweep.

mode convention: 0 = camera, 1 = lidar.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .cvt import CrossViewTransformer
from .hetero_fusion import HeteroFusion
from .layers import DetectionHead, NaiveCompressor, NaiveDecoder
from .pillar_encoder import PointPillarEncoder


def make_camera_encoder(cfg: dict, name: str = "camera_encoder"):
    """Camera->BEV encoder by config key ``encoder``: cvt (default), fax,
    or bevformer."""
    kind = cfg.get("encoder", "cvt")
    if kind == "cvt":
        return CrossViewTransformer(cfg, name=name)
    if kind == "fax":
        from .fax import FAXCameraEncoder

        return FAXCameraEncoder(cfg, name=name)
    if kind == "fax_ref":
        # reference-faithful FAX stack (structural twin; checkpoint-
        # portable) — the redesigned 'fax' stays the serving default
        from .fax_ref import FAXRefCameraEncoder

        return FAXRefCameraEncoder(cfg, name=name)
    if kind == "cvt_ref":
        from .cvt_ref import CVTRefCameraEncoder

        return CVTRefCameraEncoder(cfg, name=name)
    if kind == "bevformer":
        from .bevformer import BEVFormerEncoder

        return BEVFormerEncoder(cfg, name=name)
    if kind == "bevformer_ref":
        # reference-faithful mmdet3d-BEVFormer only_bev twin — the
        # checkpoint-import target for the flagship's camera trunk
        # (tools/convert_checkpoint.py bevformer_point_pillar_hetero)
        from .bevformer_ref import RefBEVFormerCameraEncoder

        return RefBEVFormerCameraEncoder(cfg, name=name)
    if kind in ("vpn", "vpn_ms"):
        from .vpn import ViewParseNetwork

        return ViewParseNetwork(cfg, name=name)
    if kind == "bev_swap":
        from .bev_swap import BEVSwapEncoder

        return BEVSwapEncoder(cfg, name=name)
    raise ValueError(f"unknown camera encoder {kind!r}")


class HeteroDecoder(nn.Module):
    """Per-modality decoder + heads, selected by the ego's modality
    (reference: opencood/models/sub_modules/hetero_decoder.py:7-95)."""
    num_layer: int
    num_ch_dec: tuple
    anchor_number: int
    use_upsample: bool = False
    bn_eps: float = 1e-3  # reference NaiveDecoder uses torch's 1e-5

    @nn.compact
    def __call__(self, x, ego_mode, train: bool = False,
                 static_ego_modality: int | None = None):
        # x: (B, H, W, C); ego_mode: (B,) int.  static_ego_modality is a
        # serving hint: when the whole batch's ego modality is known at
        # trace time (one compiled program per ego_mode bucket), only
        # that branch's decoder+head runs — the reference dispatches the
        # same way dynamically (hetero_decoder.py:44-77).
        def cam_branch():
            cam = NaiveDecoder(self.num_layer, self.num_ch_dec,
                               use_upsample=self.use_upsample,
                               bn_eps=self.bn_eps,
                               name="camera_decoder")(x, train)
            return DetectionHead(self.anchor_number,
                                 name="camera_head")(cam)

        def lid_branch():
            lid = NaiveDecoder(self.num_layer, self.num_ch_dec,
                               use_upsample=self.use_upsample,
                               bn_eps=self.bn_eps,
                               name="lidar_decoder")(x, train)
            return DetectionHead(self.anchor_number,
                                 name="lidar_head")(lid)

        if static_ego_modality == 0 and not train:
            return cam_branch()
        if static_ego_modality == 1 and not train:
            return lid_branch()
        cam_psm, cam_rm = cam_branch()
        lid_psm, lid_rm = lid_branch()
        is_lidar = (ego_mode == 1)[:, None, None, None]
        psm = jnp.where(is_lidar, lid_psm, cam_psm)
        rm = jnp.where(is_lidar, lid_rm, cam_rm)
        return psm, rm


class HMViT(nn.Module):
    """Hetero-modal cooperative detector (camera branch selectable)."""
    config: dict

    @nn.compact
    def __call__(self, batch: dict, train: bool = False,
                 camera_bucket: int | None = None,
                 active_agents: int | None = None,
                 static_ego_modality: int | None = None,
                 static_modes: tuple | None = None,
                 shard_hint=None, sp=None):
        """camera_bucket / active_agents are SERVING shape buckets:

        - ``active_agents`` statically slices the agent axis to the
          first A slots (trailing slots must be padding, which the data
          layer guarantees — RSUs/pads go last).
        - ``camera_bucket`` runs the camera encoder on exactly that many
          slots: agent rows are gathered camera-first (stable argsort on
          mode), encoded compactly, and scattered back.  Equivalent to
          the reference's boolean row-split (base_camera_lidar_
          intermediate.py:19-65) with a static bucket size; numerically
          identical to the run-both default ONLY when the bucket equals
          the batch's true camera count (or is 0 / >= the fleet size,
          the degenerate all-lidar / all-camera programs).  With
          ``bucket > true count`` the first ``bucket`` slots of the
          mode-sorted order include lidar agents, which would silently
          receive camera-encoded features — do NOT round buckets up.
          The dispatcher in ``tools/inference.py`` always passes the
          exact per-frame count, and ``config: debug_checks: true``
          installs a runtime guard that raises on a rounded-up bucket
          (host callback — leave it off in production serving).
          None (training default) runs both
          encoders on every slot for a mix-independent trace.
        - ``static_modes``: the fleet's per-agent modality layout
          (AFTER ``active_agents`` slicing), known at trace time; lets
          every hetero projection hit only its own type's kernel (half
          the FLOPs, identical numerics — see HeteroDense).  Must equal
          the batch's true ``mode`` row or outputs are silently wrong;
          serving callers derive it from the same frame metadata as
          ``camera_bucket``.
        """
        cfg = self.config
        if active_agents is not None:
            sl = {"mode", "agent_mask", "points", "points_mask", "camera",
                  "intrinsics", "extrinsics", "prior_encoding"}
            batch = {k: (v[:, :active_agents] if k in sl else v)
                     for k, v in batch.items()}
            batch["pairwise_t_matrix"] = \
                batch["pairwise_t_matrix"][:, :active_agents,
                                           :active_agents]
        mode = batch["mode"].astype(jnp.int32)  # (B, L)
        agent_mask = batch["agent_mask"].astype(jnp.float32)  # (B, L)
        pairwise = batch["pairwise_t_matrix"]  # (B, L, L, 4, 4)
        b, l = mode.shape

        lidar_enc = PointPillarEncoder(cfg["lidar"], name="lidar_encoder")
        camera_enc = make_camera_encoder(cfg["camera"])

        # Gradient checkpointing (cfg remat: true): under train, the
        # three activation-heavy stages (camera trunk, pillar path,
        # fusion) recompute their internals in the backward pass instead
        # of storing them — jax.checkpoint is the TPU-native way to fit
        # production-scale training steps in one chip's HBM (the
        # reference leans on CUDA AMP + multi-GPU instead).  Serving and
        # eval traces are untouched.  Closures keep `train` and
        # `static_modes` out of the traced arguments (they are
        # trace-time constants).
        # remat: true -> all three stages; a list (e.g. ["fusion"] or
        # ["camera", "fusion"]) checkpoints only those stages — the
        # PERF.md round-4 ablation measures which recomputes actually
        # pay for their HBM savings.
        remat_cfg = cfg.get("remat")
        if remat_cfg is True:
            remat_stages = {"camera", "lidar", "fusion"}
        elif remat_cfg:
            remat_stages = set(remat_cfg)
        else:
            remat_stages = set()
        if not train:
            remat_stages = set()
        remat = "fusion" in remat_stages

        if "lidar" in remat_stages:
            def run_lidar(pts, pm):
                return nn.remat(
                    lambda m, a, b_: m(a, b_, True))(lidar_enc, pts, pm)
        else:
            def run_lidar(pts, pm):
                return lidar_enc(pts, pm, train)

        if "camera" in remat_stages:
            def run_camera(c_, i_, e_):
                return nn.remat(
                    lambda m, a, b_, d: m(a, b_, d, True))(
                        camera_enc, c_, i_, e_)
        else:
            def run_camera(c_, i_, e_):
                return camera_enc(c_, i_, e_, train)
        points = batch["points"].reshape(b * l, *batch["points"].shape[2:])
        pmask = batch["points_mask"].reshape(b * l, -1)
        cams = batch["camera"].reshape(b * l, *batch["camera"].shape[2:])
        intr = batch["intrinsics"].reshape(
            b * l, *batch["intrinsics"].shape[2:])
        extr = batch["extrinsics"].reshape(
            b * l, *batch["extrinsics"].shape[2:])

        if camera_bucket is None:
            # --- both encoders on every slot (static single-program
            # graph; empty point sets for camera agents are one
            # all-masked pillar pass)
            lidar_bev = run_lidar(points, pmask)
            cam_bev = run_camera(cams, intr, extr)
            is_lidar = (mode.reshape(-1) == 1)[:, None, None, None]
            x = jnp.where(is_lidar, lidar_bev, cam_bev)
        elif camera_bucket == 0:
            # all-lidar fleet: the camera encoder never runs
            x = run_lidar(points, pmask)
        elif camera_bucket >= l:
            # all-camera fleet: the lidar encoder never runs
            x = run_camera(cams, intr, extr)
        else:
            # --- serving bucket: cameras gathered first, encoded
            # compactly, scattered back; remaining slots take the lidar
            # path (padding slots carry empty point sets)
            nc = camera_bucket
            order = jnp.argsort(mode.reshape(-1), stable=True)
            cam_idx = order[:nc]
            if cfg.get("debug_checks", False):
                # runtime guard against the bucket > true-camera-count
                # corruption mode documented above: every mode-sorted
                # slot inside the bucket must actually be a camera
                # agent (mode 0).  Host callback, so gate it off in
                # production serving (it adds a device->host sync).
                def _check_bucket(cam_modes, nc=nc):
                    import numpy as _np

                    if _np.any(_np.asarray(cam_modes) != 0):
                        raise ValueError(
                            f"camera_bucket={nc} exceeds the batch's "
                            "true camera count: the first "
                            f"{nc} mode-sorted slots include lidar "
                            "agents, which would silently receive "
                            "camera-encoded features")

                jax.debug.callback(_check_bucket, mode.reshape(-1)[cam_idx])
            lid_idx = order[nc:]
            cam_bev = run_camera(cams[cam_idx], intr[cam_idx],
                                 extr[cam_idx])
            lidar_bev = run_lidar(points[lid_idx], pmask[lid_idx])
            hwc = cam_bev.shape[1:]
            # result_type matches the run-both path's jnp.where dtype
            # promotion when the two encoders' compute dtypes differ
            x = jnp.zeros((b * l, *hwc),
                          jnp.result_type(cam_bev.dtype, lidar_bev.dtype))
            x = x.at[cam_idx].set(cam_bev).at[lid_idx].set(lidar_bev)

        if cfg.get("compression", 0):
            x = NaiveCompressor(x.shape[-1], cfg["compression"])(x, train)

        h, w, c = x.shape[1:]
        x = x.reshape(b, l, h, w, c)
        if shard_hint is not None:
            # spatial partitioning: the caller pins the per-agent BEV
            # maps' H axis to a mesh axis (parallel/mesh.py
            # make_spatial_eval) and GSPMD propagates the layout through
            # fusion + decoder — single-frame latency and BEV grids
            # beyond one chip's HBM scale across chips.  The Pallas
            # warp/attention kernels are not GSPMD-partitionable, so
            # under SP the fusion block runs them inside an explicit
            # shard_map island (hetero_fusion.py `use_sp_island`);
            # non-conforming geometries fall back to the XLA path.
            x = shard_hint(x)
        x = x * agent_mask[:, :, None, None, None]

        if cfg.get("fusion_override"):
            from .fusion import make_fusion

            name = cfg["fusion_override"]
            fusion = make_fusion(name, c, cfg.get("spatial_transform", {}))
            kwargs = {}
            if name in ("v2xvit", "v2xt") and "prior_encoding" in batch:
                # (velocity, time delay, infra) context — V2X-ViT only,
                # matching the reference's consumption pattern
                kwargs["prior_encoding"] = batch["prior_encoding"]
            ego = fusion(x, mode, pairwise, agent_mask, **kwargs)
        else:
            fusion = HeteroFusion(cfg["hetero_fusion"], name="fusion")
            if remat:
                ego = nn.remat(
                    lambda m, *a: m(*a, deterministic=not train,
                                    static_modes=static_modes))(
                    fusion, x, mode, pairwise, agent_mask)
            else:
                ego = fusion(
                    x, mode, pairwise, agent_mask,
                    deterministic=not train, static_modes=static_modes,
                    sp=sp,
                )  # (B, H, W, C)

        dec = cfg["hetero_decoder"]
        if dec.get("compute_dtype"):
            # serving mixed precision: decoder convs at the serving
            # dtype (heads' outputs are logits/deltas, converted by the
            # host-side postprocess either way)
            ego = ego.astype(jnp.dtype(dec["compute_dtype"]))
        psm, rm = HeteroDecoder(
            num_layer=dec["num_layer"],
            num_ch_dec=tuple(dec["num_ch_dec"]),
            anchor_number=dec["anchor_number"],
            bn_eps=dec.get("bn_eps", 1e-3),
        )(ego, mode[:, 0], train, static_ego_modality)

        return {"psm": psm.transpose(0, 3, 1, 2),
                "rm": rm.transpose(0, 3, 1, 2)}
