"""Training CLI.

Mirrors the reference trainer's surface (reference:
opencood/tools/train_camera.py:17-231): hypes YAML + optional model_dir
resume, per-epoch modality reshuffle, eval/save frequencies, staged
backbone loading/freezing — but one jitted SPMD program over a device
mesh instead of DDP process groups.

Usage:
  python -m hmvit_tpu.tools.train --hypes_yaml <cfg.yaml> [--model_dir d]
      [--synthetic] [--epoches N] [--max_points P] [--steps_per_epoch N]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("hmvit_tpu trainer")
    p.add_argument("--hypes_yaml", required=True)
    p.add_argument("--model_dir", default="")
    p.add_argument("--synthetic", action="store_true",
                   help="generate a mini on-disk OPV2V instead of reading "
                        "root_dir (for smoke runs without the dataset)")
    p.add_argument("--epoches", type=int, default=0)
    p.add_argument("--steps_per_epoch", type=int, default=0)
    p.add_argument("--max_points", type=int, default=60000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=0,
                   help="override train_params.batch_size (must be a "
                        "multiple of the data-parallel degree)")
    p.add_argument("--mp", type=int, default=1,
                   help="tensor-parallel degree: devices form a "
                        "(data, model) mesh and the H3GAT fusion trunk "
                        "is Megatron-sharded over 'model' "
                        "(parallel/mesh.py shard_state_tp)")
    p.add_argument("--num_workers", type=int, default=4,
                   help="parallel per-frame decode threads (the "
                        "DataLoader-worker analogue; PNG/pcd decode is "
                        "numpy/PIL-bound and releases the GIL)")
    p.add_argument("--bucketed", action="store_true",
                   help="count-bucketed train step: one compiled "
                        "program per fleet camera count, so each "
                        "encoder runs (fwd+bwd+remat) on its real rows "
                        "only — the reference's row-split + "
                        "find_unused_parameters semantics (<= max_cav+1 "
                        "compiles; see train/trainer.py)")
    p.add_argument("--half", action="store_true",
                   help="bf16 compute (fp32 master params)")
    p.add_argument("--remat", action="store_true",
                   help="gradient checkpointing: recompute the camera/"
                        "lidar/fusion stages in the backward pass "
                        "(jax.checkpoint) to fit production-scale "
                        "training steps in one chip's HBM; numerically "
                        "transparent (tests/test_remat.py)")
    p.add_argument("--camera_backbone_dir", default="")
    p.add_argument("--lidar_backbone_dir", default="")
    p.add_argument("--fix_camera_backbone", action="store_true")
    p.add_argument("--fix_lidar_backbone", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import load_config, save_config
    from ..data.opv2v import HeteroCooperativeDataset
    from ..models.zoo import build_model
    from ..parallel import (make_hybrid_mesh, make_mesh,
                            replicate_state, shard_batch,
                            shard_state_tp)
    from ..postprocess import build_postprocessor
    from ..train.checkpointing import (
        find_last_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from ..train.schedulers import build_optimizer
    from ..train.trainer import (
        create_train_state,
        labels_for_batch,
        make_eval_step,
        make_train_step,
    )

    params = load_config(args.hypes_yaml,
                         model_dir=args.model_dir or None)
    if args.epoches:
        params["train_params"]["epoches"] = args.epoches
        params["lr_scheduler"]["epoches"] = args.epoches

    if args.synthetic:
        import tempfile

        from ..data.fixture import write_mini_opv2v

        root = tempfile.mkdtemp(prefix="mini_opv2v_")
        cam_args = (params["preprocess"]["args"]["camera_preprocess"]
                    ["args"])
        write_mini_opv2v(root, num_scenarios=2, num_cavs=2, num_frames=4,
                         image_size=cam_args["resize_x"],
                         max_points=min(args.max_points, 8192))
        params["root_dir"] = params["validate_dir"] = root

    run_dir = args.model_dir or os.path.join(
        "runs", f"{params['name']}_{time.strftime('%Y%m%d_%H%M%S')}")
    os.makedirs(run_dir, exist_ok=True)
    save_config(params, os.path.join(run_dir, "config.yaml"))

    dataset = HeteroCooperativeDataset(params, train=True,
                                       max_points=args.max_points)
    val_dataset = HeteroCooperativeDataset(params, train=False,
                                           max_points=args.max_points)
    pp = build_postprocessor(params["postprocess"], train=True)
    anchors = pp.generate_anchor_box()

    if args.remat:
        # threaded through to HMViT's cfg (models/hmvit.py); zoo models
        # that don't read it simply ignore the key
        params["model"].setdefault("args", {})["remat"] = True
    model = build_model(params["model"])
    batch_size = (args.batch_size
                  or params["train_params"]["batch_size"])
    steps_per_epoch = args.steps_per_epoch or max(
        len(dataset) // batch_size, 1)

    frozen = ()
    if args.fix_camera_backbone:
        frozen += ("camera_encoder",)
    if args.fix_lidar_backbone:
        frozen += ("lidar_encoder",)
    tx, schedule = build_optimizer(params["optimizer"],
                                   params["lr_scheduler"],
                                   steps_per_epoch, frozen)

    example = dataset.collate_batch([dataset[0]])
    example = {k: jnp.asarray(v) for k, v in example.items()
               if k != "object_ids"}
    state = create_train_state(model, tx, example,
                               rng=jax.random.key(args.seed))

    # staged training: graft pretrained single-modality encoders
    for key, donor_dir in (("camera_encoder", args.camera_backbone_dir),
                           ("lidar_encoder", args.lidar_backbone_dir)):
        if donor_dir:
            abstract = {"params": jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                state.params)}
            donor = restore_checkpoint(os.path.join(donor_dir, "ckpt"),
                                       abstract)
            if donor and key in donor["params"]:
                new_params = dict(state.params)
                new_params[key] = donor["params"][key]
                state = state.replace(params=new_params)
                print(f"grafted {key} from {donor_dir}")

    ckpt_dir = os.path.join(os.path.abspath(run_dir), "ckpt")
    last = find_last_step(ckpt_dir)
    start_epoch = 0
    if last is not None:
        abstract = {
            "params": jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                state.params),
            "batch_stats": jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                state.batch_stats),
        }
        restored = restore_checkpoint(ckpt_dir, abstract, last)
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
        start_epoch = last
        print(f"resumed from epoch {last}")

    from ..train.losses import build_loss

    seg_task = params.get("loss", {}).get("core_method", "") in (
        "vanilla_seg_loss", "seg_loss")
    if seg_task:
        from ..models.seg_head import seg_loss as _seg_loss

        def loss_fn(output, labels, **kw):
            return _seg_loss(output, labels, **kw)

        largs = params["loss"].get("args", {})
        loss_kwargs = {
            "d_weights": float(largs.get("d_weights", 75.0)),
            "s_weights": float(largs.get("s_weights", 15.0)),
        }
    else:
        loss_fn, loss_kwargs = build_loss(params.get("loss", {}))
    mp = max(1, int(getattr(args, "mp", 1)))
    if mp > 1:
        mesh = make_hybrid_mesh(mp=mp)
        state = shard_state_tp(state, mesh)
    else:
        mesh = make_mesh()
        state = replicate_state(state, mesh)
    dp = mesh.shape["data"]
    if batch_size % dp:
        raise SystemExit(
            f"batch_size {batch_size} must be a multiple of the "
            f"data-parallel degree {dp} (devices {jax.device_count()}"
            f" / mp {mp}); pass --batch_size or adjust "
            "train_params.batch_size")
    if args.bucketed:
        from ..train.trainer import make_bucketed_train_step

        if mesh.shape["data"] > 1 or mp > 1:
            raise SystemExit("--bucketed is a single-chip step "
                             "specialization; drop it under dp/mp "
                             "sharding")
        train_step = make_bucketed_train_step(
            model, tx, loss_fn=loss_fn, loss_kwargs=loss_kwargs,
            half=args.half)
    else:
        train_step = make_train_step(model, tx, loss_fn=loss_fn,
                                     loss_kwargs=loss_kwargs,
                                     half=args.half)
    eval_step = make_eval_step(model, loss_fn=loss_fn,
                               loss_kwargs=loss_kwargs)
    rng = jax.random.key(args.seed + 1)

    metrics_path = os.path.join(run_dir, "metrics.jsonl")
    try:  # TensorBoard scalars, matching the reference's logging surface
        from tensorboardX import SummaryWriter

        tb = SummaryWriter(os.path.join(run_dir, "tb"))
    except ImportError:
        tb = None
    epoches = params["train_params"]["epoches"]
    eval_freq = params["train_params"].get("eval_freq", 2)
    save_freq = params["train_params"].get("save_freq", 1)

    seg_grid = None
    if seg_task:
        out0 = model.apply(
            {"params": state.params,
             "batch_stats": state.batch_stats},
            example, train=False)
        key0 = "dynamic_seg" if "dynamic_seg" in out0 else "static_seg"
        hd = out0[key0].shape[1:3]
        seg_grid = (int(hd[0]), int(hd[1]))

    def make_labels(batch):
        if seg_task:
            per_frame = [
                dataset.seg_labels(
                    {k: batch[k][i]
                     for k in ("object_bbx_center", "object_bbx_mask",
                               "gt_dynamic", "gt_static", "has_map_gt")
                     if k in batch},
                    seg_grid)
                for i in range(batch["object_bbx_center"].shape[0])
            ]
            return {k: jnp.asarray(np.stack([f[k] for f in per_frame]),
                                   jnp.int32)
                    for k in per_frame[0]}
        return labels_for_batch(pp, anchors, batch)

    def make_batch(idxs):
        if frame_pool is not None:
            frames = list(frame_pool.map(
                lambda i: dataset[int(i)], idxs))
        else:
            frames = [dataset[int(i)] for i in idxs]
        while len(frames) < batch_size:
            frames.append(frames[-1])
        batch = dataset.collate_batch(frames)
        labels = make_labels(batch)
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k != "object_ids"}
        return shard_batch(batch, mesh), shard_batch(labels, mesh)

    from concurrent.futures import ThreadPoolExecutor

    # two-level input pipeline (reference analogue: torch DataLoader
    # with num_workers + pin_memory): one batch-ahead prefetch thread
    # overlapping host IO with the device step, and a frame pool
    # decoding the batch's frames in parallel inside it
    prefetcher = ThreadPoolExecutor(max_workers=1)
    frame_pool = (ThreadPoolExecutor(max_workers=args.num_workers)
                  if getattr(args, "num_workers", 0) > 1 else None)

    order = np.arange(len(dataset))
    host_rng = np.random.default_rng(args.seed)
    with open(metrics_path, "a") as mf:
        for epoch in range(start_epoch, epoches):
            host_rng.shuffle(order)
            t_ep = time.time()

            def idxs_for(step):
                return order[(step * batch_size) % len(order):][:batch_size]

            pending = prefetcher.submit(make_batch, idxs_for(0))
            for step in range(steps_per_epoch):
                batch, labels = pending.result()
                if step + 1 < steps_per_epoch:  # overlap host IO+labels
                    pending = prefetcher.submit(make_batch,
                                                idxs_for(step + 1))
                state, metrics = train_step(state, batch, labels, rng)
                if step % 10 == 0:
                    rec = {"epoch": epoch, "step": step,
                           "lr": float(schedule(int(state.step))),
                           **{k: float(v) for k, v in metrics.items()}}
                    mf.write(json.dumps(rec) + "\n")
                    mf.flush()
                    if tb is not None:
                        gs = epoch * steps_per_epoch + step
                        for key, val in rec.items():
                            if key not in ("epoch", "step"):
                                tb.add_scalar(key, val, gs)
                    extras = " ".join(
                        f"{k}={v:.4f}" for k, v in rec.items()
                        if k not in ("epoch", "step", "lr", "total_loss"))
                    print(f"[epoch {epoch}][{step}/{steps_per_epoch}] "
                          f"loss={rec['total_loss']:.4f} {extras}")

            if epoch % eval_freq == 0:
                val_losses = []
                for vi in range(min(len(val_dataset), 4)):
                    frames = [val_dataset[vi]] * batch_size
                    vb = val_dataset.collate_batch(frames)
                    vl = make_labels(vb)
                    vb = {k: jnp.asarray(v) for k, v in vb.items()
                          if k != "object_ids"}
                    m = eval_step(state, shard_batch(vb, mesh),
                                  shard_batch(vl, mesh))
                    val_losses.append(float(m["total_loss"]))
                print(f"[epoch {epoch}] val_loss="
                      f"{np.mean(val_losses):.4f} "
                      f"({time.time() - t_ep:.1f}s/epoch)")

            if epoch % save_freq == 0:
                host_state = jax.device_get(
                    {"params": state.params,
                     "batch_stats": state.batch_stats})
                save_checkpoint(ckpt_dir, epoch + 1, host_state)

            dataset.reinitialize()
    print(f"training done -> {run_dir}")
    return run_dir


if __name__ == "__main__":
    main()
