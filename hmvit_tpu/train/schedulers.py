"""Learning-rate schedules mirroring the reference trainer's options
(reference: opencood/tools/train_utils.py:210-268): step, multistep,
exponential, and cosine-anneal-with-warmup (timm CosineLRScheduler
semantics: linear warmup from ``warmup_lr`` then cosine to ``lr_min``),
all expressed as optax per-step schedules."""
from __future__ import annotations

import optax


def build_schedule(cfg: dict, base_lr: float, steps_per_epoch: int):
    # reference configs spell this with a capital (e.g. 'Exponential' in
    # opv2v/pixor_early_fusion.yaml); match case-insensitively like the
    # reference's reflection loader
    method = str(cfg.get("core_method", "constant")).lower()
    if method == "step":
        return optax.exponential_decay(
            base_lr,
            transition_steps=cfg["step_size"] * steps_per_epoch,
            decay_rate=cfg.get("gamma", 0.1),
            staircase=True,
        )
    if method == "multistep":
        boundaries = {
            int(e) * steps_per_epoch: cfg.get("gamma", 0.1)
            for e in cfg["step_size"]
        }
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if method == "exponential":
        return optax.exponential_decay(
            base_lr, transition_steps=steps_per_epoch,
            decay_rate=cfg.get("gamma", 0.98),
        )
    if method == "cosineannealwarm":
        warmup_steps = int(cfg.get("warmup_epoches", 0)) * steps_per_epoch
        total_steps = int(cfg["epoches"]) * steps_per_epoch
        return optax.warmup_cosine_decay_schedule(
            init_value=float(cfg.get("warmup_lr", base_lr)),
            peak_value=base_lr,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=float(cfg.get("lr_min", 0.0)),
        )
    if method == "constant":
        return optax.constant_schedule(base_lr)
    raise ValueError(f"unknown lr scheduler {method!r}")


def build_optimizer(opt_cfg: dict, sched_cfg: dict, steps_per_epoch: int,
                    frozen_prefixes: tuple = ()):
    """AdamW/Adam/SGD by name + schedule + optional subtree freezing
    (staged training: load a backbone then freeze it, reference:
    opencood/tools/train_camera.py:109-120)."""
    base_lr = float(opt_cfg["lr"])
    schedule = build_schedule(sched_cfg, base_lr, steps_per_epoch)
    name = opt_cfg.get("core_method", "AdamW").lower()
    args = opt_cfg.get("args", {})
    if name == "adamw":
        tx = optax.adamw(schedule, eps=float(args.get("eps", 1e-8)),
                         weight_decay=float(args.get("weight_decay", 1e-2)))
    elif name == "adam":
        tx = optax.adam(schedule, eps=float(args.get("eps", 1e-8)))
    elif name == "sgd":
        tx = optax.sgd(schedule, momentum=float(args.get("momentum", 0.9)))
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    if frozen_prefixes:
        def label(params):
            import jax

            def path_label(path, _):
                top = path[0].key if path else ""
                return "frozen" if top in frozen_prefixes else "train"

            return jax.tree_util.tree_map_with_path(path_label, params)

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label
        )
    return tx, schedule
