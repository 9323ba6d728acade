"""Training loop machinery: TrainState, jitted data-parallel step,
label generation bridge, seeding.

Replaces the reference's DDP trainer core (reference:
opencood/tools/train_camera.py:43-231): gradients are all-reduced by XLA
through the sharded-batch jit instead of NCCL hooks, AMP is bf16-by-
default on TPU, and the per-step scheduler is folded into the optimizer.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .losses import point_pillar_loss


@struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, tx, example_batch, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.key(0)
    variables = model.init(rng, example_batch, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=0, params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params))


def _to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        tree,
    )


def make_train_step(model, tx,
                    loss_fn: Callable = point_pillar_loss,
                    loss_kwargs: dict | None = None,
                    half: bool = False):
    """Returns a jit-able (state, batch, labels, rng) -> (state, metrics).

    Shard the batch/labels on a mesh 'data' axis before calling and XLA
    inserts the cross-device gradient reduction automatically.

    half=True is the TPU analogue of the reference's AMP ``--half``
    (reference: opencood/tools/train_camera.py:143-197): compute in
    bfloat16 against bf16-cast params/inputs, master params and the
    optimizer stay fp32 (bf16's range makes loss scaling unnecessary).
    """
    return _make_train_step(model, tx, loss_fn, loss_kwargs, half,
                            camera_bucket=None)


def _make_train_step(model, tx, loss_fn, loss_kwargs, half,
                     camera_bucket=None):
    loss_kwargs = loss_kwargs or {}
    apply_kwargs = ({} if camera_bucket is None
                    else {"camera_bucket": camera_bucket})

    def step(state: TrainState, batch, labels, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        batch_in = _to_bf16(batch) if half else batch

        def compute(params):
            p = _to_bf16(params) if half else params
            out, updates = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                batch_in, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng}, **apply_kwargs,
            )
            if half:
                out = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32), out)
            total, parts = loss_fn(out, labels, **loss_kwargs)
            return total, (updates["batch_stats"], parts)

        (_, (new_bs, parts)), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        if half:
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32), grads)
        import optax

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt)
        return new_state, parts

    return jax.jit(step, donate_argnums=(0,))


def make_bucketed_train_step(model, tx,
                             loss_fn: Callable = point_pillar_loss,
                             loss_kwargs: dict | None = None,
                             half: bool = False):
    """Count-bucketed training (VERDICT r4 ask #2): specialize the
    compiled step on the batch's actual camera count so the camera
    encoder's forward + backward + remat recompute run on exactly the
    camera rows instead of every slot.  At max_cav=5 the fleet mix
    takes <= 6 (n_cam, n_lidar) values, so the jit cache stays tiny and
    each entry persists in the compile cache.

    Semantics: this is the reference's boolean row split
    (base_camera_lidar_intermediate.py:19-65) + its DDP
    ``find_unused_parameters=True`` answer to conditional execution
    (train_camera.py:126-131) — unused-branch params get zero grads
    (AdamW still applies weight decay, like torch with grad=0), and
    train-mode BatchNorm statistics are computed over the REAL rows of
    each branch, which matches the reference exactly; the run-both
    trace (make_train_step) normalizes camera BN over lidar rows'
    dummy activations as the price of a mix-independent graph.  Grads
    are exact per bucket: the rows each branch drops were select-masked
    to zero gradient in the run-both trace anyway.
    """
    import functools

    import numpy as np

    @functools.lru_cache(maxsize=None)
    def compiled(n_cam: int):
        return _make_train_step(model, tx, loss_fn, loss_kwargs, half,
                                camera_bucket=n_cam)

    def dispatch(state: TrainState, batch, labels, rng):
        mode = np.asarray(batch["mode"])
        active = np.asarray(batch["agent_mask"]) > 0
        n_cam = int(((mode == 0) & active).sum())
        return compiled(n_cam)(state, batch, labels, rng)

    dispatch.cache_info = compiled.cache_info  # for tests/bench
    return dispatch


def make_eval_step(model, loss_fn: Callable = point_pillar_loss,
                   loss_kwargs: dict | None = None):
    loss_kwargs = loss_kwargs or {}

    def step(state: TrainState, batch, labels):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False,
        )
        _, parts = loss_fn(out, labels, **loss_kwargs)
        return parts

    return jax.jit(step)


def make_forward(model):
    def fwd(state: TrainState, batch):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False,
        )

    return jax.jit(fwd)


def labels_for_batch(postprocessor, anchors, batch) -> dict:
    """Host-side label generation for a padded batch (vectorizable later
    into the input pipeline workers).  Dispatches on the postprocessor
    family: anchor grid (VoxelPostprocessor twin) or the anchor-free
    dense label map (BevPostprocessor twin)."""
    b = batch["object_bbx_center"].shape[0]
    if anchors is None:  # anchor-free PIXOR family
        maps = [postprocessor.generate_label(
            gt_box_center=np.asarray(batch["object_bbx_center"][i]),
            mask=np.asarray(batch["object_bbx_mask"][i]))["label_map"]
            for i in range(b)]
        return {"label_map": jnp.asarray(np.stack(maps), jnp.float32)}
    pos, neg, tgt = [], [], []
    for i in range(b):
        lab = postprocessor.generate_label(
            np.asarray(batch["object_bbx_center"][i]), anchors,
            np.asarray(batch["object_bbx_mask"][i]))
        pos.append(lab["pos_equal_one"])
        neg.append(lab["neg_equal_one"])
        tgt.append(lab["targets"])
    return {
        "pos_equal_one": jnp.asarray(np.stack(pos), jnp.float32),
        "neg_equal_one": jnp.asarray(np.stack(neg), jnp.float32),
        "targets": jnp.asarray(np.stack(tgt), jnp.float32),
    }
