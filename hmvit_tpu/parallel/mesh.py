"""Device-mesh utilities: the TPU-native replacement for the reference's
NCCL process groups (reference: opencood/tools/multi_gpu_utils.py:16-39).

One jitted program under a Mesh; the batch is sharded on the ``data``
axis, parameters are replicated, and XLA inserts the gradient all-reduce.
No process groups, no ``find_unused_parameters`` (the model graph is
static for every modality mix), no explicit barriers.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=("data",), shape=None) -> Mesh:
    """1-D data mesh by default; pass shape=(dp, mp) for hybrid layouts."""
    devices = devices if devices is not None else jax.devices()
    arr = np.array(devices)
    if shape is not None:
        arr = arr.reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch pytree with the leading axis split over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )


def replicate_state(state, mesh: Mesh):
    """Replicate params/opt state across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state)


def make_hybrid_mesh(devices=None, mp: int = 1,
                     axis_names=("data", "model")) -> Mesh:
    """(dp, mp) hybrid mesh: batch over ``data``, tensor-parallel fusion
    trunk over ``model``.  dp is inferred as n_devices // mp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % mp == 0, f"{n} devices not divisible by mp={mp}"
    return Mesh(np.array(devices).reshape(n // mp, mp), axis_names)


# Megatron-style tensor-parallel layout for the H3GAT fusion trunk
# (scaling-book "pick a mesh, annotate shardings, let XLA insert the
# collectives"): Q/K/V projections and FFN-up are COLUMN-parallel
# (output channels over 'model' — each device computes its own heads),
# to_out and FFN-down are ROW-parallel (input channels over 'model' —
# XLA inserts ONE psum per attention/FFN block on the ICI).  Matched by
# path suffix, so the same rule set shards params AND the optimizer's
# mu/nu moments (their subtrees repeat the param paths).
_TP_COL = ("to_q", "to_k", "to_v")
_TP_ROW = ("to_out",)
_TP_FFN = ("window_ffn", "grid_ffn", "mlp_head")


def tp_spec_for_path(path: str, shape, mp: int):
    """PartitionSpec for one leaf under the fusion-trunk TP layout.

    ``path`` is ``jax.tree_util.keystr`` of the leaf (params or optimizer
    moment); anything not matched — encoders, norms, decoder, biases of
    row-parallel layers — stays replicated."""
    if "norm" in path or len(shape) < 2:
        return P()
    last_ok = shape[-1] % mp == 0
    mid_ok = len(shape) >= 2 and shape[-2] % mp == 0
    col = any(f"'{k}'" in path for k in _TP_COL)
    row = any(f"'{k}'" in path for k in _TP_ROW)
    if any(k in path for k in _TP_FFN):
        # HeteroDense_0 = up (column), HeteroDense_1 = down (row)
        col = col or "HeteroDense_0" in path
        row = row or "HeteroDense_1" in path
    if col and last_ok:
        # kernel (T, din, dout) / bias (T, dout): split the outputs
        return P(*(None,) * (len(shape) - 1), "model")
    if row and len(shape) >= 3 and mid_ok:
        # kernel (T, din, dout): split the inputs; bias stays replicated
        return P(*(None,) * (len(shape) - 2), "model", None)
    return P()


def tp_shard_tree(tree, mesh: Mesh):
    """device_put every leaf of ``tree`` with its TP spec (replicated
    when no rule matches).  Works on params, batch_stats, and optimizer
    state alike — specs are derived from each leaf's own path."""
    mp = mesh.shape["model"]

    def put(path, x):
        if not hasattr(x, "shape"):
            return x
        spec = tp_spec_for_path(jax.tree_util.keystr(path), x.shape, mp)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)


def shard_state_tp(state, mesh: Mesh):
    """Hybrid DP x TP placement of a TrainState: fusion-trunk weights
    (and their adam moments) split over 'model', everything else
    replicated.  The train step itself is unchanged — GSPMD propagates
    the layout through attention/FFN and inserts the psums."""
    return type(state)(
        step=state.step,
        params=tp_shard_tree(state.params, mesh),
        batch_stats=tp_shard_tree(state.batch_stats, mesh),
        opt_state=tp_shard_tree(state.opt_state, mesh),
    )


def audit_tp_sharding(params, mp: int):
    """Guard against silent fallback-to-replication (renamed modules no
    longer matching the path-suffix TP rules).

    INTENT is derived from the tree structure, independently of the
    rule name lists: every rank-3 HeteroDense kernel under the fusion
    trunk (the stacked (T, din, dout) typed projections/FFNs) with an
    mp-divisible din or dout is supposed to be tensor-parallel.
    Returns (sharded_paths, silent_misses); callers assert no misses.
    """
    hit, miss = [], []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        pstr = jax.tree_util.keystr(path)
        if "'fusion'" not in pstr or "'kernel'" not in pstr:
            continue
        shape = getattr(leaf, "shape", ())
        if len(shape) != 3:  # relation matrices, norms, biases
            continue
        if shape[-1] % mp and shape[-2] % mp:
            continue  # indivisible: replication is the correct outcome
        spec = getattr(getattr(leaf, "sharding", None), "spec", ())
        if "model" in str(spec):
            hit.append(pstr)
        else:
            miss.append(pstr)
    return hit, miss


def make_spatial_eval(model, mesh: Mesh, axis: str = "model"):
    """Spatially-partitioned batched inference (SP): per-agent BEV maps
    sharded on their H axis over ``axis``, batch over 'data'.

    A sharding CONSTRAINT is injected where the encoder outputs meet the
    fusion trunk (models/hmvit.py ``shard_hint``) and GSPMD propagates
    the layout through window attention / warp / decoder, inserting the
    halo collectives on ICI — single-frame latency and BEV grids beyond
    one chip's HBM scale with the mesh.  Inputs/outputs stay batch-
    sharded; only internals are spatially split.  The Pallas fusion
    kernels run inside an explicit shard_map island (hetero_fusion
    ``use_sp_island``): local destination-row warps over the
    all-gathered sender K/V + per-shard stripe attention — numerically
    identical to the unsharded kernels
    (tests/test_trainer_sharding.py::test_spatial_eval_pallas_island).
    Map geometries the island does not support (h % (32 * shards) != 0)
    fall back to the XLA oracle path under GSPMD automatically."""
    hint_sh = NamedSharding(mesh, P(None, None, axis))

    def hint(x):
        # (B, L, H, W, C): pin H; B follows the batch 'data' sharding
        sh = NamedSharding(
            mesh, P("data", None, axis, *(None,) * (x.ndim - 3)))
        try:
            return jax.lax.with_sharding_constraint(x, sh)
        except ValueError:
            return jax.lax.with_sharding_constraint(x, hint_sh)

    return jax.jit(
        lambda variables, batch: model.apply(
            variables, batch, train=False, shard_hint=hint,
            sp=(mesh, axis)),
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )


def make_sharded_eval(model, mesh: Mesh, variables_sharding=None):
    """Data-parallel batched inference: variables replicated (or, for a
    hybrid DP x TP state, kept in their existing tensor-parallel layout
    via ``variables_sharding``), batch sharded on 'data', outputs
    sharded the same way.  The TPU-native replacement for a per-rank
    eval loop — one jitted program, frames split across chips, decode/AP
    stay on the host (reference eval loop:
    opencood/tools/inference_camera.py:145-185 runs frames serially on
    one GPU)."""
    if variables_sharding is None:
        variables_sharding = replicated(mesh)
    return jax.jit(
        lambda variables, batch: model.apply(variables, batch,
                                             train=False),
        in_shardings=(variables_sharding, batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )
