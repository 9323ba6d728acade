"""Stage-level TPU timing harness for the HM-ViT hot path.

Times individual production-scale stages (warp, window attention, fold,
lidar encoder, full phase) inside single jits with host-transfer syncs
(through the axon tunnel, block_until_ready returns early — a scalar
host read is the only reliable fence).  Used to drive kernel work;
bench.py remains the official end-to-end number.

Usage: python perf_lab.py [stage ...]   (default: all)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "")

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

B, L, H, W, C = 1, 5, 128, 128, 256
HEADS, D, WIN = 8, 32, 8


def timeit(fn, *args, iters=20, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def rand_pairwise(key, b=B, l=L):
    """Random rigid pairwise transforms (B, L, L, 4, 4)."""
    ks = jax.random.split(key, 2)
    ang = jax.random.uniform(ks[0], (b, l), minval=-np.pi, maxval=np.pi)
    pos = jax.random.uniform(ks[1], (b, l, 2), minval=-20.0, maxval=20.0)
    c, s = jnp.cos(ang), jnp.sin(ang)
    m = jnp.zeros((b, l, 4, 4)).at[:, :, 2, 2].set(1.0).at[:, :, 3, 3].set(1.0)
    m = m.at[:, :, 0, 0].set(c).at[:, :, 0, 1].set(-s)
    m = m.at[:, :, 1, 0].set(s).at[:, :, 1, 1].set(c)
    m = m.at[:, :, :2, 3].set(pos)
    # pairwise[b, j, i] = inv(M_i) @ M_j  (j -> i)
    minv = jnp.linalg.inv(m)
    return jnp.einsum("bixy,bjyz->bjixz", minv, m)


def stage_warp(dtype=jnp.float32):
    """MXU separable warp of the (B*L, L, H, W, 2C) pair tensor."""
    from hmvit_tpu.ops.shear_warp import warp_bev_mxu

    key = jax.random.key(0)
    kv = jax.random.normal(key, (B, L, H, W, 2 * C), dtype)
    pair = rand_pairwise(key)

    @jax.jit
    def run(kv, pair):
        t_ij = jnp.swapaxes(pair, 1, 2)
        kv_rep = jnp.broadcast_to(kv[:, None], (B, L, L, H, W, 2 * C))
        return warp_bev_mxu(kv_rep.reshape(B * L, L, H, W, 2 * C),
                            t_ij.reshape(B * L, L, 4, 4), 0.4, 4.0)

    ms = timeit(run, kv, pair)
    print(f"warp_mxu pairwise 2C {np.dtype(dtype).name}: {ms:.2f} ms")


def stage_attn_typed(dtype=jnp.float32):
    """Current typed Pallas kernel at production window counts."""
    from hmvit_tpu.ops.window_attention import hetero_window_attention

    t = WIN * WIN
    wn = (H // WIN) * (W // WIN)
    n = B * L
    key = jax.random.key(1)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (n, wn, t, C), dtype)
    k = jax.random.normal(ks[1], (n, L, wn, t, C), dtype)
    v = jax.random.normal(ks[2], (n, L, wn, t, C), dtype)
    wa = jax.random.normal(ks[3], (n, L, HEADS, D, D), dtype) * 0.1
    wm = jax.random.normal(ks[4], (n, L, HEADS, D, D), dtype) * 0.1
    bias = jax.random.normal(ks[5], (HEADS, t, t), dtype)
    mask = (jax.random.uniform(ks[6], (n, L, wn, t)) > 0.1).astype(dtype)

    @jax.jit
    def run(*a):
        return hetero_window_attention(*a, heads=HEADS, dim_head=D)

    ms = timeit(run, q, k, v, wa, wm, bias, mask)
    print(f"attn_typed pallas {np.dtype(dtype).name}: {ms:.2f} ms")


def stage_attn_untyped(dtype=jnp.float32):
    """New untyped Pallas kernel (post-fold)."""
    from hmvit_tpu.ops.window_attention import (
        plain_window_attention as window_attention,
    )

    t = WIN * WIN
    wn = (H // WIN) * (W // WIN)
    n = B * L
    key = jax.random.key(1)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (n, wn, t, C), dtype)
    kv = jax.random.normal(ks[1], (n, L, wn, t, 2 * C), dtype)
    bias = jax.random.normal(ks[5], (HEADS, t, t), dtype)
    mask = (jax.random.uniform(ks[6], (n, L, wn, t)) > 0.1).astype(dtype)

    @jax.jit
    def run(*a):
        return window_attention(*a, heads=HEADS, dim_head=D)

    ms = timeit(run, q, kv, bias, mask)
    print(f"attn_untyped pallas {np.dtype(dtype).name}: {ms:.2f} ms")


def stage_lidar(variant="current"):
    from flax import linen as nn

    from hmvit_tpu.models.pillar_encoder import PillarFeatureNet

    n_pts = 30000
    key = jax.random.key(2)
    pts = jax.random.uniform(key, (L, n_pts, 4), minval=-100, maxval=100)
    mask = jnp.ones((L, n_pts))
    net = PillarFeatureNet(
        num_filters=[64], voxel_size=[0.4, 0.4, 4.0],
        pc_range=[-102.4, -102.4, -3.0, 102.4, 102.4, 1.0],
        grid_size=(512, 512))
    variables = net.init(jax.random.key(0), pts, mask)

    @jax.jit
    def run(v, p, m):
        return net.apply(v, p, m)

    ms = timeit(run, variables, pts, mask, iters=10)
    print(f"pillar_pfn_scatter ({variant}): {ms:.2f} ms")


def stage_phase(compute_dtype="float32", style="local"):
    """One full H3GAT attention phase via the flax module."""
    from hmvit_tpu.models.hetero_fusion import (
        HeteroWindowAttention,
        pairwise_roi_mask,
    )

    key = jax.random.key(3)
    x = jax.random.normal(key, (B, L, H, W, C), jnp.float32)
    mode = jnp.array([[1, 0, 1, 0, 1]])
    pair = rand_pairwise(key)
    amask = jnp.ones((B, L))
    mod = HeteroWindowAttention(dim=C, dim_head=D, window=WIN, style=style,
                                compute_dtype=compute_dtype)
    pm = pairwise_roi_mask(pair, amask, (H, W), 0.4, 4.0)
    variables = mod.init(jax.random.key(0), x, mode, pair, amask,
                         pair_mask=pm)

    @jax.jit
    def run(v, x, mode, pair, amask, pm):
        return mod.apply(v, x, mode, pair, amask, True, pm)

    ms = timeit(run, variables, x, mode, pair, amask, pm, iters=10)
    print(f"phase[{style}] {compute_dtype}: {ms:.2f} ms")


def _prod_camera_cfg(compute_dtype="float32"):
    # keep in lockstep with bench.py PROD_CFG["camera"]
    return {"encoder": "bevformer", "lift": "planar",
            "backbone": "resnet50", "id_pick": [2, 3, 4],
            "fpn": True, "fpn_channels": 256,
            "dim": 256, "bev_size": 128, "out_dim": 256,
            "num_layers": 3, "heads": 8, "window": 8,
            "num_points_in_pillar": 4, "decoder_layers": 0,
            "bev_range": 102.4, "compute_dtype": compute_dtype}


def stage_camera(compute_dtype="float32", n_slots=L, img=512):
    """Full production camera branch: ResNet50 + planar BEVFormer."""
    from hmvit_tpu.models.hmvit import make_camera_encoder

    key = jax.random.key(4)
    ks = jax.random.split(key, 3)
    images = jax.random.uniform(ks[0], (n_slots, 4, img, img, 3))
    intr = jnp.broadcast_to(
        jnp.array([[img / 2, 0, img / 2], [0, img / 2, img / 2],
                   [0, 0, 1.0]]), (n_slots, 4, 3, 3))
    ang = jnp.arange(4) * (np.pi / 2)
    rot = jnp.stack([
        jnp.stack([jnp.cos(ang), -jnp.sin(ang), jnp.zeros(4)], -1),
        jnp.stack([jnp.sin(ang), jnp.cos(ang), jnp.zeros(4)], -1),
        jnp.stack([jnp.zeros(4), jnp.zeros(4), jnp.ones(4)], -1)], -2)
    extr = jnp.zeros((n_slots, 4, 4, 4)).at[:, :, 3, 3].set(1.0)
    extr = extr.at[:, :, :3, :3].set(rot[None]).at[:, :, 2, 3].set(1.6)
    enc = make_camera_encoder(_prod_camera_cfg(compute_dtype))
    variables = enc.init(jax.random.key(0), images, intr, extr, False)
    if compute_dtype == "bfloat16":
        # mirror bench.py serving: params cast to bf16 too (fp32 params
        # + bf16 inputs silently promote every conv to fp32)
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables)

    @jax.jit
    def run(v, im, ii, ee):
        return enc.apply(v, im, ii, ee, False)

    ms = timeit(run, variables, images, intr, extr, iters=10)
    print(f"camera branch x{n_slots} {compute_dtype}: {ms:.2f} ms")


def stage_backbone(compute_dtype="float32", img=512):
    """ResNet50 stride-8 trunk on the 20 production images."""
    from hmvit_tpu.models.resnet import ResNetEncoder

    key = jax.random.key(5)
    images = jax.random.uniform(
        key, (20, img, img, 3),
        dtype=jnp.bfloat16 if compute_dtype == "bfloat16"
        else jnp.float32)
    net = ResNetEncoder(arch="resnet50", id_pick=(2,))
    variables = net.init(jax.random.key(0), images, False)

    @jax.jit
    def run(v, im):
        return net.apply(v, im, False)

    ms = timeit(run, variables, images, iters=10)
    print(f"resnet50 x20@{img} {compute_dtype}: {ms:.2f} ms")


def stage_pairwarp(dtype=jnp.bfloat16, l=L, variant="tile", r=None):
    """Pallas fused pair warp kernel alone (typed K/V, all receivers)."""
    from functools import partial

    from hmvit_tpu.ops.fused_warp import pallas_pair_warp

    key = jax.random.key(7)
    kv = jax.random.normal(key, (B, 2, l, H, W, 2 * C), dtype)
    pair = rand_pairwise(key, l=l)
    mode = jnp.asarray(np.arange(l)[None] % 2)

    @partial(jax.jit, static_argnames=())
    def run(kv, pair, mode):
        return pallas_pair_warp(kv, pair, mode, 0.4, 4.0,
                                num_receivers=r, variant=variant)

    ms = timeit(run, kv, pair, mode, iters=10)
    print(f"pallas_pair_warp L={l} R={r or l} {np.dtype(dtype).name} "
          f"[{variant}]: {ms:.2f} ms")
    return np.asarray(run(kv, pair, mode))


def stage_fusion(compute_dtype="float32", l=L, static: bool = False,
                 stripe: bool = False):
    """Full 2-iteration HeteroFusion stack at production shapes.

    static=True mirrors serving: static_modes passed (type-range
    projections + param-folded KV relation transforms); stripe=True
    routes the local phases through the unsplit stripe kernel."""
    from hmvit_tpu.models.hetero_fusion import HeteroFusion

    key = jax.random.key(6)
    x = jax.random.normal(key, (B, l, H, W, C), jnp.float32)
    mode = jnp.asarray((np.arange(l)[None] + 1) % 2)
    modes_t = tuple(int(m) for m in np.asarray(mode[0]))
    pair = rand_pairwise(key, l=l)
    amask = jnp.ones((B, l))
    cfg = {"num_iters": 2,
           "hetero_fusion_block": {
               "spatial_transform": {"downsample_rate": 4,
                                     "voxel_size": [0.4, 0.4, 4.0]},
               "architect_mode": "sequential", "input_dim": C,
               "mlp_dim": C, "window_size": WIN, "dim_head": D,
               "drop_out": 0.0, "compute_dtype": compute_dtype,
               "use_stripe": stripe}}
    mod = HeteroFusion(cfg)
    variables = mod.init(jax.random.key(0), x, mode, pair, amask)

    @jax.jit
    def run(v, x, mode, pair, amask):
        return mod.apply(v, x, mode, pair, amask,
                         static_modes=modes_t if static else None)

    ms = timeit(run, variables, x, mode, pair, amask, iters=10)
    tag = (" static" if static else "") + (" stripe" if stripe else "")
    print(f"fusion 2-iter L={l}{tag} {compute_dtype}: {ms:.2f} ms")


def stage_fused_wa(dtype=jnp.bfloat16, l=4, r=None):
    """Fused warp+attention kernel vs the split Pallas pair it replaces
    (pallas_pair_warp -> stripe_window_attention), at production shapes:
    timing A/B + max-abs-diff (expected: bit-identical)."""
    from hmvit_tpu.ops.fused_warp import pallas_pair_warp
    from hmvit_tpu.ops.fused_warp_attention import warp_window_attention
    from hmvit_tpu.ops.window_attention import stripe_window_attention

    key = jax.random.key(9)
    ks = jax.random.split(key, 4)
    n_recv = l if r is None else r
    src = jax.random.normal(ks[0], (B, 2, l, H, W, 2 * C), dtype)
    q = jax.random.normal(ks[1], (B * n_recv, H, W, C), dtype)
    mask = (jax.random.uniform(ks[2], (B * n_recv, l, H, W))
            > 0.1).astype(dtype)
    bias = jax.random.normal(ks[3], (HEADS, WIN * WIN, WIN * WIN),
                             dtype) * 0.1
    pair = rand_pairwise(key, l=l)
    mode = jnp.asarray(np.arange(l)[None] % 2)

    @jax.jit
    def split(q, src, pair, mode, mask, bias):
        kv_pair = pallas_pair_warp(src, pair, mode, 0.4, 4.0,
                                   num_receivers=r)
        return stripe_window_attention(
            q, kv_pair.reshape(B * n_recv, l, H, W, 2 * C), bias, mask,
            win=WIN, heads=HEADS, dim_head=D)

    @jax.jit
    def fused(q, src, pair, mode, mask, bias):
        return warp_window_attention(q, src, pair, mode, mask, bias,
                                     WIN, HEADS, D, 0.4, 4.0,
                                     num_receivers=r)

    a = split(q, src, pair, mode, mask, bias)
    bt = fused(q, src, pair, mode, mask, bias)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - bt.astype(jnp.float32))))
    ms_split = timeit(split, q, src, pair, mode, mask, bias, iters=10)
    ms_fused = timeit(fused, q, src, pair, mode, mask, bias, iters=10)
    tag = f"L={l}" + (f" R={r}" if r else "")
    print(f"warp+attn {tag} {np.dtype(dtype).name}: split {ms_split:.2f}"
          f" ms, fused {ms_fused:.2f} ms, max|diff|={diff:.3e}")


def stage_expand(dtype=jnp.bfloat16, n_nz=40000, clouds=2, c=64):
    """Dense-tail isolation A/B: compacted rows -> (clouds*512^2, C).

    Times the three builds of the dense BEV grid from sorted compacted
    pillar rows at serving occupancy (~20k non-empty pillars/cloud):
    the XLA searchsorted+gather oracle, the v1 slab kernel, and the
    demand-sized-DMA v2 kernel (ops/expand.py)."""
    from hmvit_tpu.ops.expand import (
        expand_rows_to_dense,
        expand_rows_to_dense_v2,
        expand_rows_to_dense_xla,
    )

    num_cells = clouds * 512 * 512
    key = jax.random.key(11)
    ids = np.sort(np.random.RandomState(0).choice(
        num_cells, size=n_nz, replace=False)).astype(np.int32)
    comp = jax.random.normal(key, (n_nz, c), dtype)
    ids = jnp.asarray(ids)

    for name, fn in (("xla", expand_rows_to_dense_xla),
                     ("v1", expand_rows_to_dense),
                     ("v2", expand_rows_to_dense_v2)):
        run = jax.jit(lambda co, i, f=fn: f(co, i, num_cells))
        try:
            ms = timeit(run, comp, ids, iters=10)
        except Exception as e:  # first TPU lowering may reject a variant
            print(f"expand[{name}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        print(f"expand[{name}] {n_nz} rows -> {num_cells}x{c} "
              f"{np.dtype(dtype).name}: {ms:.2f} ms")


STAGES = {
    "warp": lambda: (stage_warp(jnp.float32), stage_warp(jnp.bfloat16)),
    "attn": lambda: (stage_attn_typed(jnp.float32),),
    "attn_untyped": lambda: (stage_attn_untyped(jnp.float32),
                             stage_attn_untyped(jnp.bfloat16)),
    "lidar": lambda: (stage_lidar(),),
    "phase": lambda: (stage_phase("float32", "local"),
                      stage_phase("float32", "grid"),
                      stage_phase("bfloat16", "local"),
                      stage_phase("bfloat16", "grid")),
    "camera": lambda: (stage_camera("bfloat16"),
                       stage_camera("float32")),
    "camera2": lambda: (stage_camera("bfloat16", n_slots=2),),
    "backbone": lambda: (stage_backbone("bfloat16"),
                         stage_backbone("float32")),
    "fusion": lambda: (stage_fusion("bfloat16"),
                       stage_fusion("float32")),
    "fusion4": lambda: (stage_fusion("bfloat16", l=4),),
    "fusion4s": lambda: (stage_fusion("bfloat16", l=4, static=True),),
    "fusion4st": lambda: (stage_fusion("bfloat16", l=4, static=True,
                                       stripe=True),),
    "pairwarp": lambda: (stage_pairwarp(jnp.bfloat16, l=4),
                         stage_pairwarp(jnp.bfloat16, l=5)),
    "pairwarp_res": lambda: [
        np.testing.assert_array_equal(
            stage_pairwarp(jnp.bfloat16, l=lv, variant="resident", r=rv),
            stage_pairwarp(jnp.bfloat16, l=lv, variant="tile", r=rv))
        for lv, rv in ((4, None), (5, None), (4, 1))],
    "expand": lambda: (stage_expand(jnp.bfloat16),),
    "fused_wa": lambda: (stage_fused_wa(jnp.bfloat16, l=4),
                         stage_fused_wa(jnp.bfloat16, l=4, r=1),
                         stage_fused_wa(jnp.bfloat16, l=5)),
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    print("backend:", jax.default_backend(), jax.devices()[0])
    for nm in names:
        STAGES[nm]()
