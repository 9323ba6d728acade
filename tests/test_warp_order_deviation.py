"""Bound the documented project-before-warp deviation.

The reference order is norm -> WARP -> project K/V per (receiver,
sender) pair (opencood/models/sub_modules/hetero_fusion.py:338-361 then
projections inside HeteroAttention).  We hoist the typed projections
(and relation fold) BEFORE the warp — linear maps commute with bilinear
resampling everywhere except where zero padding bleeds in: at ROI
boundary pixels the projection BIAS is attenuated by the interpolation
weight instead of being re-added after.  This test computes both
orderings end-to-end on realistic rigid pairwise transforms and pins
the deviation:

  * interior pixels (all senders' warped-ones weight == 1): identical
    to fp32 tolerance;
  * ROI-boundary pixels: bounded, small relative to the signal.
"""
import jax
import jax.numpy as jnp
import numpy as np

from hmvit_tpu.models.hetero_fusion import (
    HeteroWindowAttention,
    _window_merge,
    _window_split,
    pairwise_roi_mask,
    relative_position_index,
)
from hmvit_tpu.models.layers import hetero_param_gather
from hmvit_tpu.ops.warp import warp_bev_nhwc
import pytest

pytestmark = pytest.mark.compile  # compile-heavy: full lane only

B, L, H, W, C = 1, 3, 32, 32, 32
HEADS, D, WIN = 4, 8, 4


def realistic_pairwise(rng):
    """Rigid transforms like nearby CAVs: +-25 deg, +-6 px translation."""
    ang = rng.uniform(-np.pi / 7, np.pi / 7, (B, L))
    pos = rng.uniform(-6, 6, (B, L, 2))
    m = np.tile(np.eye(4, dtype=np.float64), (B, L, 1, 1))
    m[:, :, 0, 0] = np.cos(ang)
    m[:, :, 0, 1] = -np.sin(ang)
    m[:, :, 1, 0] = np.sin(ang)
    m[:, :, 1, 1] = np.cos(ang)
    m[:, :, :2, 3] = pos
    minv = np.linalg.inv(m)
    return jnp.asarray(
        np.einsum("bixy,bjyz->bjixz", minv, m).astype(np.float32))


def reference_order(params, x, mode, pairwise, agent_mask):
    """norm-free attention message computed with the REFERENCE ordering:
    warp each sender's raw features into the receiver frame FIRST, then
    apply the typed K/V projections + relation transforms per pair."""
    p = params["params"]
    scale = D ** -0.5
    b, l, h, w, c = x.shape

    def hetero_dense_rows(name, rows, types):
        # rows: (..., c) with a single type per call site
        kern = p[name]["kernel"][types]
        bias = p[name]["bias"][types]
        return rows @ kern + bias

    # warp raw features per (receiver, sender)
    t_ij = jnp.swapaxes(pairwise, 1, 2)
    x_rep = jnp.broadcast_to(x[:, None], (b, l, l, h, w, c))
    x_pair = warp_bev_nhwc(
        x_rep.reshape(b * l, l, h, w, c),
        t_ij.reshape(b * l, l, 4, 4), 1.0, 1.0,
    ).reshape(b, l, l, h, w, c)

    # per-sender typed projections AFTER the warp (reference order)
    k_pair = jnp.stack([
        jnp.stack([hetero_dense_rows("to_k", x_pair[:, i, j], mode[0, j])
                   for j in range(l)], 1) for i in range(l)], 1)
    v_pair = jnp.stack([
        jnp.stack([hetero_dense_rows("to_v", x_pair[:, i, j], mode[0, j])
                   for j in range(l)], 1) for i in range(l)], 1)
    q = jnp.stack([hetero_dense_rows("to_q", x[:, i], mode[0, i])
                   for i in range(l)], 1)

    com_mask = pairwise_roi_mask(pairwise, agent_mask, (h, w), 1.0, 1.0)
    pair_type = mode[:, :, None] * 2 + mode[:, None, :]
    w_att = hetero_param_gather(p["relation_att"], pair_type)
    w_msg = hetero_param_gather(p["relation_msg"], pair_type)

    qw = _window_split(q, WIN, "local")
    kw = _window_split(k_pair, WIN, "local")
    vw = _window_split(v_pair, WIN, "local")
    mw = _window_split(jnp.moveaxis(com_mask, -1, 2)[..., None],
                       WIN, "local")[..., 0]
    nx, ny, t_tok = qw.shape[2], qw.shape[3], WIN * WIN

    bias = p["rel_pos_bias"][jnp.asarray(relative_position_index(WIN))]
    qh = qw.reshape(b, l, nx, ny, t_tok, HEADS, D) * scale
    kh = kw.reshape(b, l, l, nx, ny, t_tok, HEADS, D)
    vh = vw.reshape(b, l, l, nx, ny, t_tok, HEADS, D)
    q_rel = jnp.einsum("bixythd,bijhde->bijxythe", qh, w_att)
    sim = jnp.einsum("bijxythe,bijxyshe->bijxyhts", q_rel, kh)
    sim = sim + bias.transpose(2, 0, 1)[None, None, None, None, None]
    neg = jnp.asarray(-1e9, sim.dtype)
    sim = jnp.where(mw[:, :, :, :, :, None, None, :] > 0, sim, neg)
    sim = jnp.moveaxis(sim, 2, -2)
    flat = sim.reshape(*sim.shape[:-2], l * t_tok)
    attn = jax.nn.softmax(flat, axis=-1)
    attn = jnp.where(jnp.max(flat, -1, keepdims=True) <= neg / 2,
                     jnp.zeros_like(attn), attn)
    attn = jnp.moveaxis(attn.reshape(sim.shape), -2, 2)
    v_msg = jnp.einsum("bijhde,bijxyshe->bijxyshd", w_msg, vh)
    out = jnp.einsum("bijxyhts,bijxyshd->bixythd", attn, v_msg)
    out = out.reshape(b, l, nx, ny, t_tok, HEADS * D)
    out = _window_merge(out, WIN, "local", h, w)
    return jnp.stack([hetero_dense_rows("to_out", out[:, i], mode[0, i])
                      for i in range(l)], 1)


def test_project_before_warp_deviation_is_bounded():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, H, W, C)).astype(np.float32))
    mode = jnp.asarray([[1, 0, 1]])
    pairwise = realistic_pairwise(rng)
    agent_mask = jnp.ones((B, L))

    mod = HeteroWindowAttention(dim=C, dim_head=D, window=WIN,
                                style="local", discrete_ratio=1.0,
                                downsample_rate=1.0, use_mxu_warp=False,
                                use_pallas=False)
    params = mod.init(jax.random.key(2), x, mode, pairwise, agent_mask)
    got = np.asarray(mod.apply(params, x, mode, pairwise, agent_mask))
    want = np.asarray(reference_order(params, x, mode, pairwise,
                                      agent_mask))

    # interior mask: pixels whose BILINEAR warped-ones weight is 1 for
    # every sender (no zero-padding bleed anywhere in the key set)
    ones = jnp.ones((B, L, H, W, 1))
    t_ij = jnp.swapaxes(pairwise, 1, 2)
    w_ones = warp_bev_nhwc(
        jnp.broadcast_to(ones[:, None], (B, L, L, H, W, 1)).reshape(
            B * L, L, H, W, 1),
        t_ij.reshape(B * L, L, 4, 4), 1.0, 1.0,
    ).reshape(B, L, L, H, W)
    interior = np.asarray(jnp.all(w_ones > 1.0 - 1e-6, axis=2))

    err = np.abs(got - want)
    scale = np.abs(want).mean()

    # the attention softmax couples boundary keys into every query in
    # the window, so "interior" here means windows whose ENTIRE key set
    # is interior for all senders
    win_interior = np.asarray(_window_split(
        jnp.asarray(interior[..., None].astype(np.float32)),
        WIN, "local")[..., 0].min(axis=-1))  # (B, L, X, Y)
    win_err = np.asarray(_window_split(jnp.asarray(err).max(-1)[..., None],
                                       WIN, "local")[..., 0].max(-1))
    clean = win_interior > 0
    assert clean.sum() > 0
    assert win_err[clean].max() < 1e-4 * max(1.0, scale), (
        "interior windows must match exactly")

    # boundary deviation: bounded and small relative to signal
    # (measured on this fixture: max ~2.1% of mean |signal|, mean ~0.3%)
    rel = err.max() / scale
    assert rel < 0.05, f"boundary deviation blew up: {rel:.3f}"
    assert (err.mean() / scale) < 0.01
