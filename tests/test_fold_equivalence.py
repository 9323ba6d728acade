"""The typed-fold restructure of HeteroWindowAttention must be
numerically identical to the original per-(receiver, sender) typed
einsum chain (reference algorithm, opencood/models/sub_modules/
hetero_fusion.py:16-277): W_att/W_msg folded into K/V per RECEIVER TYPE
before the warp == W applied per pair after windowing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmvit_tpu.models.hetero_fusion import (
    HeteroWindowAttention,
    _window_merge,
    _window_split,
    pairwise_roi_mask,
    relative_position_index,
)
from hmvit_tpu.models.layers import hetero_param_gather
from hmvit_tpu.ops.warp import warp_bev_nhwc

B, L, H, W, C = 1, 3, 16, 16, 32
HEADS, D, WIN = 4, 8, 4


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, L, H, W, C)).astype(np.float32)
    mode = np.array([[1, 0, 1]])
    # non-trivial rigid pairwise transforms
    ang = rng.uniform(-np.pi, np.pi, (B, L))
    pos = rng.uniform(-3, 3, (B, L, 2))
    m = np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))
    m[:, :, 0, 0] = np.cos(ang)
    m[:, :, 0, 1] = -np.sin(ang)
    m[:, :, 1, 0] = np.sin(ang)
    m[:, :, 1, 1] = np.cos(ang)
    m[:, :, :2, 3] = pos
    minv = np.linalg.inv(m)
    pairwise = np.einsum("bixy,bjyz->bjixz", minv, m)
    agent_mask = np.ones((B, L), np.float32)
    agent_mask[:, -1] = 0.0
    return (jnp.asarray(x), jnp.asarray(mode),
            jnp.asarray(pairwise.astype(np.float32)),
            jnp.asarray(agent_mask))


def typed_reference(params, x, mode, pairwise, agent_mask, style):
    """The pre-fold algorithm, re-implemented verbatim from the round-1
    module: project -> warp per (i, j) -> window -> typed q.W.k einsums."""
    p = params["params"]
    num_types = 2
    scale = D ** -0.5

    def hetero_dense(name, x, mode):
        kern = p[name]["kernel"]  # (T, din, dout)
        bias = p[name]["bias"]
        y_all = jnp.einsum("blxyd,tdo->blxyto", x, kern)
        sel = jax.nn.one_hot(mode, num_types)[:, :, None, None, :, None]
        y = (y_all * sel).sum(-2)
        bsel = hetero_param_gather(bias, mode)
        return y + bsel[:, :, None, None, :]

    q = hetero_dense("to_q", x, mode)
    k = hetero_dense("to_k", x, mode)
    v = hetero_dense("to_v", x, mode)

    b, l, h, w, c = x.shape
    t_ij = jnp.swapaxes(pairwise, 1, 2)
    kv = jnp.concatenate([k, v], axis=-1)
    kv_rep = jnp.broadcast_to(kv[:, None], (b, l, l, h, w, 2 * c))
    kv_pair = warp_bev_nhwc(
        kv_rep.reshape(b * l, l, h, w, 2 * c),
        t_ij.reshape(b * l, l, 4, 4), 1.0, 1.0,
    ).reshape(b, l, l, h, w, 2 * c)
    k_pair, v_pair = kv_pair[..., :c], kv_pair[..., c:]

    com_mask = pairwise_roi_mask(pairwise, agent_mask, (h, w), 1.0, 1.0)

    pair_type = mode[:, :, None] * num_types + mode[:, None, :]
    w_att = hetero_param_gather(p["relation_att"], pair_type)
    w_msg = hetero_param_gather(p["relation_msg"], pair_type)

    qw = _window_split(q, WIN, style)
    kw = _window_split(k_pair, WIN, style)
    vw = _window_split(v_pair, WIN, style)
    mask_ij = jnp.moveaxis(com_mask, -1, 2)
    mw = _window_split(mask_ij[..., None], WIN, style)[..., 0]
    nx, ny, t_tok = qw.shape[2], qw.shape[3], WIN * WIN

    table = p["rel_pos_bias"]
    bias = table[jnp.asarray(relative_position_index(WIN))]

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
    out = _window_merge(out, WIN, style, h, w)
    out = hetero_dense("to_out", out, mode)
    return out


@pytest.mark.slow
def test_folded_module_matches_typed_reference():
    x, mode, pairwise, agent_mask = make_inputs()
    for style in ("local", "grid"):
        mod = HeteroWindowAttention(
            dim=C, dim_head=D, window=WIN, style=style,
            discrete_ratio=1.0, downsample_rate=1.0,
            use_mxu_warp=False, use_pallas=False)
        params = mod.init(jax.random.key(1), x, mode, pairwise, agent_mask)
        got = mod.apply(params, x, mode, pairwise, agent_mask)
        want = typed_reference(params, x, mode, pairwise, agent_mask,
                               style)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
