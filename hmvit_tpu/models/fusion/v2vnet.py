"""V2VNet: graph message passing with a ConvGRU state update.

Reference-faithful numerics (reference:
opencood/models/fusion_modules/v2v_fuse.py:56-137 and
sub_modules/convgru.py:48-70), vectorized: the reference's per-batch /
per-receiver Python loops become one batched conv over the (B, I, J)
pair axis.  Semantics kept exactly:

  * pairwise message = msg_cnn([warp(state_j), state_i]) * roi_cav_mask
    — NO activation on the message (v2v_fuse.py:105);
  * "avg" aggregation divides by the number of REAL agents N
    (torch.mean over the sender axis, v2v_fuse.py:109), not by the
    per-pixel valid count;
  * the ConvGRU runs ONE step from a zero hidden state with
    x = [state_i, agg] as its input (v2v_fuse.py:118-123,
    convgru.py:58-70): gates = conv([x, h]) split into (reset, update),
    candidate = tanh(conv([x, reset * h])),
    h' = (1 - update) * h + update * cand;
  * gru_flag=False falls back to state_i + agg (v2v_fuse.py:125);
  * final ego readout through a Linear (v2v_fuse.py:135).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ...ops.warp import roi_and_agent_mask, warp_bev_nhwc


class ConvGRUStep(nn.Module):
    """One reference ConvGRUCell step (convgru.py:48-70).

    Input x: (..., H, W, Cx), hidden h: (..., H, W, Ch)."""
    hidden: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, h):
        k = (self.kernel, self.kernel)
        xh = jnp.concatenate([x, h], axis=-1)
        gates = nn.Conv(2 * self.hidden, k, name="conv_gates")(xh)
        reset = nn.sigmoid(gates[..., : self.hidden])
        update = nn.sigmoid(gates[..., self.hidden:])
        cand = jnp.tanh(
            nn.Conv(self.hidden, k, name="conv_can")(
                jnp.concatenate([x, reset * h], axis=-1)
            )
        )
        return (1 - update) * h + update * cand


class V2VNetFusion(nn.Module):
    dim: int
    num_rounds: int = 2
    discrete_ratio: float = 0.4
    downsample_rate: float = 4.0
    agg_operator: str = "avg"
    gru_flag: bool = True

    @nn.compact
    def __call__(self, x, mode, pairwise, agent_mask):
        b, l, h, w, c = x.shape
        t_ij = jnp.swapaxes(pairwise, 1, 2)  # (B, I, J, 4, 4): j -> i

        com_mask = roi_and_agent_mask(
            b * l, l, h, w,
            jnp.broadcast_to(agent_mask[:, None], (b, l, l)).reshape(-1, l),
            t_ij.reshape(-1, l, 4, 4),
            self.discrete_ratio, self.downsample_rate,
        ).reshape(b, l, h, w, l)  # (B, I, H, W, J)
        pair_mask = jnp.moveaxis(com_mask, -1, 2)  # (B, I, J, H, W)

        msg_conv = nn.Conv(self.dim, (3, 3), name="msg_conv")
        gru = ConvGRUStep(self.dim, name="conv_gru")
        n_real = jnp.clip(agent_mask.sum(axis=1), 1.0, None)  # (B,)

        state = x
        for _ in range(self.num_rounds):
            rep = jnp.broadcast_to(state[:, None], (b, l, l, h, w, c))
            warped = warp_bev_nhwc(
                rep.reshape(b * l, l, h, w, c),
                t_ij.reshape(b * l, l, 4, 4),
                self.discrete_ratio, self.downsample_rate,
            ).reshape(b, l, l, h, w, c)
            recv = jnp.broadcast_to(state[:, :, None], (b, l, l, h, w, c))
            pair = jnp.concatenate([warped, recv], axis=-1)
            msg = msg_conv(pair.reshape(b * l * l, h, w, 2 * c))
            msg = msg.reshape(b, l, l, h, w, self.dim)
            msg = msg * pair_mask[..., None]
            if self.agg_operator == "max":
                # reference torch.max over the N REAL senders of the
                # already-masked message (masked pixels stay 0 rows)
                real_j = agent_mask[:, None, :, None, None, None] > 0
                neg = jnp.where(real_j, msg, -jnp.inf)
                agg = neg.max(axis=2)
            else:  # "avg": reference torch.mean over the N real senders
                agg = msg.sum(axis=2) / n_real[:, None, None, None, None]
            if self.gru_flag:
                gru_in = jnp.concatenate([state, agg], axis=-1)
                state = gru(
                    gru_in.reshape(b * l, h, w, 2 * c),
                    jnp.zeros((b * l, h, w, self.dim), state.dtype),
                ).reshape(b, l, h, w, self.dim)
            else:
                state = state + agg
            state = state * agent_mask[:, :, None, None, None]

        out = nn.Dense(self.dim, name="out_mlp")(state[:, 0])
        return out
