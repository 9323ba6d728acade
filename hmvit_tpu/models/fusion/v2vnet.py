"""V2VNet: graph message passing with a ConvGRU state update.

Capability-equivalent of the reference (reference:
opencood/models/fusion_modules/v2v_fuse.py:18-137 and
sub_modules/convgru.py): for each round, every agent's state is warped
into every receiver's frame, pairwise messages are computed by a conv on
the (sender, receiver) concatenation, mean-aggregated over valid senders,
and folded into the receiver state by a ConvGRU cell.  The reference's
per-agent Python loops become one batched conv over the (B, I, J) pair
axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.warp import roi_and_agent_mask, warp_bev_nhwc


class ConvGRUCell(nn.Module):
    hidden: int
    kernel: int = 3

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        k = (self.kernel, self.kernel)
        z = nn.sigmoid(nn.Conv(self.hidden, k)(hx))
        r = nn.sigmoid(nn.Conv(self.hidden, k)(hx))
        cand = jnp.tanh(
            nn.Conv(self.hidden, k)(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1 - z) * h + z * cand


class V2VNetFusion(nn.Module):
    dim: int
    num_rounds: int = 2
    discrete_ratio: float = 0.4
    downsample_rate: float = 4.0

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
        gru = ConvGRUCell(self.dim, name="conv_gru")

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
            msg = nn.relu(msg).reshape(b, l, l, h, w, self.dim)
            msg = msg * pair_mask[..., None]
            denom = jnp.clip(pair_mask.sum(axis=2, keepdims=True), 1.0,
                             None)[..., None]
            agg = msg.sum(axis=2) / denom[:, :, 0]
            state = gru(
                state.reshape(b * l, h, w, c),
                agg.reshape(b * l, h, w, self.dim),
            ).reshape(b, l, h, w, c)
            state = state * agent_mask[:, :, None, None, None]

        out = nn.Dense(self.dim, name="out_mlp")(state[:, 0])
        return out
