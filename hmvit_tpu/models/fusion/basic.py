"""Simple cooperative fusions: max (F-Cooper), agent-attention, DiscoNet.

All warp every agent's map into the ego (slot 0) frame once, then fuse
along the agent axis with the padded slots masked.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.warp import warp_bev_nhwc


def warp_to_ego(x, pairwise, discrete_ratio, downsample_rate):
    """(B, L, H, W, C) -> all agents in the ego frame."""
    t = pairwise[:, :, 0]  # (B, L, 4, 4): j -> ego
    return warp_bev_nhwc(x, t, discrete_ratio, downsample_rate)


class SpatialFusion(nn.Module):
    """F-Cooper: per-pixel max over agents (reference:
    opencood/models/fusion_modules/f_cooper_fuse.py:15-41)."""
    discrete_ratio: float = 0.4
    downsample_rate: float = 4.0

    @nn.compact
    def __call__(self, x, mode, pairwise, agent_mask):
        x = warp_to_ego(x, pairwise, self.discrete_ratio,
                        self.downsample_rate)
        neg = jnp.where(
            agent_mask[:, :, None, None, None] > 0, x, -jnp.inf
        )
        out = neg.max(axis=1)
        return jnp.where(jnp.isfinite(out), out, 0.0)


class AttFusion(nn.Module):
    """Per-pixel scaled-dot-product attention along the agent axis, ego
    query (reference: opencood/models/fusion_modules/self_attn.py:36-57)."""
    dim: int
    discrete_ratio: float = 0.4
    downsample_rate: float = 4.0

    @nn.compact
    def __call__(self, x, mode, pairwise, agent_mask):
        x = warp_to_ego(x, pairwise, self.discrete_ratio,
                        self.downsample_rate)
        # q=k=v=x per pixel; ego row is the query
        q = x[:, 0]  # (B, H, W, C)
        sim = jnp.einsum("bhwc,blhwc->blhw", q, x,
                         preferred_element_type=jnp.float32)
        sim = sim / jnp.sqrt(jnp.asarray(x.shape[-1], sim.dtype))
        sim = jnp.where(agent_mask[:, :, None, None] > 0, sim, -1e9)
        attn = jax.nn.softmax(sim, axis=1)
        return jnp.einsum("blhw,blhwc->bhwc", attn, x,
                          preferred_element_type=jnp.float32)


class PixelWeightedFusionSoftmax(nn.Module):
    """(neighbor, ego) pair scorer: 3x (1x1 conv + BN + relu) down
    2C -> 128 -> 32 -> 8, then a bare 1x1 -> 1 + relu (reference:
    opencood/models/fusion_modules/disconet_fuse.py:18-44 — the last
    conv has no BN).  Softmax over the agent axis is the caller's job."""

    @nn.compact
    def __call__(self, pair, train: bool = False):
        x = pair
        for ch in (128, 32, 8):
            x = nn.Conv(ch, (1, 1))(x)
            x = nn.BatchNorm(use_running_average=not train,
                             epsilon=1e-5, momentum=0.9)(x)
            x = nn.relu(x)
        return nn.relu(nn.Conv(1, (1, 1))(x))


class DiscoNetFusion(nn.Module):
    """Pixel-weighted softmax fusion (reference:
    opencood/models/fusion_modules/disconet_fuse.py:46-157): per
    receiver, every agent's map is warped into the receiver's frame,
    each (warped neighbor, receiver) pair is scored by the shared
    :class:`PixelWeightedFusionSoftmax`, masked to the ROI/CAV overlap,
    softmaxed over the agent axis and summed; the ego's fused map runs a
    final per-pixel Linear.  The reference's per-(batch, receiver)
    Python loops vectorize into one batched warp + one scorer pass; its
    ConvGRU/msg_cnn members are never touched by its forward and are
    omitted.  With ``num_iteration`` == 1 only the ego receiver is
    computed (identical output — other receivers' updates are dead)."""
    dim: int
    discrete_ratio: float = 0.4
    downsample_rate: float = 4.0
    num_iteration: int = 1
    use_mask: bool = True

    @nn.compact
    def __call__(self, x, mode, pairwise, agent_mask, train: bool = False):
        from ..hetero_fusion import pairwise_roi_mask

        b, l, h, w, c = x.shape
        scorer = PixelWeightedFusionSoftmax(name="pixel_weighted_fusion")
        roi = pairwise_roi_mask(pairwise, agent_mask, (h, w),
                                self.discrete_ratio, self.downsample_rate)
        n_recv = l if self.num_iteration > 1 else 1
        m_ij = jnp.moveaxis(roi[:, :n_recv], -1, 2)  # (B, I, J, H, W)
        t_ij = jnp.swapaxes(pairwise, 1, 2)[:, :n_recv]  # (B, I, J, 4, 4)

        feats = x
        fused = x[:, :n_recv]
        for _ in range(self.num_iteration):
            src = jnp.broadcast_to(feats[:, None],
                                   (b, n_recv, l, h, w, c))
            warped = warp_bev_nhwc(
                src.reshape(b * n_recv, l, h, w, c),
                t_ij.reshape(b * n_recv, l, 4, 4),
                self.discrete_ratio, self.downsample_rate,
            ).reshape(b, n_recv, l, h, w, c)
            ego_rep = jnp.broadcast_to(feats[:, :n_recv, None],
                                       (b, n_recv, l, h, w, c))
            pair = jnp.concatenate([warped, ego_rep], axis=-1)
            s = scorer(pair.reshape(b * n_recv * l, h, w, 2 * c), train)
            s = s.reshape(b, n_recv, l, h, w)
            if self.use_mask:
                s = jnp.where(m_ij > 0, s, -jnp.inf)
            wgt = jax.nn.softmax(s, axis=2)
            wgt = jnp.where(jnp.isfinite(wgt), wgt, 0.0)
            fused = (wgt[..., None] * warped * m_ij[..., None]).sum(axis=2)
            feats = fused if n_recv == l else jnp.concatenate(
                [fused, feats[:, 1:]], axis=1)
        return nn.Dense(self.dim, name="mlp")(fused[:, 0])
