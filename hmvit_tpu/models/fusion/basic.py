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


class DiscoNetFusion(nn.Module):
    """Pixel-weighted softmax fusion: a small conv scores each
    (ego, agent) pair per pixel (reference:
    opencood/models/fusion_modules/disconet_fuse.py:18-157)."""
    dim: int
    discrete_ratio: float = 0.4
    downsample_rate: float = 4.0

    @nn.compact
    def __call__(self, x, mode, pairwise, agent_mask):
        b, l, h, w, c = x.shape
        x = warp_to_ego(x, pairwise, self.discrete_ratio,
                        self.downsample_rate)
        ego = jnp.broadcast_to(x[:, :1], x.shape)
        pair = jnp.concatenate([ego, x], axis=-1).reshape(b * l, h, w, 2 * c)
        s = nn.Conv(self.dim // 2, (1, 1))(pair)
        s = nn.relu(s)
        s = nn.Conv(1, (1, 1))(s).reshape(b, l, h, w)
        s = jnp.where(agent_mask[:, :, None, None] > 0, s, -1e9)
        attn = jax.nn.softmax(s, axis=1)
        return jnp.einsum("blhw,blhwc->bhwc", attn, x,
                          preferred_element_type=jnp.float32)
