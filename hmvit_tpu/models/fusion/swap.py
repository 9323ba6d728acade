"""SwapFusion (CoBEVT FuseBEVT): masked local-window / global-grid
multi-agent self-attention.

Capability-equivalent of the reference (reference:
opencood/models/fusion_modules/swap_fusion_modules.py:14-279): agents are
first warped into the ego frame, then depth x [window attention over the
(agent x win^2) token set, FFN, grid attention, FFN], finally a mean over
valid agents' maps.  Untyped (single weight set) — the typed variant is
H3GAT in models/hetero_fusion.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.warp import roi_and_agent_mask, warp_bev_nhwc
from ..hetero_fusion import _window_merge, _window_split, \
    relative_position_index


class SwapAttention(nn.Module):
    """Joint attention over all agents' tokens inside each window."""
    dim: int
    dim_head: int = 32
    window: int = 8
    style: str = "local"

    @nn.compact
    def __call__(self, x, mask):
        # x: (B, L, H, W, C); mask: (B, L, H, W) validity
        b, l, h, w, c = x.shape
        heads = self.dim // self.dim_head
        d = self.dim_head
        win = self.window

        qkv = nn.Dense(3 * self.dim, use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def wsplit(t):
            return _window_split(t, win, self.style)

        qw, kw, vw = wsplit(q), wsplit(k), wsplit(v)
        mw = wsplit(mask[..., None])[..., 0]  # (B, L, X, Y, T)
        nx, ny, t_tok = qw.shape[2], qw.shape[3], win * win

        def heads_split(t):
            return t.reshape(b, l, nx, ny, t_tok, heads, d)

        qh = heads_split(qw) * d ** -0.5
        kh, vh = heads_split(kw), heads_split(vw)

        sim = jnp.einsum("bixythd,bjxyshd->bxyhitjs", qh, kh,
                         preferred_element_type=jnp.float32)
        table = self.param("rel_pos_bias", nn.initializers.normal(0.02),
                           ((2 * win - 1) ** 2, heads))
        bias = table[jnp.asarray(relative_position_index(win))]
        sim = sim + bias.transpose(2, 0, 1)[None, None, None, :, None,
                                            :, None]
        key_mask = jnp.moveaxis(mw, 1, 3)  # (B, X, Y, L, T)
        sim = jnp.where(
            key_mask[:, :, :, None, None, None, :, :] > 0, sim, -1e9
        )
        flat = sim.reshape(*sim.shape[:-2], l * t_tok)
        attn = jax.nn.softmax(
            flat.reshape(b, nx, ny, heads, l * t_tok, l * t_tok), axis=-1
        ).reshape(sim.shape)
        out = jnp.einsum("bxyhitjs,bjxyshd->bixythd", attn, vh,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, l, nx, ny, t_tok, heads * d)
        out = _window_merge(out, win, self.style, h, w)
        return nn.Dense(self.dim)(out)


class SwapFusionEncoder(nn.Module):
    dim: int
    depth: int = 1
    window: int = 8
    dim_head: int = 32
    discrete_ratio: float = 0.4
    downsample_rate: float = 4.0

    @nn.compact
    def __call__(self, x, mode, pairwise, agent_mask):
        b, l, h, w, c = x.shape
        t = pairwise[:, :, 0]  # j -> ego
        x = warp_bev_nhwc(x, t, self.discrete_ratio, self.downsample_rate)
        mask = roi_and_agent_mask(
            b, l, h, w, agent_mask, t, self.discrete_ratio,
            self.downsample_rate,
        )[..., 0, :]  # (B, H, W, L)
        mask = jnp.moveaxis(mask, -1, 1)  # (B, L, H, W)

        for _ in range(self.depth):
            for style in ("local", "grid"):
                a = SwapAttention(self.dim, self.dim_head, self.window,
                                  style)(nn.LayerNorm()(x), mask)
                x = x + a * mask[..., None]
                ff = nn.Dense(self.dim)(
                    nn.gelu(nn.Dense(2 * self.dim)(nn.LayerNorm()(x)))
                )
                x = x + ff

        wsum = mask[..., None].sum(axis=1)
        fused = (x * mask[..., None]).sum(axis=1) / jnp.clip(wsum, 1.0, None)
        return fused
