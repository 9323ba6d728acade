"""SwapFusion (CoBEVT FuseBEVT): masked local-window / global-grid
multi-agent self-attention.

Reference-faithful numerics (reference:
opencood/models/fusion_modules/swap_fusion_modules.py:13-286): agents
are first warped into the ego frame (the caller/STTF step the reference
performs upstream), then depth x [window attention over the joint
(agent x win^2) token set, FFN, grid attention, FFN] with exact
PreNormResidual semantics (fn(LN(x)) + x, base_transformer.py:101-108),
a THREE-axis (agent, h, w) relative position bias
(swap_fusion_modules.py:55-85), and the final mlp_head = mean over the
agent axis -> LayerNorm -> Linear (swap_fusion_modules.py:275-281).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.warp import roi_and_agent_mask, warp_bev_nhwc
from ..hetero_fusion import _window_merge, _window_split


def relative_position_index_3d(agents: int, win: int) -> np.ndarray:
    """(agents*win^2, agents*win^2) index into the
    (2*agents-1)(2*win-1)^2 relative-bias table, token order
    (agent, w1, w2) — reference swap_fusion_modules.py:63-83."""
    coords = np.stack(
        np.meshgrid(np.arange(agents), np.arange(win), np.arange(win),
                    indexing="ij")
    ).reshape(3, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += agents - 1
    rel[:, :, 1] += win - 1
    rel[:, :, 2] += win - 1
    rel[:, :, 0] *= (2 * win - 1) * (2 * win - 1)
    rel[:, :, 1] *= 2 * win - 1
    return rel.sum(-1)


class SwapAttention(nn.Module):
    """Joint attention over all agents' tokens inside each window."""
    dim: int
    dim_head: int = 32
    window: int = 8
    agent_size: int = 5
    style: str = "local"

    @nn.compact
    def __call__(self, x, mask):
        # x: (B, L, H, W, C); mask: (B, L, H, W) validity
        b, l, h, w, c = x.shape
        heads = self.dim // self.dim_head
        d = self.dim_head
        win = self.window

        qkv = nn.Dense(3 * self.dim, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def wsplit(t):
            return _window_split(t, win, self.style)

        qw, kw, vw = wsplit(q), wsplit(k), wsplit(v)
        mw = wsplit(mask[..., None])[..., 0]  # (B, L, X, Y, T)
        nx, ny, t_tok = qw.shape[2], qw.shape[3], win * win

        # joint (agent x window) token axis, agent-major like the
        # reference's '(l w1 w2)' rearrange
        def tokens(t):
            t = jnp.moveaxis(t, 1, 3)  # (B, X, Y, L, T, C)
            return t.reshape(b, nx, ny, l * t_tok, heads, d)

        qh = tokens(qw) * d ** -0.5
        kh, vh = tokens(kw), tokens(vw)

        sim = jnp.einsum("bxyihd,bxyjhd->bxyhij", qh, kh,
                         preferred_element_type=jnp.float32)
        table = self.param(
            "rel_pos_bias", nn.initializers.normal(0.02),
            ((2 * self.agent_size - 1) * (2 * win - 1) ** 2, heads))
        # agent-major token order means the leading l*t rows/cols of the
        # agent_size-sized index are exactly the l-agent sub-block
        idx = relative_position_index_3d(self.agent_size, win)
        idx = jnp.asarray(idx[: l * t_tok, : l * t_tok])
        sim = sim + table[idx].transpose(2, 0, 1)[None, None, None]

        key_mask = jnp.moveaxis(mw, 1, 3).reshape(b, nx, ny, l * t_tok)
        sim = jnp.where(key_mask[:, :, :, None, None, :] > 0, sim, -1e9)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bxyhij,bxyjhd->bxyihd", attn, vh,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, nx, ny, l, t_tok, heads * d)
        out = jnp.moveaxis(out, 3, 1)  # (B, L, X, Y, T, C)
        out = _window_merge(out, win, self.style, h, w)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


class SwapFusionEncoder(nn.Module):
    dim: int
    depth: int = 1
    window: int = 8
    dim_head: int = 32
    agent_size: int = 5
    mlp_dim: int | None = None
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
        mlp_dim = self.mlp_dim or 2 * self.dim

        for di in range(self.depth):
            for style in ("local", "grid"):
                p = f"{style}_{di}"
                # PreNormResidual(attention): fn(LN(x), mask) + x
                a = SwapAttention(self.dim, self.dim_head, self.window,
                                  agent_size=max(self.agent_size, l),
                                  style=style, name=f"attn_{p}")(
                    nn.LayerNorm(name=f"attn_norm_{p}")(x), mask)
                x = x + a
                # PreNormResidual(FeedForward)
                ff = nn.Dense(mlp_dim, name=f"ff_in_{p}")(
                    nn.LayerNorm(name=f"ff_norm_{p}")(x))
                # erf GELU (torch nn.GELU default), not the tanh approx
                ff = nn.Dense(self.dim, name=f"ff_out_{p}")(
                    nn.gelu(ff, approximate=False))
                x = x + ff

        # mlp_head: mean over agents -> LN -> Linear.  The reference
        # means over its (never-padded) full agent axis
        # (swap_fusion_modules.py:276); with padded slots present the
        # equivalent of "mean over the N real agents" is a masked mean.
        valid = agent_mask[:, :, None, None, None]
        fused = (x * valid).sum(axis=1) / jnp.clip(
            valid.sum(axis=1), 1.0, None)
        fused = nn.LayerNorm(name="head_norm")(fused)
        return nn.Dense(self.dim, name="head_linear")(fused)
