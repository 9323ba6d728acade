"""V2X-ViT fusion: heterogeneous per-pixel agent attention + pyramid
window self-attention.

Capability-equivalent of the reference V2XTransformer stack (reference:
opencood/models/sub_modules/mwin_tranformer.py:18-226 and
base_transformer.py:258-398 HGTCavAttention): agents are warped to the ego
frame (STTF), then each block runs (a) HGT attention — every pixel
attends across the L agents with modality-typed relation weights — and
(b) pyramid window self-attention at several window sizes fused by a
radix SplitAttn.  Typed parameters are stacked and gathered exactly like
H3GAT; no Python loops over agents or types.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.warp import roi_and_agent_mask, warp_bev_nhwc
from ..hetero_fusion import SplitAttn, _window_merge, _window_split, \
    relative_position_index
from ..layers import (
    HeteroDense,
    HeteroFeedForward,
    HeteroLayerNorm,
    hetero_param_gather,
)


class HGTCavAttention(nn.Module):
    """Per-pixel typed attention across agents (window size 1)."""
    dim: int
    heads: int = 8
    num_types: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mode, mask, deterministic: bool = True):
        # x: (B, L, H, W, C); mask: (B, L, H, W) validity in ego frame
        b, l, h, w, c = x.shape
        d = self.dim // self.heads

        q = HeteroDense(self.dim, self.num_types, name="to_q")(x, mode)
        k = HeteroDense(self.dim, self.num_types, name="to_k")(x, mode)
        v = HeteroDense(self.dim, self.num_types, name="to_v")(x, mode)

        num_rel = self.num_types ** 2
        rel_att = self.param("relation_att",
                             nn.initializers.xavier_uniform(),
                             (num_rel, self.heads, d, d))
        rel_msg = self.param("relation_msg",
                             nn.initializers.xavier_uniform(),
                             (num_rel, self.heads, d, d))
        pair = mode[:, :, None] * self.num_types + mode[:, None, :]
        w_att = hetero_param_gather(rel_att, pair)  # (B, I, J, h, d, d)
        w_msg = hetero_param_gather(rel_msg, pair)

        def split(t):
            return t.reshape(b, l, h, w, self.heads, d)

        qh = split(q) * d ** -0.5
        kh, vh = split(k), split(v)

        q_rel = jnp.einsum("bihwnd,bijnde->bijhwne", qh, w_att,
                           preferred_element_type=jnp.float32)
        sim = jnp.einsum("bijhwne,bjhwne->bijhwn", q_rel, kh,
                         preferred_element_type=jnp.float32)
        # mask the SENDER axis J: (B, L, H, W) -> (B, 1, J, H, W, 1)
        sim = jnp.where(mask[:, None, :, :, :, None] > 0, sim, -1e9)
        attn = jax.nn.softmax(sim, axis=2)  # over sender J

        v_msg = jnp.einsum("bijnde,bjhwne->bijhwnd", w_msg, vh,
                           preferred_element_type=jnp.float32)
        out = jnp.einsum("bijhwn,bijhwnd->bihwnd", attn, v_msg,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, l, h, w, self.heads * d)
        out = HeteroDense(self.dim, self.num_types, name="to_out")(out, mode)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class WindowSelfAttention(nn.Module):
    """Per-agent windowed self-attention with relative position bias."""
    dim: int
    window: int
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        # x: (B, L, H, W, C)
        b, l, h, w, c = x.shape
        d = self.dim // self.heads
        win = self.window

        qkv = nn.Dense(3 * self.dim, use_bias=False)(x)
        # the kv 2C slice stays contiguous from the Dense output — the
        # fused kernel takes it concatenated (no separate K/V relayouts)
        qw = _window_split(qkv[..., :c], win, "local")
        kvw = _window_split(qkv[..., c:], win, "local")
        nx, ny, t = qw.shape[2], qw.shape[3], win * win

        table = self.param("rel_pos_bias", nn.initializers.normal(0.02),
                           ((2 * win - 1) ** 2, self.heads))
        bias = table[jnp.asarray(relative_position_index(win))]
        bias_h = bias.transpose(2, 0, 1)

        if jax.default_backend() == "tpu":
            # single-sender case of the fused H3GAT window kernel
            from ...ops.window_attention import (
                fused_plain_window_attention,
            )

            out = fused_plain_window_attention(
                (qw * d ** -0.5).reshape(b * l, nx * ny, t, c),
                kvw.reshape(b * l, 1, nx * ny, t, 2 * c),
                bias_h,
                jnp.ones((b * l, 1, nx * ny, t), qw.dtype),
                self.heads, d,
            ).reshape(b, l, nx, ny, t, c)
        else:
            def heads_split(z):
                return z.reshape(b, l, nx, ny, t, self.heads, d)

            qh = heads_split(qw) * d ** -0.5
            kh = heads_split(kvw[..., :c])
            vh = heads_split(kvw[..., c:])
            sim = jnp.einsum("blxyihd,blxyjhd->blxyhij", qh, kh,
                             preferred_element_type=jnp.float32)
            sim = sim + bias_h[None, None, None, None]
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("blxyhij,blxyjhd->blxyihd", attn, vh,
                             preferred_element_type=jnp.float32)
            out = out.reshape(b, l, nx, ny, t, self.heads * d)
        out = _window_merge(out, win, "local", h, w)
        return nn.Dense(self.dim)(out)


class PyramidWindowAttention(nn.Module):
    """Parallel window self-attentions at several sizes, SplitAttn-fused."""
    dim: int
    # reference v2xt pyramid: 3 window sizes (point_pillar_transformer.yaml:127)
    windows: tuple = (4, 8, 16)
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        branches = [
            WindowSelfAttention(self.dim, win, self.heads)(x)
            for win in self.windows
        ]
        if len(branches) == 1:
            return branches[0]
        return SplitAttn(self.dim)(branches)


class V2XTransformer(nn.Module):
    """Full V2X-ViT fusion block stack; returns the fused ego map.

    With ``prior_encoding`` (B, L, 3) = (velocity/30, time-delay frames,
    infra) the communication context becomes model input (reference:
    point_pillar_transformer.py:77-107 concatenates the channels;
    the v2xt hypes declare use_RTE which this fork's torch code drops —
    implemented here as intended):
      * the 3 channels are concatenated per pixel and projected back,
      * the time delay indexes a learned relative-temporal-encoding
        (RTE) embedding added per agent,
      * infrastructure agents form a THIRD node type for the HGT
        relation weights (type = 2), as in the V2X-ViT paper.
    """
    dim: int
    depth: int = 1
    heads: int = 8
    windows: tuple = (4, 8, 16)
    discrete_ratio: float = 0.4
    downsample_rate: float = 4.0
    max_delay: int = 10  # RTE table size (100 ms frames)

    @nn.compact
    def __call__(self, x, mode, pairwise, agent_mask,
                 deterministic: bool = True, prior_encoding=None,
                 spatial_correction=None):
        b, l, h, w, c = x.shape
        num_types = 2
        if prior_encoding is not None:
            # (v, dt, infra): concat + project, RTE delay embedding,
            # infra as the third HGT node type
            prior = jnp.broadcast_to(
                prior_encoding[:, :, None, None, :], (b, l, h, w, 3)
            ).astype(x.dtype)
            x = nn.Dense(self.dim, name="prior_proj")(
                jnp.concatenate([x, prior], axis=-1))
            rte = self.param("rte_embedding",
                             nn.initializers.normal(0.02),
                             (self.max_delay + 1, self.dim))
            dt = jnp.clip(prior_encoding[:, :, 1].astype(jnp.int32),
                          0, self.max_delay)
            x = x + rte[dt][:, :, None, None, :]
            is_infra = prior_encoding[:, :, 2] > 0.5
            mode = jnp.where(is_infra, 2, mode)
            num_types = 3

        # STTF: warp every agent into the ego frame once; with
        # cur_ego_pose_flag=False the loader's transforms stop at the
        # DELAYED ego pose and spatial_correction (delayed ego ->
        # current ego, reference mwin_tranformer.py:205-227) composes in
        t = pairwise[:, :, 0]
        if spatial_correction is not None:
            t = jnp.einsum("blij,bljk->blik",
                           spatial_correction.astype(t.dtype), t)
        x = warp_bev_nhwc(x, t, self.discrete_ratio, self.downsample_rate)
        mask = roi_and_agent_mask(
            b, l, h, w, agent_mask, t, self.discrete_ratio,
            self.downsample_rate,
        )[..., 0, :]  # (B, H, W, L)
        mask = jnp.moveaxis(mask, -1, 1)  # (B, L, H, W)

        for _ in range(self.depth):
            a = HGTCavAttention(self.dim, self.heads,
                                num_types=num_types)(
                HeteroLayerNorm(num_types=num_types)(x, mode), mode, mask,
                deterministic)
            x = x + a * mask[..., None]
            x = x + HeteroFeedForward(self.dim, num_types=num_types)(
                HeteroLayerNorm(num_types=num_types)(x, mode), mode,
                deterministic)
            x = x + PyramidWindowAttention(self.dim, self.windows,
                                           self.heads)(nn.LayerNorm()(x))
            ff = nn.Dense(self.dim)(
                nn.gelu(nn.Dense(2 * self.dim)(nn.LayerNorm()(x))))
            x = x + ff

        return x[:, 0]
