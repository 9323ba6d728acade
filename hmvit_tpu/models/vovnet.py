"""VoVNet image backbone (One-Shot Aggregation), flax/NHWC.

Capability twin of the reference's mmdet3d plugin backbone (reference:
opencood/models/mmdet3d_plugin/models/backbones/vovnet.py, 374 LoC):
each OSA module runs a chain of 3x3 convs and concatenates ALL
intermediate outputs once, followed by a 1x1 aggregation; stages
downsample by max-pool.  V2-style identity residual + eSE channel
attention included.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

# arch: (stage channels, concat-out channels, convs per OSA, OSA blocks)
_ARCHS = {
    "vovnet-19": ([64, 80, 96, 112], [112, 256, 384, 512], 3,
                  [1, 1, 1, 1]),
    "vovnet-39": ([128, 160, 192, 224], [256, 512, 768, 1024], 5,
                  [1, 1, 2, 2]),
    "vovnet-57": ([128, 160, 192, 224], [256, 512, 768, 1024], 5,
                  [1, 1, 4, 3]),
}


class _ConvBN(nn.Module):
    ch: int
    k: int = 3

    @nn.compact
    def __call__(self, x, train):
        x = nn.Conv(self.ch, (self.k, self.k), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class _ESE(nn.Module):
    """Effective squeeze-excite (per-channel gate from GAP)."""

    @nn.compact
    def __call__(self, x):
        gap = x.mean(axis=(1, 2), keepdims=True)
        gate = nn.Conv(x.shape[-1], (1, 1))(gap)
        return x * nn.sigmoid(gate)


class _OSA(nn.Module):
    stage_ch: int
    concat_ch: int
    n_convs: int
    identity: bool = False

    @nn.compact
    def __call__(self, x, train):
        outs = [x]
        h = x
        for _ in range(self.n_convs):
            h = _ConvBN(self.stage_ch)(h, train)
            outs.append(h)
        cat = jnp.concatenate(outs, axis=-1)
        out = _ConvBN(self.concat_ch, k=1)(cat, train)
        out = _ESE()(out)
        if self.identity and x.shape[-1] == out.shape[-1]:
            out = out + x
        return out


class VoVNet(nn.Module):
    """(N, H, W, 3) -> feature(s) at stride 4/8/16/32 (id_pick like
    ResNetEncoder: stage indices 1-4)."""
    arch: str = "vovnet-39"
    id_pick: Sequence[int] = (3,)

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage_ch, concat_ch, n_convs, blocks = _ARCHS[self.arch]
        # stem: 3 convs, stride 2 then 1 then 2 (stride 4 total)
        x = nn.Conv(64, (3, 3), strides=(2, 2), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = _ConvBN(64)(x, train)
        x = nn.Conv(128, (3, 3), strides=(2, 2), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)

        outs = []
        for stage in range(4):
            if stage > 0:
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding="SAME")
            for b in range(blocks[stage]):
                x = _OSA(stage_ch[stage], concat_ch[stage], n_convs,
                         identity=b > 0)(x, train)
            outs.append(x)

        picked = [outs[i - 1] for i in self.id_pick]
        return picked[0] if len(picked) == 1 else picked
