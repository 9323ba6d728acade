"""ResNet image backbones (flax, NHWC) with multi-scale outputs.

Capability-equivalent of the reference's torchvision-based encoders
(reference: opencood/models/backbones/resnet_ms.py:9-126 — ResNet 18/34/50
with an ``id_pick`` multi-scale selection).  ``ResNetEncoder`` returns the
feature map after the requested stage (stride 4/8/16/32) or a list of
stages.
"""
from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    torch_padding: bool = False  # see Bottleneck

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (((1, 1), (1, 1)) if self.torch_padding and self.stride > 1
               else "SAME")
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=pad, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    # torch pads stride-2 3x3 convs (1, 1); XLA 'SAME' pads (0, 1) at
    # even sizes — same output shape, half-pixel alignment difference.
    # The checkpoint-import twins (bevformer_ref) need the torch grid.
    torch_padding: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (((1, 1), (1, 1)) if self.torch_padding and self.stride > 1
               else "SAME")
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=pad, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9)(residual)
        return nn.relu(y + residual)


_ARCH = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
}


class ResNetEncoder(nn.Module):
    """(N, H, W, 3) -> feature(s) at stride 4/8/16/32.

    id_pick: stage indices to return (1-4); a single index returns one
    array, several return a list (resnet_ms semantics)."""
    arch: str = "resnet34"
    id_pick: Sequence[int] = (3,)
    # torch-exact stem/stride-2 padding for the checkpoint-import twins
    # (conv1 pads (3, 3), maxpool (1, 1), block stride-2 convs (1, 1));
    # default False keeps the established XLA-'SAME' numerics.
    torch_padding: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layout = _ARCH[self.arch]
        x = nn.Conv(64, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)) if self.torch_padding
                    else "SAME",
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        if self.torch_padding:
            # torch MaxPool2d(3, 2, padding=1): symmetric -inf padding
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        outs = []
        features = 64
        for stage, n_blocks in enumerate(layout):
            stride = 1 if stage == 0 else 2
            for i in range(n_blocks):
                x = block(features, stride if i == 0 else 1,
                          torch_padding=self.torch_padding)(x, train)
            outs.append(x)
            features *= 2

        picked = [outs[i - 1] for i in self.id_pick]
        return picked[0] if len(picked) == 1 else picked


class FPN(nn.Module):
    """Top-down feature pyramid: lateral 1x1 projections, nearest
    upsample + add, 3x3 smoothing (the mmdet FPN the reference's
    BEVFormer camera branch runs on ResNet50 outputs, reference:
    opencood/hypes_yaml/opcl/subbevformer_resnet.py:32-41).

    Input: multi-scale feature list ordered fine -> coarse (ResNet
    id_pick order).  Returns the list of pyramid levels in the same
    order; callers that feed a single-level consumer take ``[0]`` (the
    finest level, enriched by every coarser stage)."""
    out_channels: int = 256

    @nn.compact
    def __call__(self, feats, train: bool = False):
        lats = [nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}")(f)
                for i, f in enumerate(feats)]
        tops = [lats[-1]]
        for lat in lats[-2::-1]:
            up = jax.image.resize(tops[-1], lat.shape, "nearest")
            tops.append(lat + up)
        tops = tops[::-1]  # fine -> coarse
        return [nn.Conv(self.out_channels, (3, 3), name=f"smooth{i}")(t)
                for i, t in enumerate(tops)]
