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
import jax.numpy as jnp
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


class _StemParam(nn.Module):
    """Holder so the s2d stem shares nn.Conv's exact param path
    (``Conv_0/kernel`` of shape (7, 7, 3, 64))."""

    @nn.compact
    def __call__(self, dtype):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 3, 64)).astype(dtype)


def _s2d_stem(x):
    """7x7/2 stem == 4x4/1 conv over 2x2-space-to-depth input.

    Identity (per axis, XLA-'SAME' (2, 3) padding):
      out[i] = sum_k K7[k] x[2i + k - 2]
             = sum_t sum_s K8[2t + s] X_s[i + t - 1],
    with K8 = K7 post-padded by one zero tap and X_s the parity-s
    strided slice — so the 4-tap conv needs padding (1, 2) and the s2d
    map is built from four strided slices (no 6D transpose; round-3's
    reshape-based s2d died on exactly that relayout, PERF.md)."""
    k7 = _StemParam(name="Conv_0")(x.dtype)
    k8 = jnp.pad(k7, ((0, 1), (0, 1), (0, 0), (0, 0)))
    # (8, 8, 3, 64) -> (4, sy, 4, sx, 3, 64) -> (4, 4, sy, sx, 3, 64)
    k4 = k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
    k4 = k4.reshape(4, 4, 12, 64)
    slices = [x[:, sy::2, sx::2, :]
              for sy in (0, 1) for sx in (0, 1)]
    xs = jnp.concatenate(slices, axis=-1)  # (N, H/2, W/2, 12)
    return jax.lax.conv_general_dilated(
        xs, k4, window_strides=(1, 1), padding=((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


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
    # space-to-depth stem: the IDENTICAL 7x7/2 convolution expressed as
    # a 4x4/1 conv over the 2x2-space-to-depth input (3 -> 12 input
    # channels), built from STRIDED SLICES rather than the 6D
    # reshape+transpose whose layout copy sank the round-3 attempt
    # (PERF.md).  Serving-only knob; the param tree (Conv_0/kernel,
    # (7,7,3,64)) is unchanged, so checkpoints are interchangeable.
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layout = _ARCH[self.arch]
        if self.stem_s2d and not self.torch_padding:
            x = _s2d_stem(x)
        else:
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
