"""Shared flax building blocks.

All feature maps are NHWC (TPU-native layout).  BatchNorm uses eps=1e-3 /
momentum 0.99 (the flax equivalent of torch momentum 0.01), matching the
reference's conv stacks.

The hetero-typed primitives put the modality ("type") axis in front of the
parameter tensors and gather by the per-agent mode instead of routing rows
through per-type submodules in Python (reference:
opencood/models/base_transformer.py:138-192).  This removes all
data-dependent control flow: a whole hetero block traces to one XLA
program regardless of the camera/lidar mix.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False
    # OpenPCDet-style 1e-3 is the lidar-stack convention; the reference's
    # NaiveDecoder keeps torch's 1e-5 default (naive_decoder.py:46) —
    # checkpoint-import paths thread that through bn_eps
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        # explicit symmetric padding: for stride > 1, XLA 'SAME' pads
        # (0, 1) while the reference pads (1, 1) (ZeroPad2d before a
        # padding-0 conv, base_bev_backbone.py:40-45) — same output
        # size, half-pixel alignment difference.  Symmetric k//2 keeps
        # golden weight-copy parity with the torch stacks.
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    use_bias=self.use_bias)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         epsilon=self.bn_eps, momentum=0.99)(x)
        return nn.relu(x)


class NaiveDecoder(nn.Module):
    """Conv-BN-ReLU (xN) decoder with optional nearest x2 upsampling.

    Mirrors the reference decoder topology (reference:
    opencood/models/sub_modules/naive_decoder.py:28-92): for each level
    (walked coarse-to-fine) two conv-bn-relu blocks with the upsample after
    the first.
    """
    num_layer: int
    num_ch_dec: Sequence[int]
    use_upsample: bool = True
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layer - 1, -1, -1):
            ch = self.num_ch_dec[i]
            x = ConvBNReLU(ch, bn_eps=self.bn_eps)(x, train)
            if self.use_upsample:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            x = ConvBNReLU(ch, bn_eps=self.bn_eps)(x, train)
        return x


class NaiveCompressor(nn.Module):
    """Channel-bottleneck autoencoder simulating V2V bandwidth limits
    (reference: opencood/models/sub_modules/naive_compress.py:5-28)."""
    input_dim: int
    compress_ratio: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.input_dim // self.compress_ratio,
                       use_bias=True)(x, train)
        x = ConvBNReLU(self.input_dim, use_bias=True)(x, train)
        x = ConvBNReLU(self.input_dim, use_bias=True)(x, train)
        return x


class AutoEncoder(nn.Module):
    """Strided conv autoencoder compressor (reference:
    opencood/models/sub_modules/auto_encoder.py): spatial 4x squeeze +
    channel bottleneck, then transpose-conv reconstruction."""
    input_dim: int
    compress_ratio: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.input_dim // self.compress_ratio
        h = ConvBNReLU(ch, stride=2, use_bias=True)(x, train)
        h = ConvBNReLU(ch, stride=2, use_bias=True)(h, train)
        h = nn.ConvTranspose(ch, (2, 2), strides=(2, 2))(h)
        h = nn.relu(h)
        h = nn.ConvTranspose(self.input_dim, (2, 2), strides=(2, 2))(h)
        return nn.relu(h)


class DoubleConv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        # symmetric k//2 padding (not XLA SAME) to keep strided-conv
        # alignment identical to the reference's padding=1 torch convs
        # (downsample_conv.py:21-24) — see ConvBNReLU for the rationale
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)))(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3))(x)
        return nn.relu(x)


class DownsampleConv(nn.Module):
    """Shrink head: stacked strided DoubleConvs (reference:
    opencood/models/sub_modules/downsample_conv.py:34-55)."""
    kernel_sizes: Sequence[int]
    dims: Sequence[int]
    strides: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for k, d, s in zip(self.kernel_sizes, self.dims, self.strides):
            x = DoubleConv(d, kernel=k, stride=s)(x)
        return x


class DetectionHead(nn.Module):
    """1x1 conv anchor heads -> (psm, rm).

    The classification bias starts at the focal-loss prior
    (-log((1-p)/p), p=0.01) so early training isn't dominated by the
    sea of negatives."""
    anchor_number: int
    prior_prob: float = 0.01

    @nn.compact
    def __call__(self, x):
        import math

        bias_init = nn.initializers.constant(
            -math.log((1.0 - self.prior_prob) / self.prior_prob))
        psm = nn.Conv(self.anchor_number, (1, 1),
                      bias_init=bias_init)(x)
        rm = nn.Conv(7 * self.anchor_number, (1, 1))(x)
        return psm, rm


class MaskedBatchNorm(nn.Module):
    """BatchNorm over a point axis where only masked rows are real.

    Statistics are computed over valid entries only (the reference's PFN
    BatchNorm1d includes zero padding in its stats; masked stats are the
    mathematically-correct equivalent for our dense pillar path)."""
    epsilon: float = 1e-3
    momentum: float = 0.99

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        # x: (..., C); mask broadcastable to x[..., 0]
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            m = mask[..., None].astype(x.dtype)
            denom = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axis=tuple(range(x.ndim - 1))) / denom
            var = (((x - mean) ** 2) * m).sum(
                axis=tuple(range(x.ndim - 1))
            ) / denom
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


def hetero_param_gather(params, mode):
    """Gather per-type parameters by agent mode.

    params: (T, ...) stacked weights; mode: (B, L) int in [0, T).
    Returns (B, L, ...)."""
    return jnp.take(params, mode, axis=0)


class HeteroDense(nn.Module):
    """Per-modality Dense.

    x: (B, L, ..., din), mode: (B, L) -> (B, L, ..., dout).

    Computed as ONE big matmul against all type kernels concatenated on
    the output axis, then a per-agent type selection.  The gathered
    per-agent-weight formulation tiles as thousands of tiny batched
    matmuls on the MXU (~5% utilization); computing both types costs 2x
    the FLOPs at ~25x the throughput and is numerically identical."""
    features: int
    num_types: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, mode, static_modes: tuple | None = None,
                 return_params: bool = False):
        """static_modes: optional per-agent type layout known at TRACE
        time (serving buckets fix the fleet's modality mix).  With it,
        each agent's rows hit only its own type's kernel — half the
        projection FLOPs of the compute-both-and-select default, still
        one large MXU matmul per agent (identical numerics, tested).

        return_params: declare and return ``(kernel, bias)`` without
        computing — lets a caller fold these weights with another linear
        map (e.g. the H3GAT relation transforms) into one combined
        projection while the parameter tree/naming stays identical.
        ``x`` only supplies the input width."""
        din = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32,
                -1.0 / jnp.sqrt(din), 1.0 / jnp.sqrt(din)),
            (self.num_types, din, self.features),
        )
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.num_types, self.features))
                if self.use_bias else None)

        if return_params:
            return kernel, bias

        if static_modes is not None:
            assert len(static_modes) == x.shape[1], (
                f"static_modes {static_modes} vs L={x.shape[1]}")
            kt = kernel.astype(x.dtype)
            y = jnp.stack([x[:, i] @ kt[int(m)]
                           for i, m in enumerate(static_modes)], axis=1)
            if bias is not None:
                b = bias[jnp.asarray(static_modes)].astype(x.dtype)
                y = y + b.reshape(1, len(static_modes),
                                  *(1,) * (x.ndim - 3), self.features)
            return y

        k2d = jnp.swapaxes(kernel, 0, 1).reshape(
            din, self.num_types * self.features).astype(x.dtype)
        y_all = x @ k2d  # (B, L, ..., T*O)
        y_all = y_all.reshape(*y_all.shape[:-1], self.num_types,
                              self.features)
        sel = jax.nn.one_hot(mode, self.num_types, dtype=x.dtype)
        sel = sel.reshape(*mode.shape, *(1,) * (x.ndim - 3),
                          self.num_types, 1)
        y = (y_all * sel).sum(axis=-2)
        if self.use_bias:
            b = hetero_param_gather(bias, mode).astype(x.dtype)  # (B,L,O)
            y = y + b.reshape(b.shape[0], b.shape[1],
                              *(1,) * (y.ndim - 3), self.features)
        return y


class HeteroLayerNorm(nn.Module):
    """LayerNorm with per-modality scale/bias (stacked + gathered)."""
    num_types: int = 2

    @nn.compact
    def __call__(self, x, mode):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones,
                           (self.num_types, c))
        bias = self.param("bias", nn.initializers.zeros, (self.num_types, c))
        # single-pass moments (flax LayerNorm's use_fast_variance
        # default): E[x^2] - E[x]^2 reads the (B, L, H, W, C) fp32
        # residual once instead of twice — the two-pass form cost
        # ~0.3 ms/phase in reduce_sum at production scale.  fp32
        # accumulation keeps the cancellation error ~1e-5 relative.
        mean = x.mean(axis=-1, keepdims=True)
        var = jnp.maximum(
            (x * x).mean(axis=-1, keepdims=True) - mean * mean, 0.0)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        s = hetero_param_gather(scale, mode)
        b = hetero_param_gather(bias, mode)
        shape = (*mode.shape, *(1,) * (x.ndim - 3), c)
        return y * s.reshape(shape) + b.reshape(shape)


class HeteroFeedForward(nn.Module):
    """Dense-GELU-Dense with per-modality weights."""
    hidden_dim: int
    out_dim: int | None = None
    num_types: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mode, deterministic: bool = True,
                 static_modes: tuple | None = None):
        out_dim = self.out_dim if self.out_dim is not None else x.shape[-1]
        h = HeteroDense(self.hidden_dim, self.num_types)(x, mode,
                                                         static_modes)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = HeteroDense(out_dim, self.num_types)(h, mode, static_modes)
        return nn.Dropout(self.dropout, deterministic=deterministic)(h)
