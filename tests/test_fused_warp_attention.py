"""Fused warp+attention kernel (ops/fused_warp_attention.py) vs the
split pair it replaces — pallas_pair_warp -> stripe_window_attention —
and vs the pure-XLA oracle, in interpret mode.

The fused kernel must be NUMERICALLY IDENTICAL to the split Pallas
path (same op order, same dtypes; this is the bit-exactness contract
VERDICT r3 #3 asks for) and match the XLA oracle to fp tolerance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmvit_tpu.ops.fused_warp import pallas_pair_warp
from hmvit_tpu.ops.fused_warp_attention import (
    fused_warp_window_attention,
    warp_window_attention,
    warp_window_attention_xla,
)
from hmvit_tpu.ops.window_attention import stripe_window_attention
from test_fused_warp import rigid_pairwise

pytestmark = pytest.mark.compile  # compile-heavy: full lane only

B, L, H, W = 1, 3, 64, 64
HEADS, D = 2, 16
C = HEADS * D
WIN = 8
T = WIN * WIN


def _inputs(seed, r=L, dtype=np.float32, max_t=6.0):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(B, 2, L, H, W, 2 * C)).astype(dtype)
    pair = rigid_pairwise(rng, max_t=max_t)
    mode = rng.integers(0, 2, (B, L))
    q = rng.normal(size=(B * r, H, W, C)).astype(dtype)
    mask = (rng.uniform(size=(B * r, L, H, W)) > 0.2).astype(dtype)
    bias = rng.normal(size=(HEADS, T, T)).astype(dtype) * 0.1
    return (jnp.asarray(q), jnp.asarray(src), jnp.asarray(pair),
            jnp.asarray(mode), jnp.asarray(mask), jnp.asarray(bias))


def _split_path(q, src, pair, mode, mask, bias, r=None):
    kv_pair = pallas_pair_warp(src, pair, mode, 1.0, 1.0, interpret=True,
                               num_receivers=r)
    n = kv_pair.shape[0] * kv_pair.shape[1]
    return stripe_window_attention(
        q, kv_pair.reshape(n, L, H, W, 2 * C), bias, mask,
        win=WIN, heads=HEADS, dim_head=D, interpret=True)


@pytest.mark.parametrize("seed,max_t", [(0, 5.0), (1, 20.0)])
def test_fused_matches_split_pallas_bitexact(seed, max_t):
    q, src, pair, mode, mask, bias = _inputs(seed, max_t=max_t)
    want = np.asarray(_split_path(q, src, pair, mode, mask, bias))
    got = np.asarray(warp_window_attention(
        q, src, pair, mode, mask, bias, WIN, HEADS, D, 1.0, 1.0,
        interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fused_matches_split_pallas_bf16_bitexact():
    q, src, pair, mode, mask, bias = _inputs(2)
    q, src, bias = (q.astype(jnp.bfloat16), src.astype(jnp.bfloat16),
                    bias.astype(jnp.bfloat16))
    mask = mask.astype(jnp.bfloat16)
    want = np.asarray(_split_path(q, src, pair, mode, mask, bias)
                      .astype(jnp.float32))
    got = np.asarray(warp_window_attention(
        q, src, pair, mode, mask, bias, WIN, HEADS, D, 1.0, 1.0,
        interpret=True).astype(jnp.float32))
    np.testing.assert_array_equal(got, want)


def test_fused_matches_xla_oracle():
    q, src, pair, mode, mask, bias = _inputs(3)
    want = np.asarray(warp_window_attention_xla(
        q, src, pair, mode, mask, bias, WIN, HEADS, D, 1.0, 1.0))
    got = np.asarray(warp_window_attention(
        q, src, pair, mode, mask, bias, WIN, HEADS, D, 1.0, 1.0,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_fused_receiver_subset_matches_full_first_row():
    """num_receivers=1 (ego-only final phase)."""
    q, src, pair, mode, mask, bias = _inputs(4)
    full = np.asarray(warp_window_attention(
        q, src, pair, mode, mask, bias, WIN, HEADS, D, 1.0, 1.0,
        interpret=True))
    ego = np.asarray(warp_window_attention(
        q[:1], src, pair, mode, mask[:1], bias, WIN, HEADS, D, 1.0, 1.0,
        num_receivers=1, interpret=True))
    assert ego.shape == (1, H, W, C)
    np.testing.assert_allclose(ego[0], full[0], atol=1e-5)


def test_fused_backward_matches_oracle_grads():
    """custom-vjp recompute path: grads for q, src, bias match the
    differentiated XLA oracle."""
    q, src, pair, mode, mask, bias = _inputs(5, max_t=3.0)

    def loss_fused(q_, s_, b_):
        # interpret-mode forward via the public custom-vjp wrapper's
        # internals: forward value is irrelevant to the bwd (recompute),
        # so drive the vjp directly off the oracle-consistent forward
        out = warp_window_attention_xla(
            q_, s_, pair, mode, mask, b_, WIN, HEADS, D, 1.0, 1.0)
        return jnp.sum(out * out)

    g_want = jax.grad(loss_fused, argnums=(0, 1, 2))(q, src, bias)

    from hmvit_tpu.ops.fused_warp_attention import _fwwa_bwd

    # residuals exactly as _fwwa_fwd stores them (the fwd itself would
    # run the TPU kernel; on CPU we drive the bwd directly)
    res = (q, src, pair, mode, mask, bias)
    # d(sum(out^2)) cotangent seeded from the oracle-equal forward
    fwd_oracle = warp_window_attention_xla(
        q, src, pair, mode, mask, bias, WIN, HEADS, D, 1.0, 1.0)
    g = 2.0 * fwd_oracle
    gq, gs, _, _, gm, gb = _fwwa_bwd(WIN, HEADS, D, 1.0, 1.0, None,
                                     res, g)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(g_want[0]),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(g_want[1]),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(g_want[2]),
                               atol=2e-3, rtol=2e-3)
    assert float(jnp.abs(gm).max()) == 0.0
