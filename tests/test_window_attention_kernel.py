"""Pallas fused window attention vs the XLA oracle (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from hmvit_tpu.ops.window_attention import (
    hetero_window_attention,
    hetero_window_attention_xla,
)

N, J, W, T, HEADS, D = 2, 3, 4, 16, 4, 8
C = HEADS * D


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(N, W, T, C)).astype(np.float32)
    k = rng.normal(size=(N, J, W, T, C)).astype(np.float32)
    v = rng.normal(size=(N, J, W, T, C)).astype(np.float32)
    w_att = (rng.normal(size=(N, J, HEADS, D, D)) * 0.2).astype(np.float32)
    w_msg = (rng.normal(size=(N, J, HEADS, D, D)) * 0.2).astype(np.float32)
    bias = (rng.normal(size=(HEADS, T, T)) * 0.1).astype(np.float32)
    mask = (rng.uniform(size=(N, J, W, T)) > 0.2).astype(np.float32)
    mask[:, 0] = 1.0  # receiver's own tokens always valid
    return tuple(map(jnp.asarray, (q, k, v, w_att, w_msg, bias, mask)))


def test_kernel_matches_xla_oracle():
    args = make_inputs()
    want = np.asarray(
        hetero_window_attention_xla(*args, heads=HEADS, dim_head=D)
    )
    got = np.asarray(
        hetero_window_attention(*args, heads=HEADS, dim_head=D,
                                interpret=True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_kernel_fully_masked_sender():
    q, k, v, w_att, w_msg, bias, mask = make_inputs(1)
    mask = mask.at[:, 2].set(0.0)  # sender 2 entirely invalid
    base = np.asarray(
        hetero_window_attention(q, k, v, w_att, w_msg, bias, mask,
                                heads=HEADS, dim_head=D, interpret=True)
    )
    poisoned = np.asarray(
        hetero_window_attention(q, k.at[:, 2].set(999.0),
                                v.at[:, 2].set(999.0), w_att, w_msg, bias,
                                mask, heads=HEADS, dim_head=D,
                                interpret=True)
    )
    np.testing.assert_allclose(base, poisoned, atol=1e-5)
    assert np.all(np.isfinite(base))
