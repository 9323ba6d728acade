"""Pallas fused window attention vs the XLA oracle (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmvit_tpu.ops.window_attention import (
    hetero_window_attention,
    hetero_window_attention_xla,
    plain_window_attention,
    plain_window_attention_xla,
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


@pytest.mark.slow
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


def test_kernel_fully_masked_rows_emit_zero():
    """Rows whose every (sender, token) entry is masked — the
    exclude_self trap — must emit exactly zero, matching the XLA path."""
    q, k, v, w_att, w_msg, bias, mask = make_inputs(2)
    mask = mask.at[0, :, 1].set(0.0)  # window 1 of receiver 0: all masked
    got = np.asarray(
        hetero_window_attention(q, k, v, w_att, w_msg, bias, mask,
                                heads=HEADS, dim_head=D, interpret=True)
    )
    want = np.asarray(
        hetero_window_attention_xla(q, k, v, w_att, w_msg, bias, mask,
                                    heads=HEADS, dim_head=D)
    )
    assert np.all(got[0, 1] == 0.0)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_plain_kernel_matches_xla_oracle():
    q, k, v, _, _, bias, mask = make_inputs(3)
    want = np.asarray(
        plain_window_attention_xla(q, k, v, bias, mask,
                                   heads=HEADS, dim_head=D))
    got = np.asarray(
        plain_window_attention(q, jnp.concatenate([k, v], -1), bias,
                               mask, heads=HEADS, dim_head=D,
                               interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_plain_kernel_masked_rows_and_senders():
    q, k, v, _, _, bias, mask = make_inputs(4)
    mask = mask.at[:, 2].set(0.0)       # dead sender
    mask = mask.at[1, :, 0].set(0.0)    # fully-masked window
    got = np.asarray(
        plain_window_attention(
            q, jnp.concatenate([k.at[:, 2].set(777.0),
                                v.at[:, 2].set(777.0)], -1), bias, mask,
            heads=HEADS, dim_head=D, interpret=True))
    want = np.asarray(
        plain_window_attention_xla(q, k, v, bias, mask,
                                   heads=HEADS, dim_head=D))
    assert np.all(got[1, 0] == 0.0)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_plain_kernel_bf16():
    q, k, v, _, _, bias, mask = make_inputs(5)
    cast = lambda a: a.astype(jnp.bfloat16)  # noqa: E731
    want = np.asarray(
        plain_window_attention_xla(cast(q), cast(k), cast(v), cast(bias),
                                   cast(mask), heads=HEADS, dim_head=D)
    ).astype(np.float32)
    got = np.asarray(
        plain_window_attention(cast(q), jnp.concatenate(
            [cast(k), cast(v)], -1), cast(bias),
            cast(mask), heads=HEADS, dim_head=D,
            interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_stripe_kernel_matches_split_path():
    """The stripe kernel on unsplit (N, H, W, C) tensors must equal
    window-split -> plain kernel -> merge (local style), including
    masked senders."""
    from hmvit_tpu.ops.window_attention import stripe_window_attention

    rng = np.random.default_rng(9)
    n, j, h, w, c, win, heads = 2, 3, 16, 16, 64, 4, 4
    d = c // heads
    t = win * win
    q = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(n, j, h, w, 2 * c))
                     .astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(heads, t, t)).astype(np.float32))
    mask = jnp.asarray(
        (rng.uniform(size=(n, j, h, w)) > 0.2).astype(np.float32))

    got = np.asarray(stripe_window_attention(
        q, kv, bias, mask, win=win, heads=heads, dim_head=d,
        interpret=True))

    def split(z, ch):
        lead = z.shape[:-3]
        z2 = z.reshape(*lead, h // win, win, w // win, win, ch)
        z2 = jnp.moveaxis(z2, -3, -4)
        return z2.reshape(*lead, (h // win) * (w // win), t, ch)

    out = plain_window_attention_xla(
        split(q, c), split(kv, 2 * c)[..., :c],
        split(kv, 2 * c)[..., c:], bias, split(mask[..., None], 1)[..., 0],
        heads=heads, dim_head=d)
    out = out.reshape(n, h // win, w // win, win, win, c)
    want = np.asarray(jnp.moveaxis(out, -4, -3).reshape(n, h, w, c))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
