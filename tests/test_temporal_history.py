"""BEVFormer temporal history (two-slot BEV queue).

The reference's TemporalSelfAttention (mmdet3d_plugin/bevformer/modules/
temporal_self_attention.py:130-274) attends over a stacked
[prev_bev, current] value queue with per-slot offset/weight parameters
conditioned on concat([prev, query]), averaging the two slot outputs;
without history both slots hold the current map
(``value = torch.stack([query, query])``).  mmcv is absent in this
environment, so (like the rest of the deformable plugin twin) this is
covered behaviorally rather than by weight-copy golden test:

- the no-history branch must equal explicitly passing the current map
  as history (the reference's exact degenerate case);
- real history must change the output (the queue is actually read);
- frame-chaining through ``return_history`` must be shape-stable.
"""
import jax
import jax.numpy as jnp
import numpy as np

from hmvit_tpu.models.bevformer import (
    BEVFormerEncoder,
    DeformableSelfAttention,
)

from test_planar_lift import pinhole
import pytest


def test_no_history_equals_self_queue():
    """prev_2d=None must reproduce the reference's history-free branch:
    the current map filling both queue slots."""
    rng = np.random.default_rng(0)
    n, hw, c = 2, 8, 16
    q = hw * hw
    query = jnp.asarray(rng.normal(size=(n, q, c)).astype(np.float32))
    bev_2d = query.reshape(n, hw, hw, c)
    ii, jj = np.meshgrid(np.arange(hw), np.arange(hw), indexing="ij")
    ref_xy = jnp.asarray(
        np.stack([jj, ii], -1).reshape(q, 2).astype(np.float32))

    mod = DeformableSelfAttention(dim=c, heads=2, points=2)
    params = mod.init(jax.random.key(0), query, bev_2d, ref_xy)
    out_none = mod.apply(params, query, bev_2d, ref_xy)
    out_self = mod.apply(params, query, bev_2d, ref_xy, prev_2d=bev_2d)
    np.testing.assert_array_equal(np.asarray(out_none),
                                  np.asarray(out_self))

    # a genuinely different history must flow into the output
    prev = jnp.asarray(rng.normal(size=bev_2d.shape).astype(np.float32))
    out_hist = mod.apply(params, query, bev_2d, ref_xy, prev_2d=prev)
    assert np.abs(np.asarray(out_hist - out_none)).max() > 1e-6


@pytest.mark.compile
def test_encoder_frame_chaining():
    """Video-style chaining: frame t's history feeds frame t+1, the
    reference's forward_test prev_frame_info protocol."""
    rng = np.random.default_rng(1)
    imgs0 = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 3))
                        .astype(np.float32))
    imgs1 = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 3))
                        .astype(np.float32))
    k, ext = pinhole(32)
    intr = jnp.asarray(np.stack([k, k])[None])
    extr = jnp.asarray(np.stack([ext, ext])[None])

    cfg = {"encoder": "bevformer", "lift": "deformable", "dim": 16,
           "bev_size": 8, "out_dim": 24, "num_layers": 2, "heads": 2,
           "window": 4, "decoder_layers": 0,
           "encoder_channels": [8, 8, 16, 16], "return_history": True}
    mod = BEVFormerEncoder(cfg)
    v = mod.init(jax.random.key(0), imgs0, intr, extr, train=False)

    out0, hist0 = mod.apply(v, imgs0, intr, extr, train=False)
    assert hist0.shape == (1, 8, 8, 16)
    out1, hist1 = mod.apply(v, imgs1, intr, extr, train=False,
                            prev_bev=hist0)
    assert out1.shape == out0.shape and hist1.shape == hist0.shape
    assert np.isfinite(np.asarray(out1)).all()

    # history must matter: same frame with vs without history differs
    out1_nohist, _ = mod.apply(v, imgs1, intr, extr, train=False)
    assert np.abs(np.asarray(out1 - out1_nohist)).max() > 1e-6

    # flat (N, Q, C) history (the reference's layout) is accepted too
    out1_flat, _ = mod.apply(v, imgs1, intr, extr, train=False,
                             prev_bev=hist0.reshape(1, 64, 16))
    np.testing.assert_array_equal(np.asarray(out1_flat),
                                  np.asarray(out1))
