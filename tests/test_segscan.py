"""Fused one-pass segmented max-scan kernel vs the XLA log-shift oracle
(ops/voxelize.py::segmented_scan), interpret mode on CPU."""
import jax.numpy as jnp
import numpy as np

from hmvit_tpu.ops.segscan import fused_segmented_max_scan
from hmvit_tpu.ops.voxelize import segmented_scan


def _oracle(vals, seg, steps):
    return np.asarray(segmented_scan(
        jnp.asarray(vals), jnp.asarray(seg), steps, jnp.maximum,
        jnp.asarray(-jnp.inf, jnp.float32)))


def _last_of_run_mask(seg):
    nxt = np.concatenate([seg[1:], [np.iinfo(np.int32).min]])
    return seg != nxt


def test_matches_oracle_random_runs():
    rng = np.random.default_rng(0)
    p, c, block = 1024, 8, 128
    # sorted ids with runs of length 1..32, including -1 dropped runs
    seg = []
    cur = 0
    while len(seg) < p:
        run = int(rng.integers(1, 33))
        val = -1 if rng.random() < 0.2 else cur
        seg.extend([val] * run)
        cur += int(rng.integers(1, 3))
    seg = np.asarray(seg[:p], np.int32)
    seg = np.sort(seg) if False else seg  # runs are already grouped
    vals = rng.normal(size=(p, c)).astype(np.float32)

    got = np.asarray(fused_segmented_max_scan(
        jnp.asarray(vals), jnp.asarray(seg), steps=5, block_rows=block,
        interpret=True))
    want = _oracle(vals, seg, 5)
    # only last-of-run rows are consumed downstream; -1 runs are
    # dropped-point garbage in both implementations
    mask = _last_of_run_mask(seg) & (seg >= 0)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-6)


def test_run_straddles_block_boundary():
    p, c, block = 256, 4, 64
    seg = np.zeros(p, np.int32)
    # a 32-long run crossing the first block boundary at row 64
    seg[:48] = 0
    seg[48:80] = 1
    seg[80:] = np.repeat(np.arange(2, 2 + (p - 80) // 8), 8)[:p - 80]
    rng = np.random.default_rng(1)
    vals = rng.normal(size=(p, c)).astype(np.float32)

    got = np.asarray(fused_segmented_max_scan(
        jnp.asarray(vals), jnp.asarray(seg), steps=5, block_rows=block,
        interpret=True))
    mask = _last_of_run_mask(seg)
    want = _oracle(vals, seg, 5)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-6)
    # explicit check of the straddling run's reduction
    np.testing.assert_allclose(got[79], vals[48:80].max(axis=0),
                               rtol=1e-6)


def test_single_giant_padding_run_is_isolated():
    """Real pillar runs are capped at 32; only the -1 (dropped) id can
    exceed 2**steps — downstream never reads it, but neighbours must
    stay exact."""
    p, c, block = 512, 4, 128
    seg = np.full(p, -1, np.int32)
    seg[:16] = 3
    seg[-8:] = 7
    rng = np.random.default_rng(2)
    vals = rng.normal(size=(p, c)).astype(np.float32)
    got = np.asarray(fused_segmented_max_scan(
        jnp.asarray(vals), jnp.asarray(seg), steps=5, block_rows=block,
        interpret=True))
    np.testing.assert_allclose(got[15], vals[:16].max(axis=0), rtol=1e-6)
    np.testing.assert_allclose(got[-1], vals[-8:].max(axis=0), rtol=1e-6)
