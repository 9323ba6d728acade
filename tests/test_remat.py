"""Gradient checkpointing (cfg ``remat: true``) must be a pure
memory/FLOP trade: identical param tree, identical training outputs,
identical gradients vs the un-rematted model.  jax.checkpoint is the
TPU-native replacement for the reference's fit-it-with-AMP-and-DDP
training memory strategy (opencood/tools/train_camera.py:143-197)."""
import copy

import jax
import jax.numpy as jnp
import numpy as np

from hmvit_tpu.data.synthetic import make_hetero_batch
from hmvit_tpu.models.hmvit import HMViT
from tiny_cfg import RANGE, TINY_CFG
import pytest

pytestmark = pytest.mark.compile  # compile-heavy: full lane only


def _tree_paths(t):
    return {jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_flatten_with_path(t)[0]}


def test_remat_is_numerically_transparent():
    batch, _ = make_hetero_batch(seed=3, batch_size=1, max_cav=3,
                                 num_agents=2, max_points=512,
                                 image_size=32, num_cams=2,
                                 lidar_range=RANGE)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    cfg_plain = copy.deepcopy(TINY_CFG)
    cfg_remat = copy.deepcopy(TINY_CFG)
    cfg_remat["remat"] = True

    plain = HMViT(cfg_plain)
    remat = HMViT(cfg_remat)
    v_plain = plain.init(jax.random.key(0), jb, train=True)
    v_remat = remat.init(jax.random.key(0), jb, train=True)

    # remat must not move any parameter's path or shape
    assert _tree_paths(v_plain) == _tree_paths(v_remat)
    chex_eq = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        v_plain, v_remat)
    del chex_eq

    def loss(model, variables):
        def f(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                jb, train=True, mutable=["batch_stats"])
            return (jnp.mean(out["psm"].astype(jnp.float32) ** 2)
                    + jnp.mean(out["rm"].astype(jnp.float32) ** 2))

        return jax.value_and_grad(f)(variables["params"])

    l_plain, g_plain = jax.jit(lambda v: loss(plain, v))(v_plain)
    l_remat, g_remat = jax.jit(lambda v: loss(remat, v))(v_remat)

    np.testing.assert_allclose(float(l_plain), float(l_remat), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        g_plain, g_remat)
