"""Camera->BEV encoders: CVT, FAX, BEVFormer — shapes, grads, registry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

N, M, IMG = 2, 4, 64
CFGS = {
    "cvt": {"encoder": "cvt", "dim": 32, "bev_size": 8, "out_dim": 48,
            "num_blocks": 1, "decoder_layers": 1,
            "encoder_channels": (16, 16, 32, 32)},
    "fax": {"encoder": "fax", "dim": 32, "bev_size": 8, "out_dim": 48,
            "bev_window": 4, "depth": 1, "decoder_layers": 1,
            "heads": 2, "dim_head": 16,
            "encoder_channels": (16, 16, 32, 32)},
    "bevformer": {"encoder": "bevformer", "dim": 32, "bev_size": 8,
                  "out_dim": 48, "num_layers": 2, "heads": 2,
                  "decoder_layers": 1, "bev_range": 20.0,
                  "encoder_channels": (16, 16, 32, 32)},
}


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(N, M, IMG, IMG, 3)).astype(np.float32)
    intr = np.tile(np.eye(3, dtype=np.float32), (N, M, 1, 1))
    intr[..., 0, 0] = intr[..., 1, 1] = 40.0
    intr[..., :2, 2] = IMG / 2
    extr = np.tile(np.eye(4, dtype=np.float32), (N, M, 1, 1))
    for mi in range(M):
        a = np.radians(90.0 * mi)
        extr[:, mi, 0, 0] = np.cos(a)
        extr[:, mi, 0, 1] = -np.sin(a)
        extr[:, mi, 1, 0] = np.sin(a)
        extr[:, mi, 1, 1] = np.cos(a)
    return (jnp.asarray(images), jnp.asarray(intr), jnp.asarray(extr))


@pytest.mark.parametrize("kind", ["cvt", "fax", "bevformer"])
def test_encoder_shapes_and_grads(kind):
    from hmvit_tpu.models.hmvit import make_camera_encoder

    enc = make_camera_encoder(CFGS[kind], name=None)
    images, intr, extr = make_inputs()
    variables = enc.init(jax.random.key(0), images, intr, extr)
    out = enc.apply(variables, images, intr, extr)
    assert out.shape == (N, 16, 16, 48)  # bev 8 upsampled once
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(params):
        o = enc.apply({"params": params, **{k: v for k, v in
                                            variables.items()
                                            if k != "params"}},
                      images, intr, extr)
        return (o ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(x)) for x in leaves)
    assert any(np.abs(x).max() > 0 for x in leaves)


def test_images_influence_bev():
    """Changing the input images must change the BEV for each encoder."""
    from hmvit_tpu.models.hmvit import make_camera_encoder

    for kind, cfg in CFGS.items():
        enc = make_camera_encoder(cfg, name=None)
        images, intr, extr = make_inputs()
        variables = enc.init(jax.random.key(1), images, intr, extr)
        base = enc.apply(variables, images, intr, extr)
        out = enc.apply(variables, images + 0.5, intr, extr)
        assert np.abs(np.asarray(out - base)).max() > 1e-5, kind
