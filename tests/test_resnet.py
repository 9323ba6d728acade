"""ResNet backbones: strides, multi-scale pick, gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hmvit_tpu.models.resnet import ResNetEncoder

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("arch,ch3", [("resnet18", 256),
                                      ("resnet34", 256),
                                      ("resnet50", 1024)])
def test_stage_shapes(arch, ch3):
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    enc = ResNetEncoder(arch=arch, id_pick=(1, 3))
    variables = enc.init(jax.random.key(0), x)
    s1, s3 = enc.apply(variables, x)
    assert s1.shape[1:3] == (16, 16)   # stride 4
    assert s3.shape[1:3] == (4, 4)     # stride 16
    assert s3.shape[-1] == ch3


def test_backbone_selection_in_camera_encoder():
    from hmvit_tpu.models.cvt import CrossViewTransformer

    cfg = {"dim": 32, "bev_size": 4, "out_dim": 32, "num_blocks": 1,
           "decoder_layers": 1, "backbone": "resnet18", "id_pick": [3]}
    enc = CrossViewTransformer(cfg)
    imgs = np.random.default_rng(0).normal(size=(1, 2, 64, 64, 3)).astype(
        np.float32)
    intr = np.tile(np.eye(3, dtype=np.float32), (1, 2, 1, 1))
    intr[..., :2, 2] = 32
    extr = np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))
    variables = enc.init(jax.random.key(0), imgs, intr, extr)
    out = enc.apply(variables, imgs, intr, extr)
    assert out.shape == (1, 8, 8, 32)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("arch,chans", [("vovnet-19", 384),
                                        ("vovnet-39", 768)])
def test_vovnet_stage_shapes(arch, chans):
    from hmvit_tpu.models.vovnet import VoVNet

    x = jnp.ones((1, 64, 64, 3))
    net = VoVNet(arch=arch, id_pick=(3,))
    v = net.init(jax.random.key(0), x, train=False)
    out = net.apply(v, x, train=False)
    assert out.shape == (1, 4, 4, chans)  # stride 16
    # multi-scale pick
    net2 = VoVNet(arch=arch, id_pick=(1, 3))
    v2 = net2.init(jax.random.key(0), x, train=False)
    o1, o3 = net2.apply(v2, x, train=False)
    assert o1.shape[1] == 16 and o3.shape[1] == 4
    # gradient flow
    def loss(p):
        return jnp.sum(net.apply({"params": p,
                                  "batch_stats": v["batch_stats"]},
                                 x, train=False) ** 2)
    g = jax.grad(loss)(v["params"])
    assert sum(float(jnp.abs(t).sum())
               for t in jax.tree_util.tree_leaves(g)) > 0
