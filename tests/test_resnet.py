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


def test_fpn_pyramid_and_planar_lift_integration():
    """FPN returns one enriched map per level (fine->coarse) and the
    bevformer planar path consumes the finest level when fpn is on."""
    import jax.numpy as jnp

    from hmvit_tpu.models.bevformer import BEVFormerEncoder
    from hmvit_tpu.models.resnet import FPN

    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(size=(2, 16 // s, 16 // s, 8 * s))
                         .astype(np.float32)) for s in (1, 2, 4)]
    fpn = FPN(out_channels=16)
    v = fpn.init(jax.random.key(0), feats)
    outs = fpn.apply(v, feats)
    assert [o.shape for o in outs] == [(2, 16, 16, 16), (2, 8, 8, 16),
                                       (2, 4, 4, 16)]
    # coarse features must reach the fine level through the top-down path
    feats2 = [feats[0], feats[1], feats[2] + 5.0]
    outs2 = fpn.apply(v, feats2)
    assert np.abs(np.asarray(outs2[0] - outs[0])).max() > 1e-4

    cfg = {"encoder": "bevformer", "lift": "planar", "backbone": "resnet18",
           "id_pick": [2, 3], "fpn": True, "fpn_channels": 16, "dim": 16,
           "bev_size": 8, "out_dim": 16, "num_layers": 1, "heads": 2,
           "window": 4, "num_points_in_pillar": 2, "decoder_layers": 0,
           "bev_range": 20.0}
    enc = BEVFormerEncoder(cfg)
    imgs = jnp.asarray(rng.normal(size=(1, 2, 64, 64, 3)).astype(np.float32))
    intr = jnp.tile(jnp.asarray(np.diag([32.0, 32.0, 1.0]).astype(
        np.float32)), (1, 2, 1, 1))
    extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, 2, 1, 1))
    var = enc.init(jax.random.key(0), imgs, intr, extr, False)
    bev = enc.apply(var, imgs, intr, extr, False)
    assert bev.shape == (1, 8, 8, 16)
    assert np.isfinite(np.asarray(bev)).all()
    assert any("fpn" in k for k in var["params"])


def test_stem_s2d_matches_plain_stem():
    """The space-to-depth serving stem (resnet.py::_s2d_stem) is the
    IDENTICAL 7x7/2 convolution re-expressed over strided slices —
    same params, equal outputs (round-5 perf experiment; the knob is
    camera config ``stem_s2d``)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hmvit_tpu.models.resnet import ResNetEncoder

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(
        np.float32))
    plain = ResNetEncoder(arch="resnet18", id_pick=(1,))
    s2d = ResNetEncoder(arch="resnet18", id_pick=(1,), stem_s2d=True)
    v = plain.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(s2d.apply(v, x)), np.asarray(plain.apply(v, x)),
        atol=2e-5, rtol=2e-5)
