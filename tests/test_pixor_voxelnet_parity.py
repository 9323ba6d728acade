"""GOLDEN weight-copy parity for the faithful PIXOR backbone/header and
the VoxelNet multiscale RPN: the reference torch modules run directly
(eval-mode BN) and their weights are copied into the JAX twins
(reference: opencood/models/pixor.py:64-259, voxel_net.py:129-169)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import (  # noqa: E402
    _bn_params,
    _conv_kernel,
    _convT_kernel,
    _install_reference,
)


def _conv_entry(conv):
    import jax.numpy as jnp

    out = {"kernel": _conv_kernel(conv)}
    if conv.bias is not None:
        out["bias"] = jnp.asarray(conv.bias.detach().numpy())
    return out


def _convT_entry(convT):
    import jax.numpy as jnp

    out = {"kernel": _convT_kernel(convT)}
    if convT.bias is not None:
        out["bias"] = jnp.asarray(convT.bias.detach().numpy())
    return out


def _bottleneck_params(block):
    """Reference Bottleneck (pixor.py:65-117) -> flax PixorBottleneck."""
    params, stats = {}, {}
    for i, (conv, bn) in enumerate([(block.conv1, block.bn1),
                                    (block.conv2, block.bn2),
                                    (block.conv3, block.bn3)]):
        params[f"Conv_{i}"] = _conv_entry(conv)
        bnp, bns = _bn_params(bn)
        params[f"BatchNorm_{i}"] = bnp
        stats[f"BatchNorm_{i}"] = bns
    if block.downsample is not None:
        params["Conv_3"] = _conv_entry(block.downsample[0])
        bnp, bns = _bn_params(block.downsample[1])
        params["BatchNorm_3"] = bnp
        stats["BatchNorm_3"] = bns
    return params, stats


def test_pixor_backbone_header_match_reference():
    import jax.numpy as jnp

    from hmvit_tpu.models.pixor import PixorBackbone, PixorHeader

    _install_reference()
    from opencood.models.pixor import BackBone, Bottleneck, Header

    geom = {"input_shape": (64, 64, 7), "label_shape": (16, 16, 7)}
    torch.manual_seed(0)
    ref_bb = BackBone(Bottleneck, [3, 6, 6, 3], geom, use_bn=True).eval()
    ref_hd = Header(use_bn=True).eval()
    # non-trivial running stats so eval-BN actually transforms
    for m in list(ref_bb.modules()) + list(ref_hd.modules()):
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)

    x = torch.randn(1, 7, 64, 64)
    with torch.no_grad():
        ref_feat = ref_bb(x)
        ref_cls, ref_reg = ref_hd(ref_feat)

    params, stats = {}, {}
    params["Conv_0"] = _conv_entry(ref_bb.conv1)
    params["Conv_1"] = _conv_entry(ref_bb.conv2)
    for i, bn in enumerate([ref_bb.bn1, ref_bb.bn2]):
        bnp, bns = _bn_params(bn)
        params[f"BatchNorm_{i}"] = bnp
        stats[f"BatchNorm_{i}"] = bns
    blocks = (list(ref_bb.block2) + list(ref_bb.block3)
              + list(ref_bb.block4) + list(ref_bb.block5))
    for i, blk in enumerate(blocks):
        p, s = _bottleneck_params(blk)
        params[f"PixorBottleneck_{i}"] = p
        stats[f"PixorBottleneck_{i}"] = s
    params["Conv_2"] = _conv_entry(ref_bb.latlayer1)
    params["Conv_3"] = _conv_entry(ref_bb.latlayer2)
    params["Conv_4"] = _conv_entry(ref_bb.latlayer3)
    params["_TorchConvT_0"] = {"ConvTranspose_0":
                               _convT_entry(ref_bb.deconv1)}
    params["_TorchConvT_1"] = {"ConvTranspose_0":
                               _convT_entry(ref_bb.deconv2)}

    xin = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    feat = PixorBackbone().apply(
        {"params": params, "batch_stats": stats}, xin, train=False)
    np.testing.assert_allclose(
        np.asarray(feat).transpose(0, 3, 1, 2),
        ref_feat.numpy(), atol=2e-3)

    hparams, hstats = {}, {}
    for i, (conv, bn) in enumerate([(ref_hd.conv1, ref_hd.bn1),
                                    (ref_hd.conv2, ref_hd.bn2),
                                    (ref_hd.conv3, ref_hd.bn3),
                                    (ref_hd.conv4, ref_hd.bn4)]):
        hparams[f"Conv_{i}"] = _conv_entry(conv)
        bnp, bns = _bn_params(bn)
        hparams[f"BatchNorm_{i}"] = bnp
        hstats[f"BatchNorm_{i}"] = bns
    hparams["Conv_4"] = _conv_entry(ref_hd.clshead)
    hparams["Conv_5"] = _conv_entry(ref_hd.reghead)

    cls, reg = PixorHeader().apply(
        {"params": hparams, "batch_stats": hstats}, feat, train=False)
    np.testing.assert_allclose(np.asarray(cls).transpose(0, 3, 1, 2),
                               ref_cls.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(reg).transpose(0, 3, 1, 2),
                               ref_reg.numpy(), atol=2e-3)


def test_voxel_rpn_matches_reference():
    import jax.numpy as jnp

    from hmvit_tpu.models.lidar_zoo import VoxelRPN

    _install_reference()
    from opencood.models.voxel_net import RPN

    torch.manual_seed(1)
    ref = RPN(anchor_num=2).eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)

    x = torch.randn(1, 128, 64, 64)
    with torch.no_grad():
        ref_psm, ref_rm = ref(x)

    params, stats = {}, {}
    ci = bi = 0

    def add_wrapped(mod):
        """Reference Conv2d wrapper (conv + bn + relu)."""
        nonlocal ci, bi
        params[f"Conv_{ci}"] = _conv_entry(mod.conv)
        bnp, bns = _bn_params(mod.bn)
        params[f"BatchNorm_{bi}"] = bnp
        stats[f"BatchNorm_{bi}"] = bns
        ci += 1
        bi += 1

    for mod in ref.block_1:
        add_wrapped(mod)
    for mod in ref.block_2:
        add_wrapped(mod)
    add_wrapped(ref.block_3[0])
    for mod in list(ref.block_3)[1:]:  # raw convs, no BN
        params[f"Conv_{ci}"] = _conv_entry(mod)
        ci += 1
    for ti, de in enumerate([ref.deconv_1, ref.deconv_2, ref.deconv_3]):
        params[f"_TorchConvT_{ti}"] = {"ConvTranspose_0":
                                       _convT_entry(de[0])}
        bnp, bns = _bn_params(de[1])
        params[f"BatchNorm_{bi}"] = bnp
        stats[f"BatchNorm_{bi}"] = bns
        bi += 1
    params[f"Conv_{ci}"] = _conv_entry(ref.score_head.conv)
    params[f"Conv_{ci + 1}"] = _conv_entry(ref.reg_head.conv)

    xin = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    psm, rm = VoxelRPN(anchor_num=2).apply(
        {"params": params, "batch_stats": stats}, xin, train=False)
    np.testing.assert_allclose(np.asarray(psm).transpose(0, 3, 1, 2),
                               ref_psm.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(rm).transpose(0, 3, 1, 2),
                               ref_rm.numpy(), atol=2e-3)
