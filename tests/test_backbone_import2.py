"""Backbone pretrained-import parity, tranche 2 (VERDICT r3 Next #6).

Instantiates the REFERENCE torch backbones with random weights, transplants
their state_dicts through nn/modules/backbone_import.py, and asserts our
flax/NHWC implementations reproduce every emitted stage feature map."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    import tests.fixtures.gen_fixtures as gf  # (/root/reference on path)
    gf.install_stubs()
    yield None
    gf.uninstall_stubs()  # don't leak the catch-all finder into other modules


def _stage_outs_torch(mod, x_nchw):
    import torch

    mod.eval()
    with torch.no_grad():
        outs = mod(torch.from_numpy(x_nchw))
    return [o.numpy().transpose(0, 2, 3, 1) for o in outs]


def _assert_close(ours, theirs, tol=2e-3):
    assert len(ours) == len(theirs)
    for i, (a, b) in enumerate(zip(ours, theirs)):
        a = np.asarray(a, np.float32)
        assert a.shape == b.shape, (i, a.shape, b.shape)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8)
        assert err < tol, f"stage {i}: rel err {err}"


def test_hornet_import_parity():
    """Faithful HorNet 7x7 (g^n-conv orders 2/3/4/5) vs reference HorNet.py
    with transplanted weights."""
    from functools import partial

    from ultralytics.nn.modules.HorNet import HorNet as RefHorNet, gnconv

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import hornet_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones5 import HorNetBackbone

    torch.manual_seed(5)
    s = 1.0 / 3.0
    ref = RefHorNet(depths=[1, 1, 2, 1], base_dim=16,
                    gnconv=[partial(gnconv, order=o + 2, s=s) for o in range(4)])
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = HorNetBackbone(depths=(1, 1, 2, 1), base_dim=16, orders=(2, 3, 4, 5), s=s)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = hornet_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(4).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs)


def test_inceptionnext_import_parity():
    """Faithful InceptionNeXt (inception DW mixer + BN MetaNeXt blocks) vs
    reference InceptionNext.py with transplanted weights."""
    from ultralytics.nn.modules.InceptionNext import InceptionDWConv2d, MetaNeXt

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import (
        inceptionnext_state_dict_to_flax)
    from ultralytics_pro_tpu.nn.modules.backbones5 import InceptionNeXtBackbone

    torch.manual_seed(11)
    ref = MetaNeXt(depths=(1, 1, 2, 1), dims=(16, 32, 64, 96),
                   token_mixers=InceptionDWConv2d, mlp_ratios=(4, 4, 4, 3))
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)
        for mbuf in ref.modules():
            if isinstance(mbuf, torch.nn.BatchNorm2d):
                mbuf.running_mean.add_(torch.randn_like(mbuf.running_mean) * 0.05)
                mbuf.running_var.mul_(1.2)

    m = InceptionNeXtBackbone(depths=(1, 1, 2, 1), dims=(16, 32, 64, 96),
                              mlp_ratios=(4, 4, 4, 3))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = inceptionnext_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(12).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), False,
                   mutable=False)
    _assert_close(ours, theirs)


def test_cswin_import_parity():
    """Faithful CSWin (cross-shaped-window LePE attention) vs reference
    CSWinTransformer.py with transplanted weights. 640px: the reference
    hardwires a 640 init-time forward (width_list) into its constructor, so
    that is the only resolution it can even be built at."""
    from ultralytics.nn.modules.CSWinTransformer import CSWinTransformer

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import cswin_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones5 import CSWinBackbone

    torch.manual_seed(21)
    ref = CSWinTransformer(img_size=640, embed_dim=16, depth=[1, 1, 2, 1],
                           split_size=[1, 2, 8, 8], num_heads=[2, 4, 8, 16],
                           mlp_ratio=4.0)
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = CSWinBackbone(embed_dim=16, depths=(1, 1, 2, 1),
                      split_size=(1, 2, 8, 8), num_heads=(2, 4, 8, 16))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = cswin_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(22).normal(0, 1, (1, 3, 640, 640)).astype(np.float32)
    # Compare TOKEN streams per stage: the reference's feature emission
    # reshapes its (B, L, C) tokens straight to (B, C, H, W) WITHOUT the
    # transpose (CSWinTransformer.py:352), scrambling channel/space in its
    # own output maps — we match the underlying computation, not that bug.
    ref.eval()
    theirs = []
    with torch.no_grad():
        t = ref.stage1_conv_embed(torch.from_numpy(x))
        for blk in ref.stage1:
            t = blk(t)
        theirs.append(t.numpy())
        for merge, blocks in zip([ref.merge1, ref.merge2, ref.merge3],
                                 [ref.stage2, ref.stage3, ref.stage4]):
            t = merge(t)
            for blk in blocks:
                t = blk(t)
            theirs.append(t.numpy())
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ours = [np.asarray(o, np.float32).reshape(o.shape[0], -1, o.shape[-1])
            for o in ours]
    _assert_close(ours, theirs)


def test_ghostnetv2_import_parity():
    """Faithful GhostNetV2 (DFC-attention ghost bottlenecks) vs reference
    GhostNetv2.py with transplanted weights. The reference hardwires a
    640 init-forward and a train-mode dropout; eval-mode comparison."""
    from ultralytics.nn.modules.GhostNetv2 import Ghostnetv2

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import (
        ghostnetv2_state_dict_to_flax)
    from ultralytics_pro_tpu.nn.modules.backbones5 import GhostNetV2Backbone

    torch.manual_seed(31)
    ref = Ghostnetv2()
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.02)
        for mbuf in ref.modules():
            if isinstance(mbuf, torch.nn.BatchNorm2d):
                mbuf.running_mean.add_(torch.randn_like(mbuf.running_mean) * 0.05)
                mbuf.running_var.mul_(1.2)

    m = GhostNetV2Backbone()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = ghostnetv2_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(30).normal(0, 1, (2, 3, 128, 128)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), False,
                   mutable=False)
    _assert_close(ours, theirs)


def test_moganet_import_parity():
    """Faithful MogaNet (multi-order gated aggregation + CA-FFN) vs reference
    MogaNet_backbone.py with transplanted weights."""
    from ultralytics.nn.modules.MogaNet_backbone import MogaNet as RefMoga

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import moganet_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones5 import MogaNetBackbone

    torch.manual_seed(7)
    arch = {"embed_dims": [16, 32, 48, 96], "depths": [1, 1, 2, 1],
            "ffn_ratios": [8, 8, 4, 4]}
    ref = RefMoga(arch=arch)
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)
        # non-trivial running stats so the BN import path is exercised
        for mbuf in ref.modules():
            if isinstance(mbuf, torch.nn.BatchNorm2d):
                mbuf.running_mean.add_(torch.randn_like(mbuf.running_mean) * 0.05)
                mbuf.running_var.mul_(1.2)

    m = MogaNetBackbone(embed_dims=(16, 32, 48, 96), depths=(1, 1, 2, 1),
                        ffn_ratios=(8, 8, 4, 4))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = moganet_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(9).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), False,
                   mutable=False)
    _assert_close(ours, theirs)


def test_mambavision_import_parity():
    """Faithful MambaVision (hybrid conv + mamba/attention stages) vs
    reference MambaVision.py with transplanted weights. The reference's
    selective_scan requires the CUDA extension, so it is patched here with a
    sequential torch scan implementing the documented kernel semantics
    (h_t = exp(dA) h + d B u; y = C.h + D u, delta_softplus + delta_bias) —
    the same recurrence our associative scan computes."""
    import ultralytics.nn.modules.MambaVision as refmod

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import (
        mambavision_state_dict_to_flax)
    from ultralytics_pro_tpu.nn.modules.backbones5 import MambaVisionBackbone

    def seq_scan(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                 delta_softplus=False, return_last_state=None):
        u, delta = u.float(), delta.float()
        if delta_bias is not None:
            delta = delta + delta_bias[None, :, None]
        if delta_softplus:
            delta = torch.nn.functional.softplus(delta)
        b, d, l = u.shape
        h = torch.zeros(b, d, A.shape[1])
        ys = []
        for t in range(l):
            da = torch.exp(delta[:, :, t, None] * A[None])
            h = da * h + delta[:, :, t, None] * B[:, None, :, t] * u[:, :, t, None]
            ys.append(torch.einsum("bdn,bn->bd", h, C[:, :, t]))
        y = torch.stack(ys, dim=-1)
        if D is not None:
            y = y + D[None, :, None] * u
        return y

    refmod.selective_scan_fn = seq_scan
    torch.manual_seed(31)
    ref = refmod.MambaVision(dim=32, in_dim=16, depths=[1, 2, 3, 2],
                             window_size=[8, 8, 14, 7], mlp_ratio=4,
                             num_heads=[2, 4, 4, 8], drop_path_rate=0.0)
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)
        for mbuf in ref.modules():
            if isinstance(mbuf, torch.nn.BatchNorm2d):
                mbuf.running_mean.add_(torch.randn_like(mbuf.running_mean) * 0.05)
                mbuf.running_var.mul_(1.2)

    m = MambaVisionBackbone(dim=32, in_dim=16, depths=(1, 2, 3, 2),
                            num_heads=(2, 4, 4, 8), window_size=(8, 8, 14, 7))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = mambavision_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(33).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), False,
                   mutable=False)
    _assert_close(ours, theirs)


def test_maxvit_import_parity():
    """Faithful MaxViT (MBConv + block/grid relative attention) vs reference
    MaxViT.py with transplanted weights. The reference's timm imports
    (DepthwiseSeparableConv, SqueezeExcite) resolve to the real-semantics
    stubs in gen_fixtures, which also define the torch key layout the mapper
    targets (same names as real timm: conv_dw/bn1/conv_pw/bn2,
    conv_reduce/conv_expand)."""
    from ultralytics.nn.modules.MaxViT import MaxViT as RefMaxViT

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import maxvit_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones5 import MaxViTBackbone

    torch.manual_seed(41)
    ref = RefMaxViT(depths=(1, 1, 2, 1), channels=(16, 32, 48, 64),
                    embed_dim=16, num_heads=8, grid_window_size=7,
                    img_size=224, drop_path_rate=0.0)
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)
        for mbuf in ref.modules():
            if isinstance(mbuf, torch.nn.BatchNorm2d):
                mbuf.running_mean.add_(torch.randn_like(mbuf.running_mean) * 0.05)
                mbuf.running_var.mul_(1.2)

    m = MaxViTBackbone(embed_dim=16, depths=(1, 1, 2, 1),
                       channels=(16, 32, 48, 64), num_heads=8, window=7)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = maxvit_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(43).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), False,
                   mutable=False)
    _assert_close(ours, theirs)


def test_ghostnetv1_import_parity():
    """Faithful GhostNetV1 (reference GhostNetv1.py:158 — the V2 structure
    with no DFC gate) vs the reference with transplanted weights; the V2
    importer serves V1 dicts unchanged (they simply carry no short_conv
    keys)."""
    from ultralytics.nn.modules.GhostNetv1 import Ghostnetv1

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import (
        ghostnetv2_state_dict_to_flax)
    from ultralytics_pro_tpu.nn.modules.backbones5 import GhostNetV2Backbone

    torch.manual_seed(33)
    ref = Ghostnetv1()
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.02)
        for mbuf in ref.modules():
            if isinstance(mbuf, torch.nn.BatchNorm2d):
                mbuf.running_mean.add_(torch.randn_like(mbuf.running_mean) * 0.05)
                mbuf.running_var.mul_(1.2)

    m = GhostNetV2Backbone(dfc_attn=False)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = ghostnetv2_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(32).normal(0, 1, (2, 3, 128, 128)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), False,
                   mutable=False)
    _assert_close(ours, theirs)


def test_ghostnetv3_import_parity():
    """Faithful train-form GhostNetV3 (reparam ghost modules + DFC gates,
    reference GhostNetv3.py:839 GhostNet_1_0) vs the reference with
    transplanted weights. The reference trains through the rpr branches
    (infer_mode=False); its fused primary/cheap modules and conv_dw/bn_dw
    are dead until reparameterize() and the importer skips them."""
    from ultralytics.nn.modules.GhostNetv3 import GhostNet_1_0

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import (
        ghostnetv3_state_dict_to_flax)
    from ultralytics_pro_tpu.nn.modules.backbones5 import GhostNetV3Backbone

    torch.manual_seed(35)
    ref = GhostNet_1_0()
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.02)
        for mbuf in ref.modules():
            if isinstance(mbuf, torch.nn.BatchNorm2d):
                mbuf.running_mean.add_(torch.randn_like(mbuf.running_mean) * 0.05)
                mbuf.running_var.mul_(1.2)

    m = GhostNetV3Backbone()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = ghostnetv3_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(34).normal(0, 1, (2, 3, 128, 128)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), False,
                   mutable=False)
    _assert_close(ours, theirs)


def test_parameternet_import_parity():
    """Faithful GhostNet_Reparam / parameternet_600m (reference
    ParameterNet.py:894 — the GhostNetV3 reparam ghost machinery in pure
    'ori' mode over the ParameterNet stage table) vs the reference with
    transplanted weights."""
    from ultralytics.nn.modules.ParameterNet import GhostNet_Reparam

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import (
        parameternet_state_dict_to_flax)
    from ultralytics_pro_tpu.nn.modules.backbones5 import ParameterNetBackbone

    torch.manual_seed(37)
    ref = GhostNet_Reparam()
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.02)
        for mbuf in ref.modules():
            if isinstance(mbuf, torch.nn.BatchNorm2d):
                mbuf.running_mean.add_(torch.randn_like(mbuf.running_mean) * 0.05)
                mbuf.running_var.mul_(1.2)

    m = ParameterNetBackbone()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = parameternet_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(36).normal(0, 1, (2, 3, 128, 128)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), False,
                   mutable=False)
    _assert_close(ours, theirs)
