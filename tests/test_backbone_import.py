"""Backbone pretrained-weight import parity (VERDICT r2 row 23 residual).

Instantiates the REFERENCE torch backbones (ConvNeXtV2_backbone.py,
ConvNeXtV1.py, FasterNet.py, SwinTransformer_backbone.py) with random
weights, imports their state_dicts through nn/modules/backbone_import.py,
and asserts our flax/NHWC backbones reproduce every stage feature map —
proving a user can drop an official checkpoint into a yaml-swapped backbone.
"""

import sys

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


def _assert_close(ours, theirs, tol=5e-4):
    assert len(ours) == len(theirs)
    for i, (a, b) in enumerate(zip(ours, theirs)):
        a = np.asarray(a, np.float32)
        assert a.shape == b.shape, (i, a.shape, b.shape)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8)
        assert err < tol, f"stage {i}: rel err {err}"


def test_convnextv2_import_parity():
    from ultralytics.nn.modules.ConvNeXtV2_backbone import ConvNeXtV2

    import jax.numpy as jnp

    import jax
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import convnext_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones import ConvNeXt

    torch.manual_seed(3)
    ref = ConvNeXtV2(factor=1.0, depths=[1, 1, 2, 1], dims=[16, 32, 64, 128])
    # give GRN + norms non-trivial values (init is zeros/ones)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.05)

    x = np.random.default_rng(0).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)

    m = ConvNeXt(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128), grn=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = convnext_state_dict_to_flax(v, sd, strict=True)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs)


def test_convnextv1_import_parity():
    from ultralytics.nn.modules.ConvNeXtV1 import ConvNeXt as RefConvNeXt

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import convnext_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones import ConvNeXt

    torch.manual_seed(4)
    ref = RefConvNeXt(num_classes=0, depths=[1, 1, 2, 1], dims=[16, 32, 64, 128],
                      input_image_size=64)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.05)

    x = np.random.default_rng(1).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)

    m = ConvNeXt(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128), grn=False)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = convnext_state_dict_to_flax(v, sd, strict=True)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs)


def test_fasternet_import_parity():
    from ultralytics.nn.modules.FasterNet import FasterNet as RefFasterNet

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import fasternet_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones2 import FasterNet

    torch.manual_seed(5)
    ref = RefFasterNet(embed_dim=16, depths=(1, 2, 2, 2), mlp_ratio=2.0, n_div=4,
                       drop_path_rate=0.0, layer_scale_init_value=0,
                       norm_layer="BN", act_layer="GELU")
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.05)
        for n, b in ref.named_buffers():
            if n.endswith("running_var"):
                b.mul_(torch.rand_like(b) * 0.5 + 0.75)
            elif n.endswith("running_mean"):
                b.add_(torch.randn_like(b) * 0.1)

    x = np.random.default_rng(2).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)

    m = FasterNet(depths=(1, 2, 2, 2), dims=(16, 32, 64, 128), act="gelu")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = fasternet_state_dict_to_flax(v, sd, strict=True)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    _assert_close(ours, theirs)


def test_swin_import_parity():
    from ultralytics.nn.modules.SwinTransformer_backbone import SwinTransformer as RefSwin

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import swin_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones import SwinTransformer

    torch.manual_seed(6)
    ref = RefSwin(embed_dim=24, depths=[2, 2, 2, 2], num_heads=[3, 6, 12, 24],
                  window_size=7, drop_path_rate=0.0)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.05)

    # 96px input -> stage-0 resolution 24x24 (pads to 28 for window 7) with
    # shifted blocks active at every level that has >1 window
    x = np.random.default_rng(3).normal(0, 1, (2, 3, 96, 96)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)

    m = SwinTransformer(depths=(2, 2, 2, 2), dims=(24, 48, 96, 192),
                        heads=(3, 6, 12, 24), window=7)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = swin_state_dict_to_flax(v, sd, strict=True)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=5e-4)


def test_efficientformerv2_import_parity():
    """Faithful EfficientFormerV2-S0 (Attention4D/RPE/talking-heads/asub) vs
    the reference torch module at matched 64px init resolution."""
    from ultralytics.nn.modules.EfficientFormerV2 import efficientformerv2_s0

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import (
        efficientformerv2_state_dict_to_flax,
    )
    from ultralytics_pro_tpu.nn.modules.efficientformer import EfficientFormerV2

    torch.manual_seed(6)
    ref = efficientformerv2_s0(resolution=64, fork_feat=True)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.05)
        for n, b in ref.named_buffers():
            if n.endswith("running_var"):
                b.mul_(torch.rand_like(b) * 0.5 + 0.75)
            elif n.endswith("running_mean"):
                b.add_(torch.randn_like(b) * 0.1)

    x = np.random.default_rng(3).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)

    m = EfficientFormerV2(variant="s0")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = efficientformerv2_state_dict_to_flax(v, sd, strict=True)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    _assert_close(ours, theirs)


@pytest.mark.parametrize("retention", ["chunk", "whole"])
def test_retblock_parity(retention):
    """Faithful RetNet retention block vs the reference RetNet.py RetBlock
    (MaSAd 'chunk' / MaSA 'whole') with transplanted weights."""
    from ultralytics.nn.modules.RetNet import RelPos2d, RetBlock as RefRetBlock

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.zoo_r3 import RetBlock

    dim, heads, h, w = 32, 4, 8, 6
    torch.manual_seed(7)
    ref = RefRetBlock(retention, dim, heads, dim)
    relpos = RelPos2d(dim, heads, 2, 4)
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.02)
    ref.eval()

    x = np.random.default_rng(5).normal(0, 1, (2, h, w, dim)).astype(np.float32)
    with torch.no_grad():
        rel = relpos((h, w), chunkwise_recurrent=retention == "chunk")
        theirs = ref(torch.from_numpy(x), None, retention == "chunk", rel).numpy()

    m = RetBlock(dim=dim, retention=retention, num_heads=heads)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, dim)), False)
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    p = {k: np.asarray(val) for k, val in jax.tree_util.tree_map(np.asarray, v["params"]).items()}

    def lin(name, tkey):
        p[name] = {"kernel": sd[f"{tkey}.weight"].T, "bias": sd[f"{tkey}.bias"]}

    def dwc(name, tkey):
        p[name] = {"kernel": sd[f"{tkey}.conv.weight"].transpose(2, 3, 1, 0),
                   "bias": sd[f"{tkey}.conv.bias"]}

    lin("q_proj", "retention.q_proj")
    lin("k_proj", "retention.k_proj")
    lin("v_proj", "retention.v_proj")
    lin("out_proj", "retention.out_proj")
    lin("fc1", "ffn.fc1")
    lin("fc2", "ffn.fc2")
    dwc("lepe", "retention.lepe")
    dwc("pos", "pos")
    p["ln1"] = {"scale": sd["retention_layer_norm.weight"], "bias": sd["retention_layer_norm.bias"]}
    p["ln2"] = {"scale": sd["final_layer_norm.weight"], "bias": sd["final_layer_norm.bias"]}
    ours = m.apply({"params": p}, jnp.asarray(x), False)
    err = np.max(np.abs(np.asarray(ours, np.float32) - theirs)) / (np.max(np.abs(theirs)) + 1e-8)
    assert err < 5e-4, f"{retention}: rel err {err}"


def test_mllablock_parity():
    """MLLABlock (gated elu+1 linear attention w/ RoPE + LePE) vs the
    reference MLLABLock.py module with transplanted weights (NCHW in/out)."""
    from ultralytics.nn.modules.MLLABLock import MLLABlock as RefMLLA

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.zoo_r3 import MLLABlock

    dim, h, w = 32, 8, 8
    torch.manual_seed(9)
    ref = RefMLLA(dim, num_heads=4)
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.02)
    ref.eval()

    # The reference ingests NCHW with a raw `.reshape(b, h*w, c)` — a memory
    # reinterpretation, not a transpose (MLLABLock.py:231) — so its "tokens"
    # are scrambled. Feed it an input whose reinterpretation IS a clean token
    # grid: tokens (B, N, C) viewed as (B, C, H, W). Its output un-tokenizes
    # properly (`x.transpose(2, 1).reshape(b, c, H, W)`), so outputs compare
    # directly. Our block implements the intended (paper/MLLA.py) semantics.
    tokens = np.random.default_rng(6).normal(0, 1, (2, h * w, dim)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(tokens).reshape(2, dim, h, w)).numpy().transpose(0, 2, 3, 1)
    x = tokens.reshape(2, h, w, dim)

    m = MLLABlock(dim=dim)  # auto heads = max(1, dim//64), like the reference
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, dim)), False)
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    p = dict(jax.tree_util.tree_map(np.asarray, v["params"]))

    def lin(name, tkey):
        p[name] = {"kernel": sd[f"{tkey}.weight"].T, "bias": sd[f"{tkey}.bias"]}

    def dwc(name, tkey):
        p[name] = {"kernel": sd[f"{tkey}.weight"].transpose(2, 3, 1, 0),
                   "bias": sd[f"{tkey}.bias"]}

    dwc("cpe1", "cpe1")
    dwc("cpe2", "cpe2")
    dwc("dwc", "dwc")
    dwc("lepe", "attn.lepe")
    lin("in_proj", "in_proj")
    lin("act_proj", "act_proj")
    lin("qk", "attn.qk")
    lin("out_proj", "out_proj")
    lin("mlp_fc1", "mlp.fc1")
    lin("mlp_fc2", "mlp.fc2")
    p["norm1"] = {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]}
    p["norm2"] = {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]}
    ours = m.apply({"params": p}, jnp.asarray(x), False)
    err = np.max(np.abs(np.asarray(ours, np.float32) - theirs)) / (np.max(np.abs(theirs)) + 1e-8)
    assert err < 5e-4, f"rel err {err}"


def test_sfs_conv_parity():
    """Faithful SFS_Conv (SPU spatial + fractional-Gabor FPU frequency paths)
    vs the reference SFSConv.py with transplanted weights."""
    from ultralytics.nn.modules.SFSConv import SFS_Conv as RefSFS

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.zoo_r3 import SFS_Conv

    c, h, w = 32, 8, 8
    torch.manual_seed(11)
    ref = RefSFS(c, c)
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.02)
        for n, b in ref.named_buffers():
            if n.endswith("running_var"):
                b.mul_(torch.rand_like(b) * 0.5 + 0.75)
            elif n.endswith("running_mean"):
                b.add_(torch.randn_like(b) * 0.1)
    ref.eval()

    x = np.random.default_rng(8).normal(0, 1, (2, c, h, w)).astype(np.float32)
    # the reference calls F.dropout(out, 0.3) without training=self.training,
    # so dropout fires even in eval (SFSConv.py:125) — neutralize it for a
    # deterministic comparison (our implementation omits that bug)
    import torch.nn.functional as _F
    _orig_dropout = _F.dropout
    _F.dropout = lambda t, *a, **k: t
    try:
        with torch.no_grad():
            theirs = ref(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    finally:
        _F.dropout = _orig_dropout

    m = SFS_Conv(c2=c)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, c)), False)
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    import copy
    tree = jax.tree_util.tree_map(np.asarray, v)
    tree = {"params": dict(tree["params"]), "batch_stats": dict(tree.get("batch_stats", {}))}

    def cbn(name, tkey):  # reference Conv = conv(no bias) + BN + SiLU
        tree["params"][name] = dict(tree["params"][name])
        tree["params"][name]["conv"] = {"kernel": sd[f"{tkey}.conv.weight"].transpose(2, 3, 1, 0)}
        tree["params"][name]["bn"] = {"scale": sd[f"{tkey}.bn.weight"], "bias": sd[f"{tkey}.bn.bias"]}
        tree["batch_stats"][name] = {"bn": {"mean": sd[f"{tkey}.bn.running_mean"],
                                            "var": sd[f"{tkey}.bn.running_var"]}}

    cbn("pwc0", "PWC0")
    cbn("pwc1", "PWC1")
    cbn("spu_c1", "SPU.c1")
    cbn("spu_c2", "SPU.c2")
    cbn("spu_c3", "SPU.c3")
    cbn("pwc_o", "PWC_o")
    tree["params"]["fpu_fc"] = {"kernel": sd["FPU.fc.weight"].transpose(2, 3, 1, 0),
                                "bias": sd["FPU.fc.bias"]}
    gm = np.stack([sd[f"FPU.gabor.gabor.real_weights.{i}"][:, 0] for i in range(16)])
    tree["params"]["fpu_gabor"] = {"gabor_maps": gm, "t": sd["FPU.gabor.t"]}
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    err = np.max(np.abs(np.asarray(ours, np.float32) - theirs)) / (np.max(np.abs(theirs)) + 1e-8)
    # our YOLO Conv uses BN eps=1e-3 vs the reference's local Conv 1e-5; with
    # var ~ [0.75, 1.25] the eps mismatch bounds the error at ~1e-3
    assert err < 5e-3, f"rel err {err}"


def test_vheat_import_parity():
    """Faithful vHeat (DCT heat-conduction) backbone vs the reference
    vHeat.py:227 with transplanted weights — both the matched-resolution path
    (freq_embed used as-is) and the bilinear-resized freq path."""
    from ultralytics.nn.modules.vHeat import vHeat as RefVHeat

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import vheat_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones4 import VHeatBackbone

    torch.manual_seed(7)
    ref = RefVHeat(depths=[1, 1, 2, 1], dims=[16, 32, 64, 128], img_size=64,
                   post_norm=False, drop_path_rate=0.0, num_classes=8)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.03)

    m = VHeatBackbone(dims=(16, 32, 64, 128), depths=(1, 1, 2, 1), img_size=64)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = vheat_state_dict_to_flax(v, sd, strict=True)

    # matched resolution: 64px input -> H == freq res at every stage
    x = np.random.default_rng(2).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)

    # resized-freq path: 96px input -> bilinear freq interpolation on both sides
    x2 = np.random.default_rng(3).normal(0, 1, (1, 3, 96, 96)).astype(np.float32)
    theirs2 = _stage_outs_torch(ref, x2)
    ours2 = m.apply(v, jnp.asarray(x2.transpose(0, 2, 3, 1)))
    _assert_close(ours2, theirs2, tol=2e-3)


def test_spanet_import_parity():
    """Faithful SPANet (FFT spectral-pooling SPAM mixer) vs the reference
    SPANet.py:329 with transplanted weights, covering both the 3-chunk and
    2-chunk SPAM fallback dims and matched + padded filter resolutions."""
    from ultralytics.nn.modules.SPANet import SPANet as RefSPANet

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import spanet_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones4 import SPANetBackbone

    torch.manual_seed(9)
    dims, layers = [6, 8, 12, 16], [1, 1, 2, 1]  # 6/12: 3 chunks; 8/16: 2
    ref = RefSPANet(layers=layers, embed_dims=dims,
                    patch_dims_hw=[(16, 16), (8, 8), (4, 4), (2, 2)],
                    mlp_ratios=[4, 4, 4, 4], downsamples=[True] * 4,
                    radius=[2, 2, 1, 1], drop_path_rate=0.0,
                    res_scale_init_values=[None, None, 1.0, 1.0],
                    fork_feat=True, img_size=64, num_classes=0)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = SPANetBackbone(dims=tuple(dims), depths=tuple(layers),
                       radius=(2.0, 2.0, 1.0, 1.0),
                       res_scale=(0.0, 0.0, 1.0, 1.0), img_size=64)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = spanet_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(4).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)

    # padded-filter path: 96px input -> runtime H != config filter res
    x2 = np.random.default_rng(5).normal(0, 1, (1, 3, 96, 96)).astype(np.float32)
    theirs2 = _stage_outs_torch(ref, x2)
    ours2 = m.apply(v, jnp.asarray(x2.transpose(0, 2, 3, 1)))
    _assert_close(ours2, theirs2, tol=2e-3)


def test_smt_import_parity():
    """Faithful SMT (scale-aware modulation transformer) vs the reference
    SMT.py with transplanted weights — covers both the CA (multi-kernel
    depthwise modulation) and SA (MHSA + local dwconv) stages."""
    from ultralytics.nn.modules.SMT import SMT as RefSMT

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import smt_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones4 import SMTBackbone

    torch.manual_seed(11)
    dims, depths = [8, 16, 32, 64], [1, 1, 2, 1]
    ref = RefSMT(img_size=64, embed_dims=dims, depths=depths,
                 ca_num_heads=[4, 4, 4, -1], sa_num_heads=[-1, -1, 8, 16],
                 mlp_ratios=[8, 6, 4, 2], qkv_bias=True,
                 ca_attentions=[1, 1, 1, 0], head_conv=7, expand_ratio=2,
                 drop_path_rate=0.0, num_classes=8)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = SMTBackbone(dims=tuple(dims), depths=tuple(depths))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = smt_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(6).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)), False,
                   mutable=False)
    _assert_close(ours, theirs, tol=2e-3)


def test_cosnet_import_parity():
    """Faithful COSNet (MCFS sharpening mixer) vs the reference COSNet.py
    with transplanted weights."""
    from ultralytics.nn.modules.COSNet import COSNET_SPECS, COSNet as RefCOSNet

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import cosnet_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones4 import COSNetBackbone

    torch.manual_seed(13)
    COSNET_SPECS["cosnet_test"] = {
        "depths": [1, 1, 2, 1], "base_dim": 8, "expan_ratio": 4,
        "s_kernel_sizes": [5, 5, 3, 3], "drop_path_rate": 0.0,
        "layer_scale_init_value": 1e-6,
    }
    ref = RefCOSNet("cosnet_test", input_size=64)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = COSNetBackbone(depths=(1, 1, 2, 1), base_dim=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = cosnet_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(8).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_decouplenet_import_parity():
    """Faithful DecoupleNet (MBFD channel decoupling + MRLA/GA + FID
    downsamplers with real BlurPool) vs the reference DecoupleNet.py with
    transplanted weights. The reference returns [embed, s0..s3]; ours emits
    the 4 stage maps."""
    from ultralytics.nn.modules.DecoupleNet import DECOUPLE_NET_SPECS, DecoupleNet as RefDN

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import decouplenet_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones4 import DecoupleNetBackbone

    torch.manual_seed(17)
    DECOUPLE_NET_SPECS["decouplenet_test"] = {
        "embed_dim": 16, "depths": (1, 1, 2, 1), "att_kernel": (9, 9, 9, 9),
        "drop_path_rate": 0.0, "feature_dim": 64,
    }
    ref = RefDN("decouplenet_test", input_size=(3, 64, 64), num_classes=8)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = DecoupleNetBackbone(embed_dim=16, depths=(1, 1, 2, 1))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = decouplenet_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(10).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)[1:]  # drop the embed map
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_uninext_import_parity():
    """Faithful UniNeXt / DilatedFormer_Windows vs the reference UniNeXt.py
    with transplanted weights — exercises the zero-padded (unmasked) window
    attention path (16 % 7 != 0) exactly as the reference computes it."""
    from ultralytics.nn.modules.UniNeXt import DilatedFormer_Windows

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import uninext_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones4 import UniNeXtBackbone

    torch.manual_seed(19)
    ref = DilatedFormer_Windows(embed_dim=16, depth=[1, 1, 2, 1],
                                ws=[7, 7, 7, 7], wd=[3, 3, 3, 3],
                                num_heads=[2, 4, 8, 16], mlp_ratio=4.0,
                                qkv_bias=True, drop_path_rate=0.0,
                                num_classes=8, img_size=64)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = UniNeXtBackbone(embed_dim=16, depths=(1, 1, 2, 1))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = uninext_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(12).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_iformer_import_parity():
    """Faithful iFormer (inception high/low-frequency mixer) vs the reference
    iFormer.py with transplanted weights, at matched and pos-embed-resized
    resolutions."""
    from ultralytics.nn.modules.iFormer import InceptionTransformer

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import iformer_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones4 import IFormerBackbone

    torch.manual_seed(23)
    ah = [1, 1, 3, 3]  # per-block attention heads across the 4 stages
    ref = InceptionTransformer(img_size=64, depths=[1, 1, 1, 1],
                               embed_dims=[12, 24, 36, 48],
                               num_heads=[3, 6, 9, 12], attention_heads=ah,
                               use_layer_scale=True, layer_scale_init_value=1e-6,
                               qkv_bias=True, num_classes=8)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = IFormerBackbone(dims=(12, 24, 36, 48), depths=(1, 1, 1, 1),
                        num_heads=(3, 6, 9, 12), attention_heads=tuple(ah),
                        img_size=64)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = iformer_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(14).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_evit_import_parity():
    """Faithful EViT (cascaded spatial-reduction attention + BFFN) vs the
    reference EViT.py with transplanted weights — covers both the sr>1
    cascaded path and the sr==1 plain-MHSA stage."""
    from ultralytics.nn.modules.EViT import EViT as RefEViT

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import evit_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones4 import EViTBackbone

    torch.manual_seed(29)
    ref = RefEViT(img_size=64, embed_dims=[8, 16, 32, 64], stem_channel=8,
                  num_heads=[1, 2, 4, 8], mlp_ratios=[3, 3, 3, 3],
                  qkv_bias=True, depths=[1, 1, 2, 1], sr_ratios=[8, 4, 2, 1],
                  drop_path_rate=0.0, num_classes=0)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = EViTBackbone(dims=(8, 16, 32, 64), stem_channel=8, depths=(1, 1, 2, 1))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = evit_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(16).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_stvit_import_parity():
    """Faithful STViT (super-token attention with soft-association affinity)
    vs the reference STViT.py with transplanted weights — covers both the
    super-token (stoken>1, incl. the padded-grid path) and direct-refine
    (stoken=1) stages."""
    from ultralytics.nn.modules.STViT import STViT as RefSTViT

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import stvit_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones4 import STViTBackbone

    torch.manual_seed(31)
    ref = RefSTViT(img_size=64, embed_dim=[8, 16, 20, 32], depths=[1, 1, 2, 1],
                   num_heads=[1, 2, 5, 8], n_iter=[1, 1, 1, 1],
                   stoken_size=[8, 3, 1, 1], projection=None, mlp_ratio=4,
                   qkv_bias=True, drop_path_rate=0.0, num_classes=0)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if ".unfold." in n or ".fold." in n:
                continue  # fixed identity kernels — must stay exact
            p.add_(torch.randn_like(p) * 0.04)

    m = STViTBackbone(dims=(8, 16, 20, 32), depths=(1, 1, 2, 1),
                      num_heads=(1, 2, 5, 8), stoken=(8, 3, 1, 1))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = stvit_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(18).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_transxnet_import_parity():
    """Faithful TransXNet (IDConv dynamic depthwise + OSRA attention D-Mixer,
    MS-FFN) vs the reference TransXNet.py with transplanted weights."""
    from ultralytics.nn.modules.TransXNet import TransXNet as RefTXN

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import transxnet_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones4 import TransXNetBackbone

    torch.manual_seed(37)
    arch = {"layers": [1, 1, 2, 1], "embed_dims": [16, 32, 64, 128],
            "kernel_size": [7, 7, 7, 7], "num_groups": [2, 2, 2, 2],
            "sr_ratio": [8, 4, 2, 1], "num_heads": [1, 2, 4, 8],
            "mlp_ratios": [4, 4, 4, 4], "layer_scale_init_value": 1e-5}
    ref = RefTXN(image_size=64, arch=arch, num_classes=0, drop_path_rate=0.0)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = TransXNetBackbone(dims=(16, 32, 64, 128), depths=(1, 1, 2, 1),
                          img_size=64)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = transxnet_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(20).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_glnet_import_parity():
    """Faithful GLNet (GLMix slot attention + MHSA_NCHW hybrid) vs the
    reference GLNet.py with transplanted weights — covers glmix, hybrid, and
    mha_nchw stages."""
    from ultralytics.nn.modules.GLNet import GLNet as RefGLNet

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import glnet_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones4 import GLNetBackbone

    torch.manual_seed(41)
    ref = RefGLNet(depth=[1, 1, 2, 1], embed_dim=[16, 32, 64, 128],
                   mlp_ratios=[3, 3, 3, 3], head_dim=8,
                   norm_layer=torch.nn.BatchNorm2d,
                   mixing_modes=("glmix", "glmix", "glmix.mha_nchw", "mha_nchw"),
                   local_dw_ks=5, slot_init="ada_avgpool", num_slots=4,
                   cpe_ks=3, downsample_style="ovlp",
                   transition_layout="proj.norm", mlp_dw=True,
                   num_classes=0, drop_path_rate=0.0)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = GLNetBackbone(dims=(16, 32, 64, 128), depths=(1, 1, 2, 1),
                      head_dim=8, num_slots=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = glnet_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(22).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_emo2_import_parity():
    """Faithful EMOv2 (iiRMB with hybrid grid+window EW-MHSA) vs the
    reference EMOv2.py with transplanted weights — window 2 on a 4px stage-3
    grid makes the remote (grid) and close (window) partitions distinct."""
    from ultralytics.nn.modules.EMOv2 import EMO2 as RefEMO2

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import emo2_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones4 import EMO2Backbone

    torch.manual_seed(43)
    ref = RefEMO2(dim_in=3, img_size=64, depths=[2, 1, 2, 2],
                  embed_dims=[16, 32, 48, 64], exp_ratios=[2., 2., 2., 2.],
                  norm_layers=["bn_2d", "bn_2d", "ln_2d", "ln_2d"],
                  act_layers=["silu", "silu", "gelu", "gelu"],
                  dw_kss=[5, 5, 5, 5], dim_heads=[8, 8, 8, 8],
                  window_sizes=[2, 2, 2, 2], hybrid_eopss=[[0], [0], [3], [3]],
                  conv_kss=[1, 1, 1, 1], conv_groupss=[1, 1, 1, 1],
                  qkv_bias=True, drop_path=0.0, ls_value=1e-6, num_classes=0)
    ref.eval()
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = EMO2Backbone(dims=(16, 32, 48, 64), depths=(2, 1, 2, 2),
                     exp_ratios=(2., 2., 2., 2.), dim_heads=(8, 8, 8, 8),
                     window=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = emo2_state_dict_to_flax(v, sd, strict=True)

    x = np.random.default_rng(24).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def _enh_out_torch(mod, x_nchw):
    import torch

    mod.eval()
    with torch.no_grad():
        out = mod(torch.from_numpy(x_nchw))
    return out.numpy().transpose(0, 2, 3, 1)


def test_adnet_import_parity():
    """Faithful ADNet denoiser vs the reference ADNet.py with transplanted
    weights."""
    from ultralytics.nn.modules.ADNet import ADNet as RefADNet

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.enhancers import ADNet

    torch.manual_seed(47)
    ref = RefADNet(3)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.05)

    m = ADNet()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    import numpy as _np
    tree = jax.tree_util.tree_map(_np.asarray, v)
    tree = {"params": dict(tree["params"]),
            "batch_stats": dict(tree.get("batch_stats", {}))}
    for i in range(1, 16):
        tree["params"][f"conv{i}"] = {
            "kernel": sd[f"conv1_{i}.0.weight"].transpose(2, 3, 1, 0)}
        tree["params"][f"bn{i}"] = {"scale": sd[f"conv1_{i}.1.weight"],
                                    "bias": sd[f"conv1_{i}.1.bias"]}
        tree["batch_stats"][f"bn{i}"] = {
            "mean": sd[f"conv1_{i}.1.running_mean"],
            "var": sd[f"conv1_{i}.1.running_var"]}
    tree["params"]["conv16"] = {"kernel": sd["conv1_16.weight"].transpose(2, 3, 1, 0)}
    tree["params"]["conv_gate"] = {"kernel": sd["conv3.weight"].transpose(2, 3, 1, 0),
                                   "bias": sd["conv3.bias"]}

    x = np.random.default_rng(26).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    theirs = _enh_out_torch(ref, x)
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    err = np.max(np.abs(np.asarray(ours, np.float32) - theirs)) / (np.max(np.abs(theirs)) + 1e-8)
    assert err < 2e-3, f"rel err {err}"


def test_iat_import_parity():
    """Faithful IAT illumination-adaptive transformer vs the reference
    IAT.py with transplanted weights (local mul/add branches + global
    color-matrix/gamma queries)."""
    from ultralytics.nn.modules.IAT import IAT as RefIAT

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.enhancers import IAT

    torch.manual_seed(53)
    ref = RefIAT()
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.03)

    m = IAT()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    import numpy as _np
    tree = jax.tree_util.tree_map(_np.asarray, v)
    tree = {"params": {k: dict(vv) if hasattr(vv, "items") else vv
                       for k, vv in tree["params"].items()},
            "batch_stats": {k: dict(vv) for k, vv in tree.get("batch_stats", {}).items()}}
    P = tree["params"]

    def cw(w):
        return w.transpose(2, 3, 1, 0)

    P["conv1"] = {"kernel": cw(sd["local_net.conv1.weight"]),
                  "bias": sd["local_net.conv1.bias"]}
    for br, tb in (("mul", "mul_blocks"), ("add", "add_blocks")):
        for i in range(3):
            t = f"local_net.{tb}.{i}"
            P[f"{br}{i}"] = {
                "pos_embed": {"kernel": cw(sd[f"{t}.pos_embed.weight"]),
                              "bias": sd[f"{t}.pos_embed.bias"]},
                "norm1": {"alpha": sd[f"{t}.norm1.alpha"].reshape(-1),
                          "beta": sd[f"{t}.norm1.beta"].reshape(-1),
                          "color": sd[f"{t}.norm1.color"]},
                "norm2": {"alpha": sd[f"{t}.norm2.alpha"].reshape(-1),
                          "beta": sd[f"{t}.norm2.beta"].reshape(-1),
                          "color": sd[f"{t}.norm2.color"]},
                "conv1": {"kernel": cw(sd[f"{t}.conv1.weight"]), "bias": sd[f"{t}.conv1.bias"]},
                "conv2": {"kernel": cw(sd[f"{t}.conv2.weight"]), "bias": sd[f"{t}.conv2.bias"]},
                "attn": {"kernel": cw(sd[f"{t}.attn.weight"]), "bias": sd[f"{t}.attn.bias"]},
                "gamma_1": sd[f"{t}.gamma_1"].reshape(-1),
                "gamma_2": sd[f"{t}.gamma_2"].reshape(-1),
                "fc1": {"kernel": cw(sd[f"{t}.mlp.fc1.weight"]), "bias": sd[f"{t}.mlp.fc1.bias"]},
                "fc2": {"kernel": cw(sd[f"{t}.mlp.fc2.weight"]), "bias": sd[f"{t}.mlp.fc2.bias"]},
            }
    P["mul_end"] = {"kernel": cw(sd["local_net.mul_end.0.weight"]),
                    "bias": sd["local_net.mul_end.0.bias"]}
    P["add_end"] = {"kernel": cw(sd["local_net.add_end.0.weight"]),
                    "bias": sd["local_net.add_end.0.bias"]}
    g = "global_net"
    P["ge_conv1"] = {"kernel": cw(sd[f"{g}.conv_large.proj.0.weight"]),
                     "bias": sd[f"{g}.conv_large.proj.0.bias"]}
    P["ge_conv2"] = {"kernel": cw(sd[f"{g}.conv_large.proj.3.weight"]),
                     "bias": sd[f"{g}.conv_large.proj.3.bias"]}
    for bn, t in (("ge_bn1", f"{g}.conv_large.proj.1"), ("ge_bn2", f"{g}.conv_large.proj.4")):
        P[bn] = {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}
        tree["batch_stats"][bn] = {"mean": sd[f"{t}.running_mean"],
                                   "var": sd[f"{t}.running_var"]}
    gen = f"{g}.generator"
    P["gen_pos"] = {"kernel": cw(sd[f"{gen}.pos_embed.weight"]),
                    "bias": sd[f"{gen}.pos_embed.bias"]}
    P["gen_norm1"] = {"scale": sd[f"{gen}.norm1.weight"], "bias": sd[f"{gen}.norm1.bias"]}
    P["gen_norm2"] = {"scale": sd[f"{gen}.norm2.weight"], "bias": sd[f"{gen}.norm2.bias"]}
    P["q"] = sd[f"{gen}.attn.q"][0]
    P["gen_k"] = {"kernel": sd[f"{gen}.attn.k.weight"].T}
    P["gen_v"] = {"kernel": sd[f"{gen}.attn.v.weight"].T}
    P["gen_proj"] = {"kernel": sd[f"{gen}.attn.proj.weight"].T,
                     "bias": sd[f"{gen}.attn.proj.bias"]}
    P["gen_fc1"] = {"kernel": sd[f"{gen}.mlp.fc1.weight"].T, "bias": sd[f"{gen}.mlp.fc1.bias"]}
    P["gen_fc2"] = {"kernel": sd[f"{gen}.mlp.fc2.weight"].T, "bias": sd[f"{gen}.mlp.fc2.bias"]}
    P["gamma_base"] = sd[f"{g}.gamma_base"]
    P["color_base"] = sd[f"{g}.color_base"]
    P["gamma_linear"] = {"kernel": sd[f"{g}.gamma_linear.weight"].T,
                         "bias": sd[f"{g}.gamma_linear.bias"]}
    P["color_linear"] = {"kernel": sd[f"{g}.color_linear.weight"].T,
                         "bias": sd[f"{g}.color_linear.bias"]}

    x = np.random.default_rng(28).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    theirs = _enh_out_torch(ref, x)
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    err = np.max(np.abs(np.asarray(ours, np.float32) - theirs)) / (np.max(np.abs(theirs)) + 1e-8)
    assert err < 2e-3, f"rel err {err}"


def test_ridnet_import_parity():
    """Faithful RIDNet vs the reference RIDNet.py with transplanted weights
    (the forward uses only the b4 EAM block, like the reference)."""
    from ultralytics.nn.modules.RIDNet import RIDNET as RefRIDNET

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.enhancers import RIDNET

    torch.manual_seed(59)
    ref = RefRIDNET(3)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if "sub_mean" in n or "add_mean" in n:
                continue  # fixed mean-shift convs
            p.add_(torch.randn_like(p) * 0.05)

    m = RIDNET()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    import numpy as _np
    P = {k: dict(vv) if hasattr(vv, "items") else vv
         for k, vv in jax.tree_util.tree_map(_np.asarray, v)["params"].items()}

    def cv(name, tkey):
        P[name] = {"kernel": sd[f"{tkey}.weight"].transpose(2, 3, 1, 0),
                   "bias": sd[f"{tkey}.bias"]}

    cv("sub_mean", "sub_mean")
    cv("add_mean", "add_mean")
    cv("head", "head.body.0")
    cv("r1_b1_0", "b4.r1.body1.0")
    cv("r1_b1_2", "b4.r1.body1.2")
    cv("r1_b2_0", "b4.r1.body2.0")
    cv("r1_b2_2", "b4.r1.body2.2")
    cv("r1_b3", "b4.r1.body3.0")
    cv("r2_0", "b4.r2.body.0")
    cv("r2_2", "b4.r2.body.2")
    cv("r3_0", "b4.r3.body.0")
    cv("r3_2", "b4.r3.body.2")
    cv("r3_4", "b4.r3.body.4")
    cv("ca_c1", "b4.ca.c1.body.0")
    cv("ca_c2", "b4.ca.c2.body.0")
    cv("tail", "tail")

    x = np.random.default_rng(30).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    theirs = _enh_out_torch(ref, x)
    ours = m.apply({"params": P}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    err = np.max(np.abs(np.asarray(ours, np.float32) - theirs)) / (np.max(np.abs(theirs)) + 1e-8)
    assert err < 2e-3, f"rel err {err}"


def test_ffa_import_parity():
    """Faithful FFA-Net vs the reference FFANet.py with transplanted
    weights."""
    from ultralytics.nn.modules.FFANet import FFA as RefFFA

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.enhancers import FFA

    torch.manual_seed(61)
    ref = RefFFA(gps=3, blocks=1)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.05)

    m = FFA()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    import numpy as _np
    P = {k: dict(vv) if hasattr(vv, "items") else vv
         for k, vv in jax.tree_util.tree_map(_np.asarray, v)["params"].items()}

    def cv(name, tkey):
        P[name] = {"kernel": sd[f"{tkey}.weight"].transpose(2, 3, 1, 0),
                   "bias": sd[f"{tkey}.bias"]}

    cv("pre", "pre.0")
    for g in (1, 2, 3):
        cv(f"g{g}_b0_conv1", f"g{g}.gp.0.conv1")
        cv(f"g{g}_b0_conv2", f"g{g}.gp.0.conv2")
        cv(f"g{g}_b0_ca_0", f"g{g}.gp.0.calayer.ca.0")
        cv(f"g{g}_b0_ca_2", f"g{g}.gp.0.calayer.ca.2")
        cv(f"g{g}_b0_pa_0", f"g{g}.gp.0.palayer.pa.0")
        cv(f"g{g}_b0_pa_2", f"g{g}.gp.0.palayer.pa.2")
        cv(f"g{g}_tail", f"g{g}.gp.1")
    cv("fca_1", "ca.1")
    cv("fca_3", "ca.3")
    cv("pa_0", "palayer.pa.0")
    cv("pa_2", "palayer.pa.2")
    cv("post0", "post.0")
    cv("post1", "post.1")

    x = np.random.default_rng(32).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    theirs = _enh_out_torch(ref, x)
    ours = m.apply({"params": P}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    err = np.max(np.abs(np.asarray(ours, np.float32) - theirs)) / (np.max(np.abs(theirs)) + 1e-8)
    assert err < 2e-3, f"rel err {err}"


def test_cpa_arch_import_parity():
    """Faithful CPA-Enhancer vs the reference CPA.py with transplanted
    weights — including the prompt-block transformer weights the reference
    keeps in an unregistered python list (read off the live modules)."""
    from ultralytics.nn.modules.CPA import CPA_arch as RefCPA

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.enhancers import CPAArch

    torch.manual_seed(67)
    ref = RefCPA(3, 3, 4)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.03)

    m = CPAArch()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    import numpy as _np

    def deep(t):
        return ({k: deep(vv) for k, vv in t.items()} if hasattr(t, "items")
                else _np.asarray(t))

    tree = deep(v)
    P, BS = tree["params"], tree["batch_stats"]

    def cw(w):
        return w.transpose(2, 3, 1, 0)

    def rfa(name, t):
        P[name]["gw_pw"] = {"kernel": cw(sd[f"{t}.get_weight.1.weight"])}
        P[name]["gf_conv"] = {"kernel": cw(sd[f"{t}.generate_feature.0.weight"])}
        P[name]["gf_bn"] = {"scale": sd[f"{t}.generate_feature.1.weight"],
                            "bias": sd[f"{t}.generate_feature.1.bias"]}
        BS[name]["gf_bn"] = {"mean": sd[f"{t}.generate_feature.1.running_mean"],
                             "var": sd[f"{t}.generate_feature.1.running_var"]}
        P[name]["out_conv"] = {"kernel": cw(sd[f"{t}.conv.0.weight"]),
                               "bias": sd[f"{t}.conv.0.bias"]}
        P[name]["out_bn"] = {"scale": sd[f"{t}.conv.1.weight"],
                             "bias": sd[f"{t}.conv.1.bias"]}
        BS[name]["out_bn"] = {"mean": sd[f"{t}.conv.1.running_mean"],
                              "var": sd[f"{t}.conv.1.running_var"]}

    for i in range(8):
        rfa(f"conv{i}", f"conv{i}")
    for i in (1, 2, 3):
        P[f"down{i}"] = {"kernel": cw(sd[f"down{i}.body.0.weight"])}
        P[f"up{i}"] = {"kernel": cw(sd[f"up{i}.body.0.weight"])}
    P["prompt_param_ini"] = sd["prompt_param_ini"][0].transpose(1, 2, 0)
    for i in range(3):
        P[f"chain{i}_w"] = sd[f"myPromptParamGen.chain_prompts.{i}.weight"]
        P[f"chain{i}_b"] = sd[f"myPromptParamGen.chain_prompts.{i}.bias"]

    def tb(dst, src):  # transformer block from the LIVE torch module
        s2 = {k: t.detach().numpy() for k, t in src.state_dict().items()}
        dst["norm1"] = {"scale": s2["norm1.body.weight"], "bias": s2["norm1.body.bias"]}
        dst["norm2"] = {"scale": s2["norm2.body.weight"], "bias": s2["norm2.body.bias"]}
        dst["temperature"] = s2["attn.temperature"].reshape(-1)
        dst["qkv"] = {"kernel": cw(s2["attn.qkv.weight"])}
        dst["qkv_dw"] = {"kernel": cw(s2["attn.qkv_dwconv.weight"])}
        dst["proj_out"] = {"kernel": cw(s2["attn.project_out.weight"])}
        dst["ffn_in"] = {"kernel": cw(s2["ffn.project_in.weight"])}
        dst["ffn_dw"] = {"kernel": cw(s2["ffn.dwconv.weight"])}
        dst["ffn_out"] = {"kernel": cw(s2["ffn.project_out.weight"])}

    for pi, rp in (("prompt1", ref.prompt1), ("prompt2", ref.prompt2),
                   ("prompt3", ref.prompt3)):
        t = pi
        P[t]["ca_0"] = {"kernel": cw(sd[f"{t}.ca.ca.0.weight"]), "bias": sd[f"{t}.ca.ca.0.bias"]}
        P[t]["ca_2"] = {"kernel": cw(sd[f"{t}.ca.ca.2.weight"]), "bias": sd[f"{t}.ca.ca.2.bias"]}
        P[t]["sa"] = {"kernel": cw(sd[f"{t}.sa.sa.weight"]), "bias": sd[f"{t}.sa.sa.bias"]}
        P[t]["pa2"] = {"kernel": cw(sd[f"{t}.pa2.weight"]), "bias": sd[f"{t}.pa2.bias"]}
        P[t]["conv1x1"] = {"kernel": cw(sd[f"{t}.conv1x1.weight"])}
        P[t]["conv3x3"] = {"kernel": cw(sd[f"{t}.conv3x3.weight"])}
        P[t]["out_conv1"] = {"kernel": cw(sd[f"{t}.out_conv1.weight"])}
        for i in range(4):
            tb(P[t][f"tb{i}"], rp.transformer_block[i])

    x = np.random.default_rng(34).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    theirs = _enh_out_torch(ref, x)
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    err = np.max(np.abs(np.asarray(ours, np.float32) - theirs)) / (np.max(np.abs(theirs)) + 1e-8)
    assert err < 3e-3, f"rel err {err}"


def test_groupmixformer_import_parity():
    """Faithful GroupMixFormer (group-mix efficient attention + CRPE) vs the
    reference GroupMixFormer.py with transplanted weights."""
    from ultralytics.nn.modules.GroupMixFormer import MODEL_SPECS, GroupMixFormer as RefGMF

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbones4 import GroupMixFormerBackbone

    torch.manual_seed(71)
    MODEL_SPECS["GMFTest"] = {"embedding_dims": [16, 16, 32, 32],
                              "serial_depths": [1, 1, 2, 1],
                              "num_heads": [4, 4, 4, 4],
                              "mlp_ratios": [4, 4, 4, 4]}
    ref = RefGMF("GMFTest", drop_path_rate=0.0)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = GroupMixFormerBackbone(dims=(16, 16, 32, 32), depths=(1, 1, 2, 1))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    import numpy as _np

    def deep(t):
        return ({k: deep(vv) for k, vv in t.items()} if hasattr(t, "items")
                else _np.asarray(t))

    tree = deep(v)
    P, BS = tree["params"], tree["batch_stats"]

    def cw(w):
        return w.transpose(2, 3, 1, 0)

    def setbn(dst_p, dst_bs, t):
        dst_p.update({"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]})
        dst_bs.update({"mean": sd[f"{t}.running_mean"], "var": sd[f"{t}.running_var"]})

    P["stem_conv1"] = {"kernel": cw(sd["conv_stem.proj1.weight"]), "bias": sd["conv_stem.proj1.bias"]}
    P["stem_conv2"] = {"kernel": cw(sd["conv_stem.proj2.weight"]), "bias": sd["conv_stem.proj2.bias"]}
    setbn(P["stem_bn1"], BS["stem_bn1"], "conv_stem.norm1")
    setbn(P["stem_bn2"], BS["stem_bn2"], "conv_stem.norm2")
    for i in range(4):
        t = f"patch_embed_layers.{i}.proj"
        P[f"pe{i}_dw"] = {"kernel": cw(sd[f"{t}.depthwise_conv.weight"])}
        P[f"pe{i}_pw"] = {"kernel": cw(sd[f"{t}.pointwise_conv.weight"])}
        setbn(P[f"pe{i}_bn"], BS[f"pe{i}_bn"], f"patch_embed_layers.{i}.norm")
    depths = (1, 1, 2, 1)
    for si in range(4):
        for bi in range(depths[si]):
            t = f"groupmixformer_backbone.{si}.gma_stage.{bi}"
            d = P[f"s{si}_b{bi}"]
            dbs = BS[f"s{si}_b{bi}"]
            d["cpe"] = {"kernel": cw(sd[f"{t}.cpe.proj.weight"]), "bias": sd[f"{t}.cpe.proj.bias"]}
            for nrm in ("norm1", "norm2"):
                d[nrm] = {"scale": sd[f"{t}.{nrm}.weight"], "bias": sd[f"{t}.{nrm}.bias"]}
            d["fc1"] = {"kernel": sd[f"{t}.mlp.fc1.weight"].T, "bias": sd[f"{t}.mlp.fc1.bias"]}
            d["fc2"] = {"kernel": sd[f"{t}.mlp.fc2.weight"].T, "bias": sd[f"{t}.mlp.fc2.bias"]}
            a, abs_ = d["att"], dbs["att"]
            ta = f"{t}.att"
            a["qkv"] = {"kernel": sd[f"{ta}.qkv.weight"].T, "bias": sd[f"{ta}.qkv.bias"]}
            a["proj"] = {"kernel": sd[f"{ta}.proj.weight"].T, "bias": sd[f"{ta}.proj.bias"]}
            setbn(a["agg_norm0"], abs_["agg_norm0"], f"{ta}.aggregator.norm0")
            setbn(a["agg_norm1"], abs_["agg_norm1"], f"{ta}.aggregator.norm1")
            setbn(a["agg_norm2"], abs_["agg_norm2"], f"{ta}.aggregator.norm2")
            a["agg1_dw"] = {"kernel": cw(sd[f"{ta}.aggregator.agg1.depthwise_conv.weight"])}
            a["agg1_pw"] = {"kernel": cw(sd[f"{ta}.aggregator.agg1.pointwise_conv.weight"])}
            a["agg2_dw"] = {"kernel": cw(sd[f"{ta}.aggregator.agg2.depthwise_conv.weight"])}
            a["agg2_pw"] = {"kernel": cw(sd[f"{ta}.aggregator.agg2.pointwise_conv.weight"])}
            a["local_dw"] = {"kernel": cw(sd[f"{ta}.aggregator.agg_local_processor.conv.depthwise_conv.weight"])}
            a["local_pw"] = {"kernel": cw(sd[f"{ta}.aggregator.agg_local_processor.conv.pointwise_conv.weight"])}
            setbn(a["local_bn"], abs_["local_bn"], f"{ta}.aggregator.agg_local_processor.norm")
            for ci in range(3):
                a[f"crpe{ci}"] = {"kernel": cw(sd[f"{ta}.crpe.conv_list.{ci}.weight"]),
                                  "bias": sd[f"{ta}.crpe.conv_list.{ci}.bias"]}

    x = np.random.default_rng(36).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_lwganet_import_parity():
    """Faithful LWGANet (PA/LA/MRA/GA split block) vs the reference
    LWGANet.py with transplanted weights — covers GA12, pooled D_GA, and
    MHSA global branches plus the BlurPool-s3 MRA path."""
    from ultralytics.nn.modules.LWGANet import LWGANet as RefLWGA

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbones4 import LWGANetBackbone

    torch.manual_seed(73)
    ref = RefLWGA(in_chans=3, num_classes=0, stem_dim=16, depths=(1, 1, 1, 1),
                  att_kernel=(5, 5, 5, 5), act_layer=torch.nn.ReLU,
                  drop_path_rate=0.0, fork_feat=True, mlp_ratio=2.0)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = LWGANetBackbone(stem_dim=16, depths=(1, 1, 1, 1), att_kernel=5)
    # 128px: the BlurPool-s3 reflect pad inside MRA needs stage-3 maps >= 4px
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    import numpy as _np

    def deep(t):
        return ({k: deep(vv) for k, vv in t.items()} if hasattr(t, "items")
                else _np.asarray(t))

    tree = deep(v)
    P, BS = tree["params"], tree["batch_stats"]

    def cw(w):
        return w.transpose(2, 3, 1, 0)

    def setbn(pp, bb, t):
        pp.update({"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]})
        bb.update({"mean": sd[f"{t}.running_mean"], "var": sd[f"{t}.running_var"]})

    P["stem"] = {"kernel": cw(sd["stem.proj.weight"])}
    setbn(P["stem_bn"], BS["stem_bn"], "stem.norm")
    for si in range(4):
        setbn(P[f"norm_out{si}"], BS[f"norm_out{si}"], f"norm{si * 2}")
        if si < 3:
            t = f"stages.{si * 2 + 1}"
            P[f"drfd{si}_conv"] = {"kernel": cw(sd[f"{t}.conv.weight"]),
                                   "bias": sd[f"{t}.conv.bias"]}
            P[f"drfd{si}_conv_c"] = {"kernel": cw(sd[f"{t}.conv_c.weight"]),
                                     "bias": sd[f"{t}.conv_c.bias"]}
            setbn(P[f"drfd{si}_norm_c"], BS[f"drfd{si}_norm_c"], f"{t}.norm_c")
            setbn(P[f"drfd{si}_norm_m"], BS[f"drfd{si}_norm_m"], f"{t}.norm_m")
            P[f"drfd{si}_fusion"] = {"kernel": cw(sd[f"{t}.fusion.weight"]),
                                     "bias": sd[f"{t}.fusion.bias"]}

    def ga12(dst, dstbs, t):
        for n in ("proj_1", "conv0", "conv_spatial", "conv1", "conv2",
                  "conv_squeeze", "conv", "proj_2"):
            dst[n] = {"kernel": cw(sd[f"{t}.{n}.weight"]), "bias": sd[f"{t}.{n}.bias"]}

    for si in range(4):
        t = f"stages.{si * 2}.blocks.0"
        d, dbs = P[f"s{si}_b0"], BS[f"s{si}_b0"]
        d["pa_0"] = {"kernel": cw(sd[f"{t}.PA.p_conv.0.weight"])}
        setbn(d["pa_bn"], dbs["pa_bn"], f"{t}.PA.p_conv.1")
        d["pa_3"] = {"kernel": cw(sd[f"{t}.PA.p_conv.3.weight"])}
        d["la_conv"] = {"kernel": cw(sd[f"{t}.LA.conv.0.weight"])}
        setbn(d["la_bn"], dbs["la_bn"], f"{t}.LA.conv.1")
        for ours, theirs_ in (("mra_h1", "H_att1"), ("mra_v1", "V_att1"),
                              ("mra_h2", "H_att2"), ("mra_v2", "V_att2")):
            d[ours] = {"kernel": cw(sd[f"{t}.MRA.{theirs_}.weight"])}
        setbn(d["mra_bn"], dbs["mra_bn"], f"{t}.MRA.norm")
        if si == 3:
            d["ga_qkv"] = {"kernel": sd[f"{t}.GA_module.qkv.weight"].T}
            d["ga_proj"] = {"kernel": sd[f"{t}.GA_module.proj.weight"].T}
            setbn(d["ga_norm"], dbs["ga_norm"], f"{t}.norm_ga")
        elif si == 2:
            ga12(d["ga12"], dbs.get("ga12", {}), f"{t}.GA_module.attn")
            setbn(d["dga_norm"], dbs["dga_norm"], f"{t}.GA_module.norm")
        else:
            ga12(d["ga12"], dbs.get("ga12", {}), f"{t}.GA_module")
            setbn(d["ga_norm"], dbs["ga_norm"], f"{t}.norm_ga")
        d["mlp0"] = {"kernel": cw(sd[f"{t}.mlp.0.weight"])}
        setbn(d["mlp_bn"], dbs["mlp_bn"], f"{t}.mlp.1")
        d["mlp3"] = {"kernel": cw(sd[f"{t}.mlp.3.weight"])}
        setbn(d["norm1"], dbs["norm1"], f"{t}.norm1")

    x = np.random.default_rng(38).normal(0, 1, (2, 3, 128, 128)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_pkinet_import_parity():
    """Faithful PKINet (poly-kernel inception + CAA gating, summed CSP
    blocks) vs the reference PKINet.py with transplanted weights."""
    from ultralytics.nn.modules.PKINet import PKINet as RefPKI

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbones4 import PKINetBackbone

    torch.manual_seed(79)
    ks, dil = (3, 5, 7, 9, 11), (1, 1, 1, 1, 1)
    stages = [
        [8, 16, 1, ks, dil, 0.5, 4.0, 3, 0.0, 1e-6, True, 4.0, 5, True, True, 5],
        [16, 32, 1, ks, dil, 0.5, 4.0, 3, 0.0, 1e-6, True, 4.0, 7, True, True, 5],
        [32, 64, 2, ks, dil, 0.5, 4.0, 3, 0.0, 1e-6, True, 4.0, 9, True, True, 5],
        [64, 128, 1, ks, dil, 0.5, 4.0, 3, 0.0, 1e-6, True, 4.0, 11, True, True, 5],
    ]
    ref = RefPKI(c1=3, arch={"stages_params": stages}, out_indices=(1, 2, 3, 4),
                 drop_path_rate=0.0)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = PKINetBackbone(outs_ch=(16, 32, 64, 128), depths=(1, 1, 2, 1),
                       sc_ffn_scale=(4.0, 4.0, 4.0, 4.0),
                       sc_ffn_k=(5, 7, 9, 11), caa_kernel=5)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    import numpy as _np

    def deep(t):
        return ({k: deep(vv) for k, vv in t.items()} if hasattr(t, "items")
                else _np.asarray(t))

    tree = deep(v)
    P, BS = tree["params"], tree["batch_stats"]

    def cw(w):
        return w.transpose(2, 3, 1, 0)

    def cna(pname, bnname, t, dst_p=None, dst_bs=None):
        dst_p = P if dst_p is None else dst_p
        dst_bs = BS if dst_bs is None else dst_bs
        dst_p[pname] = {"kernel": cw(sd[f"{t}.conv.weight"])}
        dst_p[bnname] = {"scale": sd[f"{t}.norm.weight"], "bias": sd[f"{t}.norm.bias"]}
        dst_bs[bnname] = {"mean": sd[f"{t}.norm.running_mean"],
                          "var": sd[f"{t}.norm.running_var"]}

    def plain_ffn(dst, t):  # PKIConvFFN with_bn=False
        dst["ln"] = {"scale": sd[f"{t}.ln.weight"], "bias": sd[f"{t}.ln.bias"]}
        for ours, theirs_ in (("conv1", "conv1.conv"), ("dw", "dw_conv.conv"),
                              ("conv2", "conv2.conv")):
            dst[ours] = {"kernel": cw(sd[f"{t}.{theirs_}.weight"]),
                         "bias": sd[f"{t}.{theirs_}.bias"]}

    cna("stem_conv0", "stem_bn0", "stages_modulelist.0.down_conv")
    cna("stem_conv1", "stem_bn1", "stages_modulelist.0.conv1")
    cna("stem_conv2", "stem_bn2", "stages_modulelist.0.conv2")
    depths = (1, 1, 2, 1)
    for si in range(4):
        t = f"stages_modulelist.{si + 1}"
        cna(f"s{si}_down", f"s{si}_down_bn", f"{t}.downsample.down_conv")
        cna(f"s{si}_split", f"s{si}_split_bn", f"{t}.conv1_pre_split")
        cna(f"s{si}_merge", f"s{si}_merge_bn", f"{t}.conv2_post_merge")
        cna(f"s{si}_final", f"s{si}_final_bn", f"{t}.conv3_final")
        plain_ffn(P[f"s{si}_scffn"], f"{t}.ffn_shortcut")
        for bi in range(depths[si]):
            tb = f"{t}.blocks.{bi}"
            d, dbs = P[f"s{si}_b{bi}"], BS[f"s{si}_b{bi}"]
            for nrm in ("norm1", "norm2"):
                d[nrm] = {"scale": sd[f"{tb}.{nrm}.weight"], "bias": sd[f"{tb}.{nrm}.bias"]}
                dbs[nrm] = {"mean": sd[f"{tb}.{nrm}.running_mean"],
                            "var": sd[f"{tb}.{nrm}.running_var"]}
            cna("pre_conv", "pre_bn", f"{tb}.block.pre_conv", d, dbs)
            cna("pw_conv", "pw_bn", f"{tb}.block.pw_conv", d, dbs)
            cna("post_conv", "post_bn", f"{tb}.block.post_conv", d, dbs)
            for i in range(5):
                d[f"dw{i}"] = {"kernel": cw(sd[f"{tb}.block.dw_convs.{i}.conv.weight"]),
                               "bias": sd[f"{tb}.block.dw_convs.{i}.conv.bias"]}
            for ours, theirs_ in (("caa_conv1", "conv1"), ("caa_h", "h_conv"),
                                  ("caa_v", "v_conv"), ("caa_conv2", "conv2")):
                d[ours] = {"kernel": cw(sd[f"{tb}.block.caa_factor_module.{theirs_}.conv.weight"]),
                           "bias": sd[f"{tb}.block.caa_factor_module.{theirs_}.conv.bias"]}
            d["gamma1"] = sd[f"{tb}.gamma1"]
            d["gamma2"] = sd[f"{tb}.gamma2"]
            plain_ffn(d["ffn"], f"{tb}.ffn")

    x = np.random.default_rng(40).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_transnext_import_parity():
    """Faithful TransNeXt (aggregated pixel-focused attention + CGLU) vs the
    reference TransNeXt.py with transplanted weights."""
    from functools import partial

    from ultralytics.nn.modules.TransNeXt import TransNeXt as RefTNX

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbones4 import TransNeXtBackbone

    torch.manual_seed(83)
    dims, heads, depths = (16, 32, 64, 128), (2, 4, 8, 16), (1, 1, 2, 1)
    ref = RefTNX(img_size=64, window_size=[3, 3, 3, None], patch_size=4,
                 embed_dims=list(dims), num_heads=list(heads),
                 mlp_ratios=[8, 8, 4, 4], qkv_bias=True,
                 norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
                 depths=list(depths), sr_ratios=[8, 4, 2, 1])
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)

    m = TransNeXtBackbone(dims=dims, depths=depths, num_heads=heads,
                          mlp_ratios=(8, 8, 4, 4))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}

    def deep(t):
        return ({k: deep(vv) for k, vv in t.items()} if hasattr(t, "items")
                else np.asarray(t))

    tree = deep(v)
    P = tree["params"]

    def dense(dst, name, t):
        dst[name] = {"kernel": sd[f"{t}.weight"].T, "bias": sd[f"{t}.bias"]}

    def ln(dst, name, t):
        dst[name] = {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}

    for si in range(4):
        t = f"patch_embed{si + 1}"
        P[f"pe{si}"] = {"kernel": sd[f"{t}.proj.weight"].transpose(2, 3, 1, 0),
                        "bias": sd[f"{t}.proj.bias"]}
        ln(P, f"pe{si}_norm", f"{t}.norm")
        ln(P, f"norm_out{si}", f"norm{si + 1}")
        for bi in range(depths[si]):
            tb = f"block{si + 1}.{bi}"
            pre = f"s{si}_b{bi}"
            ln(P, f"{pre}_norm1", f"{tb}.norm1")
            ln(P, f"{pre}_norm2", f"{tb}.norm2")
            a = P[f"{pre}_attn"]
            if si == 3:
                dense(a, "qkv", f"{tb}.attn.qkv")
            else:
                dense(a, "q", f"{tb}.attn.q")
                dense(a, "kv", f"{tb}.attn.kv")
                a["sr"] = {"kernel": sd[f"{tb}.attn.sr.weight"].transpose(2, 3, 1, 0),
                           "bias": sd[f"{tb}.attn.sr.bias"]}
                ln(a, "norm", f"{tb}.attn.norm")
                a["relative_pos_bias_local"] = sd[f"{tb}.attn.relative_pos_bias_local"]
                a["learnable_tokens"] = sd[f"{tb}.attn.learnable_tokens"]
                a["learnable_bias"] = sd[f"{tb}.attn.learnable_bias"]
            dense(a, "proj", f"{tb}.attn.proj")
            dense(a, "cpb_fc1", f"{tb}.attn.cpb_fc1")
            dense(a, "cpb_fc2", f"{tb}.attn.cpb_fc2")
            a["query_embedding"] = sd[f"{tb}.attn.query_embedding"]
            a["temperature"] = sd[f"{tb}.attn.temperature"]
            ml = P[f"{pre}_mlp"]
            dense(ml, "fc1", f"{tb}.mlp.fc1")
            dense(ml, "fc2", f"{tb}.mlp.fc2")
            ml["dw"] = {"kernel": sd[f"{tb}.mlp.dwconv.dwconv.weight"].transpose(2, 3, 1, 0),
                        "bias": sd[f"{tb}.mlp.dwconv.dwconv.bias"]}

    x = np.random.default_rng(41).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_sgformer_import_parity():
    """Faithful SGFormer (global-local + mask-sorted sparsification attention)
    vs the reference SGFormer.py with transplanted weights.

    The saliency masks are nearest-upsampled plateaus whose constituents
    carry ~1e-9 summation noise, so WHICH equal-saliency token wins the
    sparsification cut is float-level chaos (the reference's own CPU and CUDA
    sorts disagree). Both sides are pinned to the same deterministic rule:
    quantize the sort key (1e-4 — far below plateau spacing, ~1e-3) and
    stable-sort, so plateaus become exact ties resolved by index order. Ours
    via sort_quant, the reference via a torch.sort wrapper."""
    from ultralytics.nn.modules.SGFormer import SGFormer as RefSG

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbones4 import SGFormerBackbone

    torch.manual_seed(29)
    dims, heads, depths = (16, 32, 64, 128), (2, 4, 8, 16), (2, 2, 2, 1)
    ref = RefSG(c1=3, arch={"embed_dims": list(dims), "num_heads": list(heads),
                            "depths": list(depths)},
                img_size=64, fork_feat=True)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if n != "pos_embed":
                p.add_(torch.randn_like(p) * 0.04)

    m = SGFormerBackbone(dims=dims, depths=depths, num_heads=heads,
                         sort_quant=1e-4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}

    def deep(t):
        return ({k: deep(vv) for k, vv in t.items()} if hasattr(t, "items")
                else np.asarray(t))

    tree = deep(v)
    P = tree["params"]
    P["pos_embed"] = sd["pos_embed"]

    def dense(dst, name, t):
        dst[name] = {"kernel": sd[f"{t}.weight"].T, "bias": sd[f"{t}.bias"]}

    def ln(dst, name, t):
        dst[name] = {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}

    def cgn(dst, name, t):
        dst[name] = {"c": {"kernel": sd[f"{t}.c.weight"].transpose(2, 3, 1, 0)},
                     "gn": {"scale": sd[f"{t}.bn.weight"],
                            "bias": sd[f"{t}.bn.bias"]}}

    for i, t in enumerate(["conv.0", "conv.2", "conv.4"]):
        cgn(P, f"pe0_c{i}", f"patch_embed1.{t}")
    ln(P, "pe0_norm", "patch_embed1.norm")
    for si in range(1, 4):
        for j in (1, 2, 3):
            cgn(P, f"pe{si}_c{j}", f"patch_embed{si + 1}.conv{j}")
        ln(P, f"pe{si}_norm", f"patch_embed{si + 1}.norm")
    for si in range(4):
        ln(P, f"norm_out{si}", f"norm{si + 1}")
        for bi in range(depths[si]):
            tb = f"block{si + 1}.{bi}"
            pre = f"s{si}_b{bi}"
            ln(P, f"{pre}_norm1", f"{tb}.norm1")
            ln(P, f"{pre}_norm2", f"{tb}.norm2")
            a = P[f"{pre}_attn"]
            if si == 3:
                dense(a, "q", f"{tb}.attn.q_sr1")
                dense(a, "kv", f"{tb}.attn.kv_sr1")
            elif bi % 2 == 1:
                dense(a, "q", f"{tb}.attn.q_cfg_true")
                dense(a, "kv1", f"{tb}.attn.kv1_cfg_true")
                dense(a, "kv2", f"{tb}.attn.kv2_cfg_true")
            else:
                dense(a, "q1", f"{tb}.attn.q1")
                dense(a, "kv1", f"{tb}.attn.kv1_cfg_false")
                dense(a, "q2", f"{tb}.attn.q2")
                dense(a, "kv2", f"{tb}.attn.kv2_cfg_false")
                a["sr"] = {"kernel": sd[f"{tb}.attn.sr.weight"].transpose(2, 3, 1, 0),
                           "bias": sd[f"{tb}.attn.sr.bias"]}
                ln(a, "norm", f"{tb}.attn.norm")
            dense(a, "lepe_linear", f"{tb}.attn.lepe_linear")
            a["lepe_conv"] = {"kernel": sd[f"{tb}.attn.lepe_conv.weight"].transpose(2, 3, 1, 0),
                              "bias": sd[f"{tb}.attn.lepe_conv.bias"]}
            dense(a, "proj", f"{tb}.attn.proj")
            ml = P[f"{pre}_mlp"]
            dense(ml, "fc1", f"{tb}.mlp.fc1")
            dense(ml, "fc2", f"{tb}.mlp.fc2")
            ml["dw"] = {"kernel": sd[f"{tb}.mlp.dwconv.dwconv.weight"].transpose(2, 3, 1, 0),
                        "bias": sd[f"{tb}.mlp.dwconv.dwconv.bias"]}

    x = np.random.default_rng(57).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    orig_sort = torch.sort
    try:
        def quant_stable_sort(t, *a, **k):
            k.setdefault("stable", True)
            return orig_sort(torch.round(t / 1e-4) * 1e-4, *a, **k)

        torch.sort = quant_stable_sort
        theirs = _stage_outs_torch(ref, x)
    finally:
        torch.sort = orig_sort
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_overlock_import_parity():
    """Faithful OverLoCK (RepConvBlock stages — the reference's shipped
    backbone forward, OverLoCK.py:785, runs only these; its ContMix
    sub-blocks exist solely for checkpoint loading) with transplanted
    weights."""
    from ultralytics.nn.modules.OverLoCK import OverLoCK as RefOL

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbones4 import OverLoCKBackbone

    torch.manual_seed(41)
    dims, depths, kernels = (16, 24, 32, 48), (1, 1, 1, 1), (17, 15, 13, 7)
    ref = RefOL(depth=list(depths), sub_depth=[1, 1], embed_dim=list(dims),
                kernel_size=list(kernels), mlp_ratio=[4, 4, 4, 4],
                sub_num_heads=[4, 6], sub_mlp_ratio=[3, 3],
                use_gemm=False)  # the env auto-stub fakes the iGEMM package
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.04)
        for mmod in ref.modules():
            if isinstance(mmod, torch.nn.BatchNorm2d):
                mmod.running_mean.add_(torch.randn_like(mmod.running_mean) * 0.02)
                mmod.running_var.add_(torch.rand_like(mmod.running_var) * 0.1)

    m = OverLoCKBackbone(dims=dims, depths=depths, kernels=kernels)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}

    def deep(t):
        return ({k: deep(vv) for k, vv in t.items()} if hasattr(t, "items")
                else np.asarray(t))

    tree = deep(v)
    P, BS = tree["params"], tree["batch_stats"]

    def cw(w):
        return w.transpose(2, 3, 1, 0)

    def bn(dst_bs, name, t):
        dst_bs[name] = {"mean": sd[f"{t}.running_mean"],
                        "var": sd[f"{t}.running_var"]}
        return {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}

    def convb(t):
        return {"kernel": cw(sd[f"{t}.weight"]), "bias": sd[f"{t}.bias"]}

    for i, (ci, bi_) in enumerate(zip((0, 3, 6, 9), (1, 4, 7, 10))):
        P[f"stem{i}"] = {"kernel": cw(sd[f"patch_embed1.{ci}.weight"])}
        P[f"stem{i}_bn"] = bn(BS, f"stem{i}_bn", f"patch_embed1.{bi_}")
    for si in (1, 2, 3):
        P[f"down{si}"] = {"kernel": cw(sd[f"patch_embed{si + 1}.0.weight"])}
        P[f"down{si}_bn"] = bn(BS, f"down{si}_bn", f"patch_embed{si + 1}.1")
    from ultralytics_pro_tpu.nn.modules.backbones4 import _OL_DRB_TABLE
    for si in range(4):
        for bi in range(depths[si]):
            t = f"blocks{si + 1}.{bi}"
            name = f"b{si}_{bi}"
            p, bs = P[name], BS.setdefault(name, {})
            p["dw"] = convb(f"{t}.dwconv")
            p["norm"] = {"scale": sd[f"{t}.proj.0.weight"],
                         "bias": sd[f"{t}.proj.0.bias"]}
            p["lk_origin"] = {"kernel": cw(sd[f"{t}.proj.1.lk_origin.weight"])}
            p["origin_bn"] = bn(bs, "origin_bn", f"{t}.proj.1.origin_bn")
            for kk, r in zip(*_OL_DRB_TABLE[kernels[si]]):
                p[f"dil_conv_k{kk}_{r}"] = {
                    "kernel": cw(sd[f"{t}.proj.1.dil_conv_k{kk}_{r}.weight"])}
                p[f"dil_bn_k{kk}_{r}"] = bn(bs, f"dil_bn_k{kk}_{r}",
                                            f"{t}.proj.1.dil_bn_k{kk}_{r}")
            p["drb_bn"] = bn(bs, "drb_bn", f"{t}.proj.2")
            p["se_fc0"] = {"kernel": sd[f"{t}.proj.3.proj.1.weight"][:, :, 0, 0].T,
                           "bias": sd[f"{t}.proj.3.proj.1.bias"]}
            p["se_fc1"] = {"kernel": sd[f"{t}.proj.3.proj.3.weight"][:, :, 0, 0].T,
                           "bias": sd[f"{t}.proj.3.proj.3.bias"]}
            p["fc1"] = convb(f"{t}.proj.4")
            p["mlp_dw"] = convb(f"{t}.proj.6")
            p["grn"] = {"gamma": sd[f"{t}.proj.7.gamma"].reshape(-1),
                        "beta": sd[f"{t}.proj.7.beta"].reshape(-1)}
            p["fc2"] = convb(f"{t}.proj.8")
            if si >= 2:
                p["ls_w"] = sd[f"{t}.ls.weight"].reshape(-1)
                p["ls_b"] = sd[f"{t}.ls.bias"]

    x = np.random.default_rng(63).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_kw_resnet_import_parity():
    """Faithful Kernel-Warehouse ResNet-18 (stage-shared cell warehouses +
    per-sample mixture attention assembling dynamic kernels) vs the reference
    KW_ResNet.py with transplanted weights."""
    from ultralytics.nn.modules.KW_ResNet import kw_resnet18

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbones4 import KWResNetBackbone

    torch.manual_seed(47)
    ref = kw_resnet18(input_channels=3, dummy_input_size=64)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.02)
        for mmod in ref.modules():
            if isinstance(mmod, torch.nn.BatchNorm2d):
                mmod.running_mean.add_(torch.randn_like(mmod.running_mean) * 0.02)
                mmod.running_var.add_(torch.rand_like(mmod.running_var) * 0.1)

    m = KWResNetBackbone()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}

    def deep(t):
        return ({k: deep(vv) for k, vv in t.items()} if hasattr(t, "items")
                else np.asarray(t))

    tree = deep(v)
    P, BS = tree["params"], tree["batch_stats"]

    def bn(name, t):
        BS[name] = {"mean": sd[f"{t}.running_mean"],
                    "var": sd[f"{t}.running_var"]}
        P[name] = {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}

    def att(prefix, t):
        P[f"{prefix}_fc1"] = {"kernel": sd[f"{t}.fc1.weight"].T,
                              "bias": sd[f"{t}.fc1.bias"]}
        P[f"{prefix}_ln"] = {"scale": sd[f"{t}.norm1.weight"],
                             "bias": sd[f"{t}.norm1.bias"]}
        P[f"{prefix}_fc2"] = {"kernel": sd[f"{t}.fc2.weight"].T,
                              "bias": sd[f"{t}.fc2.bias"]}

    for i in range(7):
        P[f"wh{i}"] = sd[f"warehouse_manager.weights.{i}"].reshape(
            *sd[f"warehouse_manager.weights.{i}"].shape[:3])
    P["stem"] = {"kernel": sd["conv1.weight"].transpose(2, 3, 1, 0)}
    bn("stem_bn", "bn1")
    for s in range(4):
        for b in range(2):
            t = f"layer{s + 1}.{b}"
            att(f"l{s}_{b}_c1", f"{t}.conv1.attention")
            att(f"l{s}_{b}_c2", f"{t}.conv2.attention")
            bn(f"l{s}_{b}_bn1", f"{t}.bn1")
            bn(f"l{s}_{b}_bn2", f"{t}.bn2")
        if s > 0:
            att(f"l{s}_ds", f"layer{s + 1}.0.downsample.0.attention")
            bn(f"l{s}_ds_bn", f"layer{s + 1}.0.downsample.1")

    x = np.random.default_rng(71).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_laudnet_import_parity():
    """Faithful LAUDNet uni_resnet50 (latency-aware dynamic channel + spatial
    hard masking on ResNet-50 bottlenecks) vs the reference LAUDNet.py in
    eval mode with transplanted weights."""
    from ultralytics.nn.modules.LAUDNet import uni_resnet50

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbones4 import LAUDResNetBackbone

    torch.manual_seed(53)
    ref = uni_resnet50(pretrained=False, input_size=64)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.02)
        for mmod in ref.modules():
            if isinstance(mmod, torch.nn.BatchNorm2d):
                mmod.running_mean.add_(torch.randn_like(mmod.running_mean) * 0.02)
                mmod.running_var.add_(torch.rand_like(mmod.running_var) * 0.1)

    m = LAUDResNetBackbone()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}

    def deep(t):
        return ({k: deep(vv) for k, vv in t.items()} if hasattr(t, "items")
                else np.asarray(t))

    tree = deep(v)
    P, BS = tree["params"], tree["batch_stats"]

    def cw(w):
        return w.transpose(2, 3, 1, 0)

    def bn(bsd, pd, name, t):
        bsd[name] = {"mean": sd[f"{t}.running_mean"],
                     "var": sd[f"{t}.running_var"]}
        pd[name] = {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}

    P["stem"] = {"kernel": cw(sd["conv1.weight"])}
    bn(BS, P, "stem_bn", "bn1")
    layers = (3, 4, 6, 3)
    for s in range(4):
        for b in range(layers[s]):
            t = f"layer{s + 1}.{b}"
            name = f"l{s}_{b}"
            p, bs = P[name], BS[name]
            for ci in (1, 2, 3):
                p[f"conv{ci}"] = {"kernel": cw(sd[f"{t}.conv{ci}.weight"])}
                bn(bs, p, f"bn{ci}", f"{t}.bn{ci}")
            p["cmask"] = {"kernel": sd[f"{t}.masker_channel.conv.weight"].T,
                          "bias": sd[f"{t}.masker_channel.conv.bias"]}
            p["smask"] = {"kernel": cw(sd[f"{t}.masker_spatial.conv.weight"]),
                          "bias": sd[f"{t}.masker_spatial.conv.bias"]}
            if b == 0:
                p["ds"] = {"kernel": cw(sd[f"{t}.downsample.0.weight"])}
                bn(bs, p, "ds_bn", f"{t}.downsample.1")

    x = np.random.default_rng(83).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        theirs = [o.numpy().transpose(0, 2, 3, 1)
                  for o in ref(torch.from_numpy(x), temperature=1.0)]
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_slabswin_import_parity():
    """Faithful SLAB Swin (RepBN eval norms, simplified linear attention 'L'
    stages + windowed MHSA 'S' stages) vs the reference
    SlabSwinTransformer.py with transplanted weights."""
    from ultralytics.nn.modules.SlabSwinTransformer import SlabSwinTransformer

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbones4 import SlabSwinBackbone

    torch.manual_seed(59)
    dims, heads, depths = 24, (3, 6, 12, 24), (1, 1, 2, 1)
    ref = SlabSwinTransformer(img_size=64, embed_dim=dims, depths=list(depths),
                              num_heads=list(heads), window_size=56,
                              attn_type="LLSS", drop_path_rate=0.0)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.03)
        for mmod in ref.modules():
            if isinstance(mmod, torch.nn.BatchNorm1d):
                mmod.running_mean.add_(torch.randn_like(mmod.running_mean) * 0.02)
                mmod.running_var.add_(torch.rand_like(mmod.running_var) * 0.1)

    m = SlabSwinBackbone(embed_dim=dims, depths=depths, num_heads=heads,
                         img_size=64)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}

    def deep(t):
        return ({k: deep(vv) for k, vv in t.items()} if hasattr(t, "items")
                else np.asarray(t))

    tree = deep(v)
    P, BS = tree["params"], tree["batch_stats"]

    def dense(dst, name, t, bias=True):
        dst[name] = {"kernel": sd[f"{t}.weight"].T}
        if bias:
            dst[name]["bias"] = sd[f"{t}.bias"]

    def repbn(pd, bsd, name, t):
        bsd[name] = {"mean": sd[f"{t}.norm2.bn.running_mean"],
                     "var": sd[f"{t}.norm2.bn.running_var"]}
        pd[name] = {"scale": sd[f"{t}.norm2.bn.weight"],
                    "bias": sd[f"{t}.norm2.bn.bias"]}
        pd[f"{name}_alpha"] = sd[f"{t}.norm2.alpha"]

    P["pe"] = {"kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
               "bias": sd["patch_embed.proj.bias"]}
    repbn(P, BS, "pe_norm", "patch_embed.norm")
    for si in range(4):
        repbn(P, BS, f"norm_out{si}", f"norm{si}")
        if si < 3:
            repbn(P, BS, f"pm{si}_norm", f"layers.{si}.downsample.norm")
            dense(P, f"pm{si}_red", f"layers.{si}.downsample.reduction",
                  bias=False)
        for bi in range(depths[si]):
            t = f"layers.{si}.blocks.{bi}"
            pre = f"s{si}_b{bi}"
            repbn(P, BS, f"{pre}_norm1", f"{t}.norm1")
            repbn(P, BS, f"{pre}_norm2", f"{t}.norm2")
            a = P[f"{pre}_attn"]
            dense(a, "qkv", f"{t}.attn.qkv")
            dense(a, "proj", f"{t}.attn.proj")
            if si < 2:
                a["pos"] = sd[f"{t}.attn.positional_encoding"]
                a["dwc"] = {"kernel": sd[f"{t}.attn.dwc.weight"].transpose(2, 3, 1, 0),
                            "bias": sd[f"{t}.attn.dwc.bias"]}
            else:
                a["rpb"] = sd[f"{t}.attn.relative_position_bias_table"]
            dense(P, f"{pre}_fc1", f"{t}.mlp.fc1")
            dense(P, f"{pre}_fc2", f"{t}.mlp.fc2")

    x = np.random.default_rng(91).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_slabpvt_import_parity():
    """Faithful SLAB PVTv2 (RepBN eval norms + relu-kernel linear attention
    with the reference's raw head-merge reshape and dead sr-norm) vs the
    reference SlabPVTv2.py with transplanted weights."""
    from ultralytics.nn.modules.SlabPVTv2 import SlabPyramidVisionTransformerV2

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbones4 import SlabPVTBackbone

    torch.manual_seed(61)
    dims, heads, depths = (16, 32, 80, 128), (1, 2, 5, 8), (1, 1, 2, 1)
    arch = {"embed_dims": list(dims), "num_heads": list(heads),
            "mlp_ratios": [8, 8, 4, 4], "depths": list(depths),
            "sr_ratios": [8, 4, 2, 1], "la_sr_ratios": "8421",
            "attn_type": "LLLL", "linear": False, "focusing_factor": 3,
            "kernel_size": 5}
    ref = SlabPyramidVisionTransformerV2(c1=3, arch=arch, img_size=64,
                                         fork_feat=True, drop_path_rate=0.0)
    with torch.no_grad():
        for n, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.03)
        for mmod in ref.modules():
            if isinstance(mmod, torch.nn.BatchNorm1d):
                mmod.running_mean.add_(torch.randn_like(mmod.running_mean) * 0.02)
                mmod.running_var.add_(torch.rand_like(mmod.running_var) * 0.1)

    m = SlabPVTBackbone(dims=dims, depths=depths, num_heads=heads)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}

    def deep(t):
        return ({k: deep(vv) for k, vv in t.items()} if hasattr(t, "items")
                else np.asarray(t))

    tree = deep(v)
    P, BS = tree["params"], tree["batch_stats"]

    def dense(dst, name, t):
        dst[name] = {"kernel": sd[f"{t}.weight"].T, "bias": sd[f"{t}.bias"]}

    def repbn(pd, bsd, name, t):
        bsd[name] = {"mean": sd[f"{t}.norm2.bn.running_mean"],
                     "var": sd[f"{t}.norm2.bn.running_var"]}
        pd[name] = {"scale": sd[f"{t}.norm2.bn.weight"],
                    "bias": sd[f"{t}.norm2.bn.bias"]}
        pd[f"{name}_alpha"] = sd[f"{t}.norm2.alpha"]

    def cw(w):
        return w.transpose(2, 3, 1, 0)

    for si in range(4):
        P[f"pe{si}"] = {"kernel": cw(sd[f"patch_embed{si + 1}.proj.weight"]),
                        "bias": sd[f"patch_embed{si + 1}.proj.bias"]}
        repbn(P, BS, f"pe{si}_norm", f"patch_embed{si + 1}.norm")
        repbn(P, BS, f"norm_out{si}", f"norm{si + 1}")
        for bi in range(depths[si]):
            t = f"block{si + 1}.{bi}"
            pre = f"s{si}_b{bi}"
            repbn(P, BS, f"{pre}_norm1", f"{t}.norm1")
            repbn(P, BS, f"{pre}_norm2", f"{t}.norm2")
            a = P[f"{pre}_attn"]
            dense(a, "q", f"{t}.attn.q")
            dense(a, "kv", f"{t}.attn.kv")
            dense(a, "proj", f"{t}.attn.proj")
            a["pos"] = sd[f"{t}.attn.positional_encoding"]
            a["dwc"] = {"kernel": cw(sd[f"{t}.attn.dwc.weight"]),
                        "bias": sd[f"{t}.attn.dwc.bias"]}
            if f"{t}.attn.sr.weight" in sd:
                a["sr"] = {"kernel": cw(sd[f"{t}.attn.sr.weight"]),
                           "bias": sd[f"{t}.attn.sr.bias"]}
            dense(P, f"{pre}_fc1", f"{t}.mlp.fc1")
            dense(P, f"{pre}_fc2", f"{t}.mlp.fc2")
            P[f"{pre}_dw"] = {"kernel": cw(sd[f"{t}.mlp.dwconv.dwconv.weight"]),
                              "bias": sd[f"{t}.mlp.dwconv.dwconv.bias"]}

    x = np.random.default_rng(97).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs, tol=2e-3)


def test_mb_taylorformer_import_parity():
    """Faithful MB-TaylorFormer (Taylor linear attention U-Net with
    deformable-dwconv patch embeds) vs the reference TaylorFormer.py with
    transplanted weights. The env stubs torchvision's DeformConv2d, so the
    test installs a pure-torch implementation of the official torchvision
    deform_conv2d semantics before building the reference."""
    import math

    import jax
    import jax.numpy as jnp
    import torch

    import ultralytics.nn.modules.TaylorFormer as reftf
    from ultralytics_pro_tpu.nn.modules.enhancers import MBTaylorFormer

    class RealDeformConv2d(torch.nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                     padding=1, bias=False, groups=1, dilation=1):
            super().__init__()
            assert kernel_size == 3 and stride == 1 and groups == in_channels
            self.padding = padding
            self.weight = torch.nn.Parameter(
                torch.randn(out_channels, 1, 3, 3) * 0.1)

        def forward(self, x, offset):
            B, C, H, W = x.shape
            off = offset.view(B, 9, 2, H, W)
            ys = torch.arange(H).view(1, 1, H, 1).float()
            xs = torch.arange(W).view(1, 1, 1, W).float()
            out = torch.zeros_like(x)
            flat = x.reshape(B, C, -1)
            for t in range(9):
                i, j = t // 3, t % 3
                sy = ys + (i - self.padding) + off[:, t, 0].unsqueeze(1)
                sx = xs + (j - self.padding) + off[:, t, 1].unsqueeze(1)
                y0, x0 = torch.floor(sy), torch.floor(sx)
                wy1, wx1 = sy - y0, sx - x0
                val = 0.0
                for yy, wy in ((y0, 1 - wy1), (y0 + 1, wy1)):
                    for xx, wx in ((x0, 1 - wx1), (x0 + 1, wx1)):
                        ok = ((yy >= 0) & (yy <= H - 1) & (xx >= 0)
                              & (xx <= W - 1)).float()
                        idx = (yy.clamp(0, H - 1).long() * W
                               + xx.clamp(0, W - 1).long())
                        idx = idx.expand(B, C, H, W).reshape(B, C, -1)
                        g = torch.gather(flat, 2, idx).reshape(B, C, H, W)
                        val = val + g * (ok * wy * wx).expand(B, C, H, W)
                out = out + val * self.weight[:, 0, i, j].view(1, C, 1, 1)
            return out

    orig_dcn = reftf.DeformConv2d
    try:
        reftf.DeformConv2d = RealDeformConv2d
        torch.manual_seed(67)
        ref = reftf.MB_TaylorFormer()
        with torch.no_grad():
            for n, p in ref.named_parameters():
                p.add_(torch.randn_like(p) * 0.03)
        ref.eval()
    finally:
        reftf.DeformConv2d = orig_dcn

    m = MBTaylorFormer()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}

    def deep(t):
        return ({k: deep(vv) for k, vv in t.items()} if hasattr(t, "items")
                else np.asarray(t))

    tree = deep(v)
    P = tree["params"]

    def cw(w):
        return w.transpose(2, 3, 1, 0)

    def conv(dst, name, t, bias=False):
        dst[name] = {"kernel": cw(sd[f"{t}.weight"])}
        if bias:
            dst[name]["bias"] = sd[f"{t}.bias"]

    def pe(name, t):
        conv(P[name], "off_dw", f"{t}.patch_conv.offset_generator.0")
        conv(P[name], "off_pw", f"{t}.patch_conv.offset_generator.1")
        P[name]["dcn"] = cw(sd[f"{t}.patch_conv.dcn.weight"])
        conv(P[name], "pw", f"{t}.patch_conv.pwconv")

    def stage(name, pe_t, enc_t, blocks, heads):
        pe(f"{name}_pe", f"{pe_t}.patch_embeds.0")
        for i in range(blocks):
            t = f"{enc_t}.mhca_blks.0.MHCA_layers.{i}"
            P[f"{name}_b{i}_ln1"] = sd[f"{t}.norm1.body.weight"]
            P[f"{name}_b{i}_ln2"] = sd[f"{t}.norm2.body.weight"]
            a = P[f"{name}_b{i}_attn"]
            conv(a, "qkv", f"{t}.attn.qkv")
            conv(a, "qkv_dw", f"{t}.attn.qkv_dwconv")
            conv(a, "proj", f"{t}.attn.project_out")
            a["temperature"] = sd[f"{t}.attn.temperature"]
            n_crpe = len([k for k in sd
                          if k.startswith(f"{t}.attn.refine_att.conv_list.")
                          and k.endswith(".weight")])
            for wi in range(n_crpe):
                conv(a, f"crpe{wi}", f"{t}.attn.refine_att.conv_list.{wi}",
                     bias=True)
            f = P[f"{name}_b{i}_ffn"]
            conv(f, "fc1", f"{t}.ffn.project_in")
            conv(f, "dw", f"{t}.ffn.dwconv")
            conv(f, "fc2", f"{t}.ffn.project_out")

    conv(P, "embed", "patch_embed.proj")
    stage("enc1", "patch_embed_encoder_level1", "encoder_level1", 1, 1)
    stage("enc2", "patch_embed_encoder_level2", "encoder_level2", 1, 1)
    stage("enc3", "patch_embed_encoder_level3", "encoder_level3", 1, 1)
    stage("latent", "patch_embed_latent", "latent", 1, 1)
    stage("dec3", "patch_embed_decoder_level3", "decoder_level3", 1, 1)
    stage("dec2", "patch_embed_decoder_level2", "decoder_level2", 1, 1)
    stage("dec1", "patch_embed_decoder_level1", "decoder_level1", 1, 1)
    stage("refine", "patch_embed_refinement", "refinement", 1, 1)
    for a, b in (("down12", "down1_2"), ("down23", "down2_3"),
                 ("down34", "down3_4")):
        conv(P, f"{a}_dw", f"{b}.body.0")
        conv(P, f"{a}_pw", f"{b}.body.1")
    for a, b in (("up43", "up4_3"), ("up32", "up3_2"), ("up21", "up2_1")):
        conv(P, f"{a}_dw", f"{b}.body.0")
        conv(P, f"{a}_pw", f"{b}.body.1")
    conv(P, "reduce3", "reduce_chan_level3.0")
    conv(P, "reduce2", "reduce_chan_level2.0")
    conv(P, "skip", "skip_conv")
    conv(P, "out", "output.0")

    x = np.random.default_rng(101).normal(0.4, 0.2, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    ours = m.apply(tree, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close([ours], [theirs], tol=2e-3)


def test_pvtv2_import_parity():
    from ultralytics.nn.modules.PVTv2 import PyramidVisionTransformerV2

    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics_pro_tpu.nn.modules.backbone_import import pvtv2_state_dict_to_flax
    from ultralytics_pro_tpu.nn.modules.backbones import PVTv2

    torch.manual_seed(11)
    arch = dict(embed_dims=[16, 32, 64, 128], num_heads=[1, 2, 4, 8],
                mlp_ratios=[8, 8, 4, 4], depths=[1, 1, 2, 1],
                sr_ratios=[8, 4, 2, 1], linear=False)
    ref = PyramidVisionTransformerV2(c1=3, arch=arch, fork_feat=True, drop_path_rate=0.0)
    with torch.no_grad():
        for _, p in ref.named_parameters():
            p.add_(torch.randn_like(p) * 0.02)

    x = np.random.default_rng(7).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    theirs = _stage_outs_torch(ref, x)

    m = PVTv2(dims=(16, 32, 64, 128), depths=(1, 1, 2, 1), heads=(1, 2, 4, 8),
              srs=(8, 4, 2, 1), mlp_ratios=(8.0, 8.0, 4.0, 4.0))
    import jax.random as jrandom
    v = m.init(jrandom.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    v = pvtv2_state_dict_to_flax(v, sd, strict=True)
    ours = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(ours, theirs)
