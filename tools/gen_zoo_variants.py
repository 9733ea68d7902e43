"""Generate ultralytics_pro_tpu/nn/modules/zoo_variants.py — the registry
closure for every backbone size-variant name the reference exports from
ultralytics.nn.modules but that our BUILDERS table does not yet carry.

Why: the reference's parse_model resolves ANY exported name via globals()[m]
(reference nn/tasks.py:2836-2842), so every export is YAML-reachable there. A
user's custom YAML naming e.g. ``caformer_b36`` must build here too.

How: each entry maps the reference factory name onto this repo's existing
backbone implementation for that family, sized with the published
architecture hyperparameters (extracted from the reference factory's literal
config where available — the numbers are architecture facts, not code).
Families without a dedicated faithful class ride StageBackbone with the
nearest token mixer; those are DECLARED structural approximations recorded in
COVERAGE.md, consistent with the zoo's existing policy (backbones4.py:1-15).

Every generated entry is VALIDATED by constructing the module and running
jax.eval_shape on a (1, 64, 64, 3) input before it is written out; entries
that fail are reported and omitted.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "ultralytics_pro_tpu", "nn", "modules", "zoo_variants.py")

CFGS = json.load(open("/tmp/variant_cfgs.json")) if os.path.exists("/tmp/variant_cfgs.json") else {}


def lit(name, key, default=None):
    """Literal kwarg from the reference factory's extracted config."""
    c = CFGS.get(name) or {}
    v = (c.get("kw") or {}).get(key, default)
    return default if v in (None, "<expr>") else v


def tup(x):
    if isinstance(x, (list, tuple)):
        return tuple(tup(v) for v in x)
    return x


ENTRIES = {}  # name -> (mod, cls, kwargs-dict, ref-file)


def add(name, mod, cls, ref, **kw):
    ENTRIES[name] = (mod, cls, {k: tup(v) for k, v in kw.items()}, ref)


def stage(name, ref, dims, depths, mixers, mlp_ratio=4.0):
    add(name, "backbones4", "StageBackbone", ref,
        dims=dims, depths=depths, mixers=mixers, mlp_ratio=mlp_ratio)


# ---------------------------------------------------------------- metaformer
# reference MetaFormer.py / poolformer.py: published dims/depths tables
MF_S, MF_M, MF_B = (64, 128, 320, 512), (96, 192, 384, 576), (128, 256, 512, 768)
POOL_M = (96, 192, 384, 768)
MF_DEPTHS = {"s12": (2, 2, 6, 2), "s18": (3, 3, 9, 3), "s24": (4, 4, 12, 4),
             "s36": (6, 6, 18, 6), "m36": (6, 6, 18, 6), "m48": (8, 8, 24, 8)}
for size in ("s12", "s24", "s36", "m36", "m48"):
    dims = POOL_M if size[0] == "m" else MF_S
    for fam, mix in (("poolformer", "pool"), ("poolformerv2", "pool"),
                     ("identityformer", "identity"), ("randformer", "random")):
        stage(f"{fam}_{size}", "MetaFormer.py", dims, MF_DEPTHS[size], mix)
CA_DEPTHS = {"s18": (3, 3, 9, 3), "s36": (3, 12, 18, 3),
             "m36": (3, 12, 18, 3), "b36": (3, 12, 18, 3)}
for size in ("s18", "s36", "m36", "b36"):
    dims = {"s": MF_S, "m": MF_M, "b": MF_B}[size[0]]
    stage(f"convformer_{size}", "MetaFormer.py", dims, CA_DEPTHS[size], "dwconv")
    stage(f"caformer_{size}", "MetaFormer.py", dims, CA_DEPTHS[size],
          ("dwconv", "dwconv", "attn", "attn"))

# dynamic/global-filter formers (reference DFFormer.py): fft global-filter
# mixer (exact for the shared-filter gfformer; declared approx for the
# token-dynamic dfformer/cdfformer filters)
for size in ("s18", "s36", "m36", "b36"):
    dims = {"s": MF_S, "m": MF_M, "b": MF_B}[size[0]]
    for fam in ("dfformer", "cdfformer"):
        stage(f"{fam}_{size}", "DFFormer.py", dims, CA_DEPTHS[size], "fft")
for abl in ("afno", "d8", "gelu", "relu", "k2"):
    stage(f"dfformer_s18_{abl}", "DFFormer.py", MF_S, CA_DEPTHS["s18"], "fft")
stage("gfformer_s18", "DFFormer.py", MF_S, CA_DEPTHS["s18"], "fft")

# ---------------------------------------------------------------------- VAN
for v in ("b1", "b2", "b3", "b4", "b5", "b6"):
    stage(f"van_{v}", "VAN.py",
          lit(f"van_{v}", "embed_dims", (64, 128, 320, 512)),
          lit(f"van_{v}", "depths", (3, 3, 12, 3)), "lka")

# ----------------------------------------------------------------- focalnet
# reference FocalNet.py: dims = embed_dim * 2**i; srf/lrf/fl3/fl4 differ in
# focal level/window, served by the same modulation block here
_FOCAL = {"tiny": (96, (2, 2, 6, 2)), "small": (96, (2, 2, 18, 2)),
          "base": (128, (2, 2, 18, 2)), "large": (192, (2, 2, 18, 2)),
          "xlarge": (256, (2, 2, 18, 2)), "huge": (352, (2, 2, 18, 2))}
for sz, (e, dep) in _FOCAL.items():
    for suf in (("srf", "lrf") if sz in ("tiny", "small", "base") else ("fl3", "fl4")):
        stage(f"focalnet_{sz}_{suf}", "FocalNet.py",
              (e, 2 * e, 4 * e, 8 * e), dep, "convmod")

# -------------------------------------------------------------------- hornet
for nm, bd in (("hornet_tiny_7x7", 64), ("hornet_tiny_gf", 64),
               ("hornet_small_7x7", 96), ("hornet_small_gf", 96),
               ("hornet_base_7x7", 128), ("hornet_base_gf", 128),
               ("hornet_base_gf_img384", 128), ("hornet_large_7x7", 192),
               ("hornet_large_gf", 192), ("hornet_large_gf_img384", 192)):
    add(nm, "backbones5", "HorNetBackbone", "HorNet.py",
        base_dim=bd, depths=(2, 3, 18, 2))

# --------------------------------------------------------------- vanillanet
# reference VanillaNet_backbone.py: N-stage stride stacks; served by the
# 4-stage VanillaNet at the zoo's scaled width (declared approximation)
for n in range(6, 14):
    add(f"vanillanet_{n}", "backbones3", "VanillaNet", "VanillaNet_backbone.py",
        dims=(64, 128, 256, 512))
add("vanillanet_13_x1_5", "backbones3", "VanillaNet", "VanillaNet_backbone.py",
    dims=(96, 192, 384, 768))
add("vanillanet_13_x1_5_ada_pool", "backbones3", "VanillaNet",
    "VanillaNet_backbone.py", dims=(96, 192, 384, 768))

# -------------------------------------------------------------- unireplknet
_URLK_DEP = {"f": (2, 2, 6, 2), "p": (2, 2, 6, 2), "n": (2, 2, 8, 2),
             "t": (3, 3, 18, 3), "s": (3, 3, 27, 3), "b": (3, 3, 27, 3),
             "l": (3, 3, 27, 3), "xl": (3, 3, 27, 3)}
for v, dep in _URLK_DEP.items():
    stage(f"unireplknet_{v}", "UniRepLknet.py",
          lit(f"unireplknet_{v}", "dims", (96, 192, 384, 768)), dep, "lka")

# ------------------------------------------------------------------- PVTv2
_PVT = {"b0": ((32, 64, 160, 256), (2, 2, 2, 2)),
        "b1": ((64, 128, 320, 512), (2, 2, 2, 2)),
        "b2": ((64, 128, 320, 512), (3, 4, 6, 3)),
        "b2_li": ((64, 128, 320, 512), (3, 4, 6, 3)),
        "b3": ((64, 128, 320, 512), (3, 4, 18, 3)),
        "b4": ((64, 128, 320, 512), (3, 8, 27, 3)),
        "b5": ((64, 128, 320, 512), (3, 6, 40, 3))}
for v, (dims, dep) in _PVT.items():
    heads = (1, 2, 5, 8)
    mr = (4.0, 4.0, 4.0, 4.0) if v == "b5" else (8.0, 8.0, 4.0, 4.0)
    add(f"pvtv2_{v}", "backbones", "PVTv2", "PVTv2.py",
        dims=dims, depths=dep, heads=heads, mlp_ratios=mr)
    if v in ("b3", "b4", "b5"):
        add(f"pvt_v2_{v}", "backbones", "PVTv2", "UNetv2.py",
            dims=dims, depths=dep, heads=heads, mlp_ratios=mr)
    if v != "b0":
        add(f"slab_pvt_v2_{v}", "backbones4", "SlabPVTBackbone", "SlabPVTv2.py",
            dims=dims, depths=dep, num_heads=heads)
for v, dep in (("tiny", (2, 2, 2, 2)), ("small", (3, 4, 6, 3)),
               ("medium", (3, 4, 18, 3)), ("large", (3, 8, 27, 3))):
    add(f"pola_pvt_{v}", "backbones", "PVTv2", "PolaFormer.py",
        dims=(64, 128, 320, 512), depths=dep)

# --------------------------------------------------------------------- swin
_SWIN = {"Tiny_c24": (96, (2, 2, 6, 2), (4, 8, 16, 32)),
         "Small": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
         "Base": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
         "Large": (192, (2, 2, 18, 2), (6, 12, 24, 48))}
for sz, (e, dep, heads) in _SWIN.items():
    kw = dict(dims=(e, 2 * e, 4 * e, 8 * e), depths=dep, heads=heads)
    add(f"SwinTransformer_{sz}", "backbones", "SwinTransformer",
        "SwinTransformer_backbone.py", **kw)
    if sz != "Tiny_c24":
        add(f"SwinTransformer_mona_{sz}", "backbones", "SwinTransformer",
            "SwinTransformer_Mona_backbone.py", **kw)
add("SwinTransformer_mona_Tiny", "backbones", "SwinTransformer",
    "SwinTransformer_Mona_backbone.py",
    dims=(96, 192, 384, 768), depths=(2, 2, 6, 2), heads=(3, 6, 12, 24))
_SWINV2 = {"t": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
           "s": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
           "b": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
           "l": (192, (2, 2, 18, 2), (6, 12, 24, 48)),
           "h": (352, (2, 2, 18, 2), (11, 22, 44, 88)),
           "g": (512, (2, 2, 42, 4), (16, 32, 64, 128))}
for sz, (e, dep, heads) in _SWINV2.items():
    add(f"swin_transformer_v2_{sz}", "backbones", "SwinTransformer",
        "SwinTransformerv2_backbone.py",
        dims=(e, 2 * e, 4 * e, 8 * e), depths=dep, heads=heads)
for sz, (e, dep, heads) in (("S", _SWINV2["s"]), ("B", _SWINV2["b"])):
    add(f"SlabSwinTransformer_{sz}", "backbones4", "SlabSwinBackbone",
        "SlabSwinTransformer.py", embed_dim=e, depths=dep, num_heads=heads)

# ----------------------------------------------------------------- convnext
_CNX = {"pico": ((2, 2, 6, 2), (64, 128, 256, 512), False),
        "small": ((3, 3, 27, 3), (96, 192, 384, 768), False),
        "base": ((3, 3, 27, 3), (128, 256, 512, 1024), False),
        "large": ((3, 3, 27, 3), (192, 384, 768, 1536), False),
        "xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048), False)}
for sz, (dep, dims, grn) in _CNX.items():
    add(f"convnext_{sz}", "backbones", "ConvNeXt", "ConvNeXtV1.py",
        depths=dep, dims=dims, grn=grn)
_CNX2 = {"femto": ((2, 2, 6, 2), (48, 96, 192, 384)),
         "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
         "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
         "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
         "huge": ((3, 3, 27, 3), (352, 704, 1408, 2816))}
for sz, (dep, dims) in _CNX2.items():
    add(f"convnextv2_{sz}", "backbones", "ConvNeXt", "ConvNeXtV2_backbone.py",
        depths=dep, dims=dims, grn=True)

# ------------------------------------------------------------------ resnets
_RES = {"18": ((2, 2, 2, 2), 1), "34": ((3, 4, 6, 3), 1), "50": ((3, 4, 6, 3), 4),
        "101": ((3, 4, 23, 3), 4), "152": ((3, 8, 36, 3), 4)}
for d, (dep, e) in _RES.items():
    add(f"ResNet{d}", "backbones4", "ResNetBackbone", "ResNet_backbone.py",
        depths=dep, e=e)
for d in ("34", "50", "101", "152"):
    add(f"resnet{d}_moe", "backbones4", "MoEResNetBackbone", "ResNet_MoE.py",
        depths=_RES[d][0])
add("kw_resnet50", "backbones4", "KWResNetBackbone", "KW_ResNet.py",
    layers=(3, 4, 6, 3))
add("uni_resnet101", "backbones4", "LAUDResNetBackbone", "LAUDNet.py",
    layers=(3, 4, 23, 3))
# attention-augmented resnets (sa/epsa/mspa/ortho): plain residual topology
# here — the per-family attention is a declared approximation (COVERAGE.md)
for fam, ref in (("sa_resnet", "SA_Net.py"), ("epsanet", "EPSANet.py"),
                 ("mspanet", "MSPANet.py"), ("orthonet", "OrthoNet.py")):
    for d in ("34", "50", "101", "152"):
        nm = f"{fam}{d}"
        if fam == "epsanet" and d in ("34", "152"):
            continue
        if fam == "mspanet" and d in ("34", "152"):
            continue
        if fam == "orthonet" and d == "34":
            add("orthonet34", "backbones4", "ResNetBackbone", ref,
                depths=(3, 4, 6, 3), e=1)
            continue
        add(nm, "backbones4", "ResNetBackbone", ref, depths=_RES[d][0], e=4)

# --------------------------------------------------------- repvgg / qarepvgg
_RVGG = {"A0": ((48, 96, 192, 1280), (2, 4, 14, 1)),
         "A1": ((64, 128, 256, 1280), (2, 4, 14, 1)),
         "A2": ((96, 192, 384, 1408), (2, 4, 14, 1)),
         "B0": ((64, 128, 256, 1280), (4, 6, 16, 1)),
         "B1": ((128, 256, 512, 2048), (4, 6, 16, 1)),
         "B1g2": ((128, 256, 512, 2048), (4, 6, 16, 1)),
         "B1g4": ((128, 256, 512, 2048), (4, 6, 16, 1)),
         "B2": ((160, 320, 640, 2560), (4, 6, 16, 1)),
         "B2g2": ((160, 320, 640, 2560), (4, 6, 16, 1)),
         "B2g4": ((160, 320, 640, 2560), (4, 6, 16, 1)),
         "B3": ((192, 384, 768, 2560), (4, 6, 16, 1)),
         "B3g2": ((192, 384, 768, 2560), (4, 6, 16, 1)),
         "B3g4": ((192, 384, 768, 2560), (4, 6, 16, 1)),
         "D2se": ((160, 320, 640, 2560), (8, 14, 24, 1))}
for v, (dims, dep) in _RVGG.items():
    add(f"RepVGG_{v}", "backbones4", "RepVGGBackbone", "RepVGG_backbone.py",
        dims=dims, depths=dep)
for v in ("A0", "A0_DW", "A0_PReLU", "A0_d01", "A1", "A2", "B0", "B1",
          "B1g2", "B1g4", "D2se"):
    base = v.split("_")[0]
    add(f"QARepVGGV2_{v}", "backbones4", "RepVGGBackbone", "QARepVGG.py",
        dims=_RVGG[base][0], depths=_RVGG[base][1])
add("QARepVGGV1_A0", "backbones4", "RepVGGBackbone", "QARepVGG.py",
    dims=_RVGG["A0"][0], depths=_RVGG["A0"][1])
add("QARepVGGV6_A0", "backbones4", "RepVGGBackbone", "QARepVGG.py",
    dims=_RVGG["A0"][0], depths=_RVGG["A0"][1])
add("QARepVGG_A0_ReLU6", "backbones4", "RepVGGBackbone", "QARepVGG.py",
    dims=_RVGG["A0"][0], depths=_RVGG["A0"][1])

# ---------------------------------------------------------------- the rest:
# families with a faithful class — sized variants
add("moganet_base", "backbones5", "MogaNetBackbone", "MogaNet.py",
    embed_dims=(64, 160, 320, 512), depths=(4, 6, 22, 3))
add("moganet_large", "backbones5", "MogaNetBackbone", "MogaNet.py",
    embed_dims=(64, 160, 320, 640), depths=(4, 6, 44, 4))
add("moganet_xlarge", "backbones5", "MogaNetBackbone", "MogaNet.py",
    embed_dims=(96, 192, 480, 960), depths=(6, 6, 44, 4))
add("inceptionnext_base_384", "backbones5", "InceptionNeXtBackbone",
    "InceptionNext.py", depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024))
add("maxvit_base", "backbones5", "MaxViTBackbone", "MaxViT.py",
    channels=(96, 192, 384, 768), depths=(2, 6, 14, 2))
add("maxvit_large", "backbones5", "MaxViTBackbone", "MaxViT.py",
    embed_dim=128, channels=(128, 256, 512, 1024), depths=(2, 6, 14, 2))
for sz, (dims, dep) in (("base", ((128, 256, 512, 1024), (3, 3, 27, 3))),
                        ("large", ((192, 384, 768, 1536), (3, 3, 27, 3))),
                        ("xlarge", ((256, 512, 1024, 2048), (3, 3, 27, 3)))):
    add(f"wtconvnext_{sz}", "backbones3", "WTConvNeXt", "WTConvNeXt.py",
        dims=dims, depths=dep)
add("vheat_small", "backbones4", "VHeatBackbone", "vHeat.py",
    dims=(96, 192, 384, 768), depths=(2, 2, 27, 2))
add("vheat_base", "backbones4", "VHeatBackbone", "vHeat.py",
    dims=(128, 256, 512, 1024), depths=(2, 2, 27, 2))
add("smt_t", "backbones4", "SMTBackbone", "SMT.py",
    dims=(64, 128, 256, 512), depths=(2, 2, 8, 1))
add("smt_s", "backbones4", "SMTBackbone", "SMT.py",
    dims=(64, 128, 256, 512), depths=(3, 4, 18, 2))
add("smt_b", "backbones4", "SMTBackbone", "SMT.py",
    dims=(64, 128, 256, 512), depths=(4, 6, 28, 2))
add("cosnet_small", "backbones4", "COSNetBackbone", "COSNet.py",
    base_dim=96, depths=(2, 2, 6, 2))
add("cosnet_base", "backbones4", "COSNetBackbone", "COSNet.py",
    base_dim=96, depths=(4, 4, 12, 4))
add("decouplenet_d0", "backbones4", "DecoupleNetBackbone", "DecoupleNet.py",
    embed_dim=32, depths=(1, 4, 4, 2))
add("decouplenet_d1", "backbones4", "DecoupleNetBackbone", "DecoupleNet.py",
    embed_dim=48, depths=(1, 6, 6, 2))
add("pkinet_s", "backbones4", "PKINetBackbone", "PKINet.py",
    outs_ch=(64, 128, 256, 512), depths=(4, 14, 22, 4))
add("pkinet_b", "backbones4", "PKINetBackbone", "PKINet.py",
    outs_ch=(80, 160, 320, 640), depths=(6, 16, 24, 6))
add("sgformer_m", "backbones4", "SGFormerBackbone", "SGFormer.py",
    dims=(64, 128, 256, 512), depths=(3, 6, 24, 2))
add("sgformer_b", "backbones4", "SGFormerBackbone", "SGFormer.py",
    dims=(96, 192, 384, 768), depths=(4, 8, 28, 2))
add("transxnet_small", "backbones4", "TransXNetBackbone", "TransXNet.py",
    dims=(64, 128, 320, 512), depths=(4, 4, 12, 4))
add("transxnet_base", "backbones4", "TransXNetBackbone", "TransXNet.py",
    dims=(76, 152, 336, 672), depths=(4, 4, 21, 4))
add("uninext_s", "backbones4", "UniNeXtBackbone", "UniNeXt.py",
    embed_dim=96, depths=(2, 2, 18, 2))
add("uninext_b", "backbones4", "UniNeXtBackbone", "UniNeXt.py",
    embed_dim=128, depths=(2, 2, 18, 2))
# num_heads/attention_heads are the reference factory literals
# (iFormer.py:560-603); the default attention_heads list is iformer_small's
# 18-block schedule and indexes out of range on deeper variants
add("iformer_base", "backbones4", "IFormerBackbone", "iFormer.py",
    dims=(96, 192, 384, 512), depths=(4, 6, 14, 6), num_heads=(3, 6, 12, 16),
    attention_heads=(1,) * 4 + (3,) * 6 + (8,) * 7 + (10,) * 7 + (15,) * 6)
add("iformer_large", "backbones4", "IFormerBackbone", "iFormer.py",
    dims=(96, 192, 448, 640), depths=(4, 6, 18, 8), num_heads=(3, 6, 14, 20),
    attention_heads=(1,) * 4 + (3,) * 6 + (10,) * 9 + (12,) * 9 + (19,) * 8)
add("stvit_base", "backbones4", "STViTBackbone", "STViT.py",
    dims=(96, 192, 384, 512), depths=(4, 6, 14, 6),
    num_heads=(2, 3, 6, 8), stoken=(8, 4, 1, 1))
add("stvit_large", "backbones4", "STViTBackbone", "STViT.py",
    dims=(96, 192, 448, 640), depths=(4, 7, 19, 8),
    num_heads=(2, 3, 7, 10), stoken=(8, 4, 1, 1))
add("EViT_Small", "backbones4", "EViTBackbone", "EViT.py",
    dims=(64, 128, 256, 512), stem_channel=32, depths=(3, 5, 9, 3),
    num_heads=(1, 2, 4, 8))
add("EViT_Base", "backbones4", "EViTBackbone", "EViT.py",
    dims=(64, 128, 256, 512), stem_channel=32, depths=(4, 8, 27, 4),
    num_heads=(2, 4, 8, 16))
add("EViT_Large", "backbones4", "EViTBackbone", "EViT.py",
    dims=(96, 192, 384, 768), stem_channel=48, depths=(4, 8, 27, 4),
    num_heads=(2, 4, 8, 16))
add("overlock_t", "backbones4", "OverLoCKBackbone", "OverLoCK.py",
    dims=(64, 128, 256, 512), depths=(4, 4, 6, 2))
add("overlock_s", "backbones4", "OverLoCKBackbone", "OverLoCK.py",
    dims=(64, 128, 320, 512), depths=(6, 6, 8, 3))
add("overlock_b", "backbones4", "OverLoCKBackbone", "OverLoCK.py",
    dims=(80, 160, 384, 576), depths=(8, 8, 10, 4))
add("LWGANet_L0_1242_e32_k11_GELU", "backbones4", "LWGANetBackbone",
    "LWGANet.py", stem_dim=32, depths=(1, 2, 4, 2), act="gelu")
add("LWGANet_L1_1242_e64_k11_GELU", "backbones4", "LWGANetBackbone",
    "LWGANet.py", stem_dim=64, depths=(1, 2, 4, 2), act="gelu")
for nm, kw in (("glnet_stl", dict(dims=(96, 192, 384, 768), depths=(2, 2, 6, 2),
                                  mixing=("glmix", "glmix", "glmix", "mha_nchw"))),
               ("glnet_stl_paramslot", dict(dims=(96, 192, 384, 768),
                                            depths=(2, 2, 6, 2))),
               ("glnet_9g", dict(dims=(96, 192, 384, 768), depths=(4, 4, 18, 4))),
               ("glnet_16g", dict(dims=(128, 256, 512, 1024), depths=(4, 4, 18, 4)))):
    add(nm, "backbones4", "GLNetBackbone", "GLNet.py", **kw)
for nm, kw in (("spanet_m", dict(dims=(96, 192, 384, 576), depths=(4, 4, 12, 4))),
               ("spanet_mx", dict(dims=(96, 192, 384, 576), depths=(4, 4, 12, 4))),
               ("spanet_b", dict(dims=(96, 192, 448, 640), depths=(6, 6, 18, 6))),
               ("spanet_bx", dict(dims=(96, 192, 448, 640), depths=(6, 6, 18, 6)))):
    add(nm, "backbones4", "SPANetBackbone", "SPANet.py", **kw)
add("GroupMixFormerMiny", "backbones4", "GroupMixFormerBackbone",
    "GroupMixFormer.py", dims=(64, 128, 160, 192), depths=(2, 2, 8, 2))
add("GroupMixFormerSmall", "backbones4", "GroupMixFormerBackbone",
    "GroupMixFormer.py", dims=(80, 160, 240, 320), depths=(4, 4, 16, 4))
add("GroupMixFormerBase", "backbones4", "GroupMixFormerBackbone",
    "GroupMixFormer.py", dims=(96, 192, 288, 384), depths=(6, 6, 22, 6))
add("GroupMixFormerLarge", "backbones4", "GroupMixFormerBackbone",
    "GroupMixFormer.py", dims=(128, 256, 384, 512), depths=(6, 6, 24, 6))
add("RepLKNet31L", "backbones4", "RepLKNetBackbone", "RepLKNet.py",
    dims=(192, 384, 768, 1536), depths=(2, 2, 18, 2))
add("RepLKNetXL", "backbones4", "RepLKNetBackbone", "RepLKNet.py",
    dims=(256, 512, 1024, 2048), depths=(2, 2, 18, 2), lk_sizes=(27, 27, 27, 13))
add("LSKNET_T", "backbones2", "LSKNet", "LSKNet.py",
    dims=(32, 64, 160, 256), depths=(3, 3, 5, 2))
add("LSKNET_S", "backbones2", "LSKNet", "LSKNet.py",
    dims=(64, 128, 320, 512), depths=(2, 2, 4, 2))
# Ghostnetv1 is EXACT: V1 shares V2's cfg table with the DFC gate removed
# (GhostNetv1.py:158). GhostNet_1_0 is the EXACT train-form GhostNetV3
# (reparam ghost modules + DFC gates, backbones5.GhostNetV3Backbone);
# GhostNet_Reparam is the EXACT parameternet_600m (ParameterNet.py:894 —
# same reparam machinery, 'ori' mode only, its own stage table).
add("Ghostnetv1", "backbones5", "GhostNetV2Backbone", "GhostNetv1.py",
    width=1.0, dfc_attn=False)
add("GhostNet_1_0", "backbones5", "GhostNetV3Backbone", "GhostNetv3.py",
    width=1.0)
add("GhostNet_Reparam", "backbones5", "ParameterNetBackbone",
    "ParameterNet.py", width=1.0)
add("fasternet_m", "backbones2", "FasterNet", "FasterNet.py",
    depths=(3, 4, 18, 3), dims=(144, 288, 576, 1152))
add("fasternet_l", "backbones2", "FasterNet", "FasterNet.py",
    depths=(3, 4, 18, 3), dims=(192, 384, 768, 1536))
for nm, (dims, dep) in (("repvit_m0_6", ((40, 80, 160, 320), (2, 2, 10, 2))),
                        ("repvit_m1_0", ((56, 112, 224, 448), (2, 2, 14, 2))),
                        ("repvit_m1_5", ((64, 128, 256, 512), (4, 4, 24, 4))),
                        ("repvit_m2_3", ((80, 160, 320, 640), (6, 6, 34, 2)))):
    add(nm, "backbones2", "RepViT", "repvit.py", dims=dims, depths=dep)
for nm, (stem, dep) in (("starnet_s050", (16, (1, 1, 3, 1))),
                        ("starnet_s100", (20, (1, 2, 4, 1))),
                        ("starnet_s150", (24, (1, 2, 4, 2))),
                        ("starnet_s3", (32, (2, 2, 8, 4))),
                        ("starnet_s4", (32, (3, 3, 12, 5)))):
    add(nm, "backbones2", "StarNet", "StarNet_backbone.py",
        dims=(stem, 2 * stem, 4 * stem, 8 * stem), depths=dep)
for nm in ("EdgeVitXXS", "EdgeVitXS", "EdgeVitS"):
    add(nm, "backbones3", "EdgeViT", "EdgeViT.py")
for nm in ("mobile_vit_small", "mobile_vit_x_small", "mobile_vit_xx_small",
           "mobile_vit2_xx_small"):
    add(nm, "backbones3", "MobileViT", "MobileViTv1.py")
add("MobileNetV4ConvLarge", "backbones2", "MobileNetV4", "MobileNetv4.py",
    dims=(48, 96, 192, 512), depths=(2, 3, 6, 4))
add("MobileNetV4HybridLarge", "backbones2", "MobileNetV4", "MobileNetv4.py",
    dims=(48, 96, 192, 512), depths=(2, 3, 6, 4))
# MobileNet v1/v2/v3 + shufflenet v1: inverted-residual stage stacks served
# by the MobileNetV4 assembly at per-variant widths (declared approximation)
_MBN = {"MobileNetV1": ((32, 64, 128, 256), (1, 2, 4, 2)),
        "MobileNetV2_n": ((16, 24, 48, 96), (1, 2, 4, 2)),
        "MobileNetV2_s": ((16, 32, 64, 160), (2, 3, 5, 3)),
        "MobileNetV2_m": ((24, 32, 96, 320), (2, 3, 7, 4)),
        "MobileNetV3_small_n": ((16, 24, 48, 96), (1, 2, 4, 2)),
        "MobileNetV3_small_s": ((16, 24, 48, 96), (1, 2, 5, 3)),
        "MobileNetV3_small_m": ((16, 24, 48, 96), (2, 2, 6, 3)),
        "MobileNetV3_large_n": ((16, 40, 80, 160), (1, 2, 4, 2)),
        "MobileNetV3_large_s": ((16, 40, 80, 160), (2, 2, 5, 3)),
        "MobileNetV3_large_m": ((16, 40, 112, 160), (2, 3, 6, 3))}
for nm, (dims, dep) in _MBN.items():
    ref = "MobileNetv1.py" if "V1" in nm else (
        "MobileNetv2.py" if "V2" in nm else "MobileNetv3.py")
    add(nm, "backbones2", "MobileNetV4", ref, dims=dims, depths=dep)
_SHV2 = {"05": (24, 48, 96, 192), "10": (24, 116, 232, 464),
         "15": (24, 176, 352, 704), "20": (24, 244, 488, 976)}
for v, dims in _SHV2.items():
    stage(f"shufflenetv2_{v}", "ShuffleNetV2.py", dims, (1, 4, 8, 4), "mbconv")
for g, w in (("G1", 144), ("G2", 200), ("G3", 240), ("G4", 272), ("G8", 384)):
    stage(f"ShuffleNet{g}", "ShuffleNetV1.py",
          (24, w, 2 * w, 4 * w), (1, 4, 8, 4), "mbconv")
for nm, (dims, dep) in (("EfficientViT_M1", ((16, 32, 64, 144), (1, 2, 3, 3))),
                        ("EfficientViT_M2", ((16, 32, 80, 192), (1, 2, 3, 3))),
                        ("EfficientViT_M3", ((16, 32, 128, 240), (1, 2, 3, 3))),
                        ("EfficientViT_M4", ((16, 32, 128, 256), (1, 2, 3, 3))),
                        ("EfficientViT_M5", ((24, 48, 192, 384), (1, 3, 3, 4)))):
    add(nm, "backbones", "EfficientViT", "EfficientViT_microsoft.py",
        dims=dims, depths=dep)
add("efficientvit_backbone_b2", "backbones", "EfficientViT",
    "EfficientViT_MIT.py", dims=(24, 48, 96, 192), depths=(2, 3, 4, 4))
add("efficientvit_backbone_b3", "backbones", "EfficientViT",
    "EfficientViT_MIT.py", dims=(32, 64, 128, 256), depths=(3, 4, 6, 6))
# dims/dim_heads/depths are the reference factory literals (EMO.py:383-420,
# EMOv2.py:771-898); dim_heads must divide dims (EW-MHSA reshape)
for nm, (dims, heads, dep) in (
        ("EMO_1M", ((32, 48, 80, 168), (16, 16, 20, 21), (2, 2, 8, 3))),
        ("EMO_2M", ((32, 48, 120, 200), (16, 16, 20, 20), (3, 3, 9, 3))),
        ("EMO_5M", ((48, 72, 160, 288), (24, 24, 32, 32), (3, 3, 9, 3))),
        ("EMO_6M", ((48, 72, 160, 320), (16, 24, 20, 32), (3, 3, 9, 3)))):
    add(nm, "backbones4", "EMO2Backbone", "EMO.py",
        dims=dims, dim_heads=heads, depths=dep)
_EMO2 = {"1M": ((32, 48, 80, 180), (16, 16, 20, 20), (2, 2, 8, 3)),
         "2M": ((32, 48, 120, 200), (16, 16, 20, 20), (3, 3, 9, 3)),
         "5M": ((48, 72, 160, 288), (16, 24, 32, 32), (3, 3, 9, 3)),
         "20M": ((64, 128, 320, 448), (16, 32, 32, 32), (3, 3, 13, 3)),
         "50M": ((64, 128, 384, 512), (16, 32, 32, 32), (5, 8, 20, 7))}
for sz, (dims, heads, dep) in _EMO2.items():
    for suf in ("", "_256", "_512"):
        nm = f"EMO2_{sz}_k5_hybrid{suf}"
        add(nm, "backbones4", "EMO2Backbone", "EMOv2.py",
            dims=dims, dim_heads=heads, depths=dep)

# ------------------------------------------------- StageBackbone new families
# (nearest-mixer structural approximations; declared in COVERAGE.md)
for nm in ("rest_lite", "rest_small", "rest_base", "rest_large"):
    stage(nm, "ResTv1.py", lit(nm, "embed_dims", (64, 128, 256, 512)),
          lit(nm, "depths", (2, 2, 6, 2)), "attn")
for nm in ("restv2_tiny", "restv2_small", "restv2_base", "restv2_large"):
    stage(nm, "ResTv2.py", lit(nm, "embed_dims", (96, 192, 384, 768)),
          lit(nm, "depths", (1, 2, 6, 2)), "attn")
for nm in ("RMT_T", "RMT_S", "RMT_B", "RMT_L"):
    stage(nm, "RMT.py", lit(nm, "embed_dims", (64, 128, 256, 512)),
          lit(nm, "depths", (2, 2, 8, 2)), "linattn", mlp_ratio=3.0)
for nm in ("MALA_T", "MALA_S", "MALA_B", "MALA_L"):
    stage(nm, "MALA.py", lit(nm, "embed_dims", (64, 128, 256, 512)),
          lit(nm, "depths", (2, 2, 6, 2)), "linattn", mlp_ratio=3.5)
for nm in ("RAVLT_T", "RAVLT_S", "RAVLT_B", "RAVLT_L"):
    stage(nm, "RAVLT.py", lit(nm, "embed_dims", (64, 128, 256, 512)),
          lit(nm, "depths", (2, 2, 6, 2)), "linattn", mlp_ratio=3.5)
for nm in ("svt_s", "svt_b", "svt_l"):
    stage(nm, "SVT.py", lit(nm, "embed_dims", (64, 128, 320, 448)),
          lit(nm, "depths", (3, 4, 6, 3)), "attn")
for nm in ("scalable_vit_s", "scalable_vit_b", "scalable_vit_l"):
    stage(nm, "ScalableViT.py", lit(nm, "embed_dims", (64, 128, 256, 512)),
          lit(nm, "depths", (2, 2, 20, 2)), "attn")
for nm in ("debi_tiny", "debi_small", "debi_base"):
    stage(nm, "DeBiFormer.py", lit(nm, "embed_dim", (64, 128, 256, 512)),
          lit(nm, "depth", (1, 1, 4, 1)), "attn", mlp_ratio=3.0)
for nm in ("fat_b0", "fat_b1", "fat_b2", "fat_b3"):
    stage(nm, "FAT.py", lit(nm, "embed_dims", (32, 80, 160, 256)),
          lit(nm, "depths", (2, 2, 6, 2)), ("dwconv", "dwconv", "attn", "attn"))
for nm, e in (("convit_tiny_backbone", 48), ("convit_small_backbone", 96),
              ("convit_base_backbone", 192)):
    stage(nm, "ConViT.py", (e, 2 * e, 4 * e, 8 * e), (2, 2, 6, 2),
          ("dwconv", "dwconv", "attn", "attn"))
for nm in ("mpvit_tiny", "mpvit_xsmall", "mpvit_small", "mpvit_base"):
    stage(nm, "MPViT.py", lit(nm, "embed_dims", (64, 96, 176, 216)),
          lit(nm, "num_layers", (1, 2, 4, 1)), "attn")
_SLAK = {"tiny": ((96, 192, 384, 768), (3, 3, 9, 3)),
         "small": ((96, 192, 384, 768), (3, 3, 27, 3)),
         "base": ((128, 256, 512, 1024), (3, 3, 27, 3)),
         "large": ((192, 384, 768, 1536), (3, 3, 27, 3))}
for sz, (dims, dep) in _SLAK.items():
    stage(f"slak_{sz}", "SLaK.py", dims, dep, "lka")
_NEXTVIT = {"small": (3, 4, 10, 3), "base": (3, 4, 20, 3), "large": (3, 4, 30, 3)}
for sz, dep in _NEXTVIT.items():
    stage(f"nextvit_{sz}", "NextViT.py", (96, 192, 384, 768), dep,
          ("mbconv", "mbconv", "attn", "attn"))
_MOUT = {"femto": ((48, 96, 192, 288), (3, 3, 9, 3)),
         "kobe": ((48, 96, 192, 288), (3, 3, 15, 3)),
         "tiny": ((96, 192, 384, 576), (3, 3, 9, 3)),
         "small": ((96, 192, 384, 576), (3, 4, 27, 3)),
         "base": ((128, 256, 512, 768), (3, 4, 27, 3))}
for sz, (dims, dep) in _MOUT.items():
    stage(f"mambaout_{sz}", "MambaOut.py", dims, dep, "convmod")
_RDNET = {"tiny": ((64, 128, 256, 512), (3, 3, 9, 3)),
          "small": ((72, 144, 288, 576), (3, 3, 18, 3)),
          "base": ((96, 192, 384, 768), (3, 3, 24, 3)),
          "large": ((128, 256, 512, 1024), (3, 3, 27, 3))}
for sz, (dims, dep) in _RDNET.items():
    stage(f"rdnet_{sz}", "RDNet.py", dims, dep, "dwconv")
_REVCOL = {"tiny": ((64, 128, 256, 512), (2, 2, 4, 2)),
           "small": ((64, 128, 256, 512), (2, 2, 6, 2)),
           "base": ((72, 144, 288, 576), (2, 2, 6, 2)),
           "large": ((128, 256, 512, 1024), (3, 3, 9, 3)),
           "xlarge": ((224, 448, 896, 1792), (3, 3, 9, 3))}
for sz, (dims, dep) in _REVCOL.items():
    stage(f"revcol_{sz}", "RevCol.py", dims, dep, "dwconv")
for nm in ("RCViT_XS", "RCViT_S", "RCViT_M", "RCViT_T"):
    stage(nm, "CAS_ViT.py", lit(nm, "embed_dims", (48, 56, 112, 220)),
          lit(nm, "layers", (2, 2, 4, 2)), "cga")
_SHVIT = {"S1": ((32, 64, 128, 224), (1, 2, 4, 2)),
          "S2": ((48, 96, 192, 336), (1, 2, 4, 2)),
          "S3": ((64, 128, 256, 448), (2, 3, 5, 3)),
          "S4": ((64, 128, 288, 448), (2, 4, 6, 4))}
for sz, (dims, dep) in _SHVIT.items():
    stage(f"SHViT_{sz}", "SHViT.py", dims, dep, "attn")
_SWIFT = {"XS": ((48, 56, 112, 220), (3, 3, 6, 4)),
          "S": ((48, 64, 168, 224), (3, 3, 9, 6)),
          "L1": ((48, 96, 192, 384), (4, 3, 10, 5)),
          "L3": ((64, 128, 320, 512), (4, 4, 12, 6))}
for sz, (dims, dep) in _SWIFT.items():
    stage(f"SwiftFormer_{sz}", "SwiftFormer.py", dims, dep, "linattn")
_SBC = {"xs": ((32, 96, 160, 288), (1, 2, 3, 2)),
        "s": ((32, 96, 192, 320), (1, 2, 4, 3)),
        "b": ((40, 128, 256, 384), (1, 2, 4, 3)),
        "l": ((48, 192, 288, 384), (1, 2, 4, 3))}
for sz, (dims, dep) in _SBC.items():
    stage(f"sbcformer_{sz}", "SBCFormer.py", dims, dep,
          ("mbconv", "mbconv", "attn", "attn"))
for nm, (dims, dep) in (("fanet_tiny", ((64, 128, 256, 512), (2, 2, 6, 2))),
                        ("fanet_small", ((64, 128, 256, 512), (3, 3, 9, 3)))):
    stage(nm, "FaNet.py", dims, dep, "dwconv")
for nm in ("parcnetv2_xt", "parcnetv2_tiny", "parcnetv2_small", "parcnetv2_base"):
    stage(nm, "ParCNetV2.py", lit(nm, "dims", (48, 96, 192, 320)),
          lit(nm, "depths", (3, 3, 9, 2)), "convmod")
_NFNET = {"F0": (1, 2, 6, 3), "F1": (2, 4, 12, 6), "F2": (3, 6, 18, 9),
          "F3": (4, 8, 24, 12), "F4": (5, 10, 30, 15), "F5": (6, 12, 36, 18),
          "F6": (7, 14, 42, 21), "F7": (8, 16, 48, 24)}
for sz, dep in _NFNET.items():
    stage(f"NFNet{sz}", "NFNet.py", (256, 512, 1536, 1536), dep, "mbconv")
_FASTVIT = {"t8": ((48, 96, 192, 384), (2, 2, 4, 2), "dwconv"),
            "t12": ((64, 128, 256, 512), (2, 2, 6, 2), "dwconv"),
            "s12": ((64, 128, 256, 512), (2, 2, 6, 2), "dwconv"),
            "sa12": ((64, 128, 256, 512), (2, 2, 6, 2),
                     ("dwconv", "dwconv", "dwconv", "attn")),
            "sa24": ((64, 128, 256, 512), (4, 4, 12, 4),
                     ("dwconv", "dwconv", "dwconv", "attn")),
            "sa36": ((64, 128, 256, 512), (6, 6, 18, 6),
                     ("dwconv", "dwconv", "dwconv", "attn")),
            "ma36": ((76, 152, 304, 608), (6, 6, 18, 6),
                     ("dwconv", "dwconv", "dwconv", "attn"))}
for sz, (dims, dep, mix) in _FASTVIT.items():
    stage(f"fastvit_{sz}", "FastViT.py", dims, dep, mix)
stage("FastViT", "FastViT.py", (48, 96, 192, 384), (2, 2, 4, 2), "dwconv")
for nm, (dims, dep) in (("uniformer_light_xxs", ((48, 96, 192, 384), (2, 5, 8, 2))),
                        ("uniformer_light_xs", ((56, 112, 224, 448), (3, 5, 9, 3)))):
    stage(nm, "UniFormer.py", dims, dep, ("dwconv", "dwconv", "attn", "attn"))
_MVIG = {"mobilevigv2_ti": ((32, 64, 128, 256), (2, 2, 6, 2)),
         "mobilevigv2_s": ((48, 96, 192, 384), (2, 2, 6, 2)),
         "mobilevigv2_m": ((64, 128, 256, 512), (2, 2, 8, 2)),
         "mobilevigv2_b": ((96, 192, 384, 768), (2, 2, 8, 2)),
         "MobileViG": ((48, 96, 192, 384), (2, 2, 6, 2)),
         "GreedyViG_S": ((48, 96, 192, 384), (2, 2, 6, 2)),
         "GreedyViG_M": ((64, 128, 256, 512), (2, 2, 8, 2)),
         "GreedyViG_B": ((96, 192, 384, 768), (2, 2, 8, 2))}
for nm, (dims, dep) in _MVIG.items():
    ref = "GreedyViG.py" if "Greedy" in nm else "MobileViGv2.py"
    stage(nm, ref, dims, dep, "mbconv")
_GCVIT = {"xxtiny": (64, (2, 2, 6, 2)), "xtiny": (64, (3, 4, 6, 5)),
          "tiny": (64, (3, 4, 19, 5)), "tiny2": (64, (3, 4, 19, 5)),
          "small": (96, (3, 4, 19, 5)), "small2": (96, (3, 4, 19, 5)),
          "base": (128, (3, 4, 19, 5)), "large": (192, (3, 4, 19, 5)),
          "large_224_21k": (192, (3, 4, 19, 5)),
          "large_384_21k": (192, (3, 4, 19, 5)),
          "large_512_21k": (192, (3, 4, 19, 5))}
for sz, (e, dep) in _GCVIT.items():
    stage(f"gc_vit_{sz}", "GCViT.py", (e, 2 * e, 4 * e, 8 * e), dep, "attn")
_LSNET = {"T": ((64, 128, 256, 384), (2, 2, 8, 2)),
          "S": ((96, 192, 320, 448), (2, 2, 8, 2)),
          "B": ((128, 256, 384, 512), (4, 6, 8, 10))}
for sz, (dims, dep) in _LSNET.items():
    stage(f"LSNet_{sz}", "LSNet.py", dims, dep, "dwconv")
for nm, (e, dep) in (("DFormerv2_S", (64, (2, 2, 8, 2))),
                     ("DFormerv2_B", (80, (3, 3, 12, 3))),
                     ("DFormerv2_L", (112, (3, 3, 12, 3)))):
    stage(nm, "DFormerv2.py", (e, 2 * e, 4 * e, 8 * e), dep, "attn")
stage("MLLA_Small", "MLLA_backbone.py", (96, 192, 384, 768), (2, 4, 12, 4),
      "linattn", mlp_ratio=2.0)
stage("MLLA_Base", "MLLA_backbone.py", (112, 224, 448, 896), (4, 8, 24, 8),
      "linattn", mlp_ratio=2.0)
stage("StripNet_small", "StripNet.py", (64, 128, 320, 512), (2, 2, 4, 2), "strip")
stage("StripMLPNet_Tiny", "StripMLP.py", (80, 160, 320, 640), (2, 2, 12, 2), "strip")
stage("StripMLPNet_Small", "StripMLP.py", (96, 192, 384, 768), (2, 2, 18, 2), "strip")
stage("StripMLPNet_Base", "StripMLP.py", (112, 224, 448, 896), (2, 2, 18, 2), "strip")
for sz, (dims, dep) in (("M1", ((32, 64, 128, 192), (1, 2, 2, 2))),
                        ("M2", ((32, 64, 128, 224), (1, 2, 2, 2))),
                        ("M3", ((48, 96, 160, 256), (1, 2, 2, 2))),
                        ("M4", ((48, 96, 192, 320), (2, 2, 2, 2)))):
    stage(f"EfficientViM_{sz}", "EfficientViM.py", dims, dep, "ss2d")
for sz in ("t", "s", "b", "l", "b_22k"):
    dims = {"t": (72, 144, 288, 576), "s": (72, 144, 288, 576),
            "b": (96, 192, 384, 768), "l": (128, 256, 512, 1024),
            "b_22k": (96, 192, 384, 768)}[sz]
    dep = {"t": (3, 3, 12, 3), "s": (4, 4, 32, 4), "b": (4, 4, 34, 4),
           "l": (4, 4, 48, 4), "b_22k": (4, 4, 34, 4)}[sz]
    stage(f"conv2former_{sz}", "Conv2Former.py", dims, dep, "convmod")
stage("efficient", "RevCol.py", (64, 128, 256, 512), (2, 2, 6, 2), "dwconv")
stage("OverLoCK", "OverLoCK.py", (56, 112, 256, 336), (2, 2, 3, 2), "convmod")


def validate():
    import importlib

    ok, fail = {}, []
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for name, (mod, cls, kw, ref) in sorted(ENTRIES.items()):
        try:
            c = getattr(importlib.import_module(
                f"ultralytics_pro_tpu.nn.modules.{mod}"), cls)
            m = c(**kw)
            outs = jax.eval_shape(
                lambda xx, mm=m: mm.init_with_output(
                    jax.random.PRNGKey(0), xx, train=False)[0], x)
            n = len(outs) if isinstance(outs, (list, tuple)) else 1
            assert n >= 4, f"returns {n} maps"
            ok[name] = (mod, cls, kw, ref)
        except Exception as e:  # noqa: BLE001
            fail.append((name, f"{type(e).__name__}: {e}"[:140]))
    return ok, fail


def emit(ok):
    lines = [
        '"""Registry-closure variant table (GENERATED by tools/gen_zoo_variants.py',
        "— edit the generator, not this file).",
        "",
        "Every name below is exported by the reference's ultralytics.nn.modules and",
        "is therefore YAML-reachable via parse_model's globals()[m] lookup",
        "(reference nn/tasks.py:2836-2842). Entries size this repo's existing",
        "backbone implementations with the published architecture hyperparameters;",
        "families served by StageBackbone + nearest mixer are declared structural",
        'approximations (see COVERAGE.md). Reference file per entry in the tuple."""',
        "",
        "EXTRA_VARIANTS = {",
    ]
    for name, (mod, cls, kw, ref) in sorted(ok.items()):
        kwt = tuple(sorted(kw.items()))
        lines.append(f"    {name!r}: ({mod!r}, {cls!r}, {kwt!r}, {ref!r}),")
    lines.append("}")
    open(OUT, "w").write("\n".join(lines) + "\n")


if __name__ == "__main__":
    ok, fail = validate()
    emit(ok)
    print(f"wrote {len(ok)} entries to {OUT}")
    if fail:
        print(f"{len(fail)} FAILED:")
        for n, e in fail:
            print(" ", n, e)
