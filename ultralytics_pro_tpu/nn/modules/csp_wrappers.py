"""Generic CSP wrappers: the reference ships hundreds of `C2f_X` / `C3_X` /
`C3k2_X` classes that are all the same two topologies with a different inner
block X (bottleneck second-conv replacement for channel-mapping X's,
post-bottleneck gate for channel-preserving attention X's). One factory here
serves them all; INNER_REGISTRY maps the reference class-name suffix to the
inner module and its calling convention.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.block import Bottleneck
from ultralytics_pro_tpu.nn.modules.conv import Conv, ConvBase


def _get(mod: str, cls: str):
    import importlib

    return getattr(importlib.import_module(f"ultralytics_pro_tpu.nn.modules.{mod}"), cls)


# suffix -> (loader, mode): mode "c2" = inner maps channels (takes c2=),
# "dim" = channel-preserving block taking dim=, "gate" = attention applied
# after a standard bottleneck (no channel args)
INNER_REGISTRY: Dict[str, Tuple[Callable, str]] = {
    "ODConv": (lambda: _get("conv_extra", "ODConv2d"), "c2"),
    "RFAConv": (lambda: _get("conv_extra", "RFAConv"), "c2"),
    "RFCAConv": (lambda: _get("conv_extra", "RFCAConv"), "c2"),
    "RFCBAMConv": (lambda: _get("conv_extra", "RFCBAMConv"), "c2"),
    "OREPA": (lambda: _get("reparam", "OREPA"), "c2"),
    "REPVGGOREPA": (lambda: _get("reparam", "OREPA"), "c2"),
    "RepVGG": (lambda: _get("goldyolo", "RepVGGBlock"), "c2"),
    "DSConv": (lambda: _get("attention", "DSConv"), "c2"),
    "DLKA": (lambda: _get("attention", "deformable_LKA"), "gate"),
    "TripletAt": (lambda: _get("attention", "TripletAttention"), "gate"),
    "SENetV1": (lambda: _get("attention", "SEAttention"), "gate"),
    "SENetV2": (lambda: _get("zoo_r3", "SELayerV2"), "gate"),
    "DAttention": (lambda: _get("attention", "DAttention"), "gate"),
    "FLA": (lambda: _get("attention", "FocusedLinearAttention"), "gate"),
    "Star": (lambda: _get("backbones2", "StarBlock"), "dim"),
    "FasterBlock": (lambda: _get("backbones2", "PConvBlock"), "dim"),
    "RVB": (lambda: _get("backbones2", "RepViTBlock"), "dim"),
    "UIB": (lambda: _get("backbones2", "UIB"), "c2"),
    "WT": (lambda: _get("backbones3", "WTConv"), "dim"),
    "WTConv": (lambda: _get("backbones3", "WTConv"), "dim"),
    "ConvNeXtV2Block": (lambda: _get("backbones", "ConvNeXtBlock"), "dim"),
    "iRMB": (lambda: _get("backbones2", "MBConvV2"), "c2"),
    "DynamicConv": (lambda: _get("zoo_r3", "DynamicConv"), "c2"),
    "UniRepLKNetBlock": (lambda: _get("reparam", "UniRepLKNetBlock"), "dimk"),
    # round-3 inners (zoo_r3.py): mode "unit" = channel-preserving block that
    # fully replaces the bottleneck after a 1x1 expand
    "MLLABlock": (lambda: _get("zoo_r3", "MLLABlock"), "dim"),
    "DiTBlock": (lambda: _get("zoo_r3", "DiTBlock"), "unit"),
    "CGA": (lambda: _get("zoo_r3", "CascadedGroupAttention"), "unit"),
    "DAT": (lambda: _get("attention", "DAttention"), "gate"),
    "EMSC": (lambda: _get("zoo_r3", "EMSConv"), "c2"),
    "EMSCP": (lambda: _get("zoo_r3", "EMSConvP"), "c2"),
    "EMBC": (lambda: _get("backbones2", "MBConvV2"), "c2"),
    "MSBlock": (lambda: _get("zoo_r3", "MSBlock"), "c2"),
    "MSBlockv2": (lambda: _get("zoo_r3", "MSBlock"), "c2"),
    "RetBlock": (lambda: _get("zoo_r3", "RetBlock"), "raw"),
    "Star_CAA": (lambda: _get("zoo_r3", "StarCAA"), "dim"),
    "RVB_EMA": (lambda: _get("zoo_r3", "RVB_EMA"), "dim"),
    "Faster_CGLU": (lambda: _get("zoo_r3", "FasterCGLU"), "dim"),
    "Faster_EMA": (lambda: _get("zoo_r3", "FasterEMA"), "dim"),
    "GhostModule_DynamicConv": (lambda: _get("zoo_r3", "GhostDynamicConv"), "c2"),
    "SCConv": (lambda: _get("zoo_r3", "SCConv"), "c2"),
    "CGLU": (lambda: _get("zoo_r3", "CGLU"), "unit"),
    "CAA": (lambda: _get("zoo_r3", "CAA"), "unit"),
    "Het": (lambda: _get("zoo_r3", "DualConv"), "c2"),
    "PPC": (lambda: _get("backbones2", "PConvBlock"), "dim"),
}


class GenericBottleneck(ConvBase):
    """Bottleneck with an arbitrary second stage (the reference
    Bottleneck_X pattern: cv1 = Conv k3, cv2 = X)."""

    c2: int = 0
    suffix: str = ""
    shortcut: bool = True
    e: float = 0.5
    inner_kw: Tuple = ()  # extra ctor kwargs threaded to the inner module

    @nn.compact
    def __call__(self, x, train: bool = False):
        loader, mode = INNER_REGISTRY[self.suffix]
        cls = loader()
        ikw = dict(self.inner_kw)
        if mode == "raw":
            # channel-preserving block applied directly, no expand/skip — the
            # reference's C2f_RetBlock pattern (RetNet.py:360: self.m are the
            # blocks themselves, internal residuals only)
            return cls(dim=self.c2, dtype=self.dtype, name="inner", **ikw)(x, train)
        if mode == "gate":
            y = Bottleneck(c2=self.c2, shortcut=False, k=(3, 3), e=self.e,
                           dtype=self.dtype, name="bottleneck")(x, train)
            y = cls(dtype=self.dtype, name="gate")(y, train)
        elif mode == "unit":
            # channel-preserving block that IS the bottleneck body
            y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="expand")(x, train)
            y = cls(dtype=self.dtype, name="inner")(y, train)
        else:
            c_ = int(self.c2 * self.e)
            y = Conv(c2=c_, k=3, dtype=self.dtype, name="cv1")(x, train)
            if mode == "c2":
                y = cls(c2=self.c2, dtype=self.dtype, name="inner")(y, train)
            elif mode == "dimk":
                y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="expand")(y, train)
                y = cls(dtype=self.dtype, name="inner")(y, train)
            else:  # dim: channel-preserving
                y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="expand")(y, train)
                y = cls(dim=self.c2, dtype=self.dtype, name="inner")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class GenericC2f(ConvBase):
    """C2f topology with GenericBottleneck inners."""

    c2: int = 0
    suffix: str = ""
    n: int = 1
    shortcut: bool = False
    e: float = 0.5
    inner_kw: Tuple = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(GenericBottleneck(c2=c, suffix=self.suffix, shortcut=self.shortcut,
                                        e=1.0, inner_kw=self.inner_kw,
                                        dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class GenericC3(ConvBase):
    """C3 topology with GenericBottleneck inners."""

    c2: int = 0
    suffix: str = ""
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    inner_kw: Tuple = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = GenericBottleneck(c2=c_, suffix=self.suffix, shortcut=self.shortcut,
                                  e=1.0, inner_kw=self.inner_kw,
                                  dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class GenericC2PSA(ConvBase):
    """C2PSA topology with an arbitrary channel-preserving inner (the
    reference C2PSA_X pattern: cv1 split a/b, n X blocks on b, concat, cv2)."""

    c2: int = 0
    suffix: str = ""
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        loader, mode = INNER_REGISTRY[self.suffix]
        cls = loader()
        for i in range(self.n):
            if mode == "dim":
                b = cls(dim=c, dtype=self.dtype, name=f"m_{i}")(b, train)
            else:
                b = cls(dtype=self.dtype, name=f"m_{i}")(b, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype,
                    name="cv2")(jnp.concatenate([a, b], -1), train)


def register_csp_wrappers(builders: Dict[str, Any], sc, kw, a_get):
    """Register C2f_X / C3_X / C3k2_X builders for every inner in
    INNER_REGISTRY (C3k2_X maps onto the C2f topology, matching the
    reference's C3k2-as-C2f-subclass pattern)."""

    def make(topology, suffix):
        cls = GenericC2f if topology in ("C2f", "C3k2") else GenericC3
        # reference defaults: C2f_X shortcut=False, C3_X/C3k2_X shortcut=True
        # (this repo's own _build_c3k2 likewise defaults True)
        shortcut_default = topology in ("C3", "C3k2")

        def build(a, n, w, d, mx, ctx):
            return cls, kw(c2=sc(a[0], w, mx), suffix=suffix, n=n,
                           shortcut=a_get(a, 1, shortcut_default)
                           if topology != "C3k2" else shortcut_default)
        return build

    for suffix in INNER_REGISTRY:
        for topo in ("C2f", "C3", "C3k2"):
            name = f"{topo}_{suffix}"
            if name not in builders:
                builders[name] = make(topo, suffix)

    def make_psa(suffix):
        def build(a, n, w, d, mx, ctx):
            return GenericC2PSA, kw(c2=sc(a[0], w, mx), suffix=suffix, n=n)
        return build

    # C2PSA_X family (reference C2PSA_DAT/CGA/SENetV2/DiTBlock/... classes)
    for suffix in ("DAT", "CGA", "SENetV2", "DiTBlock", "MLLABlock", "DLKA", "FLA"):
        name = f"C2PSA_{suffix}"
        if name not in builders:
            builders[name] = make_psa(suffix)
    # reference spellings that drop the underscore or rename the inner
    builders.setdefault("C2PSAMLLA", make_psa("MLLABlock"))
    builders.setdefault("C2fMLLABlock", make("C2f", "MLLABlock"))
    builders.setdefault("C3k2_MLLABlock1", make("C3k2", "MLLABlock"))
    builders.setdefault("C3k2_MLLABlock2", make("C3k2", "MLLABlock"))
    builders.setdefault("C3k2_DiTBlock", make("C3k2", "DiTBlock"))
    builders.setdefault("C2PSA_CGA", make_psa("CGA"))
    builders.setdefault("CSPHet", make("C2f", "Het"))
    builders.setdefault("CSPPC", make("C2f", "PPC"))
    builders.setdefault("C2f_GhostModule", make("C2f", "GhostModule_DynamicConv"))
