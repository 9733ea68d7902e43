"""NN module zoo registry (reference: ultralytics/nn/modules/__init__.py)."""

from ultralytics_pro_tpu.nn.modules.block import (
    C1,
    C2,
    C3,
    CIB,
    DFL,
    PSA,
    SPP,
    SPPF,
    Attention,
    Bottleneck,
    BottleneckCSP,
    C2f,
    C2fCIB,
    C2PSA,
    C3Ghost,
    C3k,
    C3k2,
    GhostBottleneck,
    HGBlock,
    HGStem,
    Proto,
    PSABlock,
    ResNetLayer,
    SCDown,
)
from ultralytics_pro_tpu.nn.modules.conv import (
    CBAM,
    ChannelAttention,
    Concat,
    Conv,
    ConvTranspose,
    DWConv,
    Focus,
    GhostConv,
    Index,
    LightConv,
    MaxPool2d,
    ZeroPad2d,
    SpatialAttention,
    Upsample,
)
from ultralytics_pro_tpu.nn.modules.head import OBB, Classify, Detect, Pose, Segment

__all__ = [
    "C1", "C2", "C3", "CIB", "DFL", "PSA", "SPP", "SPPF", "Attention", "Bottleneck",
    "BottleneckCSP", "C2f", "C2fCIB", "C2PSA", "C3Ghost", "C3k", "C3k2",
    "GhostBottleneck", "HGBlock", "HGStem", "Proto", "PSABlock", "ResNetLayer", "SCDown",
    "CBAM", "ChannelAttention", "Concat", "Conv", "ConvTranspose", "DWConv", "Focus",
    "GhostConv", "Index", "LightConv", "MaxPool2d", "ZeroPad2d", "SpatialAttention", "Upsample",
    "OBB", "Classify", "Detect", "Pose", "Segment",
]
