"""Deploy-time re-parameterization transforms.

Pure param-tree math (reference fuse_conv_and_bn torch_utils.py:236 and
RepConv.fuse_convs conv.py:587): fold BatchNorm affine+stats into conv
kernels, and collapse RepVGG-style multi-branch blocks (3x3 + 1x1 + identity
BN) into ONE 3x3 conv + bias. On TPU this removes branch adds and BN work
from the inference graph before XLA even sees it.

Kernels are flax HWIO; BN dicts carry {"scale", "bias"} (params) and
{"mean", "var"} (batch_stats).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def fuse_conv_bn(kernel, bn_params: Dict, bn_stats: Dict, eps: float = 1e-3):
    """(HWIO kernel, BN) -> (scaled kernel, bias): y = conv(x)*g/s + (b - m*g/s)."""
    gamma = bn_params["scale"]
    beta = bn_params["bias"]
    mean = bn_stats["mean"]
    var = bn_stats["var"]
    scale = gamma / jnp.sqrt(var + eps)  # (O,)
    return kernel * scale[None, None, None, :], beta - mean * scale


def _pad_1x1_to_3x3(k1):
    """(1, 1, I, O) -> (3, 3, I, O) with the weight at the center tap."""
    return jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))


def _identity_kernel(c: int, groups: int = 1, dtype=jnp.float32):
    """3x3 'pass-through' kernel: center tap 1 on the matching in-channel."""
    ci = c // groups
    k = np.zeros((3, 3, ci, c), np.float32)
    for o in range(c):
        k[1, 1, o % ci, o] = 1.0
    return jnp.asarray(k, dtype)


def repconv_fuse(params: Dict, batch_stats: Dict, groups: int = 1,
                 eps: float = 1e-3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collapse a RepConv subtree into one (3, 3, I, O) kernel + (O,) bias.

    `params`/`batch_stats` are the RepConv module's subtrees: branches conv1
    (3x3 Conv+BN), conv2 (1x1 Conv+BN), and optional identity `bn`.
    """
    k3, b3 = fuse_conv_bn(params["conv1"]["conv"]["kernel"],
                          params["conv1"]["bn"], batch_stats["conv1"]["bn"], eps)
    k1, b1 = fuse_conv_bn(params["conv2"]["conv"]["kernel"],
                          params["conv2"]["bn"], batch_stats["conv2"]["bn"], eps)
    kernel = k3 + _pad_1x1_to_3x3(k1)
    bias = b3 + b1
    if "bn" in params:  # identity branch (c1 == c2, stride 1)
        c = kernel.shape[-1]
        kid, bid = fuse_conv_bn(_identity_kernel(c, groups, kernel.dtype),
                                params["bn"], batch_stats["bn"], eps)
        kernel = kernel + kid
        bias = bias + bid
    return kernel, bias


def apply_fused_conv(x, kernel, bias, stride: int = 1, padding: int = 1,
                     groups: int = 1, act=None):
    """Run a fused (kernel, bias) as one conv — the deploy form a collapsed
    Conv+BN or RepConv executes as."""
    import jax

    y = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), ((padding, padding), (padding, padding)),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    return act(y) if act is not None else y


def fold_preproc_into_stem(variables, scale: float = 1.0 / 255.0,
                           bgr_to_rgb: bool = True):
    """Fold the inference preprocess (BGR->RGB channel flip + /255 scaling)
    into the FIRST conv's kernel: conv(x_rgb * s, w) == conv(x_bgr, w') with
    w' = w[:, :, ::-1, :] * s — exact, since conv is linear in its input.

    Why this matters on TPU: a reversed-stride slice on the 3-wide minormost
    channel dim forces a catastrophic relayout of the whole (B, H, W, 3)
    activation before the stem (measured ~100 ms/batch at bs128 640px vs
    ~0.4 ms folded — see BASELINE.md round-2 perf notes). After folding,
    callers feed the raw uint8 tensor cast to the compute dtype, with NO
    elementwise preprocessing pass.

    Returns new `variables`; raises KeyError if layer 0 isn't a plain Conv.
    """
    params = variables["params"]
    k = params["layers_0"]["conv"]["kernel"]  # (kh, kw, 3, c2)
    if k.shape[2] not in (1, 3, 4):
        raise KeyError(f"stem kernel has {k.shape[2]} input channels; not an image stem")
    k2 = (k[:, :, ::-1, :] if bgr_to_rgb else k) * scale
    new_l0 = {**params["layers_0"], "conv": {**params["layers_0"]["conv"], "kernel": k2}}
    return {**variables, "params": {**params, "layers_0": new_l0}}
