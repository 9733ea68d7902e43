"""Structural re-parameterization family — flax.linen, NHWC, TPU-native.

Behavioral parity with the reference re-param zoo:
- QARepVGGBlockV2   (reference QARepVGG.py:270 — quantization-aware RepVGG:
  conv3x3+BN  +  raw conv1x1  +  identity, summed, then post-BN, then act)
- DiverseBranchBlock (reference DiverseBranch.py:170 — DBB: kxk conv-BN +
  1x1 conv-BN + 1x1→avg + 1x1→kxk branches, all foldable to ONE kxk conv)
- MobileOneBlock    (reference mobileone.py:44 — N over-parameterized kxk
  conv-BN branches + 1x1 scale branch + BN skip)
- DilatedReparamBlock / UniRepLKNetBlock (reference DilatedReparam.py:121,198
  — large-kernel DW conv + parallel dilated DW branches merged into one LK
  kernel at deploy)
- OREPA             (reference REPVGGOREPA.py — online re-param: branch
  kernels are composed into a single weight tensor BEFORE the conv, so train
  time already runs one conv; TPU-ideal formulation)

All deploy fusions are pure param transforms (`*_fuse` below), exactness
tested in tests/test_reparam.py; train keeps the multi-branch form. BN eps
follows each reference block (torch default 1e-5 here, vs 1e-3 in the
Ultralytics Conv family).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultralytics_pro_tpu.nn.modules.conv import ConvBase, Conv, apply_act

BN_EPS5 = 1e-5
BN_MOM9 = 0.9  # torch default momentum 0.1


def _bn(mod, name, x, train, eps=BN_EPS5):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOM9,
                        use_fast_variance=False, epsilon=eps, dtype=mod.dtype,
                        name=name, parent=mod)(x)


def _raw_conv(mod, name, x, c2, k, s=1, p=0, g=1, d=1, bias=False):
    return nn.Conv(features=c2, kernel_size=(k, k), strides=(s, s),
                   padding=((p, p), (p, p)), feature_group_count=g,
                   kernel_dilation=(d, d), use_bias=bias, dtype=mod.dtype,
                   name=name, parent=mod)(x)


class BNAndPad(nn.Module):
    """BatchNorm whose padding ring is filled with the BN of zero, i.e.
    beta - running_mean * gamma / sqrt(running_var + eps) (reference
    DiverseBranch.py:121 BNAndPadLayer). Needed so the 1x1→kxk branch sees
    what a fused kxk conv would see at the borders."""

    pad: int
    eps: float = BN_EPS5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if train:
            mean = x.astype(jnp.float32).mean(axis=(0, 1, 2))
            var = x.astype(jnp.float32).var(axis=(0, 1, 2))
            if not self.is_initializing():
                ra_mean.value = BN_MOM9 * ra_mean.value + (1 - BN_MOM9) * mean
                n = x.shape[0] * x.shape[1] * x.shape[2]
                ra_var.value = BN_MOM9 * ra_var.value + (1 - BN_MOM9) * var * n / max(n - 1, 1)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        p = self.pad
        if p > 0:
            pad_val = bias - ra_mean.value * scale * jax.lax.rsqrt(ra_var.value + self.eps)
            y = jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)))
            ring = 1.0 - jnp.pad(jnp.ones((1, x.shape[1], x.shape[2], 1), y.dtype),
                                 ((0, 0), (p, p), (p, p), (0, 0)))
            y = y + ring * pad_val[None, None, None, :]
        return y.astype(self.dtype)


class QARepVGGBlockV2(ConvBase):
    """act( postBN( conv3x3-BN(x) + conv1x1(x) + x ) ) (QARepVGG.py:270)."""

    c2: int = 0
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(c2=self.c2, k=self.k, s=self.s, g=self.g, act=False,
                 dtype=self.dtype, name="rbr_dense")(x, train)
        y = y + _raw_conv(self, "rbr_1x1", x, self.c2, 1, self.s, 0, self.g)
        if x.shape[-1] == self.c2 and self.s == 1:
            y = y + x
        y = _bn(self, "bn_post", y, train)
        return apply_act(y, self.act)


class DiverseBranchBlock(ConvBase):
    """DBB (DiverseBranch.py:170): kxk origin + 1x1 + 1x1→avg + 1x1→kxk
    branches summed then act; all four fold into one kxk conv at deploy."""

    c2: int = 0
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, k, s, g = x.shape[-1], self.c2, self.k, self.s, self.g
        p = k // 2
        out = _raw_conv(self, "origin_conv", x, c2, k, s, p, g)
        out = _bn(self, "origin_bn", out, train)
        if g < c2:
            y = _raw_conv(self, "b1x1_conv", x, c2, 1, s, 0, g)
            out = out + _bn(self, "b1x1_bn", y, train)
            a = _raw_conv(self, "avg_conv", x, c2, 1, 1, 0, g)
            a = BNAndPad(pad=p, dtype=self.dtype, name="avg_bnpad")(a, train)
            a = nn.avg_pool(a, (k, k), (s, s), padding="VALID")
        else:
            a = nn.avg_pool(x, (k, k), (s, s), padding=((p, p), (p, p)))
        out = out + _bn(self, "avg_bn", a, train)
        # 1x1 -> kxk branch; first conv's weight has an identity added when
        # internal channels == c1 (IdentityBasedConv1x1, DiverseBranch.py:99)
        ci = c1 // g
        w = self.param("idconv1_kernel", nn.initializers.zeros, (1, 1, ci, c1))
        ident = np.zeros((1, 1, ci, c1), np.float32)
        for o in range(c1):
            ident[0, 0, o % ci, o] = 1.0
        z = jax.lax.conv_general_dilated(
            x, (w + jnp.asarray(ident)).astype(self.dtype), (1, 1), ((0, 0), (0, 0)),
            feature_group_count=g, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        z = BNAndPad(pad=p, dtype=self.dtype, name="kxk_bnpad")(z, train)
        z = _raw_conv(self, "kxk_conv2", z, c2, k, s, 0, g)
        out = out + _bn(self, "kxk_bn2", z, train)
        return apply_act(out, self.act)


class Bottleneck_DBB(ConvBase):
    """Bottleneck whose second conv is a DBB (DiverseBranch.py:312)."""

    c2: int = 0
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c2=c_, k=3, dtype=self.dtype, name="cv1")(x, train)
        y = DiverseBranchBlock(c2=self.c2, k=3, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C2f_DBB(ConvBase):
    """C2f with DBB bottlenecks (DiverseBranch.py:330)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(Bottleneck_DBB(c2=c, shortcut=self.shortcut, g=self.g, e=1.0,
                                     dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class C3_DBB(ConvBase):
    """C3 with DBB bottlenecks (reference C3_DBB)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck_DBB(c2=c_, shortcut=self.shortcut, g=self.g, e=1.0,
                               dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class MobileOneBlockDW(ConvBase):
    """Depthwise-separable MobileOne block — the yaml-facing MobileOneBlock
    (reference block.py:4208). `k` counts over-parameterized BRANCHES (the
    kernel is fixed at 3): dw stage = [BN skip] + k x (3x3 dw conv-BN) +
    (1x1 dw conv-BN) -> ReLU; pw stage = [BN skip] + k x (1x1 conv-BN) -> ReLU.
    Skips exist only when c1 == c2 and s == 1 (block.py:4238,4244)."""

    c2: int = 0
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        skip = c1 == self.c2 and self.s == 1
        out = _bn(self, "dw_bn_layer", x, train) if skip else 0.0
        for i in range(self.k):
            y = _raw_conv(self, f"dw_3x3_{i}", x, c1, 3, self.s, 1, c1)
            out = out + _bn(self, f"dw_3x3_{i}_bn", y, train)
        y = _raw_conv(self, "dw_1x1", x, c1, 1, self.s, 0, c1)
        out = out + _bn(self, "dw_1x1_bn", y, train)
        x = jax.nn.relu(out)
        out = _bn(self, "pw_bn_layer", x, train) if skip else 0.0
        for i in range(self.k):
            y = _raw_conv(self, f"pw_1x1_{i}", x, self.c2, 1, 1, 0, 1)
            out = out + _bn(self, f"pw_1x1_{i}_bn", y, train)
        return jax.nn.relu(out)


class MobileOneBlock(ConvBase):
    """MobileOne over-parameterized block (mobileone.py:44): BN skip +
    num_convs x (kxk conv-BN) + 1x1 scale conv-BN, summed, SE, act(ReLU)."""

    c2: int = 0
    k: int = 3
    s: int = 1
    g: int = 1
    num_convs: int = 1
    use_se: bool = False
    act: Any = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        out = 0.0
        if x.shape[-1] == self.c2 and self.s == 1:
            out = _bn(self, "rbr_skip", x, train)
        if self.k > 1:
            y = _raw_conv(self, "rbr_scale_conv", x, self.c2, 1, self.s, 0, self.g)
            out = out + _bn(self, "rbr_scale_bn", y, train)
        for i in range(self.num_convs):
            y = _raw_conv(self, f"rbr_conv{i}_conv", x, self.c2, self.k, self.s, p, self.g)
            out = out + _bn(self, f"rbr_conv{i}_bn", y, train)
        if self.use_se:
            se = out.mean(axis=(1, 2))
            se = jax.nn.relu(nn.Dense(max(self.c2 // 16, 1), dtype=self.dtype, name="se_fc0")(se))
            se = jax.nn.sigmoid(nn.Dense(self.c2, dtype=self.dtype, name="se_fc1")(se))
            out = out * se[:, None, None, :]
        act = jax.nn.relu if self.act == "relu" else self.act
        return apply_act(out, act)


# kernel-size -> (branch kernel sizes, dilations), reference DilatedReparam.py:134
_DRB_TABLE = {
    17: ([5, 9, 3, 3, 3], [1, 2, 4, 5, 7]),
    15: ([5, 7, 3, 3, 3], [1, 2, 3, 5, 7]),
    13: ([5, 7, 3, 3, 3], [1, 2, 3, 4, 5]),
    11: ([5, 5, 3, 3, 3], [1, 2, 3, 4, 5]),
    9: ([5, 5, 3, 3], [1, 2, 3, 4]),
    7: ([5, 3, 3], [1, 2, 3]),
    5: ([3, 3], [1, 2]),
}


class DilatedReparamBlock(ConvBase):
    """Large-kernel DW conv + parallel dilated DW conv-BN branches
    (DilatedReparam.py:121); all branches merge into the LK kernel at deploy."""

    k: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        ks, rs = _DRB_TABLE[self.k]
        y = _raw_conv(self, "lk_origin", x, c, self.k, 1, self.k // 2, c)
        out = _bn(self, "origin_bn", y, train)
        for kk, r in zip(ks, rs):
            p = (r * (kk - 1) + 1) // 2
            y = _raw_conv(self, f"dil_conv_k{kk}_{r}", x, c, kk, 1, p, c, d=r)
            out = out + _bn(self, f"dil_bn_k{kk}_{r}", y, train)
        return out


class GRN(nn.Module):
    """Global response norm, NHWC (ConvNeXtV2; reference DilatedReparam.py:9)."""

    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        gx = jnp.sqrt((x.astype(jnp.float32) ** 2).sum(axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
        y = x * nx.astype(x.dtype) * gamma
        if self.use_bias:
            y = y + self.param("beta", nn.initializers.zeros, (c,))
        return (y + x).astype(self.dtype)


class UniRepLKNetBlock(ConvBase):
    """DRB dwconv -> BN -> SE -> FFN(pw1 -> GELU -> GRN -> pw2-BN) with
    layer-scale residual (DilatedReparam.py:198)."""

    k: int = 7
    ffn_factor: float = 4.0
    ls_init: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        if self.k >= 7:
            y = DilatedReparamBlock(k=self.k, dtype=self.dtype, name="dwconv")(x, train)
        elif self.k in (3, 5):
            y = _raw_conv(self, "dwconv", x, c, self.k, 1, self.k // 2, c)
        else:
            y = x
        if self.k > 0:
            y = _bn(self, "norm", y, train)
        se = y.mean(axis=(1, 2))
        se = jax.nn.relu(nn.Dense(max(c // 4, 1), dtype=self.dtype, name="se_fc0")(se))
        se = jax.nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="se_fc1")(se))
        y = y * se[:, None, None, :]
        f = int(self.ffn_factor * c)
        y = nn.Dense(f, dtype=self.dtype, name="pwconv1")(y)
        y = GRN(dtype=self.dtype, name="grn")(jax.nn.gelu(y))
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="pwconv2")(y)
        y = _bn(self, "ffn_bn", y, train)
        gamma = self.param("gamma", nn.initializers.constant(self.ls_init), (c,))
        return x + y * gamma


class Bottleneck_DRB(ConvBase):
    """Bottleneck w/ DilatedReparamBlock second stage (DilatedReparam.py:323)."""

    c2: int = 0
    shortcut: bool = True
    k: int = 7
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c2=c_, k=3, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(y, train)
        y = DilatedReparamBlock(k=self.k, dtype=self.dtype, name="drb")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C2f_DRB(ConvBase):
    """C2f with DRB bottlenecks (DilatedReparam.py:339)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = False
    k: int = 7
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(Bottleneck_DRB(c2=c, shortcut=self.shortcut, k=self.k, e=1.0,
                                     dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class C3_DRB(ConvBase):
    """C3 with DRB bottlenecks (DilatedReparam.py:332)."""

    c2: int = 0
    n: int = 1
    shortcut: bool = True
    k: int = 7
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c2=c_, k=1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c2=c_, k=1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck_DRB(c2=c_, shortcut=self.shortcut, k=self.k, e=1.0,
                               dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class C2f_UniRepLKNetBlock(ConvBase):
    """C2f whose inner blocks are UniRepLKNetBlocks (DilatedReparam.py:317)."""

    c2: int = 0
    n: int = 1
    k: int = 7
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(c2=2 * c, k=1, dtype=self.dtype, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(UniRepLKNetBlock(k=self.k, dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(c2=self.c2, k=1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class OREPA(ConvBase):
    """Online re-parameterized conv (REPVGGOREPA.py): branch kernels (origin,
    averaged-pool, padded-1x1, 1x1->kxk expansion) are composed with learned
    per-branch vector gates into ONE weight tensor, so even training runs a
    single conv — the natural TPU formulation of OREPA."""

    c2: int = 0
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = True
    internal_e: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, k, g = x.shape[-1], self.c2 or x.shape[-1], self.k, self.g
        ci = c1 // g
        init = nn.initializers.he_normal()
        w_origin = self.param("w_origin", init, (k, k, ci, c2))
        w_avg = self.param("w_avg_1x1", init, (1, 1, ci, c2))
        w_1x1 = self.param("w_1x1", init, (1, 1, ci, c2))
        cm = max(int(c2 * self.internal_e), 4)
        w_exp1 = self.param("w_exp_1x1", init, (1, 1, ci, cm))
        w_exp2 = self.param("w_exp_kxk", init, (k, k, cm // g, c2))
        v = self.param("branch_gates", nn.initializers.constant(0.5), (4,))

        avg = jnp.ones((k, k, 1, 1), w_avg.dtype) / (k * k)
        k_avg = w_avg * avg  # 1x1 then kxk average == scaled full-kernel
        pad = (k // 2, k // 2)
        k_1x1 = jnp.pad(w_1x1, (pad, pad) + ((0, 0), (0, 0)))
        if g == 1:
            k_exp = jnp.einsum("id,hwdo->hwio", w_exp1[0, 0], w_exp2)
        else:
            k_exp = jnp.concatenate([
                jnp.einsum("id,hwdo->hwio",
                           w_exp1[0, 0, :, gi * (cm // g):(gi + 1) * (cm // g)],
                           w_exp2[:, :, :, gi * (c2 // g):(gi + 1) * (c2 // g)])
                for gi in range(g)], axis=-1)
        kernel = (v[0] * w_origin + v[1] * k_avg + v[2] * k_1x1 + v[3] * k_exp)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (self.s, self.s), (pad, pad),
            feature_group_count=g, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _bn(self, "bn", y, train)
        return apply_act(y, self.act)


# ---------------------------------------------------------------------------
# Deploy fusions (pure param transforms; see nn/fuse.py for the Conv family)
# ---------------------------------------------------------------------------

def _fuse_bn(kernel, bn_p, bn_s, eps=BN_EPS5):
    scale = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
    return kernel * scale[None, None, None, :], bn_p["bias"] - bn_s["mean"] * scale


def _bn_only(c, g, bn_p, bn_s, k=3, eps=BN_EPS5):
    """Identity-as-kxk-kernel BN fold (skip branches)."""
    ci = c // g
    ker = np.zeros((k, k, ci, c), np.float32)
    for o in range(c):
        ker[k // 2, k // 2, o % ci, o] = 1.0
    return _fuse_bn(jnp.asarray(ker), bn_p, bn_s, eps)


def _pad_to(kernel, k):
    p = (k - kernel.shape[0]) // 2
    return jnp.pad(kernel, ((p, p), (p, p), (0, 0), (0, 0)))


def qarepvgg_fuse(params: Dict, stats: Dict, g: int = 1,
                  s: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """QARepVGGBlockV2 -> one (k,k,I,O) kernel + bias (QARepVGG.py:303).
    `s` must match the block's stride: the identity branch only exists in the
    forward when s == 1 (AND c1 == c2), so the fuse mirrors that condition."""
    k3, b3 = _fuse_bn(params["rbr_dense"]["conv"]["kernel"],
                      params["rbr_dense"]["bn"], stats["rbr_dense"]["bn"], eps=1e-3)
    kernel = k3 + _pad_to(params["rbr_1x1"]["kernel"], k3.shape[0])
    bias = b3
    c2, c1 = kernel.shape[-1], kernel.shape[-2] * g
    if c1 == c2 and s == 1:  # raw identity branch (forward adds x only then)
        ci = c1 // g
        ident = np.zeros(kernel.shape, np.float32)
        for o in range(c2):
            ident[kernel.shape[0] // 2, kernel.shape[0] // 2, o % ci, o] = 1.0
        kernel = kernel + jnp.asarray(ident)
    # fold the post-BN
    scale = params["bn_post"]["scale"] / jnp.sqrt(stats["bn_post"]["var"] + BN_EPS5)
    return kernel * scale[None, None, None, :], \
        (bias - stats["bn_post"]["mean"]) * scale + params["bn_post"]["bias"]


def _merge_1x1_kxk(k1, b1, k2, b2, g):
    """transIII (DiverseBranch.py:49) in HWIO: 1x1(s=1) then kxk == one kxk."""
    if g == 1:
        merged = jnp.einsum("id,hwdo->hwio", k1[0, 0], k2)
        b_hat = jnp.einsum("d,hwdo->o", b1, k2)
    else:
        d, o = k1.shape[-1], k2.shape[-1]
        ms, bs = [], []
        for gi in range(g):
            k1g = k1[0, 0, :, gi * (d // g):(gi + 1) * (d // g)]
            k2g = k2[:, :, :, gi * (o // g):(gi + 1) * (o // g)]
            ms.append(jnp.einsum("id,hwdo->hwio", k1g, k2g))
            bs.append(jnp.einsum("d,hwdo->o", b1[gi * (d // g):(gi + 1) * (d // g)], k2g))
        merged, b_hat = jnp.concatenate(ms, -1), jnp.concatenate(bs, -1)
    return merged, b_hat + b2


def dbb_fuse(params: Dict, stats: Dict, k: int, g: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DiverseBranchBlock -> one kxk conv (the six trans rules,
    DiverseBranch.py:39-104, reformulated for HWIO)."""
    k_o, b_o = _fuse_bn(params["origin_conv"]["kernel"], params["origin_bn"], stats["origin_bn"])
    c2 = k_o.shape[-1]
    c1 = k_o.shape[-2] * g
    kernel, bias = k_o, b_o
    if "b1x1_conv" in params:
        k1, b1 = _fuse_bn(params["b1x1_conv"]["kernel"], params["b1x1_bn"], stats["b1x1_bn"])
        kernel, bias = kernel + _pad_to(k1, k), bias + b1
    # avg branch: transV average kernel then BN
    ci_avg = c2 // g
    k_avg = np.zeros((k, k, ci_avg, c2), np.float32)
    for o in range(c2):
        k_avg[:, :, o % ci_avg, o] = 1.0 / (k * k)
    k_avg, b_avg = _fuse_bn(jnp.asarray(k_avg), params["avg_bn"], stats["avg_bn"])
    if "avg_conv" in params:
        kf, bf = _fuse_bn(params["avg_conv"]["kernel"], params["avg_bnpad"], stats["avg_bnpad"])
        k_avg, b_avg = _merge_1x1_kxk(kf, bf, k_avg, b_avg, g)
    kernel, bias = kernel + k_avg, bias + b_avg
    # 1x1 -> kxk branch
    ci = c1 // g
    ident = np.zeros((1, 1, ci, c1), np.float32)
    for o in range(c1):
        ident[0, 0, o % ci, o] = 1.0
    kf = params["idconv1_kernel"] + jnp.asarray(ident)
    kf, bf = _fuse_bn(kf, params["kxk_bnpad"], stats["kxk_bnpad"])
    ks, bs = _fuse_bn(params["kxk_conv2"]["kernel"], params["kxk_bn2"], stats["kxk_bn2"])
    km, bm = _merge_1x1_kxk(kf, bf, ks, bs, g)
    return kernel + km, bias + bm


def mobileone_fuse(params: Dict, stats: Dict, k: int, g: int = 1,
                   num_convs: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MobileOneBlock -> one kxk conv (mobileone.py:193 _get_kernel_bias)."""
    kernel, bias = 0.0, 0.0
    for i in range(num_convs):
        kk, bb = _fuse_bn(params[f"rbr_conv{i}_conv"]["kernel"],
                          params[f"rbr_conv{i}_bn"], stats[f"rbr_conv{i}_bn"])
        kernel, bias = kernel + kk, bias + bb
    if "rbr_scale_conv" in params:
        ks, bs = _fuse_bn(params["rbr_scale_conv"]["kernel"],
                          params["rbr_scale_bn"], stats["rbr_scale_bn"])
        kernel, bias = kernel + _pad_to(ks, k), bias + bs
    if "rbr_skip" in params:
        c2 = kernel.shape[-1]
        ki, bi = _bn_only(c2, g, params["rbr_skip"], stats["rbr_skip"], k=k)
        kernel, bias = kernel + ki, bias + bi
    return kernel, bias


def _expand_dilated(kernel, r):
    """Insert r-1 zeros between taps: dilated-k DW kernel -> dense kernel
    (reference convert_dilated_to_nondilated, DilatedReparam.py:80)."""
    if r == 1:
        return kernel
    k = kernel.shape[0]
    ke = r * (k - 1) + 1
    out = jnp.zeros((ke, ke) + kernel.shape[2:], kernel.dtype)
    return out.at[::r, ::r].set(kernel)


def dilated_reparam_fuse(params: Dict, stats: Dict, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DilatedReparamBlock -> one LK depthwise kernel + bias
    (DilatedReparam.py:178 switch_to_deploy)."""
    kernel, bias = _fuse_bn(params["lk_origin"]["kernel"], params["origin_bn"], stats["origin_bn"])
    for kk, r in zip(*_DRB_TABLE[k]):
        kb, bb = _fuse_bn(params[f"dil_conv_k{kk}_{r}"]["kernel"],
                          params[f"dil_bn_k{kk}_{r}"], stats[f"dil_bn_k{kk}_{r}"])
        kernel = kernel + _pad_to(_expand_dilated(kb, r), k)
        bias = bias + bb
    return kernel, bias
