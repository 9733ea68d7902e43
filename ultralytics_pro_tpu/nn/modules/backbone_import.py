"""Pretrained-weight import for the whole-backbone zoo (VERDICT r2 row 23
residual: "per-family backbone weight import still open").

Maps torch state_dicts from the reference's community backbone files onto this
repo's flax/NHWC backbone param trees, so a user can drop an official
checkpoint (ConvNeXt(V2), FasterNet, Swin) into a yaml-swapped backbone and
get the published features. Families covered:

- ConvNeXt V1/V2    (reference ConvNeXtV1.py:56 / ConvNeXtV2_backbone.py:82)
- FasterNet         (reference FasterNet.py:169)
- SwinTransformer   (reference SwinTransformer_backbone.py)

Conventions (shared with models/sam/import_weights.py):
- conv weights OIHW -> HWIO; depthwise (C,1,kh,kw) -> (kh,kw,1,C)
- linear weights transposed (out,in) -> (in,out)
- torch LayerNorm weight/bias -> flax scale/bias
- torch BatchNorm weight/bias -> params scale/bias; running stats -> batch_stats

Each mapper takes the module's own `variables` (as returned by `m.init`) and
the torch state_dict, and returns updated variables. `strict=True` asserts
every flax leaf was written. Parity tests: tests/test_backbone_import.py
instantiates the REFERENCE torch modules with random weights and asserts our
forward reproduces every stage feature map.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

__all__ = ["convnext_state_dict_to_flax", "fasternet_state_dict_to_flax",
           "swin_state_dict_to_flax", "efficientformerv2_state_dict_to_flax",
           "vheat_state_dict_to_flax", "spanet_state_dict_to_flax",
           "smt_state_dict_to_flax", "cosnet_state_dict_to_flax",
           "decouplenet_state_dict_to_flax", "uninext_state_dict_to_flax",
           "iformer_state_dict_to_flax", "evit_state_dict_to_flax",
           "stvit_state_dict_to_flax", "transxnet_state_dict_to_flax",
           "glnet_state_dict_to_flax", "emo2_state_dict_to_flax",
           "pvtv2_state_dict_to_flax", "hornet_state_dict_to_flax",
           "moganet_state_dict_to_flax", "inceptionnext_state_dict_to_flax", "cswin_state_dict_to_flax", "ghostnetv2_state_dict_to_flax",
           "ghostnetv3_state_dict_to_flax", "parameternet_state_dict_to_flax",
           "mambavision_state_dict_to_flax", "maxvit_state_dict_to_flax",
           "load_backbone_checkpoint"]


def _conv_w(w):
    w = np.asarray(w, np.float32)
    if w.ndim == 4 and w.shape[1] == 1 and w.shape[0] > 1:  # depthwise OIHW
        return w.transpose(2, 3, 1, 0)
    return w.transpose(2, 3, 1, 0)


def _set(tree, path, value, written):
    node = tree
    for p in path[:-1]:
        node = node[p]
    old = node[path[-1]]
    value = np.asarray(value, np.float32)
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"flax {tuple(old.shape)} vs torch {tuple(value.shape)}")
    node[path[-1]] = value.astype(np.float32)
    written.add(tuple(path))


def _unwritten(variables, written, ignore_collections=()):
    import jax

    missing = []
    for kp, _ in jax.tree_util.tree_flatten_with_path(variables)[0]:
        names = tuple(str(getattr(k, "key", getattr(k, "idx", ""))) for k in kp)
        if names[0] in ignore_collections:
            continue
        if names not in written:
            missing.append("/".join(names))
    return missing


def _deep_dict(t):
    if isinstance(t, dict) or hasattr(t, "items"):
        return {k: _deep_dict(v) for k, v in t.items()}
    return np.asarray(t)


def _bn_entries(tree, params_path, stats_path, sd, tkey, written):
    """Write one torch BatchNorm (weight/bias/running_mean/running_var)."""
    _set(tree, ["params", *params_path, "scale"], sd[f"{tkey}.weight"], written)
    _set(tree, ["params", *params_path, "bias"], sd[f"{tkey}.bias"], written)
    _set(tree, ["batch_stats", *stats_path, "mean"], sd[f"{tkey}.running_mean"], written)
    _set(tree, ["batch_stats", *stats_path, "var"], sd[f"{tkey}.running_var"], written)


def convnext_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """ConvNeXt V1 (layer-scale gamma) and V2 (GRN) backbones.

    Torch layout (reference ConvNeXtV2_backbone.py:82): downsample_layers.{0..3}
    (stem = conv+LN; others LN+conv), stages.{s}.{b}.{dwconv,norm,pwconv1,
    [grn,]pwconv2[,gamma]}; final `norm`/`head` (classification-only) ignored.
    """
    tree = _deep_dict(variables)
    written = set()
    for tkey, w in sd.items():
        w = np.asarray(w, np.float32)
        m = re.match(r"downsample_layers\.(\d+)\.(\d+)\.(weight|bias)$", tkey)
        if m:
            s, idx, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
            if s == 0:
                if idx == 0:  # stem conv
                    _set(tree, ["params", "stem", "kernel" if leaf == "weight" else "bias"],
                         _conv_w(w) if leaf == "weight" else w, written)
                else:  # stem LN
                    _set(tree, ["params", "stem_norm", "scale" if leaf == "weight" else "bias"],
                         w, written)
            else:
                if idx == 0:  # LN before downsample conv
                    _set(tree, ["params", f"down_norm_{s}", "scale" if leaf == "weight" else "bias"],
                         w, written)
                else:
                    _set(tree, ["params", f"down_{s}", "kernel" if leaf == "weight" else "bias"],
                         _conv_w(w) if leaf == "weight" else w, written)
            continue
        m = re.match(r"stages\.(\d+)\.(\d+)\.(.+)$", tkey)
        if m:
            s, b, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            blk = ["params", f"s{s}_b{b}"]
            if rest == "dwconv.weight":
                _set(tree, [*blk, "dwconv", "kernel"], _conv_w(w), written)
            elif rest == "dwconv.bias":
                _set(tree, [*blk, "dwconv", "bias"], w, written)
            elif rest in ("norm.weight", "norm.bias"):
                _set(tree, [*blk, "norm", "scale" if rest.endswith("weight") else "bias"],
                     w, written)
            elif rest in ("pwconv1.weight", "pwconv2.weight"):
                _set(tree, [*blk, rest.split(".")[0], "kernel"], w.T, written)
            elif rest in ("pwconv1.bias", "pwconv2.bias"):
                _set(tree, [*blk, rest.split(".")[0], "bias"], w, written)
            elif rest == "gamma":  # V1 layer scale
                _set(tree, [*blk, "gamma"], w.reshape(-1), written)
            elif rest == "grn.gamma":  # V2 GRN (1,1,1,4d)
                _set(tree, [*blk, "grn_gamma"], w.reshape(-1), written)
            elif rest == "grn.beta":
                _set(tree, [*blk, "grn_beta"], w.reshape(-1), written)
            elif strict:
                raise KeyError(f"unmapped ConvNeXt block key {tkey}")
            continue
        # final norm/head: classification leftovers, not part of the backbone
        if not re.match(r"(norm\.|head\.)", tkey) and strict:
            raise KeyError(f"unmapped ConvNeXt key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def fasternet_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """FasterNet (reference FasterNet.py:169): patch_embed (conv+BN),
    stages = Sequential interleaving BasicStage (even idx) / PatchMerging
    (odd idx), per-output BNs norm0/2/4/6."""
    tree = _deep_dict(variables)
    written = set()
    done_bn = set()
    for tkey, w in sd.items():
        if tkey.endswith("num_batches_tracked"):
            continue
        w = np.asarray(w, np.float32)
        if tkey == "patch_embed.proj.weight":
            _set(tree, ["params", "stem", "kernel"], _conv_w(w), written)
            continue
        if tkey.startswith("patch_embed.norm."):
            if "patch_embed.norm" not in done_bn:
                _bn_entries(tree, ["stem_bn"], ["stem_bn"], sd, "patch_embed.norm", written)
                done_bn.add("patch_embed.norm")
            continue
        m = re.match(r"norm(\d+)\.", tkey)
        if m:
            s = int(m.group(1)) // 2
            key = f"norm{m.group(1)}"
            if key not in done_bn:
                _bn_entries(tree, [f"out_bn{s}"], [f"out_bn{s}"], sd, key, written)
                done_bn.add(key)
            continue
        m = re.match(r"stages\.(\d+)\.(.+)$", tkey)
        if m:
            idx, rest = int(m.group(1)), m.group(2)
            if idx % 2 == 1:  # PatchMerging -> merge{s}
                s = idx // 2 + 1
                if rest == "reduction.weight":
                    _set(tree, ["params", f"merge{s}", "kernel"], _conv_w(w), written)
                elif rest.startswith("norm."):
                    key = f"stages.{idx}.norm"
                    if key not in done_bn:
                        _bn_entries(tree, [f"merge{s}_bn"], [f"merge{s}_bn"], sd, key, written)
                        done_bn.add(key)
                elif strict:
                    raise KeyError(f"unmapped FasterNet merge key {tkey}")
                continue
            s = idx // 2
            m2 = re.match(r"blocks\.(\d+)\.(.+)$", rest)
            if not m2:
                if strict:
                    raise KeyError(f"unmapped FasterNet stage key {tkey}")
                continue
            b, leafpath = int(m2.group(1)), m2.group(2)
            blk = f"s{s}_b{b}"
            if leafpath == "spatial_mixing.partial_conv3.weight":
                _set(tree, ["params", blk, "pconv", "kernel"], _conv_w(w), written)
            elif leafpath == "mlp.0.weight":
                _set(tree, ["params", blk, "fc1", "kernel"], _conv_w(w), written)
            elif leafpath.startswith("mlp.1."):
                key = f"stages.{idx}.blocks.{b}.mlp.1"
                if key not in done_bn:
                    _bn_entries(tree, [blk, "bn"], [blk, "bn"], sd, key, written)
                    done_bn.add(key)
            elif leafpath == "mlp.3.weight":
                _set(tree, ["params", blk, "fc2", "kernel"], _conv_w(w), written)
            elif strict:
                raise KeyError(f"unmapped FasterNet block key {tkey}")
            continue
        if strict and not tkey.startswith(("head.", "avgpool")):
            raise KeyError(f"unmapped FasterNet key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def swin_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """SwinTransformer backbone (reference SwinTransformer_backbone.py:444):
    patch_embed conv+LN, layers.{s}.blocks.{b} W-MSA/SW-MSA (fused qkv,
    relative_position_bias_table) + mlp, layers.{s}.downsample PatchMerging
    (4C->2C linear + LN, feeding stage s+1), per-output norms norm{0..3}.
    ape (absolute position embedding) is unsupported — raises if present."""
    tree = _deep_dict(variables)
    written = set()
    LN = {"weight": "scale", "bias": "bias"}
    for tkey, w in sd.items():
        if tkey.endswith(("relative_position_index", "attn_mask")):
            continue
        if "absolute_pos_embed" in tkey:
            raise NotImplementedError("ape=True Swin checkpoints are not supported")
        w = np.asarray(w, np.float32)
        if tkey == "patch_embed.proj.weight":
            _set(tree, ["params", "patch_embed", "kernel"], _conv_w(w), written)
            continue
        if tkey == "patch_embed.proj.bias":
            _set(tree, ["params", "patch_embed", "bias"], w, written)
            continue
        m = re.match(r"patch_embed\.norm\.(weight|bias)$", tkey)
        if m:
            _set(tree, ["params", "patch_norm", LN[m.group(1)]], w, written)
            continue
        m = re.match(r"norm(\d+)\.(weight|bias)$", tkey)
        if m:
            _set(tree, ["params", f"out_norm_{m.group(1)}", LN[m.group(2)]], w, written)
            continue
        m = re.match(r"layers\.(\d+)\.downsample\.(.+)$", tkey)
        if m:
            s, rest = int(m.group(1)) + 1, m.group(2)  # feeds our stage s+1 prologue
            if rest == "reduction.weight":
                _set(tree, ["params", f"merge_{s}", "kernel"], w.T, written)
            elif rest in ("norm.weight", "norm.bias"):
                _set(tree, ["params", f"merge_norm_{s}", LN[rest.split(".")[1]]], w, written)
            elif strict:
                raise KeyError(f"unmapped Swin downsample key {tkey}")
            continue
        m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.(.+)$", tkey)
        if m:
            s, b, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            blk = ["params", f"s{s}_b{b}"]
            if rest in ("norm1.weight", "norm1.bias", "norm2.weight", "norm2.bias"):
                mod, leaf = rest.split(".")
                _set(tree, [*blk, mod, LN[leaf]], w, written)
            elif rest == "attn.qkv.weight":
                _set(tree, [*blk, "qkv", "kernel"], w.T, written)
            elif rest == "attn.qkv.bias":
                _set(tree, [*blk, "qkv", "bias"], w, written)
            elif rest == "attn.relative_position_bias_table":
                _set(tree, [*blk, "rel_bias"], w, written)
            elif rest == "attn.proj.weight":
                _set(tree, [*blk, "proj", "kernel"], w.T, written)
            elif rest == "attn.proj.bias":
                _set(tree, [*blk, "proj", "bias"], w, written)
            elif rest in ("mlp.fc1.weight", "mlp.fc2.weight"):
                _set(tree, [*blk, rest.split(".")[1], "kernel"], w.T, written)
            elif rest in ("mlp.fc1.bias", "mlp.fc2.bias"):
                _set(tree, [*blk, rest.split(".")[1], "bias"], w, written)
            elif strict:
                raise KeyError(f"unmapped Swin block key {tkey}")
            continue
        if strict and not tkey.startswith(("head.", "avgpool")):
            raise KeyError(f"unmapped Swin key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def efficientformerv2_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """EfficientFormerV2 (reference EfficientFormerV2.py:691, fork_feat).

    Torch layout: patch_embed.{0,1,3,4} (conv/BN stem), network.{0,2,4,6}.{b}
    stage blocks (FFN: mlp.* + layer_scale_2; AttnFFN adds token_mixer.* +
    layer_scale_1), network.{1,3} conv Embeddings, network.5 asub Embedding
    (attn = Attention4DDownsample + parallel conv/bn), fork norms
    norm{0,2,4,6}. `attention_biases` import verbatim because the RPE offset
    enumeration is replicated exactly (efficientformer.py:_rpe_table); the
    init resolution of the torch model must match the trace resolution."""
    tree = _deep_dict(variables)
    written = set()

    def conv(path, tkey):
        _set(tree, ["params", *path, "kernel"], _conv_w(sd[f"{tkey}.weight"]), written)
        if f"{tkey}.bias" in sd:
            _set(tree, ["params", *path, "bias"], sd[f"{tkey}.bias"], written)

    def bn(path, tkey):
        _bn_entries(tree, path, path, sd, tkey, written)

    def mixer(path, tkey, strided):
        """Attention4D / Attention4DDownsample shared conv/bn sub-layout."""
        if strided:
            conv([*path, "stride_conv"], f"{tkey}.stride_conv.0")
            bn([*path, "stride_bn"], f"{tkey}.stride_conv.1")
        for nm in ("k", "v", "v_local"):
            conv([*path, nm], f"{tkey}.{nm}.0")
            bn([*path, f"{nm}_bn"], f"{tkey}.{nm}.1")
        _set(tree, ["params", *path, "attention_biases"],
             sd[f"{tkey}.attention_biases"], written)

    def attention4d(path, tkey, strided):
        mixer(path, tkey, strided)
        conv([*path, "q"], f"{tkey}.q.0")
        bn([*path, "q_bn"], f"{tkey}.q.1")
        conv([*path, "proj"], f"{tkey}.proj.0")
        bn([*path, "proj_bn"], f"{tkey}.proj.1")
        for th in ("talking_head1", "talking_head2"):
            w = np.asarray(sd[f"{tkey}.{th}.weight"], np.float32)
            _set(tree, ["params", *path, f"{th}_w"], w[:, :, 0, 0], written)
            _set(tree, ["params", *path, f"{th}_b"], sd[f"{tkey}.{th}.bias"], written)

    def mlp(path, tkey):
        for cv, norm in (("fc1", "norm1"), ("mid", "mid_norm"), ("fc2", "norm2")):
            conv([*path, cv], f"{tkey}.{cv}")
            bn([*path, norm], f"{tkey}.{norm}")

    # stem
    conv(["stem0"], "patch_embed.0")
    bn(["stem_bn0"], "patch_embed.1")
    conv(["stem1"], "patch_embed.3")
    bn(["stem_bn1"], "patch_embed.4")

    # stages + embeddings (network indices 0,2,4,6 = stages; 1,3 conv emb; 5 asub)
    depths = []
    for n in (0, 2, 4, 6):
        bs = {int(m.group(1)) for k in sd
              if (m := re.match(rf"network\.{n}\.(\d+)\.", k))}
        depths.append(max(bs) + 1 if bs else 0)
    for s, n in enumerate((0, 2, 4, 6)):
        for b in range(depths[s]):
            tkey = f"network.{n}.{b}"
            path = [f"s{s}_b{b}"]
            mlp([*path, "mlp"], f"{tkey}.mlp")
            _set(tree, ["params", *path, "layer_scale_2"],
                 np.asarray(sd[f"{tkey}.layer_scale_2"], np.float32).reshape(-1), written)
            if f"{tkey}.layer_scale_1" in sd:  # AttnFFN
                _set(tree, ["params", *path, "layer_scale_1"],
                     np.asarray(sd[f"{tkey}.layer_scale_1"], np.float32).reshape(-1), written)
                strided = f"{tkey}.token_mixer.stride_conv.0.weight" in sd
                attention4d([*path, "token_mixer"], f"{tkey}.token_mixer", strided)
        bn([f"norm{s}"], f"norm{n}")
        if s < 2:
            conv([f"emb{s}"], f"network.{2 * s + 1}.proj")
            bn([f"emb{s}_bn"], f"network.{2 * s + 1}.norm")
        elif s == 2:
            a = ["emb2_attn"]
            mixer(a, "network.5.attn", strided=False)
            conv([*a, "q", "local"], "network.5.attn.q.local.0")
            conv([*a, "q", "proj"], "network.5.attn.q.proj.0")
            bn([*a, "q", "proj_bn"], "network.5.attn.q.proj.1")
            conv([*a, "proj"], "network.5.attn.proj.1")
            bn([*a, "proj_bn"], "network.5.attn.proj.2")
            conv(["emb2"], "network.5.conv")
            bn(["emb2_bn"], "network.5.bn")

    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def vheat_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """vHeat backbone (reference vHeat.py:227).

    Torch layout: patch_embed.{conv1,norm1.1,conv2,norm2.1}; freq_embed.{i}
    (res,res,C) parameters; stages.{s}.{b}.{norm1,norm2,op.*,mlp.fc1/fc2}
    where op = Heat2D {dwconv, linear, to_k.0, out_norm, out_linear} and the
    mlp fc layers are 1x1 Conv2d (channels_first); downsamples.{s}.{0:conv,
    1:LayerNorm2d}; classifier.* ignored."""
    tree = _deep_dict(variables)
    written = set()
    for tkey, w in sd.items():
        w = np.asarray(w, np.float32)
        if tkey.startswith("classifier."):
            continue
        m = re.match(r"patch_embed\.conv(\d)\.(weight|bias)$", tkey)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            _set(tree, ["params", f"stem_conv{m.group(1)}", leaf],
                 _conv_w(w) if leaf == "kernel" else w, written)
            continue
        m = re.match(r"patch_embed\.norm(\d)\.1\.(weight|bias)$", tkey)
        if m:
            _set(tree, ["params", f"stem_norm{m.group(1)}",
                        "scale" if m.group(2) == "weight" else "bias"], w, written)
            continue
        m = re.match(r"freq_embed\.(\d+)$", tkey)
        if m:
            _set(tree, ["params", f"freq{m.group(1)}"], w, written)
            continue
        m = re.match(r"downsamples\.(\d+)\.0\.weight$", tkey)
        if m:
            _set(tree, ["params", f"down{m.group(1)}", "kernel"], _conv_w(w), written)
            continue
        m = re.match(r"downsamples\.(\d+)\.1\.(weight|bias)$", tkey)
        if m:
            _set(tree, ["params", f"down{m.group(1)}_norm",
                        "scale" if m.group(2) == "weight" else "bias"], w, written)
            continue
        m = re.match(r"stages\.(\d+)\.(\d+)\.(.+)$", tkey)
        if m:
            s, b, rest = m.group(1), m.group(2), m.group(3)
            pre = f"s{s}_b{b}"
            if re.match(r"norm[12]\.(weight|bias)$", rest):
                n, leaf = rest.split(".")
                _set(tree, ["params", f"{pre}_{n}",
                            "scale" if leaf == "weight" else "bias"], w, written)
            elif rest == "op.dwconv.weight":
                _set(tree, ["params", f"{pre}_op", "dwconv", "kernel"], _conv_w(w), written)
            elif rest == "op.dwconv.bias":
                _set(tree, ["params", f"{pre}_op", "dwconv", "bias"], w, written)
            elif re.match(r"op\.(linear|out_linear)\.(weight|bias)$", rest):
                _, n, leaf = rest.replace(".", " ").split()
                _set(tree, ["params", f"{pre}_op", n,
                            "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif re.match(r"op\.to_k\.0\.(weight|bias)$", rest):
                leaf = rest.rsplit(".", 1)[1]
                _set(tree, ["params", f"{pre}_op", "to_k",
                            "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif re.match(r"op\.out_norm\.(weight|bias)$", rest):
                leaf = rest.rsplit(".", 1)[1]
                _set(tree, ["params", f"{pre}_op", "out_norm",
                            "scale" if leaf == "weight" else "bias"], w, written)
            elif re.match(r"mlp\.fc[12]\.(weight|bias)$", rest):
                _, n, leaf = rest.replace(".", " ").split()
                _set(tree, ["params", f"{pre}_{n}",
                            "kernel" if leaf == "weight" else "bias"],
                     w[:, :, 0, 0].T if leaf == "weight" else w, written)
            elif strict:
                raise KeyError(f"unmapped vHeat block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped vHeat key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def spanet_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """SPANet backbone (reference SPANet.py:329).

    Torch layout: patch_embed.proj; network.{even}=stage blocks /
    network.{odd}=downsample PatchEmbed; block = {norm1,norm2 GroupNorm,
    token_mixer.{proj_in,conv.0,conv.1,proj_out,pws.{i},sps.{i}.filter_base},
    mlp.{fc1,fc2} 1x1 convs, res_scale{1,2}.scale}; norm_feat_stage{i}.
    SPF filter_base buffers are deterministic and recomputed on our side."""
    tree = _deep_dict(variables)
    written = set()
    for tkey, w in sd.items():
        w = np.asarray(w, np.float32)
        if ".sps." in tkey or tkey.startswith(("head.", "norm_cls.")):
            continue  # deterministic FFT filter buffers / cls leftovers
        m = re.match(r"patch_embed\.proj\.(weight|bias)$", tkey)
        if m:
            leaf = "kernel" if m.group(1) == "weight" else "bias"
            _set(tree, ["params", "stem", leaf],
                 _conv_w(w) if leaf == "kernel" else w, written)
            continue
        m = re.match(r"norm_feat_stage(\d+)\.(weight|bias)$", tkey)
        if m:
            _set(tree, ["params", f"norm_feat{m.group(1)}",
                        "scale" if m.group(2) == "weight" else "bias"], w, written)
            continue
        m = re.match(r"network\.(\d+)\.proj\.(weight|bias)$", tkey)
        if m:  # downsample PatchEmbed at odd indices -> stage (idx+1)//2
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            _set(tree, ["params", f"down{(int(m.group(1)) + 1) // 2}", leaf],
                 _conv_w(w) if leaf == "kernel" else w, written)
            continue
        m = re.match(r"network\.(\d+)\.(\d+)\.(.+)$", tkey)
        if m:
            si, b, rest = int(m.group(1)) // 2, m.group(2), m.group(3)
            pre = f"s{si}_b{b}"
            if re.match(r"norm[12]\.(weight|bias)$", rest):
                n, leaf = rest.split(".")
                _set(tree, ["params", f"{pre}_{n}",
                            "scale" if leaf == "weight" else "bias"], w, written)
            elif re.match(r"token_mixer\.(proj_in|proj_out)\.(weight|bias)$", rest):
                _, n, leaf = rest.replace(".", " ").split()
                _set(tree, ["params", f"{pre}_mix", n,
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif re.match(r"token_mixer\.conv\.([01])\.(weight|bias)$", rest):
                mm = re.match(r"token_mixer\.conv\.([01])\.(weight|bias)$", rest)
                leaf = "kernel" if mm.group(2) == "weight" else "bias"
                _set(tree, ["params", f"{pre}_mix", f"conv{mm.group(1)}", leaf],
                     _conv_w(w) if leaf == "kernel" else w, written)
            elif re.match(r"token_mixer\.pws\.(\d+)\.(weight|bias)$", rest):
                mm = re.match(r"token_mixer\.pws\.(\d+)\.(weight|bias)$", rest)
                leaf = "kernel" if mm.group(2) == "weight" else "bias"
                _set(tree, ["params", f"{pre}_mix", f"pw{mm.group(1)}", leaf],
                     _conv_w(w) if leaf == "kernel" else w, written)
            elif re.match(r"mlp\.fc[12]\.(weight|bias)$", rest):
                _, n, leaf = rest.replace(".", " ").split()
                _set(tree, ["params", f"{pre}_{n}",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif re.match(r"res_scale[12]\.scale$", rest):
                n = rest.split(".")[0][-1]
                _set(tree, ["params", f"{pre}_res{n}"], w, written)
            elif strict:
                raise KeyError(f"unmapped SPANet block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped SPANet key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def smt_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """SMT backbone (reference SMT.py:300).

    Torch layout: patch_embed1 = Head {conv.0 conv, conv.1 BN, conv.3 conv,
    conv.4 BN, norm LN}; patch_embed{2..4} = OverlapPatchEmbed {proj, norm};
    block{i}.{j} = {norm1, norm2, attn.{v,s,local_conv_k,proj0,bn,proj1 |
    q,kv,local_conv}, attn.proj, mlp.{fc1, dwconv.dwconv, fc2}}; stage norms
    norm{i}; classification head ignored."""
    tree = _deep_dict(variables)
    written = set()
    done_bn = set()

    def bn(params_path, tkey):
        if tkey not in done_bn:
            _bn_entries(tree, params_path, params_path, sd, tkey, written)
            done_bn.add(tkey)

    for tkey, w in sd.items():
        if tkey.endswith("num_batches_tracked") or tkey.startswith("head."):
            continue
        w = np.asarray(w, np.float32)
        m = re.match(r"patch_embed1\.conv\.([014])\.", tkey)
        if m:
            idx = m.group(1)
            if idx == "0":
                _set(tree, ["params", "stem_conv1", "kernel"], _conv_w(w), written)
            elif idx == "1":
                bn(["stem_bn1"], "patch_embed1.conv.1")
            else:
                bn(["stem_bn2"], "patch_embed1.conv.4")
            continue
        if re.match(r"patch_embed1\.conv\.3\.weight$", tkey):
            _set(tree, ["params", "stem_conv2", "kernel"], _conv_w(w), written)
            continue
        m = re.match(r"patch_embed1\.norm\.(weight|bias)$", tkey)
        if m:
            _set(tree, ["params", "stem_norm",
                        "scale" if m.group(1) == "weight" else "bias"], w, written)
            continue
        m = re.match(r"patch_embed(\d)\.(proj|norm)\.(weight|bias)$", tkey)
        if m:
            si, kind, leaf = int(m.group(1)) - 1, m.group(2), m.group(3)
            if kind == "proj":
                _set(tree, ["params", f"pe{si}", "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            else:
                _set(tree, ["params", f"pe{si}_norm",
                            "scale" if leaf == "weight" else "bias"], w, written)
            continue
        m = re.match(r"norm(\d)\.(weight|bias)$", tkey)
        if m:
            _set(tree, ["params", f"norm{m.group(1)}",
                        "scale" if m.group(2) == "weight" else "bias"], w, written)
            continue
        m = re.match(r"block(\d)\.(\d+)\.(.+)$", tkey)
        if m:
            si, b, rest = int(m.group(1)) - 1, m.group(2), m.group(3)
            pre = f"s{si}_b{b}"
            if re.match(r"norm[12]\.(weight|bias)$", rest):
                n, leaf = rest.split(".")
                _set(tree, ["params", f"{pre}_{n}",
                            "scale" if leaf == "weight" else "bias"], w, written)
            elif re.match(r"attn\.(v|s|q|kv|proj)\.(weight|bias)$", rest):
                _, n, leaf = rest.replace(".", " ").split()
                _set(tree, ["params", f"{pre}_attn", n,
                            "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif re.match(r"attn\.(local_conv(_\d+)?|proj0|proj1)\.(weight|bias)$", rest):
                parts = rest.split(".")
                n, leaf = parts[1], parts[2]
                _set(tree, ["params", f"{pre}_attn", n,
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif rest.startswith("attn.bn."):
                bn([f"{pre}_attn", "bn"], f"block{si + 1}.{b}.attn.bn")
            elif re.match(r"mlp\.fc[12]\.(weight|bias)$", rest):
                _, n, leaf = rest.replace(".", " ").split()
                _set(tree, ["params", f"{pre}_{n}",
                            "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif re.match(r"mlp\.dwconv\.dwconv\.(weight|bias)$", rest):
                leaf = rest.rsplit(".", 1)[1]
                _set(tree, ["params", f"{pre}_dw",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif strict:
                raise KeyError(f"unmapped SMT block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped SMT key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def cosnet_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """COSNet backbone (reference COSNet.py:164).

    Torch layout: downsample_layers.{0..3} convs; stages.{s}.{b} FSB =
    {conv_dw, norm_dw, layer_norm_1/2, attn.{proj_1,norm_proj,s_ctx_1,
    s_ctx_2,norm_s,h_ctx,norm_h,proj_2}, mlp.{fc_1,pos,fc_2}}."""
    tree = _deep_dict(variables)
    written = set()
    ln = {"layer_norm_1": "ln1", "layer_norm_2": "ln2"}
    for tkey, w in sd.items():
        w = np.asarray(w, np.float32)
        m = re.match(r"downsample_layers\.(\d+)\.(weight|bias)$", tkey)
        if m:
            s, leaf = int(m.group(1)), m.group(2)
            name = "stem" if s == 0 else f"down{s}"
            _set(tree, ["params", name, "kernel" if leaf == "weight" else "bias"],
                 _conv_w(w) if leaf == "weight" else w, written)
            continue
        m = re.match(r"stages\.(\d+)\.(\d+)\.(.+)$", tkey)
        if m:
            s, b, rest = m.group(1), m.group(2), m.group(3)
            pre = f"s{s}_b{b}"
            parts = rest.split(".")
            leaf = parts[-1]
            if parts[0] in ("conv_dw",):
                _set(tree, ["params", f"{pre}_conv_dw",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif parts[0] in ("norm_dw", "layer_norm_1", "layer_norm_2"):
                name = {"norm_dw": "norm_dw", **ln}[parts[0]]
                _set(tree, ["params", f"{pre}_{name}",
                            "scale" if leaf == "weight" else "bias"], w, written)
            elif parts[0] == "attn":
                n = parts[1]
                if n.startswith("norm"):
                    _set(tree, ["params", f"{pre}_attn", n,
                                "scale" if leaf == "weight" else "bias"], w, written)
                else:
                    _set(tree, ["params", f"{pre}_attn", n,
                                "kernel" if leaf == "weight" else "bias"],
                         _conv_w(w) if leaf == "weight" else w, written)
            elif parts[0] == "mlp":
                _set(tree, ["params", f"{pre}_{parts[1]}",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif strict:
                raise KeyError(f"unmapped COSNet block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped COSNet key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def decouplenet_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """DecoupleNet backbone (reference DecoupleNet.py:234).

    Torch layout: patch_embed.{proj,norm}; stages.{even}=BasicStage
    (.blocks.{b}.{MBFD.{Conv,MRLA.*,GA.*,norm}, mlp.{0,1,3}}),
    stages.{odd}=FID ({Gconv,pii.conv,conv_D,batch_norm_c,batch_norm_m,
    fusion,max_m2.filt}); norm_feat_stage{even}. Classifier head + fixed
    BlurPool buffers ignored."""
    tree = _deep_dict(variables)
    written = set()
    done_bn = set()

    def bn(path, tkey):
        if tkey not in done_bn:
            _bn_entries(tree, path, path, sd, tkey, written)
            done_bn.add(tkey)

    def conv(path, leaf, w):
        _set(tree, ["params", *path[:-1], path[-1],
                    "kernel" if leaf == "weight" else "bias"],
             _conv_w(w) if leaf == "weight" else w, written)

    mrla_map = {"primary_conv.0": ("primary", "conv"), "primary_conv.1": ("primary_bn", "bn"),
                "cheap_operation.0": ("cheap", "conv"), "cheap_operation.1": ("cheap_bn", "bn"),
                "init.0": ("init", "conv"), "init.1": ("init_bn", "bn"),
                "H_att": ("h_att", "conv"), "V_att": ("v_att", "conv"),
                "batchnorm": ("bn", "bn")}
    for tkey, w in sd.items():
        if (tkey.endswith("num_batches_tracked") or ".max_m2." in tkey or
                tkey.startswith(("head.", "avgpool_pre_head."))):
            continue
        w = np.asarray(w, np.float32)
        if tkey == "patch_embed.proj.weight":
            conv(["stem"], "weight", w)
            continue
        if tkey.startswith("patch_embed.norm."):
            bn(["stem_bn"], "patch_embed.norm")
            continue
        m = re.match(r"norm_feat_stage(\d+)\.", tkey)
        if m:
            bn([f"norm_feat{int(m.group(1)) // 2}"], f"norm_feat_stage{m.group(1)}")
            continue
        m = re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.+)$", tkey)
        if m:  # BasicStage block
            si, b, rest = int(m.group(1)) // 2, m.group(2), m.group(3)
            pre = f"s{si}_b{b}"
            tpre = f"stages.{m.group(1)}.blocks.{b}"
            leaf = rest.rsplit(".", 1)[1]
            if rest.startswith("MBFD.Conv."):
                conv([pre, "mbfd_conv"], leaf, w)
            elif rest.startswith("MBFD.MRLA."):
                inner = rest[len("MBFD.MRLA."):].rsplit(".", 1)[0]
                name, kind = mrla_map[inner]
                if kind == "bn":
                    bn([pre, "mrla", name], f"{tpre}.MBFD.MRLA.{inner}")
                else:
                    conv([pre, "mrla", name], leaf, w)
            elif rest.startswith("MBFD.GA."):
                n = rest.split(".")[2]
                _set(tree, ["params", pre, "ga", n, "kernel"], w.T, written)
            elif rest.startswith("MBFD.norm."):
                bn([pre, "ga_norm"], f"{tpre}.MBFD.norm")
            elif re.match(r"mlp\.0\.weight$", rest):
                conv([pre, "mlp0"], "weight", w)
            elif rest.startswith("mlp.1."):
                bn([pre, "mlp_bn"], f"{tpre}.mlp.1")
            elif re.match(r"mlp\.3\.weight$", rest):
                conv([pre, "mlp3"], "weight", w)
            elif strict:
                raise KeyError(f"unmapped DecoupleNet block key {tkey}")
            continue
        m = re.match(r"stages\.(\d+)\.(.+)$", tkey)
        if m:  # FID at odd indices
            fi, rest = (int(m.group(1)) - 1) // 2, m.group(2)
            pre = f"fid{fi}"
            tpre = f"stages.{m.group(1)}"
            leaf = rest.rsplit(".", 1)[1]
            if rest.startswith("Gconv."):
                conv([pre, "gconv"], leaf, w)
            elif rest.startswith("pii.conv."):
                conv([pre, "pii_conv"], leaf, w)
            elif rest.startswith("conv_D."):
                conv([pre, "conv_d"], leaf, w)
            elif rest.startswith("batch_norm_c."):
                bn([pre, "bn_c"], f"{tpre}.batch_norm_c")
            elif rest.startswith("batch_norm_m."):
                bn([pre, "bn_m"], f"{tpre}.batch_norm_m")
            elif rest.startswith("fusion."):
                conv([pre, "fusion"], leaf, w)
            elif strict:
                raise KeyError(f"unmapped DecoupleNet FID key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped DecoupleNet key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def uninext_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """UniNeXt / DilatedFormer_Windows backbone (reference UniNeXt.py:279).

    Torch layout: stem{1,2,3} convs + norm_act{1,2,3}.0 LNs; merge{0..3}
    {conv,norm}; stage{i}.{j} DilatedBlock = {norm1, qkv, q_bias, v_bias,
    attns.0.lepe, proj, norm2, mlp.{fc1,dwconv,norm_act.0,fc2}}; cpe{i}.{j}
    depthwise convs; final norm/head ignored."""
    tree = _deep_dict(variables)
    written = set()
    for tkey, w in sd.items():
        if tkey.startswith(("head.", "norm.")):
            continue
        w = np.asarray(w, np.float32)
        m = re.match(r"stem(\d)\.(weight|bias)$", tkey)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            _set(tree, ["params", f"stem{m.group(1)}", leaf],
                 _conv_w(w) if leaf == "kernel" else w, written)
            continue
        m = re.match(r"norm_act(\d)\.0\.(weight|bias)$", tkey)
        if m:
            _set(tree, ["params", f"norm_act{m.group(1)}",
                        "scale" if m.group(2) == "weight" else "bias"], w, written)
            continue
        m = re.match(r"merge(\d)\.(conv|norm)\.(weight|bias)$", tkey)
        if m:
            i, kind, leaf = m.group(1), m.group(2), m.group(3)
            if kind == "conv":
                _set(tree, ["params", f"merge{i}", "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            else:
                _set(tree, ["params", f"merge{i}_norm",
                            "scale" if leaf == "weight" else "bias"], w, written)
            continue
        m = re.match(r"cpe(\d)\.(\d+)\.(weight|bias)$", tkey)
        if m:
            leaf = "kernel" if m.group(3) == "weight" else "bias"
            _set(tree, ["params", f"s{int(m.group(1)) - 1}_cpe{m.group(2)}", leaf],
                 _conv_w(w) if leaf == "kernel" else w, written)
            continue
        m = re.match(r"stage(\d)\.(\d+)\.(.+)$", tkey)
        if m:
            pre = f"s{int(m.group(1)) - 1}_b{m.group(2)}"
            rest = m.group(3)
            leaf = rest.rsplit(".", 1)[1] if "." in rest else rest
            if re.match(r"norm[12]\.(weight|bias)$", rest):
                _set(tree, ["params", pre, rest.split(".")[0],
                            "scale" if leaf == "weight" else "bias"], w, written)
            elif rest == "qkv.weight":
                _set(tree, ["params", pre, "qkv", "kernel"], w.T, written)
            elif rest in ("q_bias", "v_bias"):
                _set(tree, ["params", pre, rest], w, written)
            elif rest.startswith("attns.0.lepe."):
                _set(tree, ["params", pre, "lepe",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif re.match(r"proj\.(weight|bias)$", rest):
                _set(tree, ["params", pre, "proj",
                            "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif re.match(r"mlp\.fc[12]\.(weight|bias)$", rest):
                _set(tree, ["params", pre, rest.split(".")[1],
                            "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif rest.startswith("mlp.dwconv."):
                _set(tree, ["params", pre, "mlp_dw",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif rest.startswith("mlp.norm_act.0."):
                _set(tree, ["params", pre, "mlp_norm",
                            "scale" if leaf == "weight" else "bias"], w, written)
            elif strict:
                raise KeyError(f"unmapped UniNeXt block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped UniNeXt key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def iformer_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """iFormer / InceptionTransformer backbone (reference iFormer.py:336).

    Torch layout: patch_embed1 = FirstPatchEmbed {proj1,norm1,proj2,norm2 BN};
    patch_embed{2..4} = {proj, norm BN}; pos_embed{1..4} (1,np,np,C);
    blocks{s}.{b} = {norm1, norm2 LN, attn.{high_mixer.{conv1,proj1,proj2},
    low_mixer.qkv, conv_fuse, proj}, mlp.{fc1,fc2}, layer_scale_1/2}."""
    tree = _deep_dict(variables)
    written = set()
    done_bn = set()

    def bn(path, tkey):
        if tkey not in done_bn:
            _bn_entries(tree, path, path, sd, tkey, written)
            done_bn.add(tkey)

    for tkey, w in sd.items():
        if tkey.endswith("num_batches_tracked") or tkey.startswith("head."):
            continue
        w = np.asarray(w, np.float32)
        m = re.match(r"patch_embed1\.proj(\d)\.(weight|bias)$", tkey)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            _set(tree, ["params", f"stem_conv{m.group(1)}", leaf],
                 _conv_w(w) if leaf == "kernel" else w, written)
            continue
        m = re.match(r"patch_embed1\.norm(\d)\.", tkey)
        if m:
            bn([f"stem_bn{m.group(1)}"], f"patch_embed1.norm{m.group(1)}")
            continue
        m = re.match(r"patch_embed(\d)\.proj\.(weight|bias)$", tkey)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            _set(tree, ["params", f"pe{m.group(1)}", leaf],
                 _conv_w(w) if leaf == "kernel" else w, written)
            continue
        m = re.match(r"patch_embed(\d)\.norm\.", tkey)
        if m:
            bn([f"pe{m.group(1)}_bn"], f"patch_embed{m.group(1)}.norm")
            continue
        m = re.match(r"pos_embed(\d)$", tkey)
        if m:
            _set(tree, ["params", f"pos_embed{m.group(1)}"], w[0], written)
            continue
        m = re.match(r"blocks(\d)\.(\d+)\.(.+)$", tkey)
        if m:
            pre = f"s{int(m.group(1)) - 1}_b{m.group(2)}"
            rest = m.group(3)
            leaf = rest.rsplit(".", 1)[1] if "." in rest else rest
            if re.match(r"norm[12]\.(weight|bias)$", rest):
                _set(tree, ["params", f"{pre}_{rest.split('.')[0]}",
                            "scale" if leaf == "weight" else "bias"], w, written)
            elif rest in ("layer_scale_1", "layer_scale_2"):
                _set(tree, ["params", f"{pre}_ls{rest[-1]}"], w, written)
            elif re.match(r"attn\.high_mixer\.(conv1|proj1|proj2)\.(weight|bias)$", rest):
                n = rest.split(".")[2]
                _set(tree, ["params", f"{pre}_attn", n,
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif re.match(r"attn\.low_mixer\.qkv\.(weight|bias)$", rest):
                _set(tree, ["params", f"{pre}_attn", "qkv",
                            "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif re.match(r"attn\.(conv_fuse|proj)\.(weight|bias)$", rest):
                n = rest.split(".")[1]
                _set(tree, ["params", f"{pre}_attn", n,
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif re.match(r"mlp\.fc[12]\.(weight|bias)$", rest):
                _set(tree, ["params", f"{pre}_{rest.split('.')[1]}",
                            "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif strict:
                raise KeyError(f"unmapped iFormer block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped iFormer key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def evit_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """EViT backbone (reference EViT.py:196).

    Torch layout: stem_conv{1..3}/stem_norm{1..3} (BN); patch_embed_{a..d}
    {proj, norm LN}; blocks_{a..d}.{b} = {norm1, norm2, proj (dw pos conv),
    attn.{q,k,v,proj | q_1,k_1,v_1,proj_1,sr_1,norm_1,q_2,k_2,v_2,proj_2,
    sr_2,norm_2}, mlp.{fc1,dwconv_1,Batch_Norm_1,dwconv_2,Batch_Norm_2,fc2}};
    stage norms norm_{a..d}."""
    tree = _deep_dict(variables)
    written = set()
    done_bn = set()
    st = {"a": 0, "b": 1, "c": 2, "d": 3}

    def bn(path, tkey):
        if tkey not in done_bn:
            _bn_entries(tree, path, path, sd, tkey, written)
            done_bn.add(tkey)

    for tkey, w in sd.items():
        if tkey.endswith("num_batches_tracked") or tkey.startswith("head."):
            continue
        w = np.asarray(w, np.float32)
        m = re.match(r"stem_conv(\d)\.(weight|bias)$", tkey)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            _set(tree, ["params", f"stem_conv{m.group(1)}", leaf],
                 _conv_w(w) if leaf == "kernel" else w, written)
            continue
        m = re.match(r"stem_norm(\d)\.", tkey)
        if m:
            bn([f"stem_bn{m.group(1)}"], f"stem_norm{m.group(1)}")
            continue
        m = re.match(r"patch_embed_([abcd])\.(proj|norm)\.(weight|bias)$", tkey)
        if m:
            si, kind, leaf = st[m.group(1)], m.group(2), m.group(3)
            if kind == "proj":
                _set(tree, ["params", f"pe{si}", "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            else:
                _set(tree, ["params", f"pe{si}_norm",
                            "scale" if leaf == "weight" else "bias"], w, written)
            continue
        m = re.match(r"norm_([abcd])\.(weight|bias)$", tkey)
        if m:
            _set(tree, ["params", f"norm_out{st[m.group(1)]}",
                        "scale" if m.group(2) == "weight" else "bias"], w, written)
            continue
        m = re.match(r"blocks_([abcd])\.(\d+)\.(.+)$", tkey)
        if m:
            pre = f"s{st[m.group(1)]}_b{m.group(2)}"
            rest = m.group(3)
            leaf = rest.rsplit(".", 1)[1]
            if re.match(r"norm[12]\.(weight|bias)$", rest):
                _set(tree, ["params", f"{pre}_{rest.split('.')[0]}",
                            "scale" if leaf == "weight" else "bias"], w, written)
            elif re.match(r"proj\.(weight|bias)$", rest):
                _set(tree, ["params", f"{pre}_proj",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif re.match(r"attn\.(q|k|v|proj|q_[12]|k_[12]|v_[12]|proj_[12])\.(weight|bias)$", rest):
                n = rest.split(".")[1]
                _set(tree, ["params", f"{pre}_attn", n,
                            "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif re.match(r"attn\.sr_[12]\.(weight|bias)$", rest):
                n = rest.split(".")[1]
                _set(tree, ["params", f"{pre}_attn", n,
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif re.match(r"attn\.norm_[12]\.(weight|bias)$", rest):
                n = rest.split(".")[1]
                _set(tree, ["params", f"{pre}_attn", n,
                            "scale" if leaf == "weight" else "bias"], w, written)
            elif re.match(r"mlp\.fc[12]\.(weight|bias)$", rest):
                _set(tree, ["params", f"{pre}_{rest.split('.')[1]}",
                            "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif re.match(r"mlp\.dwconv_([12])\.(weight|bias)$", rest):
                i = rest.split(".")[1][-1]
                _set(tree, ["params", f"{pre}_dw{i}",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif re.match(r"mlp\.Batch_Norm_([12])\.", rest):
                i = rest.split(".")[1][-1]
                bn([f"{pre}_bn{i}"], f"blocks_{m.group(1)}.{m.group(2)}.mlp.Batch_Norm_{i}")
            elif strict:
                raise KeyError(f"unmapped EViT block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped EViT key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def stvit_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """STViT backbone (reference STViT.py:307).

    Torch layout: patch_embed.proj.{0,3,6,9} convs / .{2,5,8,11} BNs;
    layers.{i}.blocks.{j} = {pos_embed.conv, norm1.norm LN,
    attn.stoken_refine.{qkv,proj} (+ fixed unfold/fold identity weights,
    skipped), norm2 BN, mlp2.{fc1, conv.conv, fc2}};
    layers.{i}.downsample.proj.{0 conv, 1 BN}; classification proj/norm/head
    ignored."""
    tree = _deep_dict(variables)
    written = set()
    done_bn = set()
    pe_conv = {"0": "pe0", "3": "pe1", "6": "pe2", "9": "pe3"}
    pe_bn = {"2": "pe0_bn", "5": "pe1_bn", "8": "pe2_bn", "11": "pe3_bn"}

    def bn(path, tkey):
        if tkey not in done_bn:
            _bn_entries(tree, path, path, sd, tkey, written)
            done_bn.add(tkey)

    for tkey, w in sd.items():
        if (tkey.endswith("num_batches_tracked") or ".unfold." in tkey or
                ".fold." in tkey or tkey.startswith(("head.", "norm.", "proj."))):
            continue
        w = np.asarray(w, np.float32)
        m = re.match(r"patch_embed\.proj\.(\d+)\.(weight|bias|running_mean|running_var)$", tkey)
        if m:
            idx, leaf = m.group(1), m.group(2)
            if idx in pe_conv and leaf in ("weight", "bias"):
                _set(tree, ["params", pe_conv[idx],
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            else:
                bn([pe_bn[idx]], f"patch_embed.proj.{idx}")
            continue
        m = re.match(r"layers\.(\d)\.downsample\.proj\.([01])\.", tkey)
        if m:
            i, idx = int(m.group(1)), m.group(2)
            if idx == "0":
                leaf = tkey.rsplit(".", 1)[1]
                _set(tree, ["params", f"down{i + 1}",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            else:
                bn([f"down{i + 1}_bn"], f"layers.{i}.downsample.proj.1")
            continue
        m = re.match(r"layers\.(\d)\.blocks\.(\d+)\.(.+)$", tkey)
        if m:
            pre = f"s{m.group(1)}_b{m.group(2)}"
            tpre = f"layers.{m.group(1)}.blocks.{m.group(2)}"
            rest = m.group(3)
            leaf = rest.rsplit(".", 1)[1]
            if rest.startswith("pos_embed.conv."):
                _set(tree, ["params", f"{pre}_pos",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif rest.startswith("norm1.norm."):
                _set(tree, ["params", f"{pre}_norm1",
                            "scale" if leaf == "weight" else "bias"], w, written)
            elif rest.startswith("attn.stoken_refine."):
                n = rest.split(".")[2]
                _set(tree, ["params", f"{pre}_attn", "stoken_refine", n,
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif rest.startswith("norm2."):
                bn([f"{pre}_norm2"], f"{tpre}.norm2")
            elif re.match(r"mlp2\.fc[12]\.(weight|bias)$", rest):
                _set(tree, ["params", f"{pre}_{rest.split('.')[1]}",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif rest.startswith("mlp2.conv.conv."):
                _set(tree, ["params", f"{pre}_mlp_dw",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif strict:
                raise KeyError(f"unmapped STViT block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped STViT key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def transxnet_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """TransXNet backbone (reference TransXNet.py:333).

    Torch layout: patch_embed.{proj,norm GN}; relative_pos_enc.{i};
    network.{even}.{b} Block = {pos_embed, norm1/2 GN,
    token_mixer.{local_unit.{weight,bias,proj.0,proj.1,proj.3},
    global_unit.{q,kv,local_conv,sr.0,sr.1,sr.3,sr.4},
    proj.{0,2,3,5,6,7}}, mlp.{fc1.0,fc1.2,dwconv.proj.{0..3},norm,fc2.0,
    fc2.1}, layer_scale_1/2.{weight,bias}}; network.{odd} downsample
    PatchEmbed; norm_out_layers.{i}; unused norm{dim} + classifier ignored."""
    tree = _deep_dict(variables)
    written = set()

    def gn(path, leaf, w):
        _set(tree, ["params", *path, "scale" if leaf == "weight" else "bias"],
             w, written)

    def conv(path, leaf, w):
        _set(tree, ["params", *path, "kernel" if leaf == "weight" else "bias"],
             _conv_w(w) if leaf == "weight" else w, written)

    mixer_proj = {"0": ("mix_proj0", "conv"), "2": ("mix_gn1", "gn"),
                  "3": ("mix_proj3", "conv"), "5": ("mix_gn2", "gn"),
                  "6": ("mix_proj6", "conv"), "7": ("mix_gn3", "gn")}
    sr_map = {"0": ("sr0", "conv"), "1": ("sr_gn1", "gn"),
              "3": ("sr3", "conv"), "4": ("sr_gn2", "gn")}
    for tkey, w in sd.items():
        if (tkey.startswith(("classifier_head.",)) or
                re.match(r"norm\d+\.(weight|bias)$", tkey)):
            continue
        w = np.asarray(w, np.float32)
        leaf = tkey.rsplit(".", 1)[1]
        if tkey.startswith("patch_embed.proj."):
            conv(["stem"], leaf, w)
            continue
        if tkey.startswith("patch_embed.norm."):
            gn(["stem_gn"], leaf, w)
            continue
        m = re.match(r"relative_pos_enc\.(\d)$", tkey)
        if m:
            _set(tree, ["params", f"rel_pos{m.group(1)}"], w[0], written)
            continue
        m = re.match(r"network\.(\d+)\.(proj|norm)\.(weight|bias)$", tkey)
        if m:  # downsample PatchEmbed at odd indices
            i = (int(m.group(1)) + 1) // 2
            if m.group(2) == "proj":
                conv([f"down{i}"], m.group(3), w)
            else:
                gn([f"down{i}_gn"], m.group(3), w)
            continue
        m = re.match(r"norm_out_layers\.(\d)\.(weight|bias)$", tkey)
        if m:
            gn([f"norm_out{m.group(1)}"], m.group(2), w)
            continue
        m = re.match(r"network\.(\d+)\.(\d+)\.(.+)$", tkey)
        if m:
            pre = f"s{int(m.group(1)) // 2}_b{m.group(2)}"
            rest = m.group(3)
            if rest.startswith("pos_embed."):
                conv([pre, "pos_embed"], leaf, w)
            elif re.match(r"norm[12]\.", rest):
                gn([pre, rest.split(".")[0]], leaf, w)
            elif re.match(r"layer_scale_([12])\.(weight|bias)$", rest):
                i = rest.split(".")[0][-1]
                _set(tree, ["params", pre,
                            f"ls{i}_{'w' if leaf == 'weight' else 'b'}"],
                     w.reshape(-1), written)
            elif rest == "token_mixer.local_unit.weight":
                _set(tree, ["params", pre, "local_unit", "weight"], w, written)
            elif rest == "token_mixer.local_unit.bias":
                _set(tree, ["params", pre, "local_unit", "bias"], w, written)
            elif re.match(r"token_mixer\.local_unit\.proj\.([013])\.", rest):
                idx = rest.split(".")[3]
                nmap = {"0": ("proj0", "conv"), "1": ("proj_gn", "gn"),
                        "3": ("proj3", "conv")}
                n, kind = nmap[idx]
                (conv if kind == "conv" else gn)([pre, "local_unit", n], leaf, w)
            elif re.match(r"token_mixer\.global_unit\.(q|kv|local_conv)\.", rest):
                conv([pre, "global_unit", rest.split(".")[2]], leaf, w)
            elif re.match(r"token_mixer\.global_unit\.sr\.([0134])\.", rest):
                n, kind = sr_map[rest.split(".")[3]]
                (conv if kind == "conv" else gn)([pre, "global_unit", n], leaf, w)
            elif re.match(r"token_mixer\.proj\.([023567])\.", rest):
                n, kind = mixer_proj[rest.split(".")[2]]
                (conv if kind == "conv" else gn)([pre, n], leaf, w)
            elif re.match(r"mlp\.fc1\.0\.weight$", rest):
                conv([pre, "fc1"], "weight", w)
            elif re.match(r"mlp\.fc1\.2\.", rest):
                gn([pre, "fc1_gn"], leaf, w)
            elif re.match(r"mlp\.dwconv\.proj\.(\d)\.", rest):
                conv([pre, f"msdw{rest.split('.')[3]}"], leaf, w)
            elif re.match(r"mlp\.norm\.", rest):
                gn([pre, "mid_gn"], leaf, w)
            elif re.match(r"mlp\.fc2\.0\.weight$", rest):
                conv([pre, "fc2"], "weight", w)
            elif re.match(r"mlp\.fc2\.1\.", rest):
                gn([pre, "fc2_gn"], leaf, w)
            elif strict:
                raise KeyError(f"unmapped TransXNet block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped TransXNet key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def glnet_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """GLNet backbone (reference GLNet.py:444, glnet_4g overlapped embeds).

    Torch layout: downsample_layers.0.{0,1,3,4} stem conv/BN pairs;
    downsample_layers.{1..3}.{0 conv, 1 BN}; stages.{i}.blocks.{j} =
    GLMixBlock {pos_conv, norm1 BN, slot_scale, relation_mha.{in_proj_weight,
    in_proj_bias, out_proj}, feature_conv.{0,1,2}, norm2 BN,
    mlp.{0,1,3}} or MHSA_NCHW {pos_conv, norm1 LN, mha_op.*, norm2 BN,
    mlp.{0,1,3}}."""
    tree = _deep_dict(variables)
    written = set()
    done_bn = set()

    def bn(path, tkey):
        if tkey not in done_bn:
            _bn_entries(tree, path, path, sd, tkey, written)
            done_bn.add(tkey)

    def conv(path, leaf, w):
        _set(tree, ["params", *path, "kernel" if leaf == "weight" else "bias"],
             _conv_w(w) if leaf == "weight" else w, written)

    stem_conv = {"0": "stem_conv1", "3": "stem_conv2"}
    stem_bn = {"1": "stem_bn1", "4": "stem_bn2"}
    fc = {"0": "fc_conv0", "1": "fc_dw", "2": "fc_conv2"}
    mlp = {"0": "mlp0", "1": "mlp_dw", "3": "mlp3"}
    for tkey, w in sd.items():
        if tkey.endswith("num_batches_tracked") or tkey.startswith("head."):
            continue
        w = np.asarray(w, np.float32)
        leaf = tkey.rsplit(".", 1)[1]
        m = re.match(r"downsample_layers\.0\.(\d)\.", tkey)
        if m:
            idx = m.group(1)
            if idx in stem_conv:
                conv([stem_conv[idx]], leaf, w)
            else:
                bn([stem_bn[idx]], f"downsample_layers.0.{idx}")
            continue
        m = re.match(r"downsample_layers\.(\d)\.([01])\.", tkey)
        if m:
            i, idx = m.group(1), m.group(2)
            if idx == "0":
                conv([f"down{i}"], leaf, w)
            else:
                bn([f"down{i}_bn"], f"downsample_layers.{i}.1")
            continue
        m = re.match(r"stages\.(\d)\.blocks\.(\d+)\.(.+)$", tkey)
        if m:
            pre = f"s{m.group(1)}_b{m.group(2)}"
            tpre = f"stages.{m.group(1)}.blocks.{m.group(2)}"
            rest = m.group(3)
            if rest.startswith("pos_conv."):
                conv([pre, "pos_conv"], leaf, w)
            elif rest == "slot_scale":
                _set(tree, ["params", pre, "slot_scale"], w, written)
            elif rest.startswith("norm1."):
                if f"{tpre}.norm1.running_mean" in sd:  # BN (GLMix)
                    bn([pre, "norm1"], f"{tpre}.norm1")
                else:  # LN (MHSA block)
                    _set(tree, ["params", pre, "norm1",
                                "scale" if leaf == "weight" else "bias"],
                         w, written)
            elif rest.startswith("norm2."):
                bn([pre, "norm2"], f"{tpre}.norm2")
            elif re.match(r"(relation_mha|mha_op)\.in_proj_(weight|bias)$", rest):
                n = rest.split(".")[0]
                n = "relation_mha" if n == "relation_mha" else "mha_op"
                _set(tree, ["params", pre, n, "in_proj",
                            "kernel" if rest.endswith("weight") else "bias"],
                     w.T if rest.endswith("weight") else w, written)
            elif re.match(r"(relation_mha|mha_op)\.out_proj\.(weight|bias)$", rest):
                n = rest.split(".")[0]
                _set(tree, ["params", pre, n, "out_proj",
                            "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif re.match(r"feature_conv\.([012])\.", rest):
                conv([pre, fc[rest.split(".")[1]]], leaf, w)
            elif re.match(r"mlp\.([013])\.", rest):
                conv([pre, mlp[rest.split(".")[1]]], leaf, w)
            elif strict:
                raise KeyError(f"unmapped GLNet block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped GLNet key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def emo2_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """EMOv2 / EMO2 backbone (reference EMOv2.py:560).

    Torch layout: stage0.{0,1,2} stem ConvNormActs; stage{1..4}.{j} iiRMB =
    {norm (BN or LN2d), eops.0.{net.conv | qk.conv, v.conv},
    conv_local.{conv,norm}, proj.conv, ls.gamma}; final norm/head ignored."""
    tree = _deep_dict(variables)
    written = set()
    done_bn = set()

    def bn(path, tkey):
        if tkey not in done_bn:
            _bn_entries(tree, path, path, sd, tkey, written)
            done_bn.add(tkey)

    def conv(path, leaf, w):
        _set(tree, ["params", *path, "kernel" if leaf == "weight" else "bias"],
             _conv_w(w) if leaf == "weight" else w, written)

    for tkey, w in sd.items():
        if (tkey.endswith("num_batches_tracked") or
                tkey.startswith(("head.", "norm."))):
            continue
        w = np.asarray(w, np.float32)
        leaf = tkey.rsplit(".", 1)[1]
        m = re.match(r"stage0\.(\d)\.(conv|norm)\.", tkey)
        if m:
            idx, kind = m.group(1), m.group(2)
            if kind == "conv":
                conv([f"stem{idx}"], leaf, w)
            else:
                bn([f"stem{idx}_bn"], f"stage0.{idx}.norm")
            continue
        m = re.match(r"stage(\d)\.(\d+)\.(.+)$", tkey)
        if m:
            pre = f"s{int(m.group(1)) - 1}_b{m.group(2)}"
            tpre = f"stage{m.group(1)}.{m.group(2)}"
            rest = m.group(3)
            if rest.startswith("norm."):
                if f"{tpre}.norm.running_mean" in sd:
                    bn([pre, "norm"], f"{tpre}.norm")
                else:  # ln_2d wraps nn.LayerNorm as .norm.norm
                    _set(tree, ["params", pre, "norm",
                                "scale" if leaf == "weight" else "bias"],
                         w, written)
            elif rest.startswith("eops.0.net.conv."):
                conv([pre, "eop_conv"], leaf, w)
            elif rest.startswith("eops.0.qk.conv."):
                conv([pre, "eop", "qk"], leaf, w)
            elif rest.startswith("eops.0.v.conv."):
                conv([pre, "eop", "v"], leaf, w)
            elif rest.startswith("conv_local.conv."):
                conv([pre, "local_conv"], leaf, w)
            elif rest.startswith("conv_local.norm."):
                bn([pre, "local_bn"], f"{tpre}.conv_local.norm")
            elif rest.startswith("proj.conv."):
                conv([pre, "proj"], leaf, w)
            elif rest == "ls.gamma":
                _set(tree, ["params", pre, "ls_gamma"], w.reshape(-1), written)
            elif strict:
                raise KeyError(f"unmapped EMO2 block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped EMO2 key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def pvtv2_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """PVTv2 backbone (reference PVTv2.py:352 PyramidVisionTransformerV2):
    patch_embed{i}.proj overlap conv + LN, block{i}.{j} spatial-reduction
    attention (q / kv / sr conv / sr-norm / proj) + dwconv MLP, per-stage
    out norm{i}. `linear=True` checkpoints (b2_li: pool+GELU sr path) are not
    supported and raise via strict key matching."""
    tree = _deep_dict(variables)
    written = set()
    LN = {"weight": "scale", "bias": "bias"}
    for tkey, w in sd.items():
        w = np.asarray(w, np.float32)
        m = re.match(r"patch_embed(\d+)\.proj\.(weight|bias)$", tkey)
        if m:
            s = int(m.group(1)) - 1
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            _set(tree, ["params", f"patch_{s}", leaf],
                 _conv_w(w) if leaf == "kernel" else w, written)
            continue
        m = re.match(r"patch_embed(\d+)\.norm\.(weight|bias)$", tkey)
        if m:
            _set(tree, ["params", f"patch_norm_{int(m.group(1)) - 1}", LN[m.group(2)]], w, written)
            continue
        m = re.match(r"norm(\d+)\.(weight|bias)$", tkey)
        if m:
            _set(tree, ["params", f"out_norm_{int(m.group(1)) - 1}", LN[m.group(2)]], w, written)
            continue
        m = re.match(r"block(\d+)\.(\d+)\.(.+)$", tkey)
        if m:
            s, b, rest = int(m.group(1)) - 1, int(m.group(2)), m.group(3)
            blk = ["params", f"s{s}_b{b}"]
            if re.match(r"norm[12]\.(weight|bias)$", rest):
                mod, leaf = rest.split(".")
                _set(tree, [*blk, mod, LN[leaf]], w, written)
            elif re.match(r"attn\.(q|kv|proj)\.weight$", rest):
                _set(tree, [*blk, rest.split(".")[1], "kernel"], w.T, written)
            elif re.match(r"attn\.(q|kv|proj)\.bias$", rest):
                _set(tree, [*blk, rest.split(".")[1], "bias"], w, written)
            elif rest == "attn.sr.weight":
                _set(tree, [*blk, "sr", "kernel"], _conv_w(w), written)
            elif rest == "attn.sr.bias":
                _set(tree, [*blk, "sr", "bias"], w, written)
            elif re.match(r"attn\.norm\.(weight|bias)$", rest):
                _set(tree, [*blk, "sr_norm", LN[rest.split(".")[2]]], w, written)
            elif re.match(r"mlp\.fc[12]\.weight$", rest):
                _set(tree, [*blk, rest.split(".")[1], "kernel"], w.T, written)
            elif re.match(r"mlp\.fc[12]\.bias$", rest):
                _set(tree, [*blk, rest.split(".")[1], "bias"], w, written)
            elif rest == "mlp.dwconv.dwconv.weight":
                _set(tree, [*blk, "dw", "kernel"], _conv_w(w), written)
            elif rest == "mlp.dwconv.dwconv.bias":
                _set(tree, [*blk, "dw", "bias"], w, written)
            elif strict:
                raise KeyError(f"unmapped PVTv2 block key {tkey}")
            continue
        if strict and not tkey.startswith("head."):
            raise KeyError(f"unmapped PVTv2 key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def hornet_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """HorNet 7x7 (reference HorNet.py:262).

    Torch layout: downsample_layers.0.{0 conv,1 LN} stem; downsample_layers.i
    = {0 LN, 1 conv}; stages.{s}.{b} Block = {norm1,norm2 LN; gamma1,gamma2;
    gnconv.{proj_in,dwconv,pws.{i},proj_out}; pwconv1,pwconv2 Linear};
    norm{i} out-LNs."""
    tree = _deep_dict(variables)
    written = set()
    for tkey, w in sd.items():
        w = np.asarray(w, np.float32)
        leaf = tkey.rsplit(".", 1)[-1]
        m = re.match(r"downsample_layers\.(\d+)\.(\d)\.(weight|bias)$", tkey)
        if m:
            s, sub = int(m.group(1)), int(m.group(2))
            if s == 0:
                name, is_conv = ("stem_conv", True) if sub == 0 else ("stem_ln", False)
            else:
                name, is_conv = (f"down{s}_ln", False) if sub == 0 else (f"down{s}_conv", True)
            if is_conv:
                _set(tree, ["params", name, "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            else:
                _set(tree, ["params", name, "scale" if leaf == "weight" else "bias"],
                     w, written)
            continue
        m = re.match(r"norm(\d+)\.(weight|bias)$", tkey)
        if m:
            _set(tree, ["params", f"norm{m.group(1)}",
                        "scale" if leaf == "weight" else "bias"], w, written)
            continue
        m = re.match(r"stages\.(\d+)\.(\d+)\.(.+)$", tkey)
        if m:
            s, b, rest = m.group(1), m.group(2), m.group(3)
            pre = ["params", f"s{s}_b{b}"]
            parts = rest.split(".")
            if parts[0] in ("gamma1", "gamma2"):
                _set(tree, pre + [parts[0]], w, written)
            elif parts[0] in ("norm1", "norm2"):
                _set(tree, pre + [parts[0], "scale" if leaf == "weight" else "bias"],
                     w, written)
            elif parts[0] in ("pwconv1", "pwconv2"):
                _set(tree, pre + [parts[0], "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif parts[0] == "gnconv":
                sub = parts[1]
                name = f"pws_{parts[2]}" if sub == "pws" else sub
                _set(tree, pre + ["gnconv", name,
                                  "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif strict:
                raise KeyError(f"unmapped HorNet block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped HorNet key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def moganet_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """MogaNet (reference MogaNet_backbone.py:455).

    Torch layout: patch_embed1.projection.{0 conv,1 BN,3 conv,4 BN} stacked
    stem; patch_embed{i}.{projection conv,norm BN}; blocks{i}.{j} MogaBlock =
    {norm1,norm2 BN; layer_scale_1/2 (1,C,1,1); attn.{proj_1,gate,proj_2,
    sigma.scale,value.{DW_conv0,DW_conv1,DW_conv2,PW_conv}};
    mlp.{fc1,dwconv,decompose,fc2,sigma.scale}}; norm{i} out-BNs."""
    tree = _deep_dict(variables)
    written = set()

    def conv_entry(path, tkey):
        _set(tree, ["params", *path, "kernel"], _conv_w(sd[f"{tkey}.weight"]), written)
        if f"{tkey}.bias" in sd:
            _set(tree, ["params", *path, "bias"], sd[f"{tkey}.bias"], written)

    handled = set()
    for tkey in sd:
        # raw Parameters first (their "leaf" is the parameter name itself)
        m = re.match(r"blocks(\d+)\.(\d+)\.(layer_scale_[12])$", tkey)
        if m:
            st, b = int(m.group(1)) - 1, m.group(2)
            _set(tree, ["params", f"s{st}_b{b}", m.group(3)],
                 np.asarray(sd[tkey], np.float32).reshape(-1), written)
            continue
        base = tkey.rsplit(".", 1)[0]
        if base in handled:
            continue
        m = re.match(r"patch_embed(\d+)\.(projection|norm)(?:\.(\d))?$", base)
        if m:
            st = int(m.group(1)) - 1
            sub = m.group(3)
            if st == 0:
                name = {"0": ("stem_conv1", True), "1": ("stem_bn1", False),
                        "3": ("stem_conv2", True), "4": ("stem_bn2", False)}[sub]
            else:
                name = (f"embed{st}_conv", True) if m.group(2) == "projection" \
                    else (f"embed{st}_bn", False)
            if name[1]:
                conv_entry([name[0]], base)
            else:
                _bn_entries(tree, [name[0]], [name[0]], sd, base, written)
            handled.add(base)
            continue
        m = re.match(r"norm(\d+)$", base)
        if m:
            st = int(m.group(1)) - 1
            _bn_entries(tree, [f"out_norm{st}"], [f"out_norm{st}"], sd, base, written)
            handled.add(base)
            continue
        m = re.match(r"blocks(\d+)\.(\d+)\.(.+)$", base)
        if m:
            st, b, rest = int(m.group(1)) - 1, m.group(2), m.group(3)
            pre = f"s{st}_b{b}"
            parts = rest.split(".")
            if parts[0] in ("norm1", "norm2"):
                _bn_entries(tree, [pre, parts[0]], [pre, parts[0]], sd, base, written)
            elif parts[0] == "attn":
                if parts[1] == "sigma":
                    _set(tree, ["params", pre, "attn", "sigma"],
                         np.asarray(sd[tkey], np.float32).reshape(-1), written)
                elif parts[1] == "value":
                    conv_entry([pre, "attn", "value", parts[2]], base)
                else:
                    conv_entry([pre, "attn", parts[1]], base)
            elif parts[0] == "mlp":
                if parts[1] == "sigma":
                    _set(tree, ["params", pre, "mlp", "sigma"],
                         np.asarray(sd[tkey], np.float32).reshape(-1), written)
                else:
                    conv_entry([pre, "mlp", parts[1]], base)
            elif strict:
                raise KeyError(f"unmapped MogaNet block key {tkey}")
            handled.add(base)
            continue
        if strict:
            raise KeyError(f"unmapped MogaNet key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def inceptionnext_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """InceptionNeXt / MetaNeXt (reference InceptionNext.py:173).

    Torch layout: stem.{0 conv,1 BN}; stages.{i}.downsample.{0 BN,1 conv};
    stages.{i}.blocks.{j} = {token_mixer.{dwconv_hw,dwconv_w,dwconv_h},
    norm BN, mlp.{fc1,fc2}, gamma}."""
    tree = _deep_dict(variables)
    written = set()
    handled = set()
    for tkey in sd:
        m = re.match(r"stages\.(\d+)\.blocks\.(\d+)\.gamma$", tkey)
        if m:
            _set(tree, ["params", f"s{m.group(1)}_b{m.group(2)}", "gamma"],
                 sd[tkey], written)
            continue
        base = tkey.rsplit(".", 1)[0]
        if base in handled:
            continue
        handled.add(base)

        def conv_entry(name):
            _set(tree, ["params", name, "kernel"], _conv_w(sd[f"{base}.weight"]), written)
            if f"{base}.bias" in sd:
                _set(tree, ["params", name, "bias"], sd[f"{base}.bias"], written)

        if base == "stem.0":
            conv_entry("stem_conv")
        elif base == "stem.1":
            _bn_entries(tree, ["stem_bn"], ["stem_bn"], sd, base, written)
        elif re.match(r"stages\.(\d+)\.downsample\.0$", base):
            i = re.match(r"stages\.(\d+)", base).group(1)
            _bn_entries(tree, [f"down{i}_bn"], [f"down{i}_bn"], sd, base, written)
        elif re.match(r"stages\.(\d+)\.downsample\.1$", base):
            i = re.match(r"stages\.(\d+)", base).group(1)
            conv_entry(f"down{i}_conv")
        else:
            m = re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.+)$", base)
            if not m:
                if strict:
                    raise KeyError(f"unmapped InceptionNeXt key {tkey}")
                continue
            i, b, rest = m.group(1), m.group(2), m.group(3)
            pre = f"s{i}_b{b}"
            if rest.startswith("token_mixer."):
                sub = rest.split(".", 1)[1]
                _set(tree, ["params", pre, "token_mixer", sub, "kernel"],
                     _conv_w(sd[f"{base}.weight"]), written)
                _set(tree, ["params", pre, "token_mixer", sub, "bias"],
                     sd[f"{base}.bias"], written)
            elif rest == "norm":
                _bn_entries(tree, [pre, "norm"], [pre, "norm"], sd, base, written)
            elif rest in ("mlp.fc1", "mlp.fc2"):
                name = rest.split(".")[1]
                _set(tree, ["params", pre, name, "kernel"],
                     _conv_w(sd[f"{base}.weight"]), written)
                _set(tree, ["params", pre, name, "bias"], sd[f"{base}.bias"], written)
            elif strict:
                raise KeyError(f"unmapped InceptionNeXt block key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def cswin_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """CSWin Transformer (reference CSWinTransformer.py:247).

    Torch layout: stage1_conv_embed.{0 conv,2 LN}; merge{i}.{conv,norm};
    stage{s}.{b} = {norm1,norm2 LN; qkv,proj Linear; attns.{i}.get_v DW conv;
    mlp.{fc1,fc2}}. The classifier-era `norm`/`head` keys are unused by the
    feature forward and skipped."""
    tree = _deep_dict(variables)
    written = set()
    for tkey, w in sd.items():
        w = np.asarray(w, np.float32)
        leaf = tkey.rsplit(".", 1)[-1]
        if tkey.startswith(("norm.", "head.")):
            continue  # classification tail: not part of the feature forward
        m = re.match(r"stage1_conv_embed\.(\d)\.(weight|bias)$", tkey)
        if m:
            if m.group(1) == "0":
                _set(tree, ["params", "stem_conv", "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            else:
                _set(tree, ["params", "stem_ln", "scale" if leaf == "weight" else "bias"],
                     w, written)
            continue
        m = re.match(r"merge(\d)\.(conv|norm)\.(weight|bias)$", tkey)
        if m:
            i = m.group(1)
            if m.group(2) == "conv":
                _set(tree, ["params", f"merge{i}_conv",
                            "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            else:
                _set(tree, ["params", f"merge{i}_ln",
                            "scale" if leaf == "weight" else "bias"], w, written)
            continue
        m = re.match(r"stage(\d)\.(\d+)\.(.+)$", tkey)
        if m:
            s, b, rest = int(m.group(1)) - 1, m.group(2), m.group(3)
            pre = ["params", f"s{s}_b{b}"]
            parts = rest.split(".")
            if parts[0] in ("norm1", "norm2"):
                _set(tree, pre + [parts[0], "scale" if leaf == "weight" else "bias"],
                     w, written)
            elif parts[0] in ("qkv", "proj"):
                _set(tree, pre + [parts[0], "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif parts[0] == "mlp":
                _set(tree, pre + [parts[1], "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif parts[0] == "attns":
                _set(tree, pre + [f"attn{parts[1]}", "get_v",
                                  "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif strict:
                raise KeyError(f"unmapped CSWin block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped CSWin key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def ghostnetv2_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """GhostNetV2 (reference GhostNetv2.py:178).

    Torch layout: conv_stem/bn1; blocks.{g}.{i} GhostBottleneckV2 =
    {ghost1.{primary_conv.{0,1},cheap_operation.{0,1},short_conv.{0..5}},
    conv_dw,bn_dw, se.{conv_reduce,conv_expand}, ghost2.{...},
    shortcut.{0..3}}; blocks.9.0.{conv,bn1} final ConvBnAct. Flax blocks are
    indexed by GLOBAL layer id (b0..b15)."""
    from ultralytics_pro_tpu.nn.modules.backbones5 import GHOSTNETV2_CFGS

    # group -> starting global layer id
    starts = []
    lid = 0
    for group in GHOSTNETV2_CFGS:
        starts.append(lid)
        lid += len(group)

    tree = _deep_dict(variables)
    written = set()
    handled = set()

    def conv_entry(path, tkey):
        _set(tree, ["params", *path, "kernel"], _conv_w(sd[f"{tkey}.weight"]), written)
        if f"{tkey}.bias" in sd:
            _set(tree, ["params", *path, "bias"], sd[f"{tkey}.bias"], written)

    ghost_map = {("primary_conv", "0"): ("primary_conv", True),
                 ("primary_conv", "1"): ("primary_bn", False),
                 ("cheap_operation", "0"): ("cheap_conv", True),
                 ("cheap_operation", "1"): ("cheap_bn", False),
                 ("short_conv", "0"): ("short_conv0", True),
                 ("short_conv", "1"): ("short_bn0", False),
                 ("short_conv", "2"): ("short_conv1", True),
                 ("short_conv", "3"): ("short_bn1", False),
                 ("short_conv", "4"): ("short_conv2", True),
                 ("short_conv", "5"): ("short_bn2", False)}
    shortcut_map = {"0": ("short_dw", True), "1": ("short_dw_bn", False),
                    "2": ("short_pw", True), "3": ("short_pw_bn", False)}

    for tkey in sd:
        base = tkey.rsplit(".", 1)[0]
        if base in handled:
            continue
        handled.add(base)
        if base == "conv_stem":
            conv_entry(["stem_conv"], base)
        elif base == "bn1":
            _bn_entries(tree, ["stem_bn"], ["stem_bn"], sd, base, written)
        elif base == "blocks.9.0.conv":
            conv_entry(["final_conv"], base)
        elif base == "blocks.9.0.bn1":
            _bn_entries(tree, ["final_bn"], ["final_bn"], sd, base, written)
        else:
            m = re.match(r"blocks\.(\d)\.(\d+)\.(.+)$", base)
            if not m:
                if strict:
                    raise KeyError(f"unmapped GhostNetV2 key {tkey}")
                continue
            g, i, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            pre = [f"b{starts[g] + i}"]
            parts = rest.split(".")
            if parts[0] in ("ghost1", "ghost2"):
                name, is_conv = ghost_map[(parts[1], parts[2])]
                if is_conv:
                    conv_entry(pre + [parts[0], name], base)
                else:
                    _bn_entries(tree, pre + [parts[0], name],
                                pre + [parts[0], name], sd, base, written)
            elif parts[0] == "conv_dw":
                conv_entry(pre + ["conv_dw"], base)
            elif parts[0] == "bn_dw":
                _bn_entries(tree, pre + ["bn_dw"], pre + ["bn_dw"], sd, base, written)
            elif parts[0] == "se":
                name = "se_reduce" if parts[1] == "conv_reduce" else "se_expand"
                conv_entry(pre + [name], base)
            elif parts[0] == "shortcut":
                name, is_conv = shortcut_map[parts[1]]
                if is_conv:
                    conv_entry(pre + [name], base)
                else:
                    _bn_entries(tree, pre + [name], pre + [name], sd, base, written)
            elif strict:
                raise KeyError(f"unmapped GhostNetV2 block key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def ghostnetv3_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True,
                                  cfgs=None):
    """GhostNetV3 train-form checkpoints (reference GhostNetv3.py:839);
    with cfgs=PARAMETERNET_CFGS also serves GhostNet_Reparam /
    parameternet_600m (reference ParameterNet.py:894 — the same reparam
    ghost layout in pure 'ori' mode, so its dicts simply carry no
    short_conv keys).

    Torch layout: conv_stem/bn1; stages.{g}.{i} GhostBottleneck =
    {ghost{1,2}.{primary_rpr_skip BN, primary_rpr_conv.{0-2}.{conv,bn},
    cheap_rpr_skip BN, cheap_rpr_scale.{conv,bn}, cheap_rpr_conv.{0-2}.{conv,bn},
    short_conv.{0..5}}, dw_rpr_scale/.conv, dw_rpr_conv.{0-2},
    se.{conv_reduce,conv_expand}, shortcut.{0..3}}; conv_last.{conv,bn1}.
    The fused primary_conv_module/cheap_operation_module and conv_dw/bn_dw
    entries are DEAD until the torch reparameterize() runs (training forward
    never reads them) and are skipped. Flax blocks are named by GLOBAL layer
    id (b0..b15)."""
    from ultralytics_pro_tpu.nn.modules.backbones5 import GHOSTNETV3_CFGS

    starts = []
    lid = 0
    for group in (GHOSTNETV3_CFGS if cfgs is None else cfgs):
        starts.append(lid)
        lid += len(group)

    tree = _deep_dict(variables)
    written = set()
    handled = set()

    def conv_entry(path, tkey):
        _set(tree, ["params", *path, "kernel"], _conv_w(sd[f"{tkey}.weight"]), written)
        if f"{tkey}.bias" in sd:
            _set(tree, ["params", *path, "bias"], sd[f"{tkey}.bias"], written)

    short_map = {"0": ("short_conv0", True), "1": ("short_bn0", False),
                 "2": ("short_conv1", True), "3": ("short_bn1", False),
                 "4": ("short_conv2", True), "5": ("short_bn2", False)}
    shortcut_map = {"0": ("short_dw", True), "1": ("short_dw_bn", False),
                    "2": ("short_pw", True), "3": ("short_pw_bn", False)}

    def ghost_entry(pre, parts, base):
        """parts = key path inside a GhostModule (after ghost1/ghost2)."""
        if parts[0] in ("primary_conv_module", "cheap_operation_module"):
            return  # fused inference path: dead until reparameterize()
        if parts[0] == "primary_rpr_skip":
            _bn_entries(tree, pre + ["primary_skip_bn"],
                        pre + ["primary_skip_bn"], sd, base, written)
        elif parts[0] == "primary_rpr_conv":
            name = f"primary_conv{parts[1]}" if parts[2] == "conv" \
                else f"primary_bn{parts[1]}"
            if parts[2] == "conv":
                conv_entry(pre + [name], base)
            else:
                _bn_entries(tree, pre + [name], pre + [name], sd, base, written)
        elif parts[0] == "cheap_rpr_skip":
            _bn_entries(tree, pre + ["cheap_skip_bn"],
                        pre + ["cheap_skip_bn"], sd, base, written)
        elif parts[0] == "cheap_rpr_scale":
            if parts[1] == "conv":
                conv_entry(pre + ["cheap_scale_conv"], base)
            else:
                _bn_entries(tree, pre + ["cheap_scale_bn"],
                            pre + ["cheap_scale_bn"], sd, base, written)
        elif parts[0] == "cheap_rpr_conv":
            name = f"cheap_conv{parts[1]}" if parts[2] == "conv" \
                else f"cheap_bn{parts[1]}"
            if parts[2] == "conv":
                conv_entry(pre + [name], base)
            else:
                _bn_entries(tree, pre + [name], pre + [name], sd, base, written)
        elif parts[0] == "short_conv":
            name, is_conv = short_map[parts[1]]
            if is_conv:
                conv_entry(pre + [name], base)
            else:
                _bn_entries(tree, pre + [name], pre + [name], sd, base, written)
        elif strict:
            raise KeyError(f"unmapped GhostNetV3 ghost key {base}")

    for tkey in sd:
        base = tkey.rsplit(".", 1)[0]
        if base in handled:
            continue
        handled.add(base)
        if base == "conv_stem":
            conv_entry(["stem_conv"], base)
        elif base == "bn1":
            _bn_entries(tree, ["stem_bn"], ["stem_bn"], sd, base, written)
        elif base == "conv_last.conv":
            conv_entry(["final_conv"], base)
        elif base == "conv_last.bn1":
            _bn_entries(tree, ["final_bn"], ["final_bn"], sd, base, written)
        else:
            m = re.match(r"stages\.(\d)\.(\d+)\.(.+)$", base)
            if not m:
                if strict:
                    raise KeyError(f"unmapped GhostNetV3 key {tkey}")
                continue
            g, i, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            pre = [f"b{starts[g] + i}"]
            parts = rest.split(".")
            if parts[0] in ("ghost1", "ghost2"):
                ghost_entry(pre + [parts[0]], parts[1:], base)
            elif parts[0] in ("conv_dw", "bn_dw"):
                continue  # inference DW path: dead until reparameterize()
            elif parts[0] == "dw_rpr_scale":
                if parts[1] == "conv":
                    conv_entry(pre + ["dw_scale_conv"], base)
                else:
                    _bn_entries(tree, pre + ["dw_scale_bn"],
                                pre + ["dw_scale_bn"], sd, base, written)
            elif parts[0] == "dw_rpr_conv":
                name = f"dw_conv{parts[1]}" if parts[2] == "conv" \
                    else f"dw_bn{parts[1]}"
                if parts[2] == "conv":
                    conv_entry(pre + [name], base)
                else:
                    _bn_entries(tree, pre + [name], pre + [name], sd, base, written)
            elif parts[0] == "se":
                name = "se_reduce" if parts[1] == "conv_reduce" else "se_expand"
                conv_entry(pre + [name], base)
            elif parts[0] == "shortcut":
                name, is_conv = shortcut_map[parts[1]]
                if is_conv:
                    conv_entry(pre + [name], base)
                else:
                    _bn_entries(tree, pre + [name], pre + [name], sd, base, written)
            elif strict:
                raise KeyError(f"unmapped GhostNetV3 block key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def parameternet_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """GhostNet_Reparam / parameternet_600m (reference ParameterNet.py:894):
    the GhostNetV3 key layout over the ParameterNet stage table."""
    from ultralytics_pro_tpu.nn.modules.backbones5 import PARAMETERNET_CFGS

    return ghostnetv3_state_dict_to_flax(variables, sd, strict=strict,
                                         cfgs=PARAMETERNET_CFGS)


def mambavision_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """MambaVision (reference MambaVision.py:535).

    Torch layout: patch_embed.conv_down.{0 conv,1 bn,3 conv,4 bn};
    levels.{i}.blocks.{j} = ConvBlock {conv1,norm1 BN,conv2,norm2 BN} for
    levels 0-1, Block {norm1/norm2 LN; mixer = MambaVisionMixer
    {in_proj,x_proj,dt_proj,A_log,D,out_proj,conv1d_x,conv1d_z} or Attention
    {qkv,proj}; mlp.fc1/fc2} for levels 2-3;
    levels.{i}.downsample.reduction.0 conv. Classifier `head` skipped."""
    tree = _deep_dict(variables)
    written = set()
    patch_map = {"0": ("patch_conv1", "conv"), "1": ("patch_bn1", "bn"),
                 "3": ("patch_conv2", "conv"), "4": ("patch_bn2", "bn")}
    for tkey, w in sd.items():
        if tkey.endswith("num_batches_tracked") or tkey.startswith("head."):
            continue
        if tkey.endswith(("running_mean", "running_var")):
            continue  # written together with the BN weight below
        w = np.asarray(w, np.float32)
        leaf = tkey.rsplit(".", 1)[-1]
        m = re.match(r"patch_embed\.conv_down\.(\d)\.weight$", tkey)
        if m:
            name, kind = patch_map[m.group(1)]
            if kind == "conv":
                _set(tree, ["params", name, "kernel"], _conv_w(w), written)
            else:
                _bn_entries(tree, [name], [name], sd, tkey[:-7], written)
            continue
        if re.match(r"patch_embed\.conv_down\.\d\.bias$", tkey):
            continue  # BN bias written by _bn_entries
        m = re.match(r"levels\.(\d)\.downsample\.reduction\.0\.weight$", tkey)
        if m:
            _set(tree, ["params", f"down{m.group(1)}", "kernel"], _conv_w(w), written)
            continue
        m = re.match(r"levels\.(\d)\.blocks\.(\d+)\.(.+)$", tkey)
        if m:
            lvl, bi, rest = int(m.group(1)), m.group(2), m.group(3)
            pre = ["params", f"s{lvl}_b{bi}"]
            parts = rest.split(".")
            if lvl < 2:  # ConvBlock: conv1/norm1(BN)/conv2/norm2(BN)
                if parts[0] in ("conv1", "conv2"):
                    _set(tree, pre + [parts[0], "kernel" if leaf == "weight" else "bias"],
                         _conv_w(w) if leaf == "weight" else w, written)
                elif parts[0] in ("norm1", "norm2"):
                    if leaf == "weight":
                        _bn_entries(tree, [f"s{lvl}_b{bi}", parts[0]],
                                    [f"s{lvl}_b{bi}", parts[0]], sd,
                                    tkey[:-7], written)
                elif strict:
                    raise KeyError(f"unmapped MambaVision conv-block key {tkey}")
                continue
            if parts[0] in ("norm1", "norm2"):  # LayerNorm
                _set(tree, pre + [parts[0], "scale" if leaf == "weight" else "bias"],
                     w, written)
            elif parts[0] == "mlp":
                _set(tree, pre + [parts[1], "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif parts[0] == "mixer":
                sub = parts[1]
                if sub in ("in_proj", "x_proj", "out_proj", "qkv", "proj"):
                    _set(tree, pre + ["mixer", sub,
                                      "kernel" if leaf == "weight" else "bias"],
                         w.T if leaf == "weight" else w, written)
                elif sub == "dt_proj":
                    # explicit params: the kernel semantics reuse the bias as
                    # delta_bias (the reference's double-add quirk)
                    _set(tree, pre + ["mixer", "dt_proj_kernel" if leaf == "weight"
                                      else "dt_proj_bias"],
                         w.T if leaf == "weight" else w, written)
                elif sub in ("A_log", "D"):
                    _set(tree, pre + ["mixer", sub], w, written)
                elif sub in ("conv1d_x", "conv1d_z"):
                    # torch depthwise conv1d (C,1,K) -> flax (K,1,C)
                    _set(tree, pre + ["mixer", sub,
                                      "kernel" if leaf == "weight" else "bias"],
                         w.transpose(2, 1, 0) if leaf == "weight" else w, written)
                elif strict:
                    raise KeyError(f"unmapped MambaVision mixer key {tkey}")
            elif strict:
                raise KeyError(f"unmapped MambaVision block key {tkey}")
            continue
        if strict:
            raise KeyError(f"unmapped MambaVision key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def maxvit_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """MaxViT (reference MaxViT.py:617).

    Torch layout: stem.{0,2} convs; stages.{i}.blocks.{j} = mb_conv
    {main_path.0 BN, .1 conv1x1, .2 timm DSC {conv_dw,bn1,conv_pw,bn2},
    .3 SE {conv_reduce,conv_expand}, .4 conv1x1; skip_path.1 conv1x1} +
    {block,grid}_transformer {norm_1,norm_2 LN; attention.{qkv_mapping,proj,
    relative_position_bias_table}; mlp.fc1/fc2}. Classifier `head` skipped;
    relative_position_index is a non-persistent buffer (absent)."""
    tree = _deep_dict(variables)
    written = set()
    main_conv = {"1": "conv1", "4": "conv2"}
    dsc = {"conv_dw": "conv_dw", "conv_pw": "conv_pw"}
    for tkey, w in sd.items():
        if tkey.endswith("num_batches_tracked") or tkey.startswith("head."):
            continue
        if tkey.endswith(("running_mean", "running_var")):
            continue  # written with the BN weight
        w = np.asarray(w, np.float32)
        leaf = tkey.rsplit(".", 1)[-1]
        m = re.match(r"stem\.(\d)\.(weight|bias)$", tkey)
        if m:
            name = "stem_conv1" if m.group(1) == "0" else "stem_conv2"
            _set(tree, ["params", name, "kernel" if leaf == "weight" else "bias"],
                 _conv_w(w) if leaf == "weight" else w, written)
            continue
        m = re.match(r"stages\.(\d)\.blocks\.(\d+)\.(.+)$", tkey)
        if not m:
            if strict:
                raise KeyError(f"unmapped MaxViT key {tkey}")
            continue
        st, bi, rest = m.group(1), m.group(2), m.group(3)
        parts = rest.split(".")
        if parts[0] == "mb_conv":
            pre = ["params", f"s{st}_b{bi}_mb"]
            if parts[1] == "main_path":
                idx = parts[2]
                if idx == "0":  # BN
                    if leaf == "weight":
                        _bn_entries(tree, [f"s{st}_b{bi}_mb", "pre_bn"],
                                    [f"s{st}_b{bi}_mb", "pre_bn"], sd,
                                    tkey[:-7], written)
                elif idx in main_conv:
                    _set(tree, pre + [main_conv[idx],
                                      "kernel" if leaf == "weight" else "bias"],
                         _conv_w(w) if leaf == "weight" else w, written)
                elif idx == "2":  # timm DSC
                    sub = parts[3]
                    if sub in dsc:
                        _set(tree, pre + [dsc[sub], "kernel"], _conv_w(w), written)
                    elif sub in ("bn1", "bn2"):
                        if leaf == "weight":
                            _bn_entries(tree, [f"s{st}_b{bi}_mb", sub],
                                        [f"s{st}_b{bi}_mb", sub], sd,
                                        tkey[:-7], written)
                    elif strict:
                        raise KeyError(f"unmapped MaxViT DSC key {tkey}")
                elif idx == "3":  # SE
                    name = "se_reduce" if parts[3] == "conv_reduce" else "se_expand"
                    _set(tree, pre + [name, "kernel" if leaf == "weight" else "bias"],
                         _conv_w(w) if leaf == "weight" else w, written)
                elif strict:
                    raise KeyError(f"unmapped MaxViT main_path key {tkey}")
            elif parts[1] == "skip_path":
                _set(tree, pre + ["skip_conv",
                                  "kernel" if leaf == "weight" else "bias"],
                     _conv_w(w) if leaf == "weight" else w, written)
            elif strict:
                raise KeyError(f"unmapped MaxViT mb_conv key {tkey}")
            continue
        tb = {"block_transformer": "blk", "grid_transformer": "grd"}.get(parts[0])
        if tb is None:
            if strict:
                raise KeyError(f"unmapped MaxViT block key {tkey}")
            continue
        pre = ["params", f"s{st}_b{bi}_{tb}"]
        if parts[1] in ("norm_1", "norm_2"):
            _set(tree, pre + [parts[1].replace("_", ""),
                              "scale" if leaf == "weight" else "bias"], w, written)
        elif parts[1] == "attention":
            sub = parts[2]
            if sub == "qkv_mapping":
                _set(tree, pre + ["qkv", "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif sub == "proj":
                _set(tree, pre + ["proj", "kernel" if leaf == "weight" else "bias"],
                     w.T if leaf == "weight" else w, written)
            elif sub == "relative_position_bias_table":
                _set(tree, pre + ["rel_bias"], w, written)
            elif strict:
                raise KeyError(f"unmapped MaxViT attention key {tkey}")
        elif parts[1] == "mlp":
            _set(tree, pre + [parts[2], "kernel" if leaf == "weight" else "bias"],
                 w.T if leaf == "weight" else w, written)
        elif strict:
            raise KeyError(f"unmapped MaxViT transformer key {tkey}")
    if strict:
        missing = _unwritten(tree, written)
        assert not missing, f"flax leaves not covered: {missing[:8]}"
    return tree


def load_backbone_checkpoint(family: str, variables: Dict, path_or_sd, strict=True):
    """Entry point: family in {convnext, fasternet, swin}; `path_or_sd` is a
    local .pt path (loaded dependency-free via tools/convert_pt.py) or an
    already-extracted {key: ndarray} state_dict."""
    if isinstance(path_or_sd, (str, bytes)) or hasattr(path_or_sd, "read_bytes"):
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "convert_pt", os.path.join(os.path.dirname(__file__), "..", "..", "..",
                                       "tools", "convert_pt.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        obj = mod.load_pt(path_or_sd)
        sd = mod.extract_state_dict(obj)
    else:
        sd = path_or_sd
    fn = {"convnext": convnext_state_dict_to_flax,
          "fasternet": fasternet_state_dict_to_flax,
          "swin": swin_state_dict_to_flax,
          "efficientformerv2": efficientformerv2_state_dict_to_flax,
          "vheat": vheat_state_dict_to_flax,
          "spanet": spanet_state_dict_to_flax,
          "smt": smt_state_dict_to_flax,
          "cosnet": cosnet_state_dict_to_flax,
          "decouplenet": decouplenet_state_dict_to_flax,
          "uninext": uninext_state_dict_to_flax,
          "iformer": iformer_state_dict_to_flax,
          "evit": evit_state_dict_to_flax,
          "stvit": stvit_state_dict_to_flax,
          "transxnet": transxnet_state_dict_to_flax,
          "glnet": glnet_state_dict_to_flax,
          "emo2": emo2_state_dict_to_flax,
          "pvtv2": pvtv2_state_dict_to_flax,
          "hornet": hornet_state_dict_to_flax,
          "moganet": moganet_state_dict_to_flax,
          "inceptionnext": inceptionnext_state_dict_to_flax,
          "cswin": cswin_state_dict_to_flax,
          "ghostnetv2": ghostnetv2_state_dict_to_flax,
          # V1 shares V2's layout minus the DFC keys (GhostNetv1.py:158)
          "ghostnetv1": ghostnetv2_state_dict_to_flax,
          "ghostnetv3": ghostnetv3_state_dict_to_flax,
          "parameternet": parameternet_state_dict_to_flax,
          "mambavision": mambavision_state_dict_to_flax,
          "maxvit": maxvit_state_dict_to_flax}[family]
    return fn(variables, sd, strict=strict)
