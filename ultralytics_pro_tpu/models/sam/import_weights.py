"""Official-SAM checkpoint import (VERDICT r2 Missing #6 / Next #7).

Maps a torch SAM state_dict (sam_vit_b/l/h layout: image_encoder.* /
prompt_encoder.* / mask_decoder.*, reference models/sam/build.py:24-356) onto
this repo's flax SAMModel param tree. Conventions handled:

- conv weights OIHW -> HWIO; ConvTranspose (in, out, kh, kw) -> (kh, kw, in, out)
- linear weights transposed
- LayerNorm2d keeps its torch leaf name `weight` (our LayerNorm2d stores
  `weight`/`bias`, not flax `scale`)
- patch_embed.proj.* -> patch_embed.*
- prompt_encoder.point_embeddings.{0..3}.weight (four (1, C) Embeddings) stack
  into our single (4, C) `point_embeddings`
- token Embeddings (iou_token/mask_tokens/not_a_point_embed/no_mask_embed)
  drop the trailing `.weight`
- nn.Sequential indices merge into the parent name (neck.0 -> neck_0)

`load_sam_checkpoint(model, variables, path_or_sd)` returns the updated
variables; every flax leaf must be covered (strict) — the parity test in
tests/test_sam_import.py builds the reference torch SAM with random weights
and asserts our forward reproduces its image embeddings and mask logits.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _flax_leaf_paths(variables):
    import jax

    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        names = tuple(str(getattr(k, "key", getattr(k, "idx", ""))) for k in kp)
        flat[names] = leaf
    return flat


def _merge_digits(parts):
    out = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


def sam_state_dict_to_flax(variables: Dict, sd: Dict[str, np.ndarray], strict: bool = True):
    """Return a copy of `variables` with leaves replaced from the torch sd."""
    flat = _flax_leaf_paths(variables)
    new_flat = dict(flat)
    used = set()
    missing = []

    # stack the four point embeddings first
    pe_keys = [k for k in sd if ".point_embeddings." in k]
    if pe_keys:
        n = len(pe_keys)
        stacked = np.stack([np.asarray(sd[f"prompt_encoder.point_embeddings.{i}.weight"],
                                       np.float32).reshape(-1) for i in range(n)])
        tgt = ("params", "prompt_encoder", "point_embeddings")
        if tgt in flat:
            new_flat[tgt] = stacked
            used.add(tgt)

    for tkey, w in sd.items():
        if ".point_embeddings." in tkey or "num_batches_tracked" in tkey:
            continue
        w = np.asarray(w, np.float32)
        parts = tkey.split(".")
        # patch_embed.proj.* -> patch_embed.*
        parts = [p for i, p in enumerate(parts)
                 if not (p == "proj" and i > 0 and parts[i - 1] == "patch_embed")]
        leaf = parts[-1]
        path = _merge_digits(parts[:-1])
        # token embeddings: iou_token.weight -> iou_token
        if leaf == "weight" and path and path[-1] in (
                "iou_token", "mask_tokens", "not_a_point_embed", "no_mask_embed"):
            cand = ("params", *path)
            if cand in flat:
                new_flat[cand] = w.reshape(flat[cand].shape)
                used.add(cand)
                continue
        target = None
        is_weight_to_kernel = False
        if leaf == "weight":
            for lf in ("kernel", "scale", "weight"):
                cand = ("params", *path, lf)
                if cand in flat:
                    target = cand
                    is_weight_to_kernel = lf == "kernel"
                    break
        else:
            cand = ("params", *path, leaf)
            if cand in flat:
                target = cand
        if target is None:
            cand = ("params", *path)
            if cand in flat:  # bare parameter (pos_embed, rel_pos_h, gaussian matrix)
                target = cand
        if target is None:
            missing.append(tkey)
            continue
        tgt_shape = tuple(flat[target].shape)
        if is_weight_to_kernel and w.ndim == 2:
            # linear weights ALWAYS transpose (out,in)->(in,out) — including
            # square matrices where a shape check cannot tell
            w = w.T
        elif tuple(w.shape) != tgt_shape:
            if w.ndim == 4:
                cand_a = w.transpose(2, 3, 1, 0)  # conv OIHW -> HWIO
                # conv-transpose (in,out,kh,kw) -> (kh,kw,in,out) SPATIALLY
                # FLIPPED (flax ConvTranspose correlates; torch convolves)
                cand_b = np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])
                w = cand_a if cand_a.shape == tgt_shape else cand_b
            elif w.ndim == 2:
                w = w.T
        if tuple(w.shape) != tgt_shape:
            raise ValueError(f"{tkey}: shape {w.shape} vs flax {tgt_shape}")
        new_flat[target] = w
        used.add(target)

    uncovered = [k for k in flat if k not in used]
    if strict and missing:
        raise KeyError(f"{len(missing)} torch keys had no flax target, e.g. {missing[:8]}")
    if strict and uncovered:
        raise KeyError(f"{len(uncovered)} flax leaves not covered, e.g. {uncovered[:8]}")

    # rebuild the nested dict
    out: Dict = {}
    for names, v in new_flat.items():
        node = out
        for n in names[:-1]:
            node = node.setdefault(n, {})
        node[names[-1]] = v
    return out


def sam2_encoder_state_dict_to_flax(variables: Dict, sd: Dict, strict: bool = True):
    """Import the SAM2 image encoder (Hiera trunk + FPN neck) from an official
    sam2 checkpoint state_dict into SAM2Model variables.

    Torch layout (reference models/sam/modules/encoders.py:644 Hiera, :504
    FpnNeck; build.py:216 _build_sam2): image_encoder.trunk.* /
    image_encoder.neck.convs.{k}.conv.*; the stride-4/8 high-res projections
    live in the reference decoder as sam_mask_decoder.conv_s0/conv_s1 and map
    onto our neck's hr0/hr1. Non-encoder keys are ignored. strict asserts
    every trunk/neck leaf of OUR tree was written (hr0/hr1 only when the
    checkpoint carries conv_s0/conv_s1)."""
    import re

    def deep(t):
        if hasattr(t, "items"):
            return {k: deep(v) for k, v in t.items()}
        return np.asarray(t)

    tree = deep(variables)
    written = set()

    def put(path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        old = node[path[-1]]
        value = np.asarray(value, np.float32)
        if tuple(old.shape) != tuple(value.shape):
            raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                             f"{tuple(old.shape)} vs {tuple(value.shape)}")
        node[path[-1]] = value
        written.add(tuple(path))

    LN = {"weight": "scale", "bias": "bias"}
    for tkey, w in sd.items():
        k = tkey[6:] if tkey.startswith("model.") else tkey
        w = np.asarray(w, np.float32)
        if k == "sam_mask_decoder.conv_s0.weight":
            put(["params", "neck", "hr0", "kernel"], w.transpose(2, 3, 1, 0))
            continue
        if k == "sam_mask_decoder.conv_s0.bias":
            put(["params", "neck", "hr0", "bias"], w)
            continue
        if k == "sam_mask_decoder.conv_s1.weight":
            put(["params", "neck", "hr1", "kernel"], w.transpose(2, 3, 1, 0))
            continue
        if k == "sam_mask_decoder.conv_s1.bias":
            put(["params", "neck", "hr1", "bias"], w)
            continue
        if not k.startswith("image_encoder."):
            continue
        k = k[len("image_encoder."):]
        if k == "trunk.patch_embed.proj.weight":
            put(["params", "trunk", "patch_embed", "kernel"], w.transpose(2, 3, 1, 0))
        elif k == "trunk.patch_embed.proj.bias":
            put(["params", "trunk", "patch_embed", "bias"], w)
        elif k == "trunk.pos_embed":
            put(["params", "trunk", "pos_embed"], w.transpose(0, 2, 3, 1))
        elif k == "trunk.pos_embed_window":
            put(["params", "trunk", "pos_embed_window"], w.transpose(0, 2, 3, 1))
        elif (m := re.match(r"trunk\.blocks\.(\d+)\.(.+)$", k)):
            blk = ["params", "trunk", f"b{m.group(1)}"]
            rest = m.group(2)
            if (m2 := re.match(r"(norm1|norm2)\.(weight|bias)$", rest)):
                put([*blk, m2.group(1), LN[m2.group(2)]], w)
            elif rest == "attn.qkv.weight":
                put([*blk, "qkv", "kernel"], w.T)
            elif rest == "attn.qkv.bias":
                put([*blk, "qkv", "bias"], w)
            elif rest == "attn.proj.weight":
                put([*blk, "attn_proj", "kernel"], w.T)
            elif rest == "attn.proj.bias":
                put([*blk, "attn_proj", "bias"], w)
            elif rest == "proj.weight":
                put([*blk, "proj", "kernel"], w.T)
            elif rest == "proj.bias":
                put([*blk, "proj", "bias"], w)
            elif (m2 := re.match(r"mlp\.layers\.([01])\.(weight|bias)$", rest)):
                name = "fc1" if m2.group(1) == "0" else "fc2"
                put([*blk, name, "kernel" if m2.group(2) == "weight" else "bias"],
                    w.T if m2.group(2) == "weight" else w)
            elif strict:
                raise KeyError(f"unmapped sam2 trunk key {tkey}")
        elif (m := re.match(r"neck\.convs\.(\d+)\.conv\.(weight|bias)$", k)):
            put(["params", "neck", f"conv_{m.group(1)}",
                 "kernel" if m.group(2) == "weight" else "bias"],
                w.transpose(2, 3, 1, 0) if m.group(2) == "weight" else w)
        elif strict and not k.startswith("neck.position_encoding"):
            raise KeyError(f"unmapped sam2 image_encoder key {tkey}")

    if strict:
        import jax

        has_hr = any("conv_s0" in k for k in sd)
        missing = []
        for kp, _ in jax.tree_util.tree_flatten_with_path(tree)[0]:
            names = tuple(str(getattr(kk, "key", getattr(kk, "idx", ""))) for kk in kp)
            if len(names) < 2 or names[1] not in ("trunk", "neck"):
                continue
            if not has_hr and len(names) > 2 and names[2] in ("hr0", "hr1"):
                continue
            if names not in written:
                missing.append("/".join(names))
        assert not missing, f"sam2 encoder leaves not covered: {missing[:8]}"
    return tree


def load_sam_checkpoint(variables: Dict, path_or_sd, strict: bool = True):
    """Import an official SAM .pt checkpoint (or a loaded state_dict)."""
    if isinstance(path_or_sd, (str,)):
        from ultralytics_pro_tpu.utils.torch_import import load_raw_torch_file

        sd = load_raw_torch_file(path_or_sd)
    else:
        sd = {k: np.asarray(v) for k, v in path_or_sd.items()}
    # official ckpts may prefix with 'model.'
    sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}
    return sam_state_dict_to_flax(variables, sd, strict=strict)
