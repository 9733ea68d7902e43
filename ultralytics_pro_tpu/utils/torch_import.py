"""One-way torch state_dict -> flax variables converter.

Used for (a) parity testing against the reference implementation and (b) a
one-time offline import of pretrained .pt checkpoints (SURVEY.md §7 hard part
7). Mapping is purely name-based:

    torch "model.22.cv3.0.1.bn.running_mean"
      -> flax batch_stats["layers_22"]["cv3_0_1"]["bn"]["mean"]

Rules: the leading "model." drops, the layer index becomes "layers_{i}", any
numeric path component merges into its parent with '_' (ModuleList/Sequential
indices), and leaves rename weight->kernel/scale, running_mean->mean,
running_var->var. 4D conv weights transpose OIHW->HWIO ((2,3,1,0) — also
correct for ConvTranspose with flax transpose_kernel=True), 2D linear weights
transpose to (in, out).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ultralytics_pro_tpu.utils import LOGGER

SKIP_SUBSTRINGS = ("num_batches_tracked", "dfl.conv.weight", "anchors", "strides")


def _merge_digits(parts):
    """['cv2','0','1'] -> ['cv2_0_1']; leading layer index -> 'layers_i'."""
    out = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        elif p.isdigit():
            out.append(f"layers_{p}")
        else:
            out.append(p)
    return out


def torch_key_to_flax(key: str) -> Tuple[Tuple[str, ...], str, str]:
    """Map a torch state_dict key to (flax_path, leaf_name, collection)."""
    parts = key.split(".")
    if parts[0] == "model":
        parts = parts[1:]
    leaf = parts[-1]
    path = _merge_digits(parts[:-1])
    if leaf == "weight":
        if path and path[-1].split("_")[0] in {"bn", "norm", "ln"}:
            return tuple(path), "scale", "params"
        return tuple(path), "kernel", "params"
    if leaf == "bias":
        return tuple(path), "bias", "params"
    if leaf == "running_mean":
        return tuple(path), "mean", "batch_stats"
    if leaf == "running_var":
        return tuple(path), "var", "batch_stats"
    return tuple(path), leaf, "params"


def _convert_array(w: np.ndarray, target_shape) -> np.ndarray:
    if w.ndim == 4:
        w = w.transpose(2, 3, 1, 0)
    elif w.ndim == 2:
        w = w.transpose(1, 0)
    if tuple(w.shape) != tuple(target_shape):
        raise ValueError(f"shape mismatch after transpose: {w.shape} vs flax {target_shape}")
    return w


def _resolve_split(flat, coll, path, leaf):
    """Fallback for stacked-module children: a merged token like 'layers_4_0'
    may correspond to flax ('layers_4', '0') when the layer is a Repeat of n
    copies. Try splitting trailing _digit suffixes off each component."""
    candidates = [tuple(path)]
    for idx in range(len(path)):
        tok = path[idx]
        parts = tok.split("_")
        # peel digit suffixes one at a time: cv2_0_1 -> (cv2_0, 1) -> (cv2, 0, 1)
        for cut in range(len(parts) - 1, 0, -1):
            if all(p.isdigit() for p in parts[cut:]):
                cand = (*path[:idx], "_".join(parts[:cut]), *parts[cut:], *path[idx + 1:])
                candidates.append(tuple(cand))
    for cand in candidates:
        fkey = (coll, (*cand, leaf))
        if fkey in flat:
            return fkey
    return None


def load_torch_state_dict(variables, state_dict: Dict[str, "object"], strict: bool = True):
    """Return a copy of flax `variables` with leaves replaced from a torch state_dict.

    `variables` is the {'params': ..., 'batch_stats': ...} pytree from init.
    `state_dict` maps torch names to numpy arrays (call .numpy() upstream).
    """
    import jax

    flat = {}
    for coll in variables:
        paths = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for kp, leaf in paths:
            names = tuple(getattr(k, "key", getattr(k, "idx", None)) for k in kp)
            flat[(coll, names)] = leaf

    new_flat = dict(flat)
    used = set()
    missing = []
    for tkey, w in state_dict.items():
        if any(s in tkey for s in SKIP_SUBSTRINGS):
            continue
        path, leaf, coll = torch_key_to_flax(tkey)
        fkey = (coll, (*path, leaf))
        if fkey not in flat:
            fkey = _resolve_split(flat, coll, path, leaf)
        if fkey is None:
            missing.append(tkey)
            continue
        w = np.asarray(w, dtype=np.float32)
        if "dcnv3" in tkey.lower() and ".offset" in tkey and w.shape[0] % 18 == 0:
            # Reference DCNv3 offset projections emit (x, y)-ordered pairs;
            # our dcnv3_sample expects (dy, dx) — swap each tap's channel pair
            # (declared deviation, ops/deform.py dcnv3_sample docstring).
            from ultralytics_pro_tpu.ops.deform import dcnv3_offset_proj_to_tpu

            w, _ = dcnv3_offset_proj_to_tpu(w, None, groups=w.shape[0] // 18, k=3)
        new_flat[fkey] = _convert_array(w, flat[fkey].shape)
        used.add(fkey)

    unused = [k for k in flat if k not in used]
    if missing and strict:
        raise KeyError(f"{len(missing)} torch keys had no flax target, e.g. {missing[:8]}")
    if unused:
        LOGGER.info(f"torch import: {len(unused)} flax leaves not covered (e.g. {unused[:4]})")
        if strict and unused:
            raise KeyError(f"{len(unused)} flax leaves not covered, e.g. {unused[:8]}")

    # Rebuild the nested structure.
    def rebuild(coll):
        tree = {}
        for (c, names), v in new_flat.items():
            if c != coll:
                continue
            node = tree
            for n in names[:-1]:
                node = node.setdefault(n, {})
            node[names[-1]] = v
        return tree

    return {coll: rebuild(coll) for coll in variables}


def load_raw_torch_file(path: str) -> dict:
    """Load a torch .pt file holding a plain tensor state_dict and return
    {key: np.ndarray}. Used for side checkpoints (e.g. a local CLIP text
    tower); requires torch only when actually called."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().to(torch.float32).cpu().numpy()
    return out
