"""JAX runtime utilities — the TPU-native counterpart of the reference's
torch_utils (ultralytics/utils/torch_utils.py: model_info:302, get_flops:389,
profile_ops:772, init_seeds:573, strip_optimizer:670, ModelEMA:606 — EMA lives
inside the jitted train step here, trainer.py)."""

from __future__ import annotations

import random
import time
from typing import Dict, Optional

import numpy as np


def init_seeds(seed: int = 0, deterministic: bool = True):
    """Seed python/numpy; JAX is deterministic by construction via explicit
    PRNG keys (the reference needs torch.use_deterministic_algorithms)."""
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)


def model_info(model, detailed: bool = False, imgsz: int = 640) -> Dict:
    """Layers / params / GFLOPs summary (reference model_info:302). FLOPs come
    from XLA's cost analysis of the compiled forward — exact, not thop-style
    estimation."""
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.utils import LOGGER

    n_layers = len(model.specs)
    n_params = 0
    if model.variables is not None:
        n_params = sum(int(p.size) for p in jax.tree.leaves(model.variables.get("params", {})))

    flops = None
    try:
        x = jnp.zeros((1, imgsz, imgsz, model.ch), jnp.float32)
        lowered = jax.jit(lambda v, x: model.module.apply(v, x, train=False)).lower(
            model.variables, x
        )
        cost = lowered.compile().cost_analysis()
        if cost and "flops" in cost:
            flops = float(cost["flops"]) / 1e9
    except Exception:
        pass

    info = {"layers": n_layers, "parameters": n_params,
            "GFLOPs": round(flops, 2) if flops else None}
    LOGGER.info(
        f"{model.__class__.__name__}: {n_layers} layers, {n_params:,} parameters"
        + (f", {flops:.1f} GFLOPs @ {imgsz}" if flops else "")
    )
    if detailed and model.variables is not None:
        flat = jax.tree_util.tree_flatten_with_path(model.variables["params"])[0]
        for kp, leaf in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in kp)
            LOGGER.info(f"{name:60s} {str(leaf.shape):20s} {leaf.size:,}")
    return info


def profile_ops(fn, args, n: int = 10, warmup: int = 2, name: str = "op") -> Dict:
    """Micro-benchmark a jitted callable (reference profile_ops:772)."""
    import jax

    jfn = jax.jit(fn)
    for _ in range(warmup):
        jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return {"name": name, "mean_ms": dt * 1e3}


def strip_optimizer(ckpt_path, save_path=None):
    """Drop optimizer state from a checkpoint (reference strip_optimizer:670)."""
    from ultralytics_pro_tpu.engine.trainer import load_pickle, save_pickle

    ckpt = load_pickle(ckpt_path)
    for k in ("momentum_buffer", "fitness"):
        ckpt.pop(k, None)
    if ckpt.get("ema") is not None:
        ckpt["params"] = ckpt["ema"]
        ckpt["ema"] = None
    save_pickle(save_path or ckpt_path, ckpt)
    return save_path or ckpt_path


def get_flops(model, imgsz: int = 640) -> Optional[float]:
    return model_info(model, imgsz=imgsz).get("GFLOPs")


def profile_layers(model, imgsz: int = 640, batch: int = 1, repeats: int = 3):
    """Per-layer timing + shape/param table (reference BaseModel
    _profile_one_layer, tasks.py:1095: per-module FLOPs + 10x timing under
    `profile=True`). Runs the real y-cache wiring eagerly on a bound module;
    returns rows of dicts {i, type, params, ms, out_shape}."""
    import time

    import jax
    import jax.numpy as jnp

    bound = model.module.bind(model.variables)
    x = jnp.zeros((batch, imgsz, imgsz, getattr(model, "ch", 3)))
    y = {}
    out = x
    rows = []
    for spec, layer in zip(bound.specs, bound.layers):
        f = spec.f
        if isinstance(f, tuple):
            inp = [out if j == -1 else y[j] for j in f]
        elif f == -1:
            inp = out
        else:
            inp = y[f]
        def run(inp=inp, layer=layer):
            return layer(inp, train=False)
        res = run()  # warm (tracing/dispatch)
        t0 = time.perf_counter()
        for _ in range(repeats):
            res = run()
            jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / repeats * 1e3
        if spec.multi:
            for k, o in enumerate(res):
                slot = spec.i - spec.multi + 1 + k
                if slot in bound.save:
                    y[slot] = o
            out = res[-1]
            shape = tuple(res[-1].shape)
        else:
            out = res
            first = res[0] if isinstance(res, tuple) else res
            shape = tuple(first.shape) if hasattr(first, "shape") else type(res).__name__
            if spec.i in bound.save:
                y[spec.i] = out
        n_params = sum(p.size for p in jax.tree.leaves(
            model.variables["params"].get(f"layers_{spec.i}", {})))
        rows.append({"i": spec.i, "type": spec.type_name, "params": int(n_params),
                     "ms": round(dt, 3), "out_shape": shape})
    return rows
