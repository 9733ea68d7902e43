"""Automatic batch-size estimation from device memory.

The reference binary-searches CUDA memory with a polyfit at 60% utilization
(ultralytics/utils/autobatch.py:45). On TPU the compiled executable's memory
footprint is known analytically, so the estimate uses XLA's memory analysis of
the jitted train step at a probe batch size and scales linearly in batch."""

from __future__ import annotations

from ultralytics_pro_tpu.utils import LOGGER


def check_train_batch_size(model, imgsz: int = 640, batch: float = -1, fraction: float = 0.60,
                           max_batch: int = 1024) -> int:
    if isinstance(batch, int) and batch >= 1:
        return batch
    return autobatch(model, imgsz=imgsz, fraction=fraction, max_batch=max_batch)


def autobatch(model, imgsz: int = 640, fraction: float = 0.60, probe_batch: int = 4,
              max_batch: int = 1024) -> int:
    """Estimate the largest batch fitting `fraction` of device memory."""
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    total = (stats or {}).get("bytes_limit") or 16 * 1024**3  # v5e default 16GB

    try:
        if model.variables is None:
            model.init_params(imgsz=imgsz)
        x = jax.ShapeDtypeStruct((probe_batch, imgsz, imgsz, 3), jnp.float32)

        def fwd(v, xx):
            return model.module.apply(v, xx, train=True, mutable=["batch_stats"])[0]

        compiled = jax.jit(fwd).lower(model.variables, x).compile()
        mem = compiled.memory_analysis()
        per_batch = (mem.temp_size_in_bytes + mem.output_size_in_bytes) / probe_batch
        fixed = mem.argument_size_in_bytes
        budget = total * fraction - fixed
        est = int(budget // max(per_batch, 1))
    except Exception as e:  # analysis unavailable -> conservative default
        LOGGER.info(f"autobatch analysis failed ({e}); defaulting to 16")
        return 16
    est = max(1, min(est, max_batch))
    # round down to a power of two for clean sharding
    p = 1
    while p * 2 <= est:
        p *= 2
    LOGGER.info(f"autobatch: ~{per_batch / 1e6:.0f} MB/img activation, batch {p} "
                f"({fraction:.0%} of {total / 1e9:.1f} GB)")
    return p
