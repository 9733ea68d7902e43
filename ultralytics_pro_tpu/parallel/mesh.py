"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def initialize_distributed():
    """Multi-host init (jax.distributed); no-op when single-host or already
    initialized. TPU pods discover peers from the environment."""
    import jax

    if jax.process_count() > 1:
        return  # already initialized by the runtime
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # single-host


def get_mesh(axes: Sequence[str] = ("data",), shape: Optional[Sequence[int]] = None):
    """Mesh over all visible devices. Default: 1-D data-parallel mesh.

    For model-parallel layouts pass e.g. axes=("data", "model"),
    shape=(n // mp, mp).
    """
    import jax

    devices = np.array(jax.devices())
    if shape is None:
        shape = (len(devices),) if len(axes) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis mesh")
    return jax.sharding.Mesh(devices.reshape(shape), tuple(axes))


def data_sharding(mesh, axis: str = "data"):
    import jax

    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(axis))


def replicated(mesh):
    import jax

    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())


def shard_batch(batch: Dict, mesh, axis: str = "data") -> Dict:
    """Host numpy batch -> device arrays sharded on axis 0."""
    import jax

    sh = data_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items() if isinstance(v, np.ndarray)}
