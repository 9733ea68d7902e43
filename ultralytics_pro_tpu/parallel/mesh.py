"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids=None):
    """Multi-host init (jax.distributed) — the SPMD replacement for the
    reference's DDP relaunch (utils/dist.py:77): instead of forking per-GPU
    workers around a subprocess barrier, every host joins one coordination
    service and all devices form a single global mesh.

    With explicit args (coordinator_address="host:port", num_processes,
    process_id) the process joins that cluster — this is the path the
    2-process CPU test exercises. With no args, TPU pods discover peers from
    the runtime environment; single-host falls through to a no-op.

    Must be called BEFORE any other jax API touches the backend (backend
    initialization freezes the process topology).
    """
    import jax

    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id,
                local_device_ids=local_device_ids)
        else:
            jax.distributed.initialize()
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        if coordinator_address is not None:
            raise
    except ValueError:
        if coordinator_address is not None:
            raise
        # no args + no env discovery = single host; nothing to initialize


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
