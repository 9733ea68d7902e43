"""SPMD parallelism utilities (replaces the reference's DDP machinery,
ultralytics/utils/dist.py + trainer.py:248 _setup_ddp — SURVEY.md §5.8).

One python process per host; a jax.sharding.Mesh spans all devices. Data
parallelism shards batch axis 0; the gradient all-reduce is an XLA collective
inserted by GSPMD. No subprocess relaunch, no RANK plumbing.
"""

from ultralytics_pro_tpu.parallel.mesh import (
    data_sharding,
    get_mesh,
    initialize_distributed,
    replicated,
    shard_batch,
)

__all__ = ["get_mesh", "data_sharding", "replicated", "shard_batch", "initialize_distributed"]
