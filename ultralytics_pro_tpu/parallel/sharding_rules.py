"""Tensor-parallel sharding rules (SURVEY §2.10 TP row).

The reference has no TP (DDP only); this exposes GSPMD weight sharding for
YOLO-scale models on a ("data", "model") mesh: every conv/dense kernel whose
output dim divides the model-axis size (and is large enough to matter) is
sharded on its LAST axis; everything else (BN, biases, small kernels) is
replicated. GSPMD propagates activation shardings and inserts the collectives
(all-gather / reduce-scatter) over ICI — no hand-written comms.
"""

from __future__ import annotations

from typing import Any, Dict


def tp_partition_spec(path_names, leaf, tp: int, min_elems: int = 4096):
    """PartitionSpec for one param leaf under a ('data','model') mesh."""
    import jax

    P = jax.sharding.PartitionSpec
    name = path_names[-1] if path_names else ""
    if name == "kernel" and leaf.ndim >= 2 and leaf.size >= min_elems \
            and leaf.shape[-1] % tp == 0:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def shard_params_tp(params: Dict[str, Any], mesh) -> Dict[str, Any]:
    """device_put every leaf with its TP NamedSharding on `mesh`
    (axes ('data','model'))."""
    import jax

    tp = mesh.shape["model"]

    def leaf_path_names(path):
        return [p.key for p in path if hasattr(p, "key")]

    def put(path, leaf):
        spec = tp_partition_spec(leaf_path_names(path), leaf, tp)
        return jax.device_put(leaf, jax.sharding.NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def count_sharded(params, mesh) -> int:
    """Number of leaves that would be model-sharded (for tests/logs)."""
    import jax

    tp = mesh.shape["model"]
    n = 0

    def visit(path, leaf):
        nonlocal n
        names = [p.key for p in path if hasattr(p, "key")]
        if tuple(tp_partition_spec(names, leaf, tp)) != ():
            n += 1
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return n
