"""Multi-process SPMD worker: one rank of a 2-process x 4-virtual-CPU-device
cluster (8 global devices).

This is the executable evidence for SURVEY.md §5.8: where the reference
self-launches DDP subprocesses around a torch.distributed barrier
(ultralytics/utils/dist.py:77 generate_ddp_command), the TPU-native design
joins every process to one jax.distributed coordination service and runs the
SAME jitted train step over a single global mesh — gradients all-reduce via
GSPMD collectives (gloo on CPU, ICI on real pods) with no per-rank code.

Run by tests/test_distributed_multiprocess.py as:
    python tests/distributed_worker.py --coordinator 127.0.0.1:PORT \
        --num-processes 2 --process-id N --out DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()

    # backend topology must be fixed before jax initializes any backend
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}").strip()
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

    from ultralytics_pro_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator_address=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = args.local_devices * args.num_processes
    assert len(jax.devices()) == n_global, jax.devices()
    assert len(jax.local_devices()) == args.local_devices

    from ultralytics_pro_tpu.engine.trainer import DetectionTrainer
    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    # PRNGKey(0) init => identical params on every process without a broadcast
    model = DetectionModel("yolov8n.yaml")
    imgsz = 64
    model.init_params(imgsz=imgsz)
    trainer = DetectionTrainer(model, {
        "epochs": 1, "batch": n_global, "imgsz": imgsz,
        "project": args.out, "name": f"rank{args.process_id}"})
    assert trainer.mesh.devices.size == n_global, trainer.mesh
    step_fn = trainer.build_train_step()

    # One GLOBAL batch, seeded identically on every process; each rank feeds
    # only the rows its local devices own (the multi-host input contract).
    rng = np.random.default_rng(0)
    g = 8
    batch_global = {
        "img": rng.integers(0, 255, (n_global, imgsz, imgsz, 3), dtype=np.uint8),
        "cls": rng.integers(0, 80, (n_global, g)).astype(np.float32),
        "bboxes": np.tile(np.array([[0.5, 0.5, 0.4, 0.4]], np.float32),
                          (n_global, g, 1)),
        "mask_gt": np.ones((n_global, g), bool),
    }
    device_batch = {
        k: jax.make_array_from_process_local_data(trainer._data_sharding, v)
        for k, v in batch_global.items()
    }

    host_vars = jax.device_get(model.variables)
    params = jax.tree.map(jnp.asarray, host_vars["params"])
    state = (
        params,
        jax.tree.map(jnp.asarray, host_vars["batch_stats"]),
        jax.tree.map(jnp.zeros_like, params),
        jax.tree.map(jnp.copy, params),
        jnp.zeros((), jnp.int32),
        jax.tree.map(jnp.zeros_like, params),
    )
    state = jax.device_put(state, trainer._repl_sharding)

    state, total, parts = step_fn(
        state, device_batch, jnp.asarray([0.01, 0.01, 0.01], jnp.float32),
        jnp.float32(0.9), jnp.asarray(True))

    assert total.is_fully_replicated
    loss = float(np.asarray(total))
    assert np.isfinite(loss), loss

    # rank-0 checkpoint write (multi-host contract: exactly one writer for
    # the pickle path; params/EMA are fully replicated so rank 0 holds all)
    if args.process_id == 0:
        trainer.wdir.mkdir(parents=True, exist_ok=True)
        trainer.save_checkpoint(state, 0, None)
        assert (trainer.wdir / "last.ckpt").exists()

    from jax.experimental import multihost_utils

    # all ranks must agree on the loss BEFORE anyone exits (a dead coordinator
    # would mask a divergence); allgather doubles as the exit barrier
    losses = np.asarray(multihost_utils.process_allgather(jnp.float32(loss)))
    assert losses.shape[0] == args.num_processes
    assert float(losses.max() - losses.min()) <= 1e-5, losses

    Path(args.out, f"rank{args.process_id}.json").write_text(json.dumps({
        "loss": loss,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "parts": {k: float(np.asarray(v)) for k, v in parts.items()},
    }))
    print(f"rank {args.process_id}: loss={loss:.4f} over {n_global} devices "
          f"/ {jax.process_count()} processes", flush=True)


if __name__ == "__main__":
    main()
