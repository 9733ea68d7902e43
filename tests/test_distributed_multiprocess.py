"""Real multi-process distributed training evidence (SURVEY.md §5.8).

Launches TWO OS processes, each owning 4 virtual CPU devices, joined through
`jax.distributed.initialize` into one 8-device global mesh, and runs one
jitted data-parallel train step (gradient all-reduce over gloo — the CPU
stand-in for ICI collectives). Asserts both ranks compute the same finite
loss and rank 0 writes the checkpoint — the SPMD equivalent of the
reference's DDP subprocess test surface (ultralytics/utils/dist.py:77).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

HERE = Path(__file__).resolve().parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_spmd_train_step(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(HERE / "distributed_worker.py"),
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(rank),
             "--out", str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    reports = [json.loads((tmp_path / f"rank{r}.json").read_text()) for r in range(2)]
    assert all(r["process_count"] == 2 for r in reports)
    assert all(r["global_devices"] == 8 for r in reports)
    # both ranks saw the identical replicated loss (worker also barriers on it)
    assert abs(reports[0]["loss"] - reports[1]["loss"]) <= 1e-5
    # rank 0 (and only rank 0) wrote the checkpoint
    assert (tmp_path / "rank0" / "weights" / "last.ckpt").exists()
    assert not (tmp_path / "rank1" / "weights" / "last.ckpt").exists()
