"""Forward-ALL zoo sweep (VERDICT r3 Next #3): forward every buildable
reference model YAML at 64px on CPU-jax and record finite-output per file.

Round 3 proved 100% *buildability* of the 1,361 upstream-valid reference
YAMLs but forwarded only a ~8% stratified sample — a channel-arithmetic or
reshape bug in the other 92% was invisible. This tool forwards each one and
writes results incrementally to ``tests/.forward_sweep.jsonl`` so an
interrupted run resumes where it stopped. Per-model wall is bounded with
SIGALRM (compile hangs must not stall the sweep).

Usage:
    python tools/forward_zoo_sweep.py [--timeout 600] [--redo-failures]
    python tools/forward_zoo_sweep.py --report   # summarize + per-family table
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time
import traceback
from collections import defaultdict
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parents[1] / "tests" / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The sweep checks finite-output, not speed: skipping XLA's optimization
# passes cuts per-model wall from ~70s to ~15s on this 1-core host.
jax.config.update("jax_disable_most_optimizations", True)

from tools.yaml_sweep import REF_MODELS  # noqa: E402

RESULTS = Path(__file__).resolve().parents[1] / "tests" / ".forward_sweep.jsonl"

# YAMLs whose FORWARD crashes in the reference torch stack itself (verified
# by building the reference DetectionModel and running x=zeros(1,3,64,64)):
# LeYOLO ships scales n:[1.0, 1.33, 576] so every channel is width-scaled
# by 1.33, but MobileNetV3_BLOCK's expansion arg `e` is NOT scaled by the
# reference parse_model — with pw=False the depthwise conv then gets a
# 24-channel input with groups=16 ("RuntimeError: Given groups=16 ...
# expected input[1, 24, 128, 128] to have 16 channels"). Constructs, can
# never forward, upstream. We reproduce the same build-time semantics, so
# these are recorded as upstream-forward-invalid, not our failures.
UPSTREAM_FORWARD_INVALID = {
    "Leyolo/Detect/Leyolo-l.yaml", "Leyolo/Detect/Leyolo-s.yaml",
    "Leyolo/OBB/Leyolo-l-obb.yaml", "Leyolo/OBB/Leyolo-s-obb.yaml",
    "Leyolo/Pose/Leyolo-l-pose.yaml", "Leyolo/Pose/Leyolo-s-pose.yaml",
    "Leyolo/Segment/Leyolo-l-seg.yaml", "Leyolo/Segment/Leyolo-s-seg.yaml",
}


class Timeout(Exception):
    pass


def _alarm(signum, frame):
    raise Timeout()


def list_buildable():
    """The same ok/invalid/failed split the buildability sweep test uses."""
    from tests.test_reference_zoo_sweep import _classify_all

    ok, invalid, failed = _classify_all()
    return ok


def forward_one(rel: str) -> dict:
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.tasks import TASK2MODEL, guess_model_task
    from ultralytics_pro_tpu.utils import yaml_load

    t0 = time.time()
    d = yaml_load(REF_MODELS / rel)
    task = guess_model_task(d)
    m = TASK2MODEL[task](d)
    ch = int(d.get("ch", 3) or 3)
    # ONE compiled executable per model, init fused with apply. Eager
    # dispatch compiles thousands of tiny ops (~0.2-3s each on this host,
    # which timed out the EIMS-heavy families); two separate jits (init,
    # apply) still paid two compile round-trips per model.
    import jax as _jax

    def init_and_apply(key, x):
        v = m.module.init(key, x, train=True)
        return m.module.apply(v, x, train=False)

    def attempt(sz):
        y = _jax.jit(init_and_apply)(_jax.random.PRNGKey(0),
                                     jnp.zeros((1, sz, sz, ch)))
        out = y[0] if isinstance(y, tuple) else y
        leaf = out[0] if isinstance(out, (list, tuple)) else out
        return bool(jnp.all(jnp.isfinite(jnp.asarray(leaf, jnp.float32))))

    # 64px keeps compiles cheap, but P6/P7 (stride 64/128) yamls legitimately
    # need >= 2x max-stride inputs (the reference's stride dry-run uses 256px,
    # tasks.py:1318) — on any failure retry once at the reference's 256.
    try:
        finite = attempt(64)
        size = 64
    except Exception:
        finite = attempt(256)  # raises through to the caller on a real bug
        size = 256
    if not finite:
        finite = attempt(256)
        size = 256
    return {"yaml": rel, "task": task, "ok": finite,
            "err": None if finite else "non-finite output",
            "secs": round(time.time() - t0, 1), "imgsz": size}


def run(timeout_s: int, redo_failures: bool, shard: str = "") -> None:
    done = {}
    if RESULTS.exists():
        for line in RESULTS.read_text().splitlines():
            if line.strip():
                r = json.loads(line)
                done[r["yaml"]] = r
    todo = [rel for rel in list_buildable()
            if rel not in UPSTREAM_FORWARD_INVALID
            and (rel not in done or (redo_failures and not done[rel]["ok"]))]
    if shard:  # "i/n": overlap out-of-process compiles across workers
        i, n = (int(p) for p in shard.split("/"))
        todo = todo[i::n]
    print(f"forward sweep: {len(done)} recorded, {len(todo)} to go", flush=True)
    signal.signal(signal.SIGALRM, _alarm)
    with RESULTS.open("a") as f:
        for i, rel in enumerate(todo):
            signal.alarm(timeout_s)
            try:
                r = forward_one(rel)
            except Timeout:
                r = {"yaml": rel, "ok": False, "err": f"timeout>{timeout_s}s"}
            except Exception as e:  # noqa: BLE001
                tb = traceback.format_exc().splitlines()
                r = {"yaml": rel, "ok": False,
                     "err": f"{type(e).__name__}: {str(e)[:160]}",
                     "site": next((ln.strip() for ln in reversed(tb)
                                   if "ultralytics_pro_tpu" in ln), "")[:160]}
            finally:
                signal.alarm(0)
            f.write(json.dumps(r) + "\n")
            f.flush()
            status = "ok" if r["ok"] else f"FAIL {r['err']}"
            print(f"[{i + 1}/{len(todo)}] {rel}: {status}", flush=True)


def report() -> int:
    rows = [json.loads(x) for x in RESULTS.read_text().splitlines() if x.strip()]
    seen = {}
    for r in rows:  # latest entry per yaml wins (redo runs append)
        seen[r["yaml"]] = r
    for rel in UPSTREAM_FORWARD_INVALID:
        seen.pop(rel, None)
    rows = list(seen.values())
    print(f"(excluded {len(UPSTREAM_FORWARD_INVALID)} upstream-forward-invalid "
          f"LeYOLO yamls — reference torch forward crashes, see header)")
    fams = defaultdict(lambda: [0, 0, []])
    for r in rows:
        fam = r["yaml"].split("/")[0]
        fams[fam][1] += 1
        if r["ok"]:
            fams[fam][0] += 1
        else:
            fams[fam][2].append((r["yaml"], r["err"]))
    n_ok = sum(f[0] for f in fams.values())
    n = len(rows)
    print(f"forwarded {n} yamls: {n_ok} ok ({100.0 * n_ok / max(n, 1):.2f}%)")
    print(f"{'family':<22} {'ok/total':>9}")
    for fam in sorted(fams):
        ok_n, tot, fails = fams[fam]
        mark = "" if ok_n == tot else "  <-- failures"
        print(f"{fam:<22} {ok_n:>4}/{tot:<4}{mark}")
    for fam in sorted(fams):
        for y, e in fams[fam][2]:
            print(f"  FAIL {y}: {e}")
    return rows, n_ok


def write_summary(rows, n_ok):
    """Commit-able audit record consumed by
    tests/test_reference_zoo_sweep.py::test_forward_all_sweep_ledger."""
    buildable = len(list_buildable())
    out = {
        "buildable": buildable,
        "upstream_forward_invalid": len(UPSTREAM_FORWARD_INVALID),
        "attempted": len(rows),
        "ok": n_ok,
        "failures": sorted([r["yaml"], r["err"]] for r in rows if not r["ok"]),
    }
    p = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / \
        "forward_sweep_summary.json"
    p.write_text(json.dumps(out, indent=1))
    print(f"summary -> {p}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=600,
                    help="per-model wall bound in seconds")
    ap.add_argument("--redo-failures", action="store_true")
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--write-summary", action="store_true")
    ap.add_argument("--shard", default="", help='"i/n" worker shard')
    args = ap.parse_args()
    if args.report:
        rows, n_ok = report()
        if args.write_summary:
            write_summary(rows, n_ok)
        sys.exit(0 if rows and n_ok / len(rows) >= 0.97 else 1)
    run(args.timeout, args.redo_failures, args.shard)


if __name__ == "__main__":
    main()
