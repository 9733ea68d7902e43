"""Buildability sweep: run parse_model over EVERY reference model YAML.

Measures the VERDICT r2 metric — what fraction of the reference's ~1,407 model
configs (reference cfg/models/**/*.yaml) our parse_model can compile into
LayerSpecs (including flax-module construction per layer). Prints a ranked
first-failure table so missing modules can be implemented in impact order.

Usage:
    python tools/yaml_sweep.py [--limit N] [--fail-detail MODULE] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter, defaultdict
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REF_MODELS = Path("/root/reference/ultralytics/cfg/models")
REF_NN = Path("/root/reference/ultralytics/nn")


def reference_defined_names():
    """All class names defined anywhere in the reference nn tree. A yaml row
    naming a module absent from this set cannot build in the reference either
    (e.g. v7FM, SPPCSPCSIM, IIDetect) — classified as upstream-invalid, not a
    repo gap."""
    import re

    names = set()
    for p in REF_NN.rglob("*.py"):
        try:
            txt = p.read_text(encoding="utf-8", errors="ignore")
        except OSError:
            continue
        names.update(re.findall(r"^\s*class\s+(\w+)", txt, re.M))
    # torch-namespace rows the reference eval()s directly
    names.update({"nn.Upsample", "nn.Identity", "nn.AvgPool2d", "nn.MaxPool2d",
                  "nn.BatchNorm2d", "nn.ConvTranspose2d", "Upsample"})
    return names


def load_yaml(path: Path):
    # package loader: includes the lenient repair pass for the 32 reference
    # yamls whose own stock parser rejects them (trailing commas/tabs)
    from ultralytics_pro_tpu.utils import yaml_load

    return yaml_load(path)


def try_build(d: dict):
    """parse_model + construct every layer's flax module. Returns None on
    success or (kind, detail) on failure."""
    from ultralytics_pro_tpu.nn.tasks import parse_model

    specs, save, meta = parse_model(d, ch=int(d.get("ch", 3) or 3))
    for s in specs:
        s.build()
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--json", type=str, default="")
    ap.add_argument("--fail-detail", type=str, default="",
                    help="print tracebacks for failures naming this module")
    ap.add_argument("--list-fails", action="store_true")
    args = ap.parse_args()

    files = sorted(REF_MODELS.rglob("*.yaml"))
    if args.limit:
        import random

        random.seed(0)
        files = random.sample(files, args.limit)

    ref_names = reference_defined_names()
    ok, invalid, failed = [], [], []
    fail_module = Counter()
    fail_files = defaultdict(list)
    for p in files:
        rel = str(p.relative_to(REF_MODELS))
        try:
            d = load_yaml(p)
        except Exception:
            invalid.append(rel)
            continue
        if not isinstance(d, dict) or not (d.get("backbone") or d.get("head")):
            invalid.append(rel)
            continue
        try:
            try_build(d)
            ok.append(rel)
        except NotImplementedError as e:
            name = str(e).split("'")[1] if "'" in str(e) else "?"
            if ("malformed" in str(e)
                    or (name not in ref_names and not name.startswith("nn."))):
                # names absent from the reference nn tree (or rows the
                # reference's own 4-tuple unpack would reject) cannot build
                # upstream either
                invalid.append(rel)
                continue
            fail_module[name] += 1
            fail_files[name].append(rel)
            failed.append((rel, "missing", name))
        except Exception as e:
            name = f"{type(e).__name__}: {str(e)[:90]}"
            fail_module[name] += 1
            fail_files[name].append(rel)
            failed.append((rel, "error", name))
            if args.fail_detail and args.fail_detail in name:
                import traceback

                print(f"--- {rel}")
                traceback.print_exc()

    valid = len(ok) + len(failed)
    print(f"total={len(files)} invalid_yaml={len(invalid)} valid={valid} "
          f"ok={len(ok)} failed={len(failed)} "
          f"pass_rate={100.0 * len(ok) / max(valid, 1):.1f}%")
    print("\nranked first-failures:")
    for name, cnt in fail_module.most_common():
        ex = fail_files[name][0]
        print(f"{cnt:5d}  {name:<70} e.g. {ex}")
    if args.list_fails:
        for rel, kind, name in failed:
            print(f"FAIL {kind} {name} {rel}")
    if args.json:
        Path(args.json).write_text(json.dumps({
            "total": len(files), "invalid": len(invalid), "ok": len(ok),
            "failed": len(failed),
            "pass_rate": 100.0 * len(ok) / max(valid, 1),
            "fail_modules": dict(fail_module),
        }, indent=1))


if __name__ == "__main__":
    sys.exit(main())
