"""Registry closure vs the reference's nn.modules exports.

The reference's parse_model resolves ANY name exported by
ultralytics.nn.modules via globals()[m] (reference nn/tasks.py:2836-2842), so
every export is YAML-reachable upstream. These tests assert (a) every such
name resolves in our BUILDERS registry, and (b) a sample of round-4 closure
entries builds and forwards inside a real model.
"""

import ast
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_INIT = "/root/reference/ultralytics/nn/modules/__init__.py"


def _reference_exports():
    tree = ast.parse(open(REF_INIT, errors="replace").read())
    names = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module:
            for a in node.names:
                names[a.asname or a.name] = node.module
    return names


@pytest.mark.skipif(not os.path.exists(REF_INIT), reason="reference absent")
def test_every_reference_export_is_registered():
    from ultralytics_pro_tpu.nn.tasks import BUILDERS

    exports = _reference_exports()
    missing = sorted(n for n in exports if n not in BUILDERS)
    assert not missing, (
        f"{len(missing)}/{len(exports)} reference nn.modules exports have no "
        f"builder: {missing[:40]}")


def test_zoo_variant_entries_resolve():
    """Every generated variant entry resolves to a real class and its kwargs
    match the class's dataclass fields."""
    import dataclasses
    import importlib

    from ultralytics_pro_tpu.nn.modules.zoo_variants import EXTRA_VARIANTS

    assert len(EXTRA_VARIANTS) > 300, "closure table unexpectedly small"
    for name, (mod, cls, kw, _ref) in EXTRA_VARIANTS.items():
        c = getattr(importlib.import_module(
            f"ultralytics_pro_tpu.nn.modules.{mod}"), cls)
        fields = {f.name for f in dataclasses.fields(c)}
        unknown = [k for k, _ in kw if k not in fields]
        assert not unknown, f"{name}: unknown kwargs {unknown} for {cls}"


@pytest.mark.parametrize("backbone", ["caformer_b36", "RepVGG_B1",
                                      "hornet_base_gf", "rest_small",
                                      "fastvit_sa12", "VGG16"])
def test_closure_backbone_forwards(backbone, tmp_path):
    """A closure backbone drives a real DetectionModel end to end."""
    import yaml

    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    spec = {
        "nc": 3,
        "backbone": [[-1, 1, backbone, []]],
        "head": [
            [1, 1, "Conv", [64, 1, 1]],
            [2, 1, "Conv", [64, 1, 1]],
            [3, 1, "Conv", [64, 1, 1]],
            [[4, 5, 6], 1, "Detect", ["nc"]],
        ],
    }
    p = tmp_path / f"{backbone}.yaml"
    yaml.safe_dump(spec, open(p, "w"))
    m = DetectionModel(str(p))
    v = m.init_params(imgsz=64)
    x = jnp.asarray(np.zeros((1, 64, 64, 3), np.float32))
    y, _aux = jax.eval_shape(lambda vv, xx: m.apply(vv, xx, train=False), v, x)
    assert y.shape[0] == 1 and y.shape[-1] == 4 + 3


def test_closure_subblocks_forward(tmp_path):
    """Round-4 sub-block names build and forward in one composite model."""
    import yaml

    from ultralytics_pro_tpu.nn.tasks import DetectionModel

    spec = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "BasicRFB", [64]],
            [-1, 1, "Bottleneck_DLKA", [64]],
            [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "MSCAM", []],
            [-1, 1, "TransformerBlock", [128, 4]],
            [-1, 1, "Conv", [256, 3, 2]],
            [-1, 1, "ChebyKANConv2d", [256, 3, 1]],
            [-1, 1, "SPPF", [256, 5]],
        ],
        "head": [
            [-1, 1, "Conv", [256, 3, 2]],
            [[7, 9, 10], 1, "Detect", ["nc"]],
        ],
    }
    p = tmp_path / "r4blocks.yaml"
    yaml.safe_dump(spec, open(p, "w"))
    m = DetectionModel(str(p))
    v = m.init_params(imgsz=64)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32))
    y, _aux = m.apply(v, x, train=False)
    assert np.isfinite(np.asarray(y, np.float32)).all()
