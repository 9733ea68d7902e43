"""World grounding-style training: per-batch vocabulary sampling + text-guided
loss (reference train_world.py:196, RandomLoadText augment.py:2326)."""

import numpy as np
import pytest


def test_random_load_text_remaps_and_pads():
    from ultralytics_pro_tpu.data.augment import RandomLoadText

    r = RandomLoadText(max_samples=5)
    lab = r({"cls": np.array([[3.0], [7.0]]), "texts": [f"c{i}" for i in range(9)],
             "seed": 1})
    assert len(lab["texts"]) == 5
    assert lab["texts"][0] == "c3" and lab["texts"][1] == "c7"
    np.testing.assert_array_equal(lab["cls"].ravel(), [0.0, 1.0])


def test_world_trainer_batch_prompts_and_step(tmp_path):
    from ultralytics_pro_tpu.engine.trainer import WorldTrainer
    from ultralytics_pro_tpu.nn.tasks import WorldModel

    model = WorldModel("yolov8n-world.yaml")
    model.set_classes([f"thing {i}" for i in range(8)])
    model.init_params(imgsz=64)
    tr = WorldTrainer(model, {"epochs": 1, "batch": 2, "imgsz": 64,
                              "project": str(tmp_path), "name": "w"},
                      max_texts=8)

    rng = np.random.default_rng(0)
    g = 4
    batch = {
        "img": rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8),
        "cls": np.array([[[1], [5], [0], [0]], [[2], [1], [0], [0]]], np.float32).reshape(2, g),
        "bboxes": np.tile(np.array([[0.5, 0.5, 0.4, 0.4]], np.float32), (2, g, 1)),
        "mask_gt": np.array([[1, 1, 0, 0], [1, 1, 0, 0]], bool),
    }
    out = tr.host_preprocess_batch(dict(batch))
    assert out["prompts"].shape == (2, 8, 512)
    # positives occupy the FIRST slots of the sampled vocabulary
    used = out["cls"][out["mask_gt"]]
    assert used.max() < 3  # 3 unique positives -> indices 0..2

    # one jitted train step over the text-guided loss must be finite
    import jax
    import jax.numpy as jnp

    step = tr.build_train_step()
    variables = model.variables
    params = variables["params"]
    state = (params, variables["batch_stats"],
             jax.tree.map(jnp.zeros_like, params),
             jax.tree.map(jnp.copy, params),
             jnp.zeros((), jnp.int32),
             jax.tree.map(jnp.zeros_like, params))
    db = tr.put_batch(dict(batch))
    state, total, parts = step(state, db, jnp.asarray([0.01] * 3, jnp.float32),
                               jnp.float32(0.9), jnp.asarray(True))
    assert np.isfinite(float(total)), parts


def test_check_amp_numeric_parity():
    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.utils.checks import check_amp

    assert check_amp() in (True, False)  # backend-only form
    m = DetectionModel("yolov8n.yaml")
    m.init_params(imgsz=64)
    assert check_amp(m, imgsz=64) is True  # v8n is bf16-stable
