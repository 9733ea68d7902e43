"""Hyperparameter tuner: mutation-based evolution over the train search space.

Behavioral parity with the reference Tuner (ultralytics/engine/tuner.py:36:
~25-dim space with (gain, min, max) rows, 80/20 parent selection, sigma-scaled
gaussian mutation, CSV ledger of generations)."""

from __future__ import annotations

import csv
import random
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ultralytics_pro_tpu.utils import LOGGER, colorstr

# (mutation gain, min, max) per hyperparameter (reference tuner.py:92-120)
SEARCH_SPACE = {
    "lr0": (1.0, 1e-5, 1e-1),
    "lrf": (1.0, 0.01, 1.0),
    "momentum": (0.3, 0.6, 0.98),
    "weight_decay": (1.0, 0.0, 0.001),
    "warmup_epochs": (1.0, 0.0, 5.0),
    "warmup_momentum": (1.0, 0.0, 0.95),
    "box": (1.0, 0.02, 0.2 * 100),
    "cls": (1.0, 0.2, 4.0),
    "dfl": (1.0, 0.4, 6.0),
    "hsv_h": (1.0, 0.0, 0.1),
    "hsv_s": (1.0, 0.0, 0.9),
    "hsv_v": (1.0, 0.0, 0.9),
    "degrees": (1.0, 0.0, 45.0),
    "translate": (1.0, 0.0, 0.9),
    "scale": (1.0, 0.0, 0.9),
    "shear": (1.0, 0.0, 10.0),
    "perspective": (1.0, 0.0, 0.001),
    "flipud": (1.0, 0.0, 1.0),
    "fliplr": (1.0, 0.0, 1.0),
    "mosaic": (1.0, 0.0, 1.0),
    "mixup": (1.0, 0.0, 1.0),
    "cutmix": (1.0, 0.0, 1.0),
    "copy_paste": (1.0, 0.0, 1.0),
}


class Tuner:
    """Evolve hyperparameters over repeated short trainings (reference tuner.py:36)."""

    def __init__(self, args: Dict, save_dir="runs/tune"):
        self.args = dict(args)
        self.space = SEARCH_SPACE
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.csv = self.save_dir / "tune_results.csv"

    def _mutate(self, parent: Dict, mutation: float = 0.8, sigma: float = 0.2) -> Dict:
        """Gaussian mutation around the best parents (reference Tuner._mutate)."""
        rows = self._read()
        if rows:
            # fitness-weighted parent choice among top-5
            rows.sort(key=lambda r: -r[0])
            top = rows[: min(5, len(rows))]
            w = np.array([r[0] for r in top]) - min(r[0] for r in top) + 1e-6
            parent_vals = top[random.choices(range(len(top)), weights=w)[0]][1]
        else:
            parent_vals = {k: parent.get(k, (lo + hi) / 2) for k, (g, lo, hi) in self.space.items()}

        rng = np.random.default_rng(int(time.time()))
        out = {}
        for k, (gain, lo, hi) in self.space.items():
            v = float(parent_vals.get(k, (lo + hi) / 2))
            if rng.random() < mutation:
                v *= float(1 + rng.normal(0, sigma) * gain)
            out[k] = float(np.clip(v, lo, hi))
        return out

    def _read(self):
        if not self.csv.exists():
            return []
        rows = []
        with open(self.csv) as f:
            for row in csv.DictReader(f):
                fit = float(row.pop("fitness"))
                rows.append((fit, {k: float(v) for k, v in row.items()}))
        return rows

    def _write(self, fitness: float, hyp: Dict):
        header = not self.csv.exists()
        with open(self.csv, "a", newline="") as f:
            wr = csv.writer(f)
            if header:
                wr.writerow(["fitness", *self.space.keys()])
            wr.writerow([fitness, *[hyp[k] for k in self.space]])

    def __call__(self, model_cfg="yolov8n.yaml", data=None, iterations: int = 10,
                 epochs: int = 10, **train_kwargs):
        from ultralytics_pro_tpu.engine.model import Model

        best = (0.0, None)
        for i in range(iterations):
            hyp = self._mutate(self.args)
            LOGGER.info(colorstr("yellow", f"tune iteration {i + 1}/{iterations}: {hyp}"))
            try:
                model = Model(model_cfg)
                model.train(data=data, epochs=epochs, **{**train_kwargs, **hyp})
                fitness = model.trainer.best_fitness or 0.0
            except Exception as e:
                LOGGER.info(f"tune iteration failed: {e}")
                fitness = 0.0
            self._write(fitness, hyp)
            if fitness > best[0]:
                best = (fitness, hyp)
        LOGGER.info(f"tuning complete; best fitness {best[0]:.4f}")
        return best


def run_ray_tune(model, space: dict = None, grace_period: int = 10,
                 gpu_per_trial=None, max_samples: int = 10, **train_args):
    """Ray Tune hyperparameter search (reference utils/tuner.py:9
    run_ray_tune): ASHA scheduler over the same search space; requires `ray`.
    The raytune session-report callback (utils/callbacks.py) streams each
    epoch's fitness to the scheduler."""
    try:
        from ray import tune
        from ray.air import RunConfig
        from ray.tune.schedulers import ASHAScheduler
    except ImportError as e:
        raise ModuleNotFoundError(
            "ray tune not installed; run `pip install ray[tune]` in a "
            "networked environment (the in-repo Tuner covers single-machine "
            "evolution without it)") from e

    space = space or {
        "lr0": tune.uniform(1e-5, 1e-1),
        "lrf": tune.uniform(0.01, 1.0),
        "momentum": tune.uniform(0.6, 0.98),
        "weight_decay": tune.uniform(0.0, 0.001),
        "warmup_epochs": tune.uniform(0.0, 5.0),
        "box": tune.uniform(0.02, 0.2),
        "cls": tune.uniform(0.2, 4.0),
        "hsv_h": tune.uniform(0.0, 0.1),
        "hsv_s": tune.uniform(0.0, 0.9),
        "hsv_v": tune.uniform(0.0, 0.9),
        "translate": tune.uniform(0.0, 0.9),
        "scale": tune.uniform(0.0, 0.9),
        "fliplr": tune.uniform(0.0, 1.0),
        "mosaic": tune.uniform(0.0, 1.0),
    }

    def _train(config):
        from ultralytics_pro_tpu.utils.settings import SETTINGS

        SETTINGS["raytune"] = True  # enables the session.report callback
        model.train(**{**train_args, **config})

    tuner = tune.Tuner(
        _train,
        param_space=space,
        tune_config=tune.TuneConfig(
            scheduler=ASHAScheduler(metric="metrics/fitness", mode="max",
                                    grace_period=grace_period),
            num_samples=max_samples),
        run_config=RunConfig(name="tune"),
    )
    return tuner.fit()
