"""Callback system: named training/val/predict/export events + integrations.

Behavioral parity with the reference callback layer (ultralytics/utils/
callbacks/base.py:10-193 — the same ~28 event names so user callbacks port
unchanged; integration shims for TensorBoard/CSV follow
utils/callbacks/tensorboard.py et al.).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict, List

EVENTS = [
    # trainer
    "on_pretrain_routine_start", "on_pretrain_routine_end",
    "on_train_start", "on_train_epoch_start", "on_train_batch_start",
    "optimizer_step", "on_before_zero_grad", "on_train_batch_end",
    "on_train_epoch_end", "on_fit_epoch_end", "on_model_save",
    "on_train_end", "on_params_update", "teardown",
    # validator
    "on_val_start", "on_val_batch_start", "on_val_batch_end", "on_val_end",
    # predictor
    "on_predict_start", "on_predict_batch_start", "on_predict_batch_end",
    "on_predict_postprocess_end", "on_predict_end",
    # exporter
    "on_export_start", "on_export_end",
]


def get_default_callbacks() -> Dict[str, List[Callable]]:
    return defaultdict(list, {e: [] for e in EVENTS})


class CallbackMixin:
    """Event registry + dispatch, mixed into trainer/validator/predictor."""

    def init_callbacks(self):
        self.callbacks: Dict[str, List[Callable]] = get_default_callbacks()

    def add_callback(self, event: str, callback: Callable):
        if event not in self.callbacks:
            raise ValueError(f"unknown callback event '{event}'; valid: {EVENTS}")
        self.callbacks[event].append(callback)

    def run_callbacks(self, event: str):
        for cb in self.callbacks.get(event, []):
            cb(self)


def tensorboard_callbacks(log_dir):
    """TensorBoard scalar logging via flax metric_writers when available."""
    try:
        from flax.metrics import tensorboard as tb

        writer = tb.SummaryWriter(str(log_dir))
    except Exception:
        return {}

    def on_fit_epoch_end(trainer):
        step = getattr(trainer, "_epoch", 0)
        for k, v in getattr(trainer, "epoch_losses", {}).items():
            writer.scalar(f"train/{k}", float(v), step)
        if getattr(trainer, "last_fitness", None) is not None:
            writer.scalar("metrics/fitness", float(trainer.last_fitness), step)

    def on_train_end(trainer):
        writer.flush()

    return {"on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def csv_logger_callbacks(save_dir):
    """results.csv per-epoch ledger (reference trainer save_metrics)."""
    from pathlib import Path

    path = Path(save_dir) / "results.csv"

    def on_fit_epoch_end(trainer):
        losses = getattr(trainer, "epoch_losses", {})
        fitness = getattr(trainer, "last_fitness", None)
        keys = ["epoch", *[f"train/{k}" for k in sorted(losses)], "metrics/fitness"]
        vals = [getattr(trainer, "_epoch", 0), *[losses[k] for k in sorted(losses)],
                fitness if fitness is not None else ""]
        header = not path.exists()
        with open(path, "a", encoding="utf-8") as f:
            if header:
                f.write(",".join(keys) + "\n")
            f.write(",".join(str(v) for v in vals) + "\n")

    return {"on_fit_epoch_end": on_fit_epoch_end}
