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


# ---------------------------------------------------------------------------
# Third-party experiment-tracker integrations (reference utils/callbacks/
# {wb,mlflow,comet,clearml,dvc,neptune,raytune}.py). Each factory returns a
# {event: fn} dict and is import-gated: the integration activates only when
# its package is installed AND its SETTINGS toggle is on, exactly like the
# reference's `try: import wandb; assert SETTINGS["wandb"] is True` guards.
# ---------------------------------------------------------------------------

def _epoch_scalars(trainer):
    out = {f"train/{k}": float(v) for k, v in getattr(trainer, "epoch_losses", {}).items()}
    if getattr(trainer, "last_fitness", None) is not None:
        out["metrics/fitness"] = float(trainer.last_fitness)
    return out


def wandb_callbacks():
    """Weights & Biases (reference callbacks/wb.py)."""
    import wandb  # noqa: F401

    def on_pretrain_routine_start(trainer):
        wandb.init(project="ultralytics_pro_tpu",
                   name=str(getattr(trainer, "save_dir", "run")),
                   config=dict(getattr(trainer, "args", {})))

    def on_fit_epoch_end(trainer):
        wandb.log(_epoch_scalars(trainer), step=getattr(trainer, "_epoch", 0))

    def on_train_end(trainer):
        best = getattr(trainer, "best", None)
        if best is not None:
            try:
                art = wandb.Artifact("model", type="model")
                art.add_file(str(best))
                wandb.log_artifact(art)
            except Exception:
                pass
        wandb.finish()

    return {"on_pretrain_routine_start": on_pretrain_routine_start,
            "on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def mlflow_callbacks():
    """MLflow (reference callbacks/mlflow.py)."""
    import mlflow

    def on_pretrain_routine_start(trainer):
        mlflow.start_run(run_name=str(getattr(trainer, "save_dir", "run")))
        args = dict(getattr(trainer, "args", {}) or {})
        mlflow.log_params({k: str(v) for k, v in list(args.items())[:100]})

    def on_fit_epoch_end(trainer):
        mlflow.log_metrics({k.replace("/", "_"): v for k, v in _epoch_scalars(trainer).items()},
                           step=getattr(trainer, "_epoch", 0))

    def on_train_end(trainer):
        mlflow.end_run()

    return {"on_pretrain_routine_start": on_pretrain_routine_start,
            "on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def comet_callbacks():
    """Comet ML (reference callbacks/comet.py)."""
    import comet_ml

    state = {}

    def on_pretrain_routine_start(trainer):
        state["exp"] = comet_ml.Experiment(project_name="ultralytics_pro_tpu")

    def on_fit_epoch_end(trainer):
        if "exp" in state:
            state["exp"].log_metrics(_epoch_scalars(trainer),
                                     step=getattr(trainer, "_epoch", 0))

    def on_train_end(trainer):
        if "exp" in state:
            state["exp"].end()

    return {"on_pretrain_routine_start": on_pretrain_routine_start,
            "on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def clearml_callbacks():
    """ClearML (reference callbacks/clearml.py)."""
    from clearml import Task

    state = {}

    def on_pretrain_routine_start(trainer):
        state["task"] = Task.init(project_name="ultralytics_pro_tpu",
                                  task_name=str(getattr(trainer, "save_dir", "run")))

    def on_fit_epoch_end(trainer):
        if "task" in state:
            logger = state["task"].get_logger()
            for k, v in _epoch_scalars(trainer).items():
                series = k.split("/")[-1]
                logger.report_scalar(k.split("/")[0], series, v,
                                     getattr(trainer, "_epoch", 0))

    return {"on_pretrain_routine_start": on_pretrain_routine_start,
            "on_fit_epoch_end": on_fit_epoch_end}


def dvc_callbacks():
    """DVCLive (reference callbacks/dvc.py)."""
    from dvclive import Live

    state = {}

    def on_pretrain_routine_start(trainer):
        state["live"] = Live(save_dvc_exp=True)

    def on_fit_epoch_end(trainer):
        live = state.get("live")
        if live:
            for k, v in _epoch_scalars(trainer).items():
                live.log_metric(k, v)
            live.next_step()

    def on_train_end(trainer):
        if state.get("live"):
            state["live"].end()

    return {"on_pretrain_routine_start": on_pretrain_routine_start,
            "on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def neptune_callbacks():
    """Neptune (reference callbacks/neptune.py)."""
    import neptune

    state = {}

    def on_pretrain_routine_start(trainer):
        state["run"] = neptune.init_run(project="ultralytics_pro_tpu")

    def on_fit_epoch_end(trainer):
        run = state.get("run")
        if run:
            for k, v in _epoch_scalars(trainer).items():
                run[k].append(v)

    def on_train_end(trainer):
        if state.get("run"):
            state["run"].stop()

    return {"on_pretrain_routine_start": on_pretrain_routine_start,
            "on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def raytune_callbacks():
    """Ray Tune session reporting (reference callbacks/raytune.py)."""
    from ray.air import session

    def on_fit_epoch_end(trainer):
        session.report({**_epoch_scalars(trainer),
                        "epoch": getattr(trainer, "_epoch", 0)})

    return {"on_fit_epoch_end": on_fit_epoch_end}


INTEGRATIONS = {
    "wandb": wandb_callbacks,
    "mlflow": mlflow_callbacks,
    "comet": comet_callbacks,
    "clearml": clearml_callbacks,
    "dvc": dvc_callbacks,
    "neptune": neptune_callbacks,
    "raytune": raytune_callbacks,
}


def integration_callbacks() -> Dict[str, List[Callable]]:
    """Collect callbacks from every enabled + importable integration.
    Toggle keys live in SETTINGS, same names as the reference."""
    from ultralytics_pro_tpu.utils.settings import SETTINGS

    merged: Dict[str, List[Callable]] = defaultdict(list)
    for name, factory in INTEGRATIONS.items():
        if not SETTINGS.get(name, False):
            continue
        try:
            for event, fn in factory().items():
                merged[event].append(fn)
        except ImportError:
            continue
        except Exception:
            continue
    return merged
