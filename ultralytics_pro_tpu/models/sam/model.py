"""SAM user facade (reference ultralytics/models/sam/model.py SAM).

`SAM("sam_b")` builds the ViT-B promptable segmenter; call it with point/box
prompts or no prompts (automatic everything-mode). Weights load from a .ckpt
pytree (tools/convert_pt.py-style conversion of official SAM checkpoints is a
planned follow-up; random init works for API/smoke use).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ultralytics_pro_tpu.models.sam.build import build_sam
from ultralytics_pro_tpu.models.sam.predict import SAMPredictor


class SAM:
    """Promptable segmentation facade: predict with bboxes/points/labels."""

    task = "segment"

    def __init__(self, model: str = "sam_b.pt", imgsz: int = 1024):
        name = str(model)
        stem = name.split("/")[-1].lower()
        self.model = build_sam(name, img_size=imgsz)
        if stem.startswith("sam2"):
            from ultralytics_pro_tpu.models.sam.predict import SAM2Predictor

            self.predictor = SAM2Predictor(self.model)
        else:
            self.predictor = SAMPredictor(self.model)
        ckpt = Path(name).with_suffix(".ckpt")
        if ckpt.exists():
            from ultralytics_pro_tpu.engine.trainer import load_pickle

            self.predictor.load(load_pickle(ckpt))

    def predict(self, source, stream: bool = False, bboxes=None, points=None,
                labels=None, **kwargs):
        return self.predictor(source, bboxes=bboxes, points=points, labels=labels, **kwargs)

    def __call__(self, source, **kwargs):
        return self.predict(source, **kwargs)

    def info(self, verbose: bool = True):
        import jax

        self.predictor.init_params()
        n = sum(x.size for x in jax.tree.leaves(self.predictor.variables))
        if verbose:
            print(f"SAM: {n:,} parameters")
        return {"parameters": n}

    @property
    def task_map(self):
        return {"segment": {"predictor": SAMPredictor}}
