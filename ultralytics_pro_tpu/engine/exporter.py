"""Exporter: serialize the jitted inference graph + weights for deployment.

The reference exports through 18 torch-ecosystem converters
(ultralytics/engine/exporter.py:128-165). The TPU-native export surface is:

- `stablehlo`: jax.export serialization of the FULL inference function
  (on-device preprocess -> forward -> decode [-> NMS]) with the weights baked
  in — loadable by any StableHLO-capable runtime (XLA CPU/GPU/TPU, IREE) and
  by our AutoBackend via jax.export.deserialize;
- `ckpt`: weights + model yaml (python-free format: pickled numpy pytree).

Torch-ecosystem formats (onnx/tflite/coreml/...) need their packages, which
are not in this hermetic environment; requesting one raises with the
conversion route (export stablehlo, convert offline).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict

import numpy as np

from ultralytics_pro_tpu.utils import LOGGER, colorstr

EXPORT_FORMATS = {
    "stablehlo": ".stablehlo",
    "ckpt": ".ckpt",
    "saved_model": "_saved_model",  # jax2tf -> TF SavedModel (edge path)
    "tflite": ".tflite",            # jax2tf -> TFLite flatbuffer
    "pb": ".pb",                    # frozen TF GraphDef (reference export_pb)
    "onnx": ".onnx",                # native jaxpr->ONNX (engine/onnx_export.py)
    "torchscript": ".torchscript",  # jaxpr->torch aten trace (engine/torch_export.py)
}
UNSUPPORTED = {
    "openvino", "engine", "coreml",
    "edgetpu", "tfjs", "paddle", "mnn", "ncnn", "imx", "rknn", "executorch",
}


class Exporter:
    """Export a task model (reference Exporter, engine/exporter.py:301)."""

    def __init__(self, model, args: Dict):
        self.model = model
        self.args = dict(args or {})

    def __call__(self):
        fmt = str(self.args.get("format", "stablehlo")).lower()
        if fmt in UNSUPPORTED:
            raise NotImplementedError(
                f"format '{fmt}' requires its runtime package (not present in this "
                f"environment). Export format='stablehlo' and convert offline; "
                f"supported here: {sorted(EXPORT_FORMATS)}"
            )
        if fmt not in EXPORT_FORMATS:
            raise ValueError(f"unknown export format '{fmt}'; supported: {sorted(EXPORT_FORMATS)}")
        t0 = time.time()
        imgsz = int(self.args.get("imgsz", 640))
        batch = int(self.args.get("batch", 1))
        name = Path(self.args.get("name") or "model")
        out = getattr(self, f"export_{fmt}")(imgsz, batch, name)
        LOGGER.info(colorstr("green", f"export complete ({time.time() - t0:.1f}s): {out}"))
        return str(out)

    def export_stablehlo(self, imgsz: int, batch: int, name: Path):
        import jax
        import jax.numpy as jnp
        from jax import export as jexport

        model = self.model
        if model.variables is None:
            model.init_params(imgsz=imgsz)
        variables = model.variables
        nc = model.nc

        def infer(img_u8):
            x = img_u8[..., ::-1].astype(jnp.float32) / 255.0
            y, _ = model.module.apply(variables, x, train=False)
            return y  # (B, A, no) decoded

        spec = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.uint8)
        exported = jexport.export(jax.jit(infer))(spec)
        blob = exported.serialize()
        out = Path(f"{name}.stablehlo")
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_bytes(blob)
        meta = {
            "imgsz": imgsz, "batch": batch, "nc": nc,
            "names": model.names, "stride": list(map(int, model.stride)),
            "task": model.task, "format": "stablehlo",
            "output": "(B, A, 4+nc[+extra]) decoded predictions, boxes xywh pixels",
        }
        Path(f"{name}.stablehlo.json").write_text(json.dumps(meta, indent=2))
        return out

    def _infer_fn(self, imgsz: int):
        """The exported inference graph: on-device preprocess -> forward ->
        decode (same surface as stablehlo; NMS stays outside for edge parity
        with the reference's TF exports, exporter.py:1417 adds it optionally)."""
        import jax.numpy as jnp

        model = self.model
        if model.variables is None:
            model.init_params(imgsz=imgsz)
        variables = model.variables

        def infer(img_u8):
            x = img_u8[..., ::-1].astype(jnp.float32) / 255.0
            y, _ = model.module.apply(variables, x, train=False)
            return y

        return infer

    def _metadata(self, imgsz: int, batch: int, fmt: str) -> Dict:
        return {
            "imgsz": imgsz, "batch": batch, "nc": self.model.nc,
            "names": self.model.names, "stride": list(map(int, self.model.stride)),
            "task": self.model.task, "format": fmt,
            "output": "(B, A, 4+nc[+extra]) decoded predictions, boxes xywh pixels",
        }

    def _tf_module(self, imgsz: int, batch: int):
        """jax2tf conversion shared by saved_model/tflite (reference
        exporter.py export_saved_model:790 via the torch->TF chain; here the
        jitted jax graph converts directly)."""
        import tensorflow as tf
        from jax.experimental import jax2tf

        infer = self._infer_fn(imgsz)
        tf_fn = jax2tf.convert(infer, with_gradient=False)
        module = tf.Module()
        module.f = tf.function(
            tf_fn, autograph=False,
            input_signature=[tf.TensorSpec((batch, imgsz, imgsz, 3), tf.uint8)],
        )
        return tf, module

    def export_saved_model(self, imgsz: int, batch: int, name: Path):
        tf, module = self._tf_module(imgsz, batch)
        out = Path(f"{name}_saved_model")
        tf.saved_model.save(module, str(out))
        (out / "metadata.json").write_text(
            json.dumps(self._metadata(imgsz, batch, "saved_model"), indent=2))
        return out

    def export_tflite(self, imgsz: int, batch: int, name: Path):
        tf, module = self._tf_module(imgsz, batch)
        conc = module.f.get_concrete_function()
        converter = tf.lite.TFLiteConverter.from_concrete_functions([conc], module)
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS,
        ]
        if self.args.get("half"):
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            converter.target_spec.supported_types = [tf.float16]
        if self.args.get("int8"):
            # INT8 post-training quantization with a real calibration stream
            # (reference get_int8_calibration_dataloader exporter.py:590):
            # `data` yaml -> up to 100 letterboxed images as the
            # representative dataset; synthetic fallback keeps it hermetic.
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            converter.representative_dataset = self._int8_calibration(tf, imgsz, batch)
        blob = converter.convert()
        out = Path(f"{name}.tflite")
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_bytes(blob)
        Path(f"{name}.tflite.json").write_text(
            json.dumps(self._metadata(imgsz, batch, "tflite"), indent=2))
        return out

    def _int8_calibration(self, tf, imgsz: int, batch: int, n: int = 100):
        """Representative-dataset generator for INT8 calibration."""
        import numpy as np

        paths = []
        data = self.args.get("data")
        if data:
            try:
                from ultralytics_pro_tpu.data.utils import check_det_dataset

                d = check_det_dataset(data)
                split = d.get("val") or d.get("train")
                for sp in (split if isinstance(split, list) else [split]):
                    paths += sorted(Path(sp).glob("*.jpg")) + sorted(Path(sp).glob("*.png"))
            except Exception:
                paths = []
        paths = paths[:n]

        def gen():
            import cv2

            from ultralytics_pro_tpu.data.augment import LetterBox

            lb = LetterBox((imgsz, imgsz), scaleup=False)
            if paths:
                for p in paths:
                    im = lb(image=cv2.imread(str(p)))
                    im = im["img"] if isinstance(im, dict) else im
                    x = np.tile(im[None], (batch, 1, 1, 1)).astype(np.uint8)
                    yield [tf.constant(x)]
            else:  # hermetic fallback: structured noise
                rng = np.random.default_rng(0)
                for _ in range(min(n, 20)):
                    yield [tf.constant(rng.integers(0, 255, (batch, imgsz, imgsz, 3),
                                                    dtype=np.uint8))]

        return gen

    def export_pb(self, imgsz: int, batch: int, name: Path):
        """Frozen TF GraphDef (reference export_pb, exporter.py via
        convert_variables_to_constants_v2): the jax2tf graph with all weights
        folded to constants, loadable by TF1-style serving stacks."""
        tf, module = self._tf_module(imgsz, batch)
        from tensorflow.python.framework.convert_to_constants import (
            convert_variables_to_constants_v2,
        )

        frozen = convert_variables_to_constants_v2(module.f.get_concrete_function())
        gd = frozen.graph.as_graph_def()
        out = Path(f"{name}.pb")
        out.parent.mkdir(parents=True, exist_ok=True)
        tf.io.write_graph(gd, str(out.parent or "."), out.name, as_text=False)
        meta = self._metadata(imgsz, batch, "pb")
        # tensor names survive freezing; AutoBackend prunes the wrapped graph
        # by these instead of guessing from Placeholder/terminal-node scans
        meta["inputs"] = [t.name for t in frozen.inputs]
        meta["outputs"] = [t.name for t in frozen.outputs]
        Path(f"{out}.json").write_text(json.dumps(meta, indent=2))
        return out

    def export_onnx(self, imgsz: int, batch: int, name: Path):
        """Native jaxpr -> ONNX export (reference exporter.py:631): decoded
        (B, 4+nc, A) output0, NMS external like the reference default."""
        from ultralytics_pro_tpu.engine.onnx_export import export_model_onnx

        model = self.model
        if model.variables is None:
            model.init_params(imgsz=imgsz)
        meta = {"stride": str(int(max(model.stride))), "imgsz": str(imgsz),
                "names": str(getattr(model, "names", None) or {})}
        out = name.with_suffix(".onnx")
        return export_model_onnx(model, out, imgsz=imgsz, metadata=meta)

    def export_torchscript(self, imgsz: int, batch: int, name: Path):
        """Real TorchScript artifact (reference exporter.py:614): the jaxpr
        lowers to torch aten ops via the ONNX-subset graph and torch.jit.trace;
        loadable by plain torch.jit.load / libtorch. I/O matches the reference:
        (B, 3, H, W) float in, (B, 4+nc, A) out, config.txt in _extra_files."""
        from ultralytics_pro_tpu.engine.torch_export import export_model_torchscript

        model = self.model
        if model.variables is None:
            model.init_params(imgsz=imgsz)
        out = Path(f"{name}.torchscript")
        out.parent.mkdir(parents=True, exist_ok=True)
        return export_model_torchscript(model, out, imgsz=imgsz,
                                        metadata=self._metadata(imgsz, batch, "torchscript"))

    def export_ckpt(self, imgsz: int, batch: int, name: Path):
        from ultralytics_pro_tpu.engine.trainer import save_pickle

        if self.model.variables is None:
            self.model.init_params(imgsz=imgsz)
        out = Path(f"{name}.ckpt")
        out.parent.mkdir(parents=True, exist_ok=True)
        save_pickle(out, {
            "params": self.model.variables["params"],
            "ema": None,
            "batch_stats": self.model.variables["batch_stats"],
            "model_yaml": self.model.yaml if isinstance(self.model.yaml, dict) else None,
            "train_args": {},
            "names": self.model.names,
        })
        return out


class AutoBackend:
    """Unified inference over exported artifacts (reference autobackend.py:71:
    18 runtimes behind one forward; here: live flax model, ckpt, stablehlo)."""

    def __init__(self, weights, task=None):
        self.format = None
        p = str(weights)
        if p.endswith(".stablehlo"):
            from jax import export as jexport

            blob = Path(p).read_bytes()
            self.exported = jexport.deserialize(blob)
            meta_path = Path(p + ".json")
            self.metadata = json.loads(meta_path.read_text()) if meta_path.exists() else {}
            self.names = {int(k): v for k, v in (self.metadata.get("names") or {}).items()}
            self.format = "stablehlo"
        elif p.endswith(".ckpt") or p.endswith(".pkl"):
            from ultralytics_pro_tpu.engine.model import Model

            self.model = Model(p, task=task)
            self.names = self.model.names
            self.format = "ckpt"
        elif p.endswith("_saved_model") or (Path(p).is_dir() and (Path(p) / "saved_model.pb").exists()):
            import tensorflow as tf

            self.tf_model = tf.saved_model.load(p)
            meta_path = Path(p) / "metadata.json"
            self.metadata = json.loads(meta_path.read_text()) if meta_path.exists() else {}
            self.names = {int(k): v for k, v in (self.metadata.get("names") or {}).items()}
            self.format = "saved_model"
        elif p.endswith(".tflite"):
            import tensorflow as tf

            self.interpreter = tf.lite.Interpreter(model_path=p)
            self.interpreter.allocate_tensors()
            meta_path = Path(p + ".json")
            self.metadata = json.loads(meta_path.read_text()) if meta_path.exists() else {}
            self.names = {int(k): v for k, v in (self.metadata.get("names") or {}).items()}
            self.format = "tflite"
        elif p.endswith(".pb"):
            import tensorflow as tf

            gd = tf.compat.v1.GraphDef()
            gd.ParseFromString(Path(p).read_bytes())
            meta_path = Path(p + ".json")
            self.metadata = json.loads(meta_path.read_text()) if meta_path.exists() else {}
            self.names = {int(k): v for k, v in (self.metadata.get("names") or {}).items()}
            wrapped = tf.compat.v1.wrap_function(
                lambda: tf.compat.v1.import_graph_def(gd, name=""), [])
            ge = wrapped.graph.as_graph_element
            inputs = self.metadata.get("inputs") or ["args_tf_0:0"]
            outputs = self.metadata.get("outputs") or ["Identity:0"]
            self.pb_fn = wrapped.prune(
                tf.nest.map_structure(ge, inputs), tf.nest.map_structure(ge, outputs))
            self.format = "pb"
        elif p.endswith(".torchscript"):
            import torch

            extra = {"config.txt": ""}
            self.ts_model = torch.jit.load(p, map_location="cpu", _extra_files=extra)
            self.ts_model.eval()
            try:
                self.metadata = json.loads(extra["config.txt"].decode()
                                           if isinstance(extra["config.txt"], bytes)
                                           else extra["config.txt"])
            except Exception:
                self.metadata = {}
            self.names = {int(k): v for k, v in (self.metadata.get("names") or {}).items()}
            self.format = "torchscript"
        elif p.endswith(".onnx"):
            blob = Path(p).read_bytes()
            try:
                import onnxruntime as ort

                self.ort_session = ort.InferenceSession(p, providers=["CPUExecutionProvider"])
                self.format = "onnx"
            except ImportError:
                # native fallback runtime (utils/onnx_run.py) — the exported
                # op subset runs through jax without onnxruntime
                self.onnx_bytes = blob
                self.format = "onnx_native"
            from ultralytics_pro_tpu.utils.onnx_proto import parse_model as _pm

            self.metadata = _pm(blob).get("metadata", {})
            try:
                import ast

                self.names = {int(k): v for k, v in
                              ast.literal_eval(self.metadata.get("names", "{}")).items()}
            except Exception:
                self.names = {}

    def __call__(self, img_u8: np.ndarray):
        if self.format == "onnx":
            x = np.asarray(img_u8, np.float32)
            name = self.ort_session.get_inputs()[0].name
            y = self.ort_session.run(None, {name: x})[0]
            return np.swapaxes(y, 1, 2)  # reference (B,C,A) -> internal (B,A,C)
        if self.format == "torchscript":
            import torch

            x = torch.from_numpy(np.asarray(img_u8, np.float32)).permute(0, 3, 1, 2)
            with torch.no_grad():
                y = self.ts_model(x)
            y = y[0] if isinstance(y, (list, tuple)) else y
            return np.swapaxes(y.numpy(), 1, 2)  # (B,C,A) -> internal (B,A,C)
        if self.format == "onnx_native":
            from ultralytics_pro_tpu.utils.onnx_run import run_onnx

            y = run_onnx(self.onnx_bytes, {"images": np.asarray(img_u8, np.float32)})[0]
            return np.swapaxes(y, 1, 2)
        if self.format == "stablehlo":
            return np.asarray(self.exported.call(img_u8))
        if self.format == "saved_model":
            return np.asarray(self.tf_model.f(img_u8))
        if self.format == "pb":
            import tensorflow as tf

            # the pruned wrap_function binds graph tensors, not numpy arrays
            y = self.pb_fn(tf.constant(np.asarray(img_u8, np.uint8)))
            return np.asarray(y[0] if isinstance(y, (list, tuple)) else y)
        if self.format == "tflite":
            inp = self.interpreter.get_input_details()[0]
            out = self.interpreter.get_output_details()[0]
            self.interpreter.set_tensor(inp["index"], np.asarray(img_u8, np.uint8))
            self.interpreter.invoke()
            return self.interpreter.get_tensor(out["index"])
        y, _ = self.model.model(np.asarray(img_u8), train=False)
        return np.asarray(y)

    def warmup(self, imgsz=(1, 640, 640, 3)):
        self(np.zeros(imgsz, np.uint8))
        return self
