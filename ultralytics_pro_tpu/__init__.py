"""ultralytics_pro_tpu — a TPU-native (JAX/XLA/Pallas) detection framework.

A ground-up rebuild of the capabilities of the Ultralytics-YOLO-style reference
(train/val/predict/track/export/benchmark over detect/segment/classify/pose/OBB,
YAML-driven model assembly) designed for TPUs: SPMD data parallelism via
jax.sharding + jit instead of DDP subprocesses, static-shape kernels for the
whole postprocess path, bf16 on the MXU, and Orbax checkpointing.
"""

__version__ = "0.1.0"

__all__ = ["YOLO", "Model", "RTDETR", "FastSAM", "SAM", "NAS", "__version__"]


def __getattr__(name):
    # Lazy top-level exports so `import ultralytics_pro_tpu.ops` stays light.
    if name in {"YOLO", "Model"}:
        from ultralytics_pro_tpu.engine import model as _model

        return getattr(_model, name)
    if name == "RTDETR":
        from ultralytics_pro_tpu.models.rtdetr import RTDETR

        return RTDETR
    if name == "FastSAM":
        from ultralytics_pro_tpu.models.fastsam import FastSAM

        return FastSAM
    if name == "SAM":
        from ultralytics_pro_tpu.models.sam import SAM

        return SAM
    if name == "NAS":
        from ultralytics_pro_tpu.models.nas import NAS

        return NAS
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
