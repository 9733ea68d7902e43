"""Triton inference-server client (reference ultralytics/utils/triton.py:10
TritonRemoteModel). Requires `tritonclient`, which is not present in this
hermetic environment — the class raises at construction with install guidance,
keeping the AutoBackend `triton://` route discoverable."""


class TritonRemoteModel:
    def __init__(self, url: str, endpoint: str = "", scheme: str = ""):
        raise ImportError(
            "TritonRemoteModel requires the `tritonclient` package (HTTP/gRPC). "
            "Install tritonclient[all] in a networked environment to serve "
            "exported StableHLO/ckpt models behind Triton."
        )
