"""Triton Inference Server client (reference ultralytics/utils/triton.py:10).

A dependency-free implementation of the KServe/Triton **v2 HTTP inference
protocol** via urllib — no `tritonclient` wheel needed. Supports the same
constructor forms as the reference:

    TritonRemoteModel("http://localhost:8000/yolov8n")
    TritonRemoteModel("localhost:8000", endpoint="yolov8n", scheme="http")
    ...("triton://host:8000/model")   # AutoBackend route

Tensors ride the JSON body (v2 `inputs[].data` row-major lists); binary
extension is unnecessary for detection-sized IO. gRPC requires tritonclient
and raises with guidance.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from typing import List

import numpy as np

_NP2TRITON = {
    np.dtype("float32"): "FP32", np.dtype("float16"): "FP16",
    np.dtype("float64"): "FP64", np.dtype("int32"): "INT32",
    np.dtype("int64"): "INT64", np.dtype("uint8"): "UINT8",
    np.dtype("int8"): "INT8", np.dtype("bool"): "BOOL",
}
_TRITON2NP = {v: k for k, v in _NP2TRITON.items()}


class TritonRemoteModel:
    """Callable client for one model on a Triton server."""

    def __init__(self, url: str, endpoint: str = "", scheme: str = ""):
        if not endpoint and not scheme:  # parse all args from one URL string
            parsed = urllib.parse.urlsplit(url.replace("triton://", "http://"))
            endpoint = parsed.path.strip("/").split("/")[0]
            scheme = parsed.scheme or "http"
            url = parsed.netloc
        if scheme == "grpc":
            raise ImportError("gRPC needs tritonclient[grpc]; use the HTTP scheme here")
        self.endpoint = endpoint
        proto = scheme if scheme in ("http", "https") else "http"
        self.url = f"{proto}://{url}" if "://" not in url else url
        meta = self._get(f"/v2/models/{endpoint}")
        self.metadata = meta
        inputs = meta.get("inputs", [])
        outputs = meta.get("outputs", [])
        self.input_names = [i["name"] for i in inputs]
        self.input_formats = [i.get("datatype", "FP32") for i in inputs]
        self.np_input_formats = [_TRITON2NP.get(f, np.dtype("float32"))
                                 for f in self.input_formats]
        # reference sorts outputs alphabetically for a stable order
        self.output_names = sorted(o["name"] for o in outputs)

    def _get(self, path: str) -> dict:
        with urllib.request.urlopen(self.url + path, timeout=30) as r:  # noqa: S310
            return json.loads(r.read().decode())

    def _post(self, path: str, payload: dict) -> dict:
        body = json.dumps(payload).encode()
        req = urllib.request.Request(  # noqa: S310
            self.url + path, data=body, headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:  # noqa: S310
            return json.loads(r.read().decode())

    def __call__(self, *args) -> List[np.ndarray]:
        """Run inference; accepts one array per model input, returns one
        ndarray per output in `output_names` order (reference triton.py:__call__)."""
        inputs = []
        for name, dtype, arr in zip(self.input_names, self.np_input_formats, args):
            arr = np.asarray(arr)
            if arr.dtype != dtype:
                arr = arr.astype(dtype)
            inputs.append({
                "name": name,
                "shape": list(arr.shape),
                "datatype": _NP2TRITON[arr.dtype],
                "data": arr.reshape(-1).tolist(),
            })
        payload = {"inputs": inputs,
                   "outputs": [{"name": n} for n in self.output_names]}
        resp = self._post(f"/v2/models/{self.endpoint}/infer", payload)
        outs = {o["name"]: o for o in resp.get("outputs", [])}
        result = []
        for n in self.output_names:
            o = outs[n]
            result.append(np.asarray(o["data"],
                                     dtype=_TRITON2NP.get(o["datatype"], np.float32)
                                     ).reshape(o["shape"]))
        return result
