"""UI application shells (reference solutions/streamlit_inference.py Inference,
similarity_search.py SearchApp, parking_management.py ParkingPtsSelection).

Each app is import-gated on its UI framework (streamlit / flask / tkinter) so
the classes are constructible-and-discoverable in headless environments and
only raise when the framework is genuinely needed."""

from __future__ import annotations

from pathlib import Path


class Inference:
    """Streamlit live-inference UI (reference streamlit_inference.py:Inference):
    sidebar model/source/conf controls, webcam or video playback with tracked
    overlays. `.inference()` launches the app; requires `streamlit`."""

    def __init__(self, model: str = "yolov8n.yaml", **kwargs):
        self.model_path = model
        self.kwargs = kwargs
        self.st = None

    def _ui(self, st):
        from ultralytics_pro_tpu import YOLO

        st.set_page_config(page_title="ultralytics_pro_tpu", layout="wide")
        st.title("Real-time inference")
        with st.sidebar:
            source = st.selectbox("Source", ("webcam", "video"))
            conf = st.slider("Confidence", 0.0, 1.0, 0.25, 0.01)
            iou = st.slider("IoU", 0.0, 1.0, 0.45, 0.01)
            run = st.button("Start")
        frame_slot = st.empty()
        if run:
            model = YOLO(self.model_path)
            src = 0 if source == "webcam" else st.file_uploader("video")
            for r in model.predict(source=src, conf=conf, iou=iou, stream=True):
                frame_slot.image(r.plot(), channels="BGR")

    def inference(self):
        try:
            import streamlit as st
        except ImportError as e:
            raise ImportError(
                "the live UI needs `streamlit`; run `streamlit run` in a "
                "networked environment — all non-UI inference works via "
                "YOLO(...).predict()") from e
        self.st = st
        self._ui(st)


class SearchApp:
    """Flask front-end over SimilaritySearch (reference
    similarity_search.py:SearchApp). Headless-friendly: `.search(query)` works
    without flask; `.run()` needs it."""

    def __init__(self, data: str = "images", device: str = ""):
        from ultralytics_pro_tpu.solutions.solutions import SimilaritySearch

        self.searcher = SimilaritySearch(data=data, device=device)

    def search(self, query: str, k: int = 12):
        return self.searcher(query, k=k)

    def run(self, debug: bool = False):
        try:
            from flask import Flask, request
        except ImportError as e:
            raise ImportError("SearchApp's web UI needs `flask`; use "
                              ".search(query) headlessly instead") from e
        app = Flask("similarity-search")

        @app.route("/", methods=["GET", "POST"])
        def index():
            from html import escape

            q = request.form.get("query", "") if request.method == "POST" else ""
            hits = self.search(q) if q else []
            items = "".join(f"<li>{escape(str(h))}</li>" for h in hits)
            return (f'<form method=post><input name=query value="{escape(q, quote=True)}">'
                    f"<button>Search</button></form><ul>{items}</ul>")

        app.run(debug=debug)


class ParkingPtsSelection:
    """Tkinter click-tool that records parking-region polygons to JSON
    (reference parking_management.py:ParkingPtsSelection)."""

    def __init__(self):
        try:
            import tkinter  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "ParkingPtsSelection needs tkinter (a desktop session); "
                "author the JSON by hand instead: "
                '[{"points": [[x1, y1], [x2, y2], [x3, y3], [x4, y4]]}, ...]') from e
        import tkinter as tk

        self.tk = tk
        self.points: list = []
        self.regions: list = []

    def save(self, path: str = "bounding_boxes.json"):
        import json

        Path(path).write_text(json.dumps(self.regions, indent=2))
        return path
