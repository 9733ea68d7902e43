"""`python -m ultralytics_pro_tpu ...` == the `yolo` CLI (reference
ultralytics/cfg/__init__.py:817 entrypoint)."""

from ultralytics_pro_tpu.cfg import entrypoint

if __name__ == "__main__":
    entrypoint()
