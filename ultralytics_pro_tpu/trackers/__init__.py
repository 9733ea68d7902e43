"""Multi-object trackers (reference ultralytics/trackers/)."""

from ultralytics_pro_tpu.trackers.bot_sort import BOTSORT
from ultralytics_pro_tpu.trackers.byte_tracker import BYTETracker

__all__ = ["BOTSORT", "BYTETracker"]
