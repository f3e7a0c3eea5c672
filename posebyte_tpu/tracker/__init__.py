"""Two-tier ByteTrack pose tracker (reference: src/cuda/gpu_tracker.cu)."""
from .step import tracker_step, LOCK_COST
from .output import TrackOutput, extract_outputs_device, get_active_tracks

__all__ = ["tracker_step", "LOCK_COST", "TrackOutput",
           "extract_outputs_device", "get_active_tracks"]
