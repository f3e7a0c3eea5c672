"""PoseBYTE-TPU: a TPU-native real-time multi-person pose detection and
tracking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
naveedprojects/yolo-pose-cpp (PoseBYTE, C++/CUDA/TensorRT): YOLOv8/11-pose
detection, device-resident decode + OKS pose-NMS, two-tier ByteTrack
association with spatial gating, Kalman smoothing, and a fused per-frame
step that keeps everything in HBM with a single small device-to-host
copy for visualization.

Layering (SURVEY.md §7):
    core/      data model, configs, pytree state
    ops/       jitted compute primitives (the CUDA-kernel equivalents)
    models/    YOLO-pose forward passes + weights + quantization
    tracker/   the 8-stage tracking step
    pipeline/  fused frame step + video I/O
    parallel/  device-mesh sharding for batched / multi-stream serving
    cli/       posebyte_demo / benchmark / export_engine parity
"""
__version__ = "0.1.0"

from .core import (TrackerConfig, DetectorConfig, PipelineConfig,
                   Detections, TrackerState)
from .tracker import tracker_step, get_active_tracks

__all__ = ["TrackerConfig", "DetectorConfig", "PipelineConfig",
           "Detections", "TrackerState", "tracker_step",
           "get_active_tracks", "__version__"]
