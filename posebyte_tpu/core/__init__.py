"""Core data model: constants, configs, pytree structures."""
from . import constants
from .config import (TrackerConfig, LegacyTrackerConfig, DetectorConfig,
                     PipelineConfig)
from .structs import Detections, TrackerState, KalmanState136

__all__ = ["constants", "TrackerConfig", "LegacyTrackerConfig",
           "DetectorConfig", "PipelineConfig", "Detections", "TrackerState",
           "KalmanState136"]
