"""Fused frame pipeline + video I/O."""
from .runner import PosePipeline, detect_fn

__all__ = ["PosePipeline", "detect_fn"]
