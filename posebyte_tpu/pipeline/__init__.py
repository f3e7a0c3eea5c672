"""Fused frame pipeline + video I/O + multi-stream serving."""
from .runner import PosePipeline, detect_fn


def __getattr__(name):
    # Serving classes pull in parallel/sharding (mesh machinery); keep
    # the base pipeline import light by loading them on first touch.
    if name in ("StreamServer", "ChunkedStreamServer"):
        from . import serving
        return getattr(serving, name)
    if name in ("PoseServingFrontend", "PoseClient"):
        from . import frontend
        return getattr(frontend, name)
    raise AttributeError(name)


__all__ = ["PosePipeline", "detect_fn", "StreamServer",
           "ChunkedStreamServer", "PoseServingFrontend", "PoseClient"]
