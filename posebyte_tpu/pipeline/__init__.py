"""Fused frame pipeline + video I/O + multi-stream serving."""
from .runner import PosePipeline, detect_fn


def __getattr__(name):
    # StreamServer pulls in parallel/sharding (mesh machinery); keep the
    # base pipeline import light by loading it on first touch.
    if name == "StreamServer":
        from .serving import StreamServer
        return StreamServer
    raise AttributeError(name)


__all__ = ["PosePipeline", "detect_fn", "StreamServer"]
