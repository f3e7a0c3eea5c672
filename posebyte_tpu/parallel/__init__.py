"""Device-mesh parallelism (multi-stream / batched serving)."""
from .sharding import make_mesh, MultiStreamPipeline

__all__ = ["make_mesh", "MultiStreamPipeline"]
