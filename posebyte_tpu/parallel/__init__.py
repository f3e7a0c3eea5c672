"""Device-mesh parallelism (multi-stream / batched serving)."""
from .sharding import (make_mesh, MultiStreamPipeline,
                       MultiStreamChunkPipeline)

__all__ = ["make_mesh", "MultiStreamPipeline",
           "MultiStreamChunkPipeline"]
