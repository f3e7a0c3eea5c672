"""Ahead-of-time engine serialization.

The closest TPU analog of the reference's serialized TensorRT engines
(reference: saveEngine/loadEngine, yolo_pose_engine.cpp:413-495): the
jitted forward pass with the weights CLOSED OVER is exported to
StableHLO via jax.export and written as a single portable artifact.
Loading deserializes and recompiles for the local topology (fast with
the persistent XLA compile cache) — like deserializeCudaEngine but
hardware-portable.

For weight-editable engines use models/weights.py (safetensors); the
AOT artifact is the locked, deployment-shaped form.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def export_engine_aot(params, model_name: str, path: str,
                      batch: int = 1, input_size: int = 640,
                      dtype=jnp.bfloat16) -> int:
    """Serialize the compiled-shape forward pass (weights baked in).

    Returns the artifact size in bytes. The exported callable maps
    [batch, input_size, input_size, 3] float32 NHWC -> [batch, 56, A].
    """
    from jax import export as jexport
    from .yolo_pose import build_model

    apply_fn, _ = build_model(model_name, dtype)

    def engine_fn(x):
        return apply_fn(params, x)

    spec = jax.ShapeDtypeStruct((batch, input_size, input_size, 3),
                                jnp.float32)
    exported = jexport.export(jax.jit(engine_fn))(spec)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_engine_aot(path: str):
    """Deserialize an AOT engine; returns a callable
    (images_nhwc_f32) -> raw [B, 56, A]."""
    from jax import export as jexport
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return jax.jit(exported.call)
