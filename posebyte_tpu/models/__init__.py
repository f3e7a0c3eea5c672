"""YOLO-pose model family (reference: TensorRT engine + ONNX exports)."""
from .yolo_pose import (MODEL_CONFIGS, ModelConfig, build_model,
                        build_model_heads, init_params, forward_raw,
                        forward_heads, make_anchors)


def __getattr__(name):
    # Lazy: engine pulls in weights/quant machinery.
    if name == "YoloPoseEngine":
        from .engine import YoloPoseEngine
        return YoloPoseEngine
    raise AttributeError(name)


__all__ = ["MODEL_CONFIGS", "ModelConfig", "build_model",
           "build_model_heads", "init_params", "forward_raw",
           "forward_heads", "make_anchors", "YoloPoseEngine"]
