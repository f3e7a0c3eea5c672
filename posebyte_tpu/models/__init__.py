"""YOLO-pose model family (reference: TensorRT engine + ONNX exports)."""
from .yolo_pose import (MODEL_CONFIGS, ModelConfig, build_model, init_params,
                        forward_raw, make_anchors)

__all__ = ["MODEL_CONFIGS", "ModelConfig", "build_model", "init_params",
           "forward_raw", "make_anchors"]
