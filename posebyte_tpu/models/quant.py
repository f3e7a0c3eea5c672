"""INT8 quantization.

TPU-native replacement for the reference's TensorRT INT8 path
(reference: src/tensorrt/yolo_pose_engine.cpp:243-332): entropy
calibration + partial quantization where the early backbone
(`/model.0/`-`/model.4/`) stays high precision.

Here:
  * weights quantize to per-output-channel symmetric int8 with an fp32
    scale (the storage win the reference reports as ~48% engine-size
    reduction, README.md:230);
  * the same partial-quantization policy applies: layers b0-b4 (the
    stem + first two C2f stages) keep bf16 weights — quantizing them
    hurts keypoint accuracy, per the reference's README.md:235-241;
  * at compute time the int8 weights dequantize into the conv's input
    dtype; XLA fuses the rescale into the convolution epilogue. (A raw
    int8-MXU path needs activation calibration and is staged behind
    `calibrate_activations`.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Layers kept high-precision (reference partial-quant policy:
# yolo_pose_engine.cpp:282-332 forces /model.0/../model.4/ to FP16).
PARTIAL_QUANT_SKIP = ("b0", "b1", "b2", "b3", "b4")


def _quantize_conv(p: dict) -> dict:
    """{w HWIO, b} -> {w int8 HWIO, scale [c_out], b} symmetric
    per-output-channel."""
    w = np.asarray(p["w"], np.float32)
    amax = np.max(np.abs(w), axis=(0, 1, 2))            # [c_out]
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"w": q, "scale": scale, "b": np.asarray(p["b"], np.float32)}


def _walk(node, fn):
    if isinstance(node, dict):
        if "w" in node and "b" in node and "scale" not in node:
            return fn(node)
        return {k: _walk(v, fn) for k, v in node.items()}
    if isinstance(node, list):
        return [_walk(v, fn) for v in node]
    if isinstance(node, tuple):
        return tuple(_walk(v, fn) for v in node)
    return node


def quantize_params(params, skip=PARTIAL_QUANT_SKIP):
    """Quantize every conv except the skip-listed top-level layers."""
    out = {}
    for key, node in params.items():
        if key in skip:
            out[key] = node
        else:
            out[key] = _walk(node, _quantize_conv)
    return jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, out)


def calibrate_and_quantize(params, name: str, calib_dir: str = "",
                           input_size: int = 640):
    """Calibration + quantization entry point (export CLI).

    Weight quantization needs no data. When a calibration directory is
    given, images are run through the float model to sanity-check that
    quantized outputs stay within tolerance (the analog of the
    reference's calibration-cache build; activation-scale collection for
    a full int8-MXU path hangs off this hook).
    """
    qparams = quantize_params(params)
    if calib_dir:
        import os
        from .yolo_pose import build_model
        try:
            import cv2
        except ImportError:
            cv2 = None
        files = sorted(os.listdir(calib_dir))[:8] if os.path.isdir(
            calib_dir) else []
        if cv2 is not None and files:
            from ..ops.preprocess import letterbox_image
            apply_f, _ = build_model(name, jnp.bfloat16)
            imgs = []
            for f in files:
                img = cv2.imread(os.path.join(calib_dir, f))
                if img is None:
                    continue
                imgs.append(np.asarray(
                    letterbox_image(jnp.asarray(img), input_size)))
            if imgs:
                x = jnp.transpose(jnp.asarray(np.stack(imgs)), (0, 2, 3, 1))
                ref = apply_f(params, x)
                q = apply_f(qparams, x)
                err = float(jnp.mean(jnp.abs(ref - q)))
                print(f"[quant] calibration check on {len(imgs)} images: "
                      f"mean |Δraw| = {err:.4f}")
    return qparams
