"""YoloPoseEngine — the detection-engine facade.

API parity with the reference's TensorRT wrapper
(reference: include/tensorrt/yolo_pose_engine.h:59-130 /
src/tensorrt/yolo_pose_engine.cpp), with each entry point rebuilt
TPU-native:

  build_from_checkpoint  <- buildFromONNX (weights import + precision
                            policy + int8 partial quantization)
  save_engine/load_engine <- saveEngine/loadEngine (safetensors + the
                            persistent XLA compile cache)
  detect                 <- detect() single image (host numpy in/out,
                            legacy NMS path, nms.cu rules)
  detect_batch           <- detectBatch() (batched conv pass)
  detect_from_device     <- detectFromDevice() (device array in,
                            host detections out)
  detect_device_native   <- detectGPUNative() (device in, device
                            Detections out — zero host crossings; feeds
                            the tracker directly)

The reference's dual API pattern (SURVEY.md §1: async device-native vs
staging host paths) maps to: device-native methods return device
Detections for chaining; host methods do the single D2H themselves.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DetectorConfig
from ..core.structs import Detections
from ..ops.decode import decode_yolo_output
from ..ops.legacy_nms import legacy_pose_nms
from ..ops.nms import pose_nms
from ..ops.preprocess import letterbox_flat, letterbox_params
from .yolo_pose import MODEL_CONFIGS, build_model


class YoloPoseEngine:
    """Pose detection engine over a jitted YOLO-pose forward pass."""

    def __init__(self, model_name: str = "yolov8n-pose",
                 config: DetectorConfig = DetectorConfig(),
                 params=None, precision: str = "bf16", seed: int = 0):
        if model_name not in MODEL_CONFIGS:
            raise ValueError(f"unknown model {model_name}")
        self.model_name = model_name
        if config.raw_preproc:
            # The engine keeps the normalized letterbox on all four
            # detect paths: its params round-trip through
            # save_engine/load_engine in the standard (unfolded) form,
            # and the host/legacy-parity paths are not the perf
            # surface. The stem-folded raw ingest lives in
            # PosePipeline / the serving classes (which fold at
            # construction). Forcing the flag off here keeps
            # engine.config honest about what actually runs.
            import dataclasses
            config = dataclasses.replace(config, raw_preproc=False)
        self.config = config
        self.precision = precision
        dtype = jnp.float32 if precision == "fp32" else jnp.bfloat16
        self.apply_fn, init_fn = build_model(model_name, dtype)
        self.params = params if params is not None else \
            init_fn(jax.random.PRNGKey(seed))
        self._jits = {}
        self.last_inference_ms = 0.0

    # -- engine build / serialize (reference: 183-495) ----------------------
    @classmethod
    def build_from_checkpoint(cls, path: str, model_name: str,
                              precision: str = "bf16",
                              calib_dir: str = "",
                              config: DetectorConfig = DetectorConfig()):
        """buildFromONNX analog: import weights, apply the precision
        policy (int8 = partial quantization with the stem kept high
        precision, reference: yolo_pose_engine.cpp:282-332)."""
        from .weights import load_pretrained
        params = load_pretrained(path, model_name)
        if precision == "int8":
            from .quant import calibrate_and_quantize
            params = calibrate_and_quantize(params, model_name, calib_dir,
                                            config.input_size)
        return cls(model_name, config, params=params, precision=precision)

    def save_engine(self, path: str):
        from .weights import save_params
        save_params(self.params, path, self.model_name)

    @classmethod
    def load_engine(cls, path: str, precision: str = "bf16",
                    config: DetectorConfig = DetectorConfig()):
        from .weights import load_params
        params, name = load_params(path)
        return cls(name, config, params=params, precision=precision)

    # -- device-native path (reference: detectGPUNative, 610-646) -----------
    def _native_fn(self, h: int, w: int):
        key = ("native", h, w)
        fn = self._jits.get(key)
        if fn is None:
            cfg = self.config
            apply_fn = self.apply_fn

            # params is a call argument (not closed over) so mutating
            # engine.params — e.g. re-quantizing after construction —
            # takes effect on the next call instead of silently serving
            # the weights captured at first trace.
            @jax.jit
            def run(params, frame_flat_u8):
                # selection=False: strided-slice letterbox is a batch-1
                # pessimization (scripts/bench_frame_exec_ab.py); env
                # override for clean-process A/B probes only.
                from ..ops.preprocess import batch1_selection_override
                img = letterbox_flat(frame_flat_u8, w, h, cfg.input_size,
                                     selection=batch1_selection_override())
                raw = apply_fn(params, jnp.transpose(img, (1, 2, 0))[None])
                det = decode_yolo_output(raw[0], cfg.conf_threshold,
                                         cfg.max_candidates)
                return pose_nms(det, cfg.iou_threshold, cfg.oks_threshold,
                                cfg.max_detections)

            fn = run
            self._jits[key] = fn
        return fn

    def detect_device_native(self, frame_flat_u8: jnp.ndarray,
                             height: int, width: int) -> Detections:
        """Fully device-resident: flat uint8 frame on device -> device
        Detections (chains into the tracker with zero host crossings)."""
        import time
        t0 = time.perf_counter()
        out = self._native_fn(height, width)(self.params, frame_flat_u8)
        self.last_inference_ms = (time.perf_counter() - t0) * 1e3
        return out

    # -- legacy host paths (reference: detect/detectBatch, 559-703) ---------
    def _batch_raw_fn(self, batch: int):
        key = ("raw", batch)
        fn = self._jits.get(key)
        if fn is None:
            apply_fn = self.apply_fn
            fn = jax.jit(lambda params, imgs: apply_fn(params, imgs))
            self._jits[key] = fn
        return fn

    def detect(self, image_bgr: np.ndarray,
               conf_threshold: Optional[float] = None,
               nms_threshold: Optional[float] = None):
        """Single-image host path: uint8 HWC BGR numpy -> list of
        (bbox, score, keypoints) in image coordinates. Uses the LEGACY
        CPU-path NMS rules (nms.cu), exactly like the reference's
        detect() -> postprocess() -> NMSCuda::apply chain."""
        return self.detect_batch(image_bgr[None], conf_threshold,
                                 nms_threshold)[0]

    def detect_batch(self, images_bgr: np.ndarray,
                     conf_threshold: Optional[float] = None,
                     nms_threshold: Optional[float] = None):
        """Batched host path [B, H, W, 3] -> list of per-image lists."""
        cfg = self.config
        conf = cfg.conf_threshold if conf_threshold is None \
            else conf_threshold
        B, H, W = images_bgr.shape[:3]

        key = ("legacy", B, H, W, float(conf))
        fn = self._jits.get(key)
        if fn is None:
            apply_fn = self.apply_fn

            @jax.jit
            def run(params, frames_flat):
                imgs = jax.vmap(
                    lambda f: letterbox_flat(f, W, H, cfg.input_size)
                )(frames_flat)
                raw = apply_fn(params, jnp.transpose(imgs, (0, 2, 3, 1)))

                def dec(r):
                    d = decode_yolo_output(r, conf, cfg.max_candidates)
                    return legacy_pose_nms(d, max_keep=cfg.max_detections)

                return jax.vmap(dec)(raw)

            fn = run
            self._jits[key] = fn

        flat = np.ascontiguousarray(images_bgr).reshape(B, -1)
        import time
        t0 = time.perf_counter()
        dets = fn(self.params, jnp.asarray(flat))
        boxes, poses, scores, valid = jax.device_get(
            (dets.boxes, dets.poses, dets.scores, dets.valid))
        self.last_inference_ms = (time.perf_counter() - t0) * 1e3

        scale, _, _, pad_x, pad_y = letterbox_params(W, H, cfg.input_size)
        pad2 = np.asarray([pad_x, pad_y], np.float32)
        pad4 = np.asarray([pad_x, pad_y, pad_x, pad_y], np.float32)
        results = []
        for b in range(B):
            img_dets = []
            for d in range(boxes.shape[1]):
                if not valid[b, d]:
                    continue
                kp = poses[b, d].copy()
                kp[:, :2] = (kp[:, :2] - pad2) / scale
                img_dets.append({
                    "bbox": (boxes[b, d] - pad4) / scale,
                    "score": float(scores[b, d]),
                    "keypoints": kp,
                })
            results.append(img_dets)
        return results

    def detect_from_device(self, frame_flat_u8: jnp.ndarray,
                           height: int, width: int):
        """Device input, host detection list out (reference:
        detectFromDevice, yolo_pose_engine.cpp:582-608)."""
        det = self.detect_device_native(frame_flat_u8, height, width)
        boxes, poses, scores, valid = jax.device_get(
            (det.boxes, det.poses, det.scores, det.valid))
        out = []
        for d in range(len(scores)):
            if valid[d]:
                out.append({"bbox": boxes[d], "score": float(scores[d]),
                            "keypoints": poses[d]})
        return out

    def get_last_inference_time(self) -> float:
        """Milliseconds of the last detect call (reference:
        getLastInferenceTime via CUDA events)."""
        return self.last_inference_ms
